"""Example deployment config: one file-backed 2.4 MS/s source carrying
one P25 C4FM trunked system.

Configs are code, exactly like the reference's ``configs/config_*.py``
symlinked to ``config.py`` (reference README.md:83-85); this file must
define ``config`` (an RcConfig). Run with:

    python -m radiocapture_tpu.runtime -c configs/config_example_file.py \
        --blocks 100
"""

config = RcConfig()                         # noqa: F821 (injected)
config.site_uuid = "00000000-0000-0000-0000-00000000s1te"
config.num_slots_per_source = 64
config.block_seconds = 0.1

config.sources[0] = SourceConfig(           # noqa: F821
    type="file",
    args="capture.dat",                     # complex64 IQ
    center_freq=857.0e6,
    samp_rate=2.4e6,
)

config.systems[0] = SystemConfig(           # noqa: F821
    type="p25",
    id="Example P25",
    modulation="C4FM",
    control_channels=[857.5e6],
    channels={},                            # learned from IDEN_UP
    system_uuid="00000000-0000-0000-0000-0000000000p2",
    transmit_site_uuid="00000000-0000-0000-0000-0000000000t2",
)
