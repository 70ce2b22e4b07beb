"""Example live-capture deployment: every wired SDR ingest path.

- Sources 0-1: RTL-SDR dongles streamed over rtl_tcp (one ``rtl_tcp``
  daemon per dongle on the USB host — deploy/rtl-tcp@.service; the
  reference's osmosdr ``rtl=N`` in-process init,
  rc_frontend/receiver.py:170-204).
- Source 2: a USRP on a driver host running
  ``tools/driver_host_sender.py`` (deploy/rciq-sender@.service; the
  reference's UHD init, receiver.py:88-145). A 2-channel usrp2x is two
  sources on two sender ports.
- Source 3: a bladeRF through the same rciq path (receiver.py:146-169).

The redis/activemq entries mirror the reference's multi-host control
plane (config_denver_dev_den817.py:21-23); omit both for a single-box
in-process bus. Run: python -m radiocapture_tpu.runtime -c <this file>
"""

config = RcConfig()                         # noqa: F821 (injected)
config.num_slots_per_source = 64
config.block_seconds = 0.1
# bf16 host->device wire where lossless (8-bit rtl_tcp sources); the
# >=12-bit rciq sources stay float32 automatically.
config.ingest_bf16 = True

config.sources[0] = SourceConfig(           # noqa: F821
    type="rtlsdr", args="rtl=0",            # localhost rtl_tcp :1234
    center_freq=857.0e6, samp_rate=2.4e6,
    offset=2,                               # per-dongle ppm
    gains={"RF": 29.7},
)
config.sources[1] = SourceConfig(           # noqa: F821
    type="rtlsdr", args="rtl_tcp=sdrhost-a:1235",
    center_freq=859.4e6, samp_rate=2.4e6,
)
config.sources[2] = SourceConfig(           # noqa: F821
    type="usrp", args="rciq=sdrhost-b:41234,fmt=cs16",
    center_freq=853.0e6, samp_rate=8.0e6,
    gains={"RF": 30},
)
config.sources[3] = SourceConfig(           # noqa: F821
    type="bladerf", args="rciq=sdrhost-c:41234,fmt=cf32",
    center_freq=770.0e6, samp_rate=10.0e6,
)

config.systems[0] = SystemConfig(           # noqa: F821
    type="p25", id="Metro P25", modulation="C4FM",
    control_channels=[857.5e6, 859.2e6],    # hunt list
)
config.systems[1] = SystemConfig(           # noqa: F821
    type="edacs", id="County EDACS", esk=True,
    channels={1: 852.1e6, 2: 852.6e6, 3: 853.2e6},
)
config.systems[2] = SystemConfig(           # noqa: F821
    type="moto", id="Legacy Type II",
    channels={1: 770.1e6, 2: 770.5e6},
)

config.redis_servers = [{"host": "ctrl-1", "port": 6379},
                        {"host": "ctrl-2", "port": 6379}]
config.activemq = {"host": "ctrl-1", "port": 61613}

config.blacklists = {"Metro P25": {9999}}   # never record these groups
