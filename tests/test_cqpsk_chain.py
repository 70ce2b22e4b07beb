"""End-to-end CQPSK (P25 LSM) path: modulate TSDUs → Gardner/carrier
scan kernel → bit-exact TSBKs.

Covers the reference's CQPSK control chain (p25_control_demod.py:136-168:
AGC → gardner_costas_cc → diff_phasor → complex_to_arg → ×1/(pi/4) →
fsk4_slicer levels [-2,0,2,4]) and its voice variant
(logging_receiver.py:278-333).
"""

import numpy as np
import jax.numpy as jnp

from radiocapture_tpu.demod import cqpsk as CQ
from radiocapture_tpu.demod import fsk4 as FSK4
from radiocapture_tpu.demod.framer import Framer
from radiocapture_tpu.fec import bits as B
from radiocapture_tpu.frontend.pipeline import CqpskControlPipeline
from radiocapture_tpu.protocol import p25 as P
from radiocapture_tpu.testing import modulators as M

FS = 25000.0
SYMBOL_RATE = 4800.0


def _make_control_stream(n_frames=6, nac=0x293):
    frames, expected = [], []
    for i in range(n_frames):
        t1 = P.pack_tsbk("GRP_V_CH_GRANT", mfid=0, **{
            "Service Options": 0, "Channel": 0x2000 + i,
            "Group Address": 200 + i, "Source Address": 777000 + i})
        t2 = P.pack_tsbk("RFSS_STS_BCST", mfid=0, **{
            "LRA": 1, "System ID": 0x2C1, "RF Sub-system ID": 3,
            "Site ID": 12, "Channel": 0x2100, "System Service Class": 0x70})
        frames.append(P.build_tsdu_frame(nac, [t1, t2]))
        expected.append((0x2000 + i, 200 + i, 777000 + i))
    bits = np.concatenate(frames)
    return B.bits_to_dibits(bits), expected


def _decode_dibit_stream(rx_dibits, expected, nac=0x293, min_frames=4):
    framer = Framer()
    frames = framer.feed(rx_dibits)
    assert len(frames) >= min_frames, f"only {len(frames)} frames found"
    got = []
    for fb in frames:
        fr = P.parse_frame(fb)
        assert fr.duid == P.DUID_TSDU
        assert fr.nac == nac
        for t in fr.tsbks:
            assert t["crc"] == 0, f"CRC fail: {t}"
            if t["name"] == "GRP_V_CH_GRANT":
                got.append((t["Channel"], t["Group Address"],
                            t["Source Address"]))
            elif t["name"] == "RFSS_STS_BCST":
                assert t["System ID"] == 0x2C1
                assert t["Site ID"] == 12
    assert len(got) >= min_frames
    for g in got:
        assert g in expected, f"unexpected grant {g}"


def _run_kernel(iq, fs=FS, symbol_rate=SYMBOL_RATE):
    x = CQ.block_agc(jnp.asarray(iq))
    st = CQ.cqpsk_init(fs, symbol_rate)
    st, (syms, valid) = CQ.cqpsk_demod(st, x, fs, symbol_rate)
    s = np.asarray(syms)[np.asarray(valid)]
    return FSK4.slice_dibits(s)


def test_cqpsk_clean_decode():
    dibits, expected = _make_control_stream(6)
    iq = M.cqpsk_modulate(dibits, fs=FS)
    _decode_dibit_stream(_run_kernel(iq), expected)


def test_cqpsk_offset_noise_decode():
    """±400 Hz carrier offset + 15 dB SNR still decodes bit-exactly
    (reference fmax pull-in ±1200 Hz; the ×4 detector holds ±600)."""
    dibits, expected = _make_control_stream(8)
    iq = M.cqpsk_modulate(dibits, fs=FS)
    iq = M.freq_shift(iq, FS, 400.0)
    iq = M.awgn(iq, 15.0)
    _decode_dibit_stream(_run_kernel(iq), expected, min_frames=4)


def test_cqpsk_clock_drift():
    """0.05% symbol-clock error (ppm-scale dongle drift) is tracked by
    the adaptive omega (reference gain_omega = 0.1*gain_mu^2)."""
    dibits, expected = _make_control_stream(8)
    iq = M.cqpsk_modulate(dibits, fs=FS * 1.0005)
    _decode_dibit_stream(_run_kernel(iq), expected, min_frames=4)


def test_cqpsk_pipeline_wideband():
    """Full batched pipeline: two CQPSK systems in one wideband block,
    extracted + demodulated in a single jitted step."""
    samp_rate = 400e3
    dibits_a, exp_a = _make_control_stream(5, nac=0x293)
    dibits_b, exp_b = _make_control_stream(5, nac=0x123)
    iq_a = M.upsample_to(M.cqpsk_modulate(dibits_a, fs=FS), FS, samp_rate)
    iq_b = M.upsample_to(M.cqpsk_modulate(dibits_b, fs=FS), FS, samp_rate)
    pipe = CqpskControlPipeline.p25_cqpsk(num_slots=4, samp_rate=samp_rate)
    n = (max(len(iq_a), len(iq_b)) // pipe.decim) * pipe.decim
    wide = M.multi_channel(samp_rate, [(-75e3, iq_a), (50e3, iq_b)], n,
                           noise_floor_db=-50.0)
    offsets = jnp.asarray(
        np.array([-75e3, 50e3, 0.0, 125e3], np.float32) / samp_rate)
    state = pipe.init()
    xw = jnp.stack([jnp.real(jnp.asarray(wide)),
                    jnp.imag(jnp.asarray(wide))], axis=-1)
    state, (syms, valid, dibits) = pipe.step(state, xw, offsets)
    syms = np.asarray(syms)
    valid = np.asarray(valid).astype(bool)
    rx_a = FSK4.slice_dibits(syms[0][valid[0]])
    rx_b = FSK4.slice_dibits(syms[1][valid[1]])
    _decode_dibit_stream(rx_a, exp_a, nac=0x293, min_frames=3)
    _decode_dibit_stream(rx_b, exp_b, nac=0x123, min_frames=3)


def test_interp_fixed_matches_reference_interpolator():
    """The gather-free static-window Farrow interpolation (the hot
    scan path) must agree with the reference polyphase-table
    interpolator `_interp` within the Farrow fit + 1/128-phase
    quantization error (PERF.md §10)."""
    import numpy as np
    from radiocapture_tpu.demod import cqpsk as C

    rng = np.random.default_rng(7)
    h_re = jnp.asarray(rng.standard_normal((16, C.HIST_C))
                       .astype(np.float32))
    h_im = jnp.asarray(rng.standard_normal((16, C.HIST_C))
                       .astype(np.float32))
    for n0 in (4, 6, 7):
        frac = jnp.asarray(rng.uniform(0.0, 0.999, 16)
                           .astype(np.float32))
        y_re, y_im = C._interp_fixed(h_re, h_im, n0, frac)
        r_re, r_im = C._interp(h_re, h_im, jnp.float32(n0) + frac)
        np.testing.assert_allclose(np.asarray(y_re), np.asarray(r_re),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(y_im), np.asarray(r_im),
                                   atol=2e-2)
