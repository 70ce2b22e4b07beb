"""End-to-end C4FM path: modulate TSDUs -> demod -> bit-exact TSBKs.

This is BASELINE config 4's hardware-free regression surface: known
TSBK content is C4FM-modulated at the channel rate, demodulated by the
fsk4 scan kernel, framed, trellis/CRC-decoded, and compared field by
field (the reference's protocol.log is the oracle format; SURVEY.md §6).
"""

import numpy as np
import jax.numpy as jnp

from radiocapture_tpu.demod import fsk4 as FSK4
from radiocapture_tpu.demod.framer import Framer
from radiocapture_tpu.fec import bits as B
from radiocapture_tpu.ops import fir as F
from radiocapture_tpu.ops import fm as FM
from radiocapture_tpu.protocol import p25 as P
from radiocapture_tpu.testing import modulators as M

FS = 25000.0
SYMBOL_RATE = 4800.0


def _make_control_stream(n_frames=8, nac=0x293):
    """A realistic control-channel TSDU stream with known contents."""
    frames = []
    expected = []
    for i in range(n_frames):
        t1 = P.pack_tsbk("GRP_V_CH_GRANT", mfid=0, **{
            "Service Options": 0, "Channel": 0x1000 + i,
            "Group Address": 100 + i, "Source Address": 555000 + i})
        t2 = P.pack_tsbk("NET_STS_BCST", mfid=0, **{
            "LRA": 0, "WACN ID": 0xBEE00, "System ID": 0x2C1,
            "Channel": 0x100A, "System Service Class": 0x70})
        frames.append(P.build_tsdu_frame(nac, [t1, t2]))
        expected.append((0x1000 + i, 100 + i, 555000 + i))
    bits = np.concatenate(frames)
    dibits = B.bits_to_dibits(bits)
    return dibits, expected


def _demod_dibits(iq, fs=FS):
    """quad demod -> boxcar -> fsk4 scan kernel -> slicer."""
    gain = fs / (2 * np.pi * 600.0)
    qs, disc = FM.quadrature_demod(FM.quad_demod_init(), jnp.asarray(iq),
                                   gain)
    taps = FSK4.boxcar_taps(fs, SYMBOL_RATE)
    fst = F.FirState(history=jnp.zeros(len(taps) - 1, jnp.float32))
    fst, filt = F.fir_filter(fst, disc, jnp.asarray(taps))
    st = FSK4.fsk4_init()
    st, (syms, valid) = FSK4.fsk4_demod(st, filt, fs, SYMBOL_RATE)
    symbols = FSK4.compact_symbols(np.asarray(syms), np.asarray(valid))
    return FSK4.slice_dibits(symbols), symbols


def test_c4fm_clean_decode():
    dibits, expected = _make_control_stream(6)
    iq = M.c4fm_modulate(dibits, fs=FS)
    rx_dibits, symbols = _demod_dibits(iq)

    # Symbol count is within a couple of symbols of what was sent.
    assert abs(len(rx_dibits) - len(dibits)) < 20

    framer = Framer()
    frames = framer.feed(rx_dibits)
    assert len(frames) >= 4, f"only {len(frames)} frames found"

    got = []
    for fb in frames:
        fr = P.parse_frame(fb)
        assert fr.duid == P.DUID_TSDU
        assert fr.nac == 0x293
        for t in fr.tsbks:
            assert t["crc"] == 0, f"CRC fail: {t}"
            if t["name"] == "GRP_V_CH_GRANT":
                got.append((t["Channel"], t["Group Address"],
                            t["Source Address"]))
            elif t["name"] == "NET_STS_BCST":
                assert t["WACN ID"] == 0xBEE00
                assert t["System ID"] == 0x2C1
    # All fully-contained frames decode bit-exactly in order.
    assert len(got) >= 4
    assert got == expected[1:len(got) + 1] or got == expected[:len(got)]


def test_c4fm_decode_with_noise_and_offset():
    """30 dB SNR + 300 Hz carrier offset: still decodes cleanly."""
    dibits, expected = _make_control_stream(6)
    iq = M.c4fm_modulate(dibits, fs=FS)
    iq = M.freq_shift(iq, FS, 240.0)
    iq = M.awgn(iq, snr_db=30.0)
    rx_dibits, _ = _demod_dibits(iq)
    frames = Framer().feed(rx_dibits)
    assert len(frames) >= 3
    n_good = 0
    for fb in frames:
        fr = P.parse_frame(fb)
        for t in fr.tsbks:
            if t.get("crc") == 0 and t["name"] == "GRP_V_CH_GRANT":
                assert (t["Channel"], t["Group Address"],
                        t["Source Address"]) in expected
                n_good += 1
    assert n_good >= 3


def _demod_dibits_block(iq, fs=FS, block=10, split=None):
    gain = fs / (2 * np.pi * 600.0)
    qs, disc = FM.quadrature_demod(FM.quad_demod_init(), jnp.asarray(iq),
                                   gain)
    taps = FSK4.boxcar_taps(fs, SYMBOL_RATE)
    fst = F.FirState(history=jnp.zeros(len(taps) - 1, jnp.float32))
    fst, filt = F.fir_filter(fst, disc, jnp.asarray(taps))
    st = FSK4.fsk4_init()
    if split:
        outs = []
        filt_np = np.asarray(filt)
        for i in range(0, len(filt_np), split):
            seg = filt_np[i:i + split]
            st, (s, v) = FSK4.fsk4_demod_block(
                st, jnp.asarray(seg), fs, SYMBOL_RATE, block=block)
            outs.append((np.asarray(s), np.asarray(v)))
        syms = np.concatenate([o[0] for o in outs])
        valid = np.concatenate([o[1] for o in outs])
    else:
        st, (syms, valid) = FSK4.fsk4_demod_block(st, filt, fs,
                                                  SYMBOL_RATE, block=block)
    symbols = FSK4.compact_symbols(np.asarray(syms), np.asarray(valid))
    return FSK4.slice_dibits(symbols), symbols


def test_fsk4_block_feedback_decodes_under_stress():
    """The block-feedback tracker (fsk4_demod_block) must survive the
    same impairments the sample-stepped scan does: AWGN, carrier
    offset, and a sample-clock error — plus block-split streaming
    (state continuity across jit-step boundaries)."""
    dibits, expected = _make_control_stream(6)
    iq = M.c4fm_modulate(dibits, fs=FS)
    iq = M.resample_linear(iq, 1.0005) if hasattr(M, "resample_linear") \
        else iq
    iq = M.freq_shift(iq, FS, 240.0)
    iq = M.awgn(iq, snr_db=30.0)
    for split in (None, 250):
        rx_dibits, _ = _demod_dibits_block(iq, split=split)
        frames = Framer().feed(rx_dibits)
        assert len(frames) >= 3, f"split={split}: {len(frames)} frames"
        n_good = 0
        for fb in frames:
            fr = P.parse_frame(fb)
            for t in fr.tsbks:
                if t.get("crc") == 0 and t["name"] == "GRP_V_CH_GRANT":
                    assert (t["Channel"], t["Group Address"],
                            t["Source Address"]) in expected
                    n_good += 1
        assert n_good >= 3, f"split={split}: {n_good} good grants"


def test_fsk4_block_feedback_matches_exact_on_clean_signal():
    """On a clean signal the block tracker's sliced symbol stream is
    identical to the sample-stepped scan's (the deferred feedback only
    perturbs convergence transients, not steady-state decisions)."""
    dibits, _ = _make_control_stream(4)
    iq = M.c4fm_modulate(dibits, fs=FS)
    d_exact, s_exact = _demod_dibits(iq)
    d_block, s_block = _demod_dibits_block(iq)
    n = min(len(d_exact), len(d_block))
    assert n > 1000
    # Allow a handful of disagreements around the initial lock-in.
    mismatches = int(np.sum(d_exact[:n] != d_block[:n]))
    assert mismatches <= 5, f"{mismatches} dibit mismatches"


def test_pipeline_block_feedback_mode_decodes():
    """ControlPipeline.fsk4_block routes through fsk4_demod_block; the
    full pipeline still decodes the control stream."""
    import jax
    from radiocapture_tpu.frontend.pipeline import ControlPipeline

    dibits, expected = _make_control_stream(4)
    iq = M.c4fm_modulate(dibits, fs=25000.0)
    iq = M.upsample_to(iq, 25000.0, 200e3)
    pipe = ControlPipeline.p25_c4fm(num_slots=2, samp_rate=200e3)
    pipe.fsk4_block = 10
    st = pipe.init()
    offs = jnp.zeros(2, jnp.float32)
    x = np.stack([iq.real, iq.imag], -1).astype(np.float32)
    n = len(iq) // pipe.block_multiple * pipe.block_multiple
    got = []
    blk = pipe.block_multiple
    for i in range(n // blk):
        st, (syms, valid, dib) = pipe.step(
            st, jnp.asarray(x[i * blk:(i + 1) * blk]), offs)
        v = np.asarray(valid[0]).astype(bool)
        got.append(np.asarray(dib[0])[v])
    rx = np.concatenate(got).astype(np.uint8)
    frames = Framer().feed(rx)
    grants = [t for fb in frames for t in P.parse_frame(fb).tsbks
              if t.get("crc") == 0 and t["name"] == "GRP_V_CH_GRANT"]
    assert len(grants) >= 2, f"{len(frames)} frames, {len(grants)} grants"


def test_fsk4_batched_channels():
    """The scan kernel is vmappable over channel slots."""
    dibits, _ = _make_control_stream(2)
    iq = M.c4fm_modulate(dibits, fs=FS)
    gain = FS / (2 * np.pi * 600.0)
    qs, disc = FM.quadrature_demod(FM.quad_demod_init(batch_shape=(3,)),
                                   jnp.asarray(np.stack([iq, iq, iq])),
                                   gain)
    taps = FSK4.boxcar_taps(FS, SYMBOL_RATE)
    import jax
    fst = F.FirState(history=jnp.zeros(len(taps) - 1, jnp.float32))
    filt = jax.vmap(lambda d: F.fir_filter(fst, d, jnp.asarray(taps))[1])(
        disc)
    st = FSK4.fsk4_init(batch_shape=(3,))
    st, (syms, valid) = FSK4.fsk4_demod(st, filt, FS, SYMBOL_RATE)
    assert syms.shape == filt.shape
    rows = FSK4.compact_symbols(np.asarray(syms), np.asarray(valid))
    assert all(len(r) == len(rows[0]) for r in rows)
    np.testing.assert_allclose(rows[0], rows[1], atol=1e-5)
