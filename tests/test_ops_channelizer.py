"""Channelizer bank parity: xlat bank vs single-channel xlat, PFB tones."""

import numpy as np
import jax.numpy as jnp

from radiocapture_tpu.ops import fir as F
from radiocapture_tpu.ops import taps as T
from radiocapture_tpu.ops.channelizer import XlatBank, PfbChannelizer
from radiocapture_tpu.testing import modulators as M


def test_xlat_bank_matches_single_channel(rng):
    fs = 2_400_000.0
    bank = XlatBank.for_rates(num_slots=4, samp_rate=fs, channel_rate=12500.0)
    x = (rng.standard_normal(bank.decim * 512)
         + 1j * rng.standard_normal(bank.decim * 512)).astype(np.complex64)
    offsets = np.array([0.05, -0.11, 0.2, 0.0], np.float32)

    st = bank.init()
    st, y = bank(st, jnp.asarray(x), jnp.asarray(offsets))
    y = np.asarray(y)

    for c in range(4):
        sst = F.xlat_init(bank.ntaps)
        _, yc = F.freq_xlating_fir(sst, jnp.asarray(x),
                                   jnp.asarray(bank.taps),
                                   jnp.float32(offsets[c]), bank.decim)
        np.testing.assert_allclose(y[c], np.asarray(yc), atol=2e-3)


def test_xlat_bank_extracts_tones():
    fs = 2_400_000.0
    bank = XlatBank.for_rates(num_slots=3, samp_rate=fs, channel_rate=12500.0)
    n = bank.decim * 1024
    wide = M.multi_channel(fs, [
        (100_000.0, M.upsample_to(M.tone(25000.0, 2000.0, 30000), 25000, fs)),
        (-400_000.0, M.upsample_to(M.tone(25000.0, -3000.0, 30000), 25000, fs)),
    ], n)
    offsets = np.array([100_000.0, -400_000.0, 700_000.0], np.float32) / fs

    st = bank.init()
    st, y = bank(st, jnp.asarray(wide), jnp.asarray(offsets))
    y = np.asarray(y)[:, 100:]
    fs_ch = fs / bank.decim

    def est_freq(z):
        d = np.angle(z[1:] * np.conj(z[:-1]))
        return np.mean(d) * fs_ch / (2 * np.pi)

    assert abs(est_freq(y[0]) - 2000.0) < 20.0
    assert abs(est_freq(y[1]) + 3000.0) < 20.0
    # Empty slot: only noise floor.
    assert np.mean(np.abs(y[2])) < 0.02 * np.mean(np.abs(y[0]))


def test_xlat_bank_block_split(rng):
    fs = 1_000_000.0
    bank = XlatBank.for_rates(num_slots=2, samp_rate=fs, channel_rate=12500.0)
    x = (rng.standard_normal(bank.decim * 256)
         + 1j * rng.standard_normal(bank.decim * 256)).astype(np.complex64)
    offsets = jnp.asarray(np.array([0.07, -0.3], np.float32))

    st = bank.init()
    _, y_once = bank(st, jnp.asarray(x), offsets)
    st = bank.init()
    outs = []
    for blk in x.reshape(4, -1):
        st, yb = bank(st, jnp.asarray(blk), offsets)
        outs.append(np.asarray(yb))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(y_once), atol=2e-3)


def test_pfb_channelizer_tone_routing():
    fs = 1_600_000.0
    m = 16  # 100 kHz bins
    pfb = PfbChannelizer.for_rates(fs, m)
    n = m * 4096
    # Tones in channels 2 (at +200k+5k) and 13 (== -3 → -300k-8k).
    wide = (M.tone(fs, 205_000.0, n) + M.tone(fs, -308_000.0, n)
            ).astype(np.complex64)
    st = pfb.init()
    st, y = pfb(st, jnp.asarray(wide))
    y = np.asarray(y)[:, 64:]
    fs_ch = fs / m

    def est_freq(z):
        d = np.angle(z[1:] * np.conj(z[:-1]))
        return np.mean(d) * fs_ch / (2 * np.pi)

    assert abs(est_freq(y[2]) - 5000.0) < 100.0
    assert abs(est_freq(y[13]) + 8000.0) < 100.0
    # Leakage into a quiet channel is far below the tone channels.
    p_sig = np.mean(np.abs(y[2]) ** 2)
    p_quiet = np.mean(np.abs(y[7]) ** 2)
    assert p_quiet < 1e-4 * p_sig


def test_pallas_bank_matmul_parity(rng):
    """Interpret-mode Pallas bank kernel vs the dense matmul, including a
    ragged last N-tile and the cross-tile halo rows."""
    from radiocapture_tpu.ops import pallas_channelizer as pk

    for n_out, p, d, c in [(2500, 30, 96, 64), (40, 5, 8, 16)]:
        zr = rng.standard_normal((n_out + p - 1, d)).astype(np.float32)
        zi = rng.standard_normal((n_out + p - 1, d)).astype(np.float32)
        gr = rng.standard_normal((p * d, c)).astype(np.float32)
        gi = rng.standard_normal((p * d, c)).astype(np.float32)
        yr, yi = pk.bank_matmul_pallas(
            jnp.asarray(zr), jnp.asarray(zi), jnp.asarray(gr),
            jnp.asarray(gi), p, d, interpret=True, bf16=False)
        w_r = np.concatenate([zr[q: q + n_out] for q in range(p)], axis=1)
        w_i = np.concatenate([zi[q: q + n_out] for q in range(p)], axis=1)
        np.testing.assert_allclose(np.asarray(yr), w_r @ gr - w_i @ gi,
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(yi), w_r @ gi + w_i @ gr,
                                   rtol=1e-4, atol=1e-3)
        # bf16 MXU mode: rounding ~2^-8 per product, f32 accumulation.
        yr16, yi16 = pk.bank_matmul_pallas(
            jnp.asarray(zr), jnp.asarray(zi), jnp.asarray(gr),
            jnp.asarray(gi), p, d, interpret=True, bf16=True)
        scale = np.abs(w_r @ gr - w_i @ gi).max()
        np.testing.assert_allclose(np.asarray(yr16), w_r @ gr - w_i @ gi,
                                   atol=0.02 * scale)
        np.testing.assert_allclose(np.asarray(yi16), w_r @ gi + w_i @ gr,
                                   atol=0.02 * scale)


def test_pallas_fused_bank_parity(rng):
    """Interpret-mode fused kernel (interleaved wire input, in-kernel
    phasor-doubling rotation, transposed plane outputs) vs the complex
    XLA path of XlatBank.__call__, from a mid-stream state with nonzero
    phase and history."""
    from radiocapture_tpu.ops import pallas_channelizer as pk
    from radiocapture_tpu.ops.channelizer import XlatBank, XlatBankState
    from radiocapture_tpu.ops.fir import _phase_step_u32

    for n_out, p, d, c in [(300, 6, 16, 8), (40, 5, 8, 16)]:
        k = p * d
        bank = XlatBank(c, d, rng.standard_normal(k).astype(np.float32))
        offs = ((rng.standard_normal(c)) * 0.1).astype(np.float32)
        hist = (rng.standard_normal(k - 1)
                + 1j * rng.standard_normal(k - 1)).astype(np.complex64)
        phase0 = rng.integers(0, 2 ** 32, c, dtype=np.uint64).astype(
            np.uint32)
        x = (rng.standard_normal(n_out * d)
             + 1j * rng.standard_normal(n_out * d)).astype(np.complex64)
        st = XlatBankState(history=jnp.asarray(hist),
                           phase=jnp.asarray(phase0))
        st2, y_ref = bank(st, jnp.asarray(x), jnp.asarray(offs))

        # fused path, assembled like XlatBank.call_wire
        kk = jnp.arange(k, dtype=jnp.float32)
        ang = (2.0 * jnp.pi) * jnp.asarray(offs)[:, None] * kk[None, :]
        grev = (jnp.asarray(bank.taps)[None, :]
                * jnp.exp(1j * ang))[:, ::-1].T
        g2 = pk.fused_tap_matrix(jnp.real(grev).astype(jnp.float32),
                                 jnp.imag(grev).astype(jnp.float32),
                                 p, d).astype(jnp.float32)  # f32: exact
        step = _phase_step_u32(jnp.asarray(offs), d)
        rot0, pows = pk.fused_rotation_tables(jnp.asarray(phase0), step,
                                              n_out)
        x2 = np.stack([x.real, x.imag], -1).astype(np.float32)
        h2 = np.stack([hist.real, hist.imag], -1).astype(np.float32)
        z2 = jnp.asarray(np.concatenate([h2, x2], axis=0))
        rows = n_out + p - 1
        zf2 = z2[: rows * d].reshape(rows, 2 * d)
        y_re, y_im = pk.bank_fused_pallas(zf2, g2.astype(jnp.bfloat16),
                                          rot0, pows, p, d,
                                          interpret=True)
        got = np.asarray(y_re[:, :n_out]) + 1j * np.asarray(
            y_im[:, :n_out])
        ref = np.asarray(y_ref)
        scale = np.abs(ref).max()
        # bf16 products + phasor-doubling rotation: ~1e-2 relative
        np.testing.assert_allclose(got, ref, atol=0.03 * scale)


def test_pallas_fused_bank_variants(rng):
    """The kernel's tuning knobs (K-chunked accumulation, bf16 outputs,
    untransposed plane outputs) must not change the math: each variant
    is compared against the default-path fused kernel, interpret mode."""
    from radiocapture_tpu.ops import pallas_channelizer as pk
    from radiocapture_tpu.ops.fir import _phase_step_u32

    n_out, p, d, c = 300, 6, 16, 8
    k = p * d
    taps = rng.standard_normal(k).astype(np.float32)
    offs = (rng.standard_normal(c) * 0.1).astype(np.float32)
    x2 = rng.standard_normal((n_out * d + k - 1, 2)).astype(np.float32)

    kk = jnp.arange(k, dtype=jnp.float32)
    ang = (2.0 * jnp.pi) * jnp.asarray(offs)[:, None] * kk[None, :]
    grev = (jnp.asarray(taps)[None, :] * jnp.exp(1j * ang))[:, ::-1].T
    g2 = pk.fused_tap_matrix(jnp.real(grev).astype(jnp.float32),
                             jnp.imag(grev).astype(jnp.float32),
                             p, d).astype(jnp.float32)
    step = _phase_step_u32(jnp.asarray(offs), d)
    rot0, pows = pk.fused_rotation_tables(
        jnp.zeros(c, jnp.uint32), step, n_out)
    rows = n_out + p - 1
    zf2 = jnp.asarray(x2[: rows * d].reshape(rows, 2 * d))

    base = pk.bank_fused_pallas(zf2, g2, rot0, pows, p, d,
                                interpret=True)
    for kwargs in ({"chunk": 2}, {"chunk": 1}, {"out_bf16": True},
                   {"chunk": 2, "out_bf16": True},
                   {"transpose_out": False}):
        got = pk.bank_fused_pallas(zf2, g2, rot0, pows, p, d,
                                   interpret=True, **kwargs)
        if not kwargs.get("transpose_out", True):
            got = tuple(a.T for a in got)
        scale = max(float(jnp.abs(b).max()) for b in base)
        tol = 0.01 * scale if kwargs.get("out_bf16") else 1e-5 * scale
        for gb, bb in zip(got, base):
            np.testing.assert_allclose(np.asarray(gb, np.float32),
                                       np.asarray(bb, np.float32),
                                       atol=tol)


def test_pipeline_accepts_bf16_wire_blocks(rng):
    """The ingest ring's bfloat16 wire layout (PERF.md §6) must flow
    through ControlPipeline like float32: same shapes, and near-
    identical symbols on the same input (bf16 rounds the 8-12
    significant bits of SDR IQ well below the slicer margins)."""
    import ml_dtypes
    from radiocapture_tpu.frontend.pipeline import ControlPipeline

    pipe = ControlPipeline.p25_c4fm(num_slots=4, samp_rate=200e3)
    n = pipe.block_multiple * 4
    x32 = rng.standard_normal((n, 2)).astype(np.float32) * 0.3
    x16 = x32.astype(ml_dtypes.bfloat16)
    offs = jnp.zeros(4, jnp.float32)
    sa = pipe.init()
    sb = pipe.init()
    sa, (ya, va, da) = pipe.step(sa, jnp.asarray(x32), offs)
    sb, (yb, vb, db) = pipe.step(sb, jnp.asarray(x16), offs)
    assert ya.shape == yb.shape and va.shape == vb.shape
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    scale = max(1e-6, float(jnp.abs(ya).max()))
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               atol=0.05 * scale)


def test_pfb_block_split(rng):
    fs = 800_000.0
    m = 8
    pfb = PfbChannelizer.for_rates(fs, m)
    x = (rng.standard_normal(m * 2048)
         + 1j * rng.standard_normal(m * 2048)).astype(np.complex64)
    st = pfb.init()
    _, y_once = pfb(st, jnp.asarray(x))
    st = pfb.init()
    outs = []
    for blk in x.reshape(4, -1):
        st, yb = pfb(st, jnp.asarray(blk))
        outs.append(np.asarray(yb))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(y_once), atol=2e-4)


def test_pfb_xlat_bank_matches_xlat_bank_tones():
    """'pfb' frontend (coarse bins + fine xlat) extracts the same
    channels as 'xlat' mode: same tone frequencies out, including a
    channel that does NOT sit on a bin center."""
    from radiocapture_tpu.ops.channelizer import PfbXlatBank

    fs = 2_400_000.0
    offs_hz = np.array([500_000.0, -433_000.0, 0.0], np.float32)
    bank = PfbXlatBank(3, fs, 12500.0)
    n = bank.decim * 512
    wide = (M.multi_channel(fs, [
        (500_000.0, M.upsample_to(M.tone(25000.0, 2000.0, 15000),
                                  25000, fs)),
        (-433_000.0, M.upsample_to(M.tone(25000.0, -3000.0, 15000),
                                   25000, fs)),
    ], n)).astype(np.complex64)

    st = bank.init()
    st, y = bank(st, jnp.asarray(wide), jnp.asarray(offs_hz / fs))
    y = np.asarray(y)[:, 200:]
    fs_ch = fs / bank.decim

    def est(z):
        return float(np.mean(np.angle(z[1:] * np.conj(z[:-1])))
                     * fs_ch / (2 * np.pi))

    assert abs(est(y[0]) - 2000.0) < 20.0
    assert abs(est(y[1]) + 3000.0) < 20.0
    assert np.mean(np.abs(y[2])) < 0.05 * np.mean(np.abs(y[0]))

    # streaming continuity across block splits
    st2 = bank.init()
    outs = []
    for blk in wide.reshape(4, -1):
        st2, yb = bank(st2, jnp.asarray(blk), jnp.asarray(offs_hz / fs))
        outs.append(np.asarray(yb))
    one = np.concatenate(outs, axis=1)
    st3 = bank.init()
    _, y_once = bank(st3, jnp.asarray(wide), jnp.asarray(offs_hz / fs))
    np.testing.assert_allclose(one, np.asarray(y_once), atol=2e-3)


def test_fft_bank_matches_xlat_bank():
    """The overlap-save F-engine bank (ops/fft_bank, frontend_mode
    'fft') must match XlatBank within the FIR's stopband leakage
    (~-60 dB → rel RMS ≲ 1e-2 at this tiny N_fft; production N_fft is
    96x larger so the residual band-centering error shrinks with it),
    including streaming continuity and the exact uint32 mixer phase."""
    from radiocapture_tpu.ops.fft_bank import FftXlatBank
    rng = np.random.default_rng(7)
    samp, ch = 200e3, 12.5e3
    xb = XlatBank.for_rates(5, samp, ch)
    fb = FftXlatBank(5, xb.decim, xb.taps, n_blk=256)
    assert fb.block_multiple % xb.decim == 0
    offs = np.array([0.0, 0.1, -0.23, 0.31, -0.05], np.float32)
    xs = (rng.standard_normal((3, fb.t_window))
          + 1j * rng.standard_normal((3, fb.t_window))
          ).astype(np.complex64)
    s1, s2 = xb.init(), fb.init()
    for blk in range(3):
        s1, y1 = xb(s1, jnp.asarray(xs[blk]), jnp.asarray(offs))
        s2, y2 = fb(s2, jnp.asarray(xs[blk]), jnp.asarray(offs))
        y1, y2 = np.asarray(y1), np.asarray(y2)
        assert y1.shape == y2.shape
        rel = np.sqrt(np.mean(np.abs(y1 - y2) ** 2)
                      / np.mean(np.abs(y1) ** 2))
        assert rel < 1.5e-2, (blk, rel)
    # multi-window blocks chain through the history state
    s3 = fb.init()
    _, y3 = fb(s3, jnp.asarray(xs.reshape(-1)), jnp.asarray(offs))
    s4 = fb.init()
    parts = []
    for blk in range(3):
        s4, yb = fb(s4, jnp.asarray(xs[blk]), jnp.asarray(offs))
        parts.append(np.asarray(yb))
    np.testing.assert_allclose(np.asarray(y3),
                               np.concatenate(parts, axis=1), atol=1e-5)


def test_fft_frontend_mode_pipeline():
    """frontend_mode='fft' drops into ControlPipeline: same decode
    contract, block_multiple = the bank's overlap-save window."""
    from radiocapture_tpu.frontend.pipeline import ControlPipeline
    pipe = ControlPipeline.p25_c4fm(num_slots=4, samp_rate=200e3,
                                    frontend="fft")
    assert pipe.block_multiple % (pipe.decim * pipe.sym_decim) == 0
    rng = np.random.default_rng(3)
    x = rng.standard_normal((pipe.block_multiple, 2)).astype(np.float32)
    st = pipe.init()
    st, (syms, valid, dibits) = pipe.step(st, jnp.asarray(x),
                                          jnp.zeros(4, jnp.float32))
    assert syms.shape[0] == 4
    assert syms.shape == valid.shape == dibits.shape
