"""FM discriminator, de-emphasis, NBFM chain, rational resampler."""

import numpy as np
import jax.numpy as jnp

from radiocapture_tpu.ops import fm as FM
from radiocapture_tpu.ops import resample as RS
from radiocapture_tpu.ops import taps as T
from radiocapture_tpu.testing import modulators as M


def test_quad_demod_recovers_audio():
    fs = 25000.0
    t = np.arange(25000) / fs
    audio = np.sin(2 * np.pi * 700.0 * t).astype(np.float32)
    iq = M.fm_modulate(audio, fs, max_dev=2500.0)
    st = FM.quad_demod_init()
    st, y = FM.quadrature_demod(st, jnp.asarray(iq),
                                gain=fs / (2 * np.pi * 2500.0))
    # y[n] = phase[n]-phase[n-1] = audio[n] (cumsum includes sample n).
    y = np.asarray(y)[10:]
    ref = audio[10:]
    err = np.sqrt(np.mean((y - ref) ** 2))
    assert err < 0.02


def test_quad_demod_batched_and_blockwise():
    fs = 25000.0
    iq = np.stack([M.tone(fs, 1000.0, 5000), M.tone(fs, -2000.0, 5000)])
    st = FM.quad_demod_init(batch_shape=(2,))
    st, y = FM.quadrature_demod(st, jnp.asarray(iq), gain=1.0)
    y = np.asarray(y)[:, 5:]
    np.testing.assert_allclose(
        y.mean(axis=1) * fs / (2 * np.pi), [1000.0, -2000.0], rtol=1e-3)

    # block-split equivalence
    st = FM.quad_demod_init(batch_shape=(2,))
    outs = []
    for i in range(5):
        st, yb = FM.quadrature_demod(
            st, jnp.asarray(iq[:, i * 1000:(i + 1) * 1000]), gain=1.0)
        outs.append(np.asarray(yb))
    st2 = FM.quad_demod_init(batch_shape=(2,))
    _, y_once = FM.quadrature_demod(st2, jnp.asarray(iq), gain=1.0)
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(y_once), atol=1e-5)


def test_first_order_iir_matches_loop(rng):
    x = rng.standard_normal(512).astype(np.float32)
    a, b, y0 = 0.95, 0.05, 0.7
    y = np.asarray(FM.first_order_iir(jnp.asarray(x), a, b,
                                      jnp.float32(y0)))
    ref = np.zeros_like(x)
    prev = y0
    for i in range(len(x)):
        prev = a * prev + b * x[i]
        ref[i] = prev
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_deemphasis_rolls_off_highs():
    fs = 25000.0
    t = np.arange(8192) / fs

    def gain_at(f):
        x = np.sin(2 * np.pi * f * t).astype(np.float32)
        st = FM.deemph_init()
        _, y = FM.fm_deemphasis(st, jnp.asarray(x), fs, tau=75e-6)
        return np.sqrt(np.mean(np.asarray(y)[2000:] ** 2) / 0.5)

    g_low, g_high = gain_at(300.0), gain_at(6000.0)
    # 75us pole at ~2.1kHz: 6 kHz should sit well below 300 Hz response.
    assert g_high < 0.45 * g_low


def test_rational_resampler_tone_and_blocks():
    fs_in, fs_out = 25000.0, 8000.0
    interp, decim = RS.resample_ratio(fs_in, fs_out)
    taps = RS.design_resampler_taps(interp, decim)
    t = np.arange(25000) / fs_in
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)

    st = RS.resampler_init(taps, interp)
    st, y = RS.rational_resample(st, jnp.asarray(x), jnp.asarray(taps),
                                 interp, decim)
    y = np.asarray(y)
    assert len(y) == 8000
    seg = y[1000:7000]
    # Pure 1 kHz tone at 8 kHz out: check freq via zero crossings + power.
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak_hz = np.argmax(spec) * fs_out / len(seg)
    assert abs(peak_hz - 1000.0) < 5.0
    assert abs(np.sqrt(np.mean(seg ** 2)) - np.sqrt(0.5)) < 0.02

    # block-split equivalence
    st = RS.resampler_init(taps, interp)
    outs = []
    for blk in x.reshape(5, -1):
        st, yb = RS.rational_resample(st, jnp.asarray(blk),
                                      jnp.asarray(taps), interp, decim)
        outs.append(np.asarray(yb))
    np.testing.assert_allclose(np.concatenate(outs), y, atol=1e-4)


def test_nbfm_end_to_end_snr():
    """Full analog voice chain: FM mod @25k → NBFM demod → 8 kHz audio."""
    fs = 25000.0
    t = np.arange(50000) / fs
    audio = (0.7 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    # Pre-emphasize to invert the demod's de-emphasis (broadcast practice).
    iq = M.fm_modulate(audio, fs, max_dev=2500.0)
    iq = M.awgn(iq, snr_db=40.0)

    audio_taps = T.low_pass(1.0, fs, 3400, 1000)
    st = FM.nbfm_init(audio_taps)
    st, y = FM.nbfm_demod(st, jnp.asarray(iq), fs, 2500.0,
                          jnp.asarray(audio_taps), tau=75e-6)
    y = np.asarray(y)[2000:]
    # 440 Hz should dominate the output spectrum.
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * fs / len(y)
    assert abs(peak_hz - 440.0) < 3.0
