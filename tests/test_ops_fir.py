"""FIR / xlating-FIR kernel parity vs numpy reference semantics."""

import numpy as np
import jax.numpy as jnp

from radiocapture_tpu.ops import fir as F
from radiocapture_tpu.ops import taps as T
from radiocapture_tpu.testing import modulators as M


def _np_fir(z, taps, decim):
    """Reference semantics: y[m] = sum_k h[k] z[m*D + K-1 - k]."""
    k = len(taps)
    full = np.convolve(z, taps)[k - 1: len(z)]
    return full[::decim]


def test_fir_matches_numpy(rng):
    taps = T.low_pass(1.0, 48000, 8000, 2000)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
         ).astype(np.complex64)
    st = F.fir_init(taps)
    st, y = F.fir_filter(st, jnp.asarray(x), jnp.asarray(taps), decim=4)
    z = np.concatenate([np.zeros(len(taps) - 1, np.complex64), x])
    ref = _np_fir(z, taps, 4)
    np.testing.assert_allclose(np.asarray(y), ref[: len(y)], atol=1e-4)


def test_fir_block_split_equivalence(rng):
    taps = T.low_pass(1.0, 48000, 8000, 4000)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
         ).astype(np.complex64)
    st = F.fir_init(taps)
    _, y_once = F.fir_filter(st, jnp.asarray(x), jnp.asarray(taps), decim=2)

    st = F.fir_init(taps)
    outs = []
    for blk in x.reshape(4, -1):
        st, y = F.fir_filter(st, jnp.asarray(blk), jnp.asarray(taps), decim=2)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(y_once),
                               atol=1e-5)


def test_xlat_recovers_offset_tone():
    fs = 96000.0
    f0 = 20000.0
    taps = T.low_pass_2(1.0, fs, 6000, 2000, 60)
    x = M.tone(fs, f0 + 1000.0, 9600)  # signal 1 kHz above channel center
    st = F.xlat_init(len(taps))
    st, y = F.freq_xlating_fir(st, jnp.asarray(x), jnp.asarray(taps),
                               jnp.float32(f0 / fs), decim=4)
    y = np.asarray(y)[64:]  # skip filter transient
    # Output should be a clean 1 kHz tone at fs/4.
    dphi = np.angle(y[1:] * np.conj(y[:-1]))
    est = np.mean(dphi) * (fs / 4) / (2 * np.pi)
    assert abs(est - 1000.0) < 5.0
    assert np.std(np.abs(y)) < 0.02


def test_xlat_block_split_equivalence(rng):
    fs = 96000.0
    taps = T.low_pass_2(1.0, fs, 6000, 3000, 60)
    x = (rng.standard_normal(16384) + 1j * rng.standard_normal(16384)
         ).astype(np.complex64)
    off = jnp.float32(0.13)
    st = F.xlat_init(len(taps))
    _, y_once = F.freq_xlating_fir(st, jnp.asarray(x), jnp.asarray(taps),
                                   off, decim=4)
    st = F.xlat_init(len(taps))
    outs = []
    for blk in x.reshape(8, -1):
        st, y = F.freq_xlating_fir(st, jnp.asarray(blk), jnp.asarray(taps),
                                   off, decim=4)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(y_once),
                               atol=2e-4)


def test_stopband_rejection():
    fs = 96000.0
    taps = T.low_pass_2(1.0, fs, 6000, 2000, 60)
    x = M.tone(fs, 30000.0, 16384)  # far out of band for a DC-centered LPF
    st = F.xlat_init(len(taps))
    _, y = F.freq_xlating_fir(st, jnp.asarray(x), jnp.asarray(taps),
                              jnp.float32(0.0), decim=4)
    assert np.max(np.abs(np.asarray(y)[128:])) < 10 ** (-50 / 20)
