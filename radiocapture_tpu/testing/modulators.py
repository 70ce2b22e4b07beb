"""Numpy modulators that synthesize on-air IQ for fixture generation.

These run on the host (fixture generation is not a hot path) and are the
inverse of the demod chains, so every decode test is closed-loop:
inject known bits → modulate → channel impairments → demod → compare.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as _sig

from radiocapture_tpu.ops import taps as _taps

# P25 C4FM dibit → symbol level (TIA-102.BAAA dibit/deviation mapping:
# 01→+1800 Hz, 00→+600, 10→-600, 11→-1800; levels in units of 600 Hz).
C4FM_LEVELS = np.array([+1.0, +3.0, -1.0, -3.0], np.float32)
C4FM_DEV_HZ = 600.0


def tone(fs: float, freq: float, n: int, amp: float = 1.0,
         phase0: float = 0.0) -> np.ndarray:
    t = np.arange(n) / fs
    return (amp * np.exp(1j * (2 * np.pi * freq * t + phase0))
            ).astype(np.complex64)


def fm_modulate(audio: np.ndarray, fs: float, max_dev: float,
                amp: float = 1.0) -> np.ndarray:
    """NBFM: instantaneous frequency = audio * max_dev (audio in [-1,1])."""
    phase = 2 * np.pi * np.cumsum(audio) * max_dev / fs
    return (amp * np.exp(1j * phase)).astype(np.complex64)


def freq_shift(x: np.ndarray, fs: float, freq: float) -> np.ndarray:
    n = np.arange(len(x))
    return (x * np.exp(2j * np.pi * freq * n / fs)).astype(np.complex64)


def awgn(x: np.ndarray, snr_db: float, rng=None) -> np.ndarray:
    rng = rng or np.random.default_rng(0)
    p_sig = np.mean(np.abs(x) ** 2)
    p_noise = p_sig / (10 ** (snr_db / 10))
    noise = (rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x)))
    noise *= np.sqrt(p_noise / 2)
    return (x + noise).astype(np.complex64)


def c4fm_modulate(dibits: np.ndarray, fs: float = 25000.0,
                  symbol_rate: float = 4800.0, amp: float = 1.0
                  ) -> np.ndarray:
    """P25 C4FM: dibits → 4-level deviation impulse train → RC+sinc-comp
    shaping → FM modulate. Generated at an integer samples-per-symbol
    rate then polyphase-resampled to ``fs``."""
    sps_gen = 10
    fs_gen = symbol_rate * sps_gen
    levels = C4FM_LEVELS[np.asarray(dibits, np.int64)]
    train = np.zeros(len(levels) * sps_gen, np.float32)
    train[::sps_gen] = levels
    shaping = _taps.c4fm_shaping(fs_gen, symbol_rate)
    dev = np.convolve(train, shaping, mode="full")[: len(train)]
    freq_hz = dev * C4FM_DEV_HZ
    # Resample deviation waveform to the channel rate, then integrate.
    up, down = _ratio(fs, fs_gen)
    freq_rs = _sig.resample_poly(freq_hz, up, down)
    phase = 2 * np.pi * np.cumsum(freq_rs) / fs
    return (amp * np.exp(1j * phase)).astype(np.complex64)


def fsk2_modulate(bits: np.ndarray, fs: float, baud: float, dev_hz: float,
                  amp: float = 1.0, invert: bool = False,
                  bt: float = 0.5) -> np.ndarray:
    """Binary FSK: bit 1 → +dev, bit 0 → -dev (or inverted), with a
    Gaussian-ish low-pass on the frequency trajectory.

    Used for EDACS (9600 baud) and Motorola Type II (3600 baud) control
    channel fixtures.
    """
    sps_gen = 8
    fs_gen = baud * sps_gen
    sig = np.asarray(bits, np.float32) * 2.0 - 1.0
    if invert:
        sig = -sig
    train = np.repeat(sig, sps_gen)
    # Mild pulse shaping to keep the spectrum in-channel.
    cutoff = bt * baud
    lp = _sig.firwin(int(4 * sps_gen) | 1, cutoff, fs=fs_gen)
    dev = np.convolve(train, lp, mode="same")
    up, down = _ratio(fs, fs_gen)
    freq_rs = _sig.resample_poly(dev * dev_hz, up, down)
    phase = 2 * np.pi * np.cumsum(freq_rs) / fs
    return (amp * np.exp(1j * phase)).astype(np.complex64)


def _ratio(out_rate: float, in_rate: float) -> tuple[int, int]:
    import math
    a, b = int(round(out_rate)), int(round(in_rate))
    g = math.gcd(a, b)
    return a // g, b // g


def multi_channel(fs: float, channels: list[tuple[float, np.ndarray]],
                  n: int, noise_floor_db: float = -60.0, rng=None
                  ) -> np.ndarray:
    """Compose a wideband capture from (offset_hz, narrowband_iq) pairs.

    Each narrowband signal must already be at rate ``fs`` (use
    ``scipy.signal.resample_poly`` to upsample channel-rate IQ first) or
    will be zero-padded/truncated to ``n``.
    """
    rng = rng or np.random.default_rng(1)
    out = (10 ** (noise_floor_db / 20.0) / np.sqrt(2)) * (
        rng.standard_normal(n) + 1j * rng.standard_normal(n))
    for off, sig in channels:
        s = np.zeros(n, np.complex64)
        m = min(n, len(sig))
        s[:m] = sig[:m]
        out += freq_shift(s, fs, off)
    return out.astype(np.complex64)


def upsample_to(x: np.ndarray, from_rate: float, to_rate: float
                ) -> np.ndarray:
    up, down = _ratio(to_rate, from_rate)
    return _sig.resample_poly(x, up, down).astype(np.complex64)
