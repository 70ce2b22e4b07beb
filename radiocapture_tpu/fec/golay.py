"""Golay codecs for the P25 air interface.

- Golay(24,12,8): extended binary Golay, protects the Link Control words
  in the TLC (reference semantics: p25_general.py:108, real codec
  golay.py:27-46 built from generator polynomial x^11+x^10+x^6+x^5+x^4+x^2+1).
- Golay(18,6,8): shortened Golay protecting the HDU hexbits
  (p25_general.py:29).

Both decode through the shared syndrome-table machinery (fec.linear),
correcting up to 3 bit errors per codeword.
"""

from __future__ import annotations

import numpy as np

from radiocapture_tpu.fec.linear import LinearBlockCode

# (23,12) Golay generator polynomial (0xC75), plus overall parity extends
# to (24,12,8).
_GOLAY_POLY = 0b110001110101


def _cyclic_parity_matrix(k: int = 12, poly: int = _GOLAY_POLY,
                          deg: int = 11) -> np.ndarray:
    """Systematic parity rows: remainder of x^(deg+i) divided by g(x)."""
    rows = []
    for i in range(k):
        # message = single 1 at data position i (degree k-1-i + deg)
        rem = 1 << (deg + (k - 1 - i))
        for shift in range(k - 1 - i, -1, -1):
            if rem & (1 << (deg + shift)):
                rem ^= poly << shift
        rows.append([(rem >> (deg - 1 - j)) & 1 for j in range(deg)])
    return np.asarray(rows, np.uint8)


def _build_golay_24_12() -> LinearBlockCode:
    p23 = _cyclic_parity_matrix()               # [12, 11]
    # Extend with overall even parity over the 23-bit codeword.
    full = np.concatenate([np.eye(12, dtype=np.uint8), p23], axis=1)
    overall = full.sum(axis=1) % 2
    p24 = np.concatenate([p23, overall[:, None]], axis=1)  # [12, 12]
    return LinearBlockCode(p24, t=3)


def _build_golay_18_6() -> LinearBlockCode:
    """Shorten (24,12,8) by zeroing the first 6 data bits."""
    code24 = _build_golay_24_12()
    p = code24.P[6:, :]                          # [6, 12]
    return LinearBlockCode(p, t=3)


golay_24_12 = _build_golay_24_12()
golay_18_6 = _build_golay_18_6()


def encode_24_12(data12_bits: np.ndarray) -> np.ndarray:
    return golay_24_12.encode(data12_bits)


def decode_24_12(word24_bits: np.ndarray) -> tuple[np.ndarray | None, int]:
    return golay_24_12.decode(word24_bits)


def encode_18_6(data6_bits: np.ndarray) -> np.ndarray:
    return golay_18_6.encode(data6_bits)


def decode_18_6(word18_bits: np.ndarray) -> tuple[np.ndarray | None, int]:
    return golay_18_6.decode(word18_bits)
