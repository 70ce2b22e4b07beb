"""Hamming(10,6,3) — protects Link Control words inside LDU1 frames.

Parity matrix per TIA-102.BAAA-A Table 5-4 (the same matrix the
reference's hamming.py:35-46 encodes); single-bit correction via the
shared syndrome-table decoder.
"""

from __future__ import annotations

import numpy as np

from radiocapture_tpu.fec.linear import LinearBlockCode

# Rows of P for G = [I6 | P] (TIA-102.BAAA-A Table 5-4).
_P = np.array([
    [1, 1, 1, 0],
    [1, 1, 0, 1],
    [1, 0, 1, 1],
    [0, 1, 1, 1],
    [0, 0, 1, 1],
    [1, 1, 0, 0],
], np.uint8)

hamming_10_6 = LinearBlockCode(_P, t=1)


def encode_10_6(data6_bits: np.ndarray) -> np.ndarray:
    return hamming_10_6.encode(data6_bits)


def decode_10_6(word10_bits: np.ndarray) -> tuple[np.ndarray | None, int]:
    return hamming_10_6.decode(word10_bits)
