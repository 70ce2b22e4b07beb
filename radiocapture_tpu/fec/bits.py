"""Bit/dibit array helpers (uint8 numpy arrays of 0/1 values).

The decode layer works on explicit bit arrays instead of the reference's
python bit-strings (reference: bit_utils.py, p25_general.py:289-310) —
same information, vectorizable representation.
"""

from __future__ import annotations

import numpy as np


def bytes_to_bits(data: bytes | np.ndarray) -> np.ndarray:
    return np.unpackbits(np.frombuffer(bytes(data), np.uint8))


def bits_to_bytes(bits: np.ndarray) -> bytes:
    bits = np.asarray(bits, np.uint8)
    pad = (-len(bits)) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
    return np.packbits(bits).tobytes()


def bits_to_int(bits: np.ndarray) -> int:
    v = 0
    for b in np.asarray(bits).tolist():
        v = (v << 1) | int(b)
    return v


def int_to_bits(value: int, width: int) -> np.ndarray:
    return np.array([(value >> (width - 1 - i)) & 1 for i in range(width)],
                    np.uint8)


def bits_to_dibits(bits: np.ndarray) -> np.ndarray:
    b = np.asarray(bits, np.uint8).reshape(-1, 2)
    return (b[:, 0] << 1 | b[:, 1]).astype(np.uint8)


def dibits_to_bits(dibits: np.ndarray) -> np.ndarray:
    d = np.asarray(dibits, np.uint8)
    return np.stack([(d >> 1) & 1, d & 1], axis=1).reshape(-1)


def hexstr(bits: np.ndarray) -> str:
    return hex(bits_to_int(bits))
