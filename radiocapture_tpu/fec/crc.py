"""CRC codecs used by the P25 air interface.

- CRC-16/CCITT (poly 0x1021, init 0, final invert) protects TSBKs
  (reference semantics: p25_general.py:185-196 — shift-through over all
  96 bits, result 0 on a valid block after the final inversion).
"""

from __future__ import annotations

import numpy as np

_POLY16 = 0x1021


def crc16_ccitt(bits: np.ndarray) -> int:
    """Bitwise CRC-16/CCITT, init 0, no reflection, no final xor."""
    crc = 0
    for b in np.asarray(bits, np.uint8).tolist():
        crc = ((crc << 1) | int(b)) & 0x1FFFF
        if crc & 0x10000:
            crc = (crc & 0xFFFF) ^ _POLY16
    # Flush 16 zero bits (divide message * x^16).
    for _ in range(16):
        crc = (crc << 1) & 0x1FFFF
        if crc & 0x10000:
            crc = (crc & 0xFFFF) ^ _POLY16
    return crc


def tsbk_crc_encode(data80: np.ndarray) -> np.ndarray:
    """Append the inverted CCITT CRC: 80 data bits -> 96-bit block."""
    from radiocapture_tpu.fec.bits import int_to_bits
    crc = crc16_ccitt(data80) ^ 0xFFFF
    return np.concatenate([np.asarray(data80, np.uint8),
                           int_to_bits(crc, 16)])


def tsbk_crc_check(block96: np.ndarray) -> bool:
    """True iff the 96-bit TSBK passes CRC (inverted-remainder form)."""
    block96 = np.asarray(block96, np.uint8)
    crc = crc16_ccitt(block96[:80]) ^ 0xFFFF
    from radiocapture_tpu.fec.bits import bits_to_int
    return crc == bits_to_int(block96[80:96])
