"""P25 1/2-rate trellis code (TIA-102.BAAA §7) + 196-bit data interleave.

The encoder is a 4-state machine over dibits: for previous data dibit
``s`` and current data dibit ``d`` it emits the 4-bit constellation word
``TRANSITION[s][d]``, transmitted as two dibits. The decoder here is a
full Viterbi (soft on Hamming distance), strictly stronger than the
reference's greedy per-step matcher (p25_general.py:234-273) while
producing identical output on its correctable inputs.

Interleave schedule per the 196-bit data-block interleave of the CAI
(reference semantics: p25_general.py:275-281).
"""

from __future__ import annotations

import numpy as np

# TRANSITION[prev_dibit][cur_dibit] -> 4-bit constellation word.
# TIA-102.BAAA trellis state-transition / constellation mapping.
TRANSITION = np.array([
    [0x2, 0xC, 0x1, 0xF],
    [0xE, 0x0, 0xD, 0x3],
    [0x9, 0x7, 0xA, 0x4],
    [0x5, 0xB, 0x6, 0x8],
], np.uint8)

# Hamming distance between two 4-bit words, precomputed.
_POPCNT4 = np.array([bin(i).count("1") for i in range(16)], np.uint8)
_HD = _POPCNT4[np.arange(16)[:, None] ^ np.arange(16)[None, :]]


def trellis_encode(dibits48: np.ndarray) -> np.ndarray:
    """48 data dibits -> 98 coded dibits (adds a flush dibit 0)."""
    data = np.concatenate([np.asarray(dibits48, np.uint8),
                           np.zeros(1, np.uint8)])
    out = np.empty(2 * len(data), np.uint8)
    state = 0
    for i, d in enumerate(data.tolist()):
        w = TRANSITION[state][d]
        out[2 * i] = w >> 2
        out[2 * i + 1] = w & 3
        state = d
    return out


def trellis_decode(dibits98: np.ndarray) -> tuple[np.ndarray, float]:
    """Viterbi-decode 98 coded dibits -> (48 data dibits, error metric).

    The error metric counts corrected constellation bits (comparable to
    the reference's error_count bookkeeping).
    """
    d = np.asarray(dibits98, np.uint8)
    words = (d[0::2] << 2 | d[1::2]).astype(np.int64)  # 49 received words
    n = len(words)
    # path_metric[s]: best distance ending in state s; backptr for traceback
    pm = np.full(4, 255, np.int64)
    pm[0] = 0
    bp = np.zeros((n, 4), np.int64)
    for t in range(n):
        dist = _HD[TRANSITION, words[t]]          # [prev_state, dibit]
        cand = pm[:, None] + dist                 # [prev, cur]
        bp[t] = np.argmin(cand, axis=0)
        pm = cand[bp[t], np.arange(4)]
    # Final dibit is the known flush (0): trace back from state 0.
    end = 0
    errors = float(pm[end])
    out = np.empty(n, np.uint8)
    s = end
    for t in range(n - 1, -1, -1):
        out[t] = s
        s = bp[t, s]
    return out[:48], errors


# 196-bit (98-dibit) data interleave: transmitted dibit t maps to
# deinterleaved position via the (i, j) schedule of the CAI.
def _build_perm() -> np.ndarray:
    order = []
    for i in range(0, 23, 2):
        for j in (0, 26, 50, 74):
            order.extend([i + j, i + j + 1])
    order.extend([24, 25])
    return np.array(order, np.int64)


_DEINT = _build_perm()           # deinterleaved[k] = received[_DEINT[k]]
_INT = np.argsort(_DEINT)        # transmitted[k] = coded[_INT[k]] inverse


def deinterleave(dibits98: np.ndarray) -> np.ndarray:
    return np.asarray(dibits98, np.uint8)[_DEINT]


def interleave(dibits98: np.ndarray) -> np.ndarray:
    d = np.asarray(dibits98, np.uint8)
    out = np.zeros_like(d)
    out[_DEINT] = d
    return out


def tsbk_encode(block96: np.ndarray) -> np.ndarray:
    """96-bit CRC-protected TSBK -> 196 transmitted bits."""
    from radiocapture_tpu.fec.bits import bits_to_dibits, dibits_to_bits
    coded = trellis_encode(bits_to_dibits(block96))
    return dibits_to_bits(interleave(coded))


def tsbk_decode(bits196: np.ndarray) -> tuple[np.ndarray, float]:
    """196 received bits -> (96-bit TSBK, trellis error metric)."""
    from radiocapture_tpu.fec.bits import bits_to_dibits, dibits_to_bits
    coded = deinterleave(bits_to_dibits(np.asarray(bits196)[:196]))
    data, errs = trellis_decode(coded)
    return dibits_to_bits(data), errs
