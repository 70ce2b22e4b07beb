"""Generic systematic linear block codec with syndrome-table decoding.

Backs the Golay and Hamming codecs: given a systematic generator matrix
G = [I | P] we precompute a syndrome → error-pattern table for all
patterns up to the correction radius. Decoding is then two bit-matrix
products and one table lookup — branch-free and batchable, unlike the
reference's per-codeword systematic search (golay.py:105-162).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np


def _bits_to_int(bits: np.ndarray) -> int:
    v = 0
    for b in bits.tolist():
        v = (v << 1) | int(b)
    return v


class LinearBlockCode:
    def __init__(self, parity: np.ndarray, t: int):
        """parity: [k, n-k] 0/1 matrix (P of G=[I|P]); t: correction radius."""
        self.P = np.asarray(parity, np.uint8)
        self.k, self.r = self.P.shape
        self.n = self.k + self.r
        self.t = t
        # H = [P^T | I]; syndrome of received word v is H v^T.
        self.H = np.concatenate([self.P.T, np.eye(self.r, dtype=np.uint8)],
                                axis=1)
        # Syndrome table: syndrome int -> error pattern (n bits); the
        # all-2 row marks "uncorrectable".
        self._table = np.full((1 << self.r, self.n), 2, np.uint8)
        for w in range(t + 1):
            for pos in combinations(range(self.n), w):
                e = np.zeros(self.n, np.uint8)
                e[list(pos)] = 1
                s = _bits_to_int((self.H @ e) % 2)
                if self._table[s, 0] == 2:
                    self._table[s] = e

    def encode(self, data: np.ndarray) -> np.ndarray:
        d = np.asarray(data, np.uint8)
        parity = (d @ self.P) % 2
        return np.concatenate([d, parity]).astype(np.uint8)

    def decode(self, word: np.ndarray) -> tuple[np.ndarray | None, int]:
        """Returns (data bits or None if uncorrectable, corrected bits)."""
        v = np.asarray(word, np.uint8) % 2
        s = _bits_to_int((self.H @ v) % 2)
        if s == 0:
            return v[: self.k], 0
        e = self._table[s]
        if e[0] == 2:
            return None, -1
        fixed = v ^ e
        return fixed[: self.k], int(e.sum())

    def decode_batch(self, words: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized decode of [m, n] words.

        Returns (data [m, k], ok [m] bool). Uncorrectable rows return the
        uncorrected systematic bits with ok=False.
        """
        v = np.asarray(words, np.uint8) % 2
        syn = (v @ self.H.T) % 2                       # [m, r]
        s_int = syn @ (1 << np.arange(self.r - 1, -1, -1)).astype(np.int64)
        e = self._table[s_int]                         # [m, n]
        ok = e[:, 0] != 2
        fixed = v ^ np.where(ok[:, None], e, 0)
        return fixed[:, : self.k], ok
