"""Reed-Solomon codes over GF(2^6) for the P25 air interface.

The CAI protects hexbit fields with shortened RS codes over GF(64)
(field polynomial x^6 + x + 1):

- RS(24,12,13)  — LDU1/TLC Link Control (reference: rs64.py Codec(d=13))
- RS(36,20,17)  — HDU (MI/ALGID/KID/TGID)
- RS(24,16, 9)  — LDU2 Encryption Sync

Classic Berlekamp-Massey + Chien + Forney decoding (the reference's
rs64.py implements the same pipeline; this is an independent standard
implementation). Symbols are 6-bit "hexbits", MSB-first in the bit
stream.
"""

from __future__ import annotations

import numpy as np

_PRIM_POLY = 0b1000011  # x^6 + x + 1
_FIELD = 64

# exp/log tables
_EXP = np.zeros(128, np.int64)
_LOG = np.zeros(_FIELD, np.int64)
_x = 1
for _i in range(63):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x <<= 1
    if _x & _FIELD:
        _x ^= _PRIM_POLY
for _i in range(63, 128):
    _EXP[_i] = _EXP[_i - 63]


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return int(_EXP[_LOG[a] + _LOG[b]])


def _ginv(a: int) -> int:
    return int(_EXP[63 - _LOG[a]])


def _poly_mul(p, q):
    out = [0] * (len(p) + len(q) - 1)
    for i, a in enumerate(p):
        if a:
            for j, b in enumerate(q):
                out[i + j] ^= _gmul(a, b)
    return out


def _poly_eval(p, x):
    """p given highest-degree-first."""
    y = 0
    for c in p:
        y = _gmul(y, x) ^ c
    return y


class RS6:
    """Shortened systematic RS(n, k) over GF(64), d = n-k+1."""

    def __init__(self, n: int, k: int):
        self.n, self.k = n, k
        self.nroots = n - k
        self.t = self.nroots // 2
        g = [1]
        for i in range(1, self.nroots + 1):
            g = _poly_mul(g, [1, int(_EXP[i])])
        self.gen = g  # highest-degree first, len nroots+1

    # --- symbol-level ---
    def encode(self, data: np.ndarray) -> np.ndarray:
        """data: [k] symbols 0..63 -> [n] codeword (systematic)."""
        msg = list(np.asarray(data, np.int64)) + [0] * self.nroots
        for i in range(self.k):
            coef = msg[i]
            if coef:
                for j in range(1, len(self.gen)):
                    msg[i + j] ^= _gmul(self.gen[j], coef)
        parity = msg[self.k:]
        return np.concatenate([np.asarray(data, np.int64), parity]
                              ).astype(np.int64)

    def decode(self, word: np.ndarray) -> tuple[np.ndarray | None, int]:
        """word: [n] symbols -> (k data symbols or None, errors corrected)."""
        r = list(np.asarray(word, np.int64))
        # Syndromes; the shortened prefix symbols are implicitly zero.
        synd = [_poly_eval(r, int(_EXP[i])) for i in range(1, self.nroots + 1)]
        if max(synd) == 0:
            return np.asarray(r[: self.k]), 0

        # Berlekamp-Massey: error locator Lam (low-order first, Lam[0]=1).
        lam = [1]
        prev = [1]
        L = 0
        m = 1
        b = 1
        for step in range(self.nroots):
            d = synd[step]
            for i in range(1, L + 1):
                if i < len(lam):
                    d ^= _gmul(lam[i], synd[step - i])
            if d == 0:
                m += 1
                continue
            coef = _gmul(d, _ginv(b))
            shifted = [0] * m + [_gmul(coef, p) for p in prev]
            if len(shifted) > len(lam):
                lam = lam + [0] * (len(shifted) - len(lam))
            saved = lam[:]
            for i, v in enumerate(shifted):
                lam[i] ^= v
            if 2 * L <= step:
                L = step + 1 - L
                prev = saved
                b = d
                m = 1
            else:
                m += 1
        if L > self.t:
            return None, -1

        def eval_low(poly, x):
            """Evaluate low-order-first poly at x."""
            y = 0
            xl = _LOG[x]
            for i, c in enumerate(poly):
                if c:
                    y ^= _gmul(c, int(_EXP[(xl * i) % 63])) if x else (
                        c if i == 0 else 0)
            return y

        # Chien search: word position p is codeword location n-1-p; the
        # locator root there is X^{-1} = alpha^{-(n-1-p)}.
        err_pos = []
        xinvs = []
        for p in range(self.n):
            loc = self.n - 1 - p
            xinv = int(_EXP[(63 - (loc % 63)) % 63])
            if eval_low(lam, xinv) == 0:
                err_pos.append(p)
                xinvs.append(xinv)
        if len(err_pos) != L:
            return None, -1

        # Forney (first root alpha^1): e = Omega(Xinv) / Lam'(Xinv),
        # Omega = S(x)·Lam(x) mod x^{2t}.
        omega = [0] * self.nroots
        for i, si in enumerate(synd):
            if not si:
                continue
            for j, cj in enumerate(lam):
                if cj and i + j < self.nroots:
                    omega[i + j] ^= _gmul(si, cj)
        for p, xinv in zip(err_pos, xinvs):
            num = eval_low(omega, xinv)
            # Formal derivative: odd-degree terms of Lam.
            den = eval_low([lam[i] if i % 2 == 1 else 0
                            for i in range(len(lam))][1:], xinv)
            if den == 0:
                return None, -1
            r[p] ^= _gmul(num, _ginv(den))

        synd2 = [_poly_eval(r, int(_EXP[i]))
                 for i in range(1, self.nroots + 1)]
        if max(synd2) != 0:
            return None, -1
        return np.asarray(r[: self.k]), L

    # --- bit-level (hexbits, MSB first) ---
    def encode_bits(self, bits: np.ndarray) -> np.ndarray:
        b = np.asarray(bits, np.uint8).reshape(self.k, 6)
        syms = b @ (1 << np.arange(5, -1, -1))
        cw = self.encode(syms)
        out = ((cw[:, None] >> np.arange(5, -1, -1)) & 1).astype(np.uint8)
        return out.reshape(-1)

    def decode_bits(self, bits: np.ndarray) -> tuple[np.ndarray | None, int]:
        b = np.asarray(bits, np.uint8).reshape(self.n, 6)
        syms = b @ (1 << np.arange(5, -1, -1))
        data, nerr = self.decode(syms)
        if data is None:
            return None, -1
        out = ((data[:, None] >> np.arange(5, -1, -1)) & 1).astype(np.uint8)
        return out.reshape(-1), nerr


rs_24_12 = RS6(24, 12)
rs_36_20 = RS6(36, 20)
rs_24_16 = RS6(24, 16)
