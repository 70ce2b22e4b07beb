"""EDACS control-channel protocol: BCH(48,36,5), framing, command tree.

Facts of the EDACS air interface as decoded by the reference
(edacs_control_demod.py): 9600-baud FSK; 48-bit frame sync
``0101...0111000100100101...``; each 288-bit frame carries two 40-bit
messages, each transmitted three times with the middle copy inverted
(packet_framer, edacs_control_demod.py:373-395); a message is 28 command
bits + 12 BCH parity computed over 8 zero "color" bits + the 28
(bch_decode, edacs_control_demod.py:451-518); triple-redundant majority
election after per-copy BCH decode (message_election, :172-189); ESK
systems OR 0xA into the top nibble (:392-394).

The BCH(48,36,5) here is the shortened BCH(63,51) over GF(2^6)
(g(x) = m1(x)·m3(x), t=2), implemented independently with an encode
direction for fixtures.
"""

from __future__ import annotations

import numpy as np

from radiocapture_tpu.fec import bits as B

FRAME_SYNC = np.array([int(c) for c in
                       "010101010101010101010111000100100101010101010101"],
                      np.uint8)
FRAME_BITS = 240          # two triple-redundant 40-bit messages
FULL_FRAME = 288          # sync + frame
SYMBOL_RATE = 9600.0

# ---------------------------------------------------------------- BCH
# GF(64), x^6 + x + 1.
_EXP = np.zeros(128, np.int64)
_LOG = np.zeros(64, np.int64)
_x = 1
for _i in range(63):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x <<= 1
    if _x & 64:
        _x ^= 0b1000011
for _i in range(63, 128):
    _EXP[_i] = _EXP[_i - 63]

# g(x) = lcm(m1, m3): m1 = x^6+x+1, m3 = minimal poly of alpha^3.
def _genpoly() -> int:
    def minpoly(i):
        cls = set()
        j = i
        while j not in cls:
            cls.add(j)
            j = (j * 2) % 63
        mp = [1]
        for j in cls:
            a = int(_EXP[j])
            nxt = [0] * (len(mp) + 1)
            for d, c in enumerate(mp):
                nxt[d + 1] ^= c
                if c:
                    nxt[d] ^= int(_EXP[(_LOG[c] + _LOG[a]) % 63])
            mp = nxt
        assert all(c in (0, 1) for c in mp)
        return mp

    g = [1]
    for mp in (minpoly(1), minpoly(3)):
        out = [0] * (len(g) + len(mp) - 1)
        for d1, c1 in enumerate(g):
            if c1:
                for d2, c2 in enumerate(mp):
                    out[d1 + d2] ^= c2
        g = out
    v = 0
    for d, c in enumerate(g):
        v |= c << d
    return v


_GEN = _genpoly()
_GDEG = _GEN.bit_length() - 1  # 12


def bch_encode(data36: np.ndarray) -> np.ndarray:
    """36 data bits (8 color + 28 cmd) -> 48-bit codeword (systematic)."""
    msg = B.bits_to_int(data36) << _GDEG
    rem = msg
    for shift in range(35, -1, -1):
        if rem & (1 << (_GDEG + shift)):
            rem ^= _GEN << shift
    return np.concatenate([np.asarray(data36, np.uint8),
                           B.int_to_bits(rem, _GDEG)])


def bch_decode(word48: np.ndarray) -> tuple[np.ndarray | None, int]:
    """Correct up to 2 errors; returns (48 corrected bits or None, nerr).

    Received bit i (MSB-first) is the coefficient of x^(47-i); syndromes
    are evaluated over the full-length (63) code with the shortened
    prefix implicitly zero.
    """
    w = np.asarray(word48, np.uint8).copy()
    # positions: bit i ~ alpha-power (47 - i)
    def syndrome(bits, i):
        s = 0
        for p in np.nonzero(bits)[0]:
            s ^= int(_EXP[(i * (47 - int(p))) % 63])
        return s

    s1 = syndrome(w, 1)
    s3 = syndrome(w, 3)
    if s1 == 0 and s3 == 0:
        return w, 0
    if s1 != 0:
        # single error check: s3 == s1^3
        s1_log = int(_LOG[s1])
        if s3 == int(_EXP[(3 * s1_log) % 63]):
            pos = 47 - s1_log
            if 0 <= pos < 48:
                w[pos] ^= 1
                return w, 1
            return None, -1
        # two errors: error locator x^2 + s1 x + (s3 + s1^3)/s1
        s1cub = int(_EXP[(3 * s1_log) % 63])
        num = s3 ^ s1cub
        if num == 0:
            return None, -1
        c = int(_EXP[(_LOG[num] + 63 - s1_log) % 63])
        roots = []
        for loc in range(48):
            xv = int(_EXP[(47 - loc) % 63])
            # evaluate x^2 + s1 x + c at xv
            v = int(_EXP[(2 * _LOG[xv]) % 63]) ^ \
                int(_EXP[(s1_log + _LOG[xv]) % 63]) ^ c
            if v == 0:
                roots.append(loc)
        if len(roots) == 2:
            w[roots[0]] ^= 1
            w[roots[1]] ^= 1
            if syndrome(w, 1) == 0 and syndrome(w, 3) == 0:
                return w, 2
        return None, -1
    return None, -1


# ------------------------------------------------------------- framing
def elect_message(copies: np.ndarray) -> np.ndarray | None:
    """Triple-redundancy election (edacs_control_demod.py:172-189).

    copies: [3, 40] bits (polarity already normalized). BCH-decode each
    against the zero color prefix; majority vote on decodability.
    """
    dec = []
    for c in copies:
        word = np.concatenate([np.zeros(8, np.uint8), c])
        d, _ = bch_decode(word)
        dec.append(None if d is None else d[8:])
    d1, d2, d3 = dec
    ok = [d for d in dec if d is not None]
    if not ok:
        return None
    if len(ok) == 1:
        return ok[0]

    def eq(a, b):
        return a is not None and b is not None and np.array_equal(a, b)

    if eq(d1, d2) or eq(d1, d3):
        return d1
    if eq(d2, d3):
        return d2
    return None


def split_frame(frame240: np.ndarray) -> tuple[np.ndarray | None,
                                               np.ndarray | None]:
    """240 frame bits -> two elected 40-bit messages (middle copies are
    transmitted inverted)."""
    f = np.asarray(frame240, np.uint8)
    m1 = np.stack([f[0:40], 1 - f[40:80], f[80:120]])
    m2 = np.stack([f[120:160], 1 - f[160:200], f[200:240]])
    return elect_message(m1), elect_message(m2)


def build_frame(msg1_28: np.ndarray, msg2_28: np.ndarray) -> np.ndarray:
    """Fixture encoder: two 28-bit commands -> 288 transmitted bits."""
    out = [FRAME_SYNC]
    for m in (msg1_28, msg2_28):
        word = bch_encode(np.concatenate([np.zeros(8, np.uint8),
                                          np.asarray(m, np.uint8)]))
        body = word[8:]  # 40 bits
        out.extend([body, 1 - body, body])
    return np.concatenate(out)


def apply_esk(msg40: np.ndarray) -> np.ndarray:
    """ESK systems: OR 0xA into the top nibble post-election."""
    m = np.asarray(msg40, np.uint8).copy()
    m[0] |= 1
    m[2] |= 1
    return m


# --------------------------------------------------------- command tree
def is_double_message(m40: np.ndarray | None) -> bool:
    """Mirror of edacs_control_demod.py:331-345."""
    if m40 is None:
        return True
    mta = B.bits_to_int(m40[:3])
    if mta in (0b000, 0b010, 0b011, 0b101):
        return True
    if mta == 0b111:
        mtb = B.bits_to_int(m40[3:6])
        if mtb in (0b011, 0b101):
            return True
        if mtb == 0b111 and m40[6] == 1:
            return True
    return False


def proc_cmd(m1: np.ndarray, m2: np.ndarray | None,
             channels: dict[int, float] | None = None) -> dict | None:
    """Decode one (or one double) elected message into a typed event.

    Mirrors the MTA/MTB/MTD dispatch of edacs_control_demod.py:190-330.
    ``channels`` maps LCN -> frequency for grant enrichment.
    """
    r: dict = {}
    bi = B.bits_to_int
    mta = bi(m1[:3])
    if mta in (0b000, 0b010, 0b011, 0b101):
        if m2 is None:
            return None
        r["type"] = "call_assignment_analog"
        r["logical_id"] = bi(np.concatenate([m1[3:10], m2[4:11]]))
        r["channel"] = bi(m1[11:16])
        if channels is not None:
            if r["channel"] not in channels:
                return None
            r["frequency"] = channels[r["channel"]]
        r["tx_trunked"] = bool(m1[16])
        r["group"] = bi(m1[17:28])
        return r
    if mta != 0b111:
        r["type"] = "unknown_mta"
        r["mta"] = mta
        return r
    mtb = bi(m1[3:6])
    if mtb == 0b011:  # channel update / continuation
        mtc = bi(m1[6:8])
        r["mtc"] = mtc
        r["type"] = ("call_continuation_digital" if mtc == 3
                     else "call_continuation_analog")
        r["channel"] = bi(m1[8:13])
        if channels is not None:
            if r["channel"] not in channels:
                return None
            r["frequency"] = channels[r["channel"]]
        r["individual"] = int(m1[13])
        r["id"] = bi(m1[14:28])
        return r
    if mtb == 0b100:  # patch
        r["type"] = "patch"
        r["sgid"] = bi(m1[6:17])
        r["group"] = bi(m1[17:28])
        return r
    if mtb == 0b101:  # individual call
        if m2 is None:
            return None
        r["type"] = "individual_call"
        r["tx_trunked"] = bool(m1[6])
        r["channel"] = bi(m1[8:13])
        r["call_type"] = "Voice" if m1[13] else "UNKNOWN"
        r["callee_logical_id"] = bi(m1[14:28])
        r["caller_logical_id"] = bi(m2[14:28])
        return r
    if mtb == 0b110:  # unkey / drop
        r["type"] = "channel_drop" if m1[8] else "channel_unkey"
        r["channel"] = bi(m1[9:14])
        return r
    if mtb == 0b111:
        mtd = m1[6:11]
        mtd_i = bi(mtd)
        if mtd_i == 0b00001:
            r["type"] = "adjacent_site_cc"
            r["ccaddr"] = bi(m1[11:16])
            r["index"] = bi(m1[16:19])
            r["site_id"] = bi(m1[19:22])
        elif mtd_i == 0b00010:
            r["type"] = "extended_site_options"
            r["messageno"] = bi(m1[12:15])
            r["data"] = bi(m1[15:28])
        elif mtd_i == 0b00100:
            r["type"] = "regroup_plan_bitmap"
            r["bank"] = int(m1[11])
            r["residency"] = bi(m1[12:20])
            r["active"] = bi(m1[20:28])
        elif mtd_i == 0b00111:
            r["type"] = "unit_enable_disable"
            r["qualifier"] = bi(m1[12:14])
            r["logical_id"] = bi(m1[14:28])
        elif bi(mtd[:3]) == 0b010:
            r["type"] = "site_id"
            r["delay"] = bi(m1[9:11])
            r["channel"] = bi(m1[11:16])
            r["priority"] = bi(m1[16:19])
            r["trunking"] = int(m1[20])
            r["failsoft"] = int(m1[21])
            r["auxmain"] = int(m1[22])
            r["site_id"] = bi(m1[23:28])
        elif mtd[0] == 1:
            if m2 is None:
                return None
            r["type"] = "dynamic_regroup"
            r["fleet_bits"] = bi(m1[11:14])
            r["logical_id"] = bi(m1[14:28])
            r["plan_number"] = bi(m2[7:11])
            r["regroup_type"] = bi(m2[11:13])
            r["knob_setting"] = bi(m2[13:16])
            r["callee_logical_id"] = bi(m2[17:28])
        else:
            r["type"] = "unknown_mtd"
            r["mtd"] = mtd_i
        return r
    r["type"] = "unknown_mtb"
    r["mtb"] = mtb
    return r


# ------------------------------------------------------ fixture helpers
def make_call_assignment(lcn: int, group: int, logical_id: int,
                         tx_trunked: bool = False
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Encode a double-message analog voice grant (MTA 000)."""
    m1 = np.zeros(28, np.uint8)
    m2 = np.zeros(28, np.uint8)
    m1[:3] = B.int_to_bits(0b000, 3)
    lid = B.int_to_bits(logical_id, 14)
    m1[3:10] = lid[:7]
    m2[4:11] = lid[7:]
    m1[11:16] = B.int_to_bits(lcn, 5)
    m1[16] = 1 if tx_trunked else 0
    m1[17:28] = B.int_to_bits(group, 11)
    # m2 MTA copies m1's for doubles.
    m2[:3] = B.int_to_bits(0b000, 3)
    return m1, m2


def make_site_id(site_id: int, cc_lcn: int) -> np.ndarray:
    m = np.zeros(28, np.uint8)
    m[:3] = B.int_to_bits(0b111, 3)
    m[3:6] = B.int_to_bits(0b111, 3)
    m[6:11] = B.int_to_bits(0b01000, 5)
    m[11:16] = B.int_to_bits(cc_lcn, 5)
    m[20] = 1  # trunking
    m[23:28] = B.int_to_bits(site_id, 5)
    return m


def make_idle() -> np.ndarray:
    """A single 'filler' message (unknown-MTD family, harmless)."""
    m = np.zeros(28, np.uint8)
    m[:3] = B.int_to_bits(0b111, 3)
    m[3:6] = B.int_to_bits(0b010, 3)
    return m
