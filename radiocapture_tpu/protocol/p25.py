"""P25 CAI frame processing: framing, NID, DUID dispatch, TSBK/LC decode.

Host-side protocol layer operating on numpy bit arrays. Mirrors the
decode semantics of the reference's p25_general.py (procHDU:21,
procTSDU:75, procLDU1:45, procTLC:101, subprocTSBK:113, subprocLC:156,
procStatus:175) with real FEC where the reference uses pass-through
decoders (p25_general.py:198-233), and adds the encode direction the
reference lacks so every path is fixture-testable (SURVEY.md §4).

Frame structure (TIA-102.BAAA): 48-bit frame sync, 64-bit NID
(12-bit NAC + 4-bit DUID + 48-bit BCH parity + 1 parity bit), payload;
a 2-bit status symbol is interleaved into the stream after every 70
transmitted bits.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from radiocapture_tpu.fec import bits as B
from radiocapture_tpu.fec import crc as CRC
from radiocapture_tpu.fec import golay as G
from radiocapture_tpu.fec import hamming as H
from radiocapture_tpu.fec import trellis as TR
from radiocapture_tpu.fec.rs6 import rs_24_12, rs_36_20
from radiocapture_tpu.protocol.p25_fields import (TSBK_MOTO, TSBK_OSP,
                                                  fields_for)

FRAME_SYNC_HEX = 0x5575F5FF77FF
FRAME_SYNC_BITS = B.int_to_bits(FRAME_SYNC_HEX, 48)
FRAME_SYNC_DIBITS = B.bits_to_dibits(FRAME_SYNC_BITS)

DUID_HDU = 0x0
DUID_TDU = 0x3
DUID_LDU1 = 0x5
DUID_TSDU = 0x7
DUID_LDU2 = 0xA
DUID_PDU = 0xC
DUID_TLC = 0xF

# Short names follow the reference's event vocabulary exactly — the
# call managers switch on them (p25_general.py:22-102,
# p25_call_manager.py:349).
DATA_UNIT_NAMES = {
    DUID_HDU: "HDU",
    DUID_TDU: "TnoLC",
    DUID_LDU1: "LDU1",
    DUID_TSDU: "TSDU",
    DUID_LDU2: "LDU2",
    DUID_PDU: "PDU",
    DUID_TLC: "TLC",
}
DATA_UNIT_LONG_NAMES = {
    DUID_HDU: "Header Data Unit",
    DUID_TDU: "Terminator without Link Control",
    DUID_LDU1: "Logical Link Data Unit 1",
    DUID_TSDU: "Trunking Signaling Data Unit",
    DUID_LDU2: "Logical Link Data Unit 2",
    DUID_PDU: "Packet Data Unit",
    DUID_TLC: "Terminator with Link Control",
}


# ---------------------------------------------------------------- status
def strip_status(bits: np.ndarray) -> tuple[np.ndarray, list[int]]:
    """Remove the 2-bit status symbol after every 70 payload bits.

    Same walk as the reference (p25_general.py:175-184): per 72-bit
    stride keep 70, record the status dibit.
    """
    bits = np.asarray(bits, np.uint8)
    out = []
    status = []
    for i in range(0, len(bits), 72):
        chunk = bits[i: i + 70]
        out.append(chunk)
        if len(bits) >= i + 72:
            status.append(int(bits[i + 70]) << 1 | int(bits[i + 71]))
    return np.concatenate(out) if out else bits[:0], status


def insert_status(bits: np.ndarray, status_dibit: int = 1) -> np.ndarray:
    """Inverse of strip_status, for fixture encoding."""
    bits = np.asarray(bits, np.uint8)
    sd = np.array([status_dibit >> 1, status_dibit & 1], np.uint8)
    out = []
    for i in range(0, len(bits), 70):
        chunk = bits[i: i + 70]
        out.append(chunk)
        if len(chunk) == 70:
            out.append(sd)
    return np.concatenate(out)


# ---------------------------------------------------------------- NID
def make_nid(nac: int, duid: int) -> np.ndarray:
    """64-bit NID. The 48 parity bits are the BCH(63,16,23) remainder;
    receivers here validate NAC/DUID positionally (the reference never
    checks NID parity either, p25_control_demod.py:347-348)."""
    info = B.int_to_bits(((nac & 0xFFF) << 4) | (duid & 0xF), 16)
    parity = _bch_63_16_parity(info)
    return np.concatenate([info, parity, np.zeros(1, np.uint8)])


# BCH(63,16) generator polynomial (degree 47), product of the minimal
# polynomials for alpha^1..alpha^23 over GF(2^6) — computed once.
def _bch_63_16_genpoly() -> int:
    # GF(64) with x^6+x+1; build product of distinct minimal polynomials
    # of alpha^i for i in 1..46 (design distance 23 -> roots alpha^1..22).
    prim = 0b1000011
    # exp table
    exp = [0] * 126
    x = 1
    for i in range(63):
        exp[i] = x
        x <<= 1
        if x & 64:
            x ^= prim
    for i in range(63, 126):
        exp[i] = exp[i - 63]

    def gf_mul(a, b, log={v: i for i, v in enumerate(exp[:63])}):
        if a == 0 or b == 0:
            return 0
        return exp[(log[a] + log[b]) % 63]

    # minimal polynomial of alpha^i: product over conjugacy class
    seen = set()
    gen = [1]  # binary polynomial, low-order first
    for i in range(1, 23):
        if i in seen:
            continue
        cls = set()
        j = i
        while j not in cls:
            cls.add(j)
            j = (j * 2) % 63
        seen |= cls
        # minpoly = prod (x - alpha^j) over GF(64), coefficients end in GF(2)
        mp = [1]
        for j in cls:
            a = exp[j]
            nxt = [0] * (len(mp) + 1)
            for d, c in enumerate(mp):
                nxt[d + 1] ^= c            # x * c
                nxt[d] ^= gf_mul(c, a)     # alpha^j * c
            mp = nxt
        assert all(c in (0, 1) for c in mp)
        # multiply into gen (GF(2) polynomials)
        out = [0] * (len(gen) + len(mp) - 1)
        for d1, c1 in enumerate(gen):
            if c1:
                for d2, c2 in enumerate(mp):
                    out[d1 + d2] ^= c2
        gen = out
    v = 0
    for d, c in enumerate(gen):
        v |= c << d
    return v


_BCH_GEN = _bch_63_16_genpoly()
_BCH_DEG = _BCH_GEN.bit_length() - 1  # 47


def _bch_63_16_parity(info16: np.ndarray) -> np.ndarray:
    """47 BCH parity bits + 1 pad to fill the 64-bit NID."""
    msg = B.bits_to_int(info16) << _BCH_DEG
    for shift in range(15, -1, -1):
        if msg & (1 << (_BCH_DEG + shift)):
            msg ^= _BCH_GEN << shift
    return B.int_to_bits(msg, _BCH_DEG)


# ---------------------------------------------------------------- results
@dataclass
class Frame:
    duid: int
    nac: int
    short: str
    fields: dict = field(default_factory=dict)
    tsbks: list = field(default_factory=list)
    status: list = field(default_factory=list)
    errors: float = 0.0


def parse_frame(bits: np.ndarray) -> Frame:
    """Parse one frame (sync through just-before-next-sync), with status
    symbols still embedded — the contract the reference's receive_engine
    hands to p25_general (p25_control_demod.py:343-380)."""
    payload, status = strip_status(bits)
    if len(payload) < 112:
        raise ValueError("frame shorter than sync+NID")
    nid = payload[48:112]
    nac = B.bits_to_int(nid[:12])
    duid = B.bits_to_int(nid[12:16])
    body = payload[112:]
    fr = Frame(duid=duid, nac=nac,
               short=DATA_UNIT_NAMES.get(duid, "UNKNOWN"), status=status)
    if duid == DUID_TSDU:
        _parse_tsdu(body, fr)
    elif duid == DUID_HDU:
        _parse_hdu(body, fr)
    elif duid == DUID_LDU1:
        _parse_ldu1(body, fr)
    elif duid == DUID_TLC:
        _parse_tlc(body, fr)
    return fr


def _parse_tsdu(body: np.ndarray, fr: Frame) -> None:
    """Up to 3 TSBKs of 196 bits; stop after the Last Block flag."""
    while len(body) >= 196:
        blk, errs = TR.tsbk_decode(body[:196])
        body = body[196:]
        fr.errors += errs
        t = unpack_tsbk(blk)
        fr.tsbks.append(t)
        if t["lb"] == 1:
            break


def unpack_tsbk(block96: np.ndarray) -> dict:
    """96-bit CRC-protected TSBK -> field dict (reference contract:
    p25_general.py:113-155; crc 0 = good, 1 = bad)."""
    t: dict = {}
    t["crc"] = 0 if CRC.tsbk_crc_check(block96) else 1
    t["lb"] = int(block96[0])
    t["p"] = int(block96[1])
    t["opcode"] = B.bits_to_int(block96[2:8])
    t["mfid"] = B.bits_to_int(block96[8:16])
    name, fields = fields_for(t["mfid"], t["opcode"])
    if name is None:
        t["name"] = ("UNKNOWN MFID" if t["mfid"] not in (0, 1, 0x90)
                     else "UNKNOWN OPCODE")
        t["data"] = B.hexstr(block96)
        return t
    t["name"] = name
    pos = 16
    for fname, width in fields:
        t[fname] = B.bits_to_int(block96[pos: pos + width])
        pos += width
    return t


def pack_tsbk(name_or_opcode, mfid: int = 0, last_block: bool = False,
              **field_values) -> np.ndarray:
    """Fixture encoder: build a CRC'd 96-bit TSBK from field values."""
    src = TSBK_OSP if mfid in (0, 1) else TSBK_MOTO
    table = {v[0]: (k, v[1]) for k, v in src.items()}
    if isinstance(name_or_opcode, str):
        opcode, fields = table[name_or_opcode]
    else:
        opcode = name_or_opcode
        _, fields = fields_for(mfid, opcode)
    bits = [np.array([1 if last_block else 0, 0], np.uint8),
            B.int_to_bits(opcode, 6), B.int_to_bits(mfid, 8)]
    used = 0
    for fname, width in fields:
        bits.append(B.int_to_bits(field_values.get(fname, 0), width))
        used += width
    if used < 64:
        bits.append(np.zeros(64 - used, np.uint8))
    data80 = np.concatenate(bits)[:80]
    return CRC.tsbk_crc_encode(data80)


def _parse_hdu(body: np.ndarray, fr: Frame) -> None:
    """HDU: 36 Golay(18,6) codewords -> 27 hexbits RS(36,20) -> fields."""
    if len(body) < 648:
        raise ValueError("HDU short")
    words = body[:648].reshape(36, 18)
    hexbits = []
    for w in words:
        d, _ = G.decode_18_6(w)
        hexbits.append(d if d is not None else w[:6])
        if d is None:
            fr.errors += 1
    rs_in = np.concatenate(hexbits)
    dec, nerr = rs_36_20.decode_bits(rs_in)
    if dec is None:
        dec = rs_in[:120]
        fr.errors += 10
    fr.fields["mi"] = B.hexstr(dec[:72])
    fr.fields["mfid"] = B.bits_to_int(dec[72:80])
    fr.fields["algid"] = B.bits_to_int(dec[80:88])
    fr.fields["kid"] = B.bits_to_int(dec[88:104])
    fr.fields["tgid"] = B.bits_to_int(dec[104:120])


def _parse_ldu1(body: np.ndarray, fr: Frame) -> None:
    """LDU1: 9 IMBE codewords + 240-bit Hamming-protected Link Control
    (interleave layout per p25_general.py:45-74)."""
    if len(body) < 1568:
        raise ValueError("LDU1 short")
    vc = [body[0:144], body[144:288], body[328:472], body[512:656],
          body[696:840], body[880:1024], body[1064:1208], body[1248:1392],
          body[1424:1568]]
    lc_bits = np.concatenate([body[288:328], body[472:512], body[656:696],
                              body[840:880], body[1024:1064],
                              body[1208:1248]])
    fr.fields["vc"] = vc
    fr.fields["lsd"] = body[1392:1424]
    decoded = []
    for w in lc_bits.reshape(24, 10):
        d, _ = H.decode_10_6(w)
        decoded.append(d if d is not None else w[:6])
        if d is None:
            fr.errors += 1
    fr.fields["lc"] = parse_link_control(np.concatenate(decoded))


def _parse_tlc(body: np.ndarray, fr: Frame) -> None:
    """TLC: 12 Golay(24,12) words -> 144 bits -> LC."""
    if len(body) < 288:
        raise ValueError("TLC short")
    words = body[:288].reshape(12, 24)
    decoded = []
    for w in words:
        d, _ = G.decode_24_12(w)
        decoded.append(d if d is not None else w[:12])
        if d is None:
            fr.errors += 1
    fr.fields["lc"] = parse_link_control(np.concatenate(decoded))


def parse_link_control(lc144: np.ndarray) -> dict:
    """RS(24,12)-protected Link Control word (p25_general.py:156-174)."""
    dec, _ = rs_24_12.decode_bits(lc144[:144])
    if dec is None:
        dec = lc144[:72]
    r = {"short": "LC"}
    r["pf"] = int(dec[0])
    r["sf"] = int(dec[1])
    r["lcf"] = B.bits_to_int(dec[2:8])
    r["mfid"] = B.bits_to_int(dec[8:16])
    if r["lcf"] == 0x0:
        r["lcf_long"] = "Group Voice Channel User"
        r["emergency"] = int(dec[16])
        r["tgid"] = B.bits_to_int(dec[32:48])
        r["source_id"] = B.bits_to_int(dec[48:72])
    elif r["lcf"] == 0x15:
        r["lcf_long"] = "Call Termination / Cancellation"
    elif r["lcf"] == 0x02:
        # Group Voice Channel Update: the reference call manager has a
        # handler for this (p25_call_manager.py:367-370) but its LC
        # parser never emits it (p25_general.py:156-174 covers only
        # 0x0/0x15) — parsed here so the branch is live. TIA-102.AABF
        # LCO 0x02 carries no MFID octet: 4 x 16-bit fields follow the
        # first octet directly.
        r["lcf_long"] = "Group Voice Channel Update"
        del r["mfid"]
        r["channel_a"] = B.bits_to_int(dec[8:24])
        r["channel_a_group"] = B.bits_to_int(dec[24:40])
        r["channel_b"] = B.bits_to_int(dec[40:56])
        r["channel_b_group"] = B.bits_to_int(dec[56:72])
    return r


def make_link_control(lcf: int, mfid: int = 0, tgid: int = 0,
                      source_id: int = 0, emergency: int = 0) -> np.ndarray:
    """72 LC bits -> RS(24,12)-coded 144 bits (fixture encoder)."""
    bits = np.zeros(72, np.uint8)
    bits[2:8] = B.int_to_bits(lcf, 6)
    bits[8:16] = B.int_to_bits(mfid, 8)
    if lcf == 0x0:
        bits[16] = emergency
        bits[32:48] = B.int_to_bits(tgid, 16)
        bits[48:72] = B.int_to_bits(source_id, 24)
    return rs_24_12.encode_bits(bits)


# ---------------------------------------------------------------- encode
def build_tsdu_frame(nac: int, tsbks96: list[np.ndarray]) -> np.ndarray:
    """Transmit bits for one TSDU (status symbols included)."""
    assert 1 <= len(tsbks96) <= 3
    parts = [FRAME_SYNC_BITS, make_nid(nac, DUID_TSDU)]
    for i, blk in enumerate(tsbks96):
        blk = np.asarray(blk, np.uint8).copy()
        blk[0] = 1 if i == len(tsbks96) - 1 else 0
        # Re-CRC after setting the Last Block flag.
        blk = CRC.tsbk_crc_encode(blk[:80])
        parts.append(TR.tsbk_encode(blk))
    return insert_status(np.concatenate(parts))


def build_tlc_frame(nac: int, lc144: np.ndarray) -> np.ndarray:
    """Terminator with Link Control: 12 Golay(24,12) words."""
    words = [G.encode_24_12(d) for d in lc144.reshape(12, 12)]
    parts = [FRAME_SYNC_BITS, make_nid(nac, DUID_TLC),
             np.concatenate(words)]
    return insert_status(np.concatenate(parts))


def build_hdu_frame(nac: int, mi: np.ndarray | None = None, mfid: int = 0,
                    algid: int = 0, kid: int = 0, tgid: int = 0) -> np.ndarray:
    """Header Data Unit: 120 info bits -> RS(36,20) -> 36 Golay(18,6)
    words (inverse of _parse_hdu; reference decode: p25_general.py:21-36)."""
    if mi is None:
        mi = np.zeros(72, np.uint8)
    info = np.concatenate([np.asarray(mi, np.uint8),
                           B.int_to_bits(mfid, 8), B.int_to_bits(algid, 8),
                           B.int_to_bits(kid, 16), B.int_to_bits(tgid, 16)])
    coded = rs_36_20.encode_bits(info)  # 216 bits = 36 hexbits
    words = [G.encode_18_6(d) for d in coded.reshape(36, 6)]
    parts = [FRAME_SYNC_BITS, make_nid(nac, DUID_HDU),
             np.concatenate(words)]
    return insert_status(np.concatenate(parts))


def build_ldu1_frame(nac: int, lc144: np.ndarray,
                     vc_bits: np.ndarray | None = None) -> np.ndarray:
    """LDU1 with the interleaved vc/lc/lsd layout (inverse of
    _parse_ldu1). vc_bits: [9,144] IMBE codewords (zeros if None)."""
    if vc_bits is None:
        vc_bits = np.zeros((9, 144), np.uint8)
    lc_words = np.concatenate(
        [H.encode_10_6(d) for d in
         _rs_lc_hexbits(lc144)])  # 24 codewords -> 240 bits
    seg = lc_words.reshape(6, 40)
    lsd = np.zeros(32, np.uint8)
    body = np.concatenate([
        vc_bits[0], vc_bits[1], seg[0], vc_bits[2], seg[1], vc_bits[3],
        seg[2], vc_bits[4], seg[3], vc_bits[5], seg[4], vc_bits[6],
        seg[5], vc_bits[7], lsd, vc_bits[8]])
    parts = [FRAME_SYNC_BITS, make_nid(nac, DUID_LDU1), body]
    return insert_status(np.concatenate(parts))


def _rs_lc_hexbits(lc144: np.ndarray) -> np.ndarray:
    return np.asarray(lc144, np.uint8).reshape(24, 6)
