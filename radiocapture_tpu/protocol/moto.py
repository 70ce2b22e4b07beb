"""Motorola Type II trunking control-channel protocol (OSW decode).

Facts per the reference's receive engine (moto_control_demod.py):
3600-baud FSK; 8-bit frame sync ``10101100``; 76-bit frames holding 38
data bits interleaved 4x19 with 38 convolutional parity bits
(parity[x] = data[x-1] ^ data[x]); single-bit correction from adjacent
parity-syndrome pairs (:284-318); OSW fields lid = bits[0:16] ^ 0xCC38,
individual = bit 16, cmd = bits[17:27] ^ 0xD5 (:325-330); dual-word
grants keyed on a preceding 0x308 (analog) / 0x321 (digital) first word
(:342-520).
"""

from __future__ import annotations

import numpy as np

from radiocapture_tpu.fec import bits as B

FRAME_SYNC = np.array([1, 0, 1, 0, 1, 1, 0, 0], np.uint8)
FRAME_BITS = 76
SYMBOL_RATE = 3600.0

LID_MASK = 0xCC38
CMD_MASK = 0xD5

# First words that mark the following OSW as the second half of a pair.
DUAL_FIRST_WORDS = (0x304, 0x308, 0x309, 0x321)

# Single/dual command names (moto_control_demod.py:348-467). Entries:
# cmd -> (name_single, name_dual); None = not defined in that position.
OSW_TYPES: dict[int, tuple[str | None, str | None]] = {
    0x2F8: ("IDLE", None),
    0x300: ("Group and PC1 busy", "Group and PC1 busy"),
    0x301: ("Interconnect Busy", None),
    0x302: ("Private call busy", "Private call busy"),
    0x303: ("Emergency busy", "Emergency busy"),
    0x304: ("First-word of coded PC grant", "First-word of coded PC grant"),
    0x308: ("First-word normal", "First-word normal"),
    0x309: ("First-word TY2 aliased to TY1", "First-word TY2 aliased to TY1"),
    0x30A: (None, "TY2 dynamic regrouping"),
    0x30B: (None, "Extended function"),
    0x30C: ("TY1 Phone status", None),
    0x30D: (None, "Affiliation functions"),
    0x30F: ("TY1 Phone disconnect", None),
    0x310: ("TY1 status value 1", "Affiliation"),
    0x311: ("TY1 status value 2", "TY2 messages"),
    0x312: ("TY1 status value 3", None),
    0x313: ("TY1 status value 4", None),
    0x314: ("TY1 status value 5", None),
    0x315: ("TY1 status value 6", "PC coded ring"),
    0x316: ("TY1 status value 7", None),
    0x317: ("TY1 status value 8", "PC clear ring"),
    0x318: ("TY1 Call Alert", "TY2 PC Ring Ack"),
    0x319: ("TY1 Emergency alarm", "TY2 Call Alert"),
    0x31A: (None, "TY2 Call Alert Ack"),
    0x31B: (None, "Tresspass permitted [AVL indiv high prior grant]"),
    0x31C: (None, "[AVL indiv low prior grant]"),
    0x31D: (None, "[AVL group high prior grant]"),
    0x321: ("Digital call word1", "Digital call word1"),
    0x324: ("TY2 Interconnect reject", None),
    0x325: ("TY2 Interconnect transpond", None),
    0x326: ("TY2 Interconnect ring", None),
    0x32A: ("Send affiliation request", None),
    0x32B: ("Scan marker", None),
    0x32D: ("TY1 System wide announcement", None),
    0x32E: (None, "Emergency PTT announcement"),
    0x3A0: ("System diagnostic or BSI", None),
    0x3A8: ("System test", None),
    0x3B0: ("CSC version number", None),
}
for _c in range(0x340, 0x351):
    OSW_TYPES.setdefault(_c, (None, f"TY1 regrouping sizecode "
                                    f"{chr(ord('A') + (_c - 0x340))}"))


# ------------------------------------------------------------ interleave
def _perm() -> np.ndarray:
    order = []
    for x in range(19):
        for y in (0, 19, 38, 57):
            order.append(x + y)
    return np.array(order, np.int64)


_DEINT = _perm()
# deinterleaved[k] = tx[_DEINT[k]]


def deinterleave(bits76: np.ndarray) -> np.ndarray:
    return np.asarray(bits76, np.uint8)[_DEINT]


def interleave(bits76: np.ndarray) -> np.ndarray:
    out = np.zeros(76, np.uint8)
    out[_DEINT] = np.asarray(bits76, np.uint8)
    return out


# ------------------------------------------------------------ parity
def add_parity(data38: np.ndarray) -> np.ndarray:
    """38 data bits -> 76 alternating data/parity bits,
    parity[x] = data[x-1] ^ data[x] (data[-1] := 0)."""
    d = np.asarray(data38, np.uint8)
    prev = np.concatenate([[0], d[:-1]]).astype(np.uint8)
    parity = prev ^ d
    out = np.empty(76, np.uint8)
    out[0::2] = d
    out[1::2] = parity
    return out


def correct_parity(pkt76: np.ndarray) -> tuple[np.ndarray, bool]:
    """Single-bit correction via adjacent parity syndromes
    (moto_control_demod.py:284-318). Returns (38 data bits, had_errors)."""
    pkt = np.asarray(pkt76, np.uint8)
    data = pkt[0::2].copy()
    parity = pkt[1::2]
    prev = np.concatenate([[0], data[:-1]]).astype(np.uint8)
    expected = prev ^ data
    psyn = parity ^ expected
    # data syndrome == mismatch between recomputed and received parity;
    # adjacent parity-syndrome pairs isolate a flipped data bit.
    had = bool(psyn.any())
    if had:
        flips = np.nonzero((psyn[:-1] == 1) & (psyn[1:] == 1))[0]
        data[flips] ^= 1
    return data, had


# ------------------------------------------------------------ OSW
def parse_osw(data38: np.ndarray, *, last_cmd: int = 0, last_lid: int = 0,
              channels: dict[int, float] | None = None,
              system_id: int | None = None, control_channel: float = 0.0,
              cmd_offset: int | None = None,
              force_p25: bool = False) -> dict:
    """Decode one 38-bit OSW into a typed event, with the dual-word
    context the reference keeps in (last_cmd, last_data)."""
    bits = np.asarray(data38, np.uint8)
    lid = B.bits_to_int(bits[:16]) ^ LID_MASK
    tg = lid & 0xFFF0
    status = lid & 0xF
    individual = int(bits[16])
    cmd = B.bits_to_int(bits[17:27]) ^ CMD_MASK

    dual = last_cmd in DUAL_FIRST_WORDS
    p = {
        "cmd": cmd, "ind": "G" if individual else "I",
        "lid": lid, "tg": tg, "status": status, "dual": dual,
    }
    name = None
    if cmd in OSW_TYPES:
        single, dual_name = OSW_TYPES[cmd]
        name = dual_name if dual else single
    if cmd == 0x310 and dual:
        p["radio_id"] = last_lid
        p["tgid"] = lid
    if cmd in (0x3BF, 0x3C0) and not dual:
        opcode = (lid & 0xE000) >> 13
        p["opcode"] = opcode
        if opcode == 1:
            p["power"] = (lid & 0x1000) >> 12
            p["dispatch_timeout"] = (lid & 0xE00) >> 9
            p["connect_tone"] = (lid & 0x1E0) >> 5
            p["interconnect_timeout"] = (lid & 0x1F) + individual
        name = "System status"
    if 0x360 <= cmd <= 0x39F and not dual:
        name = "AMSS site ID"

    if name is None and channels is not None and cmd in channels \
            and lid != system_id and tg != 0x1FF0:
        if cmd_offset is not None and last_cmd == cmd - cmd_offset:
            dual = True
        if dual and last_cmd == 0x308:
            name, p["call_type"] = "Analog Call", "a"
        elif dual and last_cmd == 0x321:
            name, p["call_type"] = "Digital Call", "d"
        else:
            name, p["call_type"] = "Call Continuation", "u"
        if force_p25:
            name, p["call_type"] = "Digital Call", "d"
        p["user_local"] = last_lid if dual else 0
        p["frequency"] = channels[cmd]
        if p["frequency"] == control_channel:
            p["type"] = "own_cc_signal"
            return p
    p["type"] = name or "Unknown OSW"
    return p


# ------------------------------------------------------ fixture helpers
def make_osw(lid: int, cmd: int, individual: int = 0) -> np.ndarray:
    """38 data bits for (lid, cmd) with the xor masks applied."""
    bits = np.zeros(38, np.uint8)
    bits[:16] = B.int_to_bits(lid ^ LID_MASK, 16)
    bits[16] = individual
    bits[17:27] = B.int_to_bits(cmd ^ CMD_MASK, 10)
    return bits


def build_frame(data38: np.ndarray) -> np.ndarray:
    """sync + interleaved parity-protected frame (84 bits)."""
    return np.concatenate([FRAME_SYNC, interleave(add_parity(data38))])
