"""P25 Phase 2 TDMA voice-channel burst layer.

The reference delegates Phase 2 entirely to op25's C++
``p25_frame_assembler`` with ``phase2_tdma=True``: the per-call
receiver sets the scrambler xormask from ``p25p2_lfsr(nac, sysid,
wacn)`` and the wanted slot id, and the assembler does sync search,
descrambling, slot demux, and voice extraction
(logging_receiver.py:353-363, 317-321). This module is that layer,
host-side, consuming the 6000 Bd dibit stream the CQPSK pipeline
produces.

Structure implemented (published Phase 2 geometry): 6000 Bd → 12000
bps; 360-bit (180-dibit) bursts; a 4320-bit scrambling superframe of 12
bursts whose keystream comes from ``fec.lfsr``; two logical voice
channels, one per alternating burst (slot 0 = even bursts); 4V bursts
carry four 72-bit AMBE+2 voice codewords, 2V bursts carry two plus a
156-bit MAC payload. Field offsets inside the burst (sync marker, ISCH
burst descriptor) are a documented framework profile pending off-air
validation — the closed-loop modulator in ``testing.modulators`` emits
the same profile. AMBE+2 audio decode is intentionally out of scope
(the native vocoder covers IMBE/Phase 1); voice codewords are captured
raw so recordings keep evidentiary value (``CallRecorder`` writes them
to a ``.vb`` sidecar).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from radiocapture_tpu.fec import lfsr as L

BURST_DIBITS = 180            # 360 bits
SUPERFRAME_BURSTS = 12        # 4320 bits scrambling period
SYNC_DIBITS = np.array([3, 3, 1, 1, 3, 1, 3, 1, 1, 3,
                        1, 1, 3, 3, 1, 3, 1, 3, 3, 1], np.uint8)
N_SYNC = len(SYNC_DIBITS)
N_ISCH = 10                   # burst descriptor dibits (slot/type/seq)
PAYLOAD_DIBITS = BURST_DIBITS - N_SYNC - N_ISCH       # 150

BURST_4V = 0
BURST_2V = 1
BURST_MAC = 2                 # MAC-only (idle / signaling)

_VC_DIBITS = 36               # one AMBE+2 codeword = 72 bits


@dataclass
class Burst:
    slot: int                 # 0 | 1
    kind: int                 # BURST_4V | BURST_2V | BURST_MAC
    seq: int                  # burst index inside the superframe
    voice: list = field(default_factory=list)   # [72-bit np arrays]
    mac: np.ndarray | None = None


def _isch_encode(slot: int, kind: int, seq: int) -> np.ndarray:
    """10-dibit burst descriptor: 2 bits slot, 2 bits kind, 4 bits seq,
    repeated (10,5) for robustness."""
    val = ((slot & 1) << 7) | ((kind & 3) << 5) | ((seq & 0xF) << 1) | 1
    bits = [(val >> (7 - i)) & 1 for i in range(8)] + [0, 0]
    d = np.array([(bits[i] << 1) | bits[i] for i in range(10)], np.uint8)
    return d


def _isch_decode(dibits: np.ndarray) -> tuple[int, int, int] | None:
    # majority over the duplicated bit pair
    bits = ((dibits >> 1) + (dibits & 1) >= 1).astype(np.uint8)[:8]
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    if not val & 1:
        return None
    return (val >> 7) & 1, (val >> 5) & 3, (val >> 1) & 0xF


class TdmaFramer:
    """Streaming sync search + descramble + burst parse for one voice
    channel (both slots)."""

    def __init__(self, nac: int, sysid: int, wacn: int):
        self.key = L.keystream_dibits(nac, sysid, wacn)   # [2160]
        self._buf = np.zeros(0, np.uint8)
        self._synced = False
        self.errors = 0

    def feed(self, dibits: np.ndarray) -> list[Burst]:
        self._buf = np.concatenate(
            [self._buf, np.asarray(dibits, np.uint8)])
        out: list[Burst] = []
        while True:
            if not self._synced:
                idx = self._find_sync(self._buf)
                if idx is None:
                    keep = max(0, len(self._buf) - N_SYNC + 1)
                    self._buf = self._buf[keep:]
                    return out
                self._buf = self._buf[idx:]
                self._synced = True
            if len(self._buf) < BURST_DIBITS:
                return out
            burst = self._buf[:BURST_DIBITS]
            if not np.array_equal(burst[:N_SYNC], SYNC_DIBITS):
                self._synced = False
                self.errors += 1
                self._buf = self._buf[1:]
                continue
            parsed = self._parse(burst)
            if parsed is not None:
                out.append(parsed)
            else:
                self.errors += 1
            self._buf = self._buf[BURST_DIBITS:]

    @staticmethod
    def _find_sync(buf: np.ndarray) -> int | None:
        if len(buf) < N_SYNC:
            return None
        win = np.lib.stride_tricks.sliding_window_view(buf, N_SYNC)
        hits = np.nonzero((win == SYNC_DIBITS).all(axis=1))[0]
        return int(hits[0]) if len(hits) else None

    def _parse(self, burst: np.ndarray) -> Burst | None:
        hdr = _isch_decode(burst[N_SYNC:N_SYNC + N_ISCH])
        if hdr is None:
            return None
        slot, kind, seq = hdr
        # Descramble payload with the superframe-aligned keystream
        # (sync + ISCH ride in clear so sync search works pre-key).
        koff = (seq % SUPERFRAME_BURSTS) * BURST_DIBITS + N_SYNC + N_ISCH
        key = self.key[koff:koff + PAYLOAD_DIBITS]
        payload = burst[N_SYNC + N_ISCH:] ^ key
        bits = np.empty(PAYLOAD_DIBITS * 2, np.uint8)
        bits[0::2] = payload >> 1
        bits[1::2] = payload & 1
        b = Burst(slot=slot, kind=kind, seq=seq)
        if kind == BURST_4V:
            for i in range(4):
                b.voice.append(bits[i * 72:(i + 1) * 72].copy())
        elif kind == BURST_2V:
            for i in range(2):
                b.voice.append(bits[i * 72:(i + 1) * 72].copy())
            b.mac = bits[144:300].copy()
        else:
            b.mac = bits[:300].copy()
        return b


def build_tdma_stream(nac: int, sysid: int, wacn: int,
                      bursts: list[Burst],
                      lead_dibits: int = 37) -> np.ndarray:
    """Inverse of :class:`TdmaFramer` for fixtures: emit the dibit
    stream for ``bursts`` (seq auto-assigned in order), scrambled with
    the same keystream, preceded by junk dibits."""
    rng = np.random.default_rng(1234)
    key = L.keystream_dibits(nac, sysid, wacn)
    chunks = [rng.integers(0, 4, lead_dibits).astype(np.uint8)]
    for i, b in enumerate(bursts):
        seq = i % SUPERFRAME_BURSTS
        bits = np.zeros(PAYLOAD_DIBITS * 2, np.uint8)
        if b.kind == BURST_4V:
            for j, vc in enumerate(b.voice[:4]):
                bits[j * 72:(j + 1) * 72] = vc
        elif b.kind == BURST_2V:
            for j, vc in enumerate(b.voice[:2]):
                bits[j * 72:(j + 1) * 72] = vc
            if b.mac is not None:
                bits[144:300] = b.mac
        elif b.mac is not None:
            bits[:300] = b.mac
        payload = (bits[0::2] << 1 | bits[1::2]).astype(np.uint8)
        koff = seq * BURST_DIBITS + N_SYNC + N_ISCH
        payload ^= key[koff:koff + PAYLOAD_DIBITS]
        chunks.append(np.concatenate([
            SYNC_DIBITS, _isch_encode(b.slot, b.kind, seq), payload]))
    return np.concatenate(chunks)


class TdmaVoiceReceiver:
    """Per-call slot filter: the role the configured frame assembler
    plays for one ``logging_receiver`` (slot id + xormask,
    logging_receiver.py:353-363). Collects the wanted slot's voice
    codewords and reports activity."""

    def __init__(self, nac: int, sysid: int, wacn: int, slot: int):
        self.framer = TdmaFramer(nac, sysid, wacn)
        self.slot = int(slot)
        self.voice_frames: list[np.ndarray] = []
        self.bursts = 0

    def feed(self, dibits: np.ndarray) -> int:
        """Returns the number of voice bursts seen for our slot."""
        n = 0
        for b in self.framer.feed(dibits):
            if b.slot != self.slot:
                continue
            self.bursts += 1
            if b.voice:
                n += 1
                self.voice_frames.extend(b.voice)
        return n

    @property
    def errors(self) -> int:
        return self.framer.errors
