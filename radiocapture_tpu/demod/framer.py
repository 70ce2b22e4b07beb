"""P25 frame boundary detection on the sliced dibit stream.

Host-side equivalent of the framing half of op25's
``p25_frame_assembler`` + the reference's receive_engine buffer walk
(p25_control_demod.py:319-344): accumulate bits per channel, locate the
48-bit frame sync (tolerating a few bit errors), emit the spans between
consecutive syncs to the protocol layer.

Sync search is a vectorized correlation over the bit buffer (numpy), not
a byte-string find — equally exact, and tolerant of slicer bit errors
the reference's exact-match find would drop.
"""

from __future__ import annotations

import numpy as np

from radiocapture_tpu.fec import bits as B
from radiocapture_tpu.protocol.p25 import FRAME_SYNC_BITS

# Longest legal frame span we hold before declaring loss of sync:
# LDU1/2 are 1728 bits + status symbols ≈ 1778; allow slack.
MAX_FRAME_BITS = 2100
SYNC_LEN = 48


class Framer:
    """Per-channel streaming frame extractor.

    feed(dibits) -> list of frame bit arrays (sync..sync-exclusive),
    matching what parse_frame expects (status symbols included).
    """

    def __init__(self, max_sync_errors: int = 2):
        self.max_sync_errors = max_sync_errors
        self.buf = np.zeros(0, np.uint8)
        self._sync_pm = FRAME_SYNC_BITS.astype(np.int32) * 2 - 1

    def feed(self, dibits: np.ndarray) -> list[np.ndarray]:
        bits = B.dibits_to_bits(np.asarray(dibits, np.uint8))
        self.buf = np.concatenate([self.buf, bits])
        frames: list[np.ndarray] = []
        while True:
            positions = self._sync_positions(self.buf)
            if len(positions) == 0:
                # No sync anywhere: keep only a tail that could contain a
                # partial sync.
                if len(self.buf) > MAX_FRAME_BITS:
                    self.buf = self.buf[-(SYNC_LEN - 1):]
                break
            first = positions[0]
            rest = positions[positions > first + SYNC_LEN]
            if len(rest) == 0:
                # One sync: wait for the next unless the span is absurd.
                if len(self.buf) - first > MAX_FRAME_BITS:
                    self.buf = self.buf[first + SYNC_LEN:]
                    continue
                self.buf = self.buf[first:]
                break
            nxt = rest[0]
            frames.append(self.buf[first:nxt].copy())
            self.buf = self.buf[nxt:]
        return frames

    def _sync_positions(self, bits: np.ndarray) -> np.ndarray:
        n = len(bits)
        if n < SYNC_LEN:
            return np.zeros(0, np.int64)
        pm = bits.astype(np.int32) * 2 - 1
        # correlation via sliding windows: corr[i] = sum(pm[i:i+48]*sync)
        win = np.lib.stride_tricks.sliding_window_view(pm, SYNC_LEN)
        corr = win @ self._sync_pm
        thresh = SYNC_LEN - 2 * self.max_sync_errors
        return np.nonzero(corr >= thresh)[0]
