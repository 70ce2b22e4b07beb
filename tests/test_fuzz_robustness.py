"""Adversarial-input robustness: every host-side decode entry point
must survive arbitrary garbage without raising.

Production capture feeds these layers whatever the RF environment
produces — noise-sliced dibits, corrupted frames, truncated streams.
The reference's per-process architecture got crash isolation from the
OS (a dead demod process restarts, SURVEY §5.3); here the layers share
SiteRuntime's process, so "never raises on garbage" is a hard
requirement, enforced by this fuzz sweep. Seeds are fixed: failures
reproduce.
"""

import numpy as np
import pytest

from radiocapture_tpu.demod.framer import Framer
from radiocapture_tpu.demod import tdma as T
from radiocapture_tpu.demod import provoice as PV
from radiocapture_tpu.demod.engines import (P25ControlEngine,
                                            EdacsControlEngine,
                                            MotoControlEngine)
from radiocapture_tpu.protocol import p25 as P


def _chunks(rng, total, lo=1, hi=700):
    out = []
    n = 0
    while n < total:
        k = int(rng.integers(lo, hi))
        out.append(k)
        n += k
    return out


def test_framer_and_parser_survive_random_dibits():
    rng = np.random.default_rng(0xF0)
    fr = Framer()
    for k in _chunks(rng, 200_000):
        frames = fr.feed(rng.integers(0, 4, k).astype(np.uint8))
        for fb in frames:
            try:
                P.parse_frame(fb)
            except ValueError:
                pass                      # rejected garbage is fine


def test_parse_frame_survives_random_bits_and_truncations():
    rng = np.random.default_rng(0xF1)
    for n in (0, 1, 57, 113, 360, 720, 1728, 433):
        for _ in range(20):
            bits = rng.integers(0, 2, n).astype(np.uint8)
            try:
                P.parse_frame(bits)
            except ValueError:
                pass


def test_control_engines_survive_random_symbol_streams():
    rng = np.random.default_rng(0xF2)
    p25 = P25ControlEngine()
    for k in _chunks(rng, 100_000):
        p25.feed_dibits(rng.integers(0, 4, k).astype(np.uint8))
    edacs = EdacsControlEngine()
    moto = MotoControlEngine()
    for k in _chunks(rng, 100_000):
        bits = rng.integers(0, 2, k).astype(np.uint8)
        edacs.feed_bits(bits)
        moto.feed_bits(bits)


def test_control_engines_survive_corrupted_real_frames():
    """Bit-flip storms over genuine frames hit the deeper parse paths
    (sync matches, then CRC/trellis/field decode sees corruption)."""
    rng = np.random.default_rng(0xF3)
    t1 = P.pack_tsbk("GRP_V_CH_GRANT", mfid=0, **{
        "Service Options": 0, "Channel": 0x1001,
        "Group Address": 7, "Source Address": 9})
    frame = P.build_tsdu_frame(0x293, [t1])
    from radiocapture_tpu.fec import bits as B
    dib = B.bits_to_dibits(frame)
    eng = P25ControlEngine()
    for ber in (0.0, 0.01, 0.05, 0.2, 0.5):
        for _ in range(10):
            d = dib.copy()
            flips = rng.random(len(d)) < ber
            d[flips] = rng.integers(0, 4, int(flips.sum()))
            eng.feed_dibits(d.astype(np.uint8))


def test_tdma_framer_survives_random_dibits_bounded():
    rng = np.random.default_rng(0xF4)
    fr = T.TdmaFramer(nac=0x293, sysid=0x2C1, wacn=0xBEE00)
    for k in _chunks(rng, 150_000):
        fr.feed(rng.integers(0, 4, k).astype(np.uint8))
    # the unaligned hold must stay bounded on garbage (r3 weak #2)
    pend = getattr(fr, "_pending", [])
    assert len(pend) <= 64, f"unbounded pending hold: {len(pend)}"


def test_provoice_framer_survives_random_bits():
    rng = np.random.default_rng(0xF5)
    fr = PV.ProVoiceFramer()
    for k in _chunks(rng, 150_000):
        fr.feed(rng.integers(0, 2, k).astype(np.uint8))


def test_resp_parser_survives_hostile_bytes():
    """A misbehaving/hostile Redis peer must produce ConnectionError /
    RespError / _Incomplete — never ValueError/UnicodeDecodeError
    escaping into the bus threads' reconnect handling."""
    from radiocapture_tpu.control import resp as R
    rng = np.random.default_rng(0xF7)
    cases = [b":abc\r\n", b"+\xff\xfe\r\n", b"-\xc3(\r\n",
             b"$zz\r\n", b"*999999999999\r\n", b"$99999999999\r\n",
             b"*-7\r\n", b"?x\r\n", b"*2\r\n:1\r\n:nope\r\n",
             # deep nesting must hit the depth cap (ConnectionError),
             # not blow the Python stack (ADVICE r4 medium)
             b"*1\r\n" * 2000]
    cases += [bytes(rng.integers(0, 256, int(rng.integers(1, 200)))
                    .astype(np.uint8)) for _ in range(300)]
    for buf in cases:
        try:
            R._parse_reply(buf, 0)
        except (R._Incomplete, ConnectionError):
            pass        # the two legitimate outcomes for garbage


def test_stomp_parser_survives_hostile_bytes():
    from radiocapture_tpu.control import stomp as S
    rng = np.random.default_rng(0xF8)
    cases = [b"SEND\ncontent-length:zz\n\nxx\x00",
             b"SEND\ncontent-length:99999999999\n\nxx\x00",
             b"SEND\ncontent-length:-4\n\nxx\x00"]
    cases += [bytes(rng.integers(0, 256, int(rng.integers(1, 300)))
                    .astype(np.uint8)) for _ in range(300)]
    for buf in cases:
        try:
            S.parse_frame(buf, 0)
        except (S._Incomplete, ConnectionError):
            pass


def test_imbe_unpack_survives_random_codewords():
    I = pytest.importorskip("radiocapture_tpu.audio.imbe")
    rng = np.random.default_rng(0xF6)
    for _ in range(200):
        bits = rng.integers(0, 2, 144).astype(np.uint8)
        params, errs = I.unpack_frame(bits)
        assert errs >= -1
        if errs >= 0:
            assert 0 <= params["b0"] <= 207
