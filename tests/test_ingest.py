"""Native IQ ingest runtime: ring push/pop conversion, overflow drops,
UDP feed, SiteRuntime provider contract."""

import socket
import time

import numpy as np
import pytest

ingest = pytest.importorskip("radiocapture_tpu.frontend.ingest")


def test_ring_cs16_roundtrip_and_conversion():
    r = ingest.IngestRing("cs16", capacity_samples=1 << 12)
    iq = (np.arange(-8, 8, dtype=np.int16)).reshape(-1, 2)
    assert r.push(iq) == 8
    assert r.available == 8
    out = r.pop(8)
    np.testing.assert_allclose(out, iq.astype(np.float32) / 32768.0,
                               atol=1e-7)
    assert r.pop(1) is None          # drained
    r.close()


def test_ring_cu8_offset_and_cf32():
    r = ingest.IngestRing("cu8", capacity_samples=1 << 10)
    r.push(np.array([127, 127, 255, 0], np.uint8))
    out = r.pop(2)
    assert abs(out[0, 0]) < 0.005 and abs(out[0, 1]) < 0.005
    assert out[1, 0] > 0.99 and out[1, 1] < -0.99
    r.close()

    rf = ingest.IngestRing("cf32", capacity_samples=1 << 10)
    x = (np.arange(6, dtype=np.float32).view(np.complex64))
    rf.push(x)
    np.testing.assert_allclose(rf.pop(3).ravel(),
                               np.arange(6, dtype=np.float32))
    rf.close()


def test_ring_pop_bf16():
    """bf16 pops: bit-lossless for cu8 wire samples (8 significant bits
    fit bf16's mantissa exactly) and round-to-nearest vs the f32 pop
    elsewhere."""
    import ml_dtypes
    r = ingest.IngestRing("cu8", capacity_samples=1 << 10)
    raw = np.arange(0, 64, dtype=np.uint8)
    r.push(raw)
    out16 = r.pop_bf16(32)
    assert out16 is not None and out16.dtype == ml_dtypes.bfloat16
    expect = ((raw.astype(np.float32) - 127.5) / 127.5).reshape(-1, 2)
    # cu8 -> bf16 via RNE: within one bf16 ulp of the exact value.
    np.testing.assert_allclose(out16.astype(np.float32), expect,
                               atol=2 ** -8)
    assert r.pop_bf16(1) is None     # drained
    r.close()

    r2 = ingest.IngestRing("cs16", capacity_samples=1 << 10)
    iq = (np.arange(-8, 8, dtype=np.int16)).reshape(-1, 2)
    r2.push(iq)
    o = r2.pop_bf16(8).astype(np.float32)
    np.testing.assert_allclose(o, iq.astype(np.float32) / 32768.0,
                               rtol=2 ** -8, atol=1e-9)
    r2.close()


def test_ring_provider_bf16_zero_fill():
    import ml_dtypes
    r = ingest.IngestRing("cs8", capacity_samples=1 << 10)
    pull = r.provider(strict=False, bf16=True)
    blk = pull(32)                   # under-filled -> zero block
    assert blk.dtype == ml_dtypes.bfloat16 and blk.shape == (32, 2)
    assert not blk.astype(np.float32).any()
    r.push(np.arange(-32, 32, dtype=np.int8))
    blk = pull(32)
    assert blk.astype(np.float32).any()
    r.close()


def test_ring_overflow_drops_incoming():
    r = ingest.IngestRing("cs8", capacity_samples=16)
    # capacity rounds to >= 16 samples (32 B); overfill with 100
    data = np.arange(-100, 100, dtype=np.int8)
    accepted = r.push(data)
    assert accepted == 16
    assert r.dropped == 100 - 16
    n = r.available
    assert n == 16
    out = r.pop(n)
    # the producer never rewinds the consumer cursor: the data already
    # buffered survives intact; the incoming excess was dropped.
    np.testing.assert_allclose(
        out.ravel(), np.arange(-100, -100 + 32, dtype=np.int8) / 128.0)
    r.close()


def test_ring_sustained_overflow_accounting():
    """Under sustained overflow the ring never corrupts accounting and
    delivers a contiguous (gap-at-push-boundaries) sample stream —
    native/ingest/ingest.cc drop-incoming semantics."""
    r = ingest.IngestRing("cs16", capacity_samples=64)
    seq = np.arange(0, 8192, dtype=np.int16)
    pos = 0
    delivered = []
    rng = np.random.default_rng(7)
    while pos < len(seq):
        chunk = seq[pos:pos + 2 * int(rng.integers(8, 90))]
        pos += len(chunk)
        r.push(chunk)
        assert 0 <= r.available <= 64      # accounting never corrupts
        if rng.random() < 0.7:
            take = min(r.available, int(rng.integers(1, 40)))
            if take:
                out = r.pop(take)
                assert out is not None
                delivered.append(out)
    got = (np.concatenate(delivered).ravel() * 32768.0).astype(np.int16)
    # every delivered I sample is even, Q odd (pairs never torn) ...
    assert np.all(got[0::2] % 2 == 0) and np.all(got[1::2] % 2 == 1)
    # ... and the stream is strictly increasing (old data never replayed,
    # never reordered) with drops appearing only as forward gaps.
    assert np.all(np.diff(got.astype(np.int64)) > 0)
    assert r.dropped + r.available + len(got) // 2 == len(seq) // 2
    r.close()


def test_ring_wrap_continuity():
    r = ingest.IngestRing("cs16", capacity_samples=64)
    seq = np.arange(0, 4096, dtype=np.int16)
    pos = 0
    popped = []
    while pos < len(seq):
        chunk = seq[pos:pos + 48]
        r.push(chunk)
        pos += len(chunk)
        out = r.pop(len(chunk) // 2)
        assert out is not None
        popped.append(out)
    got = np.concatenate(popped).ravel() * 32768.0
    np.testing.assert_array_equal(got.astype(np.int16), seq)
    r.close()


def test_udp_feed_to_provider():
    r = ingest.IngestRing("cs16", capacity_samples=1 << 16)
    feed = ingest.UdpFeed(r, port=0 or 47654, bind_addr="127.0.0.1")
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    payload = np.arange(1024, dtype=np.int16).tobytes()
    for _ in range(4):
        tx.sendto(payload, ("127.0.0.1", 47654))
    deadline = time.time() + 3.0
    while r.available < 2048 and time.time() < deadline:
        time.sleep(0.02)
    assert r.available >= 2048
    pull = r.provider(strict=False)
    blk = pull(512)
    assert blk.shape == (512, 2) and blk.dtype == np.float32
    np.testing.assert_allclose(blk[0], [0.0, 1.0 / 32768.0], atol=1e-7)
    feed.stop()
    tx.close()
    r.close()
