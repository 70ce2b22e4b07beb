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


def test_ring_overflow_drops_oldest():
    r = ingest.IngestRing("cs8", capacity_samples=16)
    # capacity rounds to >= 16 samples (32 B); overfill with 100
    data = np.arange(200, dtype=np.int8)
    r.push(data)
    assert r.dropped > 0
    n = r.available
    out = r.pop(n)
    # newest samples survive
    assert out[-1, 1] == np.float32(np.int8(199)) / 128.0
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
