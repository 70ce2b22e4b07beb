"""P25 Phase 2 TDMA burst layer: LFSR descramble, slot demux, voice
capture (reference delegates this to op25 p25_frame_assembler with
phase2_tdma=True; logging_receiver.py:317-321, 353-363)."""

import numpy as np

from radiocapture_tpu.audio.recorder import CallRecorder
from radiocapture_tpu.control.bus import InProcBus
from radiocapture_tpu.demod import tdma as T

NAC, SYSID, WACN = 0x293, 0x2C1, 0xBEE00


def _mk_voice(i):
    rng = np.random.default_rng(100 + i)
    return rng.integers(0, 2, 72).astype(np.uint8)


def _mk_bursts(n=12):
    bursts = []
    for i in range(n):
        slot = i % 2
        if i % 6 == 5:
            bursts.append(T.Burst(slot=slot, kind=T.BURST_2V, seq=0,
                                  voice=[_mk_voice(10 * i), _mk_voice(
                                      10 * i + 1)],
                                  mac=np.ones(156, np.uint8)))
        else:
            bursts.append(T.Burst(slot=slot, kind=T.BURST_4V, seq=0,
                                  voice=[_mk_voice(10 * i + j)
                                         for j in range(4)]))
    return bursts


def test_tdma_roundtrip_descramble_and_slots():
    bursts = _mk_bursts(12)
    stream = T.build_tdma_stream(NAC, SYSID, WACN, bursts)
    fr = T.TdmaFramer(NAC, SYSID, WACN)
    # feed in awkward chunk sizes to exercise streaming resync
    got = []
    for i in range(0, len(stream), 101):
        got.extend(fr.feed(stream[i:i + 101]))
    assert len(got) == 12
    assert fr.errors == 0
    for sent, rec in zip(bursts, got):
        assert rec.slot == sent.slot
        assert rec.kind == sent.kind
        assert len(rec.voice) == len(sent.voice)
        for a, b in zip(sent.voice, rec.voice):
            assert np.array_equal(a, b)
        if sent.kind == T.BURST_2V:
            assert np.array_equal(rec.mac, sent.mac)


def test_tdma_wrong_key_does_not_decode_voice():
    """With the wrong (NAC, SYSID, WACN) the payload stays scrambled —
    sync still locks (clear) but voice bits differ."""
    bursts = _mk_bursts(4)
    stream = T.build_tdma_stream(NAC, SYSID, WACN, bursts)
    fr = T.TdmaFramer(NAC + 1, SYSID, WACN)
    got = fr.feed(stream)
    assert len(got) == 4
    mismatch = sum(
        not np.array_equal(a, b)
        for sent, rec in zip(bursts, got)
        for a, b in zip(sent.voice, rec.voice))
    assert mismatch >= 3


def test_tdma_slot_filter_receiver():
    bursts = _mk_bursts(12)
    stream = T.build_tdma_stream(NAC, SYSID, WACN, bursts)
    rx0 = T.TdmaVoiceReceiver(NAC, SYSID, WACN, slot=0)
    rx1 = T.TdmaVoiceReceiver(NAC, SYSID, WACN, slot=1)
    rx0.feed(stream)
    rx1.feed(stream)
    v0 = sum(len(b.voice) for b in bursts if b.slot == 0)
    v1 = sum(len(b.voice) for b in bursts if b.slot == 1)
    assert len(rx0.voice_frames) == v0
    assert len(rx1.voice_frames) == v1


def test_recorder_tdma_call_writes_vb_sidecar(tmp_path):
    bursts = _mk_bursts(8)
    stream = T.build_tdma_stream(NAC, SYSID, WACN, bursts)
    bus = InProcBus(num_workers=1)
    done = []
    bus.subscribe("/queue/call_management/call_complete", done.append)
    cdr = {"call_uuid": "t1", "instance_uuid": "i1",
           "system_group_local": 42, "system_user_local": 7,
           "system_channel_local": 851.2e6, "system_id": "sysA",
           "type": "group", "modulation_type": "p25_tdma",
           "slot": 0, "nac": NAC, "sysid": SYSID, "wacn": WACN,
           "time_open": 0.0}
    rec = CallRecorder(cdr, bus, audio_dir=str(tmp_path),
                       keep_wav=True).open()
    t0 = rec.time_last_activity
    rec.feed_dibits(stream)
    assert rec.time_last_activity >= t0
    rec.close({})
    import os
    vb = rec.filename[:-4] + ".vb"
    assert os.path.exists(vb)
    n_voice = sum(len(b.voice) for b in bursts if b.slot == 0)
    assert os.path.getsize(vb) == n_voice * 72 // 8
    bus.close()
