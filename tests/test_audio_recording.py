"""Recording layer: wav sink, post-processing contract, per-call
recorder (analog squelch/resample + P25 voice sensing), recorder
manager slot lifecycle (reference L5, SURVEY.md §2.1 logging_receiver)."""

import json
import os
import threading
import time

import numpy as np
import pytest

from radiocapture_tpu.audio import postproc
from radiocapture_tpu.audio.recorder import CallRecorder, Vocoder
from radiocapture_tpu.audio.wav import WavWriter, read_wav
from radiocapture_tpu.control.bus import InProcBus
from radiocapture_tpu.control.recorder_manager import RecorderManager
from radiocapture_tpu.fec import bits as B
from radiocapture_tpu.frontend.scheduler import ChannelScheduler
from radiocapture_tpu.protocol import p25 as P


def _cdr(mod="analog", freq=857.5e6, **kw):
    d = {"call_uuid": "call-1", "instance_uuid": "inst-1",
         "system_group_local": 5001, "system_user_local": 777,
         "system_channel_local": 0x1064, "system_id": "sysA",
         "type": "group", "frequency": freq, "channel_bandwidth": 12500.0,
         "modulation_type": mod, "slot": 0, "hang_time": 5.0,
         "time_open": 1000.0, "time_activity": 1000.0}
    d.update(kw)
    return d


def test_wav_roundtrip(tmp_path):
    p = str(tmp_path / "a" / "b.wav")
    w = WavWriter(p, 8000)
    x = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000).astype(np.float32)
    w.write(x)
    w.close()
    y, rate = read_wav(p)
    assert rate == 8000 and len(y) == 8000
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_postproc_tags_and_gated_toolchain(tmp_path):
    p = str(tmp_path / "c.wav")
    w = WavWriter(p, 8000)
    w.write(np.zeros(800, np.float32))
    w.close()
    cdr = _cdr()
    patches = {9000: {5001: 1.0, 5002: 1.0}}
    tags = postproc.build_tags(cdr, patches)
    assert tags["TIT2"] == "group 5001"
    assert tags["TPE1"] == "777"
    # patched groups folded into COMM, ':' replaced
    assert "9000" in tags["COMM"] and ":" not in tags["COMM"]

    final = postproc.process_call_audio(p, cdr, patches)
    # Without sox/lame in this image the wav is kept + sidecar written.
    assert os.path.exists(final)
    if final.endswith(".wav"):
        with open(p[:-4] + ".tags.json") as f:
            assert json.load(f)["TPE1"] == "777"


def test_recorder_analog_squelch_and_rate(tmp_path):
    bus = InProcBus(num_workers=1)
    rec = CallRecorder(_cdr(), bus, audio_dir=str(tmp_path),
                       channel_fs=25000.0).open()
    t = np.arange(2500) / 25000.0
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    rec.feed_audio(tone, power=1.0)        # open squelch
    rec.feed_audio(tone, power=1e-9)       # gated -> silence
    done = threading.Event()
    completed = []
    bus.subscribe("/queue/call_management/call_complete",
                  lambda ev: (completed.append(ev), done.set()))
    rec.close({})
    assert done.wait(2.0)
    fn = completed[0]["filename"]
    y, rate = read_wav(fn if fn.endswith(".wav") else rec.filename)
    assert rate == 8000
    # 2 blocks x 100 ms -> ~1600 samples at 8 kHz (minus stage remainder)
    assert 1500 <= len(y) <= 1700
    # first block carries the tone, second is squelched silence. The
    # per-call voice band-pass (recorder-side, like the reference's
    # per-call flowgraph) rings ~22 ms past the gated boundary (177
    # taps at 8 kHz), so the silence window starts after the ring.
    assert np.abs(y[:700]).max() > 0.3
    assert np.abs(y[1100:1500]).max() < 1e-4
    assert completed[0]["cdr"]["time_close"] > 0
    bus.close()


def _ldu1_dibits(tgid=5001, src=424242, nac=0x293):
    lc = P.make_link_control(0x0, tgid=tgid, source_id=src)
    vc = np.zeros((9, 144), np.uint8)
    vc[:, ::3] = 1  # recognizable codeword pattern
    fb = P.build_ldu1_frame(nac, lc, vc)
    tlc = P.build_tlc_frame(nac, P.make_link_control(0x15))
    # terminate stream with a trailing sync so the framer closes spans
    tail = P.FRAME_SYNC_BITS
    bits = np.concatenate([fb, tlc, tail])
    return B.bits_to_dibits(bits)


def test_recorder_p25_voice_sensing_and_imbe_sidecar(tmp_path):
    bus = InProcBus(num_workers=1)
    voice_events = []
    got2 = threading.Event()
    bus.subscribe("/topic/raw_voice/inst-1",
                  lambda ev: (voice_events.append(ev),
                              len(voice_events) >= 2 and got2.set()))
    rec = CallRecorder(_cdr("p25"), bus, audio_dir=str(tmp_path)).open()
    rec.feed_dibits(_ldu1_dibits())
    assert got2.wait(2.0)
    kinds = [(ev["packet"]["short"], ev["packet"]["lc"].get("lcf_long"))
             for ev in voice_events]
    assert ("LDU1", "Group Voice Channel User") in kinds
    assert ("TLC", "Call Termination / Cancellation") in kinds
    lc = [ev for ev in voice_events
          if ev["packet"]["short"] == "LDU1"][0]["packet"]["lc"]
    assert lc["tgid"] == 5001 and lc["source_id"] == 424242
    rec.close({})
    # No vocoder installed -> IMBE codewords preserved in the sidecar.
    sidecar = rec.filename[:-4] + ".imbe"
    assert os.path.exists(sidecar)
    assert os.path.getsize(sidecar) == 9 * 144 // 8
    bus.close()


def test_recorder_p25_with_vocoder(tmp_path):
    class FakeVocoder(Vocoder):
        available = True

        def decode(self, cw):
            return np.full(160, 1000, np.int16)

    bus = InProcBus(num_workers=1)
    rec = CallRecorder(_cdr("p25"), bus, audio_dir=str(tmp_path),
                       vocoder=FakeVocoder()).open()
    rec.feed_dibits(_ldu1_dibits())
    rec.close({})
    y, rate = read_wav(rec.filename) if os.path.exists(rec.filename) \
        else (np.zeros(0), 8000)
    assert rate == 8000
    assert len(y) == 9 * 160          # 9 codewords x 160 samples
    bus.close()


def test_recorder_manager_slot_lifecycle(tmp_path):
    bus = InProcBus(num_workers=1)
    sched = ChannelScheduler({0: (857e6, 2.4e6)}, num_slots=4)
    rm = RecorderManager(bus, sched, audio_dir=str(tmp_path))
    rm.notify_demod_new("p25", "inst-1")

    bus.send_event_lazy("/topic/call_management/new_call/inst-1",
                        _cdr("analog"))
    deadline = time.time() + 2.0
    while not rm.active and time.time() < deadline:
        time.sleep(0.02)
    assert len(rm.active) == 1
    assert sched.stats()["active"] == 1

    # feed a block through the routing path
    audio = np.zeros((4, 2500), np.float32)
    power = np.full(4, 1.0)
    rm.feed_source_block(0, audio=audio, power=power)
    rec = next(iter(rm.active.values()))[0]
    assert rec.wav.frames_written == 800

    bus.send_event_lazy("/topic/call_management/timeout/inst-1",
                        {"call_uuid": "call-1", "instance_uuid": "inst-1"})
    deadline = time.time() + 2.0
    while rm.active and time.time() < deadline:
        time.sleep(0.02)
    assert rm.active == {}
    assert sched.stats()["active"] == 0
    bus.close()
