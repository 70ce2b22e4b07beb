"""ProVoice (EDACS digital voice) framing: published DSD sync patterns,
superframe extraction, recorder integration (the reference shells this
out to the DSD C library, logging_receiver.py:334-351)."""

import os

import numpy as np

from radiocapture_tpu.audio.recorder import CallRecorder
from radiocapture_tpu.control.bus import InProcBus
from radiocapture_tpu.demod import provoice as PV


def _mk_voice(n, seed=0):
    rng = np.random.default_rng(500 + seed)
    return [rng.integers(0, 2, PV.VOICE_BITS).astype(np.uint8)
            for _ in range(n)]


def test_sync_patterns_are_dsd_constants():
    """The four patterns must be the published DSD dsd.h constants and
    mutually distant enough for the ±3-bit tolerance."""
    assert len(PV.SYNC_PATTERNS) == 4
    for name, pat in PV.SYNC_PATTERNS.items():
        assert len(pat) == 32
        # inverted pattern = complement of its counterpart
        if name.endswith("_inv"):
            np.testing.assert_array_equal(
                pat, PV.SYNC_PATTERNS[name[:-4]] ^ 1)
    names = list(PV.SYNC_PATTERNS)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            d = int((PV.SYNC_PATTERNS[a] != PV.SYNC_PATTERNS[b]).sum())
            assert d > 2 * PV.SYNC_TOLERANCE, (a, b, d)


def test_superframe_geometry():
    assert PV.SUPERFRAME_BITS == 768          # 80 ms at 9600 bps
    assert PV.VOICE_BITS == 168               # IMBE 7100x4400 (7x24)
    assert PV.VOICE_PER_SUPERFRAME * 20 == 80  # vocoder cadence kept


def test_framer_roundtrip_chunked():
    v = _mk_voice(12, 1)
    stream = PV.build_stream(v, lead_bits=53)
    fr = PV.ProVoiceFramer()
    frames = []
    for i in range(0, len(stream), 89):       # awkward chunks
        frames.extend(fr.feed(stream[i:i + 89]))
    assert len(frames) == 3
    assert fr.sync_losses == 0
    got = [vc for f in frames for vc in f.voice]
    assert len(got) == 12
    for a, b in zip(v, got):
        np.testing.assert_array_equal(a, b)
    assert all(f.variant == "pv" and not f.inverted for f in frames)


def test_framer_ea_and_inverted_polarity():
    v = _mk_voice(4, 2)
    for variant in ("pv", "pv_ea"):
        for inverted in (False, True):
            stream = PV.build_stream(v, variant=variant,
                                     inverted=inverted)
            frames = PV.ProVoiceFramer().feed(stream)
            assert frames, (variant, inverted)
            assert frames[0].variant == variant
            assert frames[0].inverted == inverted
            # inverted FM sense is undone before extraction
            np.testing.assert_array_equal(frames[0].voice[0], v[0])


def test_framer_tolerates_bit_errors_and_resyncs():
    v = _mk_voice(16, 3)
    stream = PV.build_stream(v, lead_bits=0)
    rng = np.random.default_rng(7)
    # 2 random bit flips inside each sync, plus payload noise
    noisy = stream.copy()
    for k in range(4):
        off = k * PV.SUPERFRAME_BITS
        noisy[off + rng.integers(0, 32)] ^= 1
        noisy[off + rng.integers(0, 32)] ^= 1
    frames = PV.ProVoiceFramer().feed(noisy)
    assert len(frames) == 4
    # a burst of junk between superframes forces resync and recovery
    junk = rng.integers(0, 2, 301).astype(np.uint8)
    broken = np.concatenate([stream[:2 * PV.SUPERFRAME_BITS], junk,
                             stream[2 * PV.SUPERFRAME_BITS:]])
    fr = PV.ProVoiceFramer()
    frames = fr.feed(broken)
    assert len(frames) >= 3
    assert fr.sync_losses >= 1


def test_edacs_pipeline_to_provoice_iq():
    """From IQ: ProVoice bits FSK-modulated at 9600 Bd through the
    shared EDACS-class pipeline, framed by ProVoiceReceiver — the
    composition the recorder manager routes (MOD_TO_STREAM)."""
    import jax.numpy as jnp

    from radiocapture_tpu.frontend.pipeline import ControlPipeline
    from radiocapture_tpu.testing import modulators as M

    FS = 500000.0
    v = _mk_voice(16, 4)
    bits = PV.build_stream(v, lead_bits=64)
    iq = M.fsk2_modulate(bits, 25000.0, baud=9600.0, dev_hz=3000.0)
    up = M.upsample_to(iq, 25000.0, FS)
    wide = M.multi_channel(FS, [(60e3, up)], n=len(up),
                           noise_floor_db=-60.0)
    pipe = ControlPipeline.edacs(num_slots=4, samp_rate=FS)
    offs = np.zeros(4, np.float32)
    offs[0] = 60e3 / FS
    st = pipe.init()
    rx = PV.ProVoiceReceiver()
    bm = pipe.block_multiple
    block = (len(wide) // 6 // bm) * bm
    for i in range(len(wide) // block):
        xb = wide[i * block:(i + 1) * block]
        st, (sy, va, d) = pipe.step(
            st, jnp.asarray(np.stack([xb.real, xb.imag], -1)
                            .astype(np.float32)), jnp.asarray(offs))
        vv = np.asarray(va[0]).astype(bool)
        rx.feed(np.asarray(d[0])[vv].astype(np.uint8))
    assert rx.superframes >= 3
    got = rx.voice_frames
    # find the transmitted run inside the captured codewords
    sent = np.concatenate(v)
    first_ok = [i for i, vc in enumerate(got)
                if np.array_equal(vc, v[0])]
    assert first_ok, "transmitted voice not recovered"
    k = first_ok[0]
    for j in range(min(len(v), len(got) - k)):
        np.testing.assert_array_equal(got[k + j], v[j])


def test_recorder_provoice_call_writes_pv_sidecar(tmp_path):
    v = _mk_voice(8, 5)
    stream = PV.build_stream(v)
    bus = InProcBus(num_workers=1)
    done = []
    bus.subscribe("/queue/call_management/call_complete", done.append)
    cdr = {"call_uuid": "pv1", "instance_uuid": "i1",
           "system_group_local": 1201, "system_user_local": 7,
           "system_channel_local": 854.1e6, "system_id": "edacsA",
           "type": "group", "modulation_type": "provoice",
           "time_open": 0.0}
    rec = CallRecorder(cdr, bus, audio_dir=str(tmp_path),
                       keep_wav=True).open()
    t0 = rec.time_last_activity
    rec.feed_dibits(stream)
    assert rec.time_last_activity >= t0
    out = rec.close({})
    assert out["provoice_superframes"] == 2
    assert out["provoice_codewords"] == 8
    assert out["provoice_variant"] == "pv"
    pv = rec.filename[:-4] + ".pv"
    assert os.path.exists(pv)
    assert os.path.getsize(pv) == 8 * PV.VOICE_BITS // 8
    got = np.unpackbits(np.fromfile(pv, np.uint8))
    np.testing.assert_array_equal(got, np.concatenate(v))
    bus.close()


def _build_stream_cadence(voice, cadence, variant="pv", lead=41,
                          seed=17):
    """Stream whose true inter-sync interval is ``cadence`` bits (the
    self-calibration fixture): sync + up to 4 codewords + filler."""
    rng = np.random.default_rng(seed)
    chunks = [rng.integers(0, 2, lead).astype(np.uint8)]
    n_voice = min(4, (cadence - PV.SYNC_BITS) // PV.VOICE_BITS)
    for i in range(0, len(voice), n_voice):
        body = list(voice[i:i + n_voice])
        while len(body) < n_voice:
            body.append(np.zeros(PV.VOICE_BITS, np.uint8))
        filler = cadence - PV.SYNC_BITS - n_voice * PV.VOICE_BITS
        chunks.append(np.concatenate(
            [PV.SYNC_PATTERNS[variant]] + body
            + [np.zeros(filler, np.uint8)]))
    return np.concatenate(chunks)


def test_cadence_self_calibration_720():
    """A stream with a 720-bit inter-sync cadence (contradicting the
    RECONSTRUCTED 768-bit superframe) must be auto-detected: the framer
    histograms observed sync intervals, adapts its stride, and then
    frames cleanly (r4 VERDICT #7). Done-bar: after adaptation the
    extracted codewords match the transmitted ones and sync losses stop
    accumulating."""
    v = _mk_voice(4 * 16, 9)
    stream = _build_stream_cadence(v, 720)
    fr = PV.ProVoiceFramer()
    frames = []
    for i in range(0, len(stream), 509):
        frames.extend(fr.feed(stream[i:i + 509]))
    assert fr.cadence_adapted
    assert fr.stride == 720
    # steady state after adaptation: clean syncs, correct voice
    tail = [f for f in frames if f.sync_errors <= PV.SYNC_TOLERANCE][-6:]
    assert len(tail) == 6
    got = [vc for f in tail for vc in f.voice]
    flat = np.concatenate(got)
    hay = np.concatenate(v)
    # locate the recovered run inside the transmitted voice sequence
    found = any(np.array_equal(flat, hay[k:k + len(flat)])
                for k in range(0, len(hay) - len(flat) + 1,
                               PV.VOICE_BITS))
    assert found, "post-adaptation voice does not match transmitted"
    losses_after = fr.sync_losses
    more = _build_stream_cadence(_mk_voice(4 * 6, 11), 720, lead=0)
    fr.feed(more)
    assert fr.sync_losses <= losses_after + 1   # no recurring churn


def test_cadence_self_calibration_longer_than_assumed():
    """Cadence LONGER than the reconstruction (1008 bits): detected via
    resync intervals (no in-frame syncs exist) and adapted."""
    v = _mk_voice(4 * 16, 13)
    stream = _build_stream_cadence(v, 1008)
    fr = PV.ProVoiceFramer()
    for i in range(0, len(stream), 733):
        fr.feed(stream[i:i + 733])
    assert fr.cadence_adapted
    assert fr.stride == 1008


def test_cadence_matching_stream_never_adapts():
    """A true-768 stream must keep the reconstructed stride (no false
    adaptation from the estimator)."""
    v = _mk_voice(4 * 12, 15)
    stream = PV.build_stream(v)
    fr = PV.ProVoiceFramer()
    fr.feed(stream)
    assert not fr.cadence_adapted
    assert fr.stride == PV.SUPERFRAME_BITS


def test_recorder_records_measured_cadence(tmp_path):
    """CDR + .pv.json carry the measured cadence (adapted case)."""
    import json
    v = _mk_voice(4 * 16, 21)
    stream = _build_stream_cadence(v, 720)
    bus = InProcBus(num_workers=1)
    cdr = {"call_uuid": "pv2", "instance_uuid": "i1",
           "system_group_local": 1202, "system_user_local": 7,
           "system_channel_local": 854.1e6, "system_id": "edacsA",
           "type": "group", "modulation_type": "provoice",
           "time_open": 0.0}
    rec = CallRecorder(cdr, bus, audio_dir=str(tmp_path),
                       keep_wav=True).open()
    rec.feed_dibits(stream)
    out = rec.close({})
    assert out["provoice_cadence_bits"] == 720
    assert out["provoice_cadence_adapted"] is True
    meta = json.load(open(rec.filename[:-4] + ".pv.json"))
    assert meta["cadence_bits"] == 720
    assert meta["cadence_adapted"] is True
    assert meta["codewords"] == out["provoice_codewords"]
    bus.close()


def test_cadence_multiple_of_stride_does_not_adapt():
    """Periodic sync dropouts (every other sync corrupted) produce
    intervals at 2x the true cadence; the estimator must NOT adapt the
    stride to the multiple — the current stride already explains the
    observations, and adapting up would shunt the hidden frames'
    codewords into aux (r5 review finding)."""
    v = _mk_voice(4 * 16, 23)
    stream = PV.build_stream(v)          # true cadence 768
    stream = stream.copy()
    # corrupt every other sync beyond recognition (first sync at the
    # 41-bit lead-in, cadence 768)
    for k in range(1, len(stream) // PV.SUPERFRAME_BITS + 1, 2):
        off = 41 + k * PV.SUPERFRAME_BITS
        if off + PV.SYNC_BITS <= len(stream):
            stream[off:off + PV.SYNC_BITS] ^= 1
    fr = PV.ProVoiceFramer()
    fr.feed(stream)
    assert not fr.cadence_adapted
    assert fr.stride == PV.SUPERFRAME_BITS
