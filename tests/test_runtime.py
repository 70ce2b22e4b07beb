"""SiteRuntime end to end: config → capture loop → grant → recorded
call, entirely from synthetic IQ (the reference's overseer-driven
grant→record path, SURVEY.md §3.2-3.4, with no per-process plumbing)."""

import glob
import os
import time

import numpy as np
import pytest

from radiocapture_tpu.fec import bits as B
from radiocapture_tpu.protocol import p25 as P
from radiocapture_tpu.runtime import SiteRuntime, FileSource
from radiocapture_tpu.rxconfig import (RcConfig, SourceConfig,
                                       SystemConfig, load_config)
from radiocapture_tpu.testing import modulators as M

SAMP = 2.4e6
CENTER = 857.0e6
CC = 857.5e6
VC = 856.2e6              # IDEN base → channel number 0 (in-span)


def _wideband_capture(n_grants=8):
    """Control channel repeating IDEN_UP + a grant for channel 0x1000,
    plus an NBFM voice carrier on that channel's frequency."""
    iden = P.pack_tsbk("IDEN_UP", **{
        "Identifier": 1, "BW": 100,
        "Base Frequency": int(VC / 5), "Channel Spacing": 50,
        "Transmit Offset": 0x1B4})
    grant = P.pack_tsbk("GRP_V_CH_GRANT", last_block=True, **{
        "Channel": 0x1000, "Group Address": 500, "Source Address": 42})
    frames = [P.build_tsdu_frame(0x293, [iden]),
              P.build_tsdu_frame(0x293, [grant])] * n_grants
    cc_iq = M.c4fm_modulate(B.bits_to_dibits(np.concatenate(frames)),
                            fs=25000.0)
    cc_up = M.upsample_to(cc_iq, 25000.0, SAMP)

    # Voice channel: C4FM LDU1 stream carrying IMBE codewords from the
    # native encoder (decoded back by the native vocoder while recording).
    from radiocapture_tpu.audio import imbe as I
    enc = I.ImbeEncoder()
    vc_cw = enc.encode_params(b0=90, voicing=0xFFF, gain=42, amps=[3] * 56)
    vcs = np.stack([vc_cw] * 9)
    lc = P.make_link_control(0x0, tgid=500, source_id=42)
    ldus = [P.build_ldu1_frame(0x293, lc, vcs) for _ in range(12)]
    vc_c4fm = M.c4fm_modulate(B.bits_to_dibits(np.concatenate(ldus)),
                              fs=25000.0)
    vc_iq = M.upsample_to(vc_c4fm, 25000.0, SAMP)
    n = len(cc_up)
    return M.multi_channel(SAMP, [(CC - CENTER, cc_up),
                                  (VC - CENTER, vc_iq)], n,
                           noise_floor_db=-60.0)


@pytest.fixture(scope="module")
def capture():
    return _wideband_capture()


def _config(tmp_path):
    cfg = RcConfig()
    cfg.audio_dir = str(tmp_path / "audio")
    cfg.num_slots_per_source = 16
    cfg.block_seconds = 0.05
    cfg.sources[0] = SourceConfig(type="file", center_freq=CENTER,
                                  samp_rate=SAMP)
    cfg.systems[0] = SystemConfig(type="p25", id="TestSys",
                                  modulation="C4FM",
                                  control_channels=[CC])
    return cfg


def test_runtime_grant_to_recording(tmp_path, capture):
    # No manual vocoder install: SiteRuntime registers the native IMBE
    # decoder itself (reference always voice-decodes,
    # logging_receiver.py:253) — the PCM assertion below proves it.
    cfg = _config(tmp_path)
    rt = SiteRuntime(cfg, {0: FileSource(capture)}, keep_wav=True)
    rt.use_stream_clock()    # hang-time follows stream, not host load
    completed = []
    rt.bus.subscribe("/queue/call_management/call_complete",
                     completed.append)
    try:
        inst = rt.instances[0]
        assert inst.control_channel == CC
        n_blocks = int(len(capture)
                       // rt.block_len(0)) - 1
        rt.run(n_blocks=min(n_blocks, 40))
        assert inst.engine.is_locked
        # the grant opened a recorder on the voice channel
        assert len(rt.recorders.active) == 1
        (rec, src, slot, _bid, kind), = rt.recorders.active.values()
        assert kind == "c4fm"       # C4FM system + FDMA IDEN
    finally:
        rt.close()
    deadline = time.time() + 3.0
    while not completed and time.time() < deadline:
        time.sleep(0.05)
    assert completed, "no call_complete event"
    cdr = completed[0]["cdr"]
    assert cdr["system_group_local"] == 500
    assert cdr["system_user_local"] == 42
    wavs = glob.glob(os.path.join(cfg.audio_dir, "**", "*.wav"),
                     recursive=True)
    assert wavs, "no recording written"
    from radiocapture_tpu.audio.wav import read_wav
    pcm, rate = read_wav(wavs[0])
    assert rate == 8000 and len(pcm) > 1000


def test_runtime_cqpsk_voice_routing(tmp_path):
    """CQPSK (LSM) systems route voice through the CQPSK pipeline, not
    the FM-discriminator path (which would yield garbage dibits and a
    silently empty recording) — ADVICE r1, runtime dibit_streams."""
    from radiocapture_tpu.audio import imbe as I
    from radiocapture_tpu.audio.recorder import set_default_vocoder
    I.install_default()

    iden = P.pack_tsbk("IDEN_UP", **{
        "Identifier": 1, "BW": 100,
        "Base Frequency": int(VC / 5), "Channel Spacing": 50,
        "Transmit Offset": 0x1B4})
    grant = P.pack_tsbk("GRP_V_CH_GRANT", last_block=True, **{
        "Channel": 0x1000, "Group Address": 600, "Source Address": 43})
    frames = [P.build_tsdu_frame(0x293, [iden]),
              P.build_tsdu_frame(0x293, [grant])] * 8
    cc_iq = M.cqpsk_modulate(B.bits_to_dibits(np.concatenate(frames)),
                             fs=25000.0)
    cc_up = M.upsample_to(cc_iq, 25000.0, SAMP)
    enc = I.ImbeEncoder()
    vc_cw = enc.encode_params(b0=90, voicing=0xFFF, gain=42, amps=[3] * 56)
    lc = P.make_link_control(0x0, tgid=600, source_id=43)
    ldus = [P.build_ldu1_frame(0x293, lc, np.stack([vc_cw] * 9))
            for _ in range(12)]
    vc_iq = M.upsample_to(
        M.cqpsk_modulate(B.bits_to_dibits(np.concatenate(ldus)),
                         fs=25000.0), 25000.0, SAMP)
    capture = M.multi_channel(SAMP, [(CC - CENTER, cc_up),
                                     (VC - CENTER, vc_iq)], len(cc_up),
                              noise_floor_db=-60.0)

    cfg = _config(tmp_path)
    cfg.systems[0].modulation = "CQPSK"
    rt = SiteRuntime(cfg, {0: FileSource(capture)}, keep_wav=True)
    rt.use_stream_clock()
    completed = []
    rt.bus.subscribe("/queue/call_management/call_complete",
                     completed.append)
    try:
        # CQPSK voice pipelines are provisioned up front for LSM systems
        assert rt.has_pipeline(0, "cqpsk")
        n_blocks = int(len(capture) // rt.block_len(0)) - 1
        rt.run(n_blocks=min(n_blocks, 40))
        assert rt.instances[0].engine.is_locked
        assert len(rt.recorders.active) == 1
        (rec, _src, _slot, _bid, kind), = rt.recorders.active.values()
        assert kind == "cqpsk"
        assert rec.cdr["modulation_type"] == "p25_cqpsk"
    finally:
        rt.close()
    deadline = time.time() + 3.0
    while not completed and time.time() < deadline:
        time.sleep(0.05)
    assert completed, "no call_complete event"
    cdr = completed[0]["cdr"]
    assert cdr["system_group_local"] == 600
    wavs = glob.glob(os.path.join(cfg.audio_dir, "**", "*.wav"),
                     recursive=True)
    assert wavs, "no recording written"
    from radiocapture_tpu.audio.wav import read_wav
    pcm, rate = read_wav(wavs[0])
    # voice frames actually decoded through the CQPSK dibit stream
    assert rate == 8000 and len(pcm) > 1000
    assert np.any(pcm != 0)


def _tdma_capture(randomize_iisch: bool):
    """Wideband capture: CQPSK control channel granting a Phase 2 TDMA
    channel + the 6000 Bd H-DQPSK voice channel itself. The voice
    stream carries real scrambled superframes: 3 with voice + ACTIVE
    SACCH, then END_PTT SACCHs for MAC teardown."""
    from radiocapture_tpu.demod import tdma as T
    NAC, SYSID, WACN = 0x293, 0x2C1, 0xBEE00
    iden = P.pack_tsbk("IDEN_UP_TDMA", **{
        "Identifier": 1, "Channel Type": 3,   # 2-slot TDMA, 12.5 kHz
        "Transmit Offset TDMA": 0, "Channel Spacing": 50,
        "Base Frequency": int(VC / 5)})
    net = P.pack_tsbk("NET_STS_BCST", **{
        "LRA": 0, "WACN ID": WACN, "System ID": SYSID,
        "Channel": 0x1000, "System Service Class": 0})
    grant = P.pack_tsbk("GRP_V_CH_GRANT", last_block=True, **{
        "Channel": 0x1000, "Group Address": 700, "Source Address": 44})
    frames = [P.build_tsdu_frame(NAC, [iden]),
              P.build_tsdu_frame(NAC, [net]),
              P.build_tsdu_frame(NAC, [grant])] * 16
    cc_iq = M.cqpsk_modulate(B.bits_to_dibits(np.concatenate(frames)),
                             fs=25000.0)
    cc_up = M.upsample_to(cc_iq, 25000.0, SAMP)

    rng = np.random.default_rng(321)
    v0 = [rng.integers(0, 2, 72).astype(np.uint8) for _ in range(54)]
    # ESS-A on slot 0's 2V bursts: AES-256 ALGID with a known MI/KeyID
    # (the e2e asserts these land in the CDR as capture-time tags)
    ess = np.concatenate([
        np.array([(0x112233445566778899 >> (71 - i)) & 1
                  for i in range(72)], np.uint8),
        np.array([(0x84 >> (7 - i)) & 1 for i in range(8)], np.uint8),
        np.array([(0x1234 >> (15 - i)) & 1 for i in range(16)],
                 np.uint8)])
    sfs = []
    for sf in range(5):
        take = {0: v0[sf * 18:(sf + 1) * 18]}
        mac = ({0: T.make_mac(T.MAC_END_PTT, tgid=700, source=44)}
               if sf >= 3 else None)
        sfs.append(T.build_superframe(NAC, SYSID, WACN, take, mac,
                                      superframe=sf, ess_a={0: ess}))
    vc_dibits = np.concatenate(sfs)
    if randomize_iisch:
        from test_tdma import _randomize_iisch
        vc_dibits = _randomize_iisch(vc_dibits)
    vc_iq = M.upsample_to(
        M.cqpsk_modulate(vc_dibits, fs=25000.0, symbol_rate=6000.0),
        25000.0, SAMP)
    n = max(len(cc_up), len(vc_iq))
    capture = M.multi_channel(SAMP, [(CC - CENTER, cc_up),
                                     (VC - CENTER, vc_iq)], n,
                              noise_floor_db=-60.0)
    return capture, v0


@pytest.mark.parametrize("randomize_iisch", [False, True],
                         ids=["iisch", "trial_fallback"])
def test_runtime_cqpsk_tdma_iq_e2e(tmp_path, randomize_iisch):
    """The full Phase 2 composition from IQ (r3 VERDICT weak #3): a
    p25_cqpsk_tdma grant drives the 6000 Bd CQPSK pipeline into
    TdmaVoiceReceiver inside SiteRuntime — symbol rate, slot selection,
    scrambler seeding from the NET_STS site detail, descrambled voice
    capture, and MAC END_PTT teardown all exercised together. The
    trial_fallback variant randomizes the I-ISCH dibits (simulating the
    real off-air signal whose standard I-ISCH code this build lacks)
    and must still align via the trial-descramble fallback."""
    capture, v0 = _tdma_capture(randomize_iisch)
    cfg = _config(tmp_path)
    cfg.systems[0].modulation = "CQPSK"
    rt = SiteRuntime(cfg, {0: FileSource(capture)}, keep_wav=True)
    rt.use_stream_clock()
    completed = []
    rt.bus.subscribe("/queue/call_management/call_complete",
                     completed.append)
    rec = None
    try:
        n_blocks = int(len(capture) // rt.block_len(0))
        for _ in range(min(n_blocks, 60)):
            rt.step()
            if rt.recorders.active and rec is None:
                (rec, _src, _slot, _bid, kind), = \
                    rt.recorders.active.values()
                assert kind == "cqpsk_tdma"
                assert rec.cdr["modulation_type"] == "p25_cqpsk_tdma"
                assert rec.cdr["slot"] == 0
                # scrambler seeded from NET_STS via the CDR hex fields
                assert rec._tdma.framer.key is not None
            if completed:
                break
        assert rec is not None, "no recorder opened for the TDMA grant"
    finally:
        rt.close()
    deadline = time.time() + 3.0
    while not completed and time.time() < deadline:
        time.sleep(0.05)
    assert completed, "no call_complete event"
    cdr = completed[0]["cdr"]
    assert cdr["system_group_local"] == 700
    assert cdr["modulation_type"] == "p25_cqpsk_tdma"
    # MAC teardown: the recorder saw END_PTT on our slot's SACCH
    assert rec._tdma.ended
    assert rec._tdma.last_mac["name"] == "MAC_END_PTT"
    # ESS-A from the 2V bursts tags the encrypted call in the CDR
    # (r4 VERDICT #8): ALGID/KeyID/MI as injected by _tdma_capture
    assert cdr["algid"] == 0x84
    assert cdr["keyid"] == 0x1234
    assert cdr["p25_mi"] == "0x112233445566778899"
    assert rec._tdma.last_mac["tgid"] == 700
    if randomize_iisch:
        assert rec._tdma.fallback_aligns >= 1
        assert rec._tdma.unaligned_pairs <= 6
    else:
        assert rec._tdma.fallback_aligns == 0
    # descrambled voice codewords captured to the .vb sidecar and
    # bit-identical to (a contiguous run of) what was transmitted
    vb = rec.filename[:-4] + ".vb"
    assert os.path.exists(vb)
    got = np.unpackbits(np.fromfile(vb, np.uint8))
    n_frames = len(got) // 72
    assert n_frames >= 18, f"only {n_frames} voice codewords captured"
    sent = np.concatenate(v0)
    first = got[:72]
    starts = [i for i in range(54) if np.array_equal(
        sent[i * 72:(i + 1) * 72], first)]
    assert starts, "captured voice not found in transmitted stream"
    s = starts[0]
    np.testing.assert_array_equal(
        got[:len(sent) - s * 72][:n_frames * 72],
        sent[s * 72:s * 72 + n_frames * 72])


def test_runtime_afc_converges(tmp_path):
    """Closed AFC loop (reference p25_control_demod.py:564-581 →
    rc_frontend/receiver.py:436-475): a source LO error shifts every
    channel; the locked C4FM instance's fsk4 fine-freq carry measures
    it and the scheduler's source AFC offset converges to the error,
    keeping the control channel decoding."""
    LO_ERR = 400.0          # Hz of simulated dongle error
    iden = P.pack_tsbk("IDEN_UP", **{
        "Identifier": 1, "BW": 100,
        "Base Frequency": int(VC / 5), "Channel Spacing": 50,
        "Transmit Offset": 0x1B4})
    frames = [P.build_tsdu_frame(0x293, [iden])] * 24
    cc_iq = M.c4fm_modulate(B.bits_to_dibits(np.concatenate(frames)),
                            fs=25000.0)
    cc_up = M.upsample_to(cc_iq, 25000.0, SAMP)
    # LO tuned LO_ERR too high: every carrier lands LO_ERR below its
    # nominal baseband position.
    capture = M.multi_channel(SAMP, [(CC - CENTER - LO_ERR, cc_up)],
                              len(cc_up), noise_floor_db=-60.0)
    cfg = _config(tmp_path)
    rt = SiteRuntime(cfg, {0: FileSource(capture)})
    rt.use_stream_clock()
    rt.AFC_INTERVAL_S = 0.25
    try:
        rt.run(n_blocks=40)     # FileSource loops; ~2 s of stream
        inst = rt.instances[0]
        assert inst.engine.is_locked
        afc = rt.scheduler.sources[0].afc_offset
        assert abs(afc - LO_ERR) < 60.0, afc
        # with the correction applied, the residual carry is ~zero again
        gkey, row = rt._gmap[(0, "c4fm")]
        resid = rt.groups[gkey]["pipe"].fine_freq_hz(
            rt.pipe_state[gkey])[row]
        assert abs(float(resid[inst.slot])) < 60.0
    finally:
        rt.close()


def test_runtime_presence_and_quality(tmp_path, capture):
    cfg = _config(tmp_path)
    rt = SiteRuntime(cfg, {0: FileSource(capture)})
    try:
        rt.run(n_blocks=10)
        live = rt.store.live("demod:p25", ttl=60.0)
        assert rt.instances[0].instance_uuid in live
        rec = live[rt.instances[0].instance_uuid]
        assert rec["control_channel"] == CC
        assert rec["type"] == "p25"
    finally:
        rt.close()


def test_example_config_loads():
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs/config_example_file.py"))
    assert cfg.sources[0].samp_rate == 2.4e6
    assert cfg.systems[0].type == "p25"
    assert cfg.systems[0].control_channels == [857.5e6]


def test_example_live_config_loads_and_routes_source_types():
    """The live example config exercises every wired ingest path's
    address syntax (rtl_tcp + rciq) and the dual-broker entries."""
    import os

    from radiocapture_tpu.frontend.rciq import parse_args
    from radiocapture_tpu.frontend.rtl_tcp import parse_addr
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs/config_example_live.py"))
    assert {s.type for s in cfg.sources.values()} == \
        {"rtlsdr", "usrp", "bladerf"}
    assert parse_addr(cfg.sources[0].args) == ("127.0.0.1", 1234)
    assert parse_addr(cfg.sources[1].args) == ("sdrhost-a", 1235)
    assert parse_args(cfg.sources[2].args) == ("sdrhost-b", 41234,
                                               "cs16")
    assert parse_args(cfg.sources[3].args) == ("sdrhost-c", 41234,
                                               "cf32")
    assert cfg.activemq["port"] == 61613
    assert len(cfg.redis_servers) == 2


def test_grouped_step_freezes_state_of_absent_sources(tmp_path):
    """Two same-rate sources share one grouped pipeline step; when one
    source's provider returns None for a block, that source's pipeline
    state rows must stay EXACTLY frozen (the old per-source loop simply
    skipped it) while the other source's rows advance — the mask-revert
    semantics inside SiteRuntime._make_group."""
    import jax

    cfg = RcConfig()
    cfg.audio_dir = str(tmp_path / "audio")
    cfg.num_slots_per_source = 8
    cfg.block_seconds = 0.05
    cfg.sources[0] = SourceConfig(type="file", center_freq=CENTER,
                                  samp_rate=SAMP)
    cfg.sources[1] = SourceConfig(type="file", center_freq=CENTER + SAMP,
                                  samp_rate=SAMP)
    cfg.systems[0] = SystemConfig(type="p25", id="G",
                                  control_channels=[CC])
    rng = np.random.default_rng(3)

    starve = {"on": False}

    def p0(n):
        return rng.standard_normal(n).astype(np.float32).view() \
            .astype(np.complex64)

    def p1(n):
        return None if starve["on"] else p0(n)

    rt = SiteRuntime(cfg, {0: p0, 1: p1})
    rt.use_stream_clock()
    try:
        # both sources in one c4fm group
        g0, r0 = rt._gmap[(0, "c4fm")]
        g1, r1 = rt._gmap[(1, "c4fm")]
        assert g0 == g1 and {r0, r1} == {0, 1}
        rt.step()
        rt.step()
        before = jax.tree.map(lambda a: np.asarray(a),
                              rt.pipe_state[g0])
        starve["on"] = True
        rt.step()          # source 1 absent this block
        after = jax.tree.map(lambda a: np.asarray(a),
                             rt.pipe_state[g0])
        changed_active, frozen_starved = False, True
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            if a.shape and a.shape[0] == 2:
                # starved source's row identical, active source's not
                frozen_starved &= bool(np.array_equal(a[r1], b[r1]))
                if not np.array_equal(a[r0], b[r0]):
                    changed_active = True
        assert frozen_starved, "starved source's state advanced"
        assert changed_active, "active source's state did not advance"
        # recovery: data returns, the group keeps stepping both rows
        starve["on"] = False
        rt.step()
        final = jax.tree.map(lambda a: np.asarray(a),
                             rt.pipe_state[g0])
        moved = any(not np.array_equal(a[r1], b[r1])
                    for a, b in zip(jax.tree.leaves(after),
                                    jax.tree.leaves(final))
                    if a.shape and a.shape[0] == 2)
        assert moved, "starved source did not resume"
    finally:
        rt.close()
