"""Control-plane behavior tests: bus, presence, slot scheduler, call
managers — the reference's L2/L6 semantics (SURVEY.md §2.1, §3.3-3.4)."""

import threading
import time

import numpy as np
import pytest

from radiocapture_tpu.control.bus import InProcBus
from radiocapture_tpu.control.call_manager import (
    EdacsCallManager, MotoCallManager, P25CallManager)
from radiocapture_tpu.control.presence import (
    ChannelizerManager, DemodManager, PresencePublisher, PresenceStore)
from radiocapture_tpu.frontend.scheduler import ChannelScheduler
from radiocapture_tpu.rxconfig import RcConfig, SourceConfig, SystemConfig


# ---------------------------------------------------------------- bus
def test_bus_lazy_pubsub_and_wildcard():
    bus = InProcBus(num_workers=2)
    got = []
    done = threading.Event()
    bus.subscribe("/topic/raw_control/*", lambda ev: (got.append(ev),
                                                      done.set()))
    bus.send_event_lazy("/topic/raw_control/abc", {"x": 1})
    assert done.wait(2.0)
    assert got == [{"x": 1}]
    bus.close()


def test_bus_hopeful_delivery_and_unsubscribe():
    bus = InProcBus(num_workers=1)
    got = []
    done = threading.Event()
    cb = lambda ev: (got.append(ev), done.set())  # noqa: E731
    bus.subscribe("/queue/call_management/call_complete", cb)
    bus.send_event_hopeful("/queue/call_management/call_complete",
                           {"cdr": 1})
    assert done.wait(2.0)
    bus.unsubscribe("/queue/call_management/call_complete")
    bus.send_event_lazy("/queue/call_management/call_complete", {"cdr": 2})
    time.sleep(0.1)
    assert got == [{"cdr": 1}]
    bus.close()


# ------------------------------------------------------------ presence
def test_presence_ttl_and_demod_manager_callbacks():
    store = PresenceStore()
    new, gone = [], []
    mgr = DemodManager(store, ttl=0.2,
                       notify_new=lambda t, u, r: new.append((t, u)),
                       notify_expire=lambda t, u: gone.append((t, u)))
    store.publish("demod:p25", "u1", {"system_uuid": "s1"})
    live = mgr.poll()
    assert new == [("p25", "u1")] and "u1" in live
    time.sleep(0.25)
    live = mgr.poll()
    assert gone == [("p25", "u1")] and live == {}


def test_presence_publisher_reannounces():
    store = PresenceStore()
    pub = PresencePublisher(store, "channelizers", "c1",
                            lambda: {"sources": []}, period=0.05).start()
    time.sleep(0.12)
    assert "c1" in store.live("channelizers", ttl=0.1)
    pub.stop()
    assert "c1" not in store.live("channelizers", ttl=10.0)


def test_channelizer_routing_min_offset():
    store = PresenceStore()
    store.publish("channelizers", "far", {"sources": [
        {"center_freq": 860e6, "samp_rate": 10e6}]})
    store.publish("channelizers", "near", {"sources": [
        {"center_freq": 857e6, "samp_rate": 10e6}]})
    mgr = ChannelizerManager(store)
    uid, _ = mgr.get_channelizer_for_frequency(856.8e6)
    assert uid == "near"
    assert mgr.get_channelizer_for_frequency(900e6) is None


# ----------------------------------------------------------- scheduler
def test_scheduler_create_release_reuse_and_offsets():
    sched = ChannelScheduler({0: (857e6, 2.4e6)}, num_slots=4)
    sched.connect("cli")
    src, slot, bid = sched.create_channel("cli", 25000, 857.5e6)
    assert (src, slot) == (0, 0)
    offs = sched.offsets_norm(0)
    assert offs[0] == pytest.approx(0.5e6 / 2.4e6)
    assert sched.active_mask(0)[0] and not sched.active_mask(0)[1]
    # release -> idle; next create reuses the idle slot first
    assert sched.release_channel("cli", bid)
    assert not sched.active_mask(0)[0]
    _, slot2, _ = sched.create_channel("cli", 25000, 856.9e6)
    assert slot2 == 0

    # out-of-coverage is refused
    assert sched.create_channel("cli", 25000, 900e6) is None


def test_scheduler_pool_exhaustion_and_client_reaping():
    sched = ChannelScheduler({0: (857e6, 2.4e6)}, num_slots=2)
    a = sched.create_channel("c1", 25000, 856.9e6)
    b = sched.create_channel("c1", 25000, 857.1e6)
    assert a and b
    assert sched.create_channel("c1", 25000, 857.2e6) is None
    # silent client reaped after TTL -> slots go idle
    sched._clients["c1"] = time.monotonic() - 10.0
    sched.reap()
    assert sched.stats()["active"] == 0 and sched.stats()["idle"] == 2
    # idle slots expire to free after the reuse window
    now = time.monotonic() + ChannelScheduler.IDLE_REUSE_S + 1
    sched.reap(now=now)
    assert sched.stats()["idle"] == 0


def test_scheduler_afc_clamp():
    sched = ChannelScheduler({0: (857e6, 2.4e6)}, num_slots=1)
    assert sched.report_offset(0, 500.0) == 500.0
    assert sched.report_offset(0, 5000.0) == ChannelScheduler.MAX_AFC_HZ


# -------------------------------------------------------- call manager
class FakeClock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def _p25_cm(clock):
    bus = InProcBus(num_workers=1)
    inst = {"system_uuid": "sysA", "transmit_site_uuid": "siteA",
            "system_modulation": "C4FM",
            "site_detail": {"WACN ID": "0xbee00", "System ID": "0x123",
                            "NAC": 0x293}}
    cm = P25CallManager(bus, lambda u: inst, now_fn=clock)
    cm.notify_demod_new("p25", "inst1")
    # IDEN_UP as the engine publishes it (scaled)
    cm.process_raw_control("inst1", {
        "name": "IDEN_UP", "crc": 0, "Identifier": 1,
        "BW": 12.5, "Base Frequency": 851.00625,
        "Channel Spacing": 6.25, "Transmit Offset": -45.0})
    return cm, bus


def test_p25_grant_opens_call_with_resolved_frequency():
    clock = FakeClock()
    cm, bus = _p25_cm(clock)
    opened = []
    bus.subscribe("/topic/call_management/new_call/*",
                  lambda ev: opened.append(ev))
    cm.process_raw_control("inst1", {
        "name": "GRP_V_CH_GRANT", "crc": 0, "Channel": 0x1064,
        "Group Address": 5001, "Source Address": 777})
    ict = cm.instance_metadata["inst1"]["call_table"]
    assert len(ict) == 1
    cdr = next(iter(ict.values()))
    assert cdr["frequency"] == int((851.00625 + 0x64 * 6.25e-3) * 1e6)
    assert cdr["modulation_type"] == "p25"
    assert cdr["system_group_local"] == 5001
    assert cdr["p25_nac"] == 0x293
    time.sleep(0.1)
    assert len(opened) == 1
    bus.close()


def test_p25_continuation_refreshes_not_duplicates():
    clock = FakeClock()
    cm, bus = _p25_cm(clock)
    g = {"name": "GRP_V_CH_GRANT", "crc": 0, "Channel": 0x1064,
         "Group Address": 5001, "Source Address": 777}
    cm.process_raw_control("inst1", dict(g))
    clock.t += 2.0
    cm.process_raw_control("inst1", dict(g))
    ict = cm.instance_metadata["inst1"]["call_table"]
    assert len(ict) == 1
    assert next(iter(ict.values()))["time_activity"] == clock.t
    bus.close()


def test_p25_conflict_kill_different_group_same_channel():
    clock = FakeClock()
    cm, bus = _p25_cm(clock)
    cm.process_raw_control("inst1", {
        "name": "GRP_V_CH_GRANT", "crc": 0, "Channel": 0x1064,
        "Group Address": 5001, "Source Address": 777})
    clock.t += 2.0  # outside the 1 s cross-site merge window
    cm.process_raw_control("inst1", {
        "name": "GRP_V_CH_GRANT", "crc": 0, "Channel": 0x1064,
        "Group Address": 6002, "Source Address": 888})
    ict = cm.instance_metadata["inst1"]["call_table"]
    assert len(ict) == 1
    assert next(iter(ict.values()))["system_group_local"] == 6002
    bus.close()


def test_p25_cross_site_merge_shares_call_uuid():
    clock = FakeClock()
    bus = InProcBus(num_workers=1)
    insts = {
        "i1": {"system_uuid": "sysA", "transmit_site_uuid": "s1",
               "system_modulation": "C4FM", "site_detail": {}},
        "i2": {"system_uuid": "sysA", "transmit_site_uuid": "s2",
               "system_modulation": "C4FM", "site_detail": {}},
    }
    cm = P25CallManager(bus, lambda u: insts.get(u), now_fn=clock)
    for i in ("i1", "i2"):
        cm.notify_demod_new("p25", i)
        cm.process_raw_control(i, {
            "name": "IDEN_UP", "crc": 0, "Identifier": 1, "BW": 12.5,
            "Base Frequency": 851.0, "Channel Spacing": 6.25,
            "Transmit Offset": -45.0})
    g = {"name": "GRP_V_CH_GRANT", "crc": 0, "Channel": 0x1064,
         "Group Address": 5001, "Source Address": 777}
    cm.process_raw_control("i1", dict(g))
    clock.t += 0.5  # within merge window
    cm.process_raw_control("i2", dict(g))
    u1 = next(iter(cm.instance_metadata["i1"]["call_table"]))
    u2 = next(iter(cm.instance_metadata["i2"]["call_table"]))
    assert u1 == u2
    sct = cm.system_metadata["sysA"]["call_table"]
    assert set(sct[u1]["instances"]) == {"i1", "i2"}
    bus.close()


def test_p25_hang_time_sweep_closes_idle_calls():
    clock = FakeClock()
    cm, bus = _p25_cm(clock)
    timeouts = []
    bus.subscribe("/topic/call_management/timeout/*",
                  lambda ev: timeouts.append(ev))
    cm.process_raw_control("inst1", {
        "name": "GRP_V_CH_GRANT", "crc": 0, "Channel": 0x1064,
        "Group Address": 5001, "Source Address": 777})
    clock.t += 4.0
    assert cm.sweep() == 0          # under 5 s hang time
    clock.t += 1.5
    assert cm.sweep() == 1
    assert cm.instance_metadata["inst1"]["call_table"] == {}
    time.sleep(0.1)
    assert len(timeouts) == 1
    bus.close()


def test_p25_tlc_voice_close_and_user_backfill():
    clock = FakeClock()
    cm, bus = _p25_cm(clock)
    cm.process_raw_control("inst1", {
        "name": "GRP_V_CH_GRANT", "crc": 0, "Channel": 0x1064,
        "Group Address": 5001, "Source Address": 0})
    ict = cm.instance_metadata["inst1"]["call_table"]
    call_uuid = next(iter(ict))
    # reference quirk: source 0 is rewritten to 1 by the demod, but a
    # voice LC with a real source backfills it
    cm.process_raw_voice("inst1", {
        "call_uuid": call_uuid, "instance_uuid": "inst1",
        "packet": {"short": "LDU1",
                   "lc": {"lcf_long": "Group Voice Channel User",
                          "tgid": 5001, "source_id": 424242}}})
    assert ict[call_uuid]["system_user_local"] == 424242
    # TLC closes, but only after the 0.2 s guard
    clock.t += 0.3
    cm.process_raw_voice("inst1", {
        "call_uuid": call_uuid, "instance_uuid": "inst1",
        "packet": {"short": "TLC",
                   "lc": {"lcf_long":
                          "Call Termination / Cancellation"}}})
    assert call_uuid not in ict
    bus.close()


def test_p25_tdma_modulation_type():
    clock = FakeClock()
    cm, bus = _p25_cm(clock)
    cm.process_raw_control("inst1", {
        "name": "IDEN_UP_TDMA", "crc": 0, "Identifier": 2, "BW": 12.5,
        "Base Frequency": 852.0, "Channel Spacing": 6.25,
        "Transmit Offset TDMA": 0.0, "Access Type": "TDMA", "Slots": 2})
    cm.process_raw_control("inst1", {
        "name": "GRP_V_CH_GRANT", "crc": 0, "Channel": 0x2065,
        "Group Address": 7001, "Source Address": 1})
    cdr = next(iter(cm.instance_metadata["inst1"]["call_table"].values()))
    assert cdr["modulation_type"] == "p25_tdma"
    assert cdr["slot"] == 0x65 % 2
    bus.close()


def test_moto_and_edacs_call_managers():
    clock = FakeClock()
    bus = InProcBus(num_workers=1)
    inst = {"system_uuid": "m1", "transmit_site_uuid": "t1"}
    m = MotoCallManager(bus, lambda u: inst, now_fn=clock)
    m.notify_demod_new("moto", "im")
    m.process_raw_control("im", {"type": "Digital Call",
                                 "frequency": 860912500, "tg": 1296,
                                 "user_local": 20974})
    cdr = next(iter(m.instance_metadata["im"]["call_table"].values()))
    assert cdr["modulation_type"] == "p25"
    assert cdr["hang_time"] == 1.0
    # continuation refreshes
    clock.t += 0.5
    m.process_raw_control("im", {"type": "Call Continuation",
                                 "frequency": 860912500, "tg": 1296,
                                 "user_local": 0})
    assert len(m.instance_metadata["im"]["call_table"]) == 1

    e = EdacsCallManager(bus, lambda u: inst, now_fn=clock)
    e.notify_demod_new("edacs", "ie")
    e.process_raw_control("ie", {"type": "call_assignment_analog",
                                 "frequency": 858712500, "group": 1393,
                                 "logical_id": 5604})
    cdr = next(iter(e.instance_metadata["ie"]["call_table"].values()))
    assert cdr["modulation_type"] == "analog_edacs"
    assert cdr["hang_time"] == 0.5
    e.process_raw_control("ie", {"type": "call_continuation_digital",
                                 "frequency": 858712500, "id": 1393})
    bus.close()


# --------------------------------------------------------------- config
def test_config_schema_and_loader(tmp_path):
    cfg = RcConfig.from_dict({
        "sources": {0: {"type": "rtlsdr", "center_freq": 857e6,
                        "samp_rate": 2.4e6}},
        "systems": {0: {"type": "p25", "id": "DTRS",
                        "channels": {1: 851.0e6}, "modulation": "CQPSK"}},
        "frontend_mode": "pfb",
    })
    assert cfg.sources[0].samp_rate == 2.4e6
    assert cfg.systems[0].symbol_rate == 4800.0
    assert cfg.systems[0].control_channels == [851.0e6]

    p = tmp_path / "config_site.py"
    p.write_text(
        "config = RcConfig.from_dict({'systems': {0: {'type': 'edacs',"
        " 'channels': {1: 858.7125e6}, 'esk': True}}})\n")
    from radiocapture_tpu.rxconfig import load_config
    loaded = load_config(str(p))
    assert loaded.systems[0].esk is True
    assert loaded.systems[0].symbol_rate == 9600.0


def test_blacklist_and_whitelist_filter_grants():
    """Talkgroup filters (config blacklists vocabulary,
    config_denver_realistic_p25.py:273-364): blacklisted groups never
    open a call; with a whitelist, only listed groups do."""
    clock = FakeClock()
    bus = InProcBus(num_workers=1)
    inst = {"system_uuid": "sysA", "system_id_local": 0xbee07,
            "transmit_site_uuid": "siteA", "system_modulation": "C4FM",
            "site_detail": {}}
    cm = P25CallManager(bus, lambda u: inst, now_fn=clock,
                        blacklists={0xbee07: [997, 998]})
    cm.notify_demod_new("p25", "inst1")
    cm.process_raw_control("inst1", {
        "name": "IDEN_UP", "crc": 0, "Identifier": 1,
        "BW": 12.5, "Base Frequency": 851.00625,
        "Channel Spacing": 6.25, "Transmit Offset": -45.0})
    grant = {"name": "GRP_V_CH_GRANT", "crc": 0, "Channel": 0x1064,
             "Source Address": 777}
    cm.process_raw_control("inst1", dict(grant, **{"Group Address": 997}))
    assert not cm.instance_metadata["inst1"]["call_table"]
    cm.process_raw_control("inst1", dict(grant, **{"Group Address": 5001}))
    assert len(cm.instance_metadata["inst1"]["call_table"]) == 1
    bus.close()

    # whitelist keyed by system_uuid: only group 42 passes
    bus2 = InProcBus(num_workers=1)
    cm2 = P25CallManager(bus2, lambda u: inst, now_fn=clock,
                         whitelists={"sysA": [42]})
    assert cm2.group_filtered("inst1", 41)
    assert not cm2.group_filtered("inst1", 42)
    bus2.close()


def test_runtime_builds_blacklists_from_config():
    from radiocapture_tpu.rxconfig import SystemConfig
    s = SystemConfig(type="p25", id="den", channels={0: 851e6},
                     blacklist={10, 11})
    cfg = RcConfig(systems={0: s}, blacklists={"den": [99]},
                   sources={0: __import__(
                       "radiocapture_tpu.rxconfig",
                       fromlist=["SourceConfig"]).SourceConfig(
                           type="file", center_freq=851e6,
                           samp_rate=1.2e6)},
                   num_slots_per_source=4)
    from radiocapture_tpu.runtime import SiteRuntime
    rt = SiteRuntime(cfg, iq_providers={0: lambda n: None})
    cm = rt.call_managers["p25"]
    u = rt.instances[0].instance_uuid
    assert cm.group_filtered(u, 10)    # per-system blacklist field
    assert cm.group_filtered(u, 99)    # reference-style cfg.blacklists
    assert not cm.group_filtered(u, 12)
    rt.close()
