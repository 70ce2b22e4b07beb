"""L7 supervision + ops plumbing: frontend wire protocol, supervisor
restart loop, watchdog channel, metadata agent diffs, device discovery.
(Reference: rc_frontend/receiver.py:503-700, overseer.py, watchdog.py,
p25_metadata_agent.py, rc_frontend/device_discovery.py.)
"""

import time

import pytest

from radiocapture_tpu.control.bus import InProcBus
from radiocapture_tpu.control.metadata_agent import MetadataAgent
from radiocapture_tpu.control.overseer import (Supervisor, WatchdogService,
                                               WatchdogClient)
from radiocapture_tpu.control.presence import PresenceStore
from radiocapture_tpu.frontend.device_discovery import (DeviceDiscovery,
                                                        enumerate_configured)
from radiocapture_tpu.frontend.scheduler import ChannelScheduler
from radiocapture_tpu.frontend.server import (FrontendServer,
                                              FrontendConnector)


def _sched():
    return ChannelScheduler({0: (857.0e6, 2.4e6)}, num_slots=8)


def test_wire_protocol_handler():
    """The CSV verbs round-trip against the scheduler without sockets
    (receiver.py:503-614 request/response shapes)."""
    srv = FrontendServer.__new__(FrontendServer)   # no socket bind
    srv.scheduler = _sched()
    srv._client_num = 0
    srv.on_scan_set_freq = None
    assert srv.handle("connect") == "connect,0"
    r = srv.handle("create,0,25000,857500000")
    verb, block_id, slot = r.split(",")
    assert verb == "create"
    assert srv.handle("hb,0") == "hb,0"
    assert srv.handle("hb,99") == "fail,99"
    assert srv.handle("offset,0,%s,150.0" % block_id) == "offset,0"
    assert srv.scheduler.sources[0].afc_offset == 150.0
    assert srv.handle("release,0,%s" % block_id) == "release,%s" % block_id
    assert srv.handle("create,0,25000,999000000") == "na,999000000"
    assert srv.handle("scan_mode_set_freq,860000000") == "success"
    assert srv.scheduler.sources[0].center_freq == 860000000
    assert srv.handle("quit,0") == "quit,0"


def test_frontend_server_client_zmq():
    """Full socket path: connect, create, heartbeat keeps the client
    alive, release (frontend_connector.py:127-229 semantics)."""
    sched = _sched()
    srv = FrontendServer(sched).start()
    try:
        conn = FrontendConnector("tcp://127.0.0.1:%s" % srv.port)
        got = conn.create_channel(25000, 857_500_000)
        assert got is not None
        block_id, slot = got
        assert sched.active_mask(0)[slot]
        assert conn.report_offset(block_id, 42.0)
        assert sched.sources[0].afc_offset == 42.0
        time.sleep(0.6)      # a couple of heartbeat periods
        assert sched.stats()["clients"] >= 1
        assert conn.release_channel(block_id)
        assert not sched.active_mask(0)[slot]
        conn.quit()
    finally:
        srv.stop()


def _crashy_worker():
    raise SystemExit(1)


def _sleepy_worker():
    time.sleep(60)


def test_supervisor_restarts_dead_worker():
    sup = Supervisor()
    sup.add("crashy", _crashy_worker)
    sup.add("sleepy", _sleepy_worker)
    sup.POLL_S = 0.2
    sup.start()
    try:
        deadline = time.time() + 5.0
        while sup.workers["crashy"].restarts == 0 and \
                time.time() < deadline:
            time.sleep(0.05)
        assert sup.workers["crashy"].restarts >= 1
        ups = sup.uptimes()
        assert ups["sleepy"] >= 0
    finally:
        sup.stop()


def test_watchdog_channel():
    sup = Supervisor()
    sup.add("sysA", _sleepy_worker)
    sup.POLL_S = 0.2
    sup.start()
    quality = {"sysA": [0.9, 1.0]}
    svc = WatchdogService(sup, get_quality=lambda n: quality.get(n, []),
                          port=0).start()
    try:
        cli = WatchdogClient(port=svc.port)
        assert cli.all_get_status() == {"sysA": 1.0}
        assert cli.all_get_status_avg() == {"sysA": pytest.approx(0.95)}
        up = cli.all_get_uptime()
        assert up["sysA"] >= 0
        # Force the >1 day condition and sweep.
        sup.workers["sysA"].start_time -= 90000
        restarted = cli.sweep_restart_old()
        assert restarted == ["sysA"]
        assert sup.workers["sysA"].restarts == 1
    finally:
        svc.stop()
        sup.stop()


def test_metadata_agent_publishes_only_changes():
    bus = InProcBus(num_workers=1)
    inst = {"transmit_site_uuid": "ts1", "site_uuid": "rx1"}
    agent = MetadataAgent(bus, lambda u: inst)
    updates = []
    bus.subscribe("/queue/metadata/site_update", updates.append)
    agent.notify_demod_new("p25", "instX")

    iden = {"name": "IDEN_UP", "crc": 0, "Identifier": 1, "BW": 12.5,
            "Base Frequency": 851.00625, "Channel Spacing": 6.25,
            "Transmit Offset": -45.0}
    net = {"name": "NET_STS_BCST", "crc": 0, "WACN ID": 0xBEE00,
           "System ID": 0x2C1, "Channel": 0x1000,
           "System Service Class": 0x70}
    for _ in range(3):   # repeats must not re-publish
        bus.send_event_lazy("/topic/raw_control/instX", dict(iden))
        bus.send_event_lazy("/topic/raw_control/instX", dict(net))
    deadline = time.time() + 3.0
    while time.time() < deadline and len(updates) < 5:
        time.sleep(0.05)
    params = sorted(u["parameter"] for u in updates)
    assert params == ["Control Channel", "FIT-1", "System ID",
                      "System Service Class", "WACN ID"]
    for u in updates:
        assert u["transmit_site_uuid"] == "ts1"
        assert u["receive_site_uuid"] == "rx1"
    cc = [u for u in updates if u["parameter"] == "Control Channel"][0]
    assert cc["value"]["frequency"] == int(851.00625e6)
    # A changed value republishes.
    iden2 = dict(iden, **{"Transmit Offset": -44.0})
    bus.send_event_lazy("/topic/raw_control/instX", iden2)
    deadline = time.time() + 2.0
    while time.time() < deadline and len(updates) < 6:
        time.sleep(0.05)
    assert len(updates) == 6
    bus.close()


def test_device_discovery_publishes_table():
    store = PresenceStore()
    sources = {0: {"type": "file", "args": "/tmp/iq.dat",
                   "center_freq": 857e6, "samp_rate": 2.4e6}}
    dd = DeviceDiscovery(store, sources=sources, host="testhost")
    t = dd.publish_once()
    assert t["host"] == "testhost"
    names = [d["type"] for d in t["devices"]]
    assert "file" in names
    live = store.live("device_table", ttl=5.0)
    assert dd.host_hash in live
    cfg = enumerate_configured(sources)
    assert cfg[0]["samp_rate"] == 2.4e6


def test_logconfig_rotating_handlers_and_protocol_firehose(tmp_path):
    """logconfig mirrors the reference config.logging.json: root →
    rotating overseer.log, protocol.* → protocol.log (non-propagating),
    overseer.quality → console; engine _emit lands in the firehose and
    record_quality writes the 'System Status' health line."""
    import logging
    from radiocapture_tpu.utils.logconfig import (setup_logging,
                                                  logging_dict,
                                                  protocol_logger)
    from radiocapture_tpu.demod.engines import P25ControlEngine

    d = logging_dict("logs", max_bytes=123, backup_count=4)
    assert d["handlers"]["file_handler"]["maxBytes"] == 123
    assert d["loggers"]["protocol"]["propagate"] is False

    setup_logging(str(tmp_path))
    logging.getLogger("anything").info("root line")
    protocol_logger("deadbeef").info({"name": "TSBK"})

    eng = P25ControlEngine(instance_uuid="deadbeef", system_id="denver")
    eng._emit({"name": "GRP_V_CH_GRANT", "Channel": 1})
    eng.total_messages, eng.bad_messages = 40, 2
    eng.record_quality(10.0, 40.0, control_channel=857.5e6, site_id="s")
    assert abs(eng.quality[-1] - 38.0 / 400.0) < 1e-9
    # second window uses deltas, not cumulative counts
    eng.total_messages = 80
    eng.record_quality(10.0, 40.0)
    assert abs(eng.quality[-1] - 40.0 / 400.0) < 1e-9

    for h in logging.getLogger().handlers:
        h.flush()
    overseer = (tmp_path / "overseer.log").read_text()
    protocol = (tmp_path / "protocol.log").read_text()
    assert "root line" in overseer
    assert "GRP_V_CH_GRANT" in protocol
    assert "GRP_V_CH_GRANT" not in overseer      # propagate=False
    assert "System Status: denver" in overseer   # quality → root file too
    # reset to default config so later tests aren't redirected
    logging.getLogger("protocol").handlers.clear()
    logging.getLogger().handlers.clear()
    logging.basicConfig()
