"""rciq driver-host ingest: wire protocol, ring ingest, reconnect, and
the USRP/bladeRF SiteRuntime path (the reference's in-process UHD /
osmosdr source init, rc_frontend/receiver.py:88-169, replaced by a
driver host streaming cs16/cf32 — frontend/rciq.py)."""

import threading
import time

import numpy as np
import pytest

from radiocapture_tpu.frontend import rciq as R


def test_parse_args_forms():
    assert R.parse_args("rciq=10.0.0.5:2000") == ("10.0.0.5", 2000,
                                                  "cs16")
    assert R.parse_args("10.0.0.5:2000,fmt=cf32") == ("10.0.0.5", 2000,
                                                      "cf32")
    assert R.parse_args("sdrhost") == ("sdrhost", R.DEFAULT_PORT, "cs16")
    assert R.parse_args("", index=3) == ("127.0.0.1",
                                         R.DEFAULT_PORT + 3, "cs16")
    with pytest.raises(ValueError):
        R.parse_args("host:1,fmt=cu8")


def _wait(cond, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.01)
    return False


class _Pump:
    """Replays a capture through RcIqServer.broadcast, optionally at
    the stream's real-time rate (the role of the driver-host loop in
    tools/driver_host_sender.py)."""

    def __init__(self, srv, iq, samp_rate, chunk=8192, realtime=False):
        self.srv, self.iq = srv, np.asarray(iq)
        self.samp_rate, self.chunk = samp_rate, chunk
        self.realtime = realtime
        self._running = True
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        pos = 0
        while self._running:
            end = pos + self.chunk
            blk = self.iq[pos:end]
            if len(blk) < self.chunk:
                blk = np.concatenate(
                    [blk, self.iq[:self.chunk - len(blk)]])
            pos = end % len(self.iq)
            self.srv.broadcast(blk)
            time.sleep(self.chunk / self.samp_rate
                       if self.realtime else 0.002)

    def stop(self):
        self._running = False
        self._t.join(timeout=2.0)


def test_client_handshake_configure_and_stream():
    rng = np.random.default_rng(0)
    iq = (rng.uniform(-0.7, 0.7, 8192)
          + 1j * rng.uniform(-0.7, 0.7, 8192)).astype(np.complex64)
    srv = R.RcIqServer(8e6, 857e6, fmt="cs16")
    pump = _Pump(srv, iq, 8e6)
    src = R.RcIqSource(srv.host, srv.port, samp_rate=8e6,
                       center_freq=857_000_000.0, fmt="cs16",
                       gains={"RF": 30})
    try:
        assert _wait(lambda: src.ring.available >= 8192)
        assert src.server_rate == 8e6 and src.server_freq == 857e6
        assert _wait(lambda: len(srv.commands) >= 3)
        by_cmd = {c["cmd"]: c for c in srv.commands}
        assert by_cmd["rate"]["hz"] == 8e6
        assert by_cmd["tune"]["hz"] == 857_000_000.0
        assert by_cmd["gain"] == {"cmd": "gain", "db": 30.0,
                                  "name": "RF"}
        # samples survive the cs16 round trip within quantization error
        blk = src.ring.pop(8192)
        assert blk is not None
        got = blk[:, 0] + 1j * blk[:, 1]
        # stream may start anywhere in the looped capture; locate it
        k = int(np.argmin([np.abs(got[0] - iq[j])
                           for j in range(len(iq))]))
        ref = np.roll(iq, -k)[:len(got)]
        assert np.max(np.abs(got - ref)) < 2.0 / 32767
        # AFC verb reaches the driver host
        src.set_center_freq(857_000_400.0)
        assert _wait(lambda: any(
            c.get("cmd") == "tune" and c.get("hz") == 857_000_400.0
            for c in srv.commands))
        assert srv.center_freq == 857_000_400.0
    finally:
        src.stop()
        pump.stop()
        srv.close()


def test_format_mismatch_refused():
    srv = R.RcIqServer(8e6, 857e6, fmt="cf32")
    src = R.RcIqSource(srv.host, srv.port, samp_rate=8e6,
                       center_freq=857e6, fmt="cs16", reconnect_s=0.05)
    try:
        time.sleep(0.5)
        assert src.connects == 0      # handshake rejected, no stream
    finally:
        src.stop()
        srv.close()


def test_client_reconnects_and_reconfigures():
    srv = R.RcIqServer(10e6, 851e6, fmt="cs16")
    pump = _Pump(srv, np.zeros(4096, np.complex64), 10e6)
    src = R.RcIqSource(srv.host, srv.port, samp_rate=10e6,
                       center_freq=851_000_000.0, fmt="cs16",
                       reconnect_s=0.05)
    try:
        assert _wait(lambda: src.connects == 1)
        assert _wait(lambda: len(srv.commands) >= 2)
        n_cmds = len(srv.commands)
        srv.drop_connections()
        assert _wait(lambda: src.connects >= 2), "no reconnect"
        # configuration re-sent on the new connection
        assert _wait(lambda: len(srv.commands) > n_cmds)
        assert any(c.get("cmd") == "tune"
                   and c.get("hz") == 851_000_000.0
                   for c in srv.commands[n_cmds:])
    finally:
        src.stop()
        pump.stop()
        srv.close()


@pytest.mark.slow
def test_runtime_decodes_grant_from_rciq_stream(tmp_path):
    """The full driver-host path: a fake USRP host streams a cs16 P25
    control-channel capture in real time; SiteRuntime (source type
    'usrp') consumes it through the native ingest ring and decodes the
    channel grant — mirrors test_rtl_tcp.py's live-dongle e2e."""
    from radiocapture_tpu.fec import bits as B
    from radiocapture_tpu.protocol import p25 as P
    from radiocapture_tpu.runtime import (SiteRuntime,
                                          providers_from_config)
    from radiocapture_tpu.rxconfig import (RcConfig, SourceConfig,
                                           SystemConfig)
    from radiocapture_tpu.testing import modulators as M

    SAMP, CENTER, CC = 2.4e6, 857.0e6, 857.5e6
    iden = P.pack_tsbk("IDEN_UP", **{
        "Identifier": 1, "BW": 100, "Base Frequency": int(856.2e6 / 5),
        "Channel Spacing": 50, "Transmit Offset": 0x1B4})
    grant = P.pack_tsbk("GRP_V_CH_GRANT", last_block=True, **{
        "Channel": 0x1000, "Group Address": 901, "Source Address": 46})
    frames = [P.build_tsdu_frame(0x293, [iden]),
              P.build_tsdu_frame(0x293, [grant])] * 10
    cc_iq = M.upsample_to(
        M.c4fm_modulate(B.bits_to_dibits(np.concatenate(frames)),
                        fs=25000.0), 25000.0, SAMP)
    wide = M.multi_channel(SAMP, [(CC - CENTER, cc_iq)], len(cc_iq),
                           noise_floor_db=-60.0)
    wide = (wide / (np.max(np.abs(wide)) * 1.2)).astype(np.complex64)

    srv = R.RcIqServer(SAMP, CENTER, fmt="cs16")
    pump = _Pump(srv, wide, SAMP, chunk=32768, realtime=True)
    cfg = RcConfig()
    cfg.audio_dir = str(tmp_path / "audio")
    cfg.num_slots_per_source = 8
    cfg.block_seconds = 0.05
    cfg.sources[0] = SourceConfig(type="usrp",
                                  args=f"rciq={srv.host}:{srv.port}",
                                  center_freq=CENTER, samp_rate=SAMP)
    cfg.systems[0] = SystemConfig(type="p25", id="UsrpSys",
                                  control_channels=[CC])
    providers, live = providers_from_config(cfg)
    assert len(live) == 1
    rt = SiteRuntime(cfg, providers)
    grants = []
    rt.bus.subscribe("/topic/raw_control/*", grants.append)
    try:
        assert _wait(lambda: any(c.get("cmd") == "tune"
                                 and c.get("hz") == CENTER
                                 for c in srv.commands))
        deadline = time.time() + 20.0
        while time.time() < deadline:
            rt.step()
            if any(g.get("name") == "GRP_V_CH_GRANT"
                   and g.get("crc") == 0 for g in grants):
                break
        hits = [g for g in grants if g.get("name") == "GRP_V_CH_GRANT"
                and g.get("crc") == 0]
        assert hits, f"no grant decoded from the rciq stream " \
                     f"({len(grants)} control msgs, " \
                     f"{live[0].bytes_in} bytes in, " \
                     f"dropped={live[0].ring.dropped})"
        assert hits[0]["Group Address"] == 901
    finally:
        rt.close()
        for s in live:
            s.stop()
        pump.stop()
        srv.close()
