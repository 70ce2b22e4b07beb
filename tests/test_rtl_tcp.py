"""rtl_tcp streaming producer: wire protocol, ring ingest, reconnect,
and the live-SDR SiteRuntime path (reference osmosdr rtlsdr init,
rc_frontend/receiver.py:170-204, replaced by network-attached dongles)."""

import time

import numpy as np
import pytest

from radiocapture_tpu.frontend import rtl_tcp as R


def test_parse_addr_forms():
    assert R.parse_addr("rtl_tcp=10.0.0.5:2000") == ("10.0.0.5", 2000)
    assert R.parse_addr("10.0.0.5:2000") == ("10.0.0.5", 2000)
    assert R.parse_addr("sdrhost") == ("sdrhost", 1234)
    assert R.parse_addr("rtl=2") == ("127.0.0.1", 1236)
    assert R.parse_addr("", index=3) == ("127.0.0.1", 1237)


def _wait(cond, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.01)
    return False


def test_client_handshake_configure_and_stream():
    rng = np.random.default_rng(0)
    iq = (rng.uniform(-0.7, 0.7, 4096)
          + 1j * rng.uniform(-0.7, 0.7, 4096)).astype(np.complex64)
    srv = R.FakeRtlTcpServer(iq, samp_rate=1.2e6)
    src = R.RtlTcpSource(srv.host, srv.port, samp_rate=1.2e6,
                         center_freq=857_000_000, ppm=12,
                         gain_tenth_db=297)
    try:
        assert _wait(lambda: src.ring.available >= 4096)
        assert src.tuner_type == 5 and src.tuner_gain_count == 29
        # the server reads commands on its own thread; samples can
        # arrive before it has drained all five config writes
        assert _wait(lambda: len(srv.commands) >= 5)
        cmds = dict(srv.commands)
        assert cmds[R.CMD_SET_SAMP_RATE] == 1_200_000
        assert cmds[R.CMD_SET_FREQ] == 857_000_000
        assert cmds[R.CMD_SET_FREQ_CORRECTION] == 12
        assert cmds[R.CMD_SET_GAIN_MODE] == 1
        assert cmds[R.CMD_SET_GAIN] == 297
        # samples survive the cu8 round trip within quantization error
        blk = src.ring.pop(4096)
        assert blk is not None
        got = blk[:, 0] + 1j * blk[:, 1]
        assert np.max(np.abs(got - iq)) < 1.5 / 127.5
        # AFC verb reaches the server
        src.set_center_freq(857_000_400)
        assert _wait(lambda: (R.CMD_SET_FREQ, 857_000_400)
                     in srv.commands)
    finally:
        src.stop()
        srv.close()


def test_client_reconnects_and_reconfigures():
    iq = np.zeros(2048, np.complex64)
    srv = R.FakeRtlTcpServer(iq)
    src = R.RtlTcpSource(srv.host, srv.port, samp_rate=2.4e6,
                         center_freq=851_000_000, reconnect_s=0.05)
    try:
        assert _wait(lambda: src.connects == 1)
        n_cmds = len(srv.commands)
        srv.drop_connections()
        assert _wait(lambda: src.connects >= 2), "no reconnect"
        # configuration re-sent on the new connection
        assert _wait(lambda: len(srv.commands) > n_cmds)
        assert (R.CMD_SET_FREQ, 851_000_000) in srv.commands[n_cmds:]
    finally:
        src.stop()
        srv.close()


@pytest.mark.slow
def test_runtime_decodes_grant_from_rtl_tcp_stream(tmp_path):
    """The full live-SDR path: a fake rtl_tcp daemon streams a cu8
    P25 control-channel capture in real time; SiteRuntime (source type
    'rtlsdr') consumes it through the native ingest ring and decodes
    the channel grant — reference rc_frontend/receiver.py:170-204 +
    §3.2 end to end."""
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
        "Channel": 0x1000, "Group Address": 900, "Source Address": 45})
    frames = [P.build_tsdu_frame(0x293, [iden]),
              P.build_tsdu_frame(0x293, [grant])] * 10
    cc_iq = M.upsample_to(
        M.c4fm_modulate(B.bits_to_dibits(np.concatenate(frames)),
                        fs=25000.0), 25000.0, SAMP)
    wide = M.multi_channel(SAMP, [(CC - CENTER, cc_iq)], len(cc_iq),
                           noise_floor_db=-60.0)
    wide = (wide / (np.max(np.abs(wide)) * 1.2)).astype(np.complex64)

    srv = R.FakeRtlTcpServer(wide, samp_rate=SAMP, realtime=True)
    cfg = RcConfig()
    cfg.audio_dir = str(tmp_path / "audio")
    cfg.num_slots_per_source = 8
    cfg.block_seconds = 0.05
    cfg.sources[0] = SourceConfig(type="rtlsdr",
                                  args=f"rtl_tcp={srv.host}:{srv.port}",
                                  center_freq=CENTER, samp_rate=SAMP)
    cfg.systems[0] = SystemConfig(type="p25", id="LiveSys",
                                  control_channels=[CC])
    providers, live = providers_from_config(cfg)
    assert len(live) == 1
    rt = SiteRuntime(cfg, providers)
    grants = []
    rt.bus.subscribe("/topic/raw_control/*", grants.append)
    try:
        # commands reached the "dongle"
        assert _wait(lambda: (R.CMD_SET_FREQ, int(CENTER))
                     in srv.commands)
        deadline = time.time() + 20.0
        while time.time() < deadline:
            rt.step()
            if any(g.get("name") == "GRP_V_CH_GRANT"
                   and g.get("crc") == 0 for g in grants):
                break
        hits = [g for g in grants if g.get("name") == "GRP_V_CH_GRANT"
                and g.get("crc") == 0]
        assert hits, f"no grant decoded from the rtl_tcp stream " \
                     f"({len(grants)} control msgs, " \
                     f"{live[0].bytes_in} bytes in, " \
                     f"dropped={live[0].ring.dropped})"
        assert hits[0]["Group Address"] == 900
    finally:
        rt.close()
        for s in live:
            s.stop()
        srv.close()
