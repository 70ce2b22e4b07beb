#!/usr/bin/env python3
"""rciq driver-host sender: run this NEXT TO the USRP/bladeRF.

Streams the radio to capture hosts over the rciq protocol
(radiocapture_tpu/frontend/rciq.py) and applies tune/rate/gain
commands they send back (AFC). Hardware access uses UHD's Python API
when available, else SoapySDR (which also covers bladeRF); with
neither installed, --driver tone streams a synthetic carrier so the
path can be exercised end to end.

Usage (one process per stream; a 2-ch USRP runs two with --channel):
    driver_host_sender.py --rate 8e6 --freq 857e6 --port 41234 \\
        --fmt cs16 [--driver uhd|soapy|tone] [--args serial=...] \\
        [--channel 0] [--gain 30]

Capture-host side: SourceConfig(type="usrp", args="rciq=host:41234").
"""

import argparse
import sys
import time

import numpy as np

import os  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from radiocapture_tpu.frontend.rciq import RcIqServer  # noqa: E402

BLOCK = 65536


def open_radio(driver, args, channel, rate, freq, gain):
    if driver in ("uhd", "auto"):
        try:
            import uhd
            usrp = uhd.usrp.MultiUSRP(args)
            usrp.set_rx_rate(rate, channel)
            usrp.set_rx_freq(uhd.types.TuneRequest(freq), channel)
            if gain is not None:
                usrp.set_rx_gain(gain, channel)
            st = usrp.get_rx_stream(uhd.usrp.StreamArgs("fc32", "sc16"))
            md = uhd.types.RXMetadata()
            buf = np.empty(BLOCK, np.complex64)
            st.issue_stream_cmd(uhd.types.StreamCMD(
                uhd.types.StreamMode.start_cont))

            def read():
                n = st.recv(buf, md)
                return buf[:n]

            def tune(hz):
                usrp.set_rx_freq(uhd.types.TuneRequest(hz), channel)
            return read, tune, False
        except ImportError:
            if driver == "uhd":
                raise
    if driver in ("soapy", "auto"):
        try:
            import SoapySDR
            dev = SoapySDR.Device(args)
            dev.setSampleRate(SoapySDR.SOAPY_SDR_RX, channel, rate)
            dev.setFrequency(SoapySDR.SOAPY_SDR_RX, channel, freq)
            if gain is not None:
                dev.setGain(SoapySDR.SOAPY_SDR_RX, channel, gain)
            st = dev.setupStream(SoapySDR.SOAPY_SDR_RX,
                                 SoapySDR.SOAPY_SDR_CF32, [channel])
            dev.activateStream(st)
            buf = np.empty(BLOCK, np.complex64)

            def read():
                r = dev.readStream(st, [buf], BLOCK)
                return buf[:max(0, r.ret)]

            def tune(hz):
                dev.setFrequency(SoapySDR.SOAPY_SDR_RX, channel, hz)
            return read, tune, False
        except ImportError:
            if driver == "soapy":
                raise
    # synthetic fallback: a -6 dBFS carrier 100 kHz above center
    phase = [0.0]

    def read():
        t = np.arange(BLOCK) + phase[0]
        phase[0] += BLOCK
        return (0.5 * np.exp(2j * np.pi * 1e5 * t / rate)
                ).astype(np.complex64)

    return read, (lambda hz: None), True


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rate", type=float, required=True)
    ap.add_argument("--freq", type=float, required=True)
    ap.add_argument("--port", type=int, default=41234)
    ap.add_argument("--bind", default="0.0.0.0")
    ap.add_argument("--fmt", default="cs16", choices=("cs16", "cf32"))
    ap.add_argument("--driver", default="auto",
                    choices=("auto", "uhd", "soapy", "tone"))
    ap.add_argument("--args", default="")
    ap.add_argument("--channel", type=int, default=0)
    ap.add_argument("--gain", type=float, default=None)
    a = ap.parse_args()

    read, tune, synthetic = open_radio(a.driver, a.args, a.channel,
                                       a.rate, a.freq, a.gain)

    def on_command(obj):
        if obj.get("cmd") == "tune" and isinstance(
                obj.get("hz"), (int, float)):
            tune(float(obj["hz"]))

    srv = RcIqServer(a.rate, a.freq, fmt=a.fmt, host=a.bind,
                     port=a.port, on_command=on_command)
    print(f"rciq sender on {srv.host}:{srv.port} "
          f"({a.fmt} @ {a.rate:.0f} S/s)", flush=True)
    # hardware reads pace themselves; the tone source must sleep
    try:
        while True:
            iq = read()
            if len(iq):
                srv.broadcast(iq)
            if synthetic:
                time.sleep(len(iq) / a.rate)
    except KeyboardInterrupt:
        pass
    finally:
        srv.close()


if __name__ == "__main__":
    main()
