"""Spectrum scan → peak detection → batched trial-lock discovery, plus
the conventional scanning receiver (BASELINE config 1 surface; reference
fft_vector.py, fft_peak_detection.py, ov_scan.py, scanning_receiver.py).
"""

import numpy as np

from radiocapture_tpu.fec import bits as B
from radiocapture_tpu.protocol import p25 as P
from radiocapture_tpu.scan import (SpectrumScanner, find_channels,
                                   trial_p25_lock, average_offset,
                                   band_scan_candidates, ScanChannel,
                                   ScanningReceiver)
from radiocapture_tpu.testing import modulators as M

SAMP_RATE = 2.4e6
CENTER = 857.0e6


def _p25_cc_iq(nac=0x293, n_frames=10, cc_freq=857.5e6):
    frames = []
    cc_chan = 0x1000 + int(round((cc_freq - 851.00625e6) / 6.25e3))
    for i in range(n_frames):
        rfss = P.pack_tsbk("RFSS_STS_BCST", **{
            "LRA": 0, "System ID": 0x2C1, "RF Sub-system ID": 1,
            "Site ID": 7, "Channel": cc_chan, "System Service Class": 0x70})
        net = P.pack_tsbk("NET_STS_BCST", **{
            "LRA": 0, "WACN ID": 0xBEE00, "System ID": 0x2C1,
            "Channel": cc_chan, "System Service Class": 0x70})
        iden = P.pack_tsbk("IDEN_UP", last_block=True, **{
            "Identifier": 1, "BW": 100,
            "Base Frequency": int(851.00625e6 / 5),
            "Channel Spacing": 50, "Transmit Offset": 0x1B4})
        frames.append(P.build_tsdu_frame(nac, [rfss, net, iden]))
    dibits = B.bits_to_dibits(np.concatenate(frames))
    iq = M.c4fm_modulate(dibits, fs=25000.0)
    return M.upsample_to(iq, 25000.0, SAMP_RATE)


def test_spectrum_peaks():
    """Two modulated carriers in a 2.4 MS/s block are found at the right
    frequencies by the reference's find_peaks tuning."""
    scanner = SpectrumScanner(fft_len=16384)
    rng = np.random.default_rng(7)
    n = 16384 * 16
    tone_a = M.fsk2_modulate(rng.integers(0, 2, 4000), SAMP_RATE,
                             9600.0, 4000.0)
    tone_b = M.fsk2_modulate(rng.integers(0, 2, 4000), SAMP_RATE,
                             3600.0, 4000.0)
    wide = M.multi_channel(SAMP_RATE, [(-400e3, tone_a), (250e3, tone_b)],
                           n, noise_floor_db=-55.0, rng=rng)
    st = scanner.init()
    st = scanner.step(st, np.stack([wide.real, wide.imag], -1))
    spec = scanner.spectrum_db(st)
    assert spec.shape == (16384,)
    peaks = find_channels(spec, SAMP_RATE, CENTER)
    freqs = [p.frequency for p in peaks]
    # FSK power peaks on a deviation lobe (dev 4 kHz), so allow
    # half-channel error — discovery retries candidates at +/- offsets.
    assert any(abs(f - (CENTER - 400e3)) < 6e3 for f in freqs), freqs
    assert any(abs(f - (CENTER + 250e3)) < 6e3 for f in freqs), freqs


def test_discovery_trial_lock():
    """Of three candidate peaks only the true P25 control channel locks;
    its site detail and AFC offset are reported."""
    cc = 857.5e6
    iq = _p25_cc_iq(cc_freq=cc)
    wide = M.multi_channel(SAMP_RATE, [(cc - CENTER, iq)], len(iq),
                           noise_floor_db=-55.0)
    # Candidates: true CC (with 200 Hz tuning error — in-kernel capture
    # range; bigger offsets are the AFC retune loop's job, reference
    # demod_watcher p25_control_demod.py:564-581), plus two empty bins.
    cands = [cc + 200.0, CENTER - 300e3, CENTER + 600e3]
    results = trial_p25_lock(wide, SAMP_RATE, CENTER, cands)
    assert len(results) == 3
    by_freq = {r.frequency: r for r in results}
    hit = by_freq[cc + 200.0]
    assert hit.locked
    assert hit.site_detail["System ID"] == hex(0x2C1)
    assert hit.site_detail["Site ID"] == 7
    # Control Channel resolved through the IDEN table -> AFC offset.
    assert hit.site_detail["Control Channel"] == int(cc)
    assert hit.offset_hz is not None and abs(hit.offset_hz - 200.0) < 1.0
    assert not by_freq[CENTER - 300e3].locked
    assert not by_freq[CENTER + 600e3].locked
    assert "2c1" in hit.summary_line().lower()
    off = average_offset(results)
    assert off is not None and abs(off - 200.0) < 1.0


def test_band_scan_candidates():
    cands = band_scan_candidates([(851.0e6, 851.1e6)], step_hz=25e3,
                                 offsets_hz=(0.0, 2500.0))
    assert 851.0e6 in cands and 851.025e6 in cands
    assert 851.0e6 + 2500.0 in cands
    assert len(cands) == 10


def test_scanning_receiver_squelch_cycle():
    """Carrier present → new_call; activity while present; carrier gone
    beyond hang_time → timeout (scanning_receiver.py:53-97)."""
    freq = CENTER + 100e3
    ch = ScanChannel(frequency=freq, threshold=1e-4)
    fake_now = [0.0]
    events = {"new": [], "act": [], "to": []}
    sr = ScanningReceiver([ch], SAMP_RATE, CENTER,
                          on_new_call=events["new"].append,
                          on_activity=events["act"].append,
                          on_timeout=events["to"].append,
                          clock=lambda: fake_now[0])
    blk = sr.decim * 256
    audio = np.sin(2 * np.pi * 800.0 * np.arange(int(0.2 * 25000)) / 25000)
    nb = M.fm_modulate(audio * 0.8, 25000.0, 4000.0)
    on_air = M.freq_shift(M.upsample_to(nb, 25000.0, SAMP_RATE),
                          SAMP_RATE, 100e3)
    silence = (1e-5 * np.random.default_rng(5).standard_normal(3 * blk)
               ).astype(np.complex64)

    opened = sr.feed(on_air[:blk])
    assert len(opened) == 1
    cdr = opened[0]
    assert cdr["system_group_local"] == freq
    assert cdr["hang_time"] == 0.5
    fake_now[0] += 0.1
    sr.feed(on_air[blk:2 * blk])
    assert events["act"], "no activity refresh while carrier present"
    # Carrier drops; before hang_time no timeout, after hang_time closed.
    fake_now[0] += 0.2
    sr.feed(silence[:blk])
    assert not events["to"]
    fake_now[0] += 0.6
    sr.feed(silence[blk:2 * blk])
    assert len(events["to"]) == 1
    assert events["to"][0]["call_uuid"] == cdr["call_uuid"]


def test_scan_cli_fft_mode(tmp_path):
    """python -m radiocapture_tpu.scan fft: synthetic P25 control channel
    in a wideband capture → locked summary line in the output file
    (reference fft_based_scan.sh + fft_peak_detection.py flow)."""
    from radiocapture_tpu.scan.__main__ import main as scan_main

    fs = 2.4e6
    center = 857.0e6
    cc = 857.4e6
    ch = _p25_cc_iq(n_frames=30, cc_freq=cc)
    n = (len(ch) // 16384) * 16384
    iq = M.multi_channel(fs, [(cc - center, ch)], n,
                         noise_floor_db=-55.0,
                         rng=np.random.default_rng(3))
    path = tmp_path / "cap.dat"
    iq.astype(np.complex64).tofile(path)
    out = tmp_path / "fft.scan.output"
    scan_main(["fft", str(path), "-r", str(fs), "-f", str(center),
               "-o", str(out)])
    lines = [ln for ln in out.read_text().splitlines()
             if not ln.startswith("#")]
    assert lines, "no scan results"
    locked = [ln for ln in lines if "None None" not in ln]
    assert locked, f"no locked candidate in {lines}"
    assert any(str(int(cc)) in ln for ln in lines)
