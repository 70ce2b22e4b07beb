"""Ops tools: audio GC/migration, the terminal spectrum scope, and the
clock-drift estimator (reference audio/cleanup.sh, migrate-audio.sh,
util/diag_scope.py, util/measure_drift*.sh)."""

import os
import time

import numpy as np

from radiocapture_tpu.testing import modulators as M
from radiocapture_tpu.tools import audio_gc as G
from radiocapture_tpu.tools.diag_scope import scope, render_spectrum


def _touch(path, age_days=0.0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"x")
    if age_days:
        old = time.time() - age_days * 86400
        os.utime(path, (old, old))


def test_audio_gc_migrate_and_prune(tmp_path):
    audio = str(tmp_path / "audio")
    perm = str(tmp_path / "perm")
    _touch(f"{audio}/2026/08/18/04/i1/500/call1.mp3")
    _touch(f"{audio}/2026/08/18/04/i1/500/call1.tags.json")
    _touch(f"{audio}/2026/08/18/04/i1/500/fresh.wav", age_days=0.0)
    _touch(f"{audio}/2026/08/17/22/i1/500/stale.wav", age_days=2.0)
    _touch(f"{audio}/2026/08/17/22/i1/500/stale.dat", age_days=2.0)

    moved = G.migrate_mp3s(audio, perm)
    assert sorted(moved) == ["2026/08/18/04/i1/500/call1.mp3",
                             "2026/08/18/04/i1/500/call1.tags.json"]
    assert os.path.exists(f"{perm}/2026/08/18/04/i1/500/call1.mp3")
    assert not os.path.exists(f"{audio}/2026/08/18/04/i1/500/call1.mp3")

    removed = G.gc_stale(audio, max_age_days=1.0)
    assert sorted(removed) == ["2026/08/17/22/i1/500/stale.dat",
                               "2026/08/17/22/i1/500/stale.wav"]
    assert os.path.exists(f"{audio}/2026/08/18/04/i1/500/fresh.wav")

    pruned = G.prune_empty_dirs(audio)
    assert pruned >= 4
    assert not os.path.exists(f"{audio}/2026/08/17")


def test_diag_scope_renders_carrier():
    fs = 400e3
    iq = M.tone(fs, 50e3, 4096 * 8, amp=1.0)
    iq = M.awgn(iq, 30)
    out = scope(iq, fs, center_freq=857e6, fft_len=4096, frames=8,
                width=80)
    line, label = out.split("\n")
    assert len(line) == 80
    assert "856.800 MHz" in label and "857.200 MHz" in label
    # carrier at +50 kHz of a 400 kHz span → (50+200)/400 = 62.5% across
    peak_col = max(range(80), key=lambda i: " ▁▂▃▄▅▆▇█".index(line[i]))
    assert 46 <= peak_col <= 54, (peak_col, line)


def test_render_spectrum_flat_noise_is_quiet():
    rng = np.random.default_rng(0)
    spec = rng.normal(-80, 0.1, 4096)
    line = render_spectrum(spec, width=50)
    assert set(line) <= set(" ▁▂▃")


def test_uploader_bus_and_spool(tmp_path):
    """Uploader delivers finished calls (mp3 + CDR sidecar) preserving
    the tree layout, in both bus mode and spool-sweep mode."""
    import json
    import os
    import time
    from radiocapture_tpu.control.bus import InProcBus
    from radiocapture_tpu.tools.uploader import Uploader, sweep_spool

    audio = tmp_path / "audio" / "2026" / "8" / "18" / "7" / "inst" / "42"
    audio.mkdir(parents=True)
    dest = tmp_path / "dest"
    mp3 = audio / "abc.mp3"
    mp3.write_bytes(b"ID3fakeaudio")

    bus = InProcBus(num_workers=1)
    up = Uploader(bus, str(tmp_path / "audio"), dest=str(dest))
    bus.send_event_hopeful("/queue/call_management/call_complete",
                           {"filename": str(mp3),
                            "cdr": {"call_uuid": "abc", "tg": 42}})
    deadline = time.time() + 3.0
    while up.delivered == 0 and time.time() < deadline:
        time.sleep(0.05)
    rel = "2026/8/18/7/inst/42/abc.mp3"
    assert (dest / rel).read_bytes() == b"ID3fakeaudio"
    cdr = json.loads((dest / (rel + ".cdr.json")).read_text())
    assert cdr["tg"] == 42
    bus.close()

    # spool mode picks up leftovers with a .tags.json sidecar
    mp3b = audio / "def.mp3"
    mp3b.write_bytes(b"x")
    (audio / "def.tags.json").write_text('{"call_uuid": "def"}')
    os.utime(mp3b, (time.time() - 120, time.time() - 120))
    n = sweep_spool(str(tmp_path / "audio"), str(dest), None,
                    min_age_s=30.0)
    assert n == 1
    assert (dest / "2026/8/18/7/inst/42/def.mp3").exists()
    assert not mp3b.exists()


def test_measure_drift_recovers_ppm_and_slope(tmp_path, capsys):
    """A receiver clock running +2.5 ppm fast with a linear drift makes
    a known carrier appear low by carrier*ppm; the estimator must
    recover both the mean ppm and the drift rate."""
    import json

    import numpy as np

    from radiocapture_tpu.tools import measure_drift as D

    fs = 250e3
    center = 857.0e6
    carrier = 857.05e6
    dur = 8.0
    n = int(fs * dur)
    t = np.arange(n) / fs
    ppm0, ppm_per_hr = 2.5, 30.0
    ppm_t = ppm0 + ppm_per_hr * t / 3600.0
    # apparent baseband offset of the carrier under a fast clock:
    # f_app - f_nom = -carrier*ppm(t)/1e6 (integrate for phase)
    f_err = -carrier * ppm_t / 1e6
    phase = 2 * np.pi * np.cumsum((carrier - center + f_err) / fs)
    iq = (0.5 * np.exp(1j * phase)).astype(np.complex64)
    r = D.measure_drift(iq, fs, carrier - center, carrier,
                        window_s=1.0)
    assert abs(r["ppm"] - ppm0) < 0.05, r["ppm"]
    assert abs(r["ppm_drift_per_hour"] - ppm_per_hr) < 6.0
    # CLI + telegraf form
    p = tmp_path / "cap.cf32"
    iq.tofile(p)
    D.main([str(p), "--samp-rate", str(fs), "--center", str(center),
            "--carrier", str(carrier)])
    out = json.loads(capsys.readouterr().out)
    assert abs(out["ppm"] - ppm0) < 0.05
    D.main([str(p), "--samp-rate", str(fs), "--center", str(center),
            "--carrier", str(carrier), "--telegraf", "--device", "d7"])
    line = capsys.readouterr().out.strip()
    assert line.startswith("sdr_drift,device=d7 ppm=")
