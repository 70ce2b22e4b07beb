"""Offline file→wav decode (the reference's only hardware-free path,
file_to_wav.py; SURVEY.md §4 regression surface)."""

import numpy as np

from radiocapture_tpu.audio.wav import read_wav
from radiocapture_tpu.fec import bits as B
from radiocapture_tpu.protocol import p25 as P
from radiocapture_tpu.testing import modulators as M
from radiocapture_tpu.tools.file_to_wav import file_to_wav, decode_p25

SAMP_RATE = 2.4e6


def test_analog_file_to_wav(tmp_path):
    """A 700 Hz FM-modulated tone survives the full offline chain into
    the wav with the right pitch."""
    fs_ch = 25000.0
    t = np.arange(int(1.0 * fs_ch)) / fs_ch
    audio = 0.7 * np.sin(2 * np.pi * 700.0 * t)
    nb = M.fm_modulate(audio, fs_ch, 4000.0)
    wide = M.freq_shift(M.upsample_to(nb, fs_ch, SAMP_RATE),
                        SAMP_RATE, -300e3)
    inp = tmp_path / "cap.dat"
    wide.astype(np.complex64).tofile(inp)
    out = tmp_path / "out.wav"
    stats = file_to_wav(str(inp), str(out), SAMP_RATE, offset_hz=-300e3,
                        modulation="analog")
    assert stats["duration_s"] > 0.8
    pcm, rate = read_wav(str(out))
    assert rate == 8000
    seg = pcm[2000:6000].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak_hz = np.argmax(spec[10:]) + 10
    peak_hz *= 8000.0 / len(seg)
    assert abs(peak_hz - 700.0) < 15.0, peak_hz


def test_p25_file_decode_counts_voice_frames():
    """A synthesized LDU1 stream yields the right IMBE frame count and
    voice PCM — the p25 path loads the in-repo native vocoder by
    default, matching the reference's always-voice-decoding
    file_to_wav.py:92 (op25 repeater.vocoder)."""
    lc = P.make_link_control(0x0, tgid=123, source_id=456)
    vcs = (np.arange(9 * 144).reshape(9, 144) % 2).astype(np.uint8)
    frames = [P.build_ldu1_frame(0x293, lc, vcs) for _ in range(4)]
    dibits = B.bits_to_dibits(np.concatenate(frames))
    iq = M.c4fm_modulate(dibits, fs=25000.0)
    wide = M.freq_shift(M.upsample_to(iq, 25000.0, SAMP_RATE),
                        SAMP_RATE, 100e3)
    audio, stats = decode_p25(wide, SAMP_RATE, offset_hz=100e3)
    assert stats["ldu"] >= 2
    assert stats["imbe"] == stats["ldu"] * 9
    assert len(audio) == stats["imbe"] * 160    # 20 ms per codeword
    # explicit opt-out (no vocoder) keeps the stats-only contract
    class _NoVoc:
        available = False
    audio2, stats2 = decode_p25(wide, SAMP_RATE, offset_hz=100e3,
                                vocoder=_NoVoc())
    assert stats2["imbe"] == stats["imbe"] and len(audio2) == 0
