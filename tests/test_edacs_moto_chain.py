"""EDACS + Motorola control-channel chains: RF fixture -> typed events."""

import numpy as np
import jax.numpy as jnp

from radiocapture_tpu.demod import fsk4 as FSK4
from radiocapture_tpu.demod.engines import EdacsControlEngine, MotoControlEngine
from radiocapture_tpu.ops import fir as F
from radiocapture_tpu.ops import fm as FM
from radiocapture_tpu.protocol import edacs as E
from radiocapture_tpu.protocol import moto as MO
from radiocapture_tpu.testing import modulators as M

FS = 25000.0


# ---------------------------------------------------------------- EDACS
def test_edacs_bch_roundtrip(rng):
    for _ in range(20):
        data = rng.integers(0, 2, 36).astype(np.uint8)
        word = E.bch_encode(data)
        dec, n = E.bch_decode(word)
        np.testing.assert_array_equal(dec, word)
        # correct 2 errors
        bad = word.copy()
        pos = rng.choice(48, 2, replace=False)
        bad[pos] ^= 1
        dec2, n2 = E.bch_decode(bad)
        assert dec2 is not None
        np.testing.assert_array_equal(dec2, word)
        assert n2 == 2


def test_edacs_frame_election(rng):
    m1, m2 = E.make_call_assignment(lcn=5, group=321, logical_id=1234)
    frame = E.build_frame(m1, m2)
    assert len(frame) == 288
    got1, got2 = E.split_frame(frame[48:])
    ev = E.proc_cmd(got1, got2, channels={5: 851e6})
    assert ev["type"] == "call_assignment_analog"
    assert ev["channel"] == 5
    assert ev["group"] == 321
    assert ev["logical_id"] == 1234
    assert ev["frequency"] == 851e6

    # One corrupted copy: election still succeeds.
    bad = frame[48:].copy()
    bad[5:25] ^= 1  # trash most of copy 1 of message 1
    g1, g2 = E.split_frame(bad)
    assert g1 is not None
    ev2 = E.proc_cmd(g1, g2, channels={5: 851e6})
    assert ev2["logical_id"] == 1234


def _fsk_bits(iq, fs, baud, dev):
    gain = fs / (2 * np.pi * dev)
    _, disc = FM.quadrature_demod(FM.quad_demod_init(), jnp.asarray(iq), gain)
    taps = np.full(max(1, int(round(fs / baud / 2))), 1.0, np.float32)
    taps /= len(taps)
    fst = F.FirState(history=jnp.zeros(len(taps) - 1, jnp.float32))
    _, filt = F.fir_filter(fst, disc, jnp.asarray(taps))
    st = FSK4.fsk4_init()
    st, (sy, va) = FSK4.fsk4_demod(st, filt, fs, baud, levels=(-1.0, 1.0))
    syms = FSK4.compact_symbols(np.asarray(sy), np.asarray(va))
    return (syms > 0).astype(np.uint8)


def test_edacs_rf_chain():
    """9600-baud FSK over the air -> engine events."""
    msgs = []
    for i in range(6):
        m1, m2 = E.make_call_assignment(lcn=3 + (i % 2), group=100 + i,
                                        logical_id=9000 + i)
        msgs.append(E.build_frame(m1, m2))
    bits = np.concatenate([np.tile(np.array([0, 1], np.uint8), 40)]
                          + msgs)  # preamble for clock acquisition
    iq = M.fsk2_modulate(bits, FS, baud=9600.0, dev_hz=3000.0)
    iq = M.awgn(iq, 35.0)
    rx_bits = _fsk_bits(iq, FS, 9600.0, 3000.0)

    got = []
    eng = EdacsControlEngine(channels={3: 851e6, 4: 852e6},
                             on_event=got.append)
    eng.feed_bits(rx_bits)
    calls = [e for e in got if e["type"] == "call_assignment_analog"]
    assert len(calls) >= 4
    for e in calls:
        assert e["logical_id"] - 9000 == e["group"] - 100
        assert e["frequency"] in (851e6, 852e6)


# ---------------------------------------------------------------- Moto
def test_moto_parity_roundtrip(rng):
    data = rng.integers(0, 2, 38).astype(np.uint8)
    pkt = MO.add_parity(data)
    dec, had = MO.correct_parity(pkt)
    assert not had
    np.testing.assert_array_equal(dec, data)
    # flip one data bit in the interleaved frame
    tx = MO.interleave(pkt)
    tx[10] ^= 1
    dec2, had2 = MO.correct_parity(MO.deinterleave(tx))
    assert had2
    np.testing.assert_array_equal(dec2, data)


def test_moto_osw_parse():
    # dual-word analog grant: first word 0x308, then channel word.
    w1 = MO.make_osw(lid=0x1234, cmd=0x308)
    ev1 = MO.parse_osw(w1, channels={0x00A: 852.5e6})
    assert ev1["type"] == "First-word normal"
    w2 = MO.make_osw(lid=0x4321, cmd=0x00A)
    ev2 = MO.parse_osw(w2, last_cmd=0x308, last_lid=0x1234,
                       channels={0x00A: 852.5e6})
    assert ev2["type"] == "Analog Call"
    assert ev2["frequency"] == 852.5e6
    assert ev2["user_local"] == 0x1234
    # IDLE
    ev3 = MO.parse_osw(MO.make_osw(lid=0, cmd=0x2F8))
    assert ev3["type"] == "IDLE"


def test_moto_rf_chain():
    """3600-baud FSK -> OSW events incl. dual-word call grants."""
    words = [MO.make_osw(lid=0, cmd=0x2F8)] * 4
    for i in range(4):
        words.append(MO.make_osw(lid=0x3000 + 16 * i, cmd=0x308))
        words.append(MO.make_osw(lid=0x0010 * (i + 1), cmd=0x00A))
        words.append(MO.make_osw(lid=0, cmd=0x2F8))
    bits = np.concatenate(
        [np.tile(np.array([0, 1], np.uint8), 30)]
        + [MO.build_frame(w) for w in words])
    iq = M.fsk2_modulate(bits, FS, baud=3600.0, dev_hz=4000.0)
    iq = M.awgn(iq, 35.0)
    rx_bits = _fsk_bits(iq, FS, 3600.0, 4000.0)

    got = []
    eng = MotoControlEngine(channels={0x00A: 853.1e6}, system_id=0x7000,
                            on_event=got.append)
    eng.feed_bits(rx_bits)
    grants = [e for e in got if e["type"] == "Analog Call"]
    assert len(grants) >= 3
    for g in grants:
        assert g["frequency"] == 853.1e6
        assert g["user_local"] & 0x3000 == 0x3000
    assert any(e["type"] == "IDLE" for e in got)
