"""FEC codec round-trip and error-correction tests."""

import numpy as np
import pytest

from radiocapture_tpu.fec import bits as B
from radiocapture_tpu.fec import crc as CRC
from radiocapture_tpu.fec import golay as G
from radiocapture_tpu.fec import hamming as H
from radiocapture_tpu.fec import trellis as TR
from radiocapture_tpu.fec.rs6 import rs_24_12, rs_36_20, rs_24_16


def test_crc16_tsbk_roundtrip(rng):
    for _ in range(20):
        data = rng.integers(0, 2, 80).astype(np.uint8)
        blk = CRC.tsbk_crc_encode(data)
        assert CRC.tsbk_crc_check(blk)
        bad = blk.copy()
        bad[rng.integers(0, 96)] ^= 1
        assert not CRC.tsbk_crc_check(bad)


def test_crc16_matches_reference_algorithm(rng):
    """Cross-check against the shift-through form the reference uses
    (p25_general.py:185-196): full 96-bit block -> 0 on valid CRC."""
    def ref_style(block96):
        poly = (1 << 12) + (1 << 5) + 1
        crc = 0
        dat = B.bits_to_int(block96)
        for i in range(12):
            byte = (dat >> ((11 - i) * 8)) & 0xFF
            for j in range(8):
                bit = (byte >> (7 - j)) & 1
                crc = ((crc << 1) | bit) & 0x1FFFF
                if crc & 0x10000:
                    crc = (crc & 0xFFFF) ^ poly
        return crc ^ 0xFFFF

    data = rng.integers(0, 2, 80).astype(np.uint8)
    blk = CRC.tsbk_crc_encode(data)
    assert ref_style(blk) == 0


def test_trellis_roundtrip_and_correction(rng):
    for _ in range(10):
        dibits = rng.integers(0, 4, 48).astype(np.uint8)
        coded = TR.trellis_encode(dibits)
        assert len(coded) == 98
        dec, err = TR.trellis_decode(coded)
        assert err == 0
        np.testing.assert_array_equal(dec, dibits)
        # Corrupt one transmitted dibit: Viterbi must still recover.
        bad = coded.copy()
        bad[rng.integers(0, 98)] ^= 3
        dec2, err2 = TR.trellis_decode(bad)
        np.testing.assert_array_equal(dec2, dibits)
        assert err2 > 0


def test_tsbk_196_bit_pipeline(rng):
    data = rng.integers(0, 2, 80).astype(np.uint8)
    block = CRC.tsbk_crc_encode(data)
    tx = TR.tsbk_encode(block)
    assert len(tx) == 196
    rx, errs = TR.tsbk_decode(tx)
    assert errs == 0
    np.testing.assert_array_equal(rx, block)
    assert CRC.tsbk_crc_check(rx)
    # Burst of 2 adjacent bit errors: deinterleave spreads, Viterbi fixes.
    bad = tx.copy()
    pos = int(rng.integers(0, 190))
    bad[pos: pos + 2] ^= 1
    rx2, _ = TR.tsbk_decode(bad)
    np.testing.assert_array_equal(rx2, block)


@pytest.mark.parametrize("code,nbits", [(G.golay_24_12, 3),
                                        (G.golay_18_6, 3)])
def test_golay_corrects_3_errors(code, nbits, rng):
    for _ in range(20):
        data = rng.integers(0, 2, code.k).astype(np.uint8)
        word = code.encode(data)
        errs = rng.choice(code.n, size=nbits, replace=False)
        bad = word.copy()
        bad[errs] ^= 1
        dec, nfix = code.decode(bad)
        assert dec is not None
        np.testing.assert_array_equal(dec, data)
        assert nfix == nbits


def test_hamming_corrects_1_error(rng):
    for _ in range(20):
        data = rng.integers(0, 2, 6).astype(np.uint8)
        word = H.encode_10_6(data)
        bad = word.copy()
        bad[rng.integers(0, 10)] ^= 1
        dec, nfix = H.decode_10_6(bad)
        np.testing.assert_array_equal(dec, data)
        assert nfix == 1


def test_hamming_matches_tia_table_vector():
    # From the Table 5-4 generator: data 100000 -> parity 1110.
    word = H.encode_10_6(np.array([1, 0, 0, 0, 0, 0], np.uint8))
    np.testing.assert_array_equal(word[6:], [1, 1, 1, 0])
    word = H.encode_10_6(np.array([0, 0, 0, 0, 0, 1], np.uint8))
    np.testing.assert_array_equal(word[6:], [1, 1, 0, 0])


@pytest.mark.parametrize("code", [rs_24_12, rs_36_20, rs_24_16])
def test_rs_roundtrip_and_correction(code, rng):
    t = code.t
    for trial in range(10):
        data = rng.integers(0, 64, code.k)
        word = code.encode(data)
        np.testing.assert_array_equal(word[: code.k], data)
        dec, n = code.decode(word)
        np.testing.assert_array_equal(dec, data)
        # Correct exactly t symbol errors.
        bad = word.copy()
        pos = rng.choice(code.n, size=t, replace=False)
        for p in pos:
            bad[p] ^= int(rng.integers(1, 64))
        dec2, n2 = code.decode(bad)
        assert dec2 is not None, f"t={t} errors not corrected"
        np.testing.assert_array_equal(dec2, data)
        assert n2 == t


def test_rs_bits_interface(rng):
    data_bits = rng.integers(0, 2, 12 * 6).astype(np.uint8)
    cw = rs_24_12.encode_bits(data_bits)
    assert len(cw) == 24 * 6
    dec, n = rs_24_12.decode_bits(cw)
    np.testing.assert_array_equal(dec, data_bits)


def test_bits_helpers(rng):
    v = rng.integers(0, 2, 96).astype(np.uint8)
    assert B.bits_to_int(B.int_to_bits(B.bits_to_int(v), 96)) == B.bits_to_int(v)
    d = B.bits_to_dibits(v)
    np.testing.assert_array_equal(B.dibits_to_bits(d), v)
