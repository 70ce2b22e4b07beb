"""P25 frame encode/decode round-trips + parity vs reference semantics."""

import numpy as np
import pytest

from radiocapture_tpu.fec import bits as B
from radiocapture_tpu.protocol import p25 as P


def test_status_symbols_roundtrip(rng):
    payload = rng.integers(0, 2, 700).astype(np.uint8)
    tx = P.insert_status(payload, status_dibit=1)
    assert len(tx) == 700 + 2 * (700 // 70)
    rx, status = P.strip_status(tx)
    np.testing.assert_array_equal(rx, payload)
    assert all(s == 1 for s in status)


def test_tsdu_frame_roundtrip():
    tsbk = P.pack_tsbk("GRP_V_CH_GRANT", mfid=0,
                       **{"Service Options": 0x00, "Channel": 0x100A,
                          "Group Address": 0x1234,
                          "Source Address": 0xABCDE})
    frame_bits = P.build_tsdu_frame(nac=0x293, tsbks96=[tsbk])
    fr = P.parse_frame(frame_bits)
    assert fr.duid == P.DUID_TSDU
    assert fr.nac == 0x293
    assert fr.errors == 0
    assert len(fr.tsbks) == 1
    t = fr.tsbks[0]
    assert t["crc"] == 0
    assert t["name"] == "GRP_V_CH_GRANT"
    assert t["Channel"] == 0x100A
    assert t["Group Address"] == 0x1234
    assert t["Source Address"] == 0xABCDE
    assert t["lb"] == 1


def test_tsdu_multi_block():
    t1 = P.pack_tsbk("IDEN_UP", mfid=0, **{
        "Identifier": 1, "BW": 100, "Transmit Offset": 0x1A4,
        "Channel Spacing": 100, "Base Frequency": int(851.00625e6 / 5)})
    t2 = P.pack_tsbk("NET_STS_BCST", mfid=0, **{
        "LRA": 0, "WACN ID": 0xBEE00, "System ID": 0x2C1,
        "Channel": 0x100A, "System Service Class": 0x70})
    t3 = P.pack_tsbk("RFSS_STS_BCST", mfid=0, **{
        "LRA": 0, "System ID": 0x2C1, "RF Sub-system ID": 1, "Site ID": 5,
        "Channel": 0x100A, "System Service Class": 0x70})
    frame_bits = P.build_tsdu_frame(nac=0x44D, tsbks96=[t1, t2, t3])
    fr = P.parse_frame(frame_bits)
    assert [t["name"] for t in fr.tsbks] == ["IDEN_UP", "NET_STS_BCST",
                                             "RFSS_STS_BCST"]
    assert [t["lb"] for t in fr.tsbks] == [0, 0, 1]
    assert all(t["crc"] == 0 for t in fr.tsbks)
    assert fr.tsbks[1]["WACN ID"] == 0xBEE00
    assert fr.tsbks[2]["Site ID"] == 5


def test_tsdu_resilient_to_bit_errors(rng):
    tsbk = P.pack_tsbk("GRP_V_CH_GRANT", mfid=0,
                       **{"Channel": 0x2005, "Group Address": 99,
                          "Source Address": 1000})
    frame_bits = P.build_tsdu_frame(nac=0x293, tsbks96=[tsbk])
    bad = frame_bits.copy()
    # 3 scattered errors inside the TSBK region (after sync+NID+statuses).
    for pos in (130, 190, 250):
        bad[pos] ^= 1
    fr = P.parse_frame(bad)
    assert fr.tsbks[0]["crc"] == 0
    assert fr.tsbks[0]["Group Address"] == 99


def test_moto_tsbk():
    tsbk = P.pack_tsbk("MOT_PAT_GRP_VOICE_CHAN_GRANT", mfid=0x90,
                       **{"Channel": 0x1003, "Super Group": 0xF00,
                          "Source Address": 77})
    fr = P.parse_frame(P.build_tsdu_frame(nac=1, tsbks96=[tsbk]))
    t = fr.tsbks[0]
    assert t["name"] == "MOT_PAT_GRP_VOICE_CHAN_GRANT"
    assert t["mfid"] == 0x90
    assert t["Super Group"] == 0xF00


def test_tlc_frame_roundtrip():
    lc = P.make_link_control(lcf=0x0, tgid=0x1234, source_id=0xABCDE)
    frame_bits = P.build_tlc_frame(nac=0x293, lc144=lc)
    fr = P.parse_frame(frame_bits)
    assert fr.duid == P.DUID_TLC
    assert fr.fields["lc"]["lcf"] == 0
    assert fr.fields["lc"]["tgid"] == 0x1234
    assert fr.fields["lc"]["source_id"] == 0xABCDE


def test_ldu1_frame_roundtrip(rng):
    lc = P.make_link_control(lcf=0x0, tgid=42, source_id=777)
    vc = rng.integers(0, 2, (9, 144)).astype(np.uint8)
    frame_bits = P.build_ldu1_frame(nac=0x293, lc144=lc, vc_bits=vc)
    fr = P.parse_frame(frame_bits)
    assert fr.duid == P.DUID_LDU1
    assert fr.fields["lc"]["tgid"] == 42
    assert fr.fields["lc"]["source_id"] == 777
    np.testing.assert_array_equal(fr.fields["vc"][3], vc[3])


def test_field_tables_structural_invariants():
    """Structural check only: every opcode's field widths sum to <= 64
    payload bits.  Name-by-name equality with the reference's
    p25_cai.py / p25_moto.py tables is asserted differentially in
    tests/test_reference_parity.py::test_tsbk_field_tables_match_reference_exactly."""
    from radiocapture_tpu.protocol.p25_fields import TSBK_OSP, TSBK_MOTO
    assert len(TSBK_OSP) == 44
    assert len(TSBK_MOTO) == 4
    for table in (TSBK_OSP, TSBK_MOTO):
        for op, (name, fields) in table.items():
            total = sum(w for _, w in fields)
            assert total <= 64, f"{name} fields exceed 64 bits: {total}"


def test_nid_carries_nac_duid():
    nid = P.make_nid(0xFED, 0x7)
    assert len(nid) == 64
    assert B.bits_to_int(nid[:12]) == 0xFED
    assert B.bits_to_int(nid[12:16]) == 0x7
