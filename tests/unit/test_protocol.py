"""Unit tests: burst parsing, MAC PDUs, fragmentation, SDS, LIP."""

import numpy as np
import pytest

from tetraear_tpu.frame import burst, lip, sds
from tetraear_tpu.frame.mac import MacParser, PDUType
from tetraear_tpu.ref import golden


# -- burst ----------------------------------------------------------------

def test_parse_burst_shape(rng):
    symbols = rng.integers(0, 4, 255)
    b = burst.parse_burst(symbols, slot_number=1)
    assert b is not None
    assert len(b.data_bits) == 216
    assert b.slot_number == 1


def test_parse_burst_too_short(rng):
    assert burst.parse_burst(rng.integers(0, 4, 100)) is None


def test_golden_burst_crc_passes():
    data = golden.build_mac_resource_data_bits(
        golden.sds_text_payload("AAA BBB"), rng=np.random.default_rng(2))
    slot = golden.build_slot(data, rng=np.random.default_rng(3))
    symbols = (slot[0::2].astype(np.int64) << 1) | slot[1::2]
    b = burst.parse_burst(symbols)
    assert b.crc_ok
    assert np.array_equal(b.data_bits, data)


def test_parse_burst_bits_equivalent(rng):
    """parse_burst_bits(symbols_to_bits(s)) == parse_burst(s) field for
    field, on random symbols and on a golden slot."""
    cases = [rng.integers(0, 4, 255)]
    data = golden.build_mac_resource_data_bits(
        golden.sds_text_payload("EQ TEST"), rng=np.random.default_rng(4))
    slot = golden.build_slot(data, rng=np.random.default_rng(5))
    cases.append((slot[0::2].astype(np.int64) << 1) | slot[1::2])
    for symbols in cases:
        a = burst.parse_burst(symbols, slot_number=2, frame_number=7)
        bits = burst.symbols_to_bits(symbols)
        b = burst.parse_burst_bits(bits, slot_number=2, frame_number=7)
        assert a.burst_type == b.burst_type
        assert a.crc_ok == b.crc_ok
        assert np.array_equal(a.data_bits, b.data_bits)
        assert np.array_equal(a.training_sequence, b.training_sequence)


def test_bits_bytes_roundtrip(rng):
    data = rng.integers(0, 256, 20, dtype=np.uint8).tobytes()
    assert burst.bits_to_bytes(burst.bytes_to_bits(data)) == data


# -- MAC ------------------------------------------------------------------

def test_mac_resource_parse():
    data = golden.build_mac_resource_data_bits(
        b"\x82HELLO WORLD", address=0xABCDEF,
        rng=np.random.default_rng(4))
    pdu = MacParser().parse_mac_pdu(data)
    assert pdu is not None
    assert pdu.pdu_type == PDUType.MAC_RESOURCE
    assert pdu.address == 0xABCDEF
    assert not pdu.encrypted
    assert pdu.data.startswith(b"\x82HELLO WORLD")


def test_mac_fragmentation_reassembly():
    parser = MacParser()
    start = golden.build_mac_resource_data_bits(
        b"\x82PART-ONE-", rng=np.random.default_rng(5))
    p1 = parser.parse_mac_pdu(start)
    assert p1.pdu_type == PDUType.MAC_RESOURCE

    frag_payload = b"PART-TWO"
    frag_bits = np.concatenate([
        np.array([0, 1, 0, 0, 0], dtype=np.uint8),   # MAC-FRAG, clear, fill
        burst.bytes_to_bits(frag_payload)])
    p2 = parser.parse_mac_pdu(frag_bits)
    assert p2.pdu_type == PDUType.MAC_FRAG

    end_payload = b"!!"
    end_bits = np.concatenate([
        np.array([1, 1, 0, 0, 0], dtype=np.uint8),   # MAC-END, clear, fill
        np.array([(len(end_payload) >> i) & 1
                  for i in range(5, -1, -1)], dtype=np.uint8),
        burst.bytes_to_bits(end_payload)])
    p3 = parser.parse_mac_pdu(end_bits)
    assert p3.pdu_type == PDUType.MAC_END
    assert p3.reassembled_data is not None
    assert b"PART-ONE-" in p3.reassembled_data
    assert b"PART-TWO" in p3.reassembled_data
    assert b"!!" in p3.reassembled_data


def test_mac_broadcast_sysinfo_validation():
    parser = MacParser()
    # type=10 (broadcast), btype=00 (sysinfo), MCC=260 (Poland), MNC=99, CC=5
    bits = np.zeros(64, dtype=np.uint8)
    bits[0] = 1                       # pdu type = 10
    mcc, mnc, cc = 260, 99, 5
    for i in range(10):
        bits[4 + i] = (mcc >> (9 - i)) & 1
    for i in range(14):
        bits[14 + i] = (mnc >> (13 - i)) & 1
    for i in range(6):
        bits[28 + i] = (cc >> (5 - i)) & 1
    pdu = parser.parse_mac_pdu(bits)
    assert pdu is not None
    assert parser.mcc == 260 and parser.mnc == 99 and parser.colour_code == 5

    # invalid MCC -> rejected (protocol.py:487-495)
    bad = bits.copy()
    for i in range(10):
        bad[4 + i] = (100 >> (9 - i)) & 1
    assert MacParser().parse_mac_pdu(bad) is None


def test_call_metadata_resource():
    parser = MacParser()
    payload = bytes([0x80]) + (0x00ABCD).to_bytes(3, "big") + bytes(
        [0x05, 0x84, 0x12, 0x34])
    data = golden.build_mac_resource_data_bits(
        payload, rng=np.random.default_rng(6))
    pdu = parser.parse_mac_pdu(data)
    meta = parser.parse_call_metadata(pdu)
    assert meta is not None
    assert meta.call_type == "Group"
    assert meta.talkgroup_id == 0x00ABCD
    assert meta.encryption_enabled


# -- SDS ------------------------------------------------------------------

def test_sds1_text():
    assert sds.parse_sds_data(b"\x05\x00\xC8HELLO") == "[SDS-1] HELLO"


def test_sds_tl_text_latin1():
    out = sds.parse_sds_data(b"\x82Status OK here")
    assert out == "[TXT] Status OK here"


def test_sds_gsm7_roundtrip():
    text = "STATUS OK"
    packed = sds.pack_gsm7(text)
    assert sds.unpack_gsm7(packed, septet_count=len(text)) == text
    payload = bytes([0x07, 0x00, len(text)]) + packed
    out = sds.parse_sds_data(payload)
    assert out is not None and "STATUS OK" in out


def test_sds_binary_encrypted_tag(rng):
    blob = bytes(rng.permutation(256)[:64].astype(np.uint8))
    out = sds.parse_sds_data(b"\x9f" + blob)
    assert out.startswith("[BIN-ENC]")


def test_sds_binary_preview():
    out = sds.parse_sds_data(b"\x10\x01\x01\x01")
    assert out.startswith("[BIN]") and "PID=0x10" in out


def test_text_validation():
    assert sds.is_valid_text("Hello world")
    assert not sds.is_valid_text("")
    assert not sds.is_valid_text("aaaaaaa")     # pure repetition
    assert not sds.is_valid_text("\x01\x02\x03\x04")


# -- LIP ------------------------------------------------------------------

def test_lip_short_roundtrip():
    payload = lip.encode_lip_short(52.2297, 21.0122)   # Warsaw
    out = lip.parse_lip(payload)
    assert out is not None and "(Short)" in out
    lat = float(out.split("Lat: ")[1].split(",")[0])
    lon = float(out.split("Lon: ")[1].split(" ")[0])
    assert abs(lat - 52.2297) < 1e-3
    assert abs(lon - 21.0122) < 1e-3


def test_lip_via_sds_pid():
    payload = bytes([0x0C]) + lip.encode_lip_short(50.06, 19.94)  # Krakow
    out = sds.parse_sds_data(payload)
    assert out.startswith("[LIP]")


def test_lip_nmea_text():
    out = lip.parse_lip(b"$GPGGA,123519,4807.038,N,01131.000,E,1*47")
    assert out is not None and out.startswith("NMEA:")


@pytest.mark.unit
def test_text_gates_vectorized():
    """The vectorized score_text / is_valid_text equal the reference
    per-character predicates on a unicode torture set (incl. the
    non-BMP fallback path)."""
    import random
    from tetraear_tpu.frame.sds import score_text, is_valid_text

    def ref_score(text):
        if not text:
            return 0.0
        printable = sum(1 for c in text if c.isprintable() and c != "\x1b")
        alnum = sum(1 for c in text if c.isalnum() or c.isspace())
        alpha = sum(1 for c in text if c.isalpha())
        return (printable / len(text)) + (alnum / len(text)) + (
            0.5 if alpha > 0 else 0.0)

    def ref_valid(text, threshold=0.8):
        if not text or len(text) < 2:
            return False
        clean = "".join(c for c in text if c not in "\n\r\t ")
        if not clean:
            return False
        printable = sum(1 for c in text if c.isprintable() or c in "\n\r\t")
        ratio = printable / len(text)
        if len(text) > 4 and text.count(text[0]) == len(text):
            return False
        alnum = sum(1 for c in text if c.isalnum() or c == " ")
        return ratio >= threshold and (alnum / len(text)) > 0.5

    rng = random.Random(8)
    cases = ["", "a", "  ", "\n\r\t ", "AAAAA", "ALARM ZONE 7",
             "caf\xe9 ΔΩ", "bin\x00\x01\x02", "\x1b\x1b\x1b",
             "emoji \U0001F600 text", "\U0001F600\U0001F601",
             "mixed \xff\xfe\x7f"]
    for _ in range(300):
        n = rng.randrange(1, 40)
        cases.append("".join(chr(rng.randrange(1, 0x2500))
                             for _ in range(n)))
    for _ in range(50):
        n = rng.randrange(1, 10)
        cases.append("".join(chr(rng.randrange(1, 0x110000))
                             for _ in range(n)))
    for t in cases:
        assert score_text(t) == ref_score(t), repr(t)
        assert is_valid_text(t) == ref_valid(t), repr(t)
        assert is_valid_text(t, 0.55) == ref_valid(t, 0.55), repr(t)


@pytest.mark.unit
def test_unpack_gsm7_vectorized():
    """Vectorized unpack_gsm7 == the reference per-bit formulation,
    including 0x1B escapes, septet counts, skip_bits and UDH."""
    import random
    from tetraear_tpu.frame.sds import (unpack_gsm7, unpack_gsm7_udh,
                                        GSM7_EXTENSION, gsm7_map, pack_gsm7)

    def ref_unpack(data, septet_count=None, skip_bits=0):
        if not data:
            return ""
        bits = []
        for b in data:
            for i in range(8):
                bits.append((b >> i) & 1)
        if skip_bits:
            if skip_bits >= len(bits):
                return ""
            bits = bits[skip_bits:]
        max_septets = len(bits) // 7
        if septet_count is None or septet_count > max_septets:
            septet_count = max_septets
        out, escaped = [], False
        for idx in range(septet_count):
            code = 0
            for off in range(7):
                code |= bits[idx * 7 + off] << off
            if escaped:
                out.append(GSM7_EXTENSION.get(code, ""))
                escaped = False
            elif code == 0x1B:
                escaped = True
            else:
                out.append(gsm7_map(code))
        return "".join(out)

    rng = random.Random(12)
    cases = [b"", b"\x00", pack_gsm7("HELLO WORLD 123"),
             bytes([0x1B, 0x1B, 0x1B, 0x1B]),        # escape chains
             bytes([0xDB, 0x6D, 0xB7, 0xDB])]        # dense 0x1B codes
    for _ in range(200):
        n = rng.randrange(0, 30)
        cases.append(bytes(rng.randrange(256) for _ in range(n)))
    for data in cases:
        for sc in (None, 0, 1, 5, 7, 160, -3):
            for sk in (0, 1, 8, 16):
                assert (unpack_gsm7(data, septet_count=sc, skip_bits=sk)
                        == ref_unpack(data, septet_count=sc,
                                      skip_bits=sk)), (data, sc, sk)
        assert unpack_gsm7_udh(data) == unpack_gsm7_udh(data)
