"""Unit tests: detector, scanners, validator, MCC DB, location parser."""

import numpy as np
import pytest

from tetraear_tpu.frame import mcc_mnc
from tetraear_tpu.frame.location import LocationParser
from tetraear_tpu.frame.validator import TetraSignalValidator
from tetraear_tpu.ref import golden, modulator
from tetraear_tpu.scan.detector import TetraSignalDetector
from tetraear_tpu.scan.scanner import FrequencyScanner, WidebandScanner


# -- detector -------------------------------------------------------------

@pytest.fixture(scope="module")
def tetra_iq():
    payloads = [golden.sds_text_payload("HELLO HELLO")] * 4
    return golden.golden_iq(payloads, fs=2.4e6, snr_db=25, seed=31)


def test_detector_on_tetra(tetra_iq):
    det = TetraSignalDetector(sample_rate=2.4e6)
    result = det.analyze_signal(tetra_iq)
    assert result["is_tetra"]
    assert result["frames_validated"]
    assert result["confidence"] >= 0.5
    assert result["signal_present"]


def test_detector_on_noise(rng):
    noise = 0.01 * (rng.standard_normal(100_000)
                    + 1j * rng.standard_normal(100_000)).astype(np.complex64)
    det = TetraSignalDetector(sample_rate=2.4e6)
    result = det.analyze_signal(noise)
    assert not result["frames_validated"]
    assert not result["is_tetra"]


def test_detector_power():
    det = TetraSignalDetector()
    x = np.full(1000, 1.0 + 0j)
    assert abs(det.calculate_power(x)) < 0.1          # 0 dB
    assert det.calculate_power(np.zeros(0)) == det.bottom_threshold


def test_modulation_confidence_on_clean(tetra_iq):
    det = TetraSignalDetector(sample_rate=2.4e6)
    is_mod, conf = det.detect_tetra_modulation(tetra_iq[:50_000])
    assert conf > 0.2          # decimated clean TETRA clusters well


# -- step scanner (mocked capture, reference test style) -------------------

class FakeCapture:
    """Synthetic capture device: TETRA on one channel, noise elsewhere."""

    def __init__(self, tetra_freq, iq, fs=2.4e6):
        self.tetra_freq = tetra_freq
        self.iq = iq
        self.fs = fs
        self.freq = 0.0
        self.rng = np.random.default_rng(5)

    def set_frequency(self, f):
        self.freq = f

    def read_samples(self, n):
        if abs(self.freq - self.tetra_freq) < 12_500:
            return self.iq[:n]
        return 0.001 * (self.rng.standard_normal(n)
                        + 1j * self.rng.standard_normal(n)).astype(
                            np.complex64)


def test_frequency_scanner_finds_channel(tetra_iq):
    cap = FakeCapture(392.5e6, tetra_iq)
    sc = FrequencyScanner(cap, sample_rate=2.4e6)
    found = sc.scan_range(392.45e6, 392.55e6, min_power=-70,
                          min_confidence=0.4)
    freqs = [f["frequency"] for f in found]
    assert 392.5e6 in freqs


def test_scan_frequency_result_keys(tetra_iq):
    cap = FakeCapture(392.5e6, tetra_iq)
    sc = FrequencyScanner(cap)
    r = sc.scan_frequency(392.5e6, dwell_time=0.1)
    for k in ("frequency", "frequency_mhz", "power_db", "is_tetra",
              "confidence", "signal_present"):
        assert k in r


# -- wideband scanner ------------------------------------------------------

@pytest.mark.integration
def test_wideband_scanner_locates_carriers():
    rng = np.random.default_rng(2)
    hot = [-37_500.0, 62_500.0]      # on the scanner's 25 kHz channel grid
    payloads = [golden.sds_text_payload("HELLO HELLO")] * 4
    parts = []
    for off in hot:
        bits_stream = golden.build_stream(payloads, seed=17)
        pad = rng.integers(0, 2, 64).astype(np.uint8)
        allb = np.concatenate([pad, bits_stream])
        parts.append(modulator.generate_carrier(allb, fs=2.4e6,
                                                freq_offset_hz=off))
    n = min(len(p) for p in parts)
    iq = np.sum([p[:n] for p in parts], axis=0).astype(np.complex64)
    iq = modulator.add_awgn(iq, 25, np.random.default_rng(3))

    ws = WidebandScanner(fs=2.4e6)
    results = ws.scan(iq, center_freq_hz=392.5e6)
    hits = [r for r in results if r["is_tetra"]]
    hit_offsets = {r["offset_hz"] for r in hits}
    for off in hot:
        assert off in hit_offsets, f"missed channel at {off}"
    # no more than a couple of false channels
    assert len(hits) <= len(hot) + 2


# -- validator -------------------------------------------------------------

def test_validator_good_frame():
    v = TetraSignalValidator(expected_country_mcc=260)
    frame = {"crc_ok": True, "type_name": "MAC-RESOURCE",
             "call_metadata": {"mcc": 260, "mnc": 99}}
    ok, conf, issues = v.validate_frame(frame)
    assert ok and conf >= 0.9 and issues == []


def test_validator_bad_mcc():
    v = TetraSignalValidator()
    ok, conf, issues = v.validate_frame(
        {"type_name": "X", "call_metadata": {"mcc": 42, "mnc": 1}})
    assert not ok and conf == 0.0


def test_validator_crc_fail_penalty():
    v = TetraSignalValidator()
    v.detected_networks.add((260, 99))
    ok, conf, issues = v.validate_frame(
        {"crc_ok": False, "type_name": "MAC-FRAG"})
    assert "CRC failed" in issues
    assert conf < 0.5


def test_validator_statistics():
    v = TetraSignalValidator()
    v.validate_frame({"crc_ok": True, "type_name": "T",
                      "call_metadata": {"mcc": 262, "mnc": 1}})
    stats = v.get_statistics()
    assert stats["total_frames"] == 1
    assert (262, 1) in stats["detected_networks"]


# -- MCC DB ---------------------------------------------------------------

def test_mcc_lookup():
    assert mcc_mnc.get_country_from_mcc(260) == "Poland"
    assert mcc_mnc.get_country_from_mcc(262) == "Germany"
    assert mcc_mnc.get_country_from_mcc(1) is None
    info = mcc_mnc.get_location_info(260, 99)
    assert "Poland" in info and "260" in info and "99" in info
    assert mcc_mnc.get_location_info(None) == "Unknown"
    assert "123" in mcc_mnc.get_location_info(123)


# -- location parser -------------------------------------------------------

def test_parse_coordinates_decimal():
    assert LocationParser.parse_coordinates(
        "Lat: 52.22970 Lon: 21.01220") == (52.2297, 21.0122)


def test_parse_coordinates_dms():
    lat, lon = LocationParser.parse_coordinates(
        "52°14'30\"N 21°00'30\"E")
    assert abs(lat - 52.2417) < 1e-3
    assert abs(lon - 21.0083) < 1e-3


def test_parse_coordinates_compact():
    assert LocationParser.parse_coordinates(
        "N52.2417 E021.0083") == (52.2417, 21.0083)


def test_parse_coordinates_invalid():
    assert LocationParser.parse_coordinates("no coords here") is None
    assert LocationParser.parse_coordinates("Lat: 99 Lon: 999") is None


def test_extract_location_from_sds_frame():
    frame = {"sds_message": "[LIP] Lat: 52.22970, Lon: 21.01220 (Short)"}
    out = LocationParser.extract_location_from_frame(frame)
    assert out is not None
    assert abs(out["latitude"] - 52.2297) < 1e-4
    assert out["source"] == "SDS Message"


def test_extract_location_from_mac_pdu():
    data = bytes([0x00]) + (
        int(52.0 / 180 * (1 << 23)).to_bytes(3, "big")
        + int(21.0 / 180 * (1 << 23)).to_bytes(3, "big") + bytes(4))
    out = LocationParser.extract_location_from_frame(
        {"mac_pdu": {"data": data}})
    assert out is not None
    assert abs(out["latitude"] - 52.0) < 0.01
    assert out["source"] == "MAC PDU"


def test_map_urls():
    assert "google" in LocationParser.get_google_maps_url(52.0, 21.0)
    assert "openstreetmap" in LocationParser.get_openstreetmap_url(52.0, 21.0)
