"""Integration: golden IQ -> oracle demod -> frame decode -> SDS text.

This is BASELINE.json config 1: a single 25 kHz carrier from synthetic
2.4 Msps IQ down to CRC-checked MAC bits on the CPU backend.
"""

import numpy as np
import pytest

from tetraear_tpu.frame.decoder import TetraDecoder
from tetraear_tpu.ref import demod, golden


def _decode(iq, fs=2.4e6, freq_offset=0.0, block_size=None):
    out = demod.OracleDemod(fs=fs, freq_offset_hz=freq_offset).run(
        iq, block_size=block_size)
    return TetraDecoder(auto_decrypt=False).decode(out["symbols"])


def test_config1_clean(golden_capture):
    frames = _decode(golden_capture["iq"])
    assert len(frames) == len(golden_capture["payloads"])
    for f in frames:
        assert f["burst_crc"]
        assert f["sds_message"] == golden_capture["text"]
        assert f["mac_pdu"]["address"] == golden_capture["address"]


@pytest.mark.parametrize("snr_db", [25, 15])
def test_config1_snr_sweep(snr_db):
    payloads = [golden.sds_text_payload("HELLO HELLO")] * 4
    iq = golden.golden_iq(payloads, fs=2.4e6, snr_db=snr_db, seed=21)
    frames = _decode(iq)
    assert len(frames) >= 3            # allow one slot lost to noise at 15dB
    crc_rate = np.mean([f["burst_crc"] for f in frames])
    assert crc_rate >= 0.5


def test_config1_freq_offset():
    payloads = [golden.sds_text_payload("HELLO HELLO")] * 4
    iq = golden.golden_iq(payloads, fs=2.4e6, freq_offset_hz=7500.0,
                          snr_db=20, seed=22)
    frames = _decode(iq, freq_offset=7500.0)
    assert len(frames) >= 3


def test_config1_blocked_streaming(golden_capture):
    """Block-streamed decode finds the same frames as one-shot decode."""
    frames_full = _decode(golden_capture["iq"])
    frames_blocked = _decode(golden_capture["iq"], block_size=32_000)
    assert len(frames_blocked) == len(frames_full)
    for a, b in zip(frames_full, frames_blocked):
        assert a["sds_message"] == b["sds_message"]
        assert a["burst_crc"] == b["burst_crc"]


def test_encrypted_frame_decrypt_roundtrip():
    """Generate a TEA1-encrypted payload with a known common key and check
    the auto-decrypt bruteforce recovers readable text."""
    from tetraear_tpu.crypto.tea import TEADecryptor
    key = bytes.fromhex("0123456789ABCDEF0123")   # in common_keys
    clear = b"\x82EMERGENCY AT DOCK 5 EMERGENCY"
    padded = clear + b"\x00" * ((-len(clear)) % 8)
    cipher = TEADecryptor(key, "TEA1").encrypt(padded)

    d = TetraDecoder(auto_decrypt=True)
    frame = {
        "number": 0,
        "bits": np.zeros(510, dtype=np.uint8),
        "encrypted": True,
        "encryption_algorithm": "TEA1",
        "key_id": "0",
        "mac_pdu": {"data": cipher},
    }
    out = d._decrypt_frame(frame)
    assert out["decrypted"]
    assert "EMERGENCY AT DOCK 5" in bytes.fromhex(
        out["decrypted_bytes"]).decode("latin-1")


@pytest.mark.integration
def test_sensitivity_floor():
    """Full decode down to -8 dB wideband SNR (~10 dB in the 25 kHz
    channel) — the matched-filter chain's sensitivity contract.  The
    reference chain (legacy parity harness) decodes nothing below ~15 dB
    wideband; the cliff here is near -12 dB (~6 dB in-band)."""
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.ref import golden

    payloads = [golden.sds_text_payload("HELLO HELLO")] * 4
    iq = golden.golden_iq(payloads, fs=2.4e6, snr_db=-8, seed=77)
    frames = []
    pipe = Pipeline(PipelineConfig(sample_rate=2.4e6, detect_gate=False,
                                   validate=False, auto_decrypt=False),
                    on_frame=frames.append)
    pipe.process_block(iq[:pipe.block_len])
    assert len(frames) == 3
    assert all(f.get("burst_crc") for f in frames)
    assert sum("HELLO" in (f.get("sds_message") or "")
               for f in frames) == 3
