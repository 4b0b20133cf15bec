"""Device keys x frames decryption == host per-key loop, field for field.

crypto.batch.batch_decrypt_frames moves only the TEA rounds to device;
the key plan, plaintext scoring, early-exit and result application are
the host _decrypt_frame code, so the two paths must produce IDENTICAL
frame dicts (key chosen, score, decrypted bytes, SDS text).
"""

import copy

import numpy as np
import pytest

from tetraear_tpu.crypto.tea import TEADecryptor
from tetraear_tpu.frame.decoder import TetraDecoder


def _enc_frame(text: bytes, key_hex: str, alg: str, n: int) -> dict:
    key = bytes.fromhex(key_hex)
    padded = text + b"\x00" * ((-len(text)) % 8)
    cipher = TEADecryptor(key, alg).encrypt(padded)
    return {
        "number": n,
        "carrier": n % 2,
        "bits": np.zeros(510, dtype=np.uint8),
        "encrypted": True,
        "encryption_algorithm": alg,
        "key_id": "0",
        "mac_pdu": {"data": cipher},
    }


@pytest.mark.unit
def test_batch_decrypt_matches_host_loop():
    from tetraear_tpu.crypto.batch import batch_decrypt_frames
    frames = [
        _enc_frame(b"\x82EMERGENCY AT DOCK 5 EMERGENCY",
                   "0123456789ABCDEF0123", "TEA1", 0),
        _enc_frame(b"\x82MOVE TO SECTOR 9 NOW PLEASE",
                   "0123456789ABCDEF0123456789ABCDEF", "TEA2", 1),
        _enc_frame(b"\x82ALL UNITS REPORT STATUS CODE",
                   "11111111111111111111", "TEA1", 2),
        # garbage payload no key decodes: exercises the no-winner path
        {"number": 3, "carrier": 1, "bits": np.zeros(510, np.uint8),
         "encrypted": True, "encryption_algorithm": "TEA1", "key_id": "0",
         "mac_pdu": {"data": bytes(np.random.default_rng(0).integers(
             0, 256, 24, dtype=np.uint8))}},
    ]

    # host path
    host_dec = [TetraDecoder(auto_decrypt=True) for _ in range(2)]
    host_frames = [copy.deepcopy(f) for f in frames]
    for f in host_frames:
        d = host_dec[f["carrier"]]
        d._decrypt_frame(f)
        d._post_decrypt_sds(f)

    # batched device path
    batch_dec = [TetraDecoder(auto_decrypt=True) for _ in range(2)]
    for d in batch_dec:
        d.defer_decrypt = True
    dev_frames = [copy.deepcopy(f) for f in frames]
    for f in dev_frames:
        f["decryption_pending"] = True
    batch_decrypt_frames(batch_dec, dev_frames)

    for hf, df in zip(host_frames, dev_frames):
        for k in ("decrypted", "key_used", "decrypt_confidence",
                  "decrypted_bytes", "best_score", "best_key",
                  "keys_tried", "sds_message", "decryption_error",
                  "bypass_clear", "encrypted"):
            assert hf.get(k) == df.get(k), (hf["number"], k,
                                            hf.get(k), df.get(k))
    assert host_frames[0]["decrypted"]
    assert "EMERGENCY AT DOCK 5" in bytes.fromhex(
        dev_frames[0]["decrypted_bytes"]).decode("latin-1")
    assert dev_frames[1]["decrypted"]
    assert dev_frames[2]["decrypted"]


@pytest.mark.unit
def test_tea_decrypt_batch_bit_exact():
    """Raw device ECB decrypt == crypto.tea for every (key, payload)."""
    from tetraear_tpu.crypto.batch import tea_decrypt_batch
    rng = np.random.default_rng(5)
    payloads = rng.integers(0, 256, (3, 32), dtype=np.uint8)
    for alg, klen in (("TEA1", 10), ("TEA2", 16), ("TEA3", 16)):
        keys = [bytes(rng.integers(0, 256, klen, dtype=np.uint8))
                for _ in range(4)]
        out = tea_decrypt_batch(payloads, keys, alg)
        assert out.shape == (4, 3, 32)
        for ki, key in enumerate(keys):
            for bi in range(3):
                want = TEADecryptor(key, alg).decrypt(
                    payloads[bi].tobytes())
                assert out[ki, bi].tobytes() == want


@pytest.mark.unit
def test_pipeline_uses_device_decrypt(monkeypatch):
    """The streaming pipeline's frame layer must route multi-frame
    decryption through the device search."""
    from tetraear_tpu.crypto import batch as cbatch
    from tetraear_tpu.frame.batch import BatchedFrameDecoder

    calls = []
    orig = cbatch.tea_decrypt_batch

    def counting(payloads, keys, algorithm="TEA1"):
        calls.append((np.atleast_2d(payloads).shape[0], len(keys),
                      algorithm))
        return orig(payloads, keys, algorithm)

    monkeypatch.setattr(cbatch, "tea_decrypt_batch", counting)

    bfd = BatchedFrameDecoder(2, auto_decrypt=True)
    frames = [_enc_frame(b"\x82EMERGENCY AT DOCK 5 EMERGENCY",
                         "0123456789ABCDEF0123", "TEA1", i)
              for i in range(3)]
    for f in frames:
        f["decryption_pending"] = True
    cbatch.batch_decrypt_frames(bfd.decoders, frames)
    assert calls, "device decrypt did not run"
    assert calls[0][0] == 3          # all three payloads in one search
    assert all(f["decrypted"] for f in frames)
