"""Unit tests: batched device TEA key search vs the scalar implementation."""

import numpy as np
import pytest

from tetraear_tpu.crypto import batch
from tetraear_tpu.crypto.tea import TEADecryptor


@pytest.mark.parametrize("alg,klen", [("TEA1", 10), ("TEA2", 16)])
def test_batch_decrypt_matches_scalar(alg, klen, rng):
    keys = [bytes(rng.integers(0, 256, klen, dtype=np.uint8))
            for _ in range(5)]
    payloads = rng.integers(0, 256, (3, 32), dtype=np.uint8)
    out = batch.tea_key_search(payloads, keys, algorithm=alg)
    assert out["scores"].shape == (5, 3)
    # cross-check one (key, payload) pair against the scalar path
    for ki in range(5):
        ref = TEADecryptor(keys[ki], alg).decrypt(payloads[1].tobytes())
        # re-run the batch plaintext for that key
        single = batch.tea_key_search(payloads[1:2], [keys[ki]],
                                      algorithm=alg)
        assert single["plaintexts"][0].tobytes() == ref


def test_batch_search_finds_right_key(rng):
    """The true key must win the score argmax on readable plaintext."""
    true_key = bytes.fromhex("00112233445566778899AABBCCDDEEFF")
    decoys = [bytes(rng.integers(0, 256, 16, dtype=np.uint8))
              for _ in range(20)]
    keys = decoys[:10] + [true_key] + decoys[10:]
    clear = b"\x82ALL UNITS REPORT STATUS NOW PLS"   # 32 bytes
    cipher = np.frombuffer(
        TEADecryptor(true_key, "TEA2").encrypt(clear), np.uint8)
    out = batch.tea_key_search(cipher[None, :], keys, algorithm="TEA2")
    assert out["best_key_index"][0] == 10
    assert out["plaintexts"][0].tobytes() == clear


def test_batch_many_payloads(rng):
    """One key, many frames: the realistic fleet shape."""
    key = bytes.fromhex("0123456789ABCDEF0123")
    msgs = [f"\x82UNIT {i:02d} AT CHECKPOINT {i * 7}".encode("latin-1")
            for i in range(16)]
    padded = [m + b"\x00" * ((-len(m)) % 8) for m in msgs]
    length = max(len(p) for p in padded)
    payload = np.zeros((16, length), np.uint8)
    for i, p in enumerate(padded):
        p = p + b"\x00" * (length - len(p))
        payload[i] = np.frombuffer(
            TEADecryptor(key, "TEA1").encrypt(p), np.uint8)
    decoys = [bytes(rng.integers(0, 256, 10, dtype=np.uint8))
              for _ in range(7)]
    out = batch.tea_key_search(payload, decoys + [key], algorithm="TEA1")
    assert np.all(out["best_key_index"] == 7)
    for i in range(16):
        assert f"UNIT {i:02d}".encode() in out["plaintexts"][i].tobytes()


def test_batch_rejects_bad_length(rng):
    with pytest.raises(ValueError):
        batch.tea_key_search(np.zeros((1, 7), np.uint8),
                             [bytes(10)], algorithm="TEA1")
