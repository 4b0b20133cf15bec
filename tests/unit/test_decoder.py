"""Unit tests: TetraDecoder sync search, key handling, frame decode."""

import numpy as np
import pytest

from tetraear_tpu.frame import decoder as dec_mod
from tetraear_tpu.frame.decoder import TetraDecoder
from tetraear_tpu.ref import golden


def test_find_sync_exact():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 2000).astype(np.uint8)
    pat = dec_mod.SYNC_PATTERNS["TS1"]
    bits[300:322] = pat
    bits[900:922] = pat
    pos = dec_mod.find_sync(bits, threshold=0.95)
    assert 300 in pos and 900 in pos


def test_find_sync_skip_ahead_dedup():
    bits = np.zeros(1200, dtype=np.uint8)
    pat = dec_mod.SYNC_PATTERNS["TS1"]
    bits[100:122] = pat
    bits[200:222] = pat       # within 250 bits of the first -> deduped
    bits[500:522] = pat
    pos = dec_mod.find_sync(bits, threshold=0.95)
    assert 100 in pos and 500 in pos
    assert 200 not in pos


def test_find_sync_adaptive_threshold():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 1500).astype(np.uint8)
    pat = dec_mod.SYNC_PATTERNS["TS1"].copy()
    noisy = pat.copy()
    noisy[[2, 9, 17]] ^= 1                  # 19/22 = 0.864 correlation
    bits[400:422] = noisy
    pos, max_corr = dec_mod.find_sync(bits, threshold=0.95,
                                      return_max_corr=True)
    # 0.864 < 0.95 but within 0.15 -> adaptive picks it up
    assert max_corr > 0.85
    assert 400 in pos


def test_symbols_to_bits_dqpsk_and_8psk():
    d = TetraDecoder(auto_decrypt=False)
    bits, mapped = d.symbols_to_bits(np.array([0, 1, 2, 3]))
    assert list(bits) == [0, 0, 0, 1, 1, 0, 1, 1]
    assert list(mapped) == [0, 1, 2, 3]
    # 8-PSK fallback mapping (decoder.py:158-164)
    _, mapped8 = d.symbols_to_bits(np.array([0, 3, 5, 6, 7]))
    assert list(mapped8) == [0, 1, 3, 2, 2]


def test_set_keys():
    d = TetraDecoder()
    d.set_keys(["0123456789ABCDEF0123",
                "0123456789ABCDEF0123456789ABCDEF",
                "xx"])
    algs = [a for a, _ in d.user_keys]
    assert algs.count("TEA1") == 1
    assert algs.count("TEA2") == 1 and algs.count("TEA3") == 1


def test_common_keys_present():
    d = TetraDecoder()
    assert len(d.common_keys["TEA1"]) >= 10
    assert len(d.common_keys["TEA2"]) >= 10
    assert bytes(10) in d.common_keys["TEA1"]
    assert bytes(16) in d.common_keys["TEA2"]


def test_decode_golden_stream():
    stream = golden.build_stream(
        [golden.sds_text_payload("HELLO HELLO")] * 3, seed=11)
    symbols = (stream[0::2].astype(np.int64) << 1) | stream[1::2]
    d = TetraDecoder(auto_decrypt=False)
    frames = d.decode(symbols)
    assert len(frames) == 3
    for f in frames:
        assert f["type_name"] == "MAC-RESOURCE"
        assert f["burst_crc"]
        assert f["sds_message"] == "[TXT] HELLO HELLO"
        assert not f["encrypted"]


def test_decode_frame_too_short():
    d = TetraDecoder(auto_decrypt=False)
    assert d.decode_frame(np.zeros(100, dtype=np.uint8)) is None


def test_frame_dict_schema():
    """Frame dicts must carry the reference's keys (decoder.py:960-972)."""
    stream = golden.build_stream([golden.sds_text_payload("ABC ABC")],
                                 seed=12)
    symbols = (stream[0::2].astype(np.int64) << 1) | stream[1::2]
    frames = TetraDecoder(auto_decrypt=False).decode(symbols)
    f = frames[0]
    for key in ("type", "type_name", "number", "timeslot", "bits", "header",
                "position", "encrypted", "encryption_algorithm", "key_id",
                "additional_info", "burst_crc", "mac_pdu"):
        assert key in f, key


def test_format_frame_info():
    stream = golden.build_stream([golden.sds_text_payload("ABC ABC")],
                                 seed=13)
    symbols = (stream[0::2].astype(np.int64) << 1) | stream[1::2]
    d = TetraDecoder(auto_decrypt=False)
    frames = d.decode(symbols)
    info = d.format_frame_info(frames[0])
    assert "Frame #" in info
    assert "MAC-RESOURCE" in info
    assert "[CLR]" in info
    assert "ABC ABC" in info


@pytest.mark.unit
def test_vectorized_cascade_matches():
    """frame.batch.collect_candidates' closed-form per-row threshold ==
    sync_cascade row by row on adversarial correlation matrices
    (values on the k/22 grid around every tier boundary)."""
    import numpy as np
    from tetraear_tpu.frame.batch import BatchedFrameDecoder
    from tetraear_tpu.frame.decoder import sync_cascade

    rng = np.random.default_rng(42)
    m = 400
    rows = []
    grid = np.arange(23) / 22.0
    for _ in range(200):
        r = rng.choice(grid, m).astype(np.float32) * rng.uniform(0.6, 1.0)
        rows.append(r.astype(np.float32))
    # exact boundary rows
    for peak in (0.75, 0.7499, 0.7501, 0.80, 0.85, 0.90, 0.8999,
                 20 / 22, 19 / 22, 17 / 22, 16.5 / 22):
        r = (rng.choice(grid, m) * 0.5).astype(np.float32)
        r[m // 2] = peak
        rows.append(r.astype(np.float32))
    corr = np.stack(rows)

    layer = BatchedFrameDecoder(len(corr), auto_decrypt=False)
    # drive collect_candidates with gates wide open so only the cascade
    # selection matters
    syms = np.zeros((len(corr), (2 * m + 510) // 2 + 600), np.uint8)
    n_valid = np.full(len(corr), syms.shape[1], np.int64)
    vstart = np.full(len(corr), -10**9, np.int64)
    layer._sym_base[:] = 10**6          # all positions pass the gates
    layer._emitted_until[:] = 0
    cands = layer.collect_candidates(syms, n_valid, vstart, corr)
    got = {}
    for ci, start, _abs, _w in cands:
        got.setdefault(ci, []).append(start + 216)   # back to TS pos
    for ci in range(len(corr)):
        want = sync_cascade(corr[ci], stride=layer.scan_stride)
        assert got.get(ci, []) == want, (ci, got.get(ci), want)
