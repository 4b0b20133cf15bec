"""Native per-hit parse engine (frame/csrc/hitparse.cpp) vs the Python
oracles it accelerates: burst typing / stolen detection / soft CRC
(frame.burst, frame.crc) and MAC field extraction (frame.mac
.extract_mac_fields).  Also pins the decode_frame(pre=...) fast path to
the plain decode_frame on full frame dicts."""

import numpy as np
import pytest

from tetraear_tpu.frame import burst as burst_mod
from tetraear_tpu.frame import crc as crc_mod
from tetraear_tpu.frame import hitparse
from tetraear_tpu.frame.decoder import (TetraDecoder, FRAME_LENGTH,
                                        TS_OFFSET_BITS, SYNC_LEN)
from tetraear_tpu.frame.mac import extract_mac_fields

pytestmark = pytest.mark.skipif(
    not hitparse.available(),
    reason="hitparse library not built (make -C tetraear_tpu/frame/csrc)")


def _golden_windows(n=40, seed=5):
    """A mix of structured (CRC-passing slot layouts, sync-word
    plants, SYSINFO broadcasts) and pure-noise windows."""
    from tetraear_tpu.ref import golden
    rng = np.random.default_rng(seed)
    wins = rng.integers(0, 2, (n, FRAME_LENGTH)).astype(np.uint8)
    for i in range(n):
        kind = i % 5
        if kind == 0:
            # valid normal burst: MAC-RESOURCE with a real CRC
            payload = golden.sds_text_payload(f"WIN {i:02d} TEST")
            slot = golden.build_slot(
                golden.build_mac_resource_data_bits(payload))
            wins[i, :len(slot)] = slot[:FRAME_LENGTH]
        elif kind == 1:
            # sync burst: plant a sync word at the midpoint
            wins[i, 255:277] = burst_mod.SYNC_CONTINUOUS_DOWNLINK
        elif kind == 2:
            # stolen slot: NTS2 at the training position
            wins[i, TS_OFFSET_BITS:TS_OFFSET_BITS + SYNC_LEN] = (
                burst_mod.SYNC_DISCONTINUOUS_DOWNLINK)
        elif kind == 3:
            # SYSINFO broadcast header in the data-bit view
            head = np.zeros(40, np.uint8)
            head[0:2] = [1, 0]            # pdu type 2
            head[2:4] = [0, 0]            # broadcast type 0
            mcc_bits = [(260 >> (9 - j)) & 1 for j in range(10)]
            head[4:14] = mcc_bits
            wins[i, :40] = head
    return wins


def _oracle_row(win):
    """Run the Python oracles on one window."""
    btype = burst_mod.detect_burst_type(win)
    is_sync = btype == burst_mod.BurstType.Synchronization
    data = burst_mod.extract_data_bits(win, btype)
    crc_ok = crc_mod.soft_crc_check(data)
    m1, m2 = burst_mod.sync_agreement(
        win[TS_OFFSET_BITS:TS_OFFSET_BITS + SYNC_LEN])
    fields = extract_mac_fields(data)
    return is_sync, crc_ok, m2 > m1, fields


@pytest.mark.unit
def test_engine_matches_oracles_golden():
    wins = _golden_windows()
    hb = hitparse.parse_windows(wins)
    n_crc = 0
    for i, win in enumerate(wins):
        is_sync, crc_ok, stolen, fields = _oracle_row(win)
        assert bool(hb.is_sync[i]) == is_sync, i
        assert bool(hb.crc_ok[i]) == crc_ok, i
        assert bool(hb.stolen[i]) == stolen, i
        got = hb.mac_fields(i)
        if fields is None:
            assert got is None, i
        else:
            assert got == fields, i
        n_crc += crc_ok
    assert n_crc >= 8, "golden windows must include CRC passes"


@pytest.mark.unit
def test_engine_matches_oracles_random():
    rng = np.random.default_rng(77)
    wins = rng.integers(0, 2, (300, FRAME_LENGTH)).astype(np.uint8)
    # degenerate rows exercise the all-0/all-1 CRC rejection
    wins[0] = 0
    wins[1] = 1
    hb = hitparse.parse_windows(wins)
    for i, win in enumerate(wins):
        is_sync, crc_ok, stolen, fields = _oracle_row(win)
        assert bool(hb.is_sync[i]) == is_sync, i
        assert bool(hb.crc_ok[i]) == crc_ok, i
        assert bool(hb.stolen[i]) == stolen, i
        assert hb.mac_fields(i) == fields, i


@pytest.mark.unit
def test_decode_frame_pre_path_identical():
    """decode_frame(pre=engine row) == decode_frame(bits) field for
    field (minus the raw bits array), including stateful fragmentation
    across a RESOURCE -> FRAG -> END chain."""
    wins = _golden_windows(n=30, seed=9)
    hb = hitparse.parse_windows(wins)
    dec_a = TetraDecoder(auto_decrypt=False)
    dec_b = TetraDecoder(auto_decrypt=False)
    for i, win in enumerate(wins):
        fa = dec_a.decode_frame(win, 0, frame_number=i)
        fb = dec_b.decode_frame(win, 0, frame_number=i, pre=hb.pre(i))
        if fa is None or fb is None:
            assert fa is None and fb is None, i
            continue
        ka = {k: v for k, v in fa.items() if k != "bits"}
        kb = {k: v for k, v in fb.items() if k != "bits"}
        assert ka == kb, f"window {i}: {ka} != {kb}"
    assert dec_a.protocol_parser.stats == dec_b.protocol_parser.stats


@pytest.mark.unit
def test_crc_hint_semantics():
    """A TRUE device hint is trusted for normal bursts only (the sync
    layout is not modelled by the device kernel)."""
    rng = np.random.default_rng(3)
    wins = rng.integers(0, 2, (4, FRAME_LENGTH)).astype(np.uint8)
    wins[1, 255:277] = burst_mod.SYNC_CONTINUOUS_DOWNLINK  # sync burst
    hb = hitparse.parse_windows(wins)
    assert hb.pre(0, crc_hint=True).crc_ok is True
    assert not hb.is_sync[0]
    assert hb.is_sync[1]
    assert hb.pre(1, crc_hint=True).crc_ok == bool(hb.crc_ok[1])
    assert hb.pre(0, crc_hint=False).crc_ok == bool(hb.crc_ok[0])


@pytest.mark.unit
def test_fallback_path_without_engine(monkeypatch):
    """With the native library unavailable, the batched layer falls
    back to the per-hit Python oracles and produces identical frames."""
    import numpy as np
    from tetraear_tpu.frame.batch import BatchedFrameDecoder
    from tetraear_tpu.ref import golden

    slot = golden.build_slot(golden.build_mac_resource_data_bits(
        golden.sds_text_payload("FALLBACK EQ")))[:510]
    sym_slot = (slot[0::2] * 2 + slot[1::2]).astype(np.uint8)
    W = 900
    col = 150
    start_bit = 2 * col - 216
    syms = np.zeros((2, W), np.uint8)
    syms[0, start_bit // 2:start_bit // 2 + 255] = sym_slot
    syms[1, start_bit // 2:start_bit // 2 + 255] = sym_slot
    corr = np.zeros((2, 400), np.float32)
    corr[:, col] = 0.95
    crc_err = np.zeros((2, 400), np.int32)
    n_valid = np.full(2, W, np.int64)
    vstart = np.zeros(2, np.int64)

    def run(disable):
        if disable:
            monkeypatch.setattr(hitparse, "_LIB", None)
        layer = BatchedFrameDecoder(2, auto_decrypt=False)
        layer._sym_base[:] = 0
        frames = layer.select_and_decode(
            syms, np.zeros((2, W, 2), np.float32), n_valid, vstart,
            corr, crc_err)
        return frames

    with_engine = run(False)
    without = run(True)
    assert len(with_engine) == len(without) == 2
    for a, b in zip(with_engine, without):
        ka = {k: v for k, v in a.items()
              if not isinstance(v, np.ndarray)}
        kb = {k: v for k, v in b.items()
              if not isinstance(v, np.ndarray)}
        assert ka == kb
        assert "FALLBACK EQ" in (a.get("sds_message") or "")
