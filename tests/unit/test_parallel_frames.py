"""Carrier-sharded frame layer (frame.parallel.ShardedFrameLayer) ==
the in-process BatchedFrameDecoder, frame for frame, on a golden
multi-carrier capture streamed block by block."""

import numpy as np
import pytest

from tetraear_tpu.dsp.pipeline import CarrierBankDemod
from tetraear_tpu.frame.batch import BatchedFrameDecoder
from tetraear_tpu.frame.parallel import ShardedFrameLayer
from tetraear_tpu.ref import golden, modulator


@pytest.mark.unit
def test_sharded_layer_matches_inprocess():
    fs = 2.4e6
    offsets = [-250_000.0, 0.0, 250_000.0]
    payload_sets = [
        [golden.sds_text_payload(f"CARRIER {c} MSG {i}") for i in range(6)]
        for c in range(3)]
    streams = [golden.build_stream(p) for p in payload_sets]
    iq = modulator.generate_multi_carrier(
        streams, fs=fs, offsets_hz=offsets, snr_db=25,
        rng=np.random.default_rng(21))

    bank = CarrierBankDemod(fs=fs, freqs_hz=offsets, block_len=48_000)
    layer_a = BatchedFrameDecoder(3, auto_decrypt=False)
    layer_b = ShardedFrameLayer(3, n_workers=2, auto_decrypt=False)
    try:
        import jax.numpy as jnp
        from tetraear_tpu.dsp import kernels

        state = bank.init_state()
        n_blocks = len(iq) // bank.block_len
        assert n_blocks >= 2
        total = 0
        for b in range(n_blocks):
            x = iq[b * bank.block_len:(b + 1) * bank.block_len]
            out, state = bank._step_impl(
                jnp.asarray(kernels.c2r_np(x)), state)
            hard = np.asarray(out["hard"])
            soft = np.asarray(out["soft"])
            valid = np.asarray(out["valid"])
            fa = layer_a.process(hard, soft, valid)
            fb = layer_b.process(hard, soft, valid)
            assert len(fa) == len(fb), f"block {b}"
            for x_f, y_f in zip(fa, fb):
                ka = set(x_f) | set(y_f)
                for k in ka:
                    va, vb = x_f.get(k), y_f.get(k)
                    if isinstance(va, np.ndarray) or isinstance(
                            vb, np.ndarray):
                        assert np.array_equal(va, vb), (b, k)
                    else:
                        assert va == vb, (b, k, va, vb)
            total += len(fa)
        assert total >= 10, "capture must produce real frames"
        # watermarks stayed in lockstep (parent reproduces them exactly)
        np.testing.assert_array_equal(layer_a._emitted_until,
                                      layer_b._inner._emitted_until)
    finally:
        layer_b.close()


@pytest.mark.unit
def test_worker_death_recovery():
    """A worker killed mid-run is respawned and its block replayed —
    frames still delivered (SURVEY §5.3 failure recovery)."""
    import os
    import signal as _sig
    from tetraear_tpu.frame import hitparse

    if not hitparse.available():
        pytest.skip("hitparse library not built")

    from tetraear_tpu.ref import golden
    wins = np.stack([golden.build_slot(golden.build_mac_resource_data_bits(
        golden.sds_text_payload(f"RECOVERY {i}")))[:510]
        for i in range(8)]).astype(np.uint8)
    hb = hitparse.parse_windows(wins)

    layer = ShardedFrameLayer(4, n_workers=2, auto_decrypt=False)
    try:
        # kill worker 0's process outright (simulates an OOM kill)
        os.kill(layer._procs[0].pid, _sig.SIGKILL)
        layer._procs[0].join(timeout=10)

        # drive select_and_decode-equivalent traffic through both shards
        syms = np.zeros((4, 600 + 300), np.uint8)
        corr = np.zeros((4, 10), np.float32)     # no natural hits
        crc_err = np.zeros((4, 10), np.int32)
        n_valid = np.full(4, 900, np.int64)
        vstart = np.zeros(4, np.int64)
        # inject candidates directly via the wire path: carriers 0 (dead
        # worker's shard) and 3 (live shard)
        inner = layer._inner
        inner._sym_base[:] = 0
        cands = [(0, 0, 0, wins[0]), (3, 0, 0, wins[1])]
        import tetraear_tpu.frame.batch as batch_mod
        orig = inner.collect_candidates
        inner.collect_candidates = lambda *a, **k: cands
        try:
            frames = layer.select_and_decode(
                syms, np.zeros((4, 900, 2), np.float32), n_valid,
                vstart, corr, crc_err)
        finally:
            inner.collect_candidates = orig
        got = {f["carrier"] for f in frames}
        assert got == {0, 3}, frames
    finally:
        layer.close()
