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
    """A worker killed mid-run is respawned (with its dedup watermarks
    restored from the parent mirror) and its block replayed — frames
    still delivered (SURVEY §5.3 failure recovery)."""
    import os
    import signal as _sig

    from tetraear_tpu.ref import golden

    # plant a CRC-passing slot in two carriers' symbol rows with a scan
    # hit at the matching correlation column
    slot = golden.build_slot(golden.build_mac_resource_data_bits(
        golden.sds_text_payload("RECOVERY TEST")))[:510]
    sym_slot = (slot[0::2] * 2 + slot[1::2]).astype(np.uint8)
    W = 900
    syms = np.zeros((4, W), np.uint8)
    col = 150                       # pos = 300, start = 84, symbol 42
    start_bit = 2 * col - 216
    for ci in (0, 3):
        syms[ci, start_bit // 2:start_bit // 2 + 255] = sym_slot
    corr = np.zeros((4, 400), np.float32)
    corr[0, col] = 0.95
    corr[3, col] = 0.95
    crc_err = np.zeros((4, 400), np.int32)
    n_valid = np.full(4, W, np.int64)
    vstart = np.zeros(4, np.int64)

    layer = ShardedFrameLayer(4, n_workers=2, auto_decrypt=False)
    try:
        layer._inner._sym_base[:] = 0
        # kill worker 0's process outright (simulates an OOM kill)
        os.kill(layer._procs[0].pid, _sig.SIGKILL)
        layer._procs[0].join(timeout=10)
        frames = layer.select_and_decode(
            syms, np.zeros((4, W, 2), np.float32), n_valid, vstart,
            corr, crc_err)
        got = {f["carrier"] for f in frames}
        assert got == {0, 3}, frames
        assert all("RECOVERY TEST" in (f.get("sds_message") or "")
                   for f in frames), frames
        np.testing.assert_array_equal(frames[0]["bits"], slot)
    finally:
        layer.close()


@pytest.mark.unit
def test_sharded_layer_set_keys_reaches_workers_and_respawns():
    """Runtime key load (reference decoder.py:101 set_keys via the GUI
    Load-Keys button): live workers receive the keys, respawned workers
    inherit them, and the parent-side templates follow."""
    key = "0123456789abcdef0123"
    want = ("TEA1", bytes.fromhex(key))
    layer = ShardedFrameLayer(2, n_workers=2, auto_decrypt=True)
    try:
        layer.set_keys([key])
        # parent-side decrypt template + in-process fallback decoders
        # (lazy maps: keys apply to built AND future decoders)
        assert want in layer._decrypt_template[0].user_keys
        assert want in layer._inner.decoders[0].user_keys
        # a live worker answers a key probe: kill one and let the
        # respawn path rebuild from _spawn_args (keys inherited)
        layer._procs[0].kill()
        layer._procs[0].join()
        layer._send_with_respawn(0, ("set_emitted", {}))
        kf, auto, keys = layer._spawn_args
        assert keys == (key,)
    finally:
        layer.close()
