"""Mesh-sharded DeviceSpeechPool: PCM bit-parity vs the single device.

The voice fleet axis (round-4 verdict item 1): the ACELP chain is mined
out per chip (~94% of its device roofline), so scaling is "more chips".
DeviceSpeechPool(mesh=...) shards the slot axis over the mesh; because
the decode is pure Word16 integer arithmetic with no cross-row term,
the PCM must be BIT-IDENTICAL to the unsharded pool at every mesh size
— including across calls (sharded state carry) and LRU slot resets.

Compile-cost note: every pool pays one XLA compile of the full ACELP
decode graph (minutes on the hermetic CPU backend), so this file keeps
to ONE frame-count shape and three pools (unsharded + 2-device +
8-device), exercising state carry and eviction through repeat calls on
the same compiled programs; the dryrun covers sizes 1/2/4/8.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from tetraear_tpu.voice.jspeech_pool import DeviceSpeechPool


def _items(seed: int, carriers, n_frames: int = 4):
    """[(carrier, (n_frames, 138) int16 BFI+bits)] with one shared
    frame-count shape so every pool compiles exactly once."""
    rng = np.random.default_rng(seed)
    out = []
    for c in carriers:
        f = np.zeros((n_frames, 138), np.int16)
        f[:, 1:] = rng.integers(0, 2, (n_frames, 137))
        out.append((c, f))
    return out


def test_pool_mesh_pcm_bit_parity():
    calls = [
        _items(42, range(6)),            # fresh slots
        _items(43, range(6)),            # state carry on the same slots
        _items(44, range(8, 14)),        # LRU eviction (6+6 > 8 slots)
    ]
    ref = DeviceSpeechPool(slots=8)
    want = [ref.synthesize(items) for items in calls]
    for n_dev in (2, 8):
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("voice",))
        pool = DeviceSpeechPool(slots=8, mesh=mesh)
        for items, wants in zip(calls, want):
            got = pool.synthesize(items)
            for w, g in zip(wants, got):
                np.testing.assert_array_equal(w, g)


def test_pool_mesh_slots_divisibility():
    mesh = Mesh(np.array(jax.devices()[:4]), ("voice",))
    with pytest.raises(ValueError, match="divisible"):
        DeviceSpeechPool(slots=6, mesh=mesh)


def test_pipeline_wires_voice_mesh():
    """PipelineConfig.device_voice_mesh reaches the pool (PCM parity of
    the sharded pool itself is pinned above and in test_device_voice —
    this guards the production wiring)."""
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.voice import codec

    if not codec.VoiceProcessor().working:
        pytest.skip("codec library not built "
                    "(make -C tetraear_tpu/voice/csrc)")
    mesh = Mesh(np.array(jax.devices()[:4]), ("voice",))
    cfg = PipelineConfig(sample_rate=2.4e6, voice=True, device_voice=True,
                         device_voice_slots=8, device_voice_mesh=mesh,
                         detect_gate=False, validate=False)
    pipe = Pipeline(cfg)
    assert pipe._voice_device is not None
    assert pipe._voice_device._row_shard is not None
    assert pipe._voice_device.slots == 8
