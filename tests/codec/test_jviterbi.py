"""Batched JAX channel decoder == C++ decoder, bit for bit.

The JAX Viterbi must reproduce the C++ decoder exactly — same int32
metrics, same tie-breaks — including on pure-noise blocks where metric
ties are frequent, so the fleet voice path and the host path can never
disagree.
"""

import ctypes
import pathlib

import numpy as np
import pytest

LIB = (pathlib.Path(__file__).parents[2] / "tetraear_tpu" / "voice" /
       "csrc" / "build" / "libtetracodec.so")


def _lib():
    if not LIB.exists():
        import subprocess
        r = subprocess.run(["make", "-C", str(LIB.parents[1])],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("codec library build failed")
    return ctypes.CDLL(str(LIB))


def _cxx_decode(lib, soft: np.ndarray) -> tuple:
    fa = np.zeros(137, np.int16)
    fb = np.zeros(137, np.int16)
    rc = lib.tetra_channel_decode_slot(
        np.ascontiguousarray(soft, np.int16).ctypes, fa.ctypes, fb.ctypes)
    return np.stack([fa, fb]).astype(np.uint8), rc != 0


def _cxx_encode(lib, fa, fb) -> np.ndarray:
    out = np.zeros(432, np.int16)
    lib.tetra_channel_encode_slot(
        np.ascontiguousarray(fa, np.int16).ctypes,
        np.ascontiguousarray(fb, np.int16).ctypes, out.ctypes)
    return out


@pytest.mark.codec
def test_jax_decoder_bit_exact_vs_cxx():
    from tetraear_tpu.voice.jviterbi import channel_decode_batch
    lib = _lib()
    rng = np.random.default_rng(11)
    blocks = []
    for i in range(12):
        fa = rng.integers(0, 2, 137).astype(np.int16)
        fb = rng.integers(0, 2, 137).astype(np.int16)
        soft = _cxx_encode(lib, fa, fb).astype(np.int32)
        sigma = [0, 40, 80, 120][i % 4]
        noisy = np.clip(soft + rng.normal(0, sigma, 432),
                        -127, 127).astype(np.int32)
        blocks.append(noisy)
    # pure-noise blocks: garbage input, maximal tie pressure
    for _ in range(4):
        blocks.append(rng.integers(-127, 128, 432).astype(np.int32))
    batch = np.stack(blocks)

    out = channel_decode_batch(batch)
    for i, soft in enumerate(blocks):
        frames_cxx, bfi_cxx = _cxx_decode(lib, soft)
        assert np.array_equal(out["frames"][i], frames_cxx), f"block {i}"
        assert bool(out["bfi"][i]) == bool(bfi_cxx), f"block {i} BFI"


@pytest.mark.codec
def test_jax_decoder_roundtrip_and_bfi():
    from tetraear_tpu.voice.jviterbi import channel_decode_batch
    lib = _lib()
    rng = np.random.default_rng(12)
    fa = rng.integers(0, 2, 137).astype(np.int16)
    fb = rng.integers(0, 2, 137).astype(np.int16)
    clean = _cxx_encode(lib, fa, fb).astype(np.int32)
    garbage = rng.integers(-127, 128, 432).astype(np.int32)
    out = channel_decode_batch(np.stack([clean, garbage]))
    assert not out["bfi"][0]
    assert np.array_equal(out["frames"][0, 0], fa.astype(np.uint8))
    assert np.array_equal(out["frames"][0, 1], fb.astype(np.uint8))
    assert out["bfi"][1]          # random soft bits must flag BFI
