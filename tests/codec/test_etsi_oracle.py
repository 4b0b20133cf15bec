"""ETSI EN 300 395-2 channel-codec exactness vs the reference binaries.

The reference app ships the ETSI reference channel codec as Windows
executables; tests/codec/oracle/oracle_runner.c maps them natively
(ms_abi) so the actual reference Channel_Encoding / Channel_Decoding
serve as the oracle.  Contract:

  * our encoder output is BIT-EXACT vs the reference encoder for any
    input frame pair (speech) and single frame (frame stealing);
  * our decoder reaches the same BFI verdict and (away from the heavy-
    noise regime, where the reference's saturating Word16 path metrics
    legitimately diverge from exact int32 metrics) the same bits.

Skipped when the reference exes or a C toolchain are unavailable.
"""

import ctypes
import pathlib
import subprocess

import numpy as np
import pytest

REF_BIN = pathlib.Path("/root/reference/tetraear/tetra_codec/bin")
ORACLE_DIR = pathlib.Path(__file__).parent / "oracle"
RUNNER = ORACLE_DIR / "build" / "oracle_runner"
LIB = (pathlib.Path(__file__).parents[2] / "tetraear_tpu" / "voice" /
       "csrc" / "build" / "libtetracodec.so")


def _ensure_tools():
    if not (REF_BIN / "ccoder.exe").exists():
        pytest.skip("reference codec binaries not present")
    if not RUNNER.exists():
        r = subprocess.run(["make", "-C", str(ORACLE_DIR)],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"oracle build failed: {r.stderr.decode()[:200]}")
    if not LIB.exists():
        r = subprocess.run(["make", "-C", str(LIB.parents[1])],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("codec library build failed")


def _lib():
    return ctypes.CDLL(str(LIB))


def _oracle(exe: str, mode: str, payload: bytes) -> np.ndarray:
    p = subprocess.run([str(RUNNER), str(REF_BIN / exe), mode],
                       input=payload, capture_output=True, timeout=30)
    assert p.returncode == 0, p.stderr.decode()
    return np.frombuffer(p.stdout, np.int16)


@pytest.mark.codec
def test_encoder_bit_exact_vs_reference():
    _ensure_tools()
    lib = _lib()
    rng = np.random.default_rng(1)
    for _ in range(8):
        fa = rng.integers(0, 2, 137).astype(np.int16)
        fb = rng.integers(0, 2, 137).astype(np.int16)
        ref = _oracle("ccoder.exe", "encode",
                      np.concatenate([fa, fb]).tobytes())
        mine = np.zeros(432, np.int16)
        assert lib.tetra_channel_encode_slot(
            fa.ctypes, fb.ctypes, mine.ctypes) == 0
        assert np.array_equal(ref, mine)


@pytest.mark.codec
def test_encoder_bit_exact_edge_frames():
    _ensure_tools()
    lib = _lib()
    for fa, fb in [(np.zeros(137), np.zeros(137)),
                   (np.ones(137), np.ones(137)),
                   (np.zeros(137), np.ones(137))]:
        fa = fa.astype(np.int16)
        fb = fb.astype(np.int16)
        ref = _oracle("ccoder.exe", "encode",
                      np.concatenate([fa, fb]).tobytes())
        mine = np.zeros(432, np.int16)
        lib.tetra_channel_encode_slot(fa.ctypes, fb.ctypes, mine.ctypes)
        assert np.array_equal(ref, mine)


@pytest.mark.codec
def test_stolen_encoder_bit_exact_vs_reference():
    _ensure_tools()
    lib = _lib()
    rng = np.random.default_rng(2)
    for _ in range(4):
        f = rng.integers(0, 2, 137).astype(np.int16)
        ref = _oracle("ccoder.exe", "encode_fs", f.tobytes())
        mine = np.zeros(216, np.int16)
        assert lib.tetra_channel_encode_stolen(f.ctypes, mine.ctypes) == 0
        assert np.array_equal(ref, mine)


@pytest.mark.codec
def test_decoder_matches_reference_moderate_noise():
    _ensure_tools()
    lib = _lib()
    rng = np.random.default_rng(3)
    for sigma in (0, 25, 50, 75):
        fa = rng.integers(0, 2, 137).astype(np.int16)
        fb = rng.integers(0, 2, 137).astype(np.int16)
        soft = np.zeros(432, np.int16)
        lib.tetra_channel_encode_slot(fa.ctypes, fb.ctypes, soft.ctypes)
        noisy = np.clip(soft + rng.normal(0, sigma, 432),
                        -127, 127).astype(np.int16)
        ref = _oracle("cdecoder.exe", "decode", noisy.tobytes())
        ref_bfi, ref_bits = int(ref[0]), ref[1:]
        oa = np.zeros(137, np.int16)
        ob = np.zeros(137, np.int16)
        rc = lib.tetra_channel_decode_slot(noisy.ctypes, oa.ctypes,
                                           ob.ctypes)
        assert (1 if rc else 0) == ref_bfi
        assert np.array_equal(np.concatenate([oa, ob]), ref_bits)


@pytest.mark.codec
def test_decoder_bfi_agreement_heavy_noise():
    """In the heavy-noise regime bits may differ (saturating vs exact
    metrics) but the CRC/BFI verdict must still agree statistically."""
    _ensure_tools()
    lib = _lib()
    rng = np.random.default_rng(4)
    agree = 0
    n = 8
    for _ in range(n):
        fa = rng.integers(0, 2, 137).astype(np.int16)
        fb = rng.integers(0, 2, 137).astype(np.int16)
        soft = np.zeros(432, np.int16)
        lib.tetra_channel_encode_slot(fa.ctypes, fb.ctypes, soft.ctypes)
        noisy = np.clip(soft + rng.normal(0, 110, 432),
                        -127, 127).astype(np.int16)
        ref_bfi = int(_oracle("cdecoder.exe", "decode", noisy.tobytes())[0])
        oa = np.zeros(137, np.int16)
        ob = np.zeros(137, np.int16)
        rc = lib.tetra_channel_decode_slot(noisy.ctypes, oa.ctypes,
                                           ob.ctypes)
        agree += int((1 if rc else 0) == ref_bfi)
    assert agree >= n - 1
