"""voice/jfixed.py vs the C++ basicops: exhaustive-edge + random fuzz.

The C++ side (voice/csrc/etsi_dsp.h, built standalone — no reference
binaries needed) is the anchor; it is itself pinned per-function to the
ETSI reference binary in test_acelp_oracle.py.  Every vectorized JAX
operator must agree element-for-element on the full fuzz set.
"""

import ctypes
import pathlib
import subprocess

import numpy as np
import pytest

from tetraear_tpu.voice import jfixed as JF

CSRC = pathlib.Path(__file__).parents[2] / "tetraear_tpu" / "voice" / "csrc"
DSP_LIB = CSRC / "build" / "libetsidsp_test.so"

EDGE16 = np.array([-32768, -32767, -16384, -2, -1, 0, 1, 2, 0x4000,
                   32766, 32767], np.int32)
EDGE32 = np.array([-2**31, -2**31 + 1, -0x40000000, -0x3FFFFFFF, -2, -1,
                   0, 1, 2, 0x3FFFFFFF, 0x40000000, 0x7FFFFFFE,
                   0x7FFFFFFF], np.int64).astype(np.int64)


@pytest.fixture(scope="module")
def clib():
    DSP_LIB.parent.mkdir(exist_ok=True)
    if not DSP_LIB.exists():
        r = subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-o", str(DSP_LIB),
             str(CSRC / "etsi_dsp_test.cpp"),
             str(CSRC / "etsi_acelp_dec.cpp"), "-I", str(CSRC)],
            capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"build failed: {r.stderr.decode()[:200]}")
    lib = ctypes.CDLL(str(DSP_LIB))
    i16, i32 = ctypes.c_int16, ctypes.c_int32
    sigs = {
        "add": (i16, [i16, i16]), "sub": (i16, [i16, i16]),
        "mult": (i16, [i16, i16]), "mult_r": (i16, [i16, i16]),
        "shl": (i16, [i16, i16]), "shr": (i16, [i16, i16]),
        "div_s": (i16, [i16, i16]),
        "abs_s": (i16, [i16]), "negate": (i16, [i16]),
        "norm_s": (i16, [i16]),
        "L_add": (i32, [i32, i32]), "L_sub": (i32, [i32, i32]),
        "L_mult": (i32, [i16, i16]), "L_mult0": (i32, [i16, i16]),
        "L_mac": (i32, [i32, i16, i16]), "L_msu": (i32, [i32, i16, i16]),
        "L_mac0": (i32, [i32, i16, i16]),
        "L_msu0": (i32, [i32, i16, i16]),
        "L_shl": (i32, [i32, i16]), "L_shr": (i32, [i32, i16]),
        "L_shr_r": (i32, [i32, i16]),
        "L_negate": (i32, [i32]), "L_abs": (i32, [i32]),
        "L_deposit_h": (i32, [i16]), "L_deposit_l": (i32, [i16]),
        "extract_h": (i16, [i32]), "extract_l": (i16, [i32]),
        "round": (i16, [i32]), "norm_l": (i16, [i32]),
        "sature": (i16, [i32]),
        "L_comp": (i32, [i16, i16]),
        "mpy_32": (i32, [i16, i16, i16, i16]),
        "mpy_mix": (i32, [i16, i16, i16]),
        "Load_sh": (i32, [i16, i16]), "Load_sh16": (i32, [i16]),
        "add_sh": (i32, [i32, i16, i16]), "sub_sh": (i32, [i32, i16, i16]),
        "add_sh16": (i32, [i32, i16]), "sub_sh16": (i32, [i32, i16]),
        "store_hi": (i16, [i32, i16]),
    }
    for name, (res, args) in sigs.items():
        fn = getattr(lib, f"etsi_{name}")
        fn.restype = res
        fn.argtypes = args
    return lib


def _w16(rng, n):
    return np.concatenate(
        [EDGE16, rng.integers(-32768, 32768, n).astype(np.int32)])


def _w32(rng, n):
    r = rng.integers(-2**31, 2**31, n, dtype=np.int64)
    return np.concatenate([EDGE32, r]).astype(np.int64)


def _check(clib, name, jfn, *cols):
    """cols: int arrays of equal length; compares C scalar loop vs
    vectorized JAX over all rows."""
    cfn = getattr(clib, f"etsi_{name}")
    want = np.array(
        [cfn(*[int(c[i]) for c in cols]) for i in range(len(cols[0]))],
        np.int64)
    got = np.asarray(jfn(*[np.asarray(c).astype(np.int32) for c in cols]),
                     np.int64)
    # C returns are already width-typed; normalize JAX to the same width
    got = (got.astype(np.int64) << 32) >> 32
    bad = np.nonzero(want != got)[0]
    assert bad.size == 0, (
        f"{name}: {bad.size} mismatches, first at "
        f"{[int(c[bad[0]]) for c in cols]}: want {want[bad[0]]}, "
        f"got {got[bad[0]]}")


N = 4000


def test_word16_ops(clib):
    rng = np.random.default_rng(11)
    a, b = _w16(rng, N), _w16(rng, N)
    _check(clib, "add", JF.add, a, b)
    _check(clib, "sub", JF.sub, a, b)
    _check(clib, "mult", JF.mult, a, b)
    _check(clib, "mult_r", JF.mult_r, a, b)
    _check(clib, "abs_s", JF.abs_s, a)
    _check(clib, "negate", JF.negate, a)
    _check(clib, "norm_s", JF.norm_s, a)


def test_word16_shifts(clib):
    rng = np.random.default_rng(12)
    a = _w16(rng, N)
    n = np.concatenate([np.arange(-16, 17),
                        rng.integers(-16, 17, a.size - 33)]).astype(
                            np.int32)
    _check(clib, "shl", JF.shl, a, n)
    _check(clib, "shr", JF.shr, a, n)


def test_word32_ops(clib):
    rng = np.random.default_rng(13)
    L, M = _w32(rng, N), _w32(rng, N)[::-1].copy()
    a, b = _w16(rng, N + EDGE32.size - EDGE16.size), None
    a = a[:L.size]
    b = a[::-1].copy()
    _check(clib, "L_add", JF.L_add, L, M)
    _check(clib, "L_sub", JF.L_sub, L, M)
    _check(clib, "L_mult", JF.L_mult, a, b)
    _check(clib, "L_mult0", JF.L_mult0, a, b)
    _check(clib, "L_mac", JF.L_mac, L, a, b)
    _check(clib, "L_msu", JF.L_msu, L, a, b)
    _check(clib, "L_mac0", JF.L_mac0, L, a, b)
    _check(clib, "L_msu0", JF.L_msu0, L, a, b)
    _check(clib, "L_negate", JF.L_negate, L)
    _check(clib, "L_abs", JF.L_abs, L)
    _check(clib, "extract_h", JF.extract_h, L)
    _check(clib, "extract_l", JF.extract_l, L)
    _check(clib, "round", JF.round_w, L)
    _check(clib, "norm_l", JF.norm_l, L)
    _check(clib, "sature", JF.sature, np.clip(L, -2**31, 2**31 - 1))
    _check(clib, "L_deposit_h", JF.L_deposit_h, a)
    _check(clib, "L_deposit_l", JF.L_deposit_l, a)


def test_word32_shifts(clib):
    rng = np.random.default_rng(14)
    L = _w32(rng, N)
    n = np.concatenate([np.arange(-40, 41),
                        rng.integers(-40, 41, L.size - 81)]).astype(
                            np.int32)
    _check(clib, "L_shl", JF.L_shl, L, n)
    _check(clib, "L_shr", JF.L_shr, L, n)
    _check(clib, "L_shr_r", JF.L_shr_r, L, n)


def test_div_s(clib):
    rng = np.random.default_rng(15)
    denom = rng.integers(1, 32768, N).astype(np.int32)
    num = (rng.random(N) * (denom + 1)).astype(np.int32)
    num = np.minimum(num, denom)
    _check(clib, "div_s", JF.div_s, num, denom)


def test_dpf_helpers(clib):
    rng = np.random.default_rng(16)
    L = _w32(rng, N)
    a = _w16(rng, N + EDGE32.size - EDGE16.size)[:L.size]
    hi = a[::-1].copy()
    lo = np.abs(a) % 32768          # DPF lo is 15-bit nonnegative

    for sh in range(13):
        _check(clib, "Load_sh", lambda x, _n, s=sh: JF.Load_sh(x, s),
               a, np.full_like(a, sh))
        _check(clib, "add_sh",
               lambda x, y, _n, s=sh: JF.add_sh(x, y, s),
               L, a, np.full_like(a, sh))
        _check(clib, "sub_sh",
               lambda x, y, _n, s=sh: JF.sub_sh(x, y, s),
               L, a, np.full_like(a, sh))
    _check(clib, "Load_sh16", JF.Load_sh16, a)
    _check(clib, "add_sh16", JF.add_sh16, L, a)
    _check(clib, "sub_sh16", JF.sub_sh16, L, a)
    for sh in range(8):
        _check(clib, "store_hi", lambda x, _n, s=sh: JF.store_hi(x, s),
               L, np.full_like(a, sh))
    _check(clib, "L_comp", JF.L_comp, hi, lo)
    _check(clib, "mpy_32", JF.mpy_32, hi, lo, a, lo[::-1].copy())
    _check(clib, "mpy_mix", JF.mpy_mix, hi, lo, a)


def test_l_extract(clib):
    rng = np.random.default_rng(17)
    L = _w32(rng, N)
    hi_c = np.empty(L.size, np.int64)
    lo_c = np.empty(L.size, np.int64)
    h = ctypes.c_int16()
    lo = ctypes.c_int16()
    clib.etsi_L_extract.argtypes = [ctypes.c_int32,
                                    ctypes.POINTER(ctypes.c_int16),
                                    ctypes.POINTER(ctypes.c_int16)]
    for i in range(L.size):
        clib.etsi_L_extract(int(L[i]), ctypes.byref(h), ctypes.byref(lo))
        hi_c[i], lo_c[i] = h.value, lo.value
    hi_j, lo_j = JF.L_extract(np.asarray(L).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(hi_j, np.int64), hi_c)
    np.testing.assert_array_equal(np.asarray(lo_j, np.int64), lo_c)
