"""ETSI basicop fixed-point arithmetic as vectorized JAX int32 ops.

Bit-exact JAX mirror of the saturating Word16/Word32 operator set in
voice/csrc/etsi_dsp.h (the classic ETSI/ITU-T basicop semantics the
TETRA codec is specified in, reference sdec_tet.c equivalents) so the
ACELP speech decoder can run batched on the accelerator
(voice/jspeech.py).  Word16 values ride in int32 arrays constrained to
[-32768, 32767]; Word32 values use the full int32 range.

Saturation is detected with two's-complement wraparound sign tricks —
XLA integer arithmetic is modular, so ``(a ^ s) & (b ^ s) < 0`` is the
exact L_add overflow test without widening to int64 (which jax keeps
disabled by default).  Every operator is fuzz-pinned against the C++
implementation in tests/codec/test_jfixed.py; the C++ implementation is
itself pinned per-function to the ETSI reference binary
(tests/codec/test_acelp_oracle.py via the ms_abi oracle loader).

The global Overflow/Carry flags are NOT modeled: the decoder path never
reads them (they exist for the encoder's norm bookkeeping).
"""

from __future__ import annotations

import jax.numpy as jnp

I16_MIN = -0x8000
I16_MAX = 0x7FFF
I32_MIN = -0x80000000
I32_MAX = 0x7FFFFFFF

_i32 = jnp.int32


def _c(x):
    """Constant/int -> int32 array (values already in range)."""
    return jnp.asarray(x, _i32)


# ---- Word16 ops --------------------------------------------------------

def sature(L):
    """sature(): clamp a Word32 to Word16 range (input fits int32)."""
    return jnp.clip(L, I16_MIN, I16_MAX)


def add(a, b):
    return sature(_c(a) + _c(b))           # int16 + int16 fits int32


def sub(a, b):
    return sature(_c(a) - _c(b))


def abs_s(a):
    a = _c(a)
    return jnp.where(a == I16_MIN, I16_MAX, jnp.abs(a))


def negate(a):
    a = _c(a)
    return jnp.where(a == I16_MIN, I16_MAX, -a)


def extract_h(L):
    """High 16 bits, sign-extended (arithmetic >> 16)."""
    return jnp.right_shift(_c(L), 16)


def extract_l(L):
    """Low 16 bits, sign-extended (wraps — no saturation)."""
    return jnp.right_shift(jnp.left_shift(_c(L), 16), 16)


def mult(a, b):
    """(a*b) >> 15, saturated.  Product fits int32 (<= 2^30)."""
    return sature(jnp.right_shift(_c(a) * _c(b), 15))


def mult_r(a, b):
    return sature(jnp.right_shift(_c(a) * _c(b) + 0x4000, 15))


# ---- Word32 ops --------------------------------------------------------

def L_add(a, b):
    a, b = _c(a), _c(b)
    s = a + b                                # wraps (modular)
    ovf = ((a ^ s) & (b ^ s)) < 0
    sat = jnp.where(a < 0, _c(I32_MIN), _c(I32_MAX))
    return jnp.where(ovf, sat, s)


def L_sub(a, b):
    a, b = _c(a), _c(b)
    d = a - b                                # wraps (modular)
    ovf = ((a ^ b) & (d ^ a)) < 0
    sat = jnp.where(a < 0, _c(I32_MIN), _c(I32_MAX))
    return jnp.where(ovf, sat, d)


def L_mult(a, b):
    p = _c(a) * _c(b)                        # <= 2^30, exact
    return jnp.where(p == 0x40000000, _c(I32_MAX), p * 2)


def L_mult0(a, b):
    return _c(a) * _c(b)


def L_mac(L, a, b):
    return L_add(L, L_mult(a, b))


def L_msu(L, a, b):
    return L_sub(L, L_mult(a, b))


def L_mac0(L, a, b):
    return L_add(L, L_mult0(a, b))


def L_msu0(L, a, b):
    return L_sub(L, L_mult0(a, b))


def L_negate(L):
    L = _c(L)
    return jnp.where(L == I32_MIN, _c(I32_MAX), -L)


def L_abs(L):
    L = _c(L)
    return jnp.where(L == I32_MIN, _c(I32_MAX), jnp.abs(L))


def L_deposit_h(a):
    return jnp.left_shift(_c(a), 16)


def L_deposit_l(a):
    return _c(a)


# ---- shifts (variable counts; HLO shifts are undefined past the bit
# width, so counts are clamped before the shift and the out-of-range
# cases resolved with where) ---------------------------------------------

def shr(a, n):
    """Word16 arithmetic >> with negative-count = shl."""
    a, n = _c(a), _c(n)
    big = n >= 15
    nn = jnp.clip(n, 0, 15)
    r = jnp.right_shift(a, nn)               # arithmetic
    r = jnp.where(big, jnp.where(a < 0, _c(-1), _c(0)), r)
    return jnp.where(n < 0, _shl_pos(a, -n), r)


def shl(a, n):
    a, n = _c(a), _c(n)
    return jnp.where(n < 0, shr(a, jnp.maximum(-n, 0)), _shl_pos(a, n))


def _shl_pos(a, n):
    """shl for n >= 0: saturate if the result leaves Word16 range."""
    nn = jnp.clip(n, 0, 15)
    r = jnp.left_shift(a, nn)                # <= 2^30, exact in int32
    bad = (r > I16_MAX) | (r < I16_MIN) | ((n > 15) & (a != 0))
    sat = jnp.where(a > 0, _c(I16_MAX), _c(I16_MIN))
    return jnp.where(bad & (a != 0), sat, jnp.where(n > 15, _c(0), r))


def L_shr(L, n):
    L, n = _c(L), _c(n)
    big = n >= 31
    nn = jnp.clip(n, 0, 31)
    r = jnp.right_shift(L, nn)
    r = jnp.where(big, jnp.where(L < 0, _c(-1), _c(0)), r)
    return jnp.where(n < 0, _L_shl_pos(L, -n), r)


def L_shl(L, n):
    L, n = _c(L), _c(n)
    return jnp.where(n <= 0, L_shr(L, jnp.maximum(-n, 0)), _L_shl_pos(L, n))


def _L_shl_pos(L, n):
    """L_shl for n >= 1: progressive saturation == saturate iff the
    int64-exact result leaves int32; detected via shift-back compare."""
    nn = jnp.clip(n, 0, 31)
    r = jnp.left_shift(L, nn)                # wraps (modular)
    bad = (jnp.right_shift(r, nn) != L) | ((n > 31) & (L != 0))
    sat = jnp.where(L > 0, _c(I32_MAX), _c(I32_MIN))
    return jnp.where(bad & (L != 0), sat, jnp.where(n > 31, _c(0), r))


def L_shr_r(L, n):
    L, n = _c(L), _c(n)
    r = L_shr(L, n)
    nn = jnp.clip(n - 1, 0, 31)
    bit = jnp.where(n > 0,
                    jnp.right_shift(L, nn) & 1,
                    _c(0))
    r = r + bit
    return jnp.where(n > 31, _c(0), r)


def round_w(L):
    return extract_h(L_add(L, 0x8000))


# ---- norms -------------------------------------------------------------

def norm_s(a):
    a = _c(a)
    x = jnp.where(a < 0, ~a, a)
    n = 14 - _floor_log2(jnp.maximum(x, 1))
    n = jnp.clip(n, 0, 15)
    n = jnp.where(a == -1, _c(15), n)
    return jnp.where(a == 0, _c(0), n)


def norm_l(L):
    L = _c(L)
    x = jnp.where(L < 0, ~L, L)
    n = 30 - _floor_log2(jnp.maximum(x, 1))
    n = jnp.clip(n, 0, 31)
    n = jnp.where(L == -1, _c(31), n)
    return jnp.where(L == 0, _c(0), n)


def _floor_log2(x):
    """floor(log2(x)) for x >= 1 (int32), by unrolled binary search."""
    n = jnp.zeros_like(x)
    for s in (16, 8, 4, 2, 1):
        big = x >= jnp.left_shift(_c(1), s)
        x = jnp.where(big, jnp.right_shift(x, s), x)
        n = n + jnp.where(big, _c(s), _c(0))
    return n


def div_s(num, denom):
    """Fractional divide (0 <= num <= denom, denom > 0), 15 unrolled
    restoring-division steps — basicop div_s."""
    num, denom = _c(num), _c(denom)
    L_num = num
    out = jnp.zeros_like(num)
    for _ in range(15):
        out = out * 2
        L_num = L_num * 2                    # <= 2^16 scale, exact
        ge = L_num >= denom
        L_num = jnp.where(ge, L_num - denom, L_num)
        out = out + jnp.where(ge, 1, 0)
    out = jnp.where(num == denom, _c(I16_MAX), out)
    return jnp.where(num == 0, _c(0), out)


# ---- TETRA DPF helpers (same composition as etsi_dsp.h) ------------------

def Load_sh(a, shift: int):
    return L_msu0(0, a, -(1 << shift))


def add_sh(L, a, shift: int):
    return L_msu0(L, a, -(1 << shift))


def sub_sh(L, a, shift: int):
    return L_mac0(L, a, -(1 << shift))


def Load_sh16(a):
    return L_msu(0, a, I16_MIN)


def add_sh16(L, a):
    return L_msu(L, a, I16_MIN)


def sub_sh16(L, a):
    return L_mac(L, a, I16_MIN)


_SHR0 = (16, 15, 14, 13, 12, 11, 10, 9)


def store_hi(L, shift: int):
    return extract_l(L_shr(L, _SHR0[shift]))


def L_comp(hi, lo):
    return add_sh(Load_sh(lo, 0), hi, 15)


def L_extract(L):
    hi = extract_h(L_shl(L, 1))
    lo = extract_l(sub_sh(L, hi, 15))
    return hi, lo


def mpy_32(hi1, lo1, hi2, lo2):
    p1 = extract_h(L_mult0(hi1, lo2))
    p2 = extract_h(L_mult0(lo1, hi2))
    L = L_mult0(hi1, hi2)
    L = add_sh(L, p1, 1)
    return add_sh(L, p2, 1)


def mpy_mix(hi1, lo1, lo2):
    p1 = extract_h(L_mult0(lo1, lo2))
    L = L_mult0(hi1, lo2)
    return add_sh(L, p1, 1)
