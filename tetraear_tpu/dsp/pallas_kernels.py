"""Pallas TPU kernels: dynamic-start band extraction (reference).

band_extract issues one dynamic-start DMA per carrier (HBM -> VMEM) to
pull a contiguous band out of the wrap-extended spectrum, scalar-
prefetching the per-carrier start bins.

Two variants:

  * band_extract — dynamic-start element slices on the (N, 2) [re, im]
    layout.  Interpreter-validated only: Mosaic on v5e requires the
    sliced minor dimension to be a multiple of the 128-lane tiling
    ("Slice shape along dimension 1 must be aligned to tiling (128),
    but is 2").  Kept as the reference for UNALIGNED band starts.
  * band_extract_rows — the hardware-ready layout: re/im PLANES
    reshaped to (-1, 128) rows with 128-aligned row starts; one
    contiguous (2, rows, 128) DMA per carrier.  Compiles and runs on
    real v5e hardware (bit-exact vs the gather), wired into
    dsp/channelizer.py behind TETRAEAR_PALLAS_EXTRACT=1.

Default production path is still the XLA row gather in channelizer.py:
measured whole-bench throughput with the Pallas DMA (8.49k realtime
carriers at C=1024) sits inside the run-to-run variance band of the
gather (7.99k-8.62k) — XLA already emits near-optimal DMAs for an
aligned row gather — and keeping the default graph unchanged preserves
the persistent compile cache.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _extract_kernel(starts_ref, x_hbm, out_ref, sem):
    c = pl.program_id(0)
    s = starts_ref[c]
    n_band = out_ref.shape[1]
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(s, n_band)],      # (n_band, 2) slice in HBM
        out_ref.at[0],                   # (n_band, 2) VMEM block
        sem,
    )
    cp.start()
    cp.wait()


@partial(jax.jit, static_argnames=("n_band", "interpret"))
def band_extract(x_ext_r: jnp.ndarray, starts: jnp.ndarray, n_band: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Extract C contiguous bands from the wrap-extended spectrum.

    Args:
        x_ext_r: (nfft + n_band, 2) float32 [re, im] spectrum, wrap-extended
            (first n_band rows appended) so every band is one slice.
        starts: (C,) int32 start rows ((k_c - n_band/2) mod nfft).
        n_band: band length (power of two).

    Returns (C, n_band, 2) float32 band slices in natural (centred) order.
    """
    c = starts.shape[0]
    return pl.pallas_call(
        _extract_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(c,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, n_band, 2), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((c, n_band, 2), jnp.float32),
        interpret=interpret,
    )(starts, x_ext_r)


def band_extract_reference(x_ext_r: jnp.ndarray, starts: jnp.ndarray,
                           n_band: int) -> jnp.ndarray:
    """Gather-based fallback with identical semantics (CPU backend)."""
    idx = starts[:, None] + jnp.arange(n_band, dtype=jnp.int32)[None, :]
    return x_ext_r[idx]


# -- hardware-ready variant: 128-aligned row slices on re/im planes --------

def _rows_kernel(starts_ref, x_hbm, out_ref, sem):
    c = pl.program_id(0)
    s = starts_ref[c]
    rows = out_ref.shape[2]
    cp = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(s, rows)],     # (2, rows, 128) slice in HBM
        out_ref.at[0],                   # (2, rows, 128) VMEM block
        sem,
    )
    cp.start()
    cp.wait()


@partial(jax.jit, static_argnames=("rows_per_band", "interpret"))
def band_extract_rows(x_planes: jnp.ndarray, row_starts: jnp.ndarray,
                      rows_per_band: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Extract C contiguous 128-aligned bands as one DMA per carrier.

    The Mosaic-compatible layout the band_extract docstring prescribes:
    the wrap-extended spectrum stored as re/im PLANES reshaped to 128
    lanes, so the sliced minor dimension is exactly the lane tiling.

    Args:
        x_planes: (2, R, 128) float32 — [re, im] planes of the
            wrap-extended spectrum, R = (nfft + n_band) / 128.
        row_starts: (C,) int32 — per-carrier first row (band_start / 128;
            requires the 128-bin-aligned channel grid).
        rows_per_band: n_band / 128.

    Returns (C, 2, rows_per_band, 128) float32; reshape to
    (C, n_band) complex via the [re, im] planes.
    """
    c = row_starts.shape[0]
    return pl.pallas_call(
        _rows_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(c,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 2, rows_per_band, 128),
                                   lambda i, *_: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((c, 2, rows_per_band, 128),
                                       jnp.float32),
        interpret=interpret,
    )(row_starts, x_planes)


# -- fused band extraction + channel filter + MXU synthesis ----------------
#
# The XLA formulation of the channelizer's per-carrier back end costs
# three separate passes over ~671 MB tensors at C=10240 (measured
# 19.6 ms extract+multiply + 11.0 ms matmul-ifft per 113 ms block,
# perf/channelizer_breakdown.py x1/x2): the row gather materializes all
# bands, the H1 table gather-multiply rereads them, and the synthesis
# matmuls reread again.  Here each carrier is ONE trip through VMEM:
# DMA its P=n_band/128 spectrum rows + its rolled-H1 row, apply the
# filter on the VPU, run the layout-native Cooley-Tukey synthesis
# (FFTChannelizer._synth derivation) as three 128-wide real matmuls on
# the MXU, and write the (2, 128, P) time planes straight out.  Complex
# arithmetic is done in [re, im] f32 planes throughout: the stage-1
# matmul stacks re/im along the contraction dim with the block matrix
# [[m1re, m1im], [-m1im, m1re]], stage 2 uses two real matmuls on
# re/im-concatenated operands.

def _band_synth_body(row_ref, d_ref, planes_hbm, h1_hbm,
                     m1c_ref, m2re_ref, m2im_ref, twre_ref, twim_ref,
                     out_ref, ph_ref, nat_scr, h1_scr, sem_n, sem_h,
                     phasor_drop, bs_high):
    i = pl.program_id(0)
    g_count = (out_ref if out_ref is not None else ph_ref).shape[0]
    p = nat_scr.shape[2]
    # synthesis-transform precision A/B: bs_high (TETRAEAR_BS_PREC=high,
    # resolved in the non-jitted band_synth wrapper and threaded here as
    # a static arg) runs the three per-carrier transform matmuls as
    # hand-split 3-pass bf16.  Real-chip A/B (agenda13): synth 19.1
    # (high) vs 19.0 (highest) — the small (128x128-ish) per-carrier
    # matmuls are latency-bound, not pass-bound, so the split buys
    # nothing; default stays f32 (exact accumulation, minimal delta vs
    # the XLA formulation).

    def _split(mat):
        hi = mat.astype(jnp.bfloat16)
        lo = (mat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def _d3(a_, b_, dn):
        ahi, alo = _split(a_)
        bhi, blo = _split(b_)

        def d(x, y_):
            return jax.lax.dot_general(
                x, y_, dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        return d(ahi, bhi) + d(ahi, blo) + d(alo, bhi)
    # h1_vmem mode (h1_scr is None): the whole rolled-filter table is a
    # VMEM-RESIDENT constant block (constant index map -> fetched from
    # HBM once, reused across all grid steps) and each carrier's roll is
    # a dynamic leading-dim index — instead of a per-carrier HBM DMA
    # that re-reads P rows x C carriers = 80x the table per block
    # (671 MB at C=10240, ~1.7 ms of pure re-read traffic).
    h1_resident = h1_scr is None

    def nat_dma(g):
        c = i * g_count + g
        return pltpu.make_async_copy(
            planes_hbm.at[:, pl.ds(row_ref[c], p), :],
            nat_scr.at[g], sem_n.at[g])

    def h1_dma(g):
        c = i * g_count + g
        return pltpu.make_async_copy(
            h1_hbm.at[:, d_ref[c]], h1_scr.at[g], sem_h.at[g])

    for g in range(g_count):
        nat_dma(g).start()
        if not h1_resident:
            h1_dma(g).start()

    for g in range(g_count):
        nat_dma(g).wait()
        if h1_resident:
            d = d_ref[i * g_count + g]
            hre = h1_hbm[0, d]
            him = h1_hbm[1, d]
        else:
            h1_dma(g).wait()
            hre = h1_scr[g, 0]
            him = h1_scr[g, 1]
        nre = nat_scr[g, 0]
        nim = nat_scr[g, 1]
        bre = nre * hre - nim * him                  # (P, 128)
        bim = nre * him + nim * hre
        a = jnp.concatenate([bre, bim], axis=0)      # (2P, 128)
        dn0 = (((0,), (0,)), ((), ()))
        dn1 = (((1,), (0,)), ((), ()))
        if bs_high:
            t2 = _d3(a, m1c_ref[:], dn0)             # (128 l, 2P)
        else:
            t2 = jax.lax.dot_general(
                a, m1c_ref[:], dimension_numbers=dn0,
                preferred_element_type=jnp.float32)
        tre = t2[:, :p]
        tim = t2[:, p:]
        twre = twre_ref[:]
        twim = twim_ref[:]
        ure = tre * twre - tim * twim                # (128 l, P s)
        uim = tre * twim + tim * twre
        u2 = jnp.concatenate([ure, uim], axis=1)     # (128, 2P)
        u2s = jnp.concatenate([-uim, ure], axis=1)
        if bs_high:
            y2 = _d3(m2re_ref[:], u2, dn1) + _d3(m2im_ref[:], u2s, dn1)
        else:
            y2 = (jnp.dot(m2re_ref[:], u2,
                          preferred_element_type=jnp.float32)
                  + jnp.dot(m2im_ref[:], u2s,
                            preferred_element_type=jnp.float32))
        yre = y2[:, :p]
        yim = y2[:, p:]
        if out_ref is not None:
            out_ref[g, 0] = yre                      # Y_re (128 t, P s)
            out_ref[g, 1] = yim
        if ph_ref is not None:
            # Oerder-Meyr timing phasor of the post-slice block, fused
            # into the synthesis pass (dsp.timing._om_phasor semantics):
            # sample k = s + P*t, output index n = k - drop, twiddle
            # e^{-j pi n / 2} depends only on s mod 4 because both drop
            # and P are multiples of 4 (asserted by the wrapper).  |y|^2
            # is ramp/rotation-invariant, so the RAW synthesis output
            # gives the same angle as the corrected stream (the caller
            # applies the 1/decim^2 power scale — a pow2, exact).
            pw = yre * yre + yim * yim               # (128 t, P s)
            tt = jax.lax.broadcasted_iota(jnp.int32, (128, p), 0)
            ss = jax.lax.broadcasted_iota(jnp.int32, (128, p), 1)
            live = ((ss + p * tt) >= phasor_drop).astype(jnp.float32)
            s4 = ss % 4
            wre = (jnp.where(s4 == 0, 1.0, 0.0)
                   - jnp.where(s4 == 2, 1.0, 0.0))
            wim = (jnp.where(s4 == 3, 1.0, 0.0)
                   - jnp.where(s4 == 1, 1.0, 0.0))
            phre = jnp.sum(pw * wre * live)
            phim = jnp.sum(pw * wim * live)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            ph_ref[g] = (jnp.where(lane == 0, phre, 0.0)
                         + jnp.where(lane == 1, phim, 0.0))


def _band_synth_kernel(bs_high, row_ref, d_ref, planes_hbm, h1_hbm,
                       m1c_ref, m2re_ref, m2im_ref, twre_ref, twim_ref,
                       out_ref, *scr):
    nat_scr, h1_scr, sem_n, sem_h = (scr if len(scr) == 4
                                     else (scr[0], None, scr[1], None))
    _band_synth_body(row_ref, d_ref, planes_hbm, h1_hbm, m1c_ref,
                     m2re_ref, m2im_ref, twre_ref, twim_ref, out_ref,
                     None, nat_scr, h1_scr, sem_n, sem_h, 0, bs_high)


def _band_synth_ph_kernel(phasor_drop, bs_high, row_ref, d_ref,
                          planes_hbm, h1_hbm, m1c_ref, m2re_ref,
                          m2im_ref, twre_ref, twim_ref, out_ref, ph_ref,
                          *scr):
    nat_scr, h1_scr, sem_n, sem_h = (scr if len(scr) == 4
                                     else (scr[0], None, scr[1], None))
    _band_synth_body(row_ref, d_ref, planes_hbm, h1_hbm, m1c_ref,
                     m2re_ref, m2im_ref, twre_ref, twim_ref, out_ref,
                     ph_ref, nat_scr, h1_scr, sem_n, sem_h, phasor_drop,
                     bs_high)


def _band_synth_phonly_kernel(phasor_drop, bs_high, row_ref, d_ref,
                              planes_hbm, h1_hbm, m1c_ref, m2re_ref,
                              m2im_ref, twre_ref, twim_ref, ph_ref,
                              *scr):
    """Phasor-only variant: the full synthesis runs in VMEM (the phasor
    reduction consumes yre/yim, so Mosaic cannot dead-code it) but the
    bulk y planes are never materialized to HBM.  This is the measured
    cost of the hypothetical 'scalar pre-pass' that would let a merged
    synth+backhalf kernel eliminate the y round-trip (round-4 verdict
    item 4) — perf/y_roundtrip_probe.py turns it into a net-win verdict
    without building the Mosaic-risk-bearing merge."""
    nat_scr, h1_scr, sem_n, sem_h = (scr if len(scr) == 4
                                     else (scr[0], None, scr[1], None))
    _band_synth_body(row_ref, d_ref, planes_hbm, h1_hbm, m1c_ref,
                     m2re_ref, m2im_ref, twre_ref, twim_ref, None,
                     ph_ref, nat_scr, h1_scr, sem_n, sem_h, phasor_drop,
                     bs_high)


def band_synth(planes: jnp.ndarray, h1_planes: jnp.ndarray,
               row_starts: jnp.ndarray, d_shift: jnp.ndarray,
               m1c: jnp.ndarray, m2re: jnp.ndarray, m2im: jnp.ndarray,
               twre: jnp.ndarray, twim: jnp.ndarray,
               rows_per_band: int, group: int = 8,
               interpret: bool = False,
               phasor_drop: int | None = None,
               h1_vmem: bool | None = None,
               y_out: bool = True):
    """See _band_synth_impl.  (A group-dense "batched" kernel body
    existed behind TETRAEAR_BS_BATCHED; its real-chip A/B crashed the
    Mosaic compiler (layout.h check failure, round 3) and it was
    removed — the per-carrier body is the only formulation.)

    h1_vmem: keep the whole rolled-H1 table VMEM-resident instead of
    DMAing each carrier's roll from HBM (see _band_synth_body); None
    auto-selects it whenever the table fits a 16 MB budget (gated by
    TETRAEAR_BS_H1VMEM=0/1 for the hardware A/B).  TETRAEAR_BS_PREC is
    likewise resolved here (non-jitted) and threaded as a static arg."""
    if h1_vmem is None:
        env = os.environ.get("TETRAEAR_BS_H1VMEM", "")
        if env in ("0", "1"):
            h1_vmem = env == "1"
        else:
            h1_vmem = h1_planes.size * 4 <= 16 * 1024 * 1024
    bs_high = os.environ.get("TETRAEAR_BS_PREC", "highest") == "high"
    return _band_synth_impl(planes, h1_planes, row_starts, d_shift,
                            m1c, m2re, m2im, twre, twim,
                            rows_per_band=rows_per_band, group=group,
                            interpret=interpret,
                            phasor_drop=phasor_drop, h1_vmem=h1_vmem,
                            bs_high=bs_high, y_out=y_out)


@partial(jax.jit,
         static_argnames=("rows_per_band", "group", "interpret",
                          "phasor_drop", "h1_vmem", "bs_high", "y_out"))
def _band_synth_impl(planes: jnp.ndarray, h1_planes: jnp.ndarray,
                     row_starts: jnp.ndarray, d_shift: jnp.ndarray,
                     m1c: jnp.ndarray, m2re: jnp.ndarray,
                     m2im: jnp.ndarray,
                     twre: jnp.ndarray, twim: jnp.ndarray,
                     rows_per_band: int, group: int = 8,
                     interpret: bool = False,
                     phasor_drop: int | None = None,
                     h1_vmem: bool = False,
                     bs_high: bool = False,
                     y_out: bool = True):
    """Fused band extract + H1 filter + inverse transform.

    Args:
        planes: (2, R, 128) f32 [re, im] planes of the wrap-extended
            wideband spectrum.
        h1_planes: (2, D, P, 128) f32 planes of the rolled channel
            filter tables in natural band order, minor-split by
            i = l + 128 r (D=128 rolls on the quantized path, D=1 with
            d_shift all zero on the aligned path).
        row_starts: (C,) int32 first spectrum row per carrier.
        d_shift: (C,) int32 per-carrier roll index into h1_planes.
        m1c: (2P, 2P) f32 [[m1re, m1im], [-m1im, m1re]] stage-1 block
            matrix, m1[r, s] = exp(2 pi j r s / P).
        m2re/m2im: (128, 128) f32 planes of m2[t, l] =
            exp(2 pi j l t / 128).
        twre/twim: (128, P) f32 planes of tw[l, s] =
            exp(2 pi j l s / n_band) / n_band.
        rows_per_band: P = n_band / 128.
        group: carriers per grid instance (DMA pipelining depth).

    Returns (C, 2, 128, P) f32 — [re, im] planes of the band time
    series y[k] at k = s + P*t, i.e. reshape (C, n_band) after complex
    assembly.  Values equal jnp.fft.ifft(band, axis=1) to f32 rounding.

    With ``phasor_drop`` set (the post-slice start index, a multiple of
    4; requires P % 4 == 0), also returns a (C, 1, 128) f32 array whose
    lanes 0/1 carry the raw Oerder-Meyr timing phasor [re, im] of the
    sliced block — the fused back half's glue consumes it (see
    _band_synth_body).
    """
    c = row_starts.shape[0]
    if c % group:
        group = 1
    p = rows_per_band
    with_ph = phasor_drop is not None
    y_block = (group, 2, 128, p)
    y_shape = (c, 2, 128, p)
    if not y_out and not with_ph:
        raise ValueError("y_out=False requires phasor_drop (the "
                         "phasor-only measurement variant)")
    if with_ph and not y_out:
        # phasor-only (perf/y_roundtrip_probe.py): synthesis runs in
        # VMEM, only the (C, 1, 128) phasor rows reach HBM
        if phasor_drop % 4 or p % 4:
            raise ValueError("phasor fusion needs drop % 4 == 0 and "
                             f"P % 4 == 0 (drop={phasor_drop}, P={p})")
        kern = partial(_band_synth_phonly_kernel, phasor_drop, bs_high)
        out_specs = pl.BlockSpec((group, 1, 128),
                                 lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((c, 1, 128), jnp.float32)
    elif with_ph:
        if phasor_drop % 4 or p % 4:
            raise ValueError("phasor fusion needs drop % 4 == 0 and "
                             f"P % 4 == 0 (drop={phasor_drop}, P={p})")
        kern = partial(_band_synth_ph_kernel, phasor_drop, bs_high)
        out_specs = (
            pl.BlockSpec(y_block, lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct(y_shape, jnp.float32),
            jax.ShapeDtypeStruct((c, 1, 128), jnp.float32),
        )
    else:
        kern = partial(_band_synth_kernel, bs_high)
        out_specs = pl.BlockSpec(y_block,
                                 lambda i, *_: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(y_shape, jnp.float32)
    scr_shape = (group, 2, p, 128)
    if h1_vmem:
        # resident table: constant index map -> one HBM fetch, reused
        # across every grid step; carriers index their roll in VMEM
        h1_spec = pl.BlockSpec(h1_planes.shape,
                               lambda i, *_: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM(scr_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((group,)),
        ]
    else:
        h1_spec = pl.BlockSpec(memory_space=pl.ANY)      # h1 (HBM)
        scratch = [
            pltpu.VMEM(scr_shape, jnp.float32),
            pltpu.VMEM(scr_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((group,)),
            pltpu.SemaphoreType.DMA((group,)),
        ]
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(c // group,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),       # planes (HBM)
                h1_spec,
                pl.BlockSpec((2 * p, 2 * p), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, p), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, p), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        # group > 8 overflows the 16 MB default scoped-vmem budget
        # (agenda group sweep: BS_GROUP=16 needed 20 MB); v5e has 128
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(row_starts, d_shift, planes, h1_planes, m1c, m2re, m2im, twre,
      twim)


# -- fused frame scan: even-position sync + CRC without the HBM conv -------
#
# The XLA even-position frame scan (dsp.framescan.frame_scan_packed_even)
# must materialize its 140-channel conv output to HBM (~2 GB bf16 at
# C=10240) and re-read it for the syndrome reductions — ~20 ms of the
# 113 ms block.  Here each carrier's scan is one VMEM trip: the ~5 KB
# bit row DMAs in, an im2col view feeds ONE (J, 256) x (256, 140) bf16
# matmul on the MXU, and the syndrome/selection reductions run as two
# tiny matmuls against one-hot row-selector matrices (sum over 16
# specific channels == matmul with a 0/1 selector — keeps the lane
# dimension intact, no lane-segmented reductions).  Only the per-
# position corr / crc_err rows (~20 KB per carrier) are written back.
# All values are integer counts <= 237: exact in bf16 products with f32
# accumulation, so the outputs are bit-identical to the XLA path.

def _scan_rows(base_f, k3_ref, rsyn_ref, c0_ref, m):
    """Even-position sync + CRC scan of one carrier's bit rows.

    base_f: (R, 128) f32 {0,1} bit rows already in VMEM; m = R - 2
    output rows.  Returns (corr (M, 64) f32, err (M, 64) f32) — element
    [m, t*4 + i] is even bit position pe = 64*m + 4*t + i (see
    frame_scan_even).  Shared by the standalone scan kernel and the
    fused back-half kernel.
    """
    from tetraear_tpu.dsp import framescan as _fs
    zs = _fs._SYNC_ZEROS.astype(float)
    r_rows = base_f.shape[0]
    # slices at row offsets 0/1/2 have mismatched sublane offsets
    # (Mosaic rejects the concat); realign with rolls first (the
    # rotate unit is 32-bit wide — f32 rows rotate fine)
    b1_f = pltpu.roll(base_f, shift=r_rows - 1, axis=0)
    b2_f = pltpu.roll(base_f, shift=r_rows - 2, axis=0)

    # [base | b1 | b2] @ k3 done as three row-block matmuls — a
    # lane concat of the rolled operands trips Mosaic's layout
    # inference, and matmul operands relayout cleanly anyway
    out = (jnp.dot(base_f[0:m].astype(jnp.bfloat16), k3_ref[0:128],
                   preferred_element_type=jnp.float32)
           + jnp.dot(b1_f[0:m].astype(jnp.bfloat16), k3_ref[128:256],
                     preferred_element_type=jnp.float32)
           + jnp.dot(b2_f[0:m].astype(jnp.bfloat16), k3_ref[256:384],
                     preferred_element_type=jnp.float32))
    ones = out[:, 0:64]                          # [t*4 + i]
    s1 = out[:, 128:192]
    s2 = out[:, 256:320]
    par = out - 2.0 * jnp.floor(out * 0.5)
    # expected-parity fold (framescan._pallas_scan_tables): rsyn is the
    # SIGNED selector (1-2*c0)*rsyn0 and c0_ref the constant row
    # c0 @ rsyn0, so e == sum |par - c0| without materializing the
    # (M, 1600) syndrome plane
    e = jnp.dot(par.astype(jnp.bfloat16), rsyn_ref[:],
                preferred_element_type=jnp.float32) + c0_ref[:]
    e_fwd = e[:, 0:64]
    e_rev = e[:, 64:128]
    corr = jnp.maximum(s1 + zs[0], s2 + zs[1]) * jnp.float32(
        1.0 / _fs.SYNC_LEN)
    err = jnp.minimum(e_fwd, e_rev)
    deg = (ones == 0.0) | (ones == float(_fs.DATA_BITS))
    err = jnp.where(deg, jnp.float32(99), err)
    return corr, err


def _frame_scan_kernel(bits_ref, k3_ref, rsyn_ref, c0_ref,
                       out_c_ref, out_e_ref):
    g_count = bits_ref.shape[0]
    m = out_c_ref.shape[1]

    for g in range(g_count):
        # Mosaic has no u8 -> bf16/f32-direct cast; hop via i32
        base_f = bits_ref[g].astype(jnp.int32).astype(jnp.float32)
        corr, err = _scan_rows(base_f, k3_ref, rsyn_ref, c0_ref, m)
        out_c_ref[g] = corr
        out_e_ref[g] = jnp.round(err).astype(jnp.int32)


# -- fused back half: ramp/rotation + timing interp + DQPSK + frame scan --
#
# After the band synthesis, the XLA back half makes ~5 more full passes
# over the (C, n_band) baseband at C=10240 (~29 ms of the 74.6 ms
# block): complex assembly, the phase-correction multiplies, the
# tail concat, the phase-major transpose for the interpolator, and the
# bit interleave + scan-input build.  Here ONE kernel reads the raw
# synthesis planes once per carrier and produces scan verdicts + soft
# bits + all carried state directly:
#
#   * phase ramp/rotation as a factored outer product
#     R[t, s] = rr[t] * rc[s] (rr folds the per-block rotation and
#     1/decim; rc the (-1)^s alternation) — broadcasts, no tables;
#   * the previous block's 4-sample interpolation tail spliced over the
#     (corrupt) last overlap samples at k in [drop-4, drop);
#   * Catmull-Rom interpolation at symbol instants as per-carrier
#     selector MATMULS: with per-block fraction f constant per carrier,
#     symbol (t', u) = sum_lam W[t'+q0, lam] * S[lam, u] where
#     S[lam, u] = sum_j c_j(f) [lam == l0 + 4u + b + j] is built from
#     iotas + the per-carrier scalars; W rows are the y rows themselves
#     (roll by q0 / q0+1) so no concat or strided slice ever happens.
#     The PREVIOUS symbol for the differential demod is the same matmul
#     with l0 - 4 — no cross-row shifts of the symbol plane;
#   * pi/4-DQPSK decisions + soft bits on the (128, SY) symbol planes;
#   * bit interleave + placement at offset TAILBITS into the scan row
#     layout via 0/1 "sandwich" matmuls E @ plane @ F (a matmul pair
#     per 32-bit alignment class) — MXU does the relayout;
#   * the even-position sync + CRC scan (_scan_rows, shared with
#     frame_scan_even) and the next block's 1200-bit tail extraction
#     (three static-offset sandwich products selected by the
#     per-carrier valid count).
#
# f32 matmuls that touch sample values use precision=HIGHEST — Mosaic's
# dot_general otherwise multiplies in bf16 (measured: wrong by 1 ulp at
# values >= 256, perf/mosaic_ops_probe.py).  The 0/1 relayout matmuls
# are exact at any precision.

_HP = jax.lax.Precision.HIGHEST


def _dot_hp(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_HP, preferred_element_type=jnp.float32)


def _dot_high(a, b):
    # 3-pass bf16 (hi*hi + hi*lo + lo*hi) — half the MXU passes of
    # HIGHEST at ~2^-16-relative product error; an fft2p A/B knob
    # (TETRAEAR_FFT2P_PREC=high).  Decomposed by hand: Mosaic cannot
    # lower Precision.HIGH itself (NotImplementedError, round 4).
    ahi = a.astype(jnp.bfloat16)
    alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
    bhi = b.astype(jnp.bfloat16)
    blo = (b - bhi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return d(ahi, bhi) + d(ahi, blo) + d(alo, bhi)


def _dot01(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _backhalf_kernel(drop, k_max, tb, w_width, qmin,
                     bh_ablate_s, bh_interp, bh_place,
                     bsel_ref, dsel_ref,
                     y_ref, bt_ref, rr_ref, rc_ref, sc_ref,
                     k3_ref, rsyn_ref, c0_ref,
                     pall_ref, eplace_ref, fplace_ref, epad_ref,
                     etail_ref, ftail_ref,
                     corr_ref, err_ref, soft_ref, bt2_ref, last_ref,
                     misc_ref,
                     wre_scr, wim_scr, pc_scr, bt_scr):
    # bh_* are the TETRAEAR_BH_{ABLATE,INTERP,PLACE} knobs, resolved in
    # the non-jitted fused_backhalf wrapper and threaded through the
    # jit cache as static args.  Scope: the wrapper runs at TRACE time
    # of whatever outer jit encloses it, so a flip takes effect for any
    # NEW outer trace (fresh jit / fresh process — what every probe and
    # the bench do); re-calling an ALREADY-jitted outer callable keeps
    # its cached executable, env flip or not.
    ablate = set(bh_ablate_s.split(","))
    i = pl.program_id(0)
    g_count = y_ref.shape[0]
    p = y_ref.shape[3]
    sy = p // 4
    tr = bt_ref.shape[1]
    z_rows = corr_ref.shape[1] + 2
    d0 = drop - 4
    n_m = eplace_ref.shape[0]
    span = w_width // p
    gc = g_count * 128

    # ---- stage A: corrections, BATCHED across the group; everything
    # downstream works on TRANSPOSED symbol-plane layouts (rows =
    # within-symbol index, lanes = carrier*128 + t') so the (.., SY)-
    # narrow tensors of the first formulation — 16/128 lanes live on
    # every VPU op — become full-lane (SY, G*128) rows.  (The original
    # per-carrier loop ablated at ~2 ms/block of pure group-serial
    # elementwise work at C=10240.) ----
    row_t, lane_t = divmod(d0, p)
    if "nocorr" in ablate:
        cre_a = y_ref[:, 0]
        cim_a = y_ref[:, 1]                      # (G, 128, P)
    else:
        cor_re = (rr_ref[:, 0] * rc_ref[:, 0]
                  - rr_ref[:, 1] * rc_ref[:, 1])     # (G, 128, P)
        cor_im = (rr_ref[:, 0] * rc_ref[:, 1]
                  + rr_ref[:, 1] * rc_ref[:, 0])
        cre_a = y_ref[:, 0] * cor_re - y_ref[:, 1] * cor_im
        cim_a = y_ref[:, 0] * cor_im + y_ref[:, 1] * cor_re

    # the final-sample row stays a per-g (1, P) store: the batched
    # `last_ref[:, 0, 0, :] = cre_a[:, 127, :]` form crashes Mosaic's
    # LLO lowering (lower_to_llo.cc:1093 `Check failed: d >> 32 == 0`,
    # bisected on hardware via perf/gate_kernels.py, round 4)
    for g in range(g_count):
        last_ref[g, 0] = cre_a[g, 127:128, :]
        last_ref[g, 1] = cim_a[g, 127:128, :]

    # W columns, transposed: scrW[row lam, lane g*128 + t'] =
    # y[t' + qmin + oi, lam] — a lane roll of the transposed tiles,
    # batched: (G, 128, P) -> (P, G*128) per shift
    if "noW" not in ablate:
        creT = jnp.transpose(cre_a, (0, 2, 1))   # (G, P, 128)
        cimT = jnp.transpose(cim_a, (0, 2, 1))
        for oi in range(span):
            sh = (128 - (qmin + oi)) % 128
            rre = jnp.transpose(pltpu.roll(creT, shift=sh, axis=2),
                                (1, 0, 2)).reshape(p, gc)
            rim = jnp.transpose(pltpu.roll(cimT, shift=sh, axis=2),
                                (1, 0, 2)).reshape(p, gc)
            wre_scr[oi * p:(oi + 1) * p, :] = rre
            wim_scr[oi * p:(oi + 1) * p, :] = rim
    bt_scr[...] = bt_ref[...].reshape(g_count * tr, 128)

    # splice the carried interpolation tail over k in [drop-4, drop),
    # applied where the spliced samples LAND in the W scratch rather
    # than on the (G, 128, P) planes: a (G,)-stacked scalar value for
    # a batched where lowers to the Mosaic-unsupported
    # vector<Gxf32> -> vector<Gx1x1xf32> reshape (BENCH_r03 tail), so
    # each (shift oi, tap j, carrier g) copy is a masked (1, 128)
    # aligned row-segment update with an SMEM scalar value — the same
    # proven pattern as the pc_scr plane writes below.  Element
    # cre_a[g, row_t, lane_t + j] sits at scratch row oi*p + lane_t + j,
    # lane (row_t - qmin - oi) % 128 of carrier g's 128-lane block
    # (lane_t + 3 <= p - 1 always: drop % 4 == 0 and p % 4 == 0).
    if "nosplice" not in ablate and "noW" not in ablate:
        l128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        for oi in range(span):
            lm = l128 == (row_t - qmin - oi) % 128
            for j in range(4):
                r = oi * p + lane_t + j
                for g in range(g_count):
                    cs = slice(g * 128, (g + 1) * 128)
                    wre_scr[r:r + 1, cs] = jnp.where(
                        lm, sc_ref[g, 7 + j], wre_scr[r:r + 1, cs])
                    wim_scr[r:r + 1, cs] = jnp.where(
                        lm, sc_ref[g, 11 + j], wim_scr[r:r + 1, cs])
    if "nosplice" not in ablate and row_t == 127:
        # tail reaches the final sample row -> patch last_ref too
        # (unreachable at production drops; kept for exactness)
        lp = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        for j in range(4):
            pm_ = lp == lane_t + j
            for g in range(g_count):
                last_ref[g, 0, 0:1, :] = jnp.where(
                    pm_, sc_ref[g, 7 + j], last_ref[g, 0, 0:1, :])
                last_ref[g, 1, 0:1, :] = jnp.where(
                    pm_, sc_ref[g, 11 + j], last_ref[g, 1, 0:1, :])

    # per-carrier rows of the (16, G*128) scalar plane: 0..6 the
    # Catmull-Rom tap-block weights, 7 n_valid, 8/9 prev symbol
    # (SMEM scalar reads stay per-carrier — they're scalars)
    for g in range(g_count):
        c = i * g_count + g
        b = bsel_ref[c]
        for q in ([] if "nopc" in ablate else range(7)):
            w = jnp.float32(0.0)
            for j in range(4):
                if 0 <= q - j <= 3:
                    w = w + jnp.where(b == q - j, sc_ref[g, j], 0.0)
            pc_scr[q:q + 1, g * 128:(g + 1) * 128] = jnp.full(
                (1, 128), w, jnp.float32)
        pc_scr[7:8, g * 128:(g + 1) * 128] = jnp.full(
            (1, 128), sc_ref[g, 4], jnp.float32)
        pc_scr[8:9, g * 128:(g + 1) * 128] = jnp.full(
            (1, 128), sc_ref[g, 5], jnp.float32)
        pc_scr[9:10, g * 128:(g + 1) * 128] = jnp.full(
            (1, 128), sc_ref[g, 6], jnp.float32)

    # ---- batched interpolation + weight combine ----
    # T[qblock*SY + u, :] = W[base + 4u + qi - 4, :] — the p_all
    # "matmul" contracts a ONE-HOT row-selection matrix, so the default
    # form reads the tap blocks as strided sublane slices of the W
    # scratch instead (exact: same rows, same f32 accumulation order;
    # the matmul at HIGHEST ablated at ~3.2 ms/block plus ~1.7 base —
    # TETRAEAR_BH_INTERP=matmul keeps it for the A/B).
    base = (drop - 4) - qmin * p
    sym_re = jnp.zeros((sy, gc), jnp.float32)
    sym_im = jnp.zeros((sy, gc), jnp.float32)
    prv_re = jnp.zeros((sy, gc), jnp.float32)
    prv_im = jnp.zeros((sy, gc), jnp.float32)
    if bh_interp == "matmul" or "hp" in ablate:
        prec = None if "hp" in ablate else _HP
        t_re = jax.lax.dot_general(
            pall_ref[...], wre_scr[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        t_im = jax.lax.dot_general(
            pall_ref[...], wim_scr[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        for q in range(7):
            w_row = pc_scr[q:q + 1, :]
            sym_re = sym_re + w_row * t_re[(q + 4) * sy:(q + 5) * sy]
            sym_im = sym_im + w_row * t_im[(q + 4) * sy:(q + 5) * sy]
            prv_re = prv_re + w_row * t_re[q * sy:(q + 1) * sy]
            prv_im = prv_im + w_row * t_im[q * sy:(q + 1) * sy]
    else:
        w_pad = wre_scr.shape[0]                    # w_width + pad rows
        # pad rows (beyond loop A's writes) read as the matmul's
        # out-of-range zeros; scratch is uninitialized, so zero them
        if w_pad > w_width:
            wre_scr[w_width:w_pad, :] = jnp.zeros((w_pad - w_width, gc),
                                                  jnp.float32)
            wim_scr[w_width:w_pad, :] = jnp.zeros((w_pad - w_width, gc),
                                                  jnp.float32)
        wr4_re = wre_scr[...].reshape(w_pad // 4, 4, gc)
        wr4_im = wim_scr[...].reshape(w_pad // 4, 4, gc)

        def wslice(qi):
            a_, r_ = divmod(base + qi - 4, 4)       # static ints
            return (wr4_re[a_:a_ + sy, r_, :],
                    wr4_im[a_:a_ + sy, r_, :])

        for q in ([] if "nointerp" in ablate else range(7)):
            w_row = pc_scr[q:q + 1, :]
            tr_s, ti_s = wslice(q + 4)
            pr_s, pi_s = wslice(q)
            sym_re = sym_re + w_row * tr_s
            sym_im = sym_im + w_row * ti_s
            prv_re = prv_re + w_row * pr_s
            prv_im = prv_im + w_row * pi_s
    ur = jax.lax.broadcasted_iota(jnp.int32, (sy, gc), 0)
    tl = jax.lax.broadcasted_iota(jnp.int32, (sy, gc), 1)
    first = (ur == 0) & (tl % 128 == 0)
    prv_re = jnp.where(first, pc_scr[8:9, :], prv_re)
    prv_im = jnp.where(first, pc_scr[9:10, :], prv_im)

    # ---- batched DQPSK + bit planes (full-lane rows) ----
    dre = sym_re * prv_re + sym_im * prv_im
    dim_ = sym_im * prv_re - sym_re * prv_im
    if "nodq" in ablate:                 # WRONG VALUES: timing ablation
        soft0, soft1 = dim_, dre
    else:
        mag = jnp.sqrt(dre * dre + dim_ * dim_) + 1e-12
        soft0 = -dim_ / mag
        soft1 = -dre / mag
    flat = (sy * (tl % 128) + ur).astype(jnp.float32)
    nv_row = pc_scr[7:8, :]
    valid = flat < nv_row
    pm = jnp.where(valid & (dim_ < 0), 1.0, 0.0).astype(jnp.bfloat16)
    pl_b = jnp.where(valid & (dre < 0), 1.0, 0.0).astype(jnp.bfloat16)

    # ---- scan-input rows: inner-first sandwich; the per-carrier row
    # maps are I_G (x) B block-diagonals, so they run as BATCHED
    # matmuls over the (free) sublane regroup (G, 128, 128) with tiny
    # (G, Z, 128)-tiled B operands — the flat (G*Z, G*128) block
    # matrices cost more to stream from HBM every grid step than the
    # whole placement compute (perf/place_probe.py: 1 class 42.4 ms /
    # 5 classes 44.1 ms at bench shapes) ----
    def bdot(a, b_):
        return jax.lax.dot_general(
            a, b_, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    z = bdot(epad_ref[...],
             bt_scr[...].astype(jnp.bfloat16).reshape(g_count, tr, 128)
             ).reshape(g_count * z_rows, 128)        # (G*Z, Z128)
    place_fused = bh_place != "split"
    if place_fused and "place" not in ablate:
        # ONE depth-2SY matmul for all n_m classes x both bit planes
        # (the split form launched 2*n_m depth-SY matmuls at ~6% MXU
        # row utilization each); values identical — same 0/1 taps,
        # f32 accumulation
        pmpl = jnp.concatenate([pm, pl_b], axis=0)   # (2SY, GC)
        inner_all = jax.lax.dot_general(
            pmpl, fplace_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        for mi in range(n_m):
            inner = inner_all[:, mi * 128:(mi + 1) * 128]
            z = z + bdot(eplace_ref[mi],
                         inner.reshape(g_count, 128, 128)).reshape(
                             g_count * z_rows, 128)
    else:
        for mi in ([] if "place" in ablate else range(n_m)):
            cols = slice(mi * 128, (mi + 1) * 128)
            inner = (jax.lax.dot_general(
                pm, fplace_ref[0:sy, cols],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    pl_b, fplace_ref[sy:2 * sy, cols],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)) \
                .astype(jnp.bfloat16)                # (GC, 128)
            z = z + bdot(eplace_ref[mi],
                         inner.reshape(g_count, 128, 128)).reshape(
                             g_count * z_rows, 128)

    # ---- one batched even-position sync + CRC scan ----
    if "scan" in ablate:
        corr_all = z[0:g_count * z_rows - 2, 0:64] * 0.001
        err_all = corr_all + 1.0
    else:
        corr_all, err_all = _scan_rows(z, k3_ref, rsyn_ref, c0_ref,
                                       g_count * z_rows - 2)

    # ---- batched next-tail extraction (3 candidates) ----
    zb = z.astype(jnp.bfloat16).reshape(g_count, z_rows, 128)
    tails = []
    for d in range(3):
        # two sandwich pairs per candidate: slab d covers lanes with no
        # row carry (rho + l' < 128), slab d+3 the carried lanes
        acc = jnp.zeros((g_count * tr, 128), jnp.float32)
        for dd in ([] if "notails" in ablate else (d, d + 3)):
            t2 = bdot(etail_ref[dd], zb).reshape(
                g_count * tr, 128).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                t2, ftail_ref[dd],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        tails.append(acc)                            # (G*TR, 128)

    # ---- loop C: per-carrier output slices ----
    tmask = jnp.where(
        (128 * jax.lax.broadcasted_iota(jnp.int32, (tr, 128), 0)
         + jax.lax.broadcasted_iota(jnp.int32, (tr, 128), 1)) < tb,
        1.0, 0.0).astype(jnp.float32)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    m_last = flat == nv_row - 1.0
    # "noloopc" ablation: outputs left unwritten (garbage), timing only
    for g in ([] if "noloopc" in ablate else range(g_count)):
        c = i * g_count + g
        dsel = dsel_ref[c]
        corr_ref[g] = corr_all[g * z_rows:g * z_rows + z_rows - 2]
        err_ref[g] = jnp.round(
            err_all[g * z_rows:g * z_rows + z_rows - 2]).astype(
                jnp.int32)
        soft_ref[g, 0] = soft0[:, g * 128:(g + 1) * 128]
        soft_ref[g, 1] = soft1[:, g * 128:(g + 1) * 128]
        t_acc = jnp.zeros((tr, 128), jnp.float32)
        for d in range(3):
            t_acc = t_acc + jnp.where(dsel == d, 1.0, 0.0) * (
                tails[d][g * tr:(g + 1) * tr])
        bt2_ref[g] = t_acc * tmask
        ml = m_last[:, g * 128:(g + 1) * 128]
        pr = jnp.sum(jnp.where(ml, sym_re[:, g * 128:(g + 1) * 128],
                               0.0))
        pi_ = jnp.sum(jnp.where(ml, sym_im[:, g * 128:(g + 1) * 128],
                                0.0))
        misc_ref[g] = (jnp.where(lane1 == 0, pr, 0.0)
                       + jnp.where(lane1 == 1, pi_, 0.0))


def _bh_static_tables(group, tb, z_rows, tr, w_width, base, sy, k_max):
    """Numpy tables for the batched kernel (see _backhalf_kernel).

    The carrier-block-diagonal row maps are stored as (group, ...) TILED
    per-block matrices (every carrier's block is identical) and applied
    with batch-dimension dot_generals — a few hundred KB of operands
    instead of (G*Z, G*128) flats that dominate HBM traffic when
    streamed per grid step."""
    ms = [m for m in range(tb % 32 - 32, 128, 32) if m > -32]
    p_all = np.zeros((w_width, 11 * sy), np.float32)
    for qi in range(11):
        for u in range(sy):
            lam = base + 4 * u + qi - 4
            if 0 <= lam < w_width:
                p_all[lam, qi * sy + u] = 1.0
    # placement row map B[r, t'] = [tb + 32 t' == 128 r + m], tiled;
    # f_place flat layout (2*SY, n_m*128): rows [pm 0..SY) | pl SY..2SY),
    # column block mi — one fused depth-2SY matmul covers every class
    # and both bit planes (see _backhalf_kernel)
    e_place = np.zeros((len(ms), z_rows, 128), np.float32)
    f_place = np.zeros((2 * sy, len(ms) * 128), np.float32)
    for mi, m in enumerate(ms):
        for t in range(128):
            r, rem = divmod(tb + 32 * t - m, 128)
            if rem == 0 and 0 <= r < z_rows:
                e_place[mi, r, t] = 1.0
        for beta in range(2):
            for u in range(sy):
                ll = m + 2 * u + beta
                if 0 <= ll < 128:
                    f_place[beta * sy + u, mi * 128 + ll] = 1.0
    e_pad = np.zeros((z_rows, tr), np.float32)
    for q in range(tr):
        e_pad[q, q] = 1.0
    # next-tail extraction row maps (two slabs per candidate: carry /
    # no-carry lanes)
    e_tail = np.zeros((6, tr, z_rows), np.float32)
    f_tail = np.zeros((6, 128, 128), np.float32)
    for d in range(3):
        q, rho = divmod(2 * k_max - 4 + 2 * d, 128)
        for rp in range(tr):
            if q + rp < z_rows:
                e_tail[d, rp, q + rp] = 1.0
            if q + rp + 1 < z_rows:
                e_tail[3 + d, rp, q + rp + 1] = 1.0
        for lin in range(128):
            lp = lin - rho
            if 0 <= lp < 128:
                f_tail[d, lin, lp] = 1.0
            lp = lin + 128 - rho
            if 0 <= lp < 128:
                f_tail[3 + d, lin, lp] = 1.0
    tile = lambda a, axis: np.broadcast_to(
        np.expand_dims(a, axis), a.shape[:axis] + (group,)
        + a.shape[axis:]).copy()
    return {
        "p_all": p_all,
        "e_place": tile(e_place, 1),          # (n_m, G, Z, 128)
        "f_place": f_place,
        "e_pad": tile(e_pad, 0),              # (G, Z, TR)
        "e_tail": tile(e_tail, 1),            # (6, G, TR, Z)
        "f_tail": f_tail,
        "n_m": len(ms),
    }


_BH_TABLE_CACHE = {}


def fused_backhalf(y: jnp.ndarray, bt: jnp.ndarray, rr: jnp.ndarray,
                   rc: jnp.ndarray, sc: jnp.ndarray,
                   bsel: jnp.ndarray, dsel: jnp.ndarray,
                   k3: jnp.ndarray, rsyn: jnp.ndarray, c0: jnp.ndarray,
                   drop: int, k_max: int, group: int = 8,
                   interpret: bool = False) -> tuple:
    """Non-jitted entry for _fused_backhalf_impl: resolves the
    TETRAEAR_BH_{ABLATE,INTERP,PLACE,VMEM_MB} env knobs here and
    threads them through the jit cache as static args.  BH_VMEM_MB
    (default 64) is the kernel's scoped-VMEM ceiling — group=64 at
    C=20480 needs 91.08 MB (out_r5/breakdown_c20480_bhg64.log)."""
    return _fused_backhalf_impl(
        y, bt, rr, rc, sc, bsel, dsel, k3, rsyn, c0,
        drop=drop, k_max=k_max, group=group, interpret=interpret,
        bh_ablate_s=os.environ.get("TETRAEAR_BH_ABLATE", ""),
        bh_interp=os.environ.get("TETRAEAR_BH_INTERP", "slice"),
        bh_place=os.environ.get("TETRAEAR_BH_PLACE", "fused"),
        vmem_mb=int(os.environ.get("TETRAEAR_BH_VMEM_MB", "64")))


@partial(jax.jit, static_argnames=("drop", "k_max", "group",
                                   "interpret", "bh_ablate_s",
                                   "bh_interp", "bh_place", "vmem_mb"))
def _fused_backhalf_impl(y: jnp.ndarray, bt: jnp.ndarray,
                         rr: jnp.ndarray,
                         rc: jnp.ndarray, sc: jnp.ndarray,
                         bsel: jnp.ndarray, dsel: jnp.ndarray,
                         k3: jnp.ndarray, rsyn: jnp.ndarray,
                         c0: jnp.ndarray,
                         drop: int, k_max: int, group: int = 8,
                         interpret: bool = False,
                         bh_ablate_s: str = "", bh_interp: str = "slice",
                         bh_place: str = "fused",
                         vmem_mb: int = 64) -> tuple:
    """Fused timing + DQPSK + frame scan on raw band-synthesis planes.

    Args:
        y: (C, 2, 128, P) f32 raw band_synth output planes.
        bt: (C, TR, 128) f32 {0,1} carried tail-bit rows (TR=10, the
            1200 tail bits at positions 0..1199; rest zero).
        rr: (C, 2, 128, 1) f32 row ramp planes (per-block rotation and
            1/decim folded in).
        rc: (C, 2, 1, P) f32 lane ramp planes ((-1)^s folded in).
        sc: (C, 16) f32 per-carrier scalars: [c0..c3 Catmull-Rom
            coefficients, n_valid, prev_re, prev_im, tail_re 0..3,
            tail_im 0..3, 0].
        bsel: (C,) int32 tap base b in [0, 3].
        dsel: (C,) int32 tail-slide select in [0, 2].
        k3/rsyn/c0: the frame_scan_even tables
            (framescan._pallas_scan_tables).
        drop: channelizer overlap drop (samples; % 4 == 0, >= 8).
        k_max: padded symbol-slot count (n_out // 4 + 1).

    Returns (corr (C, M, 64) f32, err (C, M, 64) i32,
             soft (C, 2, SY, 128) f32, bt2 (C, TR, 128) f32,
             last (C, 2, 1, P) f32, misc (C, 1, 128) f32) where
    M = Z - 2 scan rows over the (tb + 2*128*SY + pad)-bit z layout,
    soft planes are [-d_im, -d_re]/|d| at plane index [u, t'] for
    symbol flat SY*t' + u (transposed, full-lane rows), last is the
    corrected final sample row and misc lanes
    0/1 the new previous-symbol state.

    Internally the kernel stacks the group's carriers along sublanes so
    bit placement / scan / tail extraction run as dense per-group
    matmuls (see _backhalf_kernel; the per-carrier formulation was MXU
    latency-bound).
    """
    c_n, _, _, p = y.shape
    sy = p // 4
    tr = bt.shape[1]
    if drop % 4 or drop < 8 or p % 4:
        raise ValueError(f"fused_backhalf needs drop % 4 == 0, "
                         f"drop >= 8, P % 4 == 0 (drop={drop}, P={p})")
    if k_max > 128 * sy:
        raise ValueError(f"k_max {k_max} exceeds symbol capacity "
                         f"{128 * sy}")
    tb = 1200
    z_rows = -(-(tb + 2 * 128 * sy + 256) // 128)
    m_rows = z_rows - 2
    if c_n % group:
        group = 1
    d0 = drop - 4
    q0 = d0 // p
    qmin = (d0 - 4) // p
    span = q0 + 2 - qmin
    w_width = span * p
    base = d0 - qmin * p
    # W scratch pad: the slice-form interpolation reads tap rows up to
    # base + 4*(sy-1) + 6; rows beyond loop A's w_width writes are
    # zeroed in-kernel (the selection matmul's out-of-range zeros)
    w_pad = -(-max(w_width, base + 4 * sy + 8) // 8) * 8
    key = (group, tb, z_rows, tr, w_width, base, sy, k_max)
    if key not in _BH_TABLE_CACHE:
        _BH_TABLE_CACHE[key] = _bh_static_tables(
            group, tb, z_rows, tr, w_width, base, sy, k_max)
    tabs = _BH_TABLE_CACHE[key]
    n_m = tabs["n_m"]
    gz, gc, gt = group * z_rows, group * 128, group * tr
    kern = partial(_backhalf_kernel, drop, k_max, tb, w_width, qmin,
                   bh_ablate_s, bh_interp, bh_place)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(c_n // group,),
            in_specs=[
                pl.BlockSpec((group, 2, 128, p),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, tr, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, 2, 128, 1),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, 2, 1, p),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, 16), lambda i, *_: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(k3.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(rsyn.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(c0.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_width, 11 * sy), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_m, group, z_rows, 128),
                             lambda i, *_: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * sy, n_m * 128),
                             lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, z_rows, tr),
                             lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, group, tr, z_rows),
                             lambda i, *_: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 128, 128), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((group, m_rows, 64),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, m_rows, 64),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, 2, sy, 128),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, tr, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, 2, 1, p),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, 1, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((w_pad, gc), jnp.float32),
                pltpu.VMEM((w_pad, gc), jnp.float32),
                pltpu.VMEM((16, gc), jnp.float32),
                pltpu.VMEM((gt, 128), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c_n, m_rows, 64), jnp.float32),
            jax.ShapeDtypeStruct((c_n, m_rows, 64), jnp.int32),
            jax.ShapeDtypeStruct((c_n, 2, sy, 128), jnp.float32),
            jax.ShapeDtypeStruct((c_n, tr, 128), jnp.float32),
            jax.ShapeDtypeStruct((c_n, 2, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((c_n, 1, 128), jnp.float32),
        ),
        # the batched scan intermediate ((G*Z, n_cols) f32) overflows the
        # 16 MB default scoped-vmem budget at group=8; v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(bsel, dsel, y, bt, rr, rc, sc, k3, rsyn, c0,
      jnp.asarray(tabs["p_all"]),
      jnp.asarray(tabs["e_place"], jnp.bfloat16),
      jnp.asarray(tabs["f_place"], jnp.bfloat16),
      jnp.asarray(tabs["e_pad"], jnp.bfloat16),
      jnp.asarray(tabs["e_tail"], jnp.bfloat16),
      jnp.asarray(tabs["f_tail"], jnp.bfloat16))


@partial(jax.jit, static_argnames=("group", "interpret"))
def frame_scan_even(bits: jnp.ndarray, k3: jnp.ndarray,
                    rsyn: jnp.ndarray, c0: jnp.ndarray,
                    group: int = 8, interpret: bool = False) -> tuple:
    """Even-position frame scan, fused in VMEM.

    The XLA even-position frame scan must materialize its 140-channel
    conv output to HBM (~2 GB bf16 at C=10240, ~20 ms/block); here
    each carrier's whole scan is one VMEM trip with only lane-aligned
    operations:

      * bits arrive pre-reshaped (C, R, 128) — rows of 128 bits;
      * a 3-row sliding window v3 (M, 384) is built from three
        128-aligned row slices (M = R - 2);
      * ONE (M, 384) x (384, n_cols) bf16 matmul evaluates the packed
        conv for all 16 within-row shifts t AND the ones/sync channel
        selections (k3's first three 128-lane blocks carry the
        ones / TS1 / TS2 rows at columns t*4 + i);
      * the CRC error count is a second matmul against the SIGNED
        selector rsyn = (1 - 2*c0)*rsyn0 plus the constant row
        c0 @ rsyn0, folding the expected-parity comparison into the
        contraction (|par - c0| = par*(1 - 2*c0) + c0 for par in
        {0,1}) while keeping the lane dim intact.

    Position mapping: out element [m, t*4 + i] is even bit position
    pe = 64*m + 4*t + i (bit p = 2*pe = 8*(16*m + t) + 2*i), so the
    (M, 64) planes flatten row-major to pe order.  All values are
    integer counts <= 237 — exact in bf16/f32 — so outputs are
    bit-identical to the XLA path.

    Args:
        bits: (C, R, 128) uint8 {0,1}; caller zero-pads columns so
            that 128*R >= n + 256 with at least 236 pad bits.
        k3: (384, n_cols) bf16 — [ones | TS1 | TS2 | conv] column blocks
            (framescan._pallas_scan_tables).
        rsyn: (n_cols, 128) bf16 — SIGNED {-1, 0, 1} syndrome selector
            (1 - 2*c0)*rsyn0, columns [forward 64 | reversed 64]
            indexed t*4 + i (rsyn0 is the 0/1 channel selector, c0 the
            expected CRC parity row — framescan._pallas_scan_tables).
        c0: (1, 128) f32 — the constant row c0 @ rsyn0 added after the
            rsyn matmul to complete the folded |par - c0| sum.

    Returns (corr (C, M, 64) f32, crc_err (C, M, 64) int32).
    """
    c, r, _ = bits.shape
    if c % group:
        group = 1
    m = r - 2
    return pl.pallas_call(
        _frame_scan_kernel,
        grid_spec=pl.GridSpec(
            grid=(c // group,),
            in_specs=[
                pl.BlockSpec((group, r, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(k3.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(rsyn.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(c0.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((group, m, 64), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, m, 64), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, m, 64), jnp.float32),
            jax.ShapeDtypeStruct((c, m, 64), jnp.int32),
        ),
        interpret=interpret,
    )(bits, k3, rsyn, c0)


# -- two-pass MXU wideband FFT -> natural-order planes ---------------------
#
# XLA's FFT formulations of the 2^25 forward transform are all HBM-pass
# bound: the monolithic FFT measures 27.4 ms/block, the four-step with
# batched sub-FFTs 17.4, and even a single batched (8, 2^22) transform
# 15.0 (perf/fft4step_probe.py) — ~36-90 GB/s effective against an
# ~800 GB/s part, because the backend emits many internal passes per
# sub-transform.  Here the whole transform is TWO passes over HBM:
#
#   pass 1 (grid over n1/128 column blocks of xm = x.reshape(n2, n1)):
#     the n2-point DFT over sublanes as a Cooley-Tukey pair of real
#     matmuls (n2 = 128 * A2), with the FACTORED four-step twiddle
#     w_N^{k2 i1} = At[k2, i1 % 64] * Bt[k2, i1 // 64] applied in the
#     same VMEM trip; writes G[k2, i1] planes.
#   pass 2 (grid over n2/128 column blocks of G): in-VMEM transpose to
#     (n1, 128 k2 lanes), the n1-point DFT over sublanes (n1 = 128*B2)
#     as the same matmul pair, and the output block written STRAIGHT
#     into the natural-order spectrum planes: out (2, n1 + wrap_k1, n2)
#     flattens row-major to X[n = k2 + n2*k1] including the wrap
#     extension rows (k1 = 0..wrap_k1-1 duplicated at the tail), i.e.
#     exactly the (2, R, 128) layout band_synth consumes, with no
#     XLA transpose / concat / stack passes in between.
#
# Value-bearing matmuls run at precision=HIGHEST (Mosaic's default
# multiplies in bf16; the transform feeds the channel filter, and the
# existing _wideband_fft contract is <= 1e-5 relative vs np.fft).

def _dftm_planes(n: int) -> np.ndarray:
    k = np.arange(n)
    m = np.exp(-2j * np.pi * np.outer(k, k) / n)
    return np.stack([m.real, m.imag]).astype(np.float32)


def _fft2p_tables(n1: int, n2: int) -> dict:
    """Host tables for fft2p_planes (cached per (n1, n2))."""
    n = n1 * n2
    a2 = n2 // 128
    b2 = n1 // 128
    k2v = np.arange(n2)
    w = -2j * np.pi / n
    at = np.exp(w * np.outer(k2v, np.arange(64)))          # (n2, 64)
    at2 = np.concatenate([at, at], axis=1)                 # (n2, 128)
    bt = np.exp(w * 64 * np.outer(k2v, np.arange(n1 // 64)))
    # per-column-block pair of Bt columns: q covers i1b = 2q, 2q+1;
    # layout (q, [re, im], n2, 2) so the kernel's (1, 2, n2, 2) block
    # slices one q
    bq = np.stack([bt[:, 2 * q:2 * q + 2]
                   for q in range(n1 // 128)])             # (n1/128, n2, 2)
    bq = np.stack([bq.real, bq.imag], axis=1)     # (n1/128, 2, n2, 2)
    # pass-1 inner/outer DFT matrices and CT twiddle for n2 = a2 * 128:
    # i2 = a2*iB + iA, k2 = kB + 128*kA
    w2 = np.exp(-2j * np.pi
                * np.outer(np.arange(128), np.arange(a2)) / n2)
    # pass-2: n1 = b2 * 128, i1 = b2*iB' + iA', k1 = kB' + 128*kA'
    w1 = np.exp(-2j * np.pi
                * np.outer(np.arange(128), np.arange(b2)) / n1)
    return {
        "at2": np.stack([at2.real, at2.imag]).astype(np.float32),
        "bq": bq.astype(np.float32),
        "f128": _dftm_planes(128),
        "fa2": _dftm_planes(a2),
        "fb2": _dftm_planes(b2),
        "w2": np.stack([w2.real, w2.imag]).astype(np.float32),
        "w1": np.stack([w1.real, w1.imag]).astype(np.float32),
    }


_FFT2P_TABLES = {}


def _fft2p_env() -> tuple:
    """Resolve the fft2p tuning env vars in the NON-jitted wrappers:
    (prec, ablate_s, split_dot, vmem_mb), threaded into the jitted
    entry points as STATIC arguments (round-4 advisor finding:
    trace-time env reads are invisible to the jit cache).  Scope: the
    wrappers execute at trace time of any enclosing outer jit, so a
    flip is honored by every NEW outer trace (fresh jit or process —
    the probe/bench pattern); an already-compiled outer callable keeps
    its executable regardless."""
    prec = os.environ.get("TETRAEAR_FFT2P_PREC", "high")
    ablate_s = os.environ.get("TETRAEAR_FFT2P_ABLATE", "")
    split_dot = os.environ.get("TETRAEAR_FFT2P_SPLIT_DOT") == "1"
    # scoped-VMEM ceiling for the fft2p pallas_calls.  The 2^27
    # geometry's pass 2 needs 123.3 MB of scoped VMEM (blocks carry the
    # whole n1 = 2^14 axis) and fails the default 100 MB guard — the
    # named compiler limit behind the round-4 "tpu_compile_helper exit
    # 1" envelope failure (perf/out_r5/).  v5e VMEM is 128 MB;
    # TETRAEAR_FFT2P_VMEM_MB=126 lets the 2^27 graph compile.
    vmem_mb = int(os.environ.get("TETRAEAR_FFT2P_VMEM_MB", "100"))
    return prec, ablate_s, split_dot, vmem_mb


def _ct_dot_select(prec, ablate_s):
    ablate = set(ablate_s.split(","))
    # default "high" (bf16x3): real-chip A/B planes2p 14.4 -> 12.4
    # ms/block at 2^25 vs "highest" (f32x6), accuracy 2.8e-5 max err
    # over RMS (perf/fft2p_prec_probe.py), scan verdicts identical on
    # goldens (test_fft2p_chan_raw_decisions_exact)
    dot = (_dot01 if "hp" in ablate
           else _dot_high if prec == "high" else _dot_hp)
    return dot, ablate


def _ct_dft_cols(tre, tim, a, f128, fsmall, wsm, prec, ablate_s):
    """(128*a, 128) tile -> n-point DFT over the SUBLANE axis (n=128*a),
    lanes ride along.  i = a*iB + iA (iA in [0, a)), k = kB + 128*kA;
    inner 128-DFT contracts iB, outer a-DFT contracts iA.  Returns
    (n, 128) planes with rows in k order."""
    dot, ablate = _ct_dot_select(prec, ablate_s)
    w = tre.shape[1]                     # lane width (any multiple of 128)
    # inner: S[kB, (iA, l)] = sum_iB F128[kB, iB] T[(iB, iA), l]
    t2re = tre.reshape(128, a * w)
    t2im = tim.reshape(128, a * w)
    f128re = f128[0]
    f128im = f128[1]
    sre = (dot(f128re, t2re) - dot(f128im, t2im))
    sim = (dot(f128re, t2im) + dot(f128im, t2re))  # (128, a*w)
    return _ct_dft_cols_tail(sre, sim, a, w, fsmall, wsm, dot, ablate)


def _ct_dft_cols_tail(sre, sim, a, w, fsmall, wsm, dot, ablate):
    n = 128 * a
    # CT twiddle w_n^{iA kB}: broadcast over lanes
    s3re = sre.reshape(128, a, w)
    s3im = sim.reshape(128, a, w)
    if "notw" in ablate:
        ure, uim = s3re, s3im
    else:
        wre = wsm[0][:, :, None]
        wim = wsm[1][:, :, None]
        ure = s3re * wre - s3im * wim
        uim = s3re * wim + s3im * wre
    # outer: contract iA; relayout so iA is the leading (sublane) axis
    if "noxpose" in ablate:              # WRONG VALUES: timing ablation
        u2re = ure.reshape(a, 128 * w)
        u2im = uim.reshape(a, 128 * w)
    else:
        u2re = jnp.transpose(ure, (1, 0, 2)).reshape(a, 128 * w)
        u2im = jnp.transpose(uim, (1, 0, 2)).reshape(a, 128 * w)
    fare = fsmall[0]
    faim = fsmall[1]
    vre = (dot(fare, u2re) - dot(faim, u2im))
    vim = (dot(fare, u2im) + dot(faim, u2re))      # (a, 128*w)
    # rows (kA, kB) flatten to k = 128*kA + kB
    return (vre.reshape(n, w), vim.reshape(n, w))


def _fft2p_pass1_core(n2a, prec, ablate_s, xre, xim, bq_ref, at2_ref,
                      f128_ref, fa_ref, w2_ref, g_ref):
    vre, vim = _ct_dft_cols(xre, xim, n2a, f128_ref, fa_ref, w2_ref,
                            prec, ablate_s)
    _fft2p_pass1_finish(vre, vim, bq_ref, at2_ref, g_ref)


def _fft2p_pass1_finish(vre, vim, bq_ref, at2_ref, g_ref):
    # four-step twiddle w_N^{k2 i1}: At lane part x Bt half select,
    # one 128-lane tile at a time (At repeats every 64 lanes; Bt
    # columns 2q'+0/1 live in bq row q' = i1 // 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (vre.shape[0], 128), 1)
    twre = at2_ref[0]
    twim = at2_ref[1]                                # (n2, 128)
    for t in range(vre.shape[1] // 128):
        vr = vre[:, 128 * t:128 * (t + 1)]
        vi = vim[:, 128 * t:128 * (t + 1)]
        bre = jnp.where(lane < 64, bq_ref[t, 0, :, 0:1],
                        bq_ref[t, 0, :, 1:2])
        bim = jnp.where(lane < 64, bq_ref[t, 1, :, 0:1],
                        bq_ref[t, 1, :, 1:2])
        wre = twre * bre - twim * bim
        wim = twre * bim + twim * bre
        g_ref[0, :, 128 * t:128 * (t + 1)] = vr * wre - vi * wim
        g_ref[1, :, 128 * t:128 * (t + 1)] = vr * wim + vi * wre


def _fft2p_pass1_kernel(n2a, prec, ablate_s, x_ref, bq_ref, at2_ref,
                        f128_ref, fa_ref, w2_ref, g_ref):
    _fft2p_pass1_core(n2a, prec, ablate_s, x_ref[0], x_ref[1], bq_ref,
                      at2_ref, f128_ref, fa_ref, w2_ref, g_ref)


def _fft2p_pass1_spliced_kernel(n2a, prec, ablate_s, split_dot,
                                t_ref, x_ref, bq_ref, at2_ref,
                                f128_ref, fa_ref, w2_ref, g_ref):
    """Pass 1 with the overlap-save tail spliced IN-KERNEL: the carried
    tail rows (2, o2, W) and the fresh block rows (2, n2 - o2, W) arrive
    as separate inputs and concatenate in VMEM — o2 is 8-sublane-aligned
    (channelizer rounds the overlap up to a multiple of 8*n1), so the
    concat is pure block copies.  Replaces the XLA glue (r2c + tail
    concat + re/im plane stack = three full HBM passes over the block,
    4.7 ms/block at 2^25 — perf/fft2p_stage_probe.py).

    TETRAEAR_FFT2P_SPLIT_DOT=1 (A/B): when the tail covers whole
    inner-DFT contraction rows (o2 % a2 == 0, small k = o2/a2), skip
    the concat entirely — contract the block piece against the
    lane-sliced DFT matrix and add the k tail rows as outer-product
    broadcasts.  NOT bitwise-equal to the concat form (the tail terms
    accumulate in f32 after the dot instead of inside it, and skip the
    bf16 split); verdict-level exact."""
    o2 = t_ref.shape[1]
    k = o2 // n2a
    if split_dot and o2 % n2a == 0 and 1 <= k <= 8:
        dot, ablate = _ct_dot_select(prec, ablate_s)
        w = x_ref.shape[2]
        aw = n2a * w
        t2re = t_ref[0].reshape(k, aw)
        t2im = t_ref[1].reshape(k, aw)
        x2re = x_ref[0].reshape(128 - k, aw)
        x2im = x_ref[1].reshape(128 - k, aw)
        f128re = f128_ref[0]
        f128im = f128_ref[1]
        fxre = f128re[:, k:]                    # (128, 128-k)
        fxim = f128im[:, k:]
        sre = dot(fxre, x2re) - dot(fxim, x2im)
        sim = dot(fxre, x2im) + dot(fxim, x2re)
        for j in range(k):
            fr = f128re[:, j:j + 1]             # (128, 1) broadcast
            fi = f128im[:, j:j + 1]
            tr = t2re[j:j + 1, :]
            ti = t2im[j:j + 1, :]
            sre = sre + fr * tr - fi * ti
            sim = sim + fr * ti + fi * tr
        vre, vim = _ct_dft_cols_tail(sre, sim, n2a, w, fa_ref, w2_ref,
                                     dot, ablate)
        _fft2p_pass1_finish(vre, vim, bq_ref, at2_ref, g_ref)
        return
    xre = jnp.concatenate([t_ref[0], x_ref[0]], axis=0)
    xim = jnp.concatenate([t_ref[1], x_ref[1]], axis=0)
    _fft2p_pass1_core(n2a, prec, ablate_s, xre, xim, bq_ref, at2_ref,
                      f128_ref, fa_ref, w2_ref, g_ref)


def _fft2p_pass2_kernel(n1b, wrap_k1, prec, ablate_s, g_ref, fb_ref,
                        f128_ref, w1_ref, out_ref):
    ablate = set(ablate_s.split(","))
    n1 = 128 * n1b
    if "noxpose2" in ablate:             # WRONG VALUES: timing ablation
        gre = g_ref[0].reshape(n1, -1)
        gim = g_ref[1].reshape(n1, -1)
    else:
        gre = g_ref[0].T                             # (n1, R) relayout
        gim = g_ref[1].T
    vre, vim = _ct_dft_cols(gre, gim, n1b, f128_ref, fb_ref, w1_ref,
                            prec, ablate_s)
    out_ref[0, 0:n1, :] = vre
    out_ref[1, 0:n1, :] = vim
    if wrap_k1:
        out_ref[0, n1:n1 + wrap_k1, :] = vre[0:wrap_k1, :]
        out_ref[1, n1:n1 + wrap_k1, :] = vim[0:wrap_k1, :]


def fft2p_planes(planes_in: jnp.ndarray, n1: int, n2: int,
                 wrap_k1: int = 0, cols: int = 128, rows2: int = 128,
                 interpret: bool = False):
    """Two-pass MXU FFT: (2, n2, n1) planes of x.reshape(n2, n1) ->
    (2, (n1 + wrap_k1) * n2 / 128, 128) natural-order spectrum planes
    (rows of 128 consecutive bins; rows n1*n2/128.. replay bins
    0..wrap_k1*n2 — the overlap-save wrap extension).

    Requires n1 % 128 == 0, n2 % 128 == 0 (true for every nfft >= 2^14
    with the channelizer's n1 = 2^ceil(log2(nfft)/2) split) and
    wrap_k1 <= n1.

    Non-jitted entry: the TETRAEAR_FFT2P_{PREC,ABLATE} env knobs are
    resolved here and passed to the jitted impl as STATIC args; a flip
    is honored by any new outer trace (see _fft2p_env on scope)."""
    prec, ablate_s, _, vmem_mb = _fft2p_env()
    return _fft2p_planes_impl(planes_in, n1, n2, wrap_k1, cols, rows2,
                              interpret, prec, ablate_s, vmem_mb)


@partial(jax.jit, static_argnames=("n1", "n2", "wrap_k1", "cols",
                                   "rows2", "interpret", "prec",
                                   "ablate_s", "vmem_mb"))
def _fft2p_planes_impl(planes_in: jnp.ndarray, n1: int, n2: int,
                       wrap_k1: int, cols: int, rows2: int,
                       interpret: bool, prec: str, ablate_s: str,
                       vmem_mb: int = 100):
    if n1 % 128 or n2 % 128:
        raise ValueError(f"fft2p needs 128 | n1, n2 (got {n1}, {n2})")
    if cols % 128 or n1 % cols or rows2 % 128 or n2 % rows2:
        raise ValueError(f"fft2p grid blocks: need 128 | cols | n1 and "
                         f"128 | rows2 | n2 (got {cols}, {rows2})")
    key = (n1, n2)
    if key not in _FFT2P_TABLES:
        _FFT2P_TABLES[key] = _fft2p_tables(n1, n2)
    t = _FFT2P_TABLES[key]
    a2 = n2 // 128
    b2 = n1 // 128

    g = pl.pallas_call(
        partial(_fft2p_pass1_kernel, a2, prec, ablate_s),
        grid_spec=pl.GridSpec(
            grid=(n1 // cols,),
            in_specs=[
                pl.BlockSpec((2, n2, cols), lambda q: (0, 0, q),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cols // 128, 2, n2, 2),
                             lambda q: (q, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n2, 128), lambda q: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128, 128), lambda q: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, a2, a2), lambda q: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128, a2), lambda q: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, n2, cols), lambda q: (0, 0, q),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((2, n2, n1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(planes_in,
      jnp.asarray(t["bq"]),
      jnp.asarray(t["at2"]),
      jnp.asarray(t["f128"]), jnp.asarray(t["fa2"]),
      jnp.asarray(t["w2"]))
    return _fft2p_pass2_call(g, t, n1, n2, wrap_k1, rows2, interpret,
                             prec, ablate_s, vmem_mb)


def fft2p_planes_spliced(tail_p: jnp.ndarray, x_p: jnp.ndarray,
                         n1: int, n2: int,
                         wrap_k1: int = 0, cols: int = 128,
                         rows2: int = 128, interpret: bool = False):
    """fft2p_planes with the overlap-save window assembled IN pass 1:
    tail_p (2, o2, n1) carried-tail rows + x_p (2, n2 - o2, n1) fresh
    block rows (both planar f32, rows in sample order) -> identical
    output planes to fft2p_planes(stack(concat)).  Requires
    o2 % 8 == 0 (the channelizer aligns the overlap; see
    _fft2p_pass1_spliced_kernel) — saves the three XLA glue passes over
    the 268 MB block.

    Non-jitted entry: resolves TETRAEAR_FFT2P_{PREC,ABLATE,SPLIT_DOT}
    and passes them to the jitted impl as STATIC args (see
    fft2p_planes)."""
    prec, ablate_s, split_dot, vmem_mb = _fft2p_env()
    return _fft2p_planes_spliced_impl(tail_p, x_p, n1, n2, wrap_k1,
                                      cols, rows2, interpret, prec,
                                      ablate_s, split_dot, vmem_mb)


@partial(jax.jit, static_argnames=("n1", "n2", "wrap_k1", "cols",
                                   "rows2", "interpret", "prec",
                                   "ablate_s", "split_dot", "vmem_mb"))
def _fft2p_planes_spliced_impl(tail_p: jnp.ndarray, x_p: jnp.ndarray,
                               n1: int, n2: int, wrap_k1: int,
                               cols: int, rows2: int, interpret: bool,
                               prec: str, ablate_s: str,
                               split_dot: bool, vmem_mb: int = 100):
    if n1 % 128 or n2 % 128:
        raise ValueError(f"fft2p needs 128 | n1, n2 (got {n1}, {n2})")
    if cols % 128 or n1 % cols or rows2 % 128 or n2 % rows2:
        raise ValueError(f"fft2p grid blocks: need 128 | cols | n1 and "
                         f"128 | rows2 | n2 (got {cols}, {rows2})")
    o2 = tail_p.shape[1]
    if o2 % 8 or tail_p.shape != (2, o2, n1) \
            or x_p.shape != (2, n2 - o2, n1):
        raise ValueError(
            f"spliced fft2p: tail {tail_p.shape} / x {x_p.shape} must "
            f"be (2, o2, {n1}) + (2, {n2} - o2, {n1}) with 8 | o2")
    key = (n1, n2)
    if key not in _FFT2P_TABLES:
        _FFT2P_TABLES[key] = _fft2p_tables(n1, n2)
    t = _FFT2P_TABLES[key]
    a2 = n2 // 128

    g = pl.pallas_call(
        partial(_fft2p_pass1_spliced_kernel, a2, prec, ablate_s,
                split_dot),
        grid_spec=pl.GridSpec(
            grid=(n1 // cols,),
            in_specs=[
                pl.BlockSpec((2, o2, cols), lambda q: (0, 0, q),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n2 - o2, cols), lambda q: (0, 0, q),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cols // 128, 2, n2, 2),
                             lambda q: (q, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n2, 128), lambda q: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128, 128), lambda q: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, a2, a2), lambda q: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128, a2), lambda q: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, n2, cols), lambda q: (0, 0, q),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((2, n2, n1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(tail_p, x_p,
      jnp.asarray(t["bq"]),
      jnp.asarray(t["at2"]),
      jnp.asarray(t["f128"]), jnp.asarray(t["fa2"]),
      jnp.asarray(t["w2"]))
    return _fft2p_pass2_call(g, t, n1, n2, wrap_k1, rows2, interpret,
                             prec, ablate_s, vmem_mb)


def _fft2p_pass2_call(g, t, n1, n2, wrap_k1, rows2, interpret,
                      prec, ablate_s, vmem_mb=100):
    # pass-1 emitted G as (2, n2 k2, n1 i1); pass 2 slices 128-lane k2
    # column blocks of its TRANSPOSE via an input block on the k2 axis
    b2 = n1 // 128
    out = pl.pallas_call(
        partial(_fft2p_pass2_kernel, b2, wrap_k1, prec, ablate_s),
        grid_spec=pl.GridSpec(
            grid=(n2 // rows2,),
            in_specs=[
                pl.BlockSpec((2, rows2, n1), lambda c: (0, c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, b2, b2), lambda c: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128, 128), lambda c: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128, b2), lambda c: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, n1 + wrap_k1, rows2),
                                   lambda c: (0, 0, c),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((2, n1 + wrap_k1, n2),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(g, jnp.asarray(t["fb2"]), jnp.asarray(t["f128"]),
      jnp.asarray(t["w1"]))
    rows = (n1 + wrap_k1) * n2 // 128
    return out.reshape(2, rows, 128)
