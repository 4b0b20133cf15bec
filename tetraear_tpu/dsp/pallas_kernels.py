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

from functools import partial

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

def _band_synth_kernel(row_ref, d_ref, planes_hbm, h1_hbm,
                       m1c_ref, m2re_ref, m2im_ref, twre_ref, twim_ref,
                       out_ref, nat_scr, h1_scr, sem_n, sem_h):
    i = pl.program_id(0)
    g_count = out_ref.shape[0]
    p = nat_scr.shape[2]

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
        h1_dma(g).start()

    for g in range(g_count):
        nat_dma(g).wait()
        h1_dma(g).wait()
        nre = nat_scr[g, 0]
        nim = nat_scr[g, 1]
        hre = h1_scr[g, 0]
        him = h1_scr[g, 1]
        bre = nre * hre - nim * him                  # (P, 128)
        bim = nre * him + nim * hre
        a = jnp.concatenate([bre, bim], axis=0)      # (2P, 128)
        t2 = jax.lax.dot_general(
            a, m1c_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (128 l, 2P)
        tre = t2[:, :p]
        tim = t2[:, p:]
        twre = twre_ref[:]
        twim = twim_ref[:]
        ure = tre * twre - tim * twim                # (128 l, P s)
        uim = tre * twim + tim * twre
        u2 = jnp.concatenate([ure, uim], axis=1)     # (128, 2P)
        u2s = jnp.concatenate([-uim, ure], axis=1)
        y2 = (jnp.dot(m2re_ref[:], u2,
                      preferred_element_type=jnp.float32)
              + jnp.dot(m2im_ref[:], u2s,
                        preferred_element_type=jnp.float32))
        out_ref[g, 0] = y2[:, :p]                    # Y_re (128 t, P s)
        out_ref[g, 1] = y2[:, p:]


@partial(jax.jit,
         static_argnames=("rows_per_band", "group", "interpret"))
def band_synth(planes: jnp.ndarray, h1_planes: jnp.ndarray,
               row_starts: jnp.ndarray, d_shift: jnp.ndarray,
               m1c: jnp.ndarray, m2re: jnp.ndarray, m2im: jnp.ndarray,
               twre: jnp.ndarray, twim: jnp.ndarray,
               rows_per_band: int, group: int = 8,
               interpret: bool = False) -> jnp.ndarray:
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
    """
    c = row_starts.shape[0]
    if c % group:
        group = 1
    p = rows_per_band
    return pl.pallas_call(
        _band_synth_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(c // group,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),       # planes (HBM)
                pl.BlockSpec(memory_space=pl.ANY),       # h1 (HBM)
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
            out_specs=pl.BlockSpec((group, 2, 128, p),
                                   lambda i, *_: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((group, 2, p, 128), jnp.float32),
                pltpu.VMEM((group, 2, p, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((group,)),
                pltpu.SemaphoreType.DMA((group,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((c, 2, 128, p), jnp.float32),
        interpret=interpret,
    )(row_starts, d_shift, planes, h1_planes, m1c, m2re, m2im, twre,
      twim)
