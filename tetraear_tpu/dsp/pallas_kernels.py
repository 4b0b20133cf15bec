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
