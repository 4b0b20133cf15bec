"""Pallas TPU kernels: dynamic-start band extraction (reference).

band_extract issues one dynamic-start DMA per carrier (HBM -> VMEM) to
pull a contiguous band out of the wrap-extended spectrum, scalar-
prefetching the per-carrier start bins.

STATUS: superseded in production by the aligned row-gather path in
dsp/channelizer.py — when carrier starts are 128-bin aligned (the
12.5+25 kHz grid at fs in the 10.24 MHz * 2^j family) a plain row gather
of the (nfft/128, 128)-reshaped spectrum is ~16x faster than the element
gather and needs no custom kernel.  This kernel remains for UNALIGNED
starts, but note the Mosaic constraint hit on v5e: the slice's minor
dimension must be a multiple of the 128-lane tiling, so the (n_band, 2)
[re, im] layout used here fails to compile on hardware ("Slice shape
along dimension 1 must be aligned to tiling (128), but is 2"); a
hardware-ready variant needs the spectrum stored as separate re/im
planes reshaped to (-1, 128) with 128-aligned dynamic row starts.
Validated in interpreter mode (tests/unit/test_channelizer.py).
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
