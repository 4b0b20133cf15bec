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

def _frame_scan_kernel(bits_ref, k3_ref, rsyn_ref, c0_ref,
                       out_c_ref, out_e_ref):
    g_count = bits_ref.shape[0]
    m = out_c_ref.shape[1]
    from tetraear_tpu.dsp import framescan as _fs
    zs = _fs._SYNC_ZEROS.astype(float)

    for g in range(g_count):
        # Mosaic has no u8 -> bf16 cast; hop via i32/f32
        base_i = bits_ref[g].astype(jnp.int32)       # (R, 128) {0,1}
        # slices at row offsets 0/1/2 have mismatched sublane offsets
        # (Mosaic rejects the concat); realign with rolls first.  The
        # rotate unit is 32-bit only, so roll in i32 and cast after.
        r_rows = base_i.shape[0]
        b1_i = pltpu.roll(base_i, shift=r_rows - 1, axis=0)
        b2_i = pltpu.roll(base_i, shift=r_rows - 2, axis=0)

        def to_bf16(v):
            return v.astype(jnp.float32).astype(jnp.bfloat16)

        # [base | b1 | b2] @ k3 done as three row-block matmuls — a
        # lane concat of the rolled operands trips Mosaic's layout
        # inference, and matmul operands relayout cleanly anyway
        out = (jnp.dot(to_bf16(base_i[0:m]), k3_ref[0:128],
                       preferred_element_type=jnp.float32)
               + jnp.dot(to_bf16(b1_i[0:m]), k3_ref[128:256],
                         preferred_element_type=jnp.float32)
               + jnp.dot(to_bf16(b2_i[0:m]), k3_ref[256:384],
                         preferred_element_type=jnp.float32))
        ones = out[:, 0:64]                          # [t*4 + i]
        s1 = out[:, 128:192]
        s2 = out[:, 256:320]
        par = out - 2.0 * jnp.floor(out * 0.5)
        syn = jnp.abs(par - c0_ref[:])
        e = jnp.dot(syn.astype(jnp.bfloat16), rsyn_ref[:],
                    preferred_element_type=jnp.float32)    # (M, 128)
        e_fwd = e[:, 0:64]
        e_rev = e[:, 64:128]
        corr = jnp.maximum(s1 + zs[0], s2 + zs[1]) * jnp.float32(
            1.0 / _fs.SYNC_LEN)
        err = jnp.minimum(e_fwd, e_rev)
        deg = (ones == 0.0) | (ones == float(_fs.DATA_BITS))
        err = jnp.where(deg, jnp.float32(99), err)
        # element [m, t*4 + i] is even position pe = 64*m + 4*t + i;
        # the (M, 64) row-major flatten outside is exactly pe order
        out_c_ref[g] = corr
        out_e_ref[g] = jnp.round(err).astype(jnp.int32)


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
      * ONE (M, 384) x (384, 2624) bf16 matmul evaluates the packed
        conv for all 16 within-row shifts t AND the ones/sync channel
        selections (k3's first three 128-lane blocks carry the
        ones / TS1 / TS2 rows at columns t*4 + i);
      * the CRC syndrome reduction is a second matmul against a 0/1
        row-selector (rsyn), keeping the lane dim intact.

    Position mapping: out element [m, t*4 + i] is even bit position
    pe = 64*m + 4*t + i (bit p = 2*pe = 8*(16*m + t) + 2*i), so the
    (M, 64) planes flatten row-major to pe order.  All values are
    integer counts <= 237 — exact in bf16/f32 — so outputs are
    bit-identical to the XLA path.

    Args:
        bits: (C, R, 128) uint8 {0,1}; caller zero-pads columns so
            that 128*R >= n + 256 with at least 236 pad bits.
        k3: (384, 2624) bf16 — [ones | TS1 | TS2 | conv] column blocks
            (framescan._pallas_scan_tables).
        rsyn: (2624, 128) bf16 — syndrome row-selector, columns
            [forward 64 | reversed 64] indexed t*4 + i.
        c0: (1, 2624) f32 — expected CRC parity per conv column.

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
                pl.BlockSpec((384, 2624), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2624, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2624), lambda i: (0, 0),
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
