"""Overlap-save FFT channelizer: all carriers from one wideband FFT.

The conv frontend (kernels.nco_mix + first polyphase stage) costs
O(C x N) at the full input rate — fine for tens of carriers, ruinous for
thousands.  This frontend computes ONE forward FFT of the wideband block
and extracts every carrier as a band of bins:

    x (N+V,) --FFT--> X (nfft,) --band gather + H1 + IFFT--> (C, nfft/25)

per-carrier cost collapses to a small IFFT at the channel rate (96 kHz),
so total work is O(N log N + C * N/25): the 10k-carrier roofline kernel
(SURVEY.md section 7, BASELINE configs 3-5).

Correctness notes:
  * The extraction applies the channel-select lowpass in the frequency
    domain (h1 FFT'd at the full rate, sampled at band-relative bins), so
    this is an exact overlap-save realization of conv(x, h1) followed by
    perfect decimation by 25; the circular-wrap corrupt region is
    (len(h1)-1)/25 output samples, covered by the V-sample input overlap.
  * Extracting a band re-references phase to each block's start; a
    per-block phase correction with exact integer cycle counters
    (< nfft < 2^24, exact in float32) restores global phase continuity so
    downstream filter state carries across blocks.
  * Carrier offsets must be integer multiples of fs/nfft (10 Hz at the
    canonical 2.4 Msps / 239200-sample block).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tetraear_tpu.dsp import design

CHANNEL_RATE = 96_000.0      # per-carrier output rate
DECIM = 25                   # canonical decimation at fs = 2.4 Msps


class FFTChannelizer:
    """Streaming overlap-save channelizer fs -> 96 kHz per carrier.

    decim = fs / 96 kHz (any integer: 25 at 2.4 Msps, 320 at 30.72 Msps
    for config-5-scale wideband captures); overlap scales with decim.
    """

    def __init__(self, fs: float, freqs_hz: np.ndarray, block_len: int):
        self.fs = float(fs)
        self.freqs_hz = np.asarray(freqs_hz, np.float64)
        decim = int(round(self.fs / CHANNEL_RATE))
        if abs(self.fs - decim * CHANNEL_RATE) > 1e-6:
            raise ValueError(
                f"fs {fs} must be an integer multiple of {CHANNEL_RATE}")
        self.decim = decim
        # halo >= len(h1); h1 length scales with fs so 32*decim always
        # covers it, and block=9568*decim keeps the bin grid at 10 Hz
        self.overlap = 32 * decim
        if block_len % (decim * 16):
            raise ValueError(f"block_len {block_len} must be a multiple of "
                             f"{decim * 16}")
        self.block_len = block_len                    # new samples per step
        self.nfft = block_len + self.overlap
        self.n_band = self.nfft // decim              # channel FFT size
        self.out_rate = self.fs / decim               # 96 kHz
        self.drop = self.overlap // decim             # corrupt head samples
        self.n_out = block_len // decim               # valid per step

        bin_hz = self.fs / self.nfft
        k = self.freqs_hz / bin_hz
        if not np.allclose(k, np.round(k), atol=1e-6):
            raise ValueError(
                f"carrier offsets must be multiples of {bin_hz:.3f} Hz "
                f"for block_len={block_len}")
        self.k_c = np.round(k).astype(np.int64)       # (C,) centre bins

        # channel-select lowpass at the input rate; stopband before the
        # band edge so the decimation cannot fold interference in
        h1 = design.kaiser_lowpass(13_000.0,
                                   self.out_rate / 2 - 13_000.0 - 1_000.0,
                                   self.fs, atten_db=60.0)
        if len(h1) > self.overlap:
            raise ValueError(f"h1 length {len(h1)} exceeds overlap "
                             f"{self.overlap}")
        self.h1_len = len(h1)
        H1 = np.fft.fft(h1, self.nfft)
        j = np.arange(self.n_band)
        j_signed = np.where(j < self.n_band // 2, j, j - self.n_band)
        self.h1_band = H1[j_signed % self.nfft].astype(np.complex64)
        # band gather indices per carrier: (C, n_band)
        self.band_idx = ((self.k_c[:, None] + j_signed[None, :])
                         % self.nfft).astype(np.int32)

        # per-block phase-correction cycle step: (k_c * block_len) mod nfft
        self.cycle_step = ((self.k_c % self.nfft)
                           * (block_len % self.nfft) % self.nfft).astype(
                               np.float32)            # exact ints < 2^24

    def init_state(self) -> dict:
        return {
            "tail": jnp.zeros((self.overlap, 2), jnp.float32),
            "cycles": jnp.zeros((len(self.k_c),), jnp.float32),
        }

    def step(self, x: jnp.ndarray, state: dict) -> tuple:
        """x: (block_len,) complex64 new wideband samples.

        Returns ((C, n_out) complex64 channel blocks @ fs/25, new_state).
        """
        from tetraear_tpu.dsp import kernels

        tail = kernels.r2c(state["tail"])
        xx = jnp.concatenate([tail, x])               # (nfft,)
        X = jnp.fft.fft(xx)
        band = X[jnp.asarray(self.band_idx)]          # (C, n_band)
        band = band * jnp.asarray(self.h1_band)[None, :]
        y = jnp.fft.ifft(band, axis=1) / self.decim   # (C, n_band) @ 96k
        y = y[:, self.drop:self.drop + self.n_out]

        # restore global phase continuity (see module docstring)
        nfft_f = jnp.float32(self.nfft)
        ang = state["cycles"] * jnp.float32(2.0 * np.pi) / nfft_f
        rot = jax.lax.complex(jnp.cos(ang), -jnp.sin(ang))
        y = y * rot[:, None]
        new_cycles = jnp.mod(state["cycles"] + jnp.asarray(self.cycle_step),
                             nfft_f)
        new_state = {
            "tail": kernels.c2r(xx[xx.shape[0] - self.overlap:]),
            "cycles": new_cycles,
        }
        return y.astype(jnp.complex64), new_state
