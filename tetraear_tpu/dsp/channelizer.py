"""Overlap-save FFT channelizer: all carriers from one wideband FFT.

The conv frontend (kernels.nco_mix + first polyphase stage) costs
O(C x N) at the full input rate — fine for tens of carriers, ruinous for
thousands.  This frontend computes ONE forward FFT of the wideband block
and extracts every carrier as a band of bins:

    x (nfft,) --FFT--> X --band gather + H1 + IFFT--> (C, n_band) @ fs/D

per-carrier cost collapses to a small IFFT at the channel rate, so total
work is O(N log N + C * N/D): the 10k-carrier roofline kernel
(SURVEY.md section 7, BASELINE configs 3-5).

TPU-critical sizing: **nfft and n_band are powers of two.**  The TPU XLA
backend lowers odd-radix DFT factors to dense DFT-matrix matmuls (a
689k-point FFT tried to allocate a 1.9 TB matrix); pow2 sizes run in ~5 ms
at 2^20.  Consequences of pow2 sizing:

  * decim = 2^m with fs/decim in [60, 150] kHz; the polyphase back half
    resamples the odd channel rate (75/120/... kHz) to 72 kHz.
  * carrier offsets are rounded to the nearest FFT bin (<= fs/2nfft,
    ~4.6 Hz).  A few Hz of residual offset rotates the constellation once
    every ~0.2 s — invisible to differential demod (0.002 rad/symbol) —
    so no residual NCO is needed.

Other correctness notes:
  * The channel-select lowpass h1 is applied in the frequency domain
    (FFT of h1 sampled at band-relative bins), making the extraction an
    exact overlap-save of conv(x, h1) + decimation; the circular-wrap
    corrupt region ((len(h1)-1)/decim output samples) is covered by the
    overlap.
  * Band extraction re-references phase to each block's start; a per-block
    rotation with exact integer cycle counters (< nfft <= 2^22, exact in
    float32 up to 2^24) restores global phase continuity so downstream
    filter state carries across blocks.
"""

from __future__ import annotations

import math
import os

import numpy as np

import jax
import jax.numpy as jnp

from tetraear_tpu.dsp import design

TARGET_CHANNEL_RATE = 96_000.0


def choose_decim(fs: float) -> int:
    """Power-of-two decimation keeping the channel rate in [72k, 160k],
    preferring the rate whose 72 kHz resample ratio has the smallest
    polyphase interpolation factor (each of the L sub-filters becomes a
    separate conv in the back half; L in the hundreds would bloat the
    compiled step).  fs = 72 kHz * 2^m yields L = 1 (no back stage)."""
    from fractions import Fraction
    best, best_l = None, 1 << 30
    d = 1
    while fs / d > 160_000.0:
        d *= 2
    while fs / d >= 72_000.0:
        rate = fs / d
        if abs(rate - round(rate)) < 1e-6:
            frac = Fraction(72_000, int(round(rate)))
            # prefer fewer sub-filters; on ties, the lower channel rate
            if frac.numerator <= best_l:
                best, best_l = d, frac.numerator
        d *= 2
    if best is None or best_l > 64:
        raise ValueError(
            f"no power-of-two channel rate from fs={fs:g} gives a "
            f"tractable 72 kHz resample ratio (best L={best_l}); use an "
            f"fs of the form 72000*2^m (e.g. 2.304/4.608/9.216/36.864 "
            f"MHz) or a standard SDR rate like 2.4 Msps")
    return best


def choose_nfft(fs: float) -> int:
    """Smallest power of two covering ~0.1 s of input."""
    return 2 ** int(math.ceil(math.log2(max(fs * 0.1, 1024.0))))


class FFTChannelizer:
    """Streaming overlap-save channelizer fs -> fs/decim per carrier."""

    def __init__(self, fs: float, freqs_hz: np.ndarray,
                 block_len: int | None = None,
                 back_granularity: int | None = None,
                 fold_fir=None, nfft: int | None = None):
        self.fs = float(fs)
        self.freqs_hz = np.asarray(freqs_hz, np.float64)
        self.decim = choose_decim(self.fs)
        self.nfft = choose_nfft(self.fs) if nfft is None else int(nfft)
        # (A SEGMENTED overlap-save variant — S batched (nfft/S)-point
        # transforms instead of the monolithic one — was built and
        # A/B'd on hardware in round 2: 6.9k vs 21.9k realtime carriers
        # at C=10240 (perf/tpu_agenda6), a 3x regression, so it was
        # removed.  The time-shard mesh axis (runtime/sharding.py) is
        # the supported way to split a capture.)
        self.n_band = self.nfft // self.decim
        self.out_rate = self.fs / self.decim

        # channel-select lowpass at the input rate; its stopband starts
        # inside the extracted band so decimation cannot fold interference
        h1 = design.kaiser_lowpass(
            13_000.0, self.out_rate / 2.0 - 14_000.0, self.fs,
            atten_db=60.0)
        self.h1_len = len(h1)
        # optional OUTPUT-rate FIR (the RRC matched filter when the back
        # half has no resample stage to fold it into) applied in the band
        # frequency domain: a stride-1 single-in-channel time conv is the
        # worst MXU shape on this backend, while one more multiply on the
        # already-extracted spectrum is free.  Exact linear conv provided
        # the overlap also covers its memory (below).
        self.fold_fir = None if fold_fir is None else np.asarray(
            fold_fir, np.float64)
        fir_mem = (0 if self.fold_fir is None
                   else (len(self.fold_fir) - 1) * self.decim)

        # two-pass MXU FFT geometry (pallas_kernels.fft2p_planes) —
        # needed BEFORE the overlap choice: the spliced pass-1 input
        # wants the tail row count overlap/n1 to be 8-sublane-aligned
        lg2 = int(math.log2(self.nfft))
        self.fft2p_n1 = 1 << ((lg2 + 1) // 2)
        self.fft2p_n2 = self.nfft // self.fft2p_n1
        self.fft2p_ok = (self.fft2p_n1 % 128 == 0
                         and self.fft2p_n2 % 128 == 0
                         and self.n_band % 128 == 0)
        if self.fft2p_ok:
            self.fft2p_wrap = -(-self.n_band // self.fft2p_n2)

        # overlap: >= h1 (+ folded output FIR) memory, and block = nfft -
        # overlap must divide by decim * back_granularity (the 72 kHz
        # back half's block quantum)
        g = int(back_granularity) if back_granularity else 1
        quantum = self.decim * g
        overlap = self.nfft % quantum
        while overlap < max(self.h1_len + fir_mem, self.decim):
            overlap += quantum
        # spliced fft2p input: round the overlap up until its row count
        # overlap/n1 is a multiple of 8 (one sublane tile), so pass 1
        # can take tail+block as two inputs and splice them with
        # aligned VMEM copies — skipping the r2c/concat/stack glue
        # (4.7 ms/block of pure HBM streaming at 2^25,
        # perf/fft2p_stage_probe.py).  Everything is a power of two in
        # practice so the walk terminates in <= align/quantum steps;
        # if it can't align (exotic quantum) we keep the minimal
        # overlap and the glue path.
        self.fft2p_splice = False
        if self.fft2p_ok:
            align = 8 * self.fft2p_n1
            cand, steps = overlap, 0
            while (cand % align and cand * 2 < self.nfft
                   and steps <= align // math.gcd(quantum, align) + 1):
                cand += quantum
                steps += 1
            if cand % align == 0 and cand * 2 < self.nfft:
                overlap = cand
                self.fft2p_splice = True
        self.overlap = overlap
        if overlap * 2 >= self.nfft:
            raise ValueError(
                f"overlap {overlap} >= nfft/2 ({self.nfft}): filter "
                f"memory too large for the transform at fs={fs:g}")
        self.block_len = self.nfft - overlap
        if block_len is not None and block_len != self.block_len:
            raise ValueError(
                f"fft frontend requires block_len={self.block_len} at "
                f"fs={fs:g} (got {block_len})")
        self.drop = self.overlap // self.decim
        self.n_out = self.block_len // self.decim

        bin_hz = self.fs / self.nfft
        # offsets round to the nearest bin (<= bin/2 ~ Hz-scale residual;
        # harmless to differential demod — see module docstring)
        self.k_c = np.round(self.freqs_hz / bin_hz).astype(np.int64)
        self.residual_hz = self.freqs_hz - self.k_c * bin_hz

        H1 = np.fft.fft(h1, self.nfft)
        firF = (np.ones(self.n_band) if self.fold_fir is None
                else np.fft.fft(self.fold_fir, self.n_band))
        j = np.arange(self.n_band)
        j_signed = np.where(j < self.n_band // 2, j, j - self.n_band)
        self.h1_band = (H1[j_signed % self.nfft]
                        * firF[j % self.n_band]).astype(np.complex64)
        # per-carrier band start in the wrap-extended spectrum (each band
        # is one contiguous slice of length n_band in natural order)
        self.band_start = ((self.k_c - self.n_band // 2)
                           % self.nfft).astype(np.int32)
        # 128-lane-aligned starts (e.g. the 12.5+25 kHz channel grid at
        # fs in the 10.24 MHz * 2^j family) allow extraction as a ROW
        # gather of the (nfft/128, 128)-reshaped spectrum — an order of
        # magnitude cheaper than an element gather on TPU
        self.aligned = bool(np.all(self.band_start % 128 == 0)
                            and self.n_band % 128 == 0)
        # QUANTIZED row gather: when starts are NOT lane-aligned (e.g. fs
        # in the 72 kHz * 2^m family, whose bin grid is incommensurate
        # with the 25 kHz channel grid for any pow2 nfft), extract from
        # the aligned start s = 128*floor(start/128) below the band and
        # repair the d = start - s (in [0,128)) bin shift exactly:
        #   * the channel-select filter is applied as H1 rolled by d
        #     (only 128 distinct rolls -> a (128, n_band) host table);
        #     the d wrap bins fall >= out_rate/2 - 128*bin_hz into the
        #     filter stopband and are zeroed (the quantized band misses
        #     them; they carry <= -60 dB energy);
        #   * extraction centred d bins low leaves the channel modulated
        #     by +d*bin_hz; a per-d complex ramp exp(-2pi j d D(drop+n)
        #     / nfft) (again a 128-row table) removes it.  Cross-block
        #     phase continuity holds because the total per-block phase
        #     advance (k_c - d)*block + d*block = k_c*block matches the
        #     existing integer cycle counters, which are unchanged.
        self.quantized = bool(not self.aligned and self.n_band % 128 == 0)
        if self.aligned or self.quantized:
            rows = self.n_band // 128
            start_al = (self.band_start // 128) * 128
            self.row_idx = (start_al[:, None] // 128
                            + np.arange(rows)[None, :]).astype(np.int32)
        if self.quantized:
            self.d_shift = (self.band_start - start_al).astype(np.int32)
            nb = self.n_band
            j = np.arange(nb)
            j_signed = np.where(j < nb // 2, j, j - nb)      # FFT order
            d_col = np.arange(128)[:, None]
            rel = j_signed[None, :] - d_col                  # (128, nb)
            h1_roll = H1[rel % self.nfft] * firF[rel % nb]
            h1_roll[rel < -(nb // 2)] = 0.0                  # missing bins
            self.h1_roll = h1_roll.astype(np.complex64)
            ang = (2.0 * np.pi * d_col * self.decim
                   * (self.drop + np.arange(self.n_out))[None, :]
                   / self.nfft)
            self.ramp = np.exp(-1j * ang).astype(np.complex64)

        # NATURAL-ORDER synthesis: the per-block fftshift (rolling every
        # extracted band by n_band/2 to FFT order) was a full-array
        # shuffle costing its own HBM round trip at fleet scale.  Roll
        # the FILTER tables once at build time instead and feed the
        # natural-order product straight to the inverse transform:
        #   ifft(roll(B, -half))[k] = (-1)^k * ifft(B)[k],
        # so the only runtime cost is a (-1)^k sign on the synthesis
        # output — folded into the quantized ramp table, or one fused
        # broadcast multiply on the other paths.
        half = self.n_band // 2
        self.h1_band = np.roll(self.h1_band, -half)
        if self.quantized:
            self.h1_roll = np.roll(self.h1_roll, -half, axis=1)
        self.sign = np.where(
            (self.drop + np.arange(self.n_out)) % 2 == 0,
            np.float32(1.0), np.float32(-1.0))
        if self.quantized:
            # fold the sign into the ramp table (one fewer multiply);
            # step() then skips the standalone sign pass on this path
            self.ramp = (self.ramp
                         * self.sign[None, :]).astype(np.complex64)

        # MXU synthesis: XLA's batched pow2 ifft measured ~9x off the
        # HBM roofline at (10240, 8192) (17.5 ms/block,
        # perf/channelizer_breakdown.py x1/x2); a two-stage Cooley-Tukey
        # split n_band = P * 128 runs as three einsums (two complex
        # matmuls + a twiddle) on the MXU instead.  Exact same math to
        # f32 rounding; symbol-decision exactness is pinned by the
        # oracle tests.
        self.mxu_synth = self.n_band % 128 == 0 and self.n_band >= 256
        if self.mxu_synth:
            # layout-native split i = l + 128*r, k = s + P*t: the input
            # reshape (C, P, 128) and output reshape (C, 128, P) are
            # free minor-dim splits of the natural band/time orders, so
            # neither matmul needs a relayout of the big tensor
            pp = self.n_band // 128
            self.synth_p = pp
            rv = np.arange(pp)
            self._m1 = np.exp(2j * np.pi * np.outer(rv, rv)
                              / pp).astype(np.complex64)       # [r, s]
            lv = np.arange(128)
            self._tw = (np.exp(2j * np.pi * np.outer(lv, rv)
                               / self.n_band)
                        / self.n_band).astype(np.complex64)    # [l, s]
            self._m2 = np.exp(2j * np.pi * np.outer(lv, lv)
                              / 128).astype(np.complex64)      # [t, l]
        # Opt-in Pallas DMA extraction (one async copy per carrier on the
        # re/im-plane layout; hardware-validated).  Off by default: the
        # XLA row gather compiles to near-identical DMAs, and keeping the
        # default graph unchanged preserves the persistent compile cache.
        self.use_pallas = (self.aligned
                           and os.environ.get("TETRAEAR_PALLAS_EXTRACT")
                           == "1"
                           and self.n_band % 1024 == 0)
        if self.use_pallas:
            self.row_start = (self.band_start // 128).astype(np.int32)

        # FUSED Pallas band back end (extract + H1 + synthesis in one
        # VMEM trip per carrier): default ON for the row-gatherable
        # paths — the XLA formulation pays three full-tensor HBM round
        # trips (~30 ms of the 113 ms block at C=10240); see
        # pallas_kernels.band_synth.  TETRAEAR_NO_PALLAS_SYNTH=1 falls
        # back to the XLA gather + einsum path.
        self.use_pallas_synth = (
            (self.aligned or self.quantized)
            and self.n_band % 128 == 0 and self.n_band >= 256
            and os.environ.get("TETRAEAR_NO_PALLAS_SYNTH") != "1")
        if self.use_pallas_synth:
            pp = self.n_band // 128
            self.synth_rows = pp
            self.row_start = (self.band_start // 128).astype(np.int32)
            if self.quantized:
                h1t = self.h1_roll                     # (128, n_band)
            else:
                h1t = self.h1_band[None, :]            # (1, n_band)
                self.d_shift = np.zeros(len(self.k_c), np.int32)
            # natural band order minor-split by i = l + 128 r
            h1g = h1t.reshape(h1t.shape[0], pp, 128)
            self.h1_planes = np.stack(
                [h1g.real, h1g.imag]).astype(np.float32)  # (2, D, P, 128)
            rv = np.arange(pp)
            m1 = np.exp(2j * np.pi * np.outer(rv, rv) / pp)
            self.m1c = np.block(
                [[m1.real, m1.imag],
                 [-m1.imag, m1.real]]).astype(np.float32)  # (2P, 2P)
            lv = np.arange(128)
            m2 = np.exp(2j * np.pi * np.outer(lv, lv) / 128)
            self.m2re = m2.real.astype(np.float32)
            self.m2im = m2.imag.astype(np.float32)
            tw = (np.exp(2j * np.pi * np.outer(lv, rv) / self.n_band)
                  / self.n_band)                          # (128 l, P s)
            self.twre = tw.real.astype(np.float32)
            self.twim = tw.imag.astype(np.float32)

        # FOUR-STEP wideband FFT: XLA's single monolithic pow2 c64 FFT
        # measured 27.6 ms/block at 2^25 vs 17.7 for the same transform
        # as fft(axis=0) -> twiddle -> fft(axis=1) -> transpose
        # (perf/fft4step_probe.py; max rel err 6e-8).  The (n2, n1)
        # twiddle would be a 268 MB compile constant (the relay rejects
        # the request body), so it is FACTORED: with i1 = i1a + 64*i1b,
        # w^{k2 i1} = A[k2, i1a] * B[k2, i1b] — two tables of a few MB
        # that broadcast-multiply in the same fused pass.
        self.fft4 = self.nfft >= (1 << 20)
        # (TWO-PASS Pallas MXU FFT geometry — fft2p_n1/n2/ok/wrap/splice
        # — is computed near the top of __init__, before the overlap
        # choice.  wideband_planes()/wideband_planes_spliced() below
        # produce the band_synth input directly: the whole forward
        # transform + natural-order relayout + wrap extension in two
        # HBM passes of Cooley-Tukey matmuls — every XLA formulation
        # above is pass-bound, >= 15 ms/block at 2^25.)
        if self.fft4:
            lg = int(np.log2(self.nfft))
            n1 = 1 << ((lg + 1) // 2)
            n2 = self.nfft // n1
            self.fft4_n1, self.fft4_n2 = n1, n2
            k2v = np.arange(n2)
            w = -2j * np.pi / self.nfft
            self._fft4_a = np.exp(
                w * np.outer(k2v, np.arange(64))).astype(np.complex64)
            self._fft4_b = np.exp(
                w * 64 * np.outer(k2v, np.arange(n1 // 64))).astype(
                    np.complex64)

        # per-block phase-correction step: (k_c * block_len) mod nfft,
        # exact integers < nfft <= 2^22 (float32-exact below 2^24)
        self.cycle_step = ((self.k_c % self.nfft)
                           * (self.block_len % self.nfft)
                           % self.nfft).astype(np.float32)

    def init_state(self) -> dict:
        return {
            "tail": jnp.zeros((self.overlap, 2), jnp.float32),
            "cycles": jnp.zeros((len(self.k_c),), jnp.float32),
        }

    def _wideband_fft(self, xx: jnp.ndarray) -> jnp.ndarray:
        """FFT of the (nfft,) overlap-save window; four-step above 2^20
        (see __init__), plain jnp.fft.fft below.

        TETRAEAR_FFT6=1 swaps in the six-step formulation: every
        batched sub-FFT runs along the MINOR axis with the transposes
        explicit — measures whether XLA's axis-0 batched FFT hides a
        worse-than-explicit relayout (perf/fft4step_probe.py fft6).
        Identical values to f32 rounding (same sub-transforms, same
        twiddles; only the data movement differs)."""
        if not self.fft4:
            return jnp.fft.fft(xx)
        n1, n2 = self.fft4_n1, self.fft4_n2
        xm = xx.reshape(n2, n1)                      # [i2, i1]
        if os.environ.get("TETRAEAR_FFT6", "") == "1":
            g = jnp.fft.fft(xm.T, axis=1).T          # [k2, i1]
        else:
            g = jnp.fft.fft(xm, axis=0)              # [k2, i1]
        g = (g.reshape(n2, n1 // 64, 64)
             * jnp.asarray(self._fft4_b)[:, :, None]
             * jnp.asarray(self._fft4_a)[:, None, :])
        h = jnp.fft.fft(g.reshape(n2, n1), axis=1)   # [k2, k1]
        return h.T.reshape(-1)                       # X[k2 + n2*k1]

    def wideband_planes(self, xx: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
        """(nfft,) complex64 overlap-save window -> (2, R, 128) f32
        natural-order wrap-extended spectrum planes (the band_synth
        input), R >= (nfft + n_band)/128, via the two-pass Pallas MXU
        FFT.  Values equal the _wideband_fft + concat + stack glue to
        f32 rounding (HIGHEST-precision matmuls)."""
        import os
        from tetraear_tpu.dsp import pallas_kernels as pk
        xm = xx.reshape(self.fft2p_n2, self.fft2p_n1)
        pin = jnp.stack([jnp.real(xm), jnp.imag(xm)])
        # grid-block widths: wider blocks turn the strided column
        # reads/writes into longer contiguous runs (A/B knobs)
        cols = int(os.environ.get("TETRAEAR_FFT2P_COLS", "128"))
        rows2 = int(os.environ.get("TETRAEAR_FFT2P_ROWS2", "128"))
        return pk.fft2p_planes(pin, self.fft2p_n1, self.fft2p_n2,
                               wrap_k1=self.fft2p_wrap,
                               cols=cols, rows2=rows2,
                               interpret=interpret)

    def wideband_planes_spliced(self, tail_p: jnp.ndarray,
                                x_p: jnp.ndarray,
                                interpret: bool = False) -> jnp.ndarray:
        """wideband_planes with the overlap-save window spliced inside
        pass 1: tail_p (2, overlap) carried tail + x_p (2, block_len)
        fresh block, both PLANAR f32.  Identical output planes to
        wideband_planes(stack(concat(tail, x))) — but zero XLA glue
        passes over the block (the tail row count overlap/n1 is
        8-aligned by construction whenever fft2p_splice is True)."""
        import os
        from tetraear_tpu.dsp import pallas_kernels as pk
        n1, n2 = self.fft2p_n1, self.fft2p_n2
        o2 = self.overlap // n1
        t3 = tail_p.reshape(2, o2, n1)
        x3 = x_p.reshape(2, n2 - o2, n1)
        cols = int(os.environ.get("TETRAEAR_FFT2P_COLS", "128"))
        rows2 = int(os.environ.get("TETRAEAR_FFT2P_ROWS2", "128"))
        return pk.fft2p_planes_spliced(t3, x3, n1, n2,
                                       wrap_k1=self.fft2p_wrap,
                                       cols=cols, rows2=rows2,
                                       interpret=interpret)

    def _synth(self, band: jnp.ndarray) -> jnp.ndarray:
        """(C, n_band) spectra -> (C, n_band) time samples; equals
        jnp.fft.ifft(band, axis=1) to f32 rounding.

        MXU path: Cooley-Tukey n_band = P * 128 with the LAYOUT-NATIVE
        split i = l + 128*r (l the 128-lane index), k = s + P*t:
          T[l, s] = sum_r B[l + 128 r] e^{2 pi j r s / P}
          y[s + P t] = sum_l (T[l, s] tw[l, s]) e^{2 pi j l t / 128}
        Input (C, P, 128) and output (C, 128, P) are free minor-dim
        reshapes of the natural orders, so the two complex matmuls run
        without relayouts of the big tensor — MXU work instead of XLA's
        multi-pass batched FFT (measured 17.5 ms at (10240, 8192))."""
        if not self.mxu_synth:
            return jnp.fft.ifft(band, axis=1)
        c = band.shape[0]
        br = band.reshape(c, self.synth_p, 128)       # [r, l] = B[l+128r]
        t = jnp.einsum("crl,rs->cls", br, jnp.asarray(self._m1))
        u = t * jnp.asarray(self._tw)[None, :, :]
        y = jnp.einsum("tl,cls->cts", jnp.asarray(self._m2), u)
        return y.reshape(c, self.n_band)

    def step(self, x: jnp.ndarray, state: dict) -> tuple:
        """x: (block_len,) complex64 new wideband samples.

        Returns ((C, n_out) complex64 channel blocks @ out_rate,
        new_state)."""
        from tetraear_tpu.dsp import kernels

        tail = kernels.r2c(state["tail"])
        xx = jnp.concatenate([tail, x])               # (nfft,)
        X = self._wideband_fft(xx)
        # wrap-extend so every band is one contiguous slice
        x_ext = jnp.concatenate([X, X[:self.n_band]])
        if self.use_pallas_synth:
            from tetraear_tpu.dsp import pallas_kernels as pk
            planes = jnp.stack([jnp.real(x_ext), jnp.imag(x_ext)])
            planes = planes.reshape(2, -1, 128)
            got = pk.band_synth(
                planes, jnp.asarray(self.h1_planes),
                jnp.asarray(self.row_start), jnp.asarray(self.d_shift),
                jnp.asarray(self.m1c), jnp.asarray(self.m2re),
                jnp.asarray(self.m2im), jnp.asarray(self.twre),
                jnp.asarray(self.twim), self.synth_rows,
                interpret=jax.default_backend() != "tpu")
            y = jax.lax.complex(got[:, 0], got[:, 1]).reshape(
                len(self.k_c), self.n_band)
            return self._finish(y, state, xx)
        if self.use_pallas:
            from tetraear_tpu.dsp import pallas_kernels as pk
            planes = jnp.stack([jnp.real(x_ext), jnp.imag(x_ext)])
            planes = planes.reshape(2, -1, 128)
            got = pk.band_extract_rows(
                planes, jnp.asarray(self.row_start), self.n_band // 128,
                interpret=jax.default_backend() != "tpu")
            nat = jax.lax.complex(got[:, 0], got[:, 1])
            nat = nat.reshape(len(self.k_c), self.n_band)
        elif self.aligned or self.quantized:
            rows = x_ext.reshape(-1, 128)             # (.., 128) lanes
            nat = rows[jnp.asarray(self.row_idx)]     # (C, nb/128, 128)
            nat = nat.reshape(len(self.k_c), self.n_band)
        else:
            idx = (jnp.asarray(self.band_start)[:, None]
                   + jnp.arange(self.n_band, dtype=jnp.int32)[None, :])
            nat = x_ext[idx]                          # (C, n_band) centred
        # natural-order band product (the fftshift lives in the rolled
        # filter tables + the (-1)^k sign on the synthesis output)
        if self.quantized:
            band = nat * jnp.asarray(self.h1_roll)[jnp.asarray(
                self.d_shift)]
        else:
            band = nat * jnp.asarray(self.h1_band)[None, :]
        return self._finish(self._synth(band), state, xx)

    def _finish(self, y: jnp.ndarray, state: dict, xx: jnp.ndarray):
        """Shared step tail: scale, slice, ramp/sign, phase, new state."""
        from tetraear_tpu.dsp import kernels
        import jax

        y = y * jnp.float32(1.0 / self.decim)
        y = y[:, self.drop:self.drop + self.n_out]
        if self.quantized:
            # remove the +d-bin modulation left by the aligned
            # extraction (ramp table carries the (-1)^k sign)
            y = y * jnp.asarray(self.ramp)[jnp.asarray(self.d_shift)]
        else:
            y = y * jnp.asarray(self.sign)[None, :]

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
