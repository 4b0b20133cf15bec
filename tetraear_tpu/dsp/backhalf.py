"""Fused RX back half: channelizer -> scan verdicts in two kernel trips.

The classic path (pipeline.CarrierBankDemod + framescan) makes ~5 XLA
passes over the (C, n_band) per-carrier baseband between the band
synthesis and the frame-scan verdicts: complex assembly, phase
correction, tail concat, the interpolator's phase-major transpose, and
the bit interleave + scan-input build — ~29 ms of the 74.6 ms block at
C=10240 against a ~6 ms HBM roofline.  This module routes the same math
through two Pallas kernels:

  * pallas_kernels.band_synth(phasor_drop=...) — the existing fused
    band back end, now also emitting the per-carrier Oerder-Meyr
    timing phasor (computed in VMEM while the block is resident);
  * a tiny XLA "glue" on (C,)-shaped vectors — the O&M angle (atan2
    has no Mosaic lowering, perf/mosaic_ops_probe.py), symbol-clock
    snap, Catmull-Rom coefficients, valid counts;
  * pallas_kernels.fused_backhalf — phase ramp/rotation, tail splice,
    interpolation, pi/4-DQPSK, bit relayout and the even-position
    sync + CRC scan, one VMEM trip per carrier.

Correctness contract: identical SYMBOL DECISIONS (hence identical scan
verdict planes) to the classic chain on golden signals
(tests/unit/test_backhalf.py).  Float intermediates differ in rounding
(documented deviations: the phasor is computed from the raw synthesis
output and scaled by the exact pow2 1/decim^2 — |ramp| == 1 only to f32
rounding; the factored ramp exp(-i theta P t) * exp(-i theta s) rounds
differently from the host's direct table; soft-bit |d| uses
sqrt(re^2+im^2) rather than XLA's complex abs).  Decisions are pinned
by the exactness tests; none of these perturbations exceed ~1e-6
relative.

Eligibility (fused() raises otherwise): fft frontend on a 72 kHz-family
rate (no resample stages), pallas band synthesis active, n_band a
multiple of 128, drop % 4 == 0 and >= 8, afc off.  The classic chain
remains the fallback for every other configuration.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tetraear_tpu.dsp import framescan, kernels
from tetraear_tpu.dsp import pallas_kernels as pk

TWO_PI = 2.0 * np.pi
TAILBITS = 1200


def try_fused(bank) -> tuple:
    """THE fused-vs-classic decision point (VERDICT r03 item 7).

    Every production consumer (api.Pipeline, runtime.stream
    DecodeRunner, bench.py) selects its back half HERE; eligibility
    itself lives in FusedRx.__init__ (module docstring).  The classic
    split chain (pipeline.CarrierBankDemod._step_impl + framescan) is
    the DELIBERATE fallback — reachable for conv-frontend / AFC /
    non-72kHz-family configs, on non-TPU backends, via
    TETRAEAR_NO_FUSED=1, and as the bench degrade ladder's second rung
    when a fused compile fails on hardware (measured gap at C=10240,
    round 4: fused 32.2k vs classic 15.4k realtime carriers — the
    classic rung verified LIVE by a forced-failure bench run, ladder
    fires and reports `degraded` honestly).  It is NOT an unreconciled
    twin: the exactness suite pins both formulations to identical
    symbol decisions and verdict planes (tests/unit/test_backhalf.py).

    Returns (FusedRx | None, reason string).
    """
    import os
    if os.environ.get("TETRAEAR_NO_FUSED") == "1":
        return None, "TETRAEAR_NO_FUSED=1"
    want = (jax.default_backend() == "tpu"
            or os.environ.get("TETRAEAR_FORCE_FUSED") == "1")
    if not want:
        return None, ("non-TPU backend (interpret-mode Pallas is slower "
                      "than the XLA chain; TETRAEAR_FORCE_FUSED=1 "
                      "overrides for exactness tests)")
    try:
        return FusedRx(bank), "fused"
    except ValueError as e:
        return None, str(e)


class FusedRx:
    """Fused block step for a CarrierBankDemod-compatible carrier bank.

    Produces the same scan dict as framescan.frame_scan_packed_even on
    the bench/e2e z layout (carried 1200-bit tail ++ interleaved block
    bits), plus soft-bit planes for the O(hits) host frame layer, while
    carrying the exact same state semantics as the classic chain.
    """

    def __init__(self, bank):
        ch = getattr(bank, "channelizer", None)
        if ch is None or bank.plan.stages:
            raise ValueError(
                "fused back half needs the fft frontend on a 72 kHz-"
                "family rate (no resample stages)")
        if not ch.use_pallas_synth:
            raise ValueError("fused back half needs the Pallas band "
                             "synthesis (TETRAEAR_NO_PALLAS_SYNTH unset)")
        if getattr(bank, "afc", False):
            raise ValueError("fused back half does not implement the "
                             "closed-loop AFC path")
        if ch.drop % 4 or ch.drop < 8:
            raise ValueError(f"drop={ch.drop} not supported (need "
                             "a multiple of 4, >= 8)")
        self.bank = bank
        self.ch = ch
        self.k_max = bank.k_max
        self.n_out = ch.n_out
        c = bank.n_carriers
        self.p = ch.n_band // 128
        self.drop = ch.drop
        self.sy = self.p // 4

        # factored phase-ramp tables from exact integer modular phases:
        # sample k carries exp(-2i pi (d*decim*k mod nfft) / nfft) and
        # the (-1)^k natural-order sign; k = P*t + s factors the table
        # into a row part (t) and a lane part (s, sign folded — P even).
        d = (np.asarray(ch.d_shift, np.int64)
             if ch.quantized else np.zeros(c, np.int64))
        m_int = (d * ch.decim) % ch.nfft
        t_idx = np.arange(128, dtype=np.int64)
        k_row = (m_int[:, None] * (self.p * t_idx)[None, :]) % ch.nfft
        self._rt0 = np.exp(-2j * np.pi * k_row / ch.nfft).astype(
            np.complex64)                                   # (C, 128)
        s_idx = np.arange(self.p, dtype=np.int64)
        k_lane = (m_int[:, None] * s_idx[None, :]) % ch.nfft
        lane_sign = (-1.0) ** s_idx
        rc = np.exp(-2j * np.pi * k_lane / ch.nfft) * lane_sign[None, :]
        self._rc_planes = np.stack([rc.real, rc.imag], axis=1).astype(
            np.float32).reshape(c, 2, 1, self.p)            # (C,2,1,P)
        self._tables = framescan._PALLAS_TABLES
        self._n_z = TAILBITS + 2 * self.k_max
        self.n_corr = (self._n_z - framescan.SYNC_LEN) // 2 + 1
        self.n_err = (self._n_z - framescan.CRC_SPAN) // 2 + 1

    # -- state ---------------------------------------------------------

    def init_state(self) -> dict:
        return {
            "bank": self.bank.init_state(),
            "bit_tail": jnp.zeros((self.bank.n_carriers, 10, 128),
                                  jnp.float32),
        }

    # -- the fused block step (traceable) ------------------------------

    def chan_raw(self, x_r: jnp.ndarray, cstate: dict,
                 layout: str | None = None) -> tuple:
        """Channelizer front + band synthesis with the fused O&M
        phasor.  Returns (y raw planes (C, 2, 128, P), phasor
        (C, 1, 128), rot (C,) complex, new channelizer state).

        x_r is the wideband block as float32 in EITHER layout:
        interleaved (N, 2) [re, im] pairs, or planar (2, N) — feed
        planar on the hot path (kernels.c2p_np): with the spliced
        fft2p it reaches pass 1 with ZERO relayout passes, where the
        interleaved form costs a full-block transpose first.

        layout: "planar" | "interleaved" | None.  None infers from the
        shape and RAISES when the shape matches both (e.g. (2, 2)) or
        neither — callers that built the block pass it explicitly."""
        ch = self.ch
        interp = jax.default_backend() != "tpu"
        if layout is None:
            is_p = x_r.ndim == 2 and x_r.shape[0] == 2
            is_i = x_r.ndim == 2 and x_r.shape[-1] == 2
            if is_p == is_i:
                raise ValueError(
                    f"chan_raw: block shape {x_r.shape} matches "
                    f"{'both layouts' if is_p else 'neither layout'} — "
                    "pass layout='planar' or 'interleaved' explicitly")
            layout = "planar" if is_p else "interleaved"
        elif layout not in ("planar", "interleaved"):
            raise ValueError(f"chan_raw: unknown layout {layout!r}")
        planar = layout == "planar"
        import os
        # two-pass Pallas MXU FFT: default ON for TPU backends (real-chip
        # A/B: planes 20.2 -> 14.7 ms/block, e2e 22.5k -> 23.6k carriers
        # at C=10240, decode byte-identical); TETRAEAR_FFT2P=0 disables,
        # =1 forces it on CPU (interpret mode, used by the exactness
        # tests)
        fft2p_env = os.environ.get("TETRAEAR_FFT2P", "")
        use_2p = ch.fft2p_ok and fft2p_env != "0" and (
            fft2p_env == "1" or jax.default_backend() == "tpu")
        splice = (use_2p and ch.fft2p_splice
                  and os.environ.get("TETRAEAR_FFT2P_SPLICE") != "0")
        if splice:
            x_p = x_r if planar else jnp.transpose(x_r)
            tail_p = jnp.transpose(cstate["tail"])   # (2, overlap) tiny
            planes = ch.wideband_planes_spliced(tail_p, x_p,
                                                interpret=interp)
            new_tail = jnp.transpose(
                x_p[:, x_p.shape[1] - ch.overlap:])
        else:
            x = (jax.lax.complex(x_r[0], x_r[1]) if planar
                 else kernels.r2c(x_r))
            tail = kernels.r2c(cstate["tail"])
            xx = jnp.concatenate([tail, x])
            new_tail = kernels.c2r(xx[xx.shape[0] - ch.overlap:])
            if use_2p:
                planes = ch.wideband_planes(xx, interpret=interp)
            else:
                big_x = ch._wideband_fft(xx)
                x_ext = jnp.concatenate([big_x, big_x[:ch.n_band]])
                planes = jnp.stack([jnp.real(x_ext), jnp.imag(x_ext)])
                planes = planes.reshape(2, -1, 128)
        bs_group = int(os.environ.get("TETRAEAR_BS_GROUP", "32"))  # agenda9: 24.6/24.7/23.7 ms at 8/16/32
        y, ph = pk.band_synth(
            planes, jnp.asarray(ch.h1_planes),
            jnp.asarray(ch.row_start), jnp.asarray(ch.d_shift),
            jnp.asarray(ch.m1c), jnp.asarray(ch.m2re),
            jnp.asarray(ch.m2im), jnp.asarray(ch.twre),
            jnp.asarray(ch.twim), ch.synth_rows,
            group=bs_group, interpret=interp, phasor_drop=ch.drop)
        nfft_f = jnp.float32(ch.nfft)
        ang = cstate["cycles"] * jnp.float32(TWO_PI) / nfft_f
        rot = jax.lax.complex(jnp.cos(ang), -jnp.sin(ang))    # (C,)
        new_cstate = {
            "tail": new_tail,
            "cycles": jnp.mod(cstate["cycles"]
                              + jnp.asarray(ch.cycle_step), nfft_f),
        }
        return y, ph, rot, new_cstate

    def step(self, x_r: jnp.ndarray, state: dict) -> tuple:
        """x_r: wideband block, float32 (N, 2) [re, im] pairs or planar
        (2, N) — planar is the hot-path layout (see chan_raw).

        Returns (out, new_state); out = {"corr": (C, n_corr) f32,
        "crc_err": (C, n_err) i32, "soft_planes": (C, 2, SY, 128) f32,
        "n_valid": (C,) i32} with corr/crc_err following the
        frame_scan_packed_even contract on the carried-tail z layout.
        """
        ch = self.ch
        interp = jax.default_backend() != "tpu"
        bstate = state["bank"]
        y, ph, rot, new_cstate = self.chan_raw(x_r,
                                               bstate["channelizer"])

        # ---- timing glue on (C,) vectors (timing.timing_recover) ----
        tst = bstate["timing"]
        acc_old = kernels.r2c(tst["acc"])
        scale2 = jnp.float32(1.0 / (ch.decim * ch.decim))
        phasor = jax.lax.complex(ph[:, 0, 0], ph[:, 0, 1]) * scale2
        acc = 0.5 * acc_old + phasor
        mu = jnp.mod(-jnp.angle(acc) / TWO_PI * 4.0, 4.0)
        next_t = tst["next_t"]
        cur_frac = jnp.mod(next_t - 4.0, 4.0)
        delta = jnp.mod(mu - cur_frac + 2.0, 4.0) - 2.0
        next_t = next_t + delta
        next_t = jnp.where(next_t < 1.0, next_t + 4.0, next_t)
        i0 = jnp.clip(jnp.floor(next_t).astype(jnp.int32), 1, 4)
        bsel = i0 - 1
        f = next_t - i0.astype(jnp.float32)
        f2 = f * f
        f3 = f2 * f
        c0 = 0.5 * (-f3 + 2.0 * f2 - f)
        c1 = 0.5 * (3.0 * f3 - 5.0 * f2 + 2.0)
        c2 = 0.5 * (-3.0 * f3 + 4.0 * f2 + f)
        c3 = 0.5 * (f3 - f2)
        t_max = jnp.float32(4 + self.n_out - 3)
        t_k = (next_t[:, None]
               + 4.0 * jnp.arange(self.k_max, dtype=jnp.float32)[None])
        n_valid = jnp.sum(t_k <= t_max, axis=1).astype(jnp.int32)
        new_next = (next_t + 4.0 * n_valid.astype(jnp.float32)
                    - jnp.float32(self.n_out))
        dsel = jnp.clip(n_valid - (self.k_max - 2), 0, 2)

        tail_c = kernels.r2c(tst["tail"])                     # (C, 4)
        prev_c = kernels.r2c(bstate["prev_sym"])              # (C,)
        sc = jnp.stack(
            [c0, c1, c2, c3, n_valid.astype(jnp.float32),
             jnp.real(prev_c), jnp.imag(prev_c),
             jnp.real(tail_c[:, 0]), jnp.real(tail_c[:, 1]),
             jnp.real(tail_c[:, 2]), jnp.real(tail_c[:, 3]),
             jnp.imag(tail_c[:, 0]), jnp.imag(tail_c[:, 1]),
             jnp.imag(tail_c[:, 2]), jnp.imag(tail_c[:, 3]),
             jnp.zeros_like(c0)], axis=1)                     # (C, 16)
        rr_c = (jnp.asarray(self._rt0) * rot[:, None]
                * jnp.float32(1.0 / ch.decim))                # (C, 128)
        rr = jnp.stack([jnp.real(rr_c), jnp.imag(rr_c)], axis=1)
        rr = rr[:, :, :, None]                                # (C,2,128,1)

        # ---- the fused back-half kernel ----
        k3, rsyn, c0row = (jnp.asarray(t) for t in self._tables)
        import os
        # group sweep on hardware (agenda7/8): 8 -> 45.8, 16 -> 44.3,
        # 32 -> 44.0 ms/block at C=10240; fused_backhalf falls back to
        # group=1 whenever C % group != 0, so small test banks are
        # unaffected
        group = int(os.environ.get("TETRAEAR_BH_GROUP", "32"))
        corr, err, soft, bt2, last, misc = pk.fused_backhalf(
            y, state["bit_tail"], rr, jnp.asarray(self._rc_planes),
            sc, bsel, dsel, k3, rsyn, c0row,
            drop=self.drop, k_max=self.k_max, group=group,
            interpret=interp)

        c_n = self.bank.n_carriers
        out = {
            "corr": corr.reshape(c_n, -1)[:, :self.n_corr],
            "crc_err": err.reshape(c_n, -1)[:, :self.n_err],
            "soft_planes": soft,
            "n_valid": n_valid,
        }
        last_c = jax.lax.complex(last[:, 0, 0], last[:, 1, 0])
        prev_new = jnp.where(
            n_valid > 0,
            jax.lax.complex(misc[:, 0, 0], misc[:, 0, 1]), prev_c)
        new_state = {
            "bank": {
                **bstate,
                "channelizer": new_cstate,
                "timing": {
                    "tail": kernels.c2r(last_c[:, self.p - 4:]),
                    "next_t": new_next,
                    "acc": kernels.c2r(acc),
                },
                "prev_sym": kernels.c2r(prev_new),
            },
            "bit_tail": bt2,
        }
        return out, new_state

    # -- helpers -------------------------------------------------------

    def soft_symbols(self, soft_planes: jnp.ndarray) -> jnp.ndarray:
        """(C, 2, SY, 128) kernel planes (transposed layout: [u, t'])
        -> (C, k_max, 2) soft bits in symbol order (the dqpsk_demod
        soft layout, flat symbol i = SY*t' + u)."""
        c_n = soft_planes.shape[0]
        flat = jnp.transpose(soft_planes, (0, 1, 3, 2)).reshape(
            c_n, 2, 128 * self.sy)
        return jnp.transpose(flat[:, :, :self.k_max], (0, 2, 1))


def classic_step_scan(bank, x_r, state, bit_tail_bits):
    """Reference formulation of the same block step (XLA chain):
    bank._step_impl + interleave + carried-tail concat +
    frame_scan_packed_even + the bench tail-slide.  Used by the
    exactness tests and as the non-TPU fallback shape.

    bit_tail_bits: (C, 1200) uint8.  Returns (scan dict, new bank
    state, new tail bits, n_valid).
    """
    scan, st2, tl2, n_c, _out = block_step_scan(bank, x_r, state,
                                                bit_tail_bits)
    return scan, st2, tl2, n_c


def block_step_scan(bank, x_r, state, bit_tail_bits):
    """classic_step_scan that ALSO returns the demod block outputs —
    one traced program per block for the streaming Pipeline (demod +
    on-device sync/CRC scan in a single dispatch; the split
    demod-then-FrameScanKernel formulation pays a second dispatch and
    a (C, 2W) host bit-plane transfer every block)."""
    k = bank.k_max
    out, st2 = bank._step_impl(x_r, state)
    hard = out["hard"]
    valid = out["valid"]
    n_c = jnp.sum(valid, axis=1)
    h = jnp.where(valid, hard, 0).astype(jnp.uint8)
    bits = jnp.repeat(h, 2, axis=1)
    bits = bits.at[:, 0::2].set(h >> 1)
    bits = bits.at[:, 1::2].set(h & 1)
    z = jnp.concatenate([bit_tail_bits, bits], axis=1)
    scan = framescan.frame_scan_packed_even(z)
    tl2 = jax.lax.slice_in_dim(z, 2 * k - 4, 2 * k - 4 + TAILBITS, 1,
                               axis=1)
    for d in (1, 2):
        cand = jax.lax.slice_in_dim(
            z, 2 * k - 4 + 2 * d, 2 * k - 4 + 2 * d + TAILBITS, 1,
            axis=1)
        tl2 = jnp.where((n_c == k - 2 + d)[:, None], cand, tl2)
    return scan, st2, tl2, n_c, out
