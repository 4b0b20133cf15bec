"""Tracing and per-stage throughput counters.

The reference has no profiling at all (SURVEY.md section 5.1); this module
provides the TPU-native equivalents:

  * Profiler — context manager around jax.profiler.trace writing
    TensorBoard-loadable traces (xplane) for kernel-level analysis;
  * StageTimers — host-side per-stage wall-time accounting with
    samples/s rates, for the streaming pipeline's steady-state numbers;
  * roofline_estimate — back-of-envelope FLOP/byte counts for the demod
    chain, to compare measured throughput against the HBM roofline.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path


class Profiler:
    """jax.profiler wrapper: with Profiler('/tmp/trace'): run_workload()."""

    def __init__(self, trace_dir: str | Path = "/tmp/tetraear_trace"):
        self.trace_dir = str(trace_dir)

    def __enter__(self):
        import jax
        jax.profiler.start_trace(self.trace_dir)
        return self

    def __exit__(self, *exc):
        import jax
        jax.profiler.stop_trace()
        return False


class StageTimers:
    """Accumulate wall time per named stage; report rates."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.items = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1
            self.items[name] += items

    def report(self) -> dict:
        out = {}
        for name, total in self.totals.items():
            entry = {
                "total_s": total,
                "calls": self.counts[name],
                "mean_ms": 1e3 * total / max(self.counts[name], 1),
            }
            if self.items[name]:
                entry["items_per_s"] = self.items[name] / max(total, 1e-12)
            out[name] = entry
        return out


def roofline_estimate(n_carriers: int, fs: float, frontend: str = "fft",
                      decim: int | None = None) -> dict:
    """Rough FLOPs and HBM bytes per input second for the demod chain.

    Used to sanity-check measured throughput: if achieved FLOP/s or
    bytes/s are far below chip peaks, the kernel is latency- or
    layout-bound, not roofline-bound.
    """
    import math
    decim = decim or max(1, int(round(fs / 96_000.0)))
    out96 = fs / decim
    out72 = 72_000.0
    c = n_carriers

    if frontend == "fft":
        nfft = fs / 10.0                       # 0.1 s blocks, amortized
        fft_flops = 5.0 * fs * math.log2(max(nfft, 2))      # forward, /s
        ifft_flops = c * 5.0 * out96 * math.log2(max(nfft / decim, 2))
        front_flops = fft_flops + ifft_flops + 6.0 * c * out96
        front_bytes = 8.0 * fs * 2 + c * out96 * 8.0 * 2
    else:
        # NCO (sincos ~ 20 flops) + stage-1 conv per carrier
        front_flops = c * fs * (20.0 + 8.0)
        front_bytes = c * fs * 8.0 * 2

    # back half per carrier: stage2 (~64 MAC/out at 72k), RRC (41 taps),
    # timing (~30 flops/sym), demod (~10)
    back_flops = c * (out72 * (64 + 41) * 2 + 18_000.0 * 40)
    back_bytes = c * out72 * 8.0 * 4
    # frame scan (dsp.framescan.frame_scan_sparse): dense 2x22 sync conv
    # at 36 kbit/s per carrier + CRC (33x230 matvec) at only the top-K
    # candidates per ~0.1 s block
    bits_per_s = 36_000.0
    k_cand_per_s = 64 / 0.1
    scan_flops = c * (bits_per_s * 2.0 * 2 * 22
                      + k_cand_per_s * 2.0 * 33 * 230)
    scan_bytes = c * (bits_per_s * (4.0 + 4.0) + k_cand_per_s * 230 * 4.0)
    return {
        "flops_per_s": front_flops + back_flops + scan_flops,
        "hbm_bytes_per_s": front_bytes + back_bytes + scan_bytes,
        "front_flops_per_s": front_flops,
        "scan_flops_per_s": scan_flops,
        "frontend": frontend,
    }


def voice_roofline(n_carriers: int, block_s: float,
                   rt_factor: float | None = None,
                   frames_per_carrier_block: int = 4,
                   basicops_per_frame: float | None = None,
                   eff_ops_per_s: float | None = None) -> dict:
    """Device-limit model for the bit-exact ETSI ACELP voice chain.

    The decoder (voice/jspeech.py) is a chain of ~50k SEQUENTIAL Word16
    basic operations per 30 ms speech frame — saturating Q15 mults,
    adds, shifts whose exact rounding the conformance corpus pins, so
    no reformulation may reorder or batch them WITHIN a frame.  The
    device parallelizes across frames (carriers x slots fill VPU
    lanes), so the ceiling is the effective rate at which the chip
    retires lane-parallel basicop STEPS:

        t_block >= C * frames/block * basicops / eff_rate

    eff_rate is CALIBRATED, not a datasheet figure: agenda10's jsponly
    stage retired 16,384 frames x ~50k basicops in ~205 ms =
    ~4.0e9 basicops/s (TETRAEAR_VOICE_EFF_OPS overrides; recalibrate
    whenever jspeech's scan structure changes).  The v5e VPU's
    theoretical int-op rate (~3.9e12/s: 8 cores x 4 ALUs x (8, 128)
    lanes x 940 MHz) sits ~1000x higher — unreachable here because
    each basicop expands to several saturation/rounding vector ops on
    a dependent chain only ~16 vregs wide, and the lax.scan step
    machinery costs more than the body at this width
    (perf/scan_overhead_probe.py).  Both numbers are reported so the
    gap stays visible instead of buried in prose (VERDICT r03 item 5).

    Returns the model ceiling in realtime carriers and, when rt_factor
    (measured realtime multiple) is given, the fraction achieved.
    """
    import os
    basicops = basicops_per_frame or float(os.environ.get(
        "TETRAEAR_ACELP_BASICOPS", "50e3"))
    eff = eff_ops_per_s or float(os.environ.get(
        "TETRAEAR_VOICE_EFF_OPS", "4.0e9"))
    ops_per_carrier_block = frames_per_carrier_block * basicops
    # realtime ceiling: carriers such that the block decodes in block_s
    model_carriers = eff * block_s / ops_per_carrier_block
    out = {
        "model_voice_carriers_rt": model_carriers,
        "model_ms_per_block": 1e3 * n_carriers * ops_per_carrier_block
        / eff,
        "basicops_per_frame": basicops,
        "eff_basicops_per_s": eff,
        "theoretical_vpu_int_ops_per_s": 3.9e12,
        "frames_per_carrier_block": frames_per_carrier_block,
    }
    if rt_factor is not None:
        achieved = rt_factor * n_carriers
        out["voice_model_pct"] = 100.0 * achieved / model_carriers
    return out


def measured_hbm_gbs(repo_root: str | Path | None = None) -> tuple:
    """Session-calibrated HBM streaming bandwidth -> (GB/s, provenance).

    Closes the probe -> constant -> headline chain (round-4 verdict
    item 5): instead of a hardcoded round-3 number, the denominator for
    ``roofline_measured_pct`` is read from the newest committed PERF
    bundle whose hbm rung succeeded (perf/agenda.py writes one per
    evidence run; the rung is perf/hbm_bw_probe.py's chained axpy pass —
    the same figure the 405 constant came from).  Precedence:

      1. TETRAEAR_MEASURED_GBS (explicit operator calibration),
      2. newest PERF_*.json with steps.hbm.result.axpy_gbs, rc 0 AND
         a >= 1 GB footprint (a 512 MB trial measured 293 GB/s vs 411
         at 1024 MB — the ~1 ms fixed per-pass overhead dominates
         small arrays and would FLATTER the roofline fraction),
      3. the agenda8 constant 405 (documented fallback for checkouts
         with no bundle).

    The provenance string is carried into the bench JSON so every
    roofline claim names its denominator's source.
    """
    import json
    import os
    env = os.environ.get("TETRAEAR_MEASURED_GBS")
    if env:
        return float(env), "env:TETRAEAR_MEASURED_GBS"
    root = Path(repo_root) if repo_root else \
        Path(__file__).resolve().parents[2]
    best = None                       # (started_utc, gbs, filename)
    for p in root.glob("PERF_*.json"):
        try:
            d = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        step = (d.get("steps") or {}).get("hbm") or {}
        res = step.get("result") or {}
        gbs = res.get("axpy_gbs")
        if not gbs or step.get("returncode") or res.get("mb", 0) < 1024:
            continue
        key = str(d.get("started_utc", ""))
        if best is None or key > best[0]:
            best = (key, float(gbs), p.name)
    if best is not None:
        return best[1], f"{best[2]}:steps.hbm.axpy_gbs"
    return 405.0, "default:agenda8-axpy"


def roofline_fraction(n_carriers: int, fs: float, rt_factor: float,
                      frontend: str = "fft",
                      peak_flops: float | None = None,
                      peak_bw: float | None = None,
                      include_scan: bool = True) -> dict:
    """Fraction of the chip roofline the measured run achieves.

    rt_factor: measured realtime multiple (input seconds per wall
    second).  Peaks default to TPU v5e-class figures (197 TFLOP/s bf16
    matmul, 819 GB/s HBM) and can be overridden via arguments or the
    TETRAEAR_PEAK_TFLOPS / TETRAEAR_PEAK_GBS environment variables —
    note most of this chain runs f32, whose MXU peak is lower, so the
    reported fraction is a conservative floor.
    """
    import os
    peak_flops = peak_flops or float(os.environ.get(
        "TETRAEAR_PEAK_TFLOPS", "197")) * 1e12
    peak_bw = peak_bw or float(os.environ.get(
        "TETRAEAR_PEAK_GBS", "819")) * 1e9
    est = roofline_estimate(n_carriers, fs, frontend=frontend)
    flops = est["flops_per_s"]
    bbytes = est["hbm_bytes_per_s"]
    if not include_scan:
        flops -= est["scan_flops_per_s"]
    achieved_flops = flops * rt_factor
    achieved_bw = bbytes * rt_factor
    frac = max(achieved_flops / peak_flops, achieved_bw / peak_bw)
    # measured roofline: datasheet HBM (819 GB/s) is not sustainable on
    # this part — chained streaming passes measure ~400-410 GB/s
    # (perf/hbm_bw_probe.py), the honest denominator for memory-bound
    # stages.  The figure comes from the newest committed PERF bundle's
    # own probe (measured_hbm_gbs), reported alongside the datasheet
    # fraction, never instead of it.
    meas_gbs, meas_src = measured_hbm_gbs()
    meas_bw = meas_gbs * 1e9
    frac_meas = max(achieved_flops / peak_flops, achieved_bw / meas_bw)
    return {
        "roofline_pct": 100.0 * frac,
        "roofline_measured_pct": 100.0 * frac_meas,
        "measured_gbs": meas_gbs,
        "measured_gbs_source": meas_src,
        "achieved_tflops": achieved_flops / 1e12,
        "achieved_gbs": achieved_bw / 1e9,
        "bound": ("compute" if achieved_flops / peak_flops
                  >= achieved_bw / peak_bw else "memory"),
        "model_flops_per_input_s": flops,
        "model_bytes_per_input_s": bbytes,
    }
