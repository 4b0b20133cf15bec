"""Probe: raw achievable HBM streaming bandwidth on this chip.

Chained elementwise passes over a large f32 array (read N + write N per
step), fetch-synced.  Calibrates the bandwidth term of the roofline
model (runtime/profiling.measured_hbm_gbs reads the newest committed
PERF bundle's axpy figure): if y = x * a + carry sustains B GB/s, every
"passes x bytes / B" estimate in BASELINE.md is bounded by B, not by
the part's datasheet number.

Robustness (round-4 verdict item 5: the probe once wedged a bundle for
20 minutes inside a fetch): each pass runs under its OWN watchdog
(PERF_PASS_TIMEOUT_S, default 300 s) so one hung fetch costs one pass,
not the budget; a failed pass records null and the probe continues.
Exit is nonzero only when NO pass produced a number — a partial result
is still a calibration.

PERF_MB stays at 1024: a 512 MB trial measured 293 GB/s vs 411 at
1024 MB (the ~1 ms fixed per-pass overhead dominates the smaller
footprint), and an under-measured bandwidth would flatter
roofline_measured_pct.  The watchdog, not a smaller array, is the
wedge fix.

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/hbm_bw_probe.py
Env: PERF_MB (1024), PERF_STEPS (16), PERF_PASS_TIMEOUT_S (300),
     PERF_TIMEOUT_S (900, whole-probe ceiling).
"""

import json
import os
import signal
import sys
import time

import numpy as np


def main():
    budget = int(os.environ.get("PERF_TIMEOUT_S", "900"))
    pass_budget = int(os.environ.get("PERF_PASS_TIMEOUT_S", "300"))
    signal.signal(signal.SIGALRM,
                  lambda *a: (_ for _ in ()).throw(TimeoutError()))
    signal.alarm(budget)
    deadline = time.time() + budget

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    mb = int(os.environ.get("PERF_MB", "1024"))
    steps = int(os.environ.get("PERF_STEPS", "16"))
    n = mb * 1024 * 1024 // 4
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n)
                    .astype(np.float32))
    results = {"mb": mb, "steps": steps}

    def timed(name, fn):
        # per-pass watchdog: the alarm is re-armed to the smaller of the
        # pass budget and the remaining whole-probe budget, and restored
        # afterwards so a hung compile/fetch fails THIS pass only
        remaining = max(1, int(deadline - time.time()))
        signal.alarm(min(pass_budget, remaining))
        try:
            cj = jax.jit(fn, static_argnums=1)

            def fetch(out):
                v = out[0] if isinstance(out, tuple) else out
                return float(np.asarray(v).ravel()[-1])

            fetch(cj(x, steps))
            t0 = time.time()
            fetch(cj(x, steps))
            dt = (time.time() - t0) / steps
            results[name + "_gbs"] = round(2 * mb / 1024 / dt, 1)
            print(f"{name}: {2 * mb / 1024 / dt:.1f} GB/s "
                  f"({dt * 1e3:.1f} ms/step)", flush=True)
        except Exception as e:
            results[name + "_gbs"] = None
            results.setdefault("errors", []).append(
                f"{name}: {type(e).__name__}: {e}"[:200])
            print(f"# hbm probe: {name} pass failed "
                  f"({type(e).__name__}: {e})", file=sys.stderr,
                  flush=True)
        finally:
            signal.alarm(max(1, int(deadline - time.time())))

    # (a) pure elementwise chain: read N, write N per step
    def chain_axpy(x0, m):
        def body(c, _):
            y = x0 * c + 1.0
            return y[0], y[-1]
        c, tails = jax.lax.scan(body, jnp.float32(1.0), None, length=m)
        return tails

    timed("axpy", chain_axpy)

    # (b) 2D row-major copy with a reshape (the planes-build shape)
    def chain_copy2d(x0, m):
        x2 = x0.reshape(-1, 128)

        def body(c, _):
            y = x2 + c
            return y[0, 0], y[-1, -1]
        c, tails = jax.lax.scan(body, jnp.float32(0.0), None, length=m)
        return tails

    timed("copy2d", chain_copy2d)

    # disarm BEFORE reporting: a tight remaining budget must not let a
    # pending SIGALRM fire during interpreter/relay teardown and turn a
    # partial success into a nonzero exit (the calibration reader
    # discards bundles on returncode)
    signal.alarm(0)
    print(json.dumps(results))
    if not any(results.get(k) for k in ("axpy_gbs", "copy2d_gbs")):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
