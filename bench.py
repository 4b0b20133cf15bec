"""Benchmark: real-time TETRA carriers per chip.

Measures the steady-state throughput of the carrier-bank demodulator (NCO
mix -> polyphase channel filter -> RRC -> timing recovery -> DQPSK, the
full per-carrier receive chain) on whatever backend JAX selects (the real
TPU chip under the driver; CPU as fallback).

Metric: number of 25 kHz TETRA carriers that can be demodulated in real
time on one chip.  Baseline = 1: the reference processes exactly one
carrier per process and must finish each 54 ms chunk within 54 ms on a
desktop CPU (tetraear/ui/modern.py:1908-1912).

Timing methodology: the per-block state is chained through S = STEPS
sequential jitted steps (a data dependency the runtime cannot reorder or
overlap), and the clock stops only after a value depending on the final
state is fetched to the host.  This is robust against async dispatch and
relay-acknowledged-but-not-executed effects seen on the axon backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: the big-FFT graphs take minutes
    to compile through the axon remote-compile relay; cache them across
    bench invocations."""
    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               str(os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)),
                                   ".jax_cache")))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def run_bench(n_carriers: int = 256, block: int | None = None,
              steps: int = 20, frontend: str = "fft") -> dict:
    import math

    import jax
    _enable_compile_cache()
    import jax.numpy as jnp
    from tetraear_tpu.dsp import kernels
    from tetraear_tpu.dsp.pipeline import CarrierBankDemod

    # capture bandwidth scales with the carrier count (25 kHz channel
    # grid + 15% guard).  fs in the 10.24 MHz * 2^j family puts every
    # grid carrier on a 128-bin boundary, so band extraction is a pure
    # row gather (dsp/channelizer.py 'aligned' path) and the channel
    # rate is 80 kHz (L=9 resample to 72 kHz).
    needed = max(10.24e6, n_carriers * 25_000 * 1.15)
    fs = 10.24e6 * 2 ** max(0, math.ceil(math.log2(needed / 10.24e6)))
    offsets = [(i - n_carriers // 2) * 25_000 + 12_500
               for i in range(n_carriers)]
    bank = CarrierBankDemod(fs=fs, freqs_hz=offsets, block_len=block,
                            frontend=frontend)
    block = bank.block_len

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(block)
         + 1j * rng.standard_normal(block)).astype(np.complex64)
    xd = jnp.asarray(kernels.c2r_np(x))

    def chain(x_r, state, n):
        def body(st, _):
            out, st2 = bank._step_impl(x_r, st)
            return st2, out["hard"][:, 0]
        st, tails = jax.lax.scan(body, state, None, length=n)
        return st, tails

    chain_j = jax.jit(chain, static_argnums=2)

    # Warmup/compile with the SAME static scan length as the timed run
    # (a different length is a different executable — timing it would
    # measure compilation, not throughput).
    st0 = bank.init_state()
    st, tails = chain_j(xd, st0, steps)
    float(np.asarray(tails)[0, 0])          # force full execution

    t0 = time.time()
    st, tails = chain_j(xd, bank.init_state(), steps)
    # fetch a value that depends on every step
    _ = np.asarray(st["timing"]["next_t"])[0]
    _ = np.asarray(tails)[-1, 0]
    elapsed = time.time() - t0

    block_seconds = block / fs
    rt_factor = (steps * block_seconds) / elapsed
    carriers_rt = rt_factor * n_carriers
    msps = steps * block / elapsed / 1e6
    return {
        "carriers_rt": carriers_rt,
        "rt_factor": rt_factor,
        "input_msps": msps,
        "elapsed_s": elapsed,
        "n_carriers": n_carriers,
        "backend": jax.default_backend(),
    }


def main():
    n_carriers = int(os.environ.get("BENCH_CARRIERS", "1024"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    frontend = os.environ.get("BENCH_FRONTEND", "fft")
    budget_s = int(os.environ.get("BENCH_TIMEOUT_S", "1500"))

    # Watchdog: a hung remote compile must not hang the harness; raising
    # in-process lets the PJRT client unwind and release its device grant
    # (a hard kill wedges the TPU for subsequent users).
    import signal

    def _alarm(signum, frame):
        raise TimeoutError(f"bench exceeded {budget_s}s budget")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(budget_s)
    try:
        r = run_bench(n_carriers=n_carriers, steps=steps, frontend=frontend)
        signal.alarm(0)
        value = r["carriers_rt"]
        print(json.dumps({
            "metric": "realtime_tetra_carriers_per_chip",
            "value": round(float(value), 1),
            "unit": "carriers (25 kHz pi/4-DQPSK, full RX chain)",
            "vs_baseline": round(float(value) / 1.0, 1),
        }))
        print(f"# backend={r['backend']} n_carriers={r['n_carriers']} "
              f"rt_factor={r['rt_factor']:.1f} input={r['input_msps']:.0f} "
              f"Msps elapsed={r['elapsed_s']:.2f}s steps={steps}",
              file=sys.stderr)
    except Exception as e:
        print(json.dumps({
            "metric": "realtime_tetra_carriers_per_chip",
            "value": 0.0,
            "unit": "carriers (25 kHz pi/4-DQPSK, full RX chain)",
            "vs_baseline": 0.0,
        }))
        print(f"# bench failed: {type(e).__name__}: {e}", file=sys.stderr)
        raise SystemExit(0)


if __name__ == "__main__":
    main()
