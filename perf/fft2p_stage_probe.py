"""Stage-level timing of the two-pass MXU FFT at bench shapes.

Splits planes2p (14.4 ms/block, PERF_9f7dbe3) into its three legs so
the optimization target is measured, not guessed:

  glue    — XLA input prep alone: overlap concat + (n2, n1) reshape +
            [re, im] plane stack (pure HBM streaming, no FFT)
  pass1   — glue + the pass-1 Pallas kernel (inner DFT + four-step
            twiddle), strided column read/write legs included
  both    — glue + pass1 + pass2 (== the planes2p chain measured by
            fused_breakdown.py, sanity anchor)

Scan-chained with a dependent final fetch (CLAUDE.md rule 5b).
Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/fft2p_stage_probe.py
Env: PERF_CARRIERS (10240), PERF_STEPS (8), PERF_ONLY, and the fft2p
knobs (TETRAEAR_FFT2P_PREC/COLS/ROWS2).
"""

import json
import os
import signal
import time

import numpy as np


def main():
    budget = int(os.environ.get("PERF_TIMEOUT_S", "2400"))
    signal.signal(signal.SIGALRM,
                  lambda *a: (_ for _ in ()).throw(TimeoutError()))
    signal.alarm(budget)

    import jax
    import jax.numpy as jnp
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sys
    sys.path.insert(0, root)
    from bench import _make_bank
    from tetraear_tpu.dsp import kernels
    from tetraear_tpu.dsp import pallas_kernels as pk
    from functools import partial

    C = int(os.environ.get("PERF_CARRIERS", "10240"))
    STEPS = int(os.environ.get("PERF_STEPS", "8"))
    bank, fs = _make_bank(C, None, "fft")
    block = bank.block_len
    ch = bank.channelizer
    n1, n2 = ch.fft2p_n1, ch.fft2p_n2
    print(f"nfft={ch.nfft} n1={n1} n2={n2} wrap={ch.fft2p_wrap}",
          flush=True)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(block)
         + 1j * rng.standard_normal(block)).astype(np.complex64)
    xd = jnp.asarray(kernels.c2r_np(x))

    results = {}
    only = [s for s in os.environ.get("PERF_ONLY", "").split(",") if s]

    def timed(name, chain_fn):
        if only and name not in only:
            return
        cj = jax.jit(chain_fn, static_argnums=1)
        out = cj(xd, STEPS)
        float(np.asarray(out)[-1])
        t0 = time.time()
        out = cj(xd, STEPS)
        float(np.asarray(out)[-1])
        dt = (time.time() - t0) / STEPS * 1e3
        results[name] = round(dt, 1)
        print(f"{name}: {dt:.1f} ms/block", flush=True)

    def build_pin(x_r, carry):
        xx = jnp.concatenate(
            [jnp.zeros(ch.overlap, jnp.complex64),
             kernels.r2c(x_r) + carry])
        xm = xx.reshape(n2, n1)
        return jnp.stack([jnp.real(xm), jnp.imag(xm)])

    def chain_glue(x_r, n):
        def body(carry, _2):
            pin = build_pin(x_r, carry)
            return pin[0, 0, 0] * 1e-30 + 0j, pin[1, 0, 0]
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    timed("glue", chain_glue)

    # pass 1 alone (private pallas_call mirroring fft2p_planes pass 1)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    key = (n1, n2)
    if key not in pk._FFT2P_TABLES:
        pk._FFT2P_TABLES[key] = pk._fft2p_tables(n1, n2)
    t = pk._FFT2P_TABLES[key]
    a2 = n2 // 128

    def pass1(pin):
        return pl.pallas_call(
            partial(pk._fft2p_pass1_kernel, a2),
            grid_spec=pl.GridSpec(
                grid=(n1 // 128,),
                in_specs=[
                    pl.BlockSpec((2, n2, 128), lambda q: (0, 0, q),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2, n2, 2), lambda q: (q, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, n2, 128), lambda q: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, 128, 128), lambda q: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, a2, a2), lambda q: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, 128, a2), lambda q: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((2, n2, 128), lambda q: (0, 0, q),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((2, n2, n1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(pin, jnp.asarray(t["bq"]), jnp.asarray(t["at2"]),
          jnp.asarray(t["f128"]), jnp.asarray(t["fa2"]),
          jnp.asarray(t["w2"]))

    def chain_pass1(x_r, n):
        def body(carry, _2):
            g = pass1(build_pin(x_r, carry))
            return g[0, 0, 0] * 1e-30 + 0j, g[1, 0, 0]
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    timed("pass1", chain_pass1)

    def chain_both(x_r, n):
        def body(carry, _2):
            xx = jnp.concatenate(
                [jnp.zeros(ch.overlap, jnp.complex64),
                 kernels.r2c(x_r) + carry])
            planes = ch.wideband_planes(xx)
            return planes[0, 0, 0] * 1e-30 + 0j, planes[1, 0, 0]
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    timed("both", chain_both)

    # spliced: tail+block as separate planar inputs, zero glue passes
    # (the production chan_raw path whenever ch.fft2p_splice)
    if getattr(ch, "fft2p_splice", False) and (
            not only or "spliced" in only):
        xp = jnp.asarray(kernels.c2p_np(x))

        def chain_spliced(x_p, n):
            def body(carry, _2):
                tail_p = jnp.zeros((2, ch.overlap), jnp.float32)
                planes = ch.wideband_planes_spliced(tail_p, x_p + carry)
                return planes[0, 0, 0] * 1e-30, planes[1, 0, 0]
            c, tails = jax.lax.scan(body, jnp.float32(0), None,
                                    length=n)
            return tails

        cj = jax.jit(chain_spliced, static_argnums=1)
        out = cj(xp, STEPS)
        float(np.asarray(out)[-1])
        t0 = time.time()
        out = cj(xp, STEPS)
        float(np.asarray(out)[-1])
        dt = (time.time() - t0) / STEPS * 1e3
        results["spliced"] = round(dt, 1)
        print(f"spliced: {dt:.1f} ms/block", flush=True)

    print(json.dumps({"carriers": C, **results}), flush=True)


if __name__ == "__main__":
    main()
