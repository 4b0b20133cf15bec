"""Micro-probe: the bit-placement sandwich block of the fused back half.

Isolates the 5-class E @ (pm @ F) product chain at bench shapes to
attribute its measured ~10 ms/block.  Variants:
  full    — the real block (5 classes, both planes)
  one     — a single class (overhead vs compute scaling)
  nocast  — skip the f32->bf16 recast of inner
Run: PYTHONPATH=/root/repo python perf/place_probe.py
"""

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    group, sy, z_rows, n_m = 8, 16, 44, 5
    gc, gz = group * 128, group * z_rows
    c_n = 10240
    steps = 1280                     # same grid count as the bench

    rng = np.random.default_rng(0)
    pm_all = (rng.integers(0, 2, (c_n // group, sy, gc))
              .astype(np.float32))
    epl = rng.integers(0, 2, (n_m, gz, gc)).astype(np.float32)
    fpl = rng.integers(0, 2, (n_m, 2, sy, 128)).astype(np.float32)

    def make(n_classes, cast):
        def kern(pm_ref, epl_ref, fpl_ref, o_ref):
            pm = pm_ref[0].astype(jnp.bfloat16)
            z = jnp.zeros((gz, 128), jnp.float32)
            for mi in range(n_classes):
                inner = (jax.lax.dot_general(
                    pm, fpl_ref[mi, 0].astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        pm, fpl_ref[mi, 1].astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                if cast:
                    inner = inner.astype(jnp.bfloat16)
                    z = z + jax.lax.dot_general(
                        epl_ref[mi].astype(jnp.bfloat16), inner,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    z = z + jax.lax.dot_general(
                        epl_ref[mi], inner,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            o_ref[...] = z

        return pl.pallas_call(
            kern,
            grid_spec=pl.GridSpec(
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec((1, sy, gc), lambda i: (i, 0, 0)),
                    pl.BlockSpec((n_m, gz, gc), lambda i: (0, 0, 0)),
                    pl.BlockSpec((n_m, 2, sy, 128),
                                 lambda i: (0, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((gz, 128), lambda i: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((gz, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )

    def timed(name, fn, *args):
        o = fn(*args)
        float(np.asarray(o)[0, 0])
        t0 = time.time()
        o = fn(*args)
        float(np.asarray(o)[0, 0])
        print(f"{name}: {(time.time() - t0) * 1e3:.1f} ms", flush=True)

    # the SHIPPED form (pallas_kernels.py fused back half): the flat
    # (G*Z, G*128) placement matrices are I_G (x) B block-diagonals, so
    # the outer product runs as a BATCHED matmul over the sublane
    # regroup (G, 128, 128) with tiny (G, Z, 128)-tiled operands
    z_r = z_rows
    epl_t = np.zeros((n_m, group, z_r, 128), np.float32)
    for mi in range(n_m):
        for gi in range(group):
            epl_t[mi, gi] = epl[mi, gi * z_r:(gi + 1) * z_r,
                                gi * 128:(gi + 1) * 128]

    def make_bdiag(n_classes):
        def kern(pm_ref, epl_ref, fpl_ref, o_ref):
            pm = pm_ref[0].astype(jnp.bfloat16)
            z = jnp.zeros((gz, 128), jnp.float32)
            for mi in range(n_classes):
                inner = (jax.lax.dot_general(
                    pm, fpl_ref[mi, 0].astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        pm, fpl_ref[mi, 1].astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)) \
                    .astype(jnp.bfloat16).reshape(group, 128, 128)
                z = z + jax.lax.dot_general(
                    epl_ref[mi].astype(jnp.bfloat16), inner,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32).reshape(gz, 128)
            o_ref[...] = z

        return pl.pallas_call(
            kern,
            grid_spec=pl.GridSpec(
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec((1, sy, gc), lambda i: (i, 0, 0)),
                    pl.BlockSpec((n_m, group, z_r, 128),
                                 lambda i: (0, 0, 0, 0)),
                    pl.BlockSpec((n_m, 2, sy, 128),
                                 lambda i: (0, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((gz, 128), lambda i: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((gz, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )

    a = jnp.asarray(pm_all)
    e = jnp.asarray(epl)
    et = jnp.asarray(epl_t)
    f = jnp.asarray(fpl)
    timed("full(5cls,cast)", make(5, True), a, e, f)
    timed("one(1cls,cast)", make(1, True), a, e, f)
    timed("full-nocast", make(5, False), a, e, f)
    timed("bdiag(5cls)", make_bdiag(5), a, et, f)
    timed("bdiag(1cls)", make_bdiag(1), a, et, f)


if __name__ == "__main__":
    main()
