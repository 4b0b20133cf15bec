"""Probe: which elementwise ops lower in Mosaic on this backend.

The fused back-half kernel needs cos/sin (ramp generation), floor/mod
(timing arithmetic) and ideally arctan2 (O&M angle) inside the kernel.
Each op gets its own tiny pallas_call so one failure doesn't mask the
rest.  Run on the TPU: PYTHONPATH=/root/repo python perf/mosaic_ops_probe.py
"""

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = np.linspace(0.1, 6.0, 8 * 128, dtype=np.float32).reshape(8, 128)
    y = (x * 0.5 + 0.3).astype(np.float32)

    def probe(name, fn, nin=1):
        def kern(a_ref, b_ref, o_ref):
            if nin == 1:
                o_ref[...] = fn(a_ref[...])
            else:
                o_ref[...] = fn(a_ref[...], b_ref[...])

        try:
            out = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0)),
                          pl.BlockSpec((8, 128), lambda: (0, 0))],
                out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(jnp.asarray(x), jnp.asarray(y))
            ref = fn(x, y) if nin == 2 else fn(x)
            err = float(np.max(np.abs(np.asarray(out) - ref)))
            print(f"{name}: OK maxerr={err:.3e}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)

    probe("cos", jnp.cos)
    probe("sin", jnp.sin)
    probe("floor", jnp.floor)
    probe("mod", lambda a, b: jnp.mod(a, b), nin=2)
    probe("arctan2", lambda a, b: jnp.arctan2(a, b), nin=2)
    probe("exp", jnp.exp)
    probe("rsqrt", jax.lax.rsqrt)
    probe("round", jnp.round)
    probe("sign_select", lambda a: jnp.where(a < 3.0, a, -a))


def main2():
    """Layout probes for the fused back-half kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def run(name, kern, out_shape, *args):
        try:
            out = pl.pallas_call(kern, out_shape=out_shape)(*args)
            print(f"{name}: OK {np.asarray(out).ravel()[:3]}", flush=True)
            return np.asarray(out)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
            return None

    import numpy as np
    a = np.arange(128 * 64, dtype=np.float32).reshape(128, 64)
    col = np.arange(128, dtype=np.float32).reshape(128, 1)

    # (128,1) x (128,64) broadcast multiply
    def k_bcast(a_ref, c_ref, o_ref):
        o_ref[...] = a_ref[...] * c_ref[...]

    got = run("bcast_col", k_bcast,
              jax.ShapeDtypeStruct((128, 64), jnp.float32),
              jnp.asarray(a), jnp.asarray(col))
    if got is not None:
        assert np.allclose(got, a * col), "bcast_col WRONG VALUES"
        print("bcast_col values ok", flush=True)

    # iota-built selector matmul (the S-matrix build)
    def k_sel(a_ref, o_ref):
        lam = jax.lax.broadcasted_iota(jnp.int32, (64, 16), 0)
        uu = jax.lax.broadcasted_iota(jnp.int32, (64, 16), 1)
        s = jnp.where(lam == 4 * uu + 3, 2.0, 0.0).astype(jnp.float32)
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], s, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    got = run("iota_sel_mm", k_sel,
              jax.ShapeDtypeStruct((128, 16), jnp.float32),
              jnp.asarray(a))
    if got is not None:
        lam = np.arange(64)[:, None]
        s = np.where(lam == 4 * np.arange(16)[None, :] + 3, 2.0, 0.0)
        assert np.allclose(got, a @ s), "iota_sel WRONG"
        print("iota_sel values ok", flush=True)

    # full-reduce to scalar, write into a (1,128) lane-indexed row
    def k_red(a_ref, o_ref):
        s0 = jnp.sum(a_ref[...])
        s1 = jnp.sum(a_ref[...] * a_ref[...])
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        o_ref[...] = (jnp.where(lane == 0, s0, 0.0)
                      + jnp.where(lane == 1, s1, 0.0))

    got = run("scalar_red_row", k_red,
              jax.ShapeDtypeStruct((1, 128), jnp.float32),
              jnp.asarray(a))
    if got is not None:
        assert abs(got[0, 0] - a.sum()) < 1e-2 * abs(a.sum())
        print("scalar_red values ok", flush=True)


if __name__ == "__main__":
    main()
    main2()
