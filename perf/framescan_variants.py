"""Perf experiment: frame-scan kernel variants on the real chip.

Scan-chained timing (CLAUDE.md rule 5b): S steps with a carried
dependency, clock stopped after a dependent fetch.  Variants:
  base   — current f32 convs (dsp/framescan.py)
  bf16   — conv inputs/kernels cast to bf16 (exact: integer sums < 256)
  fused  — sync + CRC + degenerate as ONE 35-channel conv
Run: python tools_perf_framescan.py  (real TPU; in-process alarm)
"""

import json
import os
import signal
import time

import numpy as np


def main():
    budget = int(os.environ.get("PERF_TIMEOUT_S", "1500"))
    signal.signal(signal.SIGALRM,
                  lambda *a: (_ for _ in ()).throw(TimeoutError()))
    signal.alarm(budget)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from tetraear_tpu.dsp import framescan

    C = int(os.environ.get("PERF_CARRIERS", "1024"))
    NBITS = int(os.environ.get("PERF_NBITS", "4874"))
    STEPS = int(os.environ.get("PERF_STEPS", "20"))

    rng = np.random.default_rng(0)
    bits0 = rng.integers(0, 2, (C, NBITS)).astype(np.uint8)

    kernel_f32 = jnp.asarray(framescan._CRC_KERNEL)
    kernel_bf16 = kernel_f32.astype(jnp.bfloat16)
    pat_f32 = jnp.asarray(framescan._PATTERNS) * 2.0 - 1.0

    def variant_base(bits):
        return framescan.frame_scan(bits)

    def variant_bf16(bits):
        x = bits.astype(jnp.bfloat16)
        out = jax.lax.conv_general_dilated(
            x[:, None, :], kernel_bf16, window_strides=(1,),
            padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"))
        out_i = jnp.round(out.astype(jnp.float32)).astype(jnp.int32)
        xs = bits.astype(jnp.bfloat16) * 2.0 - 1.0
        sy = jax.lax.conv_general_dilated(
            xs[:, None, :], pat_f32.astype(jnp.bfloat16)[:, None, :],
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        corr = (jnp.max(sy.astype(jnp.float32), axis=1) + 22.0) / 44.0
        return {"corr": corr, "crc_raw": out_i}

    def variant_fused(bits):
        # one conv: 33 CRC channels + 2 sync channels (sync kernel padded
        # to length 230; +-1 patterns recentred to {0,1} domain:
        # corr_pm = 2*conv(x, pat01) - (conv(x, ones22)) ... simpler:
        # compute on the +-1 plane is a separate pass anyway, so just
        # append the CRC's recv taps; here we merely test conv-size
        # scaling with 35 channels.
        k35 = jnp.concatenate(
            [kernel_f32,
             jnp.zeros((2, 1, 230), jnp.float32)
             .at[:, 0, :22].set(pat_f32)], axis=0)
        x = bits.astype(jnp.float32)
        out = jax.lax.conv_general_dilated(
            x[:, None, :], k35, window_strides=(1,),
            padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"))
        return {"out": out}

    results = {}
    for name, fn in (("base", variant_base), ("bf16", variant_bf16),
                     ("fused", variant_fused)):
        def chain(bits, n, _fn=fn):
            def body(b, _):
                r = _fn(b)
                leaf = jax.tree_util.tree_leaves(r)[0]
                flat = leaf.reshape(leaf.shape[0], -1)
                # carried dependency: flip one bit based on the result
                b2 = b.at[:, 0].set(
                    (flat[:, 0].astype(jnp.int32) & 1).astype(jnp.uint8))
                return b2, flat[0, 0]
            b, tails = jax.lax.scan(body, bits, None, length=n)
            return b, tails

        cj = jax.jit(chain, static_argnums=1)
        b, tails = cj(jnp.asarray(bits0), STEPS)
        float(np.asarray(tails)[-1])
        t0 = time.time()
        b, tails = cj(jnp.asarray(bits0), STEPS)
        float(np.asarray(tails)[-1])
        dt = time.time() - t0
        per_block_ms = dt / STEPS * 1e3
        results[name] = round(per_block_ms, 2)
        print(f"{name}: {per_block_ms:.2f} ms/block "
              f"({C} carriers x {NBITS} bits)", flush=True)

    print(json.dumps({"framescan_ms_per_block": results,
                      "carriers": C, "nbits": NBITS}))


if __name__ == "__main__":
    main()
