"""Probe: frame-scan kernel variants on the real chip.

Findings that shaped dsp/framescan (C=10240, NBITS=4884, one v5e):
  corr  152 ms — a 2-output-channel conv wastes 126/128 MXU lanes
  topk  148 ms — lax.top_k itself is free
  gather 2314 ms — take_along_axis element gather: never emit on TPU
  dense 181 ms — the 33-channel CRC conv adds only ~30 ms to corr
  packed  ~14 ms — ONE stride-8 280-channel bf16 conv (the shipped path)
Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site \
    python perf/framescan_sparse_probe.py
"""

import json
import os
import signal
import time

import numpy as np


def main():
    budget = int(os.environ.get("PERF_TIMEOUT_S", "1800"))
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

    C = int(os.environ.get("PERF_CARRIERS", "10240"))
    NBITS = int(os.environ.get("PERF_NBITS", "8600"))
    STEPS = int(os.environ.get("PERF_STEPS", "4"))
    K = 64

    rng = np.random.default_rng(0)
    bits0 = rng.integers(0, 2, (C, NBITS)).astype(np.uint8)
    def v_corr(bits):
        return {"corr": framescan.sync_corr(bits)}

    def v_topk(bits):
        corr = framescan.sync_corr(bits)
        _, p = jax.lax.top_k(corr, K)
        return {"p": p}

    def v_packed(bits):
        return framescan.frame_scan_packed(bits)

    def v_packed_mm(bits):
        return framescan.frame_scan_packed_mm(bits)

    def v_dense(bits):
        return framescan.frame_scan(bits)

    results = {}
    for name, fn in (("corr", v_corr), ("topk", v_topk),
                     ("packed", v_packed),
                     ("packed_mm", v_packed_mm), ("dense", v_dense)):
        def chain(bits, n, _fn=fn):
            def body(b, _):
                r = _fn(b)
                # consume EVERY output (otherwise XLA DCEs the op under
                # measurement): reduce each leaf to one scalar
                tot = jnp.float32(0)
                for leaf in jax.tree_util.tree_leaves(r):
                    tot = tot + jnp.sum(leaf.astype(jnp.float32))
                b2 = b.at[:, 0].set(
                    (tot.astype(jnp.int32) & 1).astype(jnp.uint8))
                return b2, tot
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

    print(json.dumps({"sparse_probe_ms": results, "carriers": C,
                      "nbits": NBITS}))


if __name__ == "__main__":
    main()
