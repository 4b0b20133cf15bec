"""Perf probe: the fused back half vs the classic e2e chain.

Scan-chains FusedRx.step at the bench config and reports ms/block next
to the classic e2e figure (perf/channelizer_breakdown.py 'e2e').
Run: PYTHONPATH=/root/repo python perf/backhalf_fused_probe.py
Env: PERF_CARRIERS (10240), PERF_STEPS (8), PERF_TIMEOUT_S (2400).
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
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _make_bank
    from tetraear_tpu.dsp import framescan, kernels
    from tetraear_tpu.dsp.backhalf import FusedRx

    c_n = int(os.environ.get("PERF_CARRIERS", "10240"))
    steps = int(os.environ.get("PERF_STEPS", "8"))
    bank, fs = _make_bank(c_n, None, "fft")
    fused = FusedRx(bank)
    block = bank.block_len
    print(f"fs={fs/1e6:.2f}M block={block} drop={fused.drop} "
          f"P={fused.p} k_max={fused.k_max}", flush=True)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(block)
         + 1j * rng.standard_normal(block)).astype(np.complex64)
    xd = jnp.asarray(kernels.c2r_np(x))

    if os.environ.get("PERF_CHANPH") == "1":
        # channelizer + fused phasor alone (kernel A share of the block)
        def chain_ch(x_r, n):
            st0 = fused.init_state()["bank"]["channelizer"]

            def body(st, _):
                y, ph, rot, st2 = fused.chan_raw(x_r, st)
                return st2, y[0, 0, 0, 0] + ph[0, 0, 0]

            st, tails = jax.lax.scan(body, st0, None, length=n)
            return st, tails

        cj = jax.jit(chain_ch, static_argnums=1)
        out = cj(xd, steps)
        float(np.asarray(out[1])[-1])
        t0 = time.time()
        out = cj(xd, steps)
        float(np.asarray(out[1])[-1])
        dt = (time.time() - t0) / steps * 1e3
        print(json.dumps({"carriers": c_n, "chanph_ms": round(dt, 1)}))
        return

    def chain(x_r, n):
        st0 = fused.init_state()
        off = framescan.TS_OFFSET_BITS // 2

        def body(carry, _):
            st, nhit, nok = carry
            out, st2 = fused.step(x_r, st)
            hits = out["corr"] >= 0.90
            span = min(hits.shape[1] - off, out["crc_err"].shape[1])
            sync_al = jax.lax.slice_in_dim(hits, off, off + span, 1,
                                           axis=1)
            crc_al = jax.lax.slice_in_dim(out["crc_err"], 0, span, 1,
                                          axis=1)
            nhit = nhit + jnp.sum(hits.astype(jnp.int32))
            nok = nok + jnp.sum((sync_al & (crc_al <= 2))
                                .astype(jnp.int32))
            return (st2, nhit, nok), None

        (st, nhit, nok), _ = jax.lax.scan(
            body, (st0, jnp.int32(0), jnp.int32(0)), None, length=n)
        return st, nhit, nok

    cj = jax.jit(chain, static_argnums=1)
    out = cj(xd, steps)
    fetch = (np.asarray(out[0]["bank"]["timing"]["next_t"])[0],
             int(out[1]), int(out[2]))
    print(f"warm fetch: nhit={fetch[1]} nok={fetch[2]}", flush=True)
    t0 = time.time()
    out = cj(xd, steps)
    _ = (np.asarray(out[0]["bank"]["timing"]["next_t"])[0],
         int(out[1]), int(out[2]))
    dt = (time.time() - t0) / steps * 1e3
    rt = block / fs * 1e3
    print(json.dumps({"carriers": c_n, "fused_e2e_ms": round(dt, 1),
                      "block_ms_realtime": round(rt, 1),
                      "rt_factor": round(rt / dt, 2)}))


if __name__ == "__main__":
    main()
