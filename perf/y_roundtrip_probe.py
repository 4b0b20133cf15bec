"""Measured verdict on eliminating the y round-trip (r04 verdict item 4).

The fused chain materializes the synthesized band planes y
(C, 2, 128, P — ~671 MB/block at C=10240) to HBM between band_synth
and fused_backhalf because the O&M timing phasor must leave the synth
pass before the Catmull-Rom coefficients exist (BASELINE.md ~3.4 ms
attribution).  The only exactness-preserving elimination is:

    pre-pass: synthesize in VMEM, emit ONLY the phasor  (cost t_P)
    XLA:      atan2/coefficients on the phasor scalars  (unchanged)
    merged:   re-synthesize in VMEM and consume y in place

The merged kernel re-pays the synthesis, so the net win is

    net = t_BS + y_read - 2 t_P  ~=  2 t_BS - 3 t_P

(t_BS = full band_synth kernel stage, t_P = phasor-only stage,
y_read ~= y_write = t_BS - t_P).  This probe measures t_BS and t_P
scan-chained at bench geometry using the y_out=False band_synth
variant (_band_synth_phonly_kernel — the phasor reduction consumes
yre/yim, so the synthesis cannot be dead-coded) and prints the bound;
per CLAUDE.md rule 7 the merge is built only if the bound clears 2 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/y_roundtrip_probe.py
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

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _enable_compile_cache, _make_bank
    _enable_compile_cache()
    from tetraear_tpu.dsp import kernels
    from tetraear_tpu.dsp import pallas_kernels as pk
    from tetraear_tpu.dsp.backhalf import FusedRx

    C = int(os.environ.get("PERF_CARRIERS", "10240"))
    STEPS = int(os.environ.get("PERF_STEPS", "8"))
    bank, fs = _make_bank(C, None, "fft")
    block = bank.block_len
    ch = bank.channelizer
    fused = FusedRx(bank)
    print(f"fs={fs/1e6:.2f}M block={block} nfft={ch.nfft} P={fused.p} "
          f"y_bytes={C * 2 * 128 * fused.p * 4 / 1e6:.0f}MB", flush=True)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(block)
         + 1j * rng.standard_normal(block)).astype(np.complex64)
    xp = jnp.asarray(kernels.c2p_np(x))
    bs_group = int(os.environ.get("TETRAEAR_BS_GROUP", "32"))
    interp = jax.default_backend() != "tpu"

    results = {}

    def timed(name, chain_fn):
        cj = jax.jit(chain_fn, static_argnums=1)
        out = cj(xp, STEPS)
        float(np.asarray(out)[-1])
        t0 = time.time()
        out = cj(xp, STEPS)
        float(np.asarray(out)[-1])
        dt = (time.time() - t0) / STEPS * 1e3
        results[name] = round(dt, 1)
        print(f"{name}: {dt:.1f} ms/block", flush=True)

    def synth(planes, y_out):
        return pk.band_synth(
            planes, jnp.asarray(ch.h1_planes),
            jnp.asarray(ch.row_start), jnp.asarray(ch.d_shift),
            jnp.asarray(ch.m1c), jnp.asarray(ch.m2re),
            jnp.asarray(ch.m2im), jnp.asarray(ch.twre),
            jnp.asarray(ch.twim), ch.synth_rows, group=bs_group,
            interpret=interp, phasor_drop=ch.drop, y_out=y_out)

    def chain_planes(x_p, n):
        def body(carry, _2):
            tail_p = jnp.zeros((2, ch.overlap), jnp.float32)
            planes = ch.wideband_planes_spliced(tail_p, x_p + carry,
                                               interpret=interp)
            return planes[0, 0, 0] * 1e-30, planes[1, 0, 0]
        c, tails = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return tails

    def chain_full(x_p, n):
        def body(carry, _2):
            tail_p = jnp.zeros((2, ch.overlap), jnp.float32)
            planes = ch.wideband_planes_spliced(tail_p, x_p + carry,
                                               interpret=interp)
            y, ph = synth(planes, True)
            return y[0, 0, 0, 0] * 1e-30 + ph[0, 0, 0] * 1e-30, \
                ph[1, 0, 1]
        c, tails = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return tails

    def chain_phonly(x_p, n):
        def body(carry, _2):
            tail_p = jnp.zeros((2, ch.overlap), jnp.float32)
            planes = ch.wideband_planes_spliced(tail_p, x_p + carry,
                                               interpret=interp)
            ph = synth(planes, False)
            return ph[0, 0, 0] * 1e-30, ph[1, 0, 1]
        c, tails = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return tails

    timed("planes", chain_planes)
    timed("synth_full", chain_full)
    timed("synth_phonly", chain_phonly)

    t_bs = results["synth_full"] - results["planes"]
    t_p = results["synth_phonly"] - results["planes"]
    y_write = t_bs - t_p
    net = 2 * t_bs - 3 * t_p
    results.update({
        "bs_kernel_ms": round(t_bs, 1),
        "phonly_kernel_ms": round(t_p, 1),
        "y_write_ms": round(y_write, 1),
        "net_win_bound_ms": round(net, 1),
        "verdict": ("build the merge" if net > 2.0
                    else "do NOT build: net win under the 2 ms bar"),
    })
    print(json.dumps({"carriers": C, **results}))


if __name__ == "__main__":
    main()
