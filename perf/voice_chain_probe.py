"""Probe: localize the bench voice-chain cost (BENCH_MODE=voice).

The jspeech probe sustains ~9.5M frames/s at B=4096, yet the bench
voice chain measured rt 0.3 at C=1024 (agenda8) — ~500x apart.  This
decomposes the chain, scan-chained with carried state and a dependent
final fetch (CLAUDE.md rule 5b):

  step      fused.step only (reference point)
  soft      + soft_symbols + slot slices + round-to-int8
  vit       + jviterbi.channel_decode_batch_traced (2C, 432)
  unb       + unbuild permutation gathers -> (C, 4, 138)
  jsp       + jspeech.decode_block (the full voice chain)
  jsponly   jspeech.decode_block alone on constant frames (no demod)

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/voice_chain_probe.py
Env: PERF_CARRIERS (1024), PERF_STEPS (8), PERF_ONLY, PERF_TIMEOUT_S.
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
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _make_bank
    from tetraear_tpu.dsp import kernels
    from tetraear_tpu.dsp.backhalf import FusedRx
    from tetraear_tpu.voice import jspeech, jviterbi
    from tetraear_tpu.voice.etsi_tables import TAB0, TAB1, TAB2

    c = int(os.environ.get("PERF_CARRIERS", "1024"))
    steps = int(os.environ.get("PERF_STEPS", "8"))
    bank, fs = _make_bank(c, None, "fft")
    block = bank.block_len
    fused = FusedRx(bank)
    print(f"C={c} fs={fs/1e6:.2f}M block={block} "
          f"rt_ms={block / fs * 1e3:.1f}", flush=True)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(block)
         + 1j * rng.standard_normal(block)).astype(np.complex64)
    xd = jnp.asarray(kernels.c2r_np(x))
    pos = np.concatenate([TAB0, TAB1, TAB2]) - 1
    inv = np.argsort(pos).astype(np.int32)
    o1, o2 = 100, 500

    results = {"carriers": c, "rt_ms": round(block / fs * 1e3, 1)}
    only = [s for s in os.environ.get("PERF_ONLY", "").split(",") if s]

    def timed(name, chain_fn, init_fn, fetch):
        if only and name not in only:
            return
        cj = jax.jit(chain_fn, static_argnums=2)
        fetch(cj(xd, init_fn(), steps))
        t0 = time.time()
        fetch(cj(xd, init_fn(), steps))
        dt = (time.time() - t0) / steps * 1e3
        results[name] = round(dt, 1)
        print(f"{name}: {dt:.1f} ms/block", flush=True)

    def soft_slots(out):
        soft = fused.soft_symbols(out["soft_planes"])
        s1 = jax.lax.slice_in_dim(soft, o1, o1 + 216, 1, axis=1)
        s2 = jax.lax.slice_in_dim(soft, o2, o2 + 216, 1, axis=1)
        sb = jnp.concatenate([s1, s2], axis=0)
        return jnp.round(sb.reshape(sb.shape[0], 432)
                         * 127.0).astype(jnp.int32)

    def unbuild(ordered, bfi):
        fa = ordered[:, 2 * jnp.asarray(inv)]
        fb = ordered[:, 2 * jnp.asarray(inv) + 1]
        fr = jnp.stack([fa, fb], axis=1).astype(jnp.int32)
        b = jnp.broadcast_to(bfi[:, None, None].astype(jnp.int32),
                             (fr.shape[0], 2, 1))
        return jnp.concatenate([b, fr], axis=2)

    def frames_of(out):
        sb = soft_slots(out)
        ordered, bfi = jviterbi.channel_decode_batch_traced(sb)
        fr1 = unbuild(ordered[:c], bfi[:c])
        fr2 = unbuild(ordered[c:], bfi[c:])
        return jnp.concatenate([fr1, fr2], axis=1)      # (C, 4, 138)

    # ---- chains -----------------------------------------------------
    def mk(body):
        def chain(x_r, st0, n):
            def f(carry, _):
                return body(carry, x_r)
            carry, _ = jax.lax.scan(f, st0, None, length=n)
            return carry
        return chain

    def b_step(carry, x_r):
        st, acc = carry
        out, st2 = fused.step(x_r, st)
        return (st2, acc + out["corr"][0, 0]), None

    timed("step", mk(b_step),
          lambda: (fused.init_state(), jnp.float32(0)),
          lambda o: float(np.asarray(o[1])))

    def b_soft(carry, x_r):
        st, acc = carry
        out, st2 = fused.step(x_r, st)
        sb = soft_slots(out)
        return (st2, acc + sb[0, 0].astype(jnp.float32)), None

    timed("soft", mk(b_soft),
          lambda: (fused.init_state(), jnp.float32(0)),
          lambda o: float(np.asarray(o[1])))

    def b_vit(carry, x_r):
        st, acc = carry
        out, st2 = fused.step(x_r, st)
        sb = soft_slots(out)
        ordered, bfi = jviterbi.channel_decode_batch_traced(sb)
        return (st2, acc + ordered[0, 0].astype(jnp.float32)
                + bfi[0].astype(jnp.float32)), None

    timed("vit", mk(b_vit),
          lambda: (fused.init_state(), jnp.float32(0)),
          lambda o: float(np.asarray(o[1])))

    def b_unb(carry, x_r):
        st, acc = carry
        out, st2 = fused.step(x_r, st)
        frames = frames_of(out)
        return (st2, acc + frames[0, 0, 0].astype(jnp.float32)), None

    timed("unb", mk(b_unb),
          lambda: (fused.init_state(), jnp.float32(0)),
          lambda o: float(np.asarray(o[1])))

    def b_jsp(carry, x_r):
        st, sst, acc = carry
        out, st2 = fused.step(x_r, st)
        frames = frames_of(out)
        valid = jnp.ones((c, 4), bool)
        sst2, pcm = jspeech.decode_block(sst, frames, valid)
        return (st2, sst2, acc + pcm[0, 0, 0].astype(jnp.float32)), None

    timed("jsp", mk(b_jsp),
          lambda: (fused.init_state(), jspeech.init_state(c),
                   jnp.float32(0)),
          lambda o: float(np.asarray(o[2])))

    # jspeech alone, same shapes, no demod in the loop
    fr_const = jnp.asarray(
        rng.integers(0, 2, (c, 4, 138)).astype(np.int32))

    def b_jsponly(carry, _x):
        sst, acc = carry
        fr = fr_const.at[:, :, 0].set(
            (acc.astype(jnp.int32) & 1))       # data dependency
        sst2, pcm = jspeech.decode_block(sst, fr,
                                         jnp.ones((c, 4), bool))
        return (sst2, acc + pcm[0, 0, 0].astype(jnp.float32)), None

    timed("jsponly", mk(b_jsponly),
          lambda: (jspeech.init_state(c), jnp.float32(0)),
          lambda o: float(np.asarray(o[1])))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
