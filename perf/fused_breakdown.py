"""Perf breakdown of the FUSED rx path at C=10240 (the bench body).

Scan-chained stages on the real chip (CLAUDE.md rule 5b):
  fft      — wideband four-step forward FFT alone
  planes   — fft + natural-order transpose + wrap concat + [re,im]
             planes (the exact chan_raw glue)
  synth    — planes + band_synth Pallas kernel (+ fused O&M phasor)
  step     — the full FusedRx.step (adds the fused back-half kernel
             and the timing glue)

Deltas localize: band kernel cost = synth - planes; back half =
step - synth.  Run:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/fused_breakdown.py
Env: PERF_CARRIERS (10240), PERF_STEPS (8), PERF_ONLY ("fft,planes,..").
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
    from tetraear_tpu.dsp import pallas_kernels as pk
    from tetraear_tpu.dsp.backhalf import FusedRx

    C = int(os.environ.get("PERF_CARRIERS", "10240"))
    STEPS = int(os.environ.get("PERF_STEPS", "8"))
    bank, fs = _make_bank(C, None, "fft")
    block = bank.block_len
    ch = bank.channelizer
    fused = FusedRx(bank)
    print(f"fs={fs/1e6:.2f}M block={block} nfft={ch.nfft} "
          f"n_band={ch.n_band} decim={ch.decim} P={fused.p}", flush=True)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(block)
         + 1j * rng.standard_normal(block)).astype(np.complex64)
    xd = jnp.asarray(kernels.c2r_np(x))
    xp = jnp.asarray(kernels.c2p_np(x))   # planar: the fused-path feed

    results = {}
    only = [s for s in os.environ.get("PERF_ONLY", "").split(",") if s]

    def timed(name, chain_fn, xin=None):
        if only and name not in only:
            return
        xin = xd if xin is None else xin
        cj = jax.jit(chain_fn, static_argnums=1)
        out = cj(xin, STEPS)
        float(np.asarray(out)[-1])
        t0 = time.time()
        out = cj(xin, STEPS)
        float(np.asarray(out)[-1])
        dt = (time.time() - t0) / STEPS * 1e3
        results[name] = round(dt, 1)
        print(f"{name}: {dt:.1f} ms/block", flush=True)

    def chain_fft(x_r, n):
        def body(carry, _2):
            xx = jnp.concatenate(
                [jnp.zeros(ch.overlap, jnp.complex64),
                 kernels.r2c(x_r) + carry])
            X = ch._wideband_fft(xx)
            return X[0] * 1e-30, X[1].real
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    timed("fft", chain_fft)

    def chain_planes(x_r, n):
        def body(carry, _2):
            xx = jnp.concatenate(
                [jnp.zeros(ch.overlap, jnp.complex64),
                 kernels.r2c(x_r) + carry])
            X = ch._wideband_fft(xx)
            x_ext = jnp.concatenate([X, X[:ch.n_band]])
            planes = jnp.stack([jnp.real(x_ext), jnp.imag(x_ext)])
            planes = planes.reshape(2, -1, 128)
            return planes[0, 0, 0] * 1e-30 + 0j, planes[1, 0, 0]
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    timed("planes", chain_planes)

    # two-pass Pallas MXU FFT producing the same planes (+wrap) directly
    def chain_planes2p(x_r, n):
        def body(carry, _2):
            xx = jnp.concatenate(
                [jnp.zeros(ch.overlap, jnp.complex64),
                 kernels.r2c(x_r) + carry])
            planes = ch.wideband_planes(xx)
            return planes[0, 0, 0] * 1e-30 + 0j, planes[1, 0, 0]
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    if ch.fft2p_ok:
        timed("planes2p", chain_planes2p)

    # spliced pass-1 input: no r2c/concat/stack glue at all (the
    # production chan_raw path whenever ch.fft2p_splice)
    def chain_planes2s(x_p, n):
        def body(carry, _2):
            tail_p = jnp.zeros((2, ch.overlap), jnp.float32)
            planes = ch.wideband_planes_spliced(tail_p, x_p + carry)
            return planes[0, 0, 0] * 1e-30, planes[1, 0, 0]
        c, tails = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return tails

    if getattr(ch, "fft2p_splice", False):
        timed("planes2s", chain_planes2s, xp)

    def chain_synth(x_r, n):
        st0 = fused.init_state()["bank"]["channelizer"]

        def body(st, _2):
            y, ph, rot, st2 = fused.chan_raw(x_r, st)
            return st2, y[0, 0, 0, 0] + ph[0, 0, 0]
        st, tails = jax.lax.scan(body, st0, None, length=n)
        return tails

    timed("synth", chain_synth, xp)

    def chain_step(x_r, n):
        st0 = fused.init_state()

        def body(st, _2):
            out, st2 = fused.step(x_r, st)
            return st2, out["corr"][0, 0] + out["crc_err"][0, 0]
        st, tails = jax.lax.scan(body, st0, None, length=n)
        return tails

    timed("step", chain_step, xp)

    results["block_ms_realtime"] = round(block / fs * 1e3, 1)
    print(json.dumps({"carriers": C, **results}))


if __name__ == "__main__":
    main()
