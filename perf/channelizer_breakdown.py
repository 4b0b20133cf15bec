"""Perf breakdown: where does the C=10240 demod block go?

Scan-chained variants on the real chip:
  fft      — the 2^25-point wideband forward FFT alone
  chan     — full channelizer step (FFT + band extract + ifft + phase)
  demod    — full carrier-bank step (channelizer + back half + timing)
Run: python tools_perf_channelizer.py
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

    import math
    from tetraear_tpu.dsp import kernels
    from tetraear_tpu.dsp.pipeline import CarrierBankDemod

    C = int(os.environ.get("PERF_CARRIERS", "10240"))
    STEPS = int(os.environ.get("PERF_STEPS", "4"))
    needed = max(10.24e6, C * 25_000 * 1.15)
    fs = 10.24e6 * 2 ** max(0, math.ceil(math.log2(needed / 10.24e6)))
    offsets = [(i - C // 2) * 25_000 + 12_500 for i in range(C)]
    bank = CarrierBankDemod(fs=fs, freqs_hz=offsets, frontend="fft")
    block = bank.block_len
    ch = bank.channelizer
    print(f"fs={fs/1e6:.2f}M block={block} nfft={ch.nfft} "
          f"n_band={ch.n_band} decim={ch.decim}", flush=True)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(block)
         + 1j * rng.standard_normal(block)).astype(np.complex64)
    xd = jnp.asarray(kernels.c2r_np(x))

    results = {}

    def timed(name, chain_fn, init_state):
        cj = jax.jit(chain_fn, static_argnums=1)
        out = cj(xd, STEPS, init_state)
        float(np.asarray(out)[-1])        # fetch: relay-proof sync
        t0 = time.time()
        out = cj(xd, STEPS, init_state)
        float(np.asarray(out)[-1])
        dt = (time.time() - t0) / STEPS * 1e3
        results[name] = round(dt, 1)
        print(f"{name}: {dt:.1f} ms/block", flush=True)

    # (a) forward FFT alone, scan-chained via a value dependency
    def chain_fft(x_r, n, _):
        def body(carry, _2):
            x = kernels.r2c(x_r) + carry
            X = jnp.fft.fft(jnp.concatenate(
                [jnp.zeros(ch.overlap, jnp.complex64), x]))
            return X[0], X[1].real
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    timed("fft", chain_fft, None)

    # (b) channelizer step
    def chain_chan(x_r, n, _):
        st0 = ch.init_state()

        def body(st, _2):
            y, st2 = ch.step(kernels.r2c(x_r), st)
            return st2, y[0, 0].real
        st, tails = jax.lax.scan(body, st0, None, length=n)
        return tails

    timed("chan", chain_chan, None)

    # (c) full demod step
    def chain_demod(x_r, n, _):
        st0 = bank.init_state()

        def body(st, _2):
            out, st2 = bank._step_impl(x_r, st)
            return st2, out["hard"][0, 0]
        st, tails = jax.lax.scan(body, st0, None, length=n)
        return tails

    timed("demod", chain_demod, None)

    results["block_ms_realtime"] = round(block / fs * 1e3, 1)
    print(json.dumps({"carriers": C, **results}))


if __name__ == "__main__":
    main()
