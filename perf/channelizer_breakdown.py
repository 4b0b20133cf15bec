"""Perf breakdown: where does the C=10240 block go? (72 kHz-family fs)

Scan-chained variants on the real chip:
  fft        — the wideband forward FFT alone
  chan_al    — channelizer step with the quantized corrections DISABLED
               (aligned-style row gather; wrong values, right cost)
  chan       — full channelizer step (+ rolled H1 gather + d ramp)
  demod      — full carrier-bank step (channelizer + RRC + timing)
  e2e        — demod + bit interleave + packed frame scan (bench body)
Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/channelizer_breakdown.py
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

    C = int(os.environ.get("PERF_CARRIERS", "10240"))
    STEPS = int(os.environ.get("PERF_STEPS", "8"))
    bank, fs = _make_bank(C, None, "fft")
    block = bank.block_len
    ch = bank.channelizer
    print(f"fs={fs/1e6:.2f}M block={block} nfft={ch.nfft} "
          f"n_band={ch.n_band} decim={ch.decim} quantized={ch.quantized}",
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
        float(np.asarray(out)[-1])        # fetch: relay-proof sync
        t0 = time.time()
        out = cj(xd, STEPS)
        float(np.asarray(out)[-1])
        dt = (time.time() - t0) / STEPS * 1e3
        results[name] = round(dt, 1)
        print(f"{name}: {dt:.1f} ms/block", flush=True)

    # (a) forward FFT alone, scan-chained via a value dependency
    def chain_fft(x_r, n):
        def body(carry, _2):
            x = kernels.r2c(x_r) + carry
            X = jnp.fft.fft(jnp.concatenate(
                [jnp.zeros(ch.overlap, jnp.complex64), x]))
            return X[0], X[1].real
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    timed("fft", chain_fft)

    # (b) channelizer step, quantized corrections on/off
    def make_chain_chan():
        def chain(x_r, n):
            st0 = ch.init_state()

            def body(st, _2):
                y, st2 = ch.step(kernels.r2c(x_r), st)
                return st2, y[0, 0].real
            st, tails = jax.lax.scan(body, st0, None, length=n)
            return tails
        return chain

    if ch.quantized and os.environ.get("PERF_CHAN_AL"):
        ch.quantized = False
        timed("chan_al", make_chain_chan())
        ch.quantized = True
    timed("chan", make_chain_chan())

    # (b2) channelizer sub-stages (mirrors the CURRENT step): fft +
    # extract + natural-order H1 multiply, then + synthesis (MXU
    # matmul-ifft or jnp.fft per synth=...) — deltas localize
    # gather/multiply vs transform
    def make_chain_x(with_synth, use_fft=False):
        def chain(x_r, n):
            def body(carry, _2):
                x = kernels.r2c(x_r) + carry
                xx = jnp.concatenate(
                    [jnp.zeros(ch.overlap, jnp.complex64), x])
                X = jnp.fft.fft(xx)
                x_ext = jnp.concatenate([X, X[:ch.n_band]])
                rows = x_ext.reshape(-1, 128)
                nat = rows[jnp.asarray(ch.row_idx)].reshape(
                    len(ch.k_c), ch.n_band)
                if ch.quantized:
                    band = nat * jnp.asarray(ch.h1_roll)[jnp.asarray(
                        ch.d_shift)]
                else:
                    band = nat * jnp.asarray(ch.h1_band)[None, :]
                if not with_synth:
                    return band[0, 0] * 1e-30, band[0, 1].real
                if use_fft:
                    y = jnp.fft.ifft(band, axis=1)
                else:
                    y = ch._synth(band)
                return y[0, 0] * 1e-30, y[0, 1].real
            c2, tails = jax.lax.scan(body, jnp.complex64(0), None,
                                     length=n)
            return tails
        return chain

    if os.environ.get("PERF_CHAN_SUB"):
        timed("x1", make_chain_x(False))
        timed("x2", make_chain_x(True))
        timed("x2f", make_chain_x(True, use_fft=True))

    # (c) full demod step
    def chain_demod(x_r, n):
        st0 = bank.init_state()

        def body(st, _2):
            out, st2 = bank._step_impl(x_r, st)
            return st2, out["hard"][0, 0]
        st, tails = jax.lax.scan(body, st0, None, length=n)
        return tails

    timed("demod", chain_demod)

    # (c2) channelizer + timing recovery only (no DQPSK): isolates the
    # interpolator from the differential demod inside the back half
    def chain_tim(x_r, n):
        from tetraear_tpu.dsp import timing as tmod
        st0 = {"channelizer": ch.init_state(),
               "tail": jnp.zeros((C, tmod.TAIL), jnp.complex64),
               "next_t": jnp.full((C,), float(tmod.TAIL), jnp.float32),
               "acc": jnp.zeros((C,), jnp.complex64)}

        def body(st, _2):
            y, cst = ch.step(kernels.r2c(x_r), st["channelizer"])
            syms, valid, ts = tmod.timing_recover(
                y, {"tail": st["tail"], "next_t": st["next_t"],
                    "acc": st["acc"]})
            st2 = {"channelizer": cst, **ts}
            return st2, syms[0, 0].real
        st, tails = jax.lax.scan(body, st0, None, length=n)
        return tails

    timed("tim", chain_tim)

    # (d) demod + bit interleave + frame scan, in isolation-peeling
    # variants: interleave only (scatter vs stack/reshape), then + scan
    # (strided conv vs im2col GEMM).  The delta between each pair
    # localizes the cost inside the bench's e2e body.
    k = bank.k_max
    t2 = 1200

    def interleave_scatter(h):
        bits = jnp.repeat(h, 2, axis=1)
        bits = bits.at[:, 0::2].set(h >> 1)
        bits = bits.at[:, 1::2].set(h & 1)
        return bits

    def interleave_stack(h):
        return jnp.stack([h >> 1, h & 1], axis=2).reshape(h.shape[0], -1)

    def make_chain_e2e(interleave, scan_fn):
        def chain(x_r, n):
            st0 = bank.init_state()
            tail0 = jnp.zeros((C, t2), jnp.uint8)

            def body(carry, _2):
                st, tl = carry
                out, st2 = bank._step_impl(x_r, st)
                h = jnp.where(out["valid"], out["hard"],
                              0).astype(jnp.uint8)
                z = jnp.concatenate([tl, interleave(h)], axis=1)
                if scan_fn is None:
                    acc = jnp.sum(z.astype(jnp.int32)).astype(jnp.float32)
                else:
                    scan = scan_fn(z)
                    nhit = jnp.sum((scan["corr"] >= 0.90)
                                   .astype(jnp.int32))
                    nok = jnp.sum((scan["crc_err"] <= 2)
                                  .astype(jnp.int32))
                    acc = (nhit + nok).astype(jnp.float32)
                tl2 = jax.lax.slice_in_dim(z, 2 * k - 4, 2 * k - 4 + t2,
                                           1, axis=1)
                return (st2, tl2), acc
            (st, tl), tails = jax.lax.scan(body, (st0, tail0), None,
                                           length=n)
            return tails
        return chain

    if os.environ.get("PERF_IL"):
        timed("il_scat", make_chain_e2e(interleave_scatter, None))
        timed("il_stk", make_chain_e2e(interleave_stack, None))
    timed("e2e", make_chain_e2e(interleave_scatter,
                                framescan.frame_scan_packed_even))
    if os.environ.get("PERF_E2E_DENSE"):
        timed("e2e_dense", make_chain_e2e(interleave_scatter,
                                          framescan.frame_scan_packed))
    if os.environ.get("PERF_MM"):
        timed("e2e_mm", make_chain_e2e(interleave_stack,
                                       framescan.frame_scan_packed_mm))

    results["block_ms_realtime"] = round(block / fs * 1e3, 1)
    print(json.dumps({"carriers": C, **results}))


if __name__ == "__main__":
    main()
