"""Probe: wideband forward FFT formulations at 2^25 on the real chip.

XLA's single 2^25-point c64 FFT measures ~28 ms/block — ~7x off the
HBM roofline for the ~6 passes it should need.  Candidates:

  fft1   — jnp.fft.fft(x) on the flat 2^25 array (the shipped path)
  fft4   — four-step: x.reshape(N2, N1)  [i = i2*N1 + i1]
             G = fft(xm, axis=0)          (8192 batched 4096-FFTs)
             H = fft(G * tw, axis=1)      (4096 batched 8192-FFTs)
           X[k2 + N2*k1] = H[k2, k1] — PERMUTED output (no transpose)
  fft4t  — fft4 + the final transpose to natural order

All variants are scan-chained with a value dependency and fetch-synced
(CLAUDE.md rule 5b).  fft4's permuted output would need the extraction
row indices rebuilt; fft4t is drop-in.

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/fft4step_probe.py
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
    from tetraear_tpu.dsp import kernels

    LOG2N = int(os.environ.get("PERF_LOG2N", "25"))
    N = 1 << LOG2N
    N1 = 1 << ((LOG2N + 1) // 2)            # 8192 for 2^25
    N2 = N // N1                             # 4096
    STEPS = int(os.environ.get("PERF_STEPS", "8"))

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(N) + 1j * rng.standard_normal(N)).astype(
        np.complex64)
    xd = jnp.asarray(kernels.c2r_np(x))

    k2v = np.arange(N2)
    i1v = np.arange(N1)
    tw = np.exp(-2j * np.pi * np.outer(k2v, i1v) / N).astype(np.complex64)
    # the 268 MB twiddle cannot be a trace-time constant (the remote
    # compile request would exceed the relay's body limit) nor an eager
    # complex64 transfer (UNIMPLEMENTED, CLAUDE.md rule 2): ship it as
    # runtime [re, im] f32 planes and rebuild complex inside jit
    twp = jnp.asarray(np.stack([tw.real, tw.imag]).astype(np.float32))

    results = {}

    def timed(name, chain_fn):
        cj = jax.jit(chain_fn, static_argnums=1)
        out = cj(xd, STEPS)
        float(np.asarray(out)[-1])
        t0 = time.time()
        out = cj(xd, STEPS)
        float(np.asarray(out)[-1])
        dt = (time.time() - t0) / STEPS * 1e3
        results[name] = round(dt, 1)
        print(f"{name}: {dt:.1f} ms/block", flush=True)

    def chain_fft1(x_r, n):
        def body(carry, _2):
            xx = kernels.r2c(x_r) + carry
            X = jnp.fft.fft(xx)
            return X[0] * 1e-30, X[1].real
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    def make_chain_fft4(transpose):
        def chain(x_r, tw_p, n):
            twc = jax.lax.complex(tw_p[0], tw_p[1])

            def body(carry, _2):
                xx = kernels.r2c(x_r) + carry
                xm = xx.reshape(N2, N1)
                g = jnp.fft.fft(xm, axis=0)            # (N2=k2, N1=i1)
                h = jnp.fft.fft(g * twc, axis=1)       # (k2, k1)
                if transpose:
                    h = h.T                            # natural order
                return h[0, 0] * 1e-30, h[0, 1].real
            c, tails = jax.lax.scan(body, jnp.complex64(0), None,
                                    length=n)
            return tails
        return chain

    timed("fft1", chain_fft1)

    def timed2(name, chain_fn):
        cj = jax.jit(chain_fn, static_argnums=2)
        out = cj(xd, twp, STEPS)
        float(np.asarray(out)[-1])
        t0 = time.time()
        out = cj(xd, twp, STEPS)
        float(np.asarray(out)[-1])
        dt = (time.time() - t0) / STEPS * 1e3
        results[name] = round(dt, 1)
        print(f"{name}: {dt:.1f} ms/block", flush=True)

    timed2("fft4", make_chain_fft4(False))
    timed2("fft4t", make_chain_fft4(True))

    # isolate the (N2, N1) c64 transpose cost (the fft4t - fft4 delta
    # should match this if XLA doesn't fuse it away)
    def chain_xpose(x_r, tw_p, n):
        def body(carry, _2):
            xx = kernels.r2c(x_r) + carry
            h = xx.reshape(N2, N1).T + carry
            return h[0, 0] * 1e-30, h[0, 1].real
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    timed2("xpose", chain_xpose)

    # the exact production post-FFT glue (backhalf.chan_raw): natural-
    # order transpose + wrap-extension concat + [re, im] planes build —
    # how many passes does XLA actually emit for it?
    N_BAND = 8192

    def chain_xpose_planes(x_r, tw_p, n):
        def body(carry, _2):
            xx = kernels.r2c(x_r) + carry
            h = xx.reshape(N2, N1).T.reshape(-1)
            x_ext = jnp.concatenate([h, h[:N_BAND]])
            planes = jnp.stack([jnp.real(x_ext), jnp.imag(x_ext)])
            planes = planes.reshape(2, -1, 128)
            return planes[0, 0, 0] * 1e-30 + 0j, planes[1, 0, 0]
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    timed2("xpose_planes", chain_xpose_planes)

    # six-step: every FFT on the MINOR axis, transposes explicit —
    # tests whether XLA's axis-0 batched FFT hides a worse-than-
    # explicit transpose
    def chain_fft6(x_r, tw_p, n):
        twc = jax.lax.complex(tw_p[0], tw_p[1])

        def body(carry, _2):
            xx = kernels.r2c(x_r) + carry
            xt = xx.reshape(N2, N1).T                # (i1, i2)
            g2 = jnp.fft.fft(xt, axis=1)             # (i1, k2)
            g3 = g2.T * twc                          # (k2, i1)
            h = jnp.fft.fft(g3, axis=1)              # (k2, k1)
            h = h.T                                  # natural order
            return h[0, 0] * 1e-30, h[0, 1].real
        c, tails = jax.lax.scan(body, jnp.complex64(0), None, length=n)
        return tails

    timed2("fft6", chain_fft6)

    # segmented batch FFTs (S segments of N/S): raw-throughput signal
    # for an overlap-save channelizer redesign with smaller nfft (the
    # overlap overhead is NOT modelled here — upper bound only)
    def make_chain_seg(s):
        def chain(x_r, tw_p, n):
            def body(carry, _2):
                xx = kernels.r2c(x_r) + carry
                h = jnp.fft.fft(xx.reshape(s, N // s), axis=1)
                return h[0, 0] * 1e-30, h[0, 1].real
            c, tails = jax.lax.scan(body, jnp.complex64(0), None,
                                    length=n)
            return tails
        return chain

    timed2("fftseg8", make_chain_seg(8))
    timed2("fftseg16", make_chain_seg(16))
    timed2("fftseg32", make_chain_seg(32))
    timed2("fftseg64", make_chain_seg(64))

    # segmented + four-step: each of the S sub-FFTs decomposed as
    # fft(axis) -> twiddle -> fft(axis) (batch dims carried through) —
    # measures whether XLA's batched medium FFT still hides passes
    def make_chain_seg4(s):
        m = N // s
        m1 = 1 << (int(np.log2(m) + 1) // 2)
        m2 = m // m1
        twn = np.exp(-2j * np.pi * np.outer(np.arange(m2),
                                            np.arange(m1)) / m)
        twp_s = np.stack([twn.real, twn.imag]).astype(np.float32)

        def chain(x_r, tw_p, n):
            twc = jax.lax.complex(jnp.asarray(twp_s[0]),
                                  jnp.asarray(twp_s[1]))

            def body(carry, _2):
                xx = kernels.r2c(x_r) + carry
                xm = xx.reshape(s, m2, m1)
                g = jnp.fft.fft(xm, axis=1)          # (s, k2, i1)
                h = jnp.fft.fft(g * twc[None], axis=2)
                ht = jnp.swapaxes(h, 1, 2)           # natural order
                return ht[0, 0, 0] * 1e-30, ht[0, 0, 1].real
            c, tails = jax.lax.scan(body, jnp.complex64(0), None,
                                    length=n)
            return tails
        return chain

    timed2("fftseg8_4step", make_chain_seg4(8))
    timed2("fftseg16_4step", make_chain_seg4(16))

    # einsum-CT sub-transforms: each batched pow2 sub-FFT as two
    # DFT-matrix einsums + a twiddle on the MXU (the band-synthesis
    # trick applied to the forward transform)
    def dftm(n):
        k = np.arange(n)
        return np.exp(-2j * np.pi * np.outer(k, k) / n).astype(
            np.complex64)

    def make_chain_fft4e(hp):
        p0 = 1 << (int(np.log2(N2)) // 2)
        q0 = N2 // p0
        p1 = 64
        q1 = N1 // p1

        # complex64 cannot be device_put NOR eagerly built on this
        # backend — keep f32 [re, im] numpy planes and complexify
        # inside the traced function (small trace constants)
        def planes(a):
            return np.stack([a.real, a.imag]).astype(np.float32)

        d_p0n = planes(dftm(p0))
        d_q0n = planes(dftm(q0))
        d_p1n = planes(dftm(p1))
        d_q1n = planes(dftm(q1))
        tw0n = planes(np.exp(
            -2j * np.pi * np.outer(np.arange(p0), np.arange(q0)) / N2))
        tw1n = planes(np.exp(
            -2j * np.pi * np.outer(np.arange(p1), np.arange(q1)) / N1))
        prec = jax.lax.Precision.HIGHEST if hp else None

        def chain(x_r, tw_p, n):
            twc = jax.lax.complex(tw_p[0], tw_p[1])

            def cc(a):
                return jax.lax.complex(jnp.asarray(a[0]),
                                       jnp.asarray(a[1]))
            d_p0 = cc(d_p0n)
            d_q0 = cc(d_q0n)
            d_p1 = cc(d_p1n)
            d_q1 = cc(d_q1n)
            tw0 = cc(tw0n)
            tw1 = cc(tw1n)

            def body(carry, _2):
                xx = kernels.r2c(x_r) + carry
                xm = xx.reshape(N2, N1)
                x3 = xm.reshape(p0, q0, N1)
                y = jnp.einsum('ca,abn->cbn', d_p0, x3, precision=prec)
                z = y * tw0[:, :, None]
                g = jnp.einsum('db,cbn->dcn', d_q0, z,
                               precision=prec).reshape(N2, N1)
                g = g * twc
                g3 = g.reshape(N2, p1, q1)
                y1 = jnp.einsum('ca,nab->ncb', d_p1, g3,
                                precision=prec)
                z1 = y1 * tw1[None]
                h = jnp.einsum('db,ncb->ndc', d_q1, z1,
                               precision=prec).reshape(N2, N1)
                h = h.T
                return h[0, 0] * 1e-30, h[0, 1].real
            c, tails = jax.lax.scan(body, jnp.complex64(0), None,
                                    length=n)
            return tails
        return chain

    timed2("fft4e_hp", make_chain_fft4e(True))
    timed2("fft4e", make_chain_fft4e(False))

    # correctness spot check (tiny size, CPU-fast path also fine on TPU)
    m = 1 << 12
    m1 = 1 << 6
    m2 = m // m1
    xs = (rng.standard_normal(m) + 1j * rng.standard_normal(m)).astype(
        np.complex64)
    tws = np.exp(-2j * np.pi * np.outer(np.arange(m2), np.arange(m1))
                 / m).astype(np.complex64)
    g = np.fft.fft(xs.reshape(m2, m1), axis=0)
    h = np.fft.fft(g * tws, axis=1)
    want = np.fft.fft(xs)
    got = np.empty(m, np.complex64)
    for k1 in range(m1):
        for k2 in range(m2):
            got[k2 + m2 * k1] = h[k2, k1]
    err = float(np.max(np.abs(got - want)) / np.max(np.abs(want)))
    results["fourstep_relerr"] = err
    print(f"four-step max rel err vs np.fft: {err:.2e}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
