"""Probe: four-step wideband FFT with MXU-einsum sub-transforms.

The four-step split (channelizer._wideband_fft) still spends ~17.7 ms
of the 113 ms block in XLA's batched pow2 FFTs at nfft=2^25.  Each
sub-FFT (length 4096 / 8192) can itself be Cooley-Tukey-split into two
64/128-point DFT-matrix einsums + a twiddle — MXU matmuls instead of
the FFT butterfly lowering, same trick that won in the band synthesis.

This probe checks accuracy + speed of the einsum sub-FFT against
jnp.fft.fft at bench shapes before wiring it into the channelizer.
Run: PYTHONPATH=/root/repo python perf/fft_mxu_probe.py
"""

import os
import signal
import time

import numpy as np


def dft(n):
    k = np.arange(n)
    return np.exp(-2j * np.pi * np.outer(k, k) / n).astype(np.complex64)


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

    hp = jax.lax.Precision.HIGHEST

    def ct_fft_axis0(x, p, q):
        """FFT over axis 0 of (n2, n1) via n2 = p*q CT split.

        index i = a*q + b; k = c + p*d; output natural k order."""
        n2, n1 = x.shape
        assert n2 == p * q
        xr = x.reshape(p, q, n1)                   # [a, b, n]
        dp = jnp.asarray(dft(p))
        dq = jnp.asarray(dft(q))
        c_ = np.arange(p)
        b_ = np.arange(q)
        tw = np.exp(-2j * np.pi * np.outer(c_, b_)
                    / (p * q)).astype(np.complex64)   # [c, b]
        y = jnp.einsum('ca,abn->cbn', dp, xr, precision=hp)
        z = y * jnp.asarray(tw)[:, :, None]
        x2 = jnp.einsum('db,cbn->dcn', dq, z, precision=hp)
        return x2.reshape(n2, n1)

    def ct_fft_axis1(x, p, q):
        n2, n1 = x.shape
        assert n1 == p * q
        xr = x.reshape(n2, p, q)                   # [n, a, b]
        dp = jnp.asarray(dft(p))
        dq = jnp.asarray(dft(q))
        tw = np.exp(-2j * np.pi * np.outer(np.arange(p), np.arange(q))
                    / (p * q)).astype(np.complex64)
        y = jnp.einsum('ca,nab->ncb', dp, xr, precision=hp)
        z = y * jnp.asarray(tw)[None, :, :]
        x2 = jnp.einsum('db,ncb->ndc', dq, z, precision=hp)
        return x2.reshape(n2, n1)

    # -- accuracy on a small case --------------------------------------
    # complex64 cannot cross the jit boundary on this backend
    # (CLAUDE.md rule 2) — fetch [re, im] stacks
    def fetch_c(fn, v):
        vr = np.stack([v.real, v.imag]).astype(np.float32)
        out = jax.jit(lambda u: jnp.stack(
            [jnp.real(fn(jax.lax.complex(u[0], u[1]))),
             jnp.imag(fn(jax.lax.complex(u[0], u[1])))]))(
            jnp.asarray(vr))
        out = np.asarray(out)
        return out[0] + 1j * out[1]

    rng = np.random.default_rng(0)
    small = (rng.standard_normal((4096, 64))
             + 1j * rng.standard_normal((4096, 64))).astype(np.complex64)
    ref = np.fft.fft(small, axis=0)
    got = fetch_c(lambda v: ct_fft_axis0(v, 64, 64), small)
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"axis0 64x64 rel err: {rel:.2e}", flush=True)
    small1 = (rng.standard_normal((64, 8192))
              + 1j * rng.standard_normal((64, 8192))).astype(np.complex64)
    ref1 = np.fft.fft(small1, axis=1)
    got1 = fetch_c(lambda v: ct_fft_axis1(v, 64, 128), small1)
    rel1 = np.max(np.abs(got1 - ref1)) / np.max(np.abs(ref1))
    print(f"axis1 64x128 rel err: {rel1:.2e}", flush=True)

    # -- speed at bench shapes (scan-chained) --------------------------
    n2, n1 = 4096, 8192
    xr = rng.standard_normal((2, n2, n1)).astype(np.float32)
    steps = int(os.environ.get("PERF_STEPS", "6"))

    def timed(name, fn):
        def chain(vr, n):
            v = jax.lax.complex(vr[0], vr[1])

            def body(carry, _):
                out = fn(v + carry)
                return out[0, 0], out[1, 1].real
            c, tails = jax.lax.scan(body, jnp.complex64(0), None,
                                    length=n)
            return tails

        cj = jax.jit(chain, static_argnums=1)
        out = cj(jnp.asarray(xr), steps)
        float(np.asarray(out)[-1])
        t0 = time.time()
        out = cj(jnp.asarray(xr), steps)
        float(np.asarray(out)[-1])
        print(f"{name}: {(time.time() - t0) / steps * 1e3:.1f} ms",
              flush=True)

    timed("xla_fft_axis0", lambda v: jnp.fft.fft(v, axis=0))
    timed("ct_fft_axis0", lambda v: ct_fft_axis0(v, 64, 64))
    timed("xla_fft_axis1", lambda v: jnp.fft.fft(v, axis=1))
    timed("ct_fft_axis1", lambda v: ct_fft_axis1(v, 64, 128))


if __name__ == "__main__":
    main()
