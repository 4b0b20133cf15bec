"""Accuracy probe: fft2p_planes matmul precision vs the XLA four-step.

The two-pass MXU FFT's value-bearing matmuls default to
precision=HIGHEST (6 bf16 passes per f32 product).  Precision.HIGH
(3 passes — drops the lo*lo term, ~2^-16 relative per product) would
halve the MXU work; this probe measures the actual end-to-end spectrum
error it costs at bench shapes, against the XLA four-step transform
(itself <= 1e-5 relative vs np.fft, perf/fft4step_probe.py).

The error is computed ON DEVICE (one scalar fetch): max |fft2p - xla|
over the spectrum, normalized by the RMS bin magnitude (the metric that
bounds the perturbation any downstream DQPSK decision sees — the
channel filter and synthesis are linear).

Run:  PYTHONPATH=/root/repo:/root/.axon_site \
      TETRAEAR_FFT2P_PREC=high python perf/fft2p_prec_probe.py
Env:  PERF_CARRIERS (10240), TETRAEAR_FFT2P_PREC (highest).
"""

import json
import os
import signal


def main():
    budget = int(os.environ.get("PERF_TIMEOUT_S", "2400"))
    signal.signal(signal.SIGALRM,
                  lambda *a: (_ for _ in ()).throw(TimeoutError()))
    signal.alarm(budget)

    import numpy as np
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

    c_n = int(os.environ.get("PERF_CARRIERS", "10240"))
    bank, fs = _make_bank(c_n, None, "fft")
    ch = bank.channelizer
    prec = os.environ.get("TETRAEAR_FFT2P_PREC", "highest")
    print(f"nfft={ch.nfft} n1={ch.fft2p_n1} n2={ch.fft2p_n2} "
          f"prec={prec}", flush=True)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(ch.nfft)
         + 1j * rng.standard_normal(ch.nfft)).astype(np.complex64)
    xr = jnp.asarray(kernels.c2r_np(x))

    @jax.jit
    def err(x_r):
        xx = kernels.r2c(x_r)
        p2 = ch.wideband_planes(xx)                  # (2, R, 128)
        big = ch._wideband_fft(xx)
        x_ext = jnp.concatenate([big, big[:ch.n_band]])
        ref = jnp.stack([jnp.real(x_ext), jnp.imag(x_ext)])
        ref = ref.reshape(2, -1, 128)
        d = p2 - ref
        mag = jnp.sqrt(jnp.mean(ref[0] ** 2 + ref[1] ** 2))
        return jnp.max(jnp.abs(d)) / mag, mag

    rel, mag = err(xr)
    out = {"prec": prec, "nfft": ch.nfft,
           "max_err_over_rms": float(rel), "rms": float(mag)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
