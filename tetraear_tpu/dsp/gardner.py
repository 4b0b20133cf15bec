"""Gardner closed-loop symbol-timing recovery (lax.scan, batched).

The production timing path is the parallel Oerder-Meyr estimator
(dsp/timing.py) — block-wise, no serial dependency, and its per-block
nearest-wrap snap tracks clock drift to at least 1000 ppm with exact
steady-state symbol recovery (tests/unit/test_timing_modes.py).  Gardner
is the classical closed-loop alternative named in the BASELINE north
star, provided here as a per-symbol ``lax.scan`` loop.  STATUS:
experimental — the TED S-curve and loop convergence are validated, but
on pi/4-DQPSK (mild envelope modulation) the loop exhibits occasional
cycle slips at these gains; the O&M path is strictly better on every
measured case and remains the default everywhere.

TED: e_k = Re{ (y(t_k) - y(t_{k-1})) * conj(y(t_k - T/2)) }, a
proportional-plus-integral loop advancing the strobe by sps + correction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SPS = 4


TAIL = SPS + 2          # carried samples for cross-block interpolation


def init_gardner_state(n_carriers: int, kp: float = 0.15,
                       ki: float = 0.0005) -> dict:
    return {
        "mu": jnp.full((n_carriers,), float(TAIL), jnp.float32),
        "w": jnp.zeros((n_carriers,), jnp.float32),        # integrator
        "prev": jnp.zeros((n_carriers, 2), jnp.float32),   # prev strobe
        "tail": jnp.zeros((n_carriers, TAIL, 2), jnp.float32),
        "kp": float(kp),
        "ki": float(ki),
    }


def _lin_interp(z: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Per-row linear interpolation: z (C, N) complex, t (C,) positions."""
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, z.shape[1] - 2)
    f = (t - i.astype(jnp.float32)).astype(jnp.float32)
    a = jnp.take_along_axis(z, i[:, None], axis=1)[:, 0]
    b = jnp.take_along_axis(z, i[:, None] + 1, axis=1)[:, 0]
    return a + (b - a) * f


def gardner_recover(y: jnp.ndarray, state: dict) -> tuple:
    """(C, N) matched-filtered samples -> symbol strobes with tracking.

    Returns (symbols (C, K), valid (C, K), new_state);
    K = N // SPS + 1 fixed shape, masked like timing.timing_recover.
    """
    from tetraear_tpu.dsp import kernels

    c, n = y.shape
    k_max = n // SPS + 1
    kp = state["kp"]
    ki = state["ki"]
    z = jnp.concatenate([kernels.r2c(state["tail"]), y], axis=1)
    zlen = z.shape[1]

    def body(carry, _):
        mu, w, prev = carry
        t_ok = mu <= jnp.float32(zlen - 2)
        t = jnp.where(t_ok, mu, jnp.float32(zlen - 2))
        cur = _lin_interp(z, t)
        mid = _lin_interp(z, jnp.maximum(t - SPS / 2.0, 0.0))
        prev_c = kernels.r2c(prev)
        e = jnp.real((cur - prev_c) * jnp.conj(mid))
        # normalize the TED by signal power to decouple loop gain; the
        # measured S-curve is positive when sampling late, so negate for
        # negative feedback
        p = jnp.abs(cur) ** 2 + 1e-6
        e = -jnp.clip(e / p, -2.0, 2.0)
        w2 = w + ki * e
        mu2 = mu + SPS + kp * e + w2
        new_prev = jnp.where(t_ok[:, None], kernels.c2r(cur), prev)
        return (mu2, w2, new_prev), (cur, t_ok)

    (mu, w, prev), (syms, valid) = jax.lax.scan(
        body, (state["mu"], state["w"], state["prev"]), None, length=k_max)
    syms = jnp.moveaxis(syms, 0, 1)          # (C, K)
    valid = jnp.moveaxis(valid, 0, 1)
    new_state = {
        "mu": mu - jnp.float32(zlen - TAIL),  # rebase onto the next block
        "w": w,
        "prev": prev,
        "tail": kernels.c2r(z[:, zlen - TAIL:]),
        "kp": kp,
        "ki": ki,
    }
    return syms, valid, new_state
