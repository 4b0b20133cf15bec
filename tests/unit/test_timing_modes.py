"""Timing recovery modes: O&M drift robustness + Gardner loop properties."""

import numpy as np
import pytest
from scipy import signal as ss

from tetraear_tpu.ref import demod, modulator, polyphase
from tetraear_tpu.dsp import design


def _steady_match(rx, tx):
    tail = rx[len(rx) // 2:]
    best = 0.0
    for s in range(0, len(tx) - len(tail)):
        m = float(np.mean(tail == tx[s:s + len(tail)]))
        best = max(best, m)
        if best == 1.0:
            break
    return best


@pytest.mark.parametrize("ppm", [100, 1000])
def test_om_timing_tracks_clock_drift(ppm):
    """The per-block O&M snap absorbs sample-clock drift: steady-state
    symbol recovery stays exact at up to 1000 ppm (SDR crystals are
    typically <2 ppm)."""
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 6000).astype(np.uint8)
    tx = modulator.bits_to_symbols(bits)
    iq = modulator.generate_carrier(bits, fs=2.4e6)
    iq = ss.resample_poly(iq, 100_000 + ppm // 10, 100_000).astype(
        np.complex64)
    out = demod.OracleDemod(fs=2.4e6).run(iq, block_size=48_000)
    assert _steady_match(out["symbols"], tx) == 1.0


def test_gardner_scurve_and_convergence():
    """Gardner TED: S-curve crosses zero at the optimum with positive
    slope, and the PI loop converges to <0.2 samples of phase error."""
    import jax.numpy as jnp
    from tetraear_tpu.dsp import gardner

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 4000).astype(np.uint8)
    tx = modulator.bits_to_symbols(bits)
    bb = modulator.symbols_to_baseband(tx, sps=4)
    rrc = design.rrc_taps(sps=4).astype(np.float32)
    y, _ = polyphase.fir_stream(rrc, bb.astype(np.complex64),
                                np.zeros(len(rrc) - 1, np.complex64))
    y = np.asarray(y)

    # S-curve at known strobes (delay 40, stride 4)
    def scurve(tau):
        t = 40 + 4 * np.arange(20, 900) + tau
        i = t.astype(int)
        f = t - i
        cur = y[i] + (y[i + 1] - y[i]) * f
        tm = t - 2
        im = tm.astype(int)
        fm = tm - im
        mid = y[im] + (y[im + 1] - y[im]) * fm
        e = np.real((cur[1:] - cur[:-1]) * np.conj(mid[1:]))
        return float(np.mean(e / (np.abs(cur[1:]) ** 2 + 1e-6)))

    assert abs(scurve(0.0)) < 0.02
    assert scurve(0.5) > 0.03
    assert scurve(-0.5) < -0.03

    # loop convergence: run one block, check late-phase error
    st = gardner.init_gardner_state(1)
    n = len(y) - len(y) % 4
    syms, valid, st2 = gardner.gardner_recover(jnp.asarray(y[None, :n]), st)
    mu_final = float(np.asarray(st2["mu"])[0])
    # strobe phase relative to the known optimum (delay 40 -> 0 mod 4),
    # in tail coordinates the optimum is (40 + TAIL) mod 4
    phase_err = (mu_final - gardner.TAIL - 40) % 4
    phase_err = min(phase_err, 4 - phase_err)
    assert phase_err < 0.3
