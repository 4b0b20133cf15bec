"""Unit tests: per-carrier AFC (d^4 frequency-error detector + loop)."""

import numpy as np
import pytest

from tetraear_tpu.dsp.pipeline import CarrierBankDemod
from tetraear_tpu.ref import modulator


def _best(rx, tx):
    best = 0.0
    for s in range(len(rx) - len(tx) + 1):
        m = float(np.mean(rx[s:s + len(tx)] == tx))
        best = max(best, m)
        if best == 1.0:
            break
    return best


def test_afc_error_detector_sign():
    import jax.numpy as jnp
    from tetraear_tpu.dsp.timing import afc_error
    rng = np.random.default_rng(0)
    syms = rng.integers(0, 4, 500)
    inc = np.array([np.pi / 4, 3 * np.pi / 4, -np.pi / 4,
                    -3 * np.pi / 4])[syms]
    for eps in (-0.05, 0.0, 0.08):
        phases = np.cumsum(inc + eps)
        pts = np.exp(1j * phases).astype(np.complex64)[None, :]
        valid = np.ones_like(pts, bool)
        err = float(np.asarray(afc_error(jnp.asarray(pts),
                                         jnp.asarray(valid)))[0])
        assert abs(err - eps) < 0.01, f"eps={eps} est={err}"


def test_afc_zero_offset_is_transparent():
    """With no frequency error the loop must not perturb decisions."""
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 3000).astype(np.uint8)
    tx = modulator.bits_to_symbols(bits)
    iq = modulator.generate_carrier(bits, fs=2.4e6, snr_db=15,
                                    rng=np.random.default_rng(3))
    bank = CarrierBankDemod(fs=2.4e6, freqs_hz=[0.0], block_len=48_000,
                            afc=True)
    out = bank.run(iq)
    assert _best(out["symbols"][0], tx[:800]) == 1.0


@pytest.mark.integration
def test_afc_recovers_2khz_offset():
    """+2 kHz uncompensated offset: decisions fail without AFC (rotation
    ~0.7 rad/symbol margin loss) and fully recover with it.  Pull-in
    range of the d^4 detector is +-symbol_rate/8 = +-2.25 kHz; coarse
    capture-level AFC (Pipeline FFT peak) handles larger offsets."""
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 6000).astype(np.uint8)
    tx = modulator.bits_to_symbols(bits)
    iq = modulator.generate_carrier(
        bits, fs=2.4e6, freq_offset_hz=12_500.0 + 2_000.0, snr_db=20,
        rng=np.random.default_rng(3))

    no_afc = CarrierBankDemod(fs=2.4e6, freqs_hz=[12_500.0],
                              block_len=48_000, afc=False).run(iq)
    with_afc = CarrierBankDemod(fs=2.4e6, freqs_hz=[12_500.0],
                                block_len=48_000, afc=True).run(iq)
    probe = tx[500:2000]
    m_no = _best(no_afc["symbols"][0][400:], probe)
    m_yes = _best(with_afc["symbols"][0][400:], probe)
    assert m_no < 0.95
    assert m_yes == 1.0


@pytest.mark.integration
def test_afc_with_clock_drift_combined():
    """The real-world RTL-SDR condition: the same crystal error shifts
    both the LO (~+1.5 kHz at 392 MHz for ~4 ppm... exaggerated here to
    +1.5 kHz) and the sample clock (500 ppm, exaggerated likewise).
    Carrier AFC + per-block O&M snap must absorb both at once."""
    from scipy import signal as ss
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, 8000).astype(np.uint8)
    tx = modulator.bits_to_symbols(bits)
    iq = modulator.generate_carrier(
        bits, fs=2.4e6, freq_offset_hz=1_500.0, snr_db=20,
        rng=np.random.default_rng(5))
    iq = ss.resample_poly(iq, 100_050, 100_000).astype(np.complex64)

    bank = CarrierBankDemod(fs=2.4e6, freqs_hz=[0.0], block_len=48_000,
                            afc=True)
    out = bank.run(iq)
    sym = out["symbols"][0]
    # drifted sample clock shifts which TX span the RX tail lands on:
    # search TX for the steady-state RX tail (as the timing-mode tests do)
    tail = sym[len(sym) // 2:len(sym) // 2 + 1200]
    match = max(float(np.mean(tail == tx[s:s + len(tail)]))
                for s in range(len(tx) - len(tail)))
    assert match == 1.0
