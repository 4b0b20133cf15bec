"""Unit tests: NumPy oracle modulator -> demodulator round trip."""

import numpy as np
import pytest

from tetraear_tpu.ref import demod, modulator


def _best_match(rx, tx):
    best = 0.0
    n = len(tx)
    for start in range(0, len(rx) - n + 1):
        m = float(np.mean(rx[start:start + n] == tx))
        best = max(best, m)
        if best == 1.0:
            break
    return best


@pytest.mark.parametrize("snr_db", [None, 20, 10])
def test_roundtrip_symbol_exact(snr_db):
    rng = np.random.default_rng(42)
    bits = rng.integers(0, 2, 1600).astype(np.uint8)
    tx = modulator.bits_to_symbols(bits)
    iq = modulator.generate_carrier(bits, fs=2.4e6, snr_db=snr_db,
                                    rng=np.random.default_rng(7))
    out = demod.OracleDemod(fs=2.4e6).run(iq)
    assert _best_match(out["symbols"], tx[:600]) == 1.0


def test_roundtrip_with_freq_offset():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 1600).astype(np.uint8)
    tx = modulator.bits_to_symbols(bits)
    iq = modulator.generate_carrier(bits, fs=2.4e6, freq_offset_hz=5e3,
                                    snr_db=20, rng=np.random.default_rng(2))
    out = demod.OracleDemod(fs=2.4e6, freq_offset_hz=5e3).run(iq)
    assert _best_match(out["symbols"], tx[:600]) == 1.0


def test_block_size_independence():
    rng = np.random.default_rng(9)
    bits = rng.integers(0, 2, 2400).astype(np.uint8)
    iq = modulator.generate_carrier(bits, fs=2.4e6)
    dm = demod.OracleDemod(fs=2.4e6)
    full = dm.run(iq)["symbols"]
    blocked = dm.run(iq, block_size=24_000)["symbols"]
    n = min(len(full), len(blocked))
    assert n > 1000
    # identical except possibly isolated symbols at block seams
    assert float(np.mean(full[:n] == blocked[:n])) > 0.995


def test_soft_bits_sign_matches_hard():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 800).astype(np.uint8)
    iq = modulator.generate_carrier(bits, fs=2.4e6, snr_db=25,
                                    rng=np.random.default_rng(4))
    out = demod.OracleDemod(fs=2.4e6).run(iq)
    hard = out["symbols"]
    soft = out["soft_bits"]
    msb = (soft[:, 0] > 0).astype(np.uint8)
    lsb = (soft[:, 1] > 0).astype(np.uint8)
    assert np.array_equal((msb << 1) | lsb, hard)


def test_legacy_quantizer_quirk():
    """The reference quantizer maps a clean +3pi/4 transition to symbol 3
    (tetraear/signal/processor.py:152-161); ours decodes it correctly."""
    pts = np.exp(1j * np.array([0.0, 3 * np.pi / 4])).astype(np.complex64)
    hard_leg, _, _ = demod.dqpsk_demod(pts, None, quantizer="legacy")
    hard_new, _, _ = demod.dqpsk_demod(pts, None)
    assert hard_leg[0] == 3          # reference quirk reproduced
    assert hard_new[0] == 1          # corrected decision


def test_timing_recovery_tracks_offset():
    """Shifting the input by a fraction of a symbol must not break demod."""
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 1600).astype(np.uint8)
    tx = modulator.bits_to_symbols(bits)
    iq = modulator.generate_carrier(bits, fs=2.4e6)
    for shift in (17, 53):  # prime sample offsets at 2.4 Msps
        out = demod.OracleDemod(fs=2.4e6).run(iq[shift:])
        assert _best_match(out["symbols"], tx[:500]) == 1.0
