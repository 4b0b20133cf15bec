"""Unit tests: filter design + resample planning."""

import numpy as np
import pytest

from tetraear_tpu.dsp import design


def test_rrc_unit_energy():
    h = design.rrc_taps(sps=4, span_symbols=10)
    assert abs(np.sum(h * h) - 1.0) < 1e-9
    assert len(h) % 2 == 1
    # symmetric (linear phase)
    assert np.allclose(h, h[::-1])


def test_rrc_nyquist_cascade():
    """RRC*RRC sampled at symbol spacing is (approximately) ISI-free."""
    sps = 4
    h = design.rrc_taps(sps=sps, span_symbols=10)
    rc = np.convolve(h, h)
    center = len(rc) // 2
    peak = rc[center]
    isi = [abs(rc[center + k * sps]) for k in range(1, 8)]
    assert peak > 0.99
    assert max(isi) < 0.01 * peak


def test_kaiser_lowpass_dc_gain():
    h = design.kaiser_lowpass(12500, 10000, 2.4e6)
    assert abs(np.sum(h) - 1.0) < 1e-9


def test_kaiser_lowpass_stopband():
    fs = 240_000.0
    h = design.kaiser_lowpass(12_500, 20_000, fs, atten_db=60)
    w = np.fft.rfftfreq(8192, 1 / fs)
    mag = np.abs(np.fft.rfft(h, 8192))
    stop = mag[w > 12_500 + 20_000]
    assert 20 * np.log10(stop.max() + 1e-12) < -55


def test_plan_2p4_msps():
    plan = design.build_resample_plan(2.4e6)
    assert plan.out_rate == design.BASEBAND_RATE
    rate = plan.in_rate
    for st in plan.stages:
        rate = rate * st.up / st.down
    assert abs(rate - 72_000.0) < 1e-6


@pytest.mark.parametrize("fs", [1.8e6, 2.048e6, 2.4e6, 2.88e6, 3.2e6])
def test_plan_common_sdr_rates(fs):
    """All the RTL-SDR legal rates the reference validates
    (tetraear/signal/capture.py:83-87) must plan cleanly."""
    plan = design.build_resample_plan(fs)
    rate = fs
    for st in plan.stages:
        rate = rate * st.up / st.down
    assert abs(rate - 72_000.0) < 1e-6
