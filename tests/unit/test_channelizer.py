"""Unit tests: FFT channelizer frontend vs conv frontend and wideband."""

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


@pytest.mark.integration
def test_fft_frontend_matches_conv():
    rng = np.random.default_rng(0)
    C = 4
    offsets = [(i - 2) * 25_000 + 12_500 for i in range(C)]
    bits = [rng.integers(0, 2, 2400).astype(np.uint8) for _ in range(C)]
    iq = modulator.generate_multi_carrier(
        bits, fs=2.4e6, offsets_hz=offsets, snr_db=18,
        rng=np.random.default_rng(1))
    conv = CarrierBankDemod(fs=2.4e6, freqs_hz=offsets,
                            block_len=40_000).run(iq)
    fft = CarrierBankDemod(fs=2.4e6, freqs_hz=offsets, block_len=119_200,
                           frontend="fft").run(iq)
    for ci in range(C):
        tx = modulator.bits_to_symbols(bits[ci])[:600]
        assert _best(conv["symbols"][ci], tx) == 1.0
        assert _best(fft["symbols"][ci], tx) == 1.0


def test_fft_frontend_streaming_blocks():
    """Phase-continuity across channelizer blocks: two consecutive blocks
    must decode one continuous symbol stream."""
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 7000).astype(np.uint8)
    iq = modulator.generate_carrier(bits, fs=2.4e6,
                                    freq_offset_hz=37_500 + 12_500,
                                    snr_db=25, rng=np.random.default_rng(4))
    bank = CarrierBankDemod(fs=2.4e6, freqs_hz=[50_000.0],
                            block_len=119_200, frontend="fft")
    out = bank.run(iq)
    tx = modulator.bits_to_symbols(bits)
    rx = out["symbols"][0]
    # the whole transmitted sequence must appear contiguously (a phase
    # break between blocks would corrupt the boundary region)
    n = min(len(rx), len(tx)) - 50
    assert _best(rx, tx[100:100 + min(n - 100, 2800)]) == 1.0


@pytest.mark.integration
def test_wideband_9p6_msps():
    """Config-3-style wideband: carriers spread over +-3 MHz at 9.6 Msps."""
    fs = 96_000 * 100
    rng = np.random.default_rng(0)
    hot = [-2_987_500.0, -1_237_500.0, 12_500.0, 2_512_500.0]
    bits = [rng.integers(0, 2, 1600).astype(np.uint8) for _ in hot]
    iq = modulator.generate_multi_carrier(
        bits, fs=fs, offsets_hz=hot, snr_db=20,
        rng=np.random.default_rng(1))
    blk = 9_568 * 100
    if len(iq) < blk:
        pad = 0.001 * (np.random.default_rng(2).standard_normal(
            blk - len(iq)) * (1 + 1j)).astype(np.complex64)
        iq = np.concatenate([iq, pad])
    bank = CarrierBankDemod(fs=fs, freqs_hz=hot, block_len=blk,
                            frontend="fft")
    out = bank.run(iq[:blk])
    for i in range(len(hot)):
        tx = modulator.bits_to_symbols(bits[i])[:500]
        assert _best(out["symbols"][i], tx) == 1.0, f"carrier {i}"


def test_fft_frontend_validates_config():
    with pytest.raises(ValueError):
        CarrierBankDemod(fs=2.4e6, freqs_hz=[12_501.0], block_len=119_200,
                         frontend="fft")     # off the bin grid
    with pytest.raises(ValueError):
        from tetraear_tpu.dsp.channelizer import FFTChannelizer
        FFTChannelizer(fs=2.5e6, freqs_hz=[0.0], block_len=119_200)
