"""Unit test: ScanRunner (multi-block-per-dispatch) exactness."""

import numpy as np

from tetraear_tpu.dsp.pipeline import CarrierBankDemod
from tetraear_tpu.ref import modulator
from tetraear_tpu.runtime.stream import ScanRunner


def test_scan_runner_matches_per_block():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 8000).astype(np.uint8)
    iq = modulator.generate_carrier(bits, fs=2.4e6, snr_db=18,
                                    rng=np.random.default_rng(2))
    ref = CarrierBankDemod(fs=2.4e6, freqs_hz=[0.0],
                           block_len=48_000).run(iq)["symbols"][0]
    bank = CarrierBankDemod(fs=2.4e6, freqs_hz=[0.0], block_len=48_000)
    out = ScanRunner(bank, blocks_per_dispatch=3).run(iq)
    got = out["symbols"][0]
    assert len(got) == len(ref)
    assert np.array_equal(got, ref)
    # resumed run continues without re-dropping the diff reference
    out2 = ScanRunner(bank, blocks_per_dispatch=2).run(
        iq[:96_000], state=None)
    assert len(out2["symbols"][0]) > 0
