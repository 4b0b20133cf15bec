"""Fused back half (dsp.backhalf) vs the classic XLA chain.

The contract: identical symbol decisions — hence bit-identical scan
verdict planes and carried bit tails — on golden modulated signals,
with float state (timing phase, accumulator, symbols) matching to
rounding.  fs = 2.304 MHz (72 kHz * 2^5 family, quantized row-gather
extraction, no resample back half) exercises the same code shapes as
the C=10240 bench config, including drop > P (the q0 > 0 row-shifted
interpolation path).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tetraear_tpu.dsp.pipeline import CarrierBankDemod  # noqa: E402
from tetraear_tpu.dsp import backhalf  # noqa: E402
from tetraear_tpu.ref import modulator  # noqa: E402

FS = 2.304e6
# 8 carriers: the kernel's group=8 carrier-stacked batching (sublane
# block-diagonal placement/scan/tail matmuls) runs at full width
OFFSETS = [(i - 4) * 25_000 + 12_500.0 for i in range(8)]


@pytest.fixture(scope="module")
def bank():
    return CarrierBankDemod(fs=FS, freqs_hz=OFFSETS, frontend="fft")


@pytest.fixture(scope="module")
def capture(bank):
    rng = np.random.default_rng(11)
    n = 3 * bank.block_len
    sym_count = int(n / FS * 18_000) + 64
    # real TETRA slot structure (training sequences) so the scan finds
    # sync hits — plus random filler to cover the full capture
    def carrier_bits():
        slots = [modulator.make_slot_bits(
            rng.integers(0, 2, 432).astype(np.uint8))
            for _ in range(2 * sym_count // 510 + 1)]
        return np.concatenate(slots)[:2 * sym_count]
    bits = [carrier_bits() for _ in OFFSETS]
    iq = modulator.generate_multi_carrier(
        bits, fs=FS, offsets_hz=OFFSETS, snr_db=25, rng=rng)
    if len(iq) < n:
        pad = 0.001 * (rng.standard_normal(n - len(iq))
                       + 1j * rng.standard_normal(n - len(iq)))
        iq = np.concatenate([iq, pad.astype(np.complex64)])
    return iq[:n].astype(np.complex64)


def test_fused_matches_classic_chain(bank, capture):
    from tetraear_tpu.dsp import kernels

    fused = backhalf.FusedRx(bank)
    assert fused.p == bank.channelizer.n_band // 128

    fstate = fused.init_state()
    cstate = bank.init_state()
    tailbits = jnp.zeros((len(OFFSETS), backhalf.TAILBITS), jnp.uint8)

    for blk in range(3):
        x = capture[blk * bank.block_len:(blk + 1) * bank.block_len]
        x_r = jnp.asarray(kernels.c2r_np(x))

        scan_c, cstate2, tail2, n_c = backhalf.classic_step_scan(
            bank, x_r, cstate, tailbits)
        out_c, _ = bank._step_impl(x_r, cstate)     # soft reference
        out_f, fstate2 = fused.step(x_r, fstate)

        # scan verdict planes: bit-identical (integer counts)
        assert out_f["corr"].shape == scan_c["corr"].shape
        assert out_f["crc_err"].shape == scan_c["crc_err"].shape
        np.testing.assert_array_equal(
            np.asarray(out_f["crc_err"]), np.asarray(scan_c["crc_err"]),
            err_msg=f"crc_err differs at block {blk}")
        np.testing.assert_allclose(
            np.asarray(out_f["corr"]), np.asarray(scan_c["corr"]),
            atol=1e-6, err_msg=f"corr differs at block {blk}")

        # valid symbol counts and the slide select
        np.testing.assert_array_equal(np.asarray(out_f["n_valid"]),
                                      np.asarray(n_c))

        # carried bit tail: identical bits
        bt_rows = np.asarray(fstate2["bit_tail"]).reshape(
            len(OFFSETS), -1)[:, :backhalf.TAILBITS]
        np.testing.assert_array_equal(
            bt_rows.astype(np.uint8), np.asarray(tail2),
            err_msg=f"bit tail differs at block {blk}")

        # timing state: same decisions, float to rounding
        tc = cstate2["timing"]
        tf = fstate2["bank"]["timing"]
        np.testing.assert_allclose(np.asarray(tf["next_t"]),
                                   np.asarray(tc["next_t"]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(tf["tail"]),
                                   np.asarray(tc["tail"]),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(tf["acc"]),
                                   np.asarray(tc["acc"]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(fstate2["bank"]["prev_sym"]),
            np.asarray(cstate2["prev_sym"]), atol=1e-4, rtol=1e-4)

        # soft bits on the valid region
        soft_f = np.asarray(fused.soft_symbols(out_f["soft_planes"]))
        soft_c = np.asarray(out_c["soft"])
        valid = np.asarray(out_c["valid"])
        np.testing.assert_allclose(soft_f[valid], soft_c[valid],
                                   atol=2e-4)

        cstate, tailbits, fstate = cstate2, tail2, fstate2

    # the capture really produced sync hits + CRC passes (not vacuous)
    hits = np.asarray(out_f["corr"]) >= 0.90
    assert hits.sum() > 0, "no sync hits in golden capture"


def test_band_synth_phasor_only_bit_exact(bank, capture):
    """The y_out=False band_synth variant (the y-round-trip pre-pass
    measurement, perf/y_roundtrip_probe.py) must produce the EXACT
    phasor of the full kernel — same synthesis, only the bulk y stores
    elided."""
    from tetraear_tpu.dsp import kernels
    from tetraear_tpu.dsp import pallas_kernels as pk

    ch = bank.channelizer
    xp = jnp.asarray(kernels.c2p_np(capture[:bank.block_len]))
    tail_p = jnp.zeros((2, ch.overlap), jnp.float32)
    planes = ch.wideband_planes_spliced(tail_p, xp, interpret=True)
    args = (planes, jnp.asarray(ch.h1_planes), jnp.asarray(ch.row_start),
            jnp.asarray(ch.d_shift), jnp.asarray(ch.m1c),
            jnp.asarray(ch.m2re), jnp.asarray(ch.m2im),
            jnp.asarray(ch.twre), jnp.asarray(ch.twim))
    _y, ph = pk.band_synth(*args, ch.synth_rows, group=8,
                           interpret=True, phasor_drop=ch.drop)
    ph2 = pk.band_synth(*args, ch.synth_rows, group=8, interpret=True,
                        phasor_drop=ch.drop, y_out=False)
    np.testing.assert_array_equal(np.asarray(ph), np.asarray(ph2))


def test_fused_rejects_unsupported_configs():
    bank = CarrierBankDemod(fs=2.4e6, freqs_hz=[12_500.0],
                            frontend="fft")      # 150 kHz channel, L=12
    with pytest.raises(ValueError, match="72 kHz"):
        backhalf.FusedRx(bank)
    conv = CarrierBankDemod(fs=2.4e6, freqs_hz=[12_500.0],
                            frontend="conv")
    with pytest.raises(ValueError):
        backhalf.FusedRx(conv)


