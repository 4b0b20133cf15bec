"""Unit tests: JAX DSP kernels vs the NumPy oracle (CPU backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tetraear_tpu.dsp import design, kernels, sync
from tetraear_tpu.dsp.pipeline import CarrierBankDemod
from tetraear_tpu.frame import crc as crc_mod
from tetraear_tpu.frame import decoder as dec_mod
from tetraear_tpu.ref import demod as ref_demod
from tetraear_tpu.ref import modulator, polyphase


def test_nco_tables_exact():
    """Table entries are exact integers; mixing matches the oracle NCO."""
    fs = 2.4e6
    freqs = np.array([12_500.0, -87_500.0])
    tab = kernels.nco_tables(freqs, fs, 2400)
    assert np.all(tab["coarse"] == np.round(tab["coarse"]))
    assert np.all(tab["fine"] == np.round(tab["fine"]))
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(2400)
         + 1j * rng.standard_normal(2400)).astype(np.complex64)
    xx = jnp.asarray(np.stack([x, x]))
    y, cyc = kernels.nco_mix(xx, jnp.zeros(2, jnp.float32),
                             jnp.asarray(tab["coarse"]),
                             jnp.asarray(tab["fine"]),
                             jnp.asarray(tab["block_step"]), tab["fs"])
    for i, f in enumerate(freqs):
        ref, _ = ref_demod.mix(x, f, fs, 0.0)
        assert np.max(np.abs(np.asarray(y[i]) - ref)) < 2e-5
    # cycle state advances exactly
    assert np.asarray(cyc)[0] == (2400 * 12_500) % 2_400_000


def test_stage_apply_matches_oracle(rng):
    plan = design.build_resample_plan(2.4e6)
    st = plan.stages[-1]
    x = (rng.standard_normal(2000)
         + 1j * rng.standard_normal(2000)).astype(np.complex64)
    n = len(x) - len(x) % (st.down * st.up)
    x = x[:n]
    hist_np = np.zeros(polyphase.stage_history_len(st), np.complex64)
    y_ref, _ = polyphase.stage_apply(st, x, hist_np)
    xx = jnp.asarray(x[None, :])
    hh = jnp.asarray(hist_np[None, :])
    y_jax, h2 = kernels.stage_apply(st, xx, hh)
    assert np.max(np.abs(np.asarray(y_jax[0]) - y_ref)) < 1e-4
    assert np.max(np.abs(np.asarray(h2[0]) - x[-len(hist_np):])) == 0


def test_fused_polyphase_matches_oracle_all_shapes(rng):
    """The fused multi-channel polyphase conv (kernels.stage_apply L>1
    path) must match the NumPy oracle for every (L, M) shape in use,
    including the 80->72 kHz L=9/M=10 stage it was built for."""
    for L, M, taps_n in [(9, 10, 135), (3, 4, 48), (2, 5, 31),
                         (5, 2, 25), (4, 3, 40)]:
        taps = np.asarray(
            rng.standard_normal(taps_n), np.float32) / taps_n
        st = design.ResampleStage(up=L, down=M, taps=tuple(taps.tolist()))
        n = 40 * M * L
        x = (rng.standard_normal(n)
             + 1j * rng.standard_normal(n)).astype(np.complex64)
        hist_np = np.zeros(polyphase.stage_history_len(st), np.complex64)
        y_ref, _ = polyphase.stage_apply(st, x, hist_np)
        y_jax, h2 = kernels.stage_apply(
            st, jnp.asarray(x[None]), jnp.asarray(hist_np[None]))
        err = np.max(np.abs(np.asarray(y_jax[0]) - y_ref))
        assert err < 1e-4, f"L={L} M={M}: {err}"
        assert np.max(np.abs(np.asarray(h2[0]) - x[-len(hist_np):])) == 0


def test_fir_apply_matches_oracle(rng):
    taps = design.rrc_taps(sps=4).astype(np.float32)
    x = (rng.standard_normal(500)
         + 1j * rng.standard_normal(500)).astype(np.complex64)
    hist = np.zeros(len(taps) - 1, np.complex64)
    y_ref, _ = polyphase.fir_stream(taps, x, hist)
    y_jax, _ = kernels.fir_apply(taps, jnp.asarray(x[None]),
                                 jnp.asarray(hist[None]))
    assert np.max(np.abs(np.asarray(y_jax[0]) - y_ref)) < 1e-4


def test_single_carrier_matches_oracle():
    rng = np.random.default_rng(42)
    bits = rng.integers(0, 2, 2400).astype(np.uint8)
    iq = modulator.generate_carrier(bits, fs=2.4e6, snr_db=15,
                                    rng=np.random.default_rng(7))
    oracle = ref_demod.OracleDemod(fs=2.4e6).run(
        iq, block_size=24_000)["symbols"]
    bank = CarrierBankDemod(fs=2.4e6, freqs_hz=[0], block_len=24_000)
    jax_syms = bank.run(iq)["symbols"][0]
    n = min(len(oracle), len(jax_syms))
    assert n > 900
    assert float(np.mean(oracle[:n] == jax_syms[:n])) == 1.0


@pytest.mark.integration
def test_eight_carrier_channelizer():
    """BASELINE config 2: 8 carriers from one 2.4 Msps capture."""
    rng = np.random.default_rng(0)
    C = 8
    offsets = [(-4 + i) * 25_000 + 12_500 for i in range(C)]
    bits = [rng.integers(0, 2, 1200).astype(np.uint8) for _ in range(C)]
    iq = modulator.generate_multi_carrier(
        bits, fs=2.4e6, offsets_hz=offsets, snr_db=20,
        rng=np.random.default_rng(1))
    bank = CarrierBankDemod(fs=2.4e6, freqs_hz=offsets, block_len=24_000)
    out = bank.run(iq)
    for ci in range(C):
        tx = modulator.bits_to_symbols(bits[ci])[:400]
        rx = out["symbols"][ci]
        best = max(float(np.mean(rx[s:s + len(tx)] == tx))
                   for s in range(len(rx) - len(tx) + 1))
        assert best == 1.0, f"carrier {ci}"


def test_sync_correlate_matches_host(rng):
    bits = rng.integers(0, 2, (3, 600)).astype(np.uint8)
    bits[1, 100:122] = dec_mod.SYNC_PATTERNS["TS1"]
    dev = np.asarray(sync.sync_correlate(jnp.asarray(bits)))
    for ci in range(3):
        host = dec_mod.sync_correlate(bits[ci])
        assert np.max(np.abs(dev[ci] - host)) < 1e-5
    assert dev[1, 100] == 1.0


def test_crc_device_matches_host(rng):
    batch = rng.integers(0, 2, (8, 216)).astype(np.uint8)
    dev = np.asarray(sync.crc16_batch_device(jnp.asarray(batch)))
    host = crc_mod.crc16_batch(batch)
    assert np.array_equal(dev, host)


def test_crc_error_counts_gate(rng):
    payload = rng.integers(0, 2, (4, 200)).astype(np.uint8)
    rows = np.stack([crc_mod.append_crc(p) for p in payload])
    errs = np.asarray(sync.crc_error_counts(jnp.asarray(rows)))
    assert np.all(errs == 0)
    rows[0, -1] ^= 1
    rows[1] = 0
    errs = np.asarray(sync.crc_error_counts(jnp.asarray(rows)))
    assert errs[0] == 1
    assert errs[1] == 99          # degenerate row
    assert np.all(errs[2:] == 0)
