"""Unit tests: pow2 FFT channelizer frontend vs conv frontend, wideband."""

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


def _pad_to(iq, n, rng):
    if len(iq) >= n:
        return iq[:n]
    noise = 0.001 * (rng.standard_normal(n - len(iq))
                     + 1j * rng.standard_normal(n - len(iq)))
    return np.concatenate([iq, noise.astype(np.complex64)])


def test_channelizer_pow2_sizing():
    from tetraear_tpu.dsp.channelizer import choose_decim, choose_nfft
    assert choose_decim(2.4e6) == 16            # -> 150 kHz, L=12 back
    assert choose_nfft(2.4e6) == 2 ** 18
    assert choose_decim(2.304e6) == 32          # -> 72 kHz, no back stage
    assert choose_decim(9.216e6) == 128
    assert choose_decim(30.72e6) == 256         # -> 120 kHz channels
    bank = CarrierBankDemod(fs=2.4e6, freqs_hz=[12_500.0], frontend="fft")
    ch = bank.channelizer
    assert (ch.nfft & (ch.nfft - 1)) == 0       # pow2
    assert (ch.n_band & (ch.n_band - 1)) == 0
    assert ch.block_len + ch.overlap == ch.nfft
    assert np.all(np.abs(ch.residual_hz) <= ch.fs / ch.nfft / 2 + 1e-9)


@pytest.mark.integration
def test_fft_frontend_matches_conv():
    rng = np.random.default_rng(0)
    C = 4
    offsets = [(i - 2) * 25_000 + 12_500 for i in range(C)]
    bits = [rng.integers(0, 2, 8400).astype(np.uint8) for _ in range(C)]
    iq = modulator.generate_multi_carrier(
        bits, fs=2.4e6, offsets_hz=offsets, snr_db=18,
        rng=np.random.default_rng(1))
    conv = CarrierBankDemod(fs=2.4e6, freqs_hz=offsets,
                            block_len=40_000).run(iq)
    fft = CarrierBankDemod(fs=2.4e6, freqs_hz=offsets,
                           frontend="fft").run(iq)
    for ci in range(C):
        tx = modulator.bits_to_symbols(bits[ci])[:1200]
        assert _best(conv["symbols"][ci], tx) == 1.0
        assert _best(fft["symbols"][ci], tx) == 1.0


def test_fft_frontend_streaming_blocks():
    """Phase continuity across channelizer blocks: symbols spanning
    multiple blocks decode as one continuous stream."""
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 9000).astype(np.uint8)
    iq = modulator.generate_carrier(bits, fs=2.4e6, freq_offset_hz=50_000,
                                    snr_db=25, rng=np.random.default_rng(4))
    bank = CarrierBankDemod(fs=2.4e6, freqs_hz=[50_000.0], frontend="fft")
    assert len(iq) > 2 * bank.block_len        # spans >= 2 blocks
    out = bank.run(iq)
    tx = modulator.bits_to_symbols(bits)
    # a run crossing the first block boundary must be error-free; the
    # span derives from the bank geometry (block_len depends on the
    # overlap choice, e.g. the fft2p splice alignment)
    n_blocks = len(iq) // bank.block_len
    n_sym = int(n_blocks * bank.block_len / 2.4e6 * 18_000)
    b_sym = int(bank.block_len / 2.4e6 * 18_000)
    assert n_sym - 100 > b_sym + 200           # crosses the boundary
    assert _best(out["symbols"][0], tx[100:n_sym - 100]) == 1.0


def test_nfft_cap_decode_equivalent():
    """The fused-envelope nfft cap (bench.py _make_bank): a bank built
    with HALF the default nfft — i.e. the 2^27-geometry fallback that
    runs two sequential overlap-save blocks where one would not compile
    — must decode the same capture error-free.  The per-block timing
    estimates shift with the blocking, so the contract is decode
    equivalence on the interior, not state bit-equality."""
    rng = np.random.default_rng(9)
    bits = rng.integers(0, 2, 9000).astype(np.uint8)
    iq = modulator.generate_carrier(bits, fs=2.4e6, freq_offset_hz=50_000,
                                    snr_db=25, rng=np.random.default_rng(4))
    full = CarrierBankDemod(fs=2.4e6, freqs_hz=[50_000.0], frontend="fft")
    half = CarrierBankDemod(fs=2.4e6, freqs_hz=[50_000.0], frontend="fft",
                            nfft=full.channelizer.nfft // 2)
    assert half.channelizer.nfft * 2 == full.channelizer.nfft
    tx = modulator.bits_to_symbols(bits)
    # interior span covered by BOTH bankings (they process different
    # whole-block sample counts)
    covered = min((len(iq) // half.block_len) * half.block_len,
                  (len(iq) // full.block_len) * full.block_len)
    n_sym = int(covered / 2.4e6 * 18_000)
    want = tx[100:n_sym - 100]
    assert _best(full.run(iq)["symbols"][0], want) == 1.0
    assert _best(half.run(iq)["symbols"][0], want) == 1.0


@pytest.mark.integration
@pytest.mark.slow
def test_wideband_9p6_msps():
    """Config-3-style wideband: carriers spread over +-3 MHz at 9.6 Msps."""
    fs = 9.6e6
    rng = np.random.default_rng(0)
    hot = [-2_987_500.0, -1_237_500.0, 12_500.0, 2_512_500.0]
    bits = [rng.integers(0, 2, 1600).astype(np.uint8) for _ in hot]
    iq = modulator.generate_multi_carrier(
        bits, fs=fs, offsets_hz=hot, snr_db=20,
        rng=np.random.default_rng(1))
    bank = CarrierBankDemod(fs=fs, freqs_hz=hot, frontend="fft")
    iq = _pad_to(iq, bank.block_len, np.random.default_rng(2))
    out = bank.run(iq)
    for i in range(len(hot)):
        tx = modulator.bits_to_symbols(bits[i])[:500]
        assert _best(out["symbols"][i], tx) == 1.0, f"carrier {i}"


@pytest.mark.integration
def test_aligned_row_gather_path():
    """fs in the 10.24 MHz family puts grid carriers on 128-bin
    boundaries -> row-gather extraction; decisions must stay exact."""
    fs = 10.24e6
    rng = np.random.default_rng(0)
    hot = [-3_012_500.0, -37_500.0, 12_500.0, 2_512_500.0]
    bits = [rng.integers(0, 2, 2200).astype(np.uint8) for _ in hot]
    iq = modulator.generate_multi_carrier(
        bits, fs=fs, offsets_hz=hot, snr_db=20,
        rng=np.random.default_rng(1))
    bank = CarrierBankDemod(fs=fs, freqs_hz=hot, frontend="fft")
    assert bank.channelizer.aligned
    assert bank.channelizer.out_rate == 80_000.0
    iq = _pad_to(iq, bank.block_len, np.random.default_rng(2))
    out = bank.run(iq[:bank.block_len])
    for i in range(len(hot)):
        tx = modulator.bits_to_symbols(bits[i])[:600]
        assert _best(out["symbols"][i], tx) == 1.0, f"carrier {i}"


def test_pallas_band_extract_interpret():
    """The Pallas DMA extraction kernel agrees with the gather reference
    (interpreter mode; see pallas_kernels docstring for hardware
    constraints)."""
    import jax.numpy as jnp
    from tetraear_tpu.dsp.pallas_kernels import (band_extract,
                                                 band_extract_reference)
    rng = np.random.default_rng(0)
    nfft, n_band, C = 4096, 256, 8
    x = rng.standard_normal((nfft + n_band, 2)).astype(np.float32)
    starts = rng.integers(0, nfft, C).astype(np.int32)
    ref = np.asarray(band_extract_reference(jnp.asarray(x),
                                            jnp.asarray(starts), n_band))
    pal = np.asarray(band_extract(jnp.asarray(x), jnp.asarray(starts),
                                  n_band, interpret=True))
    assert np.array_equal(ref, pal)


def test_fft_frontend_validates_block():
    with pytest.raises(ValueError):
        CarrierBankDemod(fs=2.4e6, freqs_hz=[0.0], block_len=12_345,
                         frontend="fft")


def test_pallas_extract_flag_bit_exact(monkeypatch):
    """TETRAEAR_PALLAS_EXTRACT=1 swaps the aligned row gather for the
    plane-layout Pallas DMA kernel (interpret mode off-TPU); symbol
    decisions must be identical."""
    fs = 10.24e6
    rng = np.random.default_rng(0)
    hot = [-3_012_500.0, -37_500.0, 12_500.0, 2_512_500.0]
    bits = [rng.integers(0, 2, 2200).astype(np.uint8) for _ in hot]
    iq = modulator.generate_multi_carrier(
        bits, fs=fs, offsets_hz=hot, snr_db=20,
        rng=np.random.default_rng(1))
    base = CarrierBankDemod(fs=fs, freqs_hz=hot, frontend="fft")
    iq = _pad_to(iq, base.block_len, np.random.default_rng(2))
    ref = base.run(iq[:base.block_len])

    monkeypatch.setenv("TETRAEAR_PALLAS_EXTRACT", "1")
    bank = CarrierBankDemod(fs=fs, freqs_hz=hot, frontend="fft")
    assert bank.channelizer.use_pallas
    out = bank.run(iq[:bank.block_len])
    np.testing.assert_array_equal(np.asarray(ref["symbols"]),
                                  np.asarray(out["symbols"]))


@pytest.mark.integration
def test_adjacent_channel_rejection():
    """Near-far selectivity: a +30 dB blocker in the adjacent 25 kHz
    channel must not disturb the target carrier on either frontend (the
    RRC + channel-select stop band sets this; measured cliff is ~+45 dB)."""
    rng = np.random.default_rng(2)
    bits_w = rng.integers(0, 2, 6000).astype(np.uint8)
    bits_s = rng.integers(0, 2, 6000).astype(np.uint8)
    tx = modulator.bits_to_symbols(bits_w)
    weak = modulator.generate_carrier(bits_w, fs=2.4e6, freq_offset_hz=0.0)
    strong = modulator.generate_carrier(bits_s, fs=2.4e6,
                                        freq_offset_hz=25e3)
    n = min(len(weak), len(strong))
    iq = (weak[:n] + strong[:n] * (10 ** (30 / 20))).astype(np.complex64)
    iq = modulator.add_awgn(iq, 60, np.random.default_rng(3))

    for fe in ("conv", "fft"):
        bank = CarrierBankDemod(fs=2.4e6, freqs_hz=[0.0], frontend=fe)
        blk = _pad_to(iq, bank.block_len, np.random.default_rng(4))
        out = bank.run(blk[:bank.block_len])
        sym = out["symbols"][0]
        tail = sym[len(sym) // 2:len(sym) // 2 + 1000]
        match = max(float(np.mean(tail == tx[s:s + len(tail)]))
                    for s in range(len(tx) - len(tail)))
        assert match == 1.0, f"{fe}: {match}"


@pytest.mark.integration
def test_cochannel_capture():
    """Co-channel capture: with an interferer on the SAME channel at
    C/I = 10 dB the stronger carrier decodes cleanly (differential
    detection capture effect; measured threshold ~8 dB)."""
    rng = np.random.default_rng(6)
    bits_a = rng.integers(0, 2, 6000).astype(np.uint8)
    bits_b = rng.integers(0, 2, 6000).astype(np.uint8)
    tx = modulator.bits_to_symbols(bits_a)
    a = modulator.generate_carrier(bits_a, fs=2.4e6, freq_offset_hz=0.0)
    b = modulator.generate_carrier(bits_b, fs=2.4e6, freq_offset_hz=0.0,
                                   rng=np.random.default_rng(9))
    n = min(len(a), len(b))
    iq = (a[:n] + b[:n] * (10 ** (-10 / 20))).astype(np.complex64)
    iq = modulator.add_awgn(iq, 40, np.random.default_rng(3))
    bank = CarrierBankDemod(fs=2.4e6, freqs_hz=[0.0])
    blk = _pad_to(iq, bank.block_len, np.random.default_rng(4))
    out = bank.run(blk[:bank.block_len])
    sym = out["symbols"][0]
    tail = sym[len(sym) // 2:len(sym) // 2 + 1000]
    match = max(float(np.mean(tail == tx[s:s + len(tail)]))
                for s in range(len(tx) - len(tail)))
    assert match == 1.0


@pytest.mark.integration
def test_multipath_two_ray():
    """Urban two-ray channel: a -3 dB echo at 10 us delay (~1/5 of the
    55.6 us symbol) decodes cleanly — the RRC matched filter plus
    differential detection absorb intra-symbol multipath without an
    equalizer (TETRA's design point)."""
    rng = np.random.default_rng(8)
    bits = rng.integers(0, 2, 6000).astype(np.uint8)
    tx = modulator.bits_to_symbols(bits)
    fs = 2.4e6
    iq = modulator.generate_carrier(bits, fs=fs, freq_offset_hz=0.0)
    d = int(round(10e-6 * fs))
    echo = np.zeros_like(iq)
    echo[d:] = iq[:-d] * (10 ** (-3 / 20)) * np.exp(1j * 0.7)
    y = modulator.add_awgn((iq + echo).astype(np.complex64), 30,
                           np.random.default_rng(3))
    bank = CarrierBankDemod(fs=fs, freqs_hz=[0.0])
    blk = _pad_to(y, bank.block_len, np.random.default_rng(4))
    out = bank.run(blk[:bank.block_len])
    sym = out["symbols"][0]
    tail = sym[len(sym) // 2:len(sym) // 2 + 1000]
    match = max(float(np.mean(tail == tx[s:s + len(tail)]))
                for s in range(len(tx) - len(tail)))
    assert match == 1.0

@pytest.mark.integration
def test_quantized_row_gather_path():
    """fs in the 72 kHz * 2^m family (no back-half resample) has a bin
    grid incommensurate with the 25 kHz channel grid, so band starts are
    NOT 128-lane aligned; the quantized extraction (aligned row gather +
    rolled H1 + residual-shift ramp) must still decode exactly."""
    fs = 9.216e6
    rng = np.random.default_rng(0)
    hot = [-2_487_500.0, -37_500.0, 12_500.0, 1_512_500.0]
    bits = [rng.integers(0, 2, 2200).astype(np.uint8) for _ in hot]
    iq = modulator.generate_multi_carrier(
        bits, fs=fs, offsets_hz=hot, snr_db=20,
        rng=np.random.default_rng(1))
    bank = CarrierBankDemod(fs=fs, freqs_hz=hot, frontend="fft")
    ch = bank.channelizer
    assert ch.out_rate == 72_000.0 and not bank.plan.stages
    assert ch.quantized and not ch.aligned
    assert np.any(ch.d_shift > 0)
    iq = _pad_to(iq, 2 * bank.block_len, np.random.default_rng(2))
    out = bank.run(iq)
    for i in range(len(hot)):
        tx = modulator.bits_to_symbols(bits[i])[:600]
        assert _best(out["symbols"][i], tx) == 1.0, f"carrier {i}"


def test_quantized_streaming_continuity():
    """Phase continuity across blocks on the quantized path: the d-bin
    ramp restarts each block while the cycle counters advance by k_c *
    block_len — a long symbol run crossing the boundary must be clean."""
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 16_000).astype(np.uint8)
    iq = modulator.generate_carrier(bits, fs=9.216e6,
                                    freq_offset_hz=137_500.0,
                                    snr_db=25, rng=np.random.default_rng(4))
    bank = CarrierBankDemod(fs=9.216e6, freqs_hz=[137_500.0],
                            frontend="fft")
    assert bank.channelizer.quantized
    assert len(iq) > 2 * bank.block_len
    out = bank.run(iq)
    tx = modulator.bits_to_symbols(bits)
    n_blk_syms = bank.block_len // bank.channelizer.decim // 4
    assert _best(out["symbols"][0],
                 tx[100:n_blk_syms + 2000]) == 1.0


@pytest.mark.unit
def test_fourstep_wideband_fft_matches_fft():
    """_wideband_fft's four-step decomposition (fft4) must equal the
    monolithic FFT to f32 rounding at any pow2 size; production enables
    it above 2^20, here it is forced on at a test-scale nfft."""
    import jax.numpy as jnp
    ch = CarrierBankDemod(fs=9.216e6, freqs_hz=[12_500.0],
                          frontend="fft").channelizer
    assert ch.fft4                       # on at this nfft already
    rng = np.random.default_rng(5)
    xx = (rng.standard_normal(ch.nfft)
          + 1j * rng.standard_normal(ch.nfft)).astype(np.complex64)
    got = np.asarray(ch._wideband_fft(jnp.asarray(xx)))
    want = np.fft.fft(xx)
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert rel < 1e-5, rel


@pytest.mark.unit
def test_sixstep_wideband_fft_matches_fft(monkeypatch):
    """TETRAEAR_FFT6=1 (explicit-transpose six-step first stage) equals
    the monolithic FFT to f32 rounding."""
    import jax.numpy as jnp
    monkeypatch.setenv("TETRAEAR_FFT6", "1")
    ch = CarrierBankDemod(fs=9.216e6, freqs_hz=[12_500.0],
                          frontend="fft").channelizer
    assert ch.fft4
    rng = np.random.default_rng(6)
    xx = (rng.standard_normal(ch.nfft)
          + 1j * rng.standard_normal(ch.nfft)).astype(np.complex64)
    got = np.asarray(ch._wideband_fft(jnp.asarray(xx)))
    want = np.fft.fft(xx)
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert rel < 1e-5, rel




@pytest.mark.unit
def test_fft2p_planes_matches_np_fft():
    """Two-pass Pallas MXU FFT (pallas_kernels.fft2p_planes): natural-
    order planes + wrap extension equal np.fft to f32 rounding."""
    import jax.numpy as jnp
    from tetraear_tpu.dsp import pallas_kernels as pk

    rng = np.random.default_rng(5)
    n1, n2 = 512, 256
    n = n1 * n2
    x = (rng.standard_normal(n)
         + 1j * rng.standard_normal(n)).astype(np.complex64)
    planes = np.stack([x.reshape(n2, n1).real,
                       x.reshape(n2, n1).imag]).astype(np.float32)
    got = np.asarray(pk.fft2p_planes(jnp.asarray(planes), n1, n2,
                                     wrap_k1=2, interpret=True))
    want = np.fft.fft(x)
    gotc = (got[0] + 1j * got[1]).reshape(-1)
    scale = np.max(np.abs(want))
    assert np.max(np.abs(gotc[:n] - want)) / scale < 2e-5
    # wrap rows replay bins 0..2*n2
    assert np.max(np.abs(gotc[n:n + 2 * n2] - want[:2 * n2])) / scale \
        < 2e-5


@pytest.mark.unit
def test_fft2p_chan_raw_decisions_exact(monkeypatch):
    """FusedRx.chan_raw through the two-pass MXU FFT produces the same
    scan verdicts as the XLA four-step glue on a golden carrier."""
    import jax.numpy as jnp
    from tetraear_tpu.dsp import backhalf, kernels
    from tetraear_tpu.ref import golden

    fs = 2.304e6
    payloads = [golden.sds_text_payload("FFT2P CHECK")] * 24
    iq = golden.golden_iq(payloads, fs=fs, freq_offset_hz=12_500.0,
                          snr_db=20, seed=9)
    bank = CarrierBankDemod(fs=fs, freqs_hz=[12_500.0], frontend="fft")
    assert bank.channelizer.fft2p_ok
    fused = backhalf.FusedRx(bank)
    x_r = jnp.asarray(kernels.c2r_np(iq[:bank.block_len]))
    ref, _ = fused.step(x_r, fused.init_state())
    monkeypatch.setenv("TETRAEAR_FFT2P", "1")
    got, _ = fused.step(x_r, fused.init_state())
    # the ~3e-7 relative plane difference may flip noise-region symbols
    # sitting exactly on a decision boundary; the contract is the
    # VERDICTS: identical sync hits, identical CRC counts at the hits
    hits_ref = np.asarray(ref["corr"]) >= 0.90
    hits_got = np.asarray(got["corr"]) >= 0.90
    assert hits_ref.sum() > 0
    np.testing.assert_array_equal(hits_got, hits_ref)
    from tetraear_tpu.dsp import framescan
    off = framescan.TS_OFFSET_BITS // 2
    err_ref = np.asarray(ref["crc_err"])
    err_got = np.asarray(got["crc_err"])
    for c, pe in zip(*np.nonzero(hits_ref)):
        j = pe - off
        if 0 <= j < err_ref.shape[1]:
            assert err_got[c, j] == err_ref[c, j], (c, pe)


@pytest.mark.unit
def test_fft2p_spliced_matches_glue():
    """fft2p_planes_spliced (tail + block as separate planar inputs,
    spliced inside pass 1) is BIT-IDENTICAL to fft2p_planes on the
    stacked concat window — same matmuls on the same tiles."""
    import jax.numpy as jnp
    from tetraear_tpu.dsp import pallas_kernels as pk

    rng = np.random.default_rng(7)
    n1, n2 = 512, 256
    o2 = 16                              # 8-aligned tail row count
    n = n1 * n2
    x = (rng.standard_normal(n)
         + 1j * rng.standard_normal(n)).astype(np.complex64)
    planes = np.stack([x.reshape(n2, n1).real,
                       x.reshape(n2, n1).imag]).astype(np.float32)
    want = np.asarray(pk.fft2p_planes(jnp.asarray(planes), n1, n2,
                                      wrap_k1=2, interpret=True))
    got = np.asarray(pk.fft2p_planes_spliced(
        jnp.asarray(planes[:, :o2]), jnp.asarray(planes[:, o2:]),
        n1, n2, wrap_k1=2, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.unit
def test_fused_planar_spliced_step_exact(monkeypatch):
    """FusedRx.step fed the planar (2, N) block through the spliced
    fft2p input (the production TPU layout) produces bit-identical
    outputs and state to the interleaved (N, 2) glue path."""
    import jax.numpy as jnp
    from tetraear_tpu.dsp import backhalf, kernels
    from tetraear_tpu.ref import golden

    fs = 2.304e6
    payloads = [golden.sds_text_payload("SPLICE CHECK")] * 24
    iq = golden.golden_iq(payloads, fs=fs, freq_offset_hz=12_500.0,
                          snr_db=20, seed=11)
    bank = CarrierBankDemod(fs=fs, freqs_hz=[12_500.0], frontend="fft")
    ch = bank.channelizer
    assert ch.fft2p_splice, "geometry must allow the aligned splice"
    assert ch.overlap % (8 * ch.fft2p_n1) == 0
    fused = backhalf.FusedRx(bank)
    monkeypatch.setenv("TETRAEAR_FFT2P", "1")

    iqb = iq[:bank.block_len]
    x_r = jnp.asarray(kernels.c2r_np(iqb))       # interleaved
    x_p = jnp.asarray(kernels.c2p_np(iqb))       # planar

    monkeypatch.setenv("TETRAEAR_FFT2P_SPLICE", "0")
    ref, st_ref = fused.step(x_r, fused.init_state())
    monkeypatch.delenv("TETRAEAR_FFT2P_SPLICE")
    got, st_got = fused.step(x_p, fused.init_state())

    for k in ("corr", "crc_err", "soft_planes", "n_valid"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]), err_msg=k)
    ct_ref = st_ref["bank"]["channelizer"]["tail"]
    ct_got = st_got["bank"]["channelizer"]["tail"]
    np.testing.assert_array_equal(np.asarray(ct_got),
                                  np.asarray(ct_ref))


@pytest.mark.unit
def test_fft2p_spliced_split_dot(monkeypatch):
    """TETRAEAR_FFT2P_SPLIT_DOT=1 (concat-free spliced pass 1: block
    piece against the lane-sliced DFT matrix + tail rows as broadcast
    outer products) matches the glue path to f32 rounding (not bitwise
    — the tail terms accumulate after the dot)."""
    import jax.numpy as jnp
    from tetraear_tpu.dsp import pallas_kernels as pk

    rng = np.random.default_rng(8)
    n1, n2 = 512, 256
    o2 = 8                               # k = o2/a2 = 4 whole rows
    n = n1 * n2
    x = (rng.standard_normal(n)
         + 1j * rng.standard_normal(n)).astype(np.complex64)
    planes = np.stack([x.reshape(n2, n1).real,
                       x.reshape(n2, n1).imag]).astype(np.float32)
    want = np.asarray(pk.fft2p_planes(jnp.asarray(planes), n1, n2,
                                      wrap_k1=2, interpret=True))
    monkeypatch.setenv("TETRAEAR_FFT2P_SPLIT_DOT", "1")
    got = np.asarray(pk.fft2p_planes_spliced(
        jnp.asarray(planes[:, :o2]), jnp.asarray(planes[:, o2:]),
        n1, n2, wrap_k1=2, interpret=True))
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert rel < 5e-5, rel
