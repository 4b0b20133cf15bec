"""Integration: carrier x time sharded FFT-channelizer demod (configs 4/5).

Each time shard processes one pow2 wideband segment (halo over ppermute),
extracts its local carrier slice, and must reproduce the transmitted
symbols exactly beyond the warmup region — including across shard
boundaries.
"""

import numpy as np
import pytest

from tetraear_tpu.ref import modulator


@pytest.mark.integration
@pytest.mark.slow
def test_sharded_fft_bit_exact():
    import jax
    from tetraear_tpu.runtime.sharding import ShardedFFTDemod, make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    mesh = make_mesh(2, 4)
    fs = 10.24e6
    offs = [-1_012_500.0, -37_500.0, 12_500.0, 1_512_500.0]
    rng = np.random.default_rng(0)
    bits = [rng.integers(0, 2, 20_000).astype(np.uint8) for _ in offs]
    iq = modulator.generate_multi_carrier(
        bits, fs=fs, offsets_hz=offs, snr_db=22,
        rng=np.random.default_rng(1))
    sd = ShardedFFTDemod(fs=fs, freqs_hz=offs, mesh=mesh)
    need = sd.n_time * sd.seg_len
    if len(iq) < need:
        pad = 0.001 * (np.random.default_rng(2).standard_normal(
            need - len(iq)) * (1 + 1j)).astype(np.complex64)
        iq = np.concatenate([iq, pad])
    out = sd.run(iq)
    assert out["hard"].shape[:2] == (len(offs), sd.n_time)
    assert out["sync_hits"] > 0

    bases = {}
    for ci in range(len(offs)):
        tx = modulator.bits_to_symbols(bits[ci])
        for t in range(sd.n_time):
            v = out["valid"][ci, t].astype(bool)
            seg = out["hard"][ci, t][v]
            probe = seg[80:380]
            best, bpos = 0.0, -1
            for s in range(max(1, len(tx) - 300)):
                m = float(np.mean(probe == tx[s:s + 300]))
                if m > best:
                    best, bpos = m, s
            assert best > 0.999, f"carrier {ci} shard {t} misaligned"
            base = bpos - 80
            bases[(ci, t)] = (base, len(seg))
            # the channel-rate back-half halo makes the ENTIRE exposed
            # span exact (not just past a warmup region): zero symbol
            # errors from the first exposed symbol onward
            errs = sum(1 for k in range(8, len(seg))
                       if 0 <= base + k < len(tx) and seg[k] != tx[base + k])
            assert errs == 0, f"carrier {ci} shard {t}: {errs} errors"

    # boundary double-coverage: each shard's exposed halo overlaps the
    # previous shard's tail by at least a full 255-symbol slot, so frames
    # straddling a time-shard boundary are decodable in one shard
    for ci in range(len(offs)):
        for t in range(1, sd.n_time):
            b_prev, n_prev = bases[(ci, t - 1)]
            b_cur, _ = bases[(ci, t)]
            overlap = (b_prev + n_prev) - b_cur
            assert overlap >= 255, (
                f"carrier {ci} boundary {t}: only {overlap} overlap syms")
