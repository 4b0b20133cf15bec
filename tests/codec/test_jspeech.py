"""voice/jspeech.py (batched JAX ACELP decoder) vs the C++ decoder.

The C++ decoder (voice/csrc/etsi_acelp_dec.cpp, loaded through the
production codec library) is the anchor — itself pinned bit-for-bit to
the ETSI reference sdecoder binary in test_acelp_oracle.py.  The JAX
decoder must reproduce its PCM output sample-for-sample for ANY
[BFI + 137 serial bits] stream, including concealment state carried
across frames.

Input domain: every 137-bit pattern is a valid decoder input (the
channel decoder hands over whatever the Viterbi emits), so random bits
+ random BFI flags fuzz the full domain; targeted streams pin the
pitch-lag corners (t0=143 with frac=+1, the index<=196 boundary) and
the first-frame-BFI path.
"""

import ctypes

import numpy as np
import pytest

from tetraear_tpu.voice import codec as vcodec
from tetraear_tpu.voice import jspeech

pytestmark = pytest.mark.skipif(
    vcodec._LIB is None,
    reason="native codec not built (make -C tetraear_tpu/voice/csrc)")


def _c_decode_stream(frames_bits: np.ndarray) -> np.ndarray:
    """frames_bits (F, 138) int16 -> (F, 240) int16 via one fresh C
    decoder state (tetra_speech_decode: bits2prm + decode + x2)."""
    lib = vcodec._LIB
    dec = lib.tetra_speech_decoder_new()
    try:
        out = np.empty((frames_bits.shape[0], 240), np.int16)
        for i, fr in enumerate(frames_bits.astype(np.int16)):
            pcm = np.empty(240, np.int16)
            rc = lib.tetra_speech_decode(
                dec, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
            assert rc == 0
            out[i] = pcm
        return out
    finally:
        lib.tetra_speech_decoder_free(dec)


def _assert_streams_match(streams: list[np.ndarray]):
    """streams: list of (F_i, 138) per-carrier frame streams.  Runs the
    batched JAX decoder over the padded batch and compares each carrier
    against its independent C decode."""
    B = len(streams)
    fmax = max(s.shape[0] for s in streams)
    frames = np.zeros((B, fmax, 138), np.int32)
    valid = np.zeros((B, fmax), bool)
    for b, s in enumerate(streams):
        frames[b, :s.shape[0]] = s
        valid[b, :s.shape[0]] = True

    state = jspeech.init_state(B)
    state, pcm = jspeech.decode_block_jit(state, frames, valid)
    pcm = np.asarray(pcm)

    for b, s in enumerate(streams):
        want = _c_decode_stream(s)
        got = pcm[b, :s.shape[0]].astype(np.int16)
        np.testing.assert_array_equal(
            got, want, err_msg=f"carrier {b} diverged from C decoder")
    # invalid slots emit silence
    assert not pcm[~valid].any()


def _rand_stream(rng, n_frames, bfi_p=0.0):
    s = rng.integers(0, 2, (n_frames, 138)).astype(np.int32)
    s[:, 0] = (rng.random(n_frames) < bfi_p).astype(np.int32)
    return s


def test_random_bits_single_frame():
    rng = np.random.default_rng(21)
    _assert_streams_match([_rand_stream(rng, 1) for _ in range(8)])


def test_random_streams_stateful():
    rng = np.random.default_rng(22)
    _assert_streams_match([_rand_stream(rng, 40) for _ in range(4)])


def test_bfi_concealment_mix():
    rng = np.random.default_rng(23)
    streams = [_rand_stream(rng, 30, bfi_p=0.3) for _ in range(4)]
    streams[0][0, 0] = 1                      # first-frame BFI path
    streams[1][:, 0] = 1                      # all-BFI carrier
    _assert_streams_match(streams)


def _prm_stream(prms: np.ndarray) -> np.ndarray:
    """(F, 24) [BFI + 23 params] -> (F, 138) serial frames via the
    spec's prm2bits layout (acelp_tables.BITNO, MSB first)."""
    from tetraear_tpu.voice import acelp_tables as T
    out = np.zeros((prms.shape[0], 138), np.int32)
    out[:, 0] = prms[:, 0]
    for f in range(prms.shape[0]):
        off = 1
        for j, nb in enumerate(T.BITNO):
            v = int(prms[f, 1 + j])
            for k in range(int(nb)):
                out[f, off + k] = (v >> (int(nb) - 1 - k)) & 1
            off += int(nb)
    return out


def test_pitch_lag_corners():
    """t0=143 frac=+1 (the excitation-history corner), t0 minimum, and
    the fractional/integer pitch boundary index=196/197."""
    rng = np.random.default_rng(24)
    streams = []
    for pitch1 in (255, 196, 197, 0, 130):
        prms = np.zeros((6, 24), np.int32)
        prms[:, 1:] = np.array(
            [rng.integers(0, 1 << int(nb)) for nb in
             [8, 9, 9, 8, 14, 1, 1, 6, 5, 14, 1, 1, 6, 5, 14, 1, 1, 6,
              5, 14, 1, 1, 6]], np.int32)[None]
        prms[:, 4] = pitch1               # subframe-1 pitch index
        prms[:, 9] = 31                   # max delta lags
        prms[:, 14] = 0
        prms[:, 19] = 15
        streams.append(_prm_stream(prms))
    _assert_streams_match(streams)


def test_decode_block_masked_state_equivalence():
    """A carrier receiving frames through masked slots must end in the
    same state as one receiving them contiguously."""
    rng = np.random.default_rng(25)
    s = _rand_stream(rng, 6)

    B = 1
    frames = np.zeros((B, 12, 138), np.int32)
    valid = np.zeros((B, 12), bool)
    frames[0, ::2] = s                      # frames in even slots only
    valid[0, ::2] = True

    st = jspeech.init_state(B)
    st, pcm = jspeech.decode_block_jit(st, frames, valid)

    st2 = jspeech.init_state(B)
    st2, pcm2 = jspeech.decode_block_jit(
        st2, s[None].astype(np.int32), np.ones((1, 6), bool))

    np.testing.assert_array_equal(np.asarray(pcm)[0, ::2],
                                  np.asarray(pcm2)[0])
    for a, b in zip(st, st2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_incremental_blocks_match_one_shot():
    """decode_block called block-by-block (carried state) must equal
    one big call — the streaming Pipeline contract."""
    rng = np.random.default_rng(26)
    s = _rand_stream(rng, 9, bfi_p=0.2)

    st = jspeech.init_state(2)
    outs = []
    for i in range(3):
        blk = np.stack([s[3 * i:3 * i + 3]] * 2).astype(np.int32)
        st, pcm = jspeech.decode_block_jit(st, blk, np.ones((2, 3), bool))
        outs.append(np.asarray(pcm))
    got = np.concatenate(outs, axis=1)

    st1 = jspeech.init_state(2)
    _, want = jspeech.decode_block_jit(
        st1, np.stack([s] * 2).astype(np.int32), np.ones((2, 9), bool))
    np.testing.assert_array_equal(got, np.asarray(want))
