"""Device voice synthesis (PipelineConfig.device_voice) equivalence.

The device path keeps per-carrier ACELP decoder states on the
accelerator (voice/jspeech_pool.py) instead of host C handles; since
jspeech is bit-exact vs the C decoder, the Pipeline's audio stream,
frame flags, and stats must be IDENTICAL to the host path — including
frame-stealing slots, whose channel decode moves into
_prepare_voice_batch so the carrier's device state sees its frames in
stream order.
"""

import numpy as np
import pytest

from tetraear_tpu.voice import codec

pytestmark = pytest.mark.codec

if not codec.VoiceProcessor().working:
    pytest.skip("codec library not built", allow_module_level=True)


def _speech(n_slots: int, pitch: int = 57, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = n_slots * 480
    exc = np.zeros(n)
    exc[::pitch] = 1.0
    exc += 0.05 * rng.standard_normal(n)
    y = np.zeros(n)
    for i in range(n):
        y[i] = exc[i]
        if i > 0:
            y[i] += 1.2 * y[i - 1]
        if i > 1:
            y[i] += -0.8 * y[i - 2]
        if i > 2:
            y[i] += 0.3 * y[i - 3]
    return (y / np.max(np.abs(y)) * 8000).astype(np.int16)


def _run_pipeline(path, device: bool, mesh=None):
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.runtime.sources import FileIQSource

    audio, frames = [], []
    cfg = PipelineConfig(sample_rate=2.4e6, detect_gate=False, voice=True,
                         validate=False, block_len=32_000,
                         device_voice=device, device_voice_slots=4,
                         device_voice_mesh=mesh)
    pipe = Pipeline(cfg, on_frame=frames.append, on_audio=audio.append)
    assert pipe.voice is not None
    if device:
        assert pipe._voice_device is not None
    from tetraear_tpu.runtime.sources import FileIQSource  # noqa: F811
    pipe.run(FileIQSource(path, sample_rate=2.4e6))
    return audio, frames, pipe.stats


def _write_voice_capture(tmp_path, **kw):
    from tetraear_tpu.ref import golden
    from tetraear_tpu.runtime.sources import write_capture
    pcm = _speech(6)
    iq = golden.golden_voice_iq(pcm, fs=2.4e6, snr_db=25, seed=5, **kw)
    path = tmp_path / "voice.cfile"
    write_capture(path, iq)
    return path


def _assert_equal_runs(host, dev):
    a_h, f_h, s_h = host
    a_d, f_d, s_d = dev
    assert len(a_h) == len(a_d)
    for x, y in zip(a_h, a_d):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert s_h.voice_frames == s_d.voice_frames
    assert s_h.stolen_frames == s_d.stolen_frames
    assert len(f_h) == len(f_d)
    for x, y in zip(f_h, f_d):
        assert x.get("has_voice") == y.get("has_voice")


def test_device_voice_matches_host(tmp_path):
    path = _write_voice_capture(tmp_path)
    host = _run_pipeline(path, device=False)
    dev = _run_pipeline(path, device=True)
    assert host[2].voice_frames >= 5
    _assert_equal_runs(host, dev)


def test_device_voice_mesh_matches_host(tmp_path):
    """Full production path with the voice slot bank SHARDED over a
    4-device mesh (PipelineConfig.device_voice_mesh): audio stream,
    frame flags and stats must be identical to the host codec path —
    the strongest end-to-end form of the mesh-parity claim."""
    import jax
    from jax.sharding import Mesh

    path = _write_voice_capture(tmp_path)
    host = _run_pipeline(path, device=False)
    mesh = Mesh(np.array(jax.devices()[:4]), ("voice",))
    dev = _run_pipeline(path, device=True, mesh=mesh)
    assert host[2].voice_frames >= 5
    _assert_equal_runs(host, dev)


def test_device_voice_matches_host_stolen(tmp_path):
    path = _write_voice_capture(tmp_path, stolen_every=4)
    host = _run_pipeline(path, device=False)
    dev = _run_pipeline(path, device=True)
    assert host[2].stolen_frames >= 1
    _assert_equal_runs(host, dev)


def test_pool_eviction_resyncs_from_fresh_state():
    """With more carriers than slots the LRU victim restarts from the
    fresh-decoder state — exactly a reference decoder restart."""
    import ctypes

    from tetraear_tpu.voice.jspeech_pool import DeviceSpeechPool

    rng = np.random.default_rng(31)
    pool = DeviceSpeechPool(slots=1)
    streams = {7: rng.integers(0, 2, (2, 138)).astype(np.int16),
               9: rng.integers(0, 2, (2, 138)).astype(np.int16)}
    for s in streams.values():
        s[:, 0] = 0

    lib = codec._LIB

    def c_fresh(frames):
        dec = lib.tetra_speech_decoder_new()
        try:
            out = []
            for fr in frames.astype(np.int16):
                pcm = np.empty(240, np.int16)
                lib.tetra_speech_decode(
                    dec,
                    fr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                    pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
                out.append(pcm)
            return np.concatenate(out).astype(np.float32) / 32768.0
        finally:
            lib.tetra_speech_decoder_free(dec)

    # alternating carriers on one slot: every call is a fresh state
    for ci in (7, 9, 7, 9):
        got = pool.synthesize([(ci, streams[ci])])[0]
        np.testing.assert_array_equal(got, c_fresh(streams[ci]))
