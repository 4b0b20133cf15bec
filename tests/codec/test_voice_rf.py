"""Integration: the complete voice path through RF.

speech PCM -> ACELP encode -> channel encode -> golden traffic slots ->
pi/4-DQPSK IQ at 2.4 Msps -> carrier-bank demod -> frame decode ->
soft-bit codec blocks -> Viterbi channel decode -> ACELP decode -> PCM.

The reference could never test this: its codec was four opaque Windows
exes and it had no transmitter.
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


def test_voice_through_rf(tmp_path):
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.ref import golden
    from tetraear_tpu.runtime.sources import FileIQSource, write_capture

    pcm = _speech(6)
    iq = golden.golden_voice_iq(pcm, fs=2.4e6, snr_db=25, seed=5)
    path = tmp_path / "voice.cfile"
    write_capture(path, iq)

    audio_chunks = []
    frames = []
    cfg = PipelineConfig(sample_rate=2.4e6, detect_gate=False, voice=True,
                         validate=False, block_len=32_000)
    pipe = Pipeline(cfg, on_frame=frames.append,
                    on_audio=audio_chunks.append)
    assert pipe.voice is not None
    pipe.run(FileIQSource(path, sample_rate=2.4e6))

    # slots classified as traffic (type 1) and voice-decoded.  The frame
    # layer gates non-control slots through the reference's heuristic MAC
    # parse (unparseable MAC + failed CRC -> discard), so a voice slot
    # whose coded bits happen not to parse can legitimately drop — allow
    # one of six, as the reference chain would.
    assert len(frames) >= 5
    assert all(f.get("type") == 1 for f in frames)
    assert pipe.stats.voice_frames >= 5
    audio = np.concatenate(audio_chunks)
    assert len(audio) == pipe.stats.voice_frames * 480
    assert np.max(np.abs(audio)) > 0.05

    # transmitted pitch survives the whole chain
    seg = audio[240:] - np.mean(audio[240:])
    ac = np.correlate(seg, seg, "full")[len(seg) - 1:]
    peak = int(np.argmax(ac[40:80])) + 40
    assert abs(peak - 57) <= 3


def test_batched_voice_channel_decode_used(tmp_path, monkeypatch):
    """With multiple voice slots per block the Pipeline must channel-
    decode them in one device dispatch (jviterbi), producing the same
    audio as the host path (the two are bit-exact, test_jviterbi)."""
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.ref import golden
    from tetraear_tpu.runtime.sources import FileIQSource, write_capture
    from tetraear_tpu.voice import jviterbi

    calls = []
    orig = jviterbi.channel_decode_batch

    def counting(soft):
        calls.append(np.atleast_2d(soft).shape[0])
        return orig(soft)

    monkeypatch.setattr(jviterbi, "channel_decode_batch", counting)

    pcm = _speech(8)
    iq = golden.golden_voice_iq(pcm, fs=2.4e6, snr_db=28, seed=9)
    path = tmp_path / "voice.cfile"
    write_capture(path, iq)
    audio_chunks = []
    cfg = PipelineConfig(sample_rate=2.4e6, detect_gate=False, voice=True,
                         validate=False, block_len=131_072)
    pipe = Pipeline(cfg, on_audio=audio_chunks.append)
    pipe.run(FileIQSource(path, sample_rate=2.4e6))

    assert calls and max(calls) >= 2, f"batched path not used: {calls}"
    assert pipe.stats.voice_frames >= 6
    audio = np.concatenate(audio_chunks)
    seg = audio[240:] - np.mean(audio[240:])
    ac = np.correlate(seg, seg, "full")[len(seg) - 1:]
    peak = int(np.argmax(ac[40:80])) + 40
    assert abs(peak - 57) <= 3


def test_frame_stealing_voice_through_rf(tmp_path):
    """Frame-stealing slots (normal training sequence 2, EN 300 392-2
    §9.4.4.3.2) carry one half-slot-coded speech frame in block 2
    (EN 300 395-2 §5).  The reference DROPS these slots (its codec only
    consumes full 432-bit blocks); we decode them, concealing the stolen
    first half via the spec's frame-substitution path."""
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.ref import golden
    from tetraear_tpu.runtime.sources import FileIQSource, write_capture

    pcm = _speech(8)
    iq = golden.golden_voice_iq(pcm, fs=2.4e6, snr_db=28, seed=7,
                                stolen_every=4)
    path = tmp_path / "voice_fs.cfile"
    write_capture(path, iq)

    audio_chunks = []
    frames = []
    cfg = PipelineConfig(sample_rate=2.4e6, detect_gate=False, voice=True,
                         validate=False, block_len=32_000)
    pipe = Pipeline(cfg, on_frame=frames.append,
                    on_audio=audio_chunks.append)
    pipe.run(FileIQSource(path, sample_rate=2.4e6))

    # 8 slots, every 4th stolen -> 2 stolen + 6 full (minus the usual
    # allowance of one MAC-gated drop among the full slots)
    assert pipe.stats.stolen_frames == 2
    assert pipe.stats.voice_frames >= 7
    stolen_seen = [f for f in frames if f.get("stolen")]
    assert len(stolen_seen) == 2
    audio = np.concatenate(audio_chunks)
    assert len(audio) == pipe.stats.voice_frames * 480

    # pitch must survive, including across the concealed half slots
    seg = audio[240:] - np.mean(audio[240:])
    ac = np.correlate(seg, seg, "full")[len(seg) - 1:]
    peak = int(np.argmax(ac[40:80])) + 40
    assert abs(peak - 57) <= 3


def test_parallel_voice_synthesis_matches_sequential(tmp_path):
    """voice_threads > 1 runs one synthesis task per carrier on a
    thread pool (api._synth_voice_parallel); audio chunks, their order
    and the voice stats must be identical to the sequential path."""
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.ref import golden
    from tetraear_tpu.runtime.sources import FileIQSource, write_capture

    fs = 2.4e6
    # stolen_every exercises the decoder-state ORDERING contract: a
    # stolen voice slot synthesizes inline on the carrier's stateful
    # decoder, so pre-synthesis must stop at it (api._synth_voice_
    # parallel) or later frames see reordered state updates
    v0 = golden.golden_voice_iq(_speech(6, pitch=57, seed=0), fs=fs,
                                snr_db=None, seed=5, stolen_every=3)
    v1 = golden.golden_voice_iq(_speech(6, pitch=44, seed=1), fs=fs,
                                snr_db=None, seed=6)
    n = min(len(v0), len(v1))
    t = np.arange(n) / fs
    iq = (v0[:n] * np.exp(-2j * np.pi * 250e3 * t)
          + v1[:n] * np.exp(2j * np.pi * 250e3 * t)).astype(np.complex64)
    path = tmp_path / "mc_voice.cfile"
    write_capture(path, iq)

    def run(threads):
        audio, frames = [], []
        cfg = PipelineConfig(sample_rate=fs,
                             carrier_offsets_hz=(-250e3, 250e3),
                             detect_gate=False, voice=True,
                             validate=False, block_len=32_000,
                             voice_threads=threads)
        pipe = Pipeline(cfg, on_frame=frames.append,
                        on_audio=audio.append)
        if threads > 1:
            assert pipe._voice_pool is not None
        pipe.run(FileIQSource(path, sample_rate=fs))
        return audio, pipe.stats.voice_frames

    seq, n_seq = run(0)
    par, n_par = run(4)
    assert n_seq == n_par >= 8
    assert len(seq) == len(par)
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a, b)


def test_pipeline_lazy_soft_voice_matches_dense(tmp_path):
    """Sparse mode + voice: soft planes stay on device and decoded
    carriers' rows are gathered lazily — the synthesized audio must be
    bit-identical to the dense-fetch pipeline."""
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.ref import golden
    from tetraear_tpu.runtime.sources import FileIQSource, write_capture

    fs = 2.4e6
    v0 = golden.golden_voice_iq(_speech(8, pitch=57, seed=0), fs=fs,
                                snr_db=None, seed=15)
    v1 = golden.golden_voice_iq(_speech(8, pitch=44, seed=1), fs=fs,
                                snr_db=None, seed=16)
    n = min(len(v0), len(v1))
    t = np.arange(n) / fs
    iq = (v0[:n] * np.exp(-2j * np.pi * 250e3 * t)
          + v1[:n] * np.exp(2j * np.pi * 250e3 * t)).astype(np.complex64)
    path = tmp_path / "mc_voice2.cfile"
    write_capture(path, iq)

    def run(sparse):
        audio = []
        # block_len large enough that K - 2 >= T engages the lazy path
        cfg = PipelineConfig(sample_rate=fs,
                             carrier_offsets_hz=(-250e3, 250e3),
                             detect_gate=False, voice=True,
                             validate=False, block_len=131_072,
                             sparse_hits=sparse)
        pipe = Pipeline(cfg, on_audio=audio.append)
        pipe.run(FileIQSource(path, sample_rate=fs))
        if sparse:
            assert pipe._prev_soft is not None   # lazy path engaged
        return audio, pipe.stats.voice_frames

    seq, n_seq = run(False)
    lazy, n_lazy = run(True)
    assert n_seq == n_lazy >= 10
    assert len(seq) == len(lazy)
    for a, b in zip(seq, lazy):
        np.testing.assert_array_equal(a, b)


def test_listen_clear_tool_records_calls(tmp_path):
    """The listen-clear workload end-to-end: synthetic voice carrier ->
    decode -> VoiceAccumulator -> call WAV with the speech pitch."""
    from tetraear_tpu.tools import listen_clear
    from tetraear_tpu.voice.export import read_wav

    rc = listen_clear.main(["--source", "synthetic-voice",
                            "--max-blocks", "4",
                            "-o", str(tmp_path), "--gap", "0.5"])
    assert rc == 0
    wavs = list(tmp_path.glob("call_*.wav"))
    assert wavs, "no call recorded"
    pcm, rate = read_wav(wavs[0])
    assert rate == 8000
    assert len(pcm) >= 2000
    seg = pcm[240:].astype(np.float64)
    seg -= seg.mean()
    ac = np.correlate(seg, seg, "full")[len(seg) - 1:]
    peak = int(np.argmax(ac[40:80])) + 40
    assert abs(peak - 57) <= 3
