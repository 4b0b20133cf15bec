"""Seamless checkpoint/resume (VERDICT round-2 item 6).

A kill/restore across a block boundary must reproduce the uninterrupted
run bit for bit: the frame straddling the boundary (carried in the
alignment tails), every later frame, AND the voice audio of an active
call (per-carrier ACELP decoder state carries LPC/excitation memory
across the restore — round 2 reset it, an audible artifact per call).
"""

import numpy as np
import pytest

from tetraear_tpu.voice import codec

pytestmark = pytest.mark.unit


def _write_voice_capture(tmp_path, n_slots=8, **kw):
    from tests.unit.test_device_voice import _speech
    from tetraear_tpu.ref import golden
    from tetraear_tpu.runtime.sources import write_capture
    pcm = _speech(n_slots)
    iq = golden.golden_voice_iq(pcm, fs=2.4e6, snr_db=25, seed=5, **kw)
    path = tmp_path / "voice.cfile"
    write_capture(path, iq)
    return path, len(iq)


def _cfg(**kw):
    from tetraear_tpu.api import PipelineConfig
    return PipelineConfig(sample_rate=2.4e6, detect_gate=False,
                          validate=False, block_len=32_000, **kw)


def _blocks(path, n_total, block_len=32_000):
    from tetraear_tpu.runtime.sources import FileIQSource
    out = []
    with FileIQSource(path, sample_rate=2.4e6) as src:
        while True:
            b = src.read_samples(block_len)
            if len(b) < block_len:
                break
            out.append(np.asarray(b, np.complex64))
    return out


def _frame_key(f):
    return {k: v for k, v in f.items()
            if k in ("carrier", "stream_symbol", "burst_crc", "type",
                     "type_name", "sds_message", "has_voice", "tdma",
                     "encrypted", "decrypted")}


def _run(blocks, cfg, split=None, ckpt=None):
    """split=None: uninterrupted.  split=k: process blocks[:k] on one
    pipeline, checkpoint, process blocks[k:] on a FRESH pipeline
    restored from the checkpoint.  Returns (frames, audio chunks)."""
    from tetraear_tpu.api import Pipeline
    frames, audio = [], []
    pipe = Pipeline(cfg, on_frame=frames.append, on_audio=audio.append)
    upto = len(blocks) if split is None else split
    for b in blocks[:upto]:
        pipe.process_block(b)
    if split is None:
        return frames, audio
    pipe.save_checkpoint(ckpt)
    del pipe
    pipe2 = Pipeline(cfg, on_frame=frames.append, on_audio=audio.append)
    pipe2.load_checkpoint(ckpt)
    for b in blocks[split:]:
        pipe2.process_block(b)
    return frames, audio


def _assert_identical(a, b):
    fa, aa = a
    fb, ab = b
    assert len(fa) == len(fb), (len(fa), len(fb))
    for x, y in zip(fa, fb):
        assert _frame_key(x) == _frame_key(y)
        if "bits" in x and "bits" in y:
            np.testing.assert_array_equal(x["bits"], y["bits"])
    assert len(aa) == len(ab), (len(aa), len(ab))
    for x, y in zip(aa, ab):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    path, n = _write_voice_capture(tmp)
    return path, n


def test_resume_straddling_frame_no_voice(capture, tmp_path):
    """Frames (incl. the one straddling the kill point) are identical
    with and without a checkpoint/restore cycle."""
    path, _ = capture
    blocks = _blocks(path, None)
    assert len(blocks) >= 4
    cfg = _cfg(voice=False)
    base = _run(blocks, cfg)
    assert len(base[0]) >= 6, "capture must produce real frames"
    for split in (1, 2, len(blocks) // 2 + 1):
        got = _run(blocks, cfg, split=split,
                   ckpt=tmp_path / f"s{split}.npz")
        _assert_identical(base, got)


@pytest.mark.codec
def test_resume_active_voice_call_host(capture, tmp_path):
    """Host-codec voice: restored LPC/excitation state makes the
    post-restore audio bit-identical to the uninterrupted run."""
    if not codec.VoiceProcessor().working:
        pytest.skip("codec library not built")
    if not codec.VoiceProcessor().stateful:
        pytest.skip("codec .so predates state snapshots (rebuild)")
    path, _ = capture
    blocks = _blocks(path, None)
    cfg = _cfg(voice=True, device_voice=False)
    base = _run(blocks, cfg)
    assert len(base[1]) >= 4, "capture must produce voice audio"
    got = _run(blocks, cfg, split=2, ckpt=tmp_path / "v.npz")
    _assert_identical(base, got)


@pytest.mark.codec
def test_resume_active_voice_call_device(capture, tmp_path):
    """Device-pool voice: the slot bank + carrier map restore; audio
    bit-identical across the kill point."""
    if not codec.VoiceProcessor().working:
        pytest.skip("codec library not built")
    path, _ = capture
    blocks = _blocks(path, None)
    cfg = _cfg(voice=True, device_voice=True, device_voice_slots=4)
    base = _run(blocks, cfg)
    assert len(base[1]) >= 4
    got = _run(blocks, cfg, split=2, ckpt=tmp_path / "vd.npz")
    _assert_identical(base, got)


def test_checkpoint_aux_roundtrip(tmp_path):
    """checkpoint.save_state/load_state carry named aux arrays."""
    import jax.numpy as jnp
    from tetraear_tpu.runtime import checkpoint
    state = {"a": jnp.arange(4.0)}
    checkpoint.save_state(tmp_path / "s.npz", state,
                          extra={"k": 1},
                          aux={"tails": np.arange(6, dtype=np.int16)})
    leaves, extra, aux = checkpoint.load_state(tmp_path / "s.npz")
    assert extra["k"] == 1
    np.testing.assert_array_equal(aux["tails"],
                                  np.arange(6, dtype=np.int16))
    restored = checkpoint.restore_into(state, leaves)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.arange(4.0))


def test_voice_decoder_state_snapshot_roundtrip():
    """C decoder state get/set: a restored decoder continues the
    stream bit-identically to the original."""
    vp = codec.VoiceProcessor()
    if not vp.working:
        pytest.skip("codec library not built")
    if not vp.stateful:
        pytest.skip("codec .so predates state snapshots (rebuild)")
    rng = np.random.default_rng(3)
    frames = np.zeros((6, 138), np.int16)
    frames[:, 1:] = rng.integers(0, 2, (6, 137))
    vp.decode_params_many(frames[:3])
    snap = vp.state_bytes()
    want = vp.decode_params_many(frames[3:])
    vp2 = codec.VoiceProcessor()
    vp2.set_state_bytes(snap)
    got = vp2.decode_params_many(frames[3:])
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
