"""Unit tests: profiling, FM demod, frame structure, fault injection."""

import numpy as np
import pytest

from tetraear_tpu.dsp import fm
from tetraear_tpu.frame.structure import FrameStructureTracker
from tetraear_tpu.runtime.profiling import StageTimers, roofline_estimate


# -- profiling -------------------------------------------------------------

def test_stage_timers():
    import time
    t = StageTimers()
    with t.stage("demod", items=1000):
        time.sleep(0.01)
    with t.stage("demod", items=1000):
        pass
    rep = t.report()
    assert rep["demod"]["calls"] == 2
    assert rep["demod"]["total_s"] >= 0.01
    assert rep["demod"]["items_per_s"] > 0


def test_roofline_estimate_shapes():
    fft = roofline_estimate(1000, 30.72e6, frontend="fft")
    conv = roofline_estimate(1000, 30.72e6, frontend="conv")
    assert fft["flops_per_s"] > 0
    # the whole point: fft frontend needs far fewer FLOPs at high C
    assert fft["front_flops_per_s"] < conv["front_flops_per_s"] / 10


# -- FM demod --------------------------------------------------------------

def test_fm_demod_recovers_tone():
    fs = 240_000.0
    f_dev = 3_000.0
    f_mod = 1_000.0
    t = np.arange(48_000) / fs
    phase = (f_dev / f_mod) * np.sin(2 * np.pi * f_mod * t)
    iq = np.exp(1j * phase).astype(np.complex64)
    audio, _ = fm.fm_demod(iq)
    # instantaneous frequency is a cosine at f_mod
    spec = np.abs(np.fft.rfft(audio[100:] * np.hanning(len(audio) - 100)))
    freqs = np.fft.rfftfreq(len(audio) - 100, 1 / fs)
    peak = freqs[np.argmax(spec[1:]) + 1]
    assert abs(peak - f_mod) < 50


def test_fm_demod_streaming():
    rng = np.random.default_rng(0)
    iq = np.exp(1j * np.cumsum(rng.normal(0, 0.3, 4000))).astype(
        np.complex64)
    full, _ = fm.fm_demod(iq)
    a, prev = fm.fm_demod(iq[:2000])
    b, _ = fm.fm_demod(iq[2000:], prev)
    assert np.allclose(np.concatenate([a, b]), full, atol=1e-6)


def test_fm_to_audio_rate():
    fs = 240_000.0
    iq = np.exp(1j * 0.1 * np.arange(240_000)).astype(np.complex64)
    audio = fm.fm_to_audio(iq, fs)
    assert abs(len(audio) - 48_000) < 100


# -- frame structure -------------------------------------------------------

def test_structure_tracker_hierarchy():
    tr = FrameStructureTracker()
    for _ in range(4 * 18 + 5):          # one multiframe + 5 slots
        slot = tr.place()
    assert slot.slot_number == 0         # 77 % 4
    assert slot.frame_number == 1        # (77 // 4) % 18
    s = tr.stats()
    assert s["slots_seen"] == 77
    assert s["multiframe"] == 1


def test_structure_tracker_occupancy(rng):
    from tetraear_tpu.frame import burst as burst_mod
    tr = FrameStructureTracker()
    for i in range(8):
        b = burst_mod.parse_burst(rng.integers(0, 4, 255))
        tr.place(b if i % 2 == 0 else None)
    s = tr.stats()
    assert sum(s["occupancy_by_slot"]) == 4


# -- fault injection -------------------------------------------------------

class FlakySource:
    """Source that fails intermittently — the fault-injection pattern the
    reference only had as test mocks (SURVEY.md section 5.3)."""

    def __init__(self, inner, fail_every: int = 3):
        self.inner = inner
        self.fail_every = fail_every
        self.calls = 0

    def __enter__(self):
        self.inner.__enter__()
        return self

    def __exit__(self, *a):
        return self.inner.__exit__(*a)

    def read_samples(self, n):
        self.calls += 1
        if self.calls % self.fail_every == 0:
            raise IOError("injected USB glitch")
        return self.inner.read_samples(n)


def test_pipeline_survives_source_faults():
    """The pipeline loop itself doesn't catch source errors (callers own
    retry policy, like the reference's capture loop breakout
    modern.py:1913-1917) — but state survives and processing resumes."""
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.runtime.sources import SyntheticTetraSource

    cfg = PipelineConfig(sample_rate=2.4e6, detect_gate=False, voice=False)
    pipe = Pipeline(cfg)
    src = SyntheticTetraSource(sample_rate=2.4e6, snr_db=25, seed=3)
    flaky = FlakySource(src, fail_every=3)
    frames = []
    pipe.on_frame = frames.append
    with flaky:
        ok = fail = 0
        for _ in range(6):
            try:
                block = flaky.read_samples(pipe.block_len)
                pipe.process_block(block)
                ok += 1
            except IOError:
                fail += 1
    assert ok >= 4 and fail == 2
    assert len(frames) >= 6          # stream continued across faults


def test_structure_tracker_place_at():
    tr = FrameStructureTracker()
    s = tr.place_at(4 * 18 + 1, crc_ok=True)     # slot 1 of frame 0, mf 1
    assert (s.slot_number, s.frame_number) == (1, 0)
    assert tr.current_multiframe == 1
    assert tr.stats()["slots_seen"] == 4 * 18 + 2
    assert tr.crc_by_slot[1] == 1


def test_pipeline_frames_carry_tdma():
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.ref import golden

    payloads = [golden.sds_text_payload("HELLO HELLO")] * 4
    iq = golden.golden_iq(payloads, fs=2.4e6, snr_db=25, seed=41)
    frames = []
    pipe = Pipeline(PipelineConfig(sample_rate=2.4e6, detect_gate=False),
                    on_frame=frames.append)
    pipe.process_block(iq[:pipe.block_len])
    assert frames
    tds = [f["tdma"] for f in frames if "tdma" in f]
    assert tds, "no TDMA coordinates attached"
    assert all(0 <= t["slot"] < 4 and 0 <= t["frame"] < 18 for t in tds)
    assert pipe.trackers[0].slot_counter > 0
