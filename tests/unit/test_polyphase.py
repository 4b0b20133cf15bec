"""Unit tests: NumPy polyphase resampler vs scipy ground truth + streaming."""

import numpy as np
from scipy import signal as ss

from tetraear_tpu.dsp import design
from tetraear_tpu.ref import polyphase


def _stage():
    return design.build_resample_plan(2.4e6).stages[-1]


def test_stage_matches_upfirdn(rng):
    x = (rng.standard_normal(2000)
         + 1j * rng.standard_normal(2000)).astype(np.complex64)
    st = _stage()
    n = len(x) - len(x) % st.down
    hist = np.zeros(polyphase.stage_history_len(st), np.complex64)
    y, _ = polyphase.stage_apply(st, x[:n], hist)
    ref = ss.upfirdn(st.taps_array, x[:n], up=st.up, down=st.down)[:len(y)]
    assert np.max(np.abs(y - ref)) < 1e-5


def test_stage_streaming_equals_offline(rng):
    x = (rng.standard_normal(3000)
         + 1j * rng.standard_normal(3000)).astype(np.complex64)
    st = _stage()
    h0 = np.zeros(polyphase.stage_history_len(st), np.complex64)
    n = 3000 - 3000 % (2 * st.down)
    x = x[:n]
    y_off, _ = polyphase.stage_apply(st, x, h0.copy())
    half = n // 2
    half -= half % st.down
    y1, h1 = polyphase.stage_apply(st, x[:half], h0.copy())
    y2, _ = polyphase.stage_apply(st, x[half:], h1)
    assert np.array_equal(np.concatenate([y1, y2]), y_off)


def test_plan_apply_streaming(rng):
    plan = design.build_resample_plan(2.4e6)
    gran = 400
    x = (rng.standard_normal(8 * gran)
         + 1j * rng.standard_normal(8 * gran)).astype(np.complex64)
    y_off, _ = polyphase.plan_apply(plan, x, polyphase.PlanState.init(plan))
    st = polyphase.PlanState.init(plan)
    parts = []
    for i in range(0, len(x), 2 * gran):
        y, st = polyphase.plan_apply(plan, x[i:i + 2 * gran], st)
        parts.append(y)
    assert np.array_equal(np.concatenate(parts), y_off)


def test_fir_stream_matches_lfilter(rng):
    taps = design.rrc_taps(sps=4).astype(np.float32)
    x = (rng.standard_normal(500)
         + 1j * rng.standard_normal(500)).astype(np.complex64)
    y, _ = polyphase.fir_stream(taps, x, np.zeros(len(taps) - 1, np.complex64))
    ref = ss.lfilter(taps, [1.0], x)
    assert np.max(np.abs(y - ref)) < 1e-5
