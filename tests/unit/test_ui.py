"""Unit tests: spectrum display math + dashboard + gated Qt import."""

import numpy as np
import pytest

from tetraear_tpu.ui import spectrum as spec


def test_colormap_endpoints():
    rgb = spec.colormap_rgb(np.array([0.0, 0.5, 1.0]))
    assert rgb.shape == (3, 3)
    assert tuple(rgb[0]) == (0, 0, 64)        # deep blue
    assert tuple(rgb[1]) == (0, 255, 255)     # cyan
    assert tuple(rgb[2]) == (255, 0, 0)       # red


def test_find_peak_subbin():
    fs = 2.4e6
    n = 2048
    f0 = 123_456.0
    t = np.arange(8192) / fs
    iq = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    p = spec.power_spectrum_db(iq, n)
    pk = spec.find_peak(p, fs)
    assert abs(pk["freq_offset_hz"] - f0) < fs / n      # within one bin


def test_estimate_bandwidth():
    fs = 2.4e6
    n = 2048
    p = np.full(n, -100.0)
    # 21-bin flat-top signal
    p[1000:1021] = -30.0
    bw = spec.estimate_bandwidth(p, fs)
    assert abs(bw - 21 * fs / n) < fs / n


def test_auto_calibrate_ordering(rng):
    p = rng.normal(-80, 5, 2048)
    p[100] = -20
    cal = spec.auto_calibrate(p)
    assert cal["floor_db"] < cal["threshold_db"] < cal["ceiling_db"]


def test_denoiser_converges():
    d = spec.SpectrumDenoiser(alpha=0.5)
    x = np.full(64, -50.0)
    for _ in range(20):
        y = d(x)
    assert np.max(np.abs(y - x)) < 1e-3


def test_waterfall_buffer_scrolls():
    wb = spec.WaterfallBuffer(width=32, height=4)
    wb.floor_db, wb.ceiling_db = -100.0, 0.0
    wb.push(np.full(64, -10.0))          # resampled 64 -> 32
    first = wb.rows[0].copy()
    wb.push(np.full(64, -90.0))
    assert np.array_equal(wb.rows[1], first)
    assert not np.array_equal(wb.rows[0], first)


def test_dashboard_runs_headless(monkeypatch):
    """Drive the curses dashboard logic with a stub screen."""
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.runtime.sources import SyntheticTetraSource
    from tetraear_tpu.ui.dashboard import Dashboard

    class StubScr:
        def nodelay(self, *_):
            pass

        def getmaxyx(self):
            return (24, 80)

        def erase(self):
            pass

        def addnstr(self, *a, **k):
            pass

        def refresh(self):
            pass

        def getch(self):
            return -1

    cfg = PipelineConfig(sample_rate=2.4e6, detect_gate=False, voice=False)
    pipe = Pipeline(cfg)
    src = SyntheticTetraSource(sample_rate=2.4e6, snr_db=25, seed=2)
    dash = Dashboard(StubScr(), pipe, src, "test")
    dash.last_draw = -1e9
    dash.run(max_blocks=2)
    assert pipe.stats.frames >= 3
    assert dash.spectrum is not None
    assert len(dash._spectrum_row(40)) == 40


def test_qt_gated_import():
    from tetraear_tpu.ui import qt
    if not qt.QT_AVAILABLE:
        assert qt.main([]) == 1          # graceful message, no crash
    else:  # pragma: no cover
        assert hasattr(qt, "ModernTetraGUI")


def test_recording_max_prune(tmp_path):
    """RecordingController.max_recordings deletes the oldest finished
    files beyond the limit (the reference's 'Max Recordings' setting)."""
    import numpy as np
    from tetraear_tpu.ui.recording import RecordingController

    rc = RecordingController(tmp_path, delete_silent=False,
                             max_recordings=2)
    paths = []
    for i in range(4):
        rc.start()
        rc.feed(0.2 * np.ones(800, np.float32))
        paths.append(rc.stop())
    assert len(rc.recordings) == 2
    assert not paths[0].exists() and not paths[1].exists()
    assert paths[2].exists() and paths[3].exists()


def test_status_tracker_state_machine():
    """TetraStatusTracker keeps the reference's detection thresholds
    (modern.py:5221-5302): none -> analyzing countdown -> detected ->
    high confidence; no-signal resets the first-frame clock."""
    from tetraear_tpu.ui.status import TetraStatusTracker
    tr = TetraStatusTracker(min_detect_s=3.0)
    s = tr.evaluate({"frames": 0, "signal_present": False}, now=100.0)
    assert s["state"] == "none"
    # frames appear: countdown until min_detect_s elapses
    base = {"signal_present": True, "frames": 4, "valid_frames": 1,
            "crc_pass": 1, "encrypted": 0, "decrypted": 0}
    s = tr.evaluate(base, now=100.0)
    assert s["state"] == "analyzing" and "Analyzing" in s["text"]
    # after the wait: 4 frames with sync rate 0.25 -> detected
    s = tr.evaluate(base, now=104.0)
    assert s["state"] == "detected"
    # high confidence: >= 5 frames and sync > 0.2
    s = tr.evaluate({**base, "frames": 8, "valid_frames": 4},
                    now=104.0)
    assert s["state"] == "high"
    assert s["sync_rate"] == 0.5
    # signal loss resets the clock
    s = tr.evaluate({"frames": 8, "signal_present": False}, now=105.0)
    assert s["state"] == "none"
    s = tr.evaluate(base, now=106.0)
    assert s["state"] == "analyzing"


def test_keyload_parses_reference_format(tmp_path):
    """GUI key-file parser accepts the reference's format
    (modern.py:3993-4006): comments, separators, 16-32 hex chars."""
    from tetraear_tpu.utils.keyload import load_key_file, parse_key_text
    assert parse_key_text("# c\n//c\n\nAB:CD 12-34 5678 9abc DEF0 11\n"
                          "deadbeef\n"            # 8 chars: too short
                          "0123456789abcdef\n") == [
        "abcd123456789abcdef011", "0123456789abcdef"]
    p = tmp_path / "k.txt"
    p.write_text("0123456789abcdef0123\n")
    assert load_key_file(p) == ["0123456789abcdef0123"]
