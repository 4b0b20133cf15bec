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
