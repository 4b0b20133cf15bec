"""Qt GUI wiring tests against the functional PyQt6 stub.

Round-1 gap: the Qt widget code paths had zero coverage, not even
import-level.  With the stub (qt_stub.py) the real ui/qt.py module
imports, the main window builds, and its signal wiring executes:
frames flow into the (filtered) frames table, the SDS store feeds the
SDS tab, the REC button drives the recording controller, and the
gain/rate controls persist settings.
"""

import importlib
import sys

import numpy as np
import pytest


@pytest.fixture()
def qt(tmp_path, monkeypatch):
    from tests.unit import qt_stub
    qt_stub.install()
    # settings isolated per test
    monkeypatch.setenv("TETRAEAR_TPU_DATA_DIR", str(tmp_path))
    for mod in ("tetraear_tpu.ui.qt",):
        sys.modules.pop(mod, None)
    qt = importlib.import_module("tetraear_tpu.ui.qt")
    assert qt.QT_AVAILABLE
    return qt


def _frame(n=1, text=None, crc=True, enc=False, dec=False, tg=None,
           type_name="MAC-RESOURCE"):
    f = {"number": n, "type_name": type_name, "carrier": 0,
         "burst_crc": crc, "encrypted": enc, "decrypted": dec}
    if text:
        f["sds_message"] = text
    if tg:
        f["call_metadata"] = {"talkgroup_id": tg, "source_ssi": 7000 + n}
    return f


def test_main_window_builds_and_frames_flow(qt, tmp_path):
    win = qt.ModernTetraGUI()
    assert win.frames_table.rowCount() == 0
    win.on_frame(_frame(1, text="[TXT] HELLO", tg=100))
    win.on_frame(_frame(2, crc=False))
    assert win.frames_table.rowCount() == 2
    assert win.frames_table.item(0, 8).text() == "[TXT] HELLO"
    # aggregates populated via call metadata
    assert win.groups_table.rowCount() == 1
    assert win.users_table.rowCount() == 1


def test_frames_filtering_reapplies_history(qt):
    win = qt.ModernTetraGUI()
    win.on_frame(_frame(1, text="[TXT] KEEP", tg=5))
    win.on_frame(_frame(2, crc=False, type_name="MAC-FRAG"))
    win.on_frame(_frame(3, enc=True))
    assert win.frames_table.rowCount() == 3
    # CRC-pass only drops the failed frame
    win.read_filter.setCurrentText("CRC-pass only")
    assert win.frames_table.rowCount() == 2
    # type filter narrows further
    win.type_filter.setCurrentText("MAC-FRAG")
    assert win.frames_table.rowCount() == 0
    win.type_filter.setCurrentText("All types")
    win.read_filter.setCurrentText("All frames")
    assert win.frames_table.rowCount() == 3
    # encryption filter
    win.enc_filter.setCurrentText("Encrypted only")
    assert win.frames_table.rowCount() == 1


def test_sds_tab_fed_by_store(qt):
    win = qt.ModernTetraGUI()
    win.on_frame(_frame(1, text="[TXT] MESSAGE ONE", tg=9))
    win.on_frame(_frame(1, text="[TXT] MESSAGE ONE", tg=9))  # repeat
    win.on_frame(_frame(2, text="[BIN] deadbeef"))           # not SDS text
    rows = win.sds_table.rowCount()
    assert rows == 1
    assert win.sds_table.item(0, 4).text() == "[TXT] MESSAGE ONE"
    assert "x2" in win.sds_table.item(0, 3).text()


def test_rec_button_and_audio_path(qt, tmp_path):
    win = qt.ModernTetraGUI()
    win.recorder.records_dir = tmp_path
    win.rec_btn.click()                     # toggles on -> start()
    assert win.recorder.recording
    t = np.arange(1600) / 8000.0
    win.recorder.feed(0.4 * np.sin(2 * np.pi * 440 * t))
    win.rec_btn.click()                     # toggles off -> stop()
    assert not win.recorder.recording
    wavs = list(tmp_path.glob("rec_*.wav"))
    assert len(wavs) == 1
    # silent recording is deleted
    win.rec_btn.click()
    win.recorder.feed(np.zeros(800, np.float32))
    win.rec_btn.click()
    assert len(list(tmp_path.glob("rec_*.wav"))) == 1


def test_gain_and_rate_controls_persist(qt):
    win = qt.ModernTetraGUI()
    win.gain_auto.setChecked(False)
    win.gain_slider.setValue(28)
    assert win.settings.get("gain") == 28.0
    assert win.gain_label.text() == "28.0"
    win.gain_auto.setChecked(True)
    assert win.settings.get("gain") == "auto"
    # sample-rate combo persists the chosen legal rate
    win.rate_box.setCurrentIndex(1)
    assert win.settings.get("sample_rate") == win.rate_box.currentData()


def test_capture_thread_signal_wiring(qt):
    """CaptureThread exposes the four queued signals and they deliver."""
    th = qt.CaptureThread.__new__(qt.CaptureThread)
    got = []
    th.frame_decoded.connect(got.append)
    th.frame_decoded.emit({"number": 1})
    th.status_update.connect(got.append)
    th.status_update.emit("ok")
    assert got == [{"number": 1}, "ok"]


def test_spectrum_sliders_and_auto_toggle(qt):
    win = qt.ModernTetraGUI()
    w = win.waterfall
    assert w.auto_cal and w.zoom == 1.0
    # manual mode: sliders drive the waterfall range
    win.auto_sliders.setChecked(False)
    win.top_slider.setValue(-30)
    win.bottom_slider.setValue(-95)
    win.zoom_slider.setValue(40)            # zoom x4
    assert not w.auto_cal
    assert w.manual_ceiling_db == -30.0
    assert w.manual_floor_db == -95.0
    assert w.zoom == 4.0
    # a spectrum push respects the manual range and the zoom crop
    p = np.linspace(-100.0, -20.0, 512)
    w.push(p)
    assert w.buf.ceiling_db == -30.0 and w.buf.floor_db == -95.0
    # back to auto: sliders follow auto_calibrate's result
    win.auto_sliders.setChecked(True)
    w.push(p)
    win._spectrum_changed()
    assert win.top_slider.value() == int(w.last_cal["ceiling_db"])
    assert win.bottom_slider.value() == int(w.last_cal["floor_db"])
    # threshold slider persists to settings
    win.threshold_slider.setValue(-60)
    assert win.settings.get("peak_threshold_db") == -60.0


class _Ev:
    """Stub mouse event at pixel x with optional Ctrl held."""

    def __init__(self, x=800.0, ctrl=False):
        self._x = x
        self._ctrl = ctrl

    def position(self):
        ev = self

        class P:
            def x(self):
                return ev._x
        return P()

    def modifiers(self):
        from PyQt6.QtCore import Qt
        return (Qt.KeyboardModifier.ControlModifier if self._ctrl
                else Qt.KeyboardModifier.NoModifier)


def test_zoom_click_to_tune_scales(qt):
    w = qt.WaterfallWidget(fs=2.4e6)
    got = []
    w.clicked_freq.connect(got.append)
    w.zoom = 4.0
    w.mousePressEvent(_Ev(800.0))   # right edge of the 800px default
    assert got and abs(got[0] - (0.5 * 2.4e6 / 4.0)) < 1e-6


def test_ctrl_click_precision_tune(qt):
    """Ctrl-click snaps to the interpolated peak near the click and
    reports its -6 dB bandwidth (modern.py:698-857)."""
    w = qt.WaterfallWidget(fs=2.4e6)
    tuned, peaks = [], []
    w.clicked_freq.connect(tuned.append)
    w.peak_info.connect(peaks.append)
    n = 512
    p = np.full(n, -90.0)
    k_pk = 384                       # peak at +0.25 * fs
    p[k_pk - 2:k_pk + 3] = [-70.0, -55.0, -50.0, -55.0, -70.0]
    w.last_power = p
    # click slightly OFF the peak: precision tune must still snap to it
    w.mousePressEvent(_Ev(x=800.0 * (k_pk + 3) / n, ctrl=True))
    assert len(tuned) == 1 and len(peaks) == 1
    want = (k_pk - n / 2) / n * 2.4e6
    assert abs(tuned[0] - want) < 2.4e6 / n        # within one bin
    assert abs(peaks[0]["freq_offset_hz"] - want) < 2.4e6 / n
    assert peaks[0]["power_db"] >= -51.0
    bin_hz = 2.4e6 / n
    assert 0 < peaks[0]["bandwidth_hz"] < 8 * bin_hz
    # plain click unchanged by the feature
    w.mousePressEvent(_Ev(x=400.0))
    assert abs(tuned[1]) < 1e-6


def test_load_keys_applies_live_and_persists(qt, tmp_path):
    """Load-Keys button (modern.py:2918, 3987-4021): parses the hex key
    file, stores keys for future captures, and pushes them into the
    live pipeline via Pipeline.set_keys."""
    win = qt.ModernTetraGUI()
    kf = tmp_path / "keys.txt"
    kf.write_text("# comment\n"
                  "0123456789abcdef0123\n"          # 20 hex -> TEA1
                  "// slash comment\n"
                  "00 11 22 33 44 55 66 77 88 99 aa bb cc dd ee ff\n"
                  "not-a-key\n")
    calls = []

    class _Pipe:
        def set_keys(self, keys):
            calls.append(list(keys))

    class _Thr:
        pipeline = _Pipe()
    win.thread = _Thr()
    win.on_load_keys(path=str(kf))
    assert win.encryption_keys == [
        "0123456789abcdef0123",
        "00112233445566778899aabbccddeeff"]
    assert calls == [win.encryption_keys]
    assert "2" in win.status.text()
    # file-dialog cancel is a no-op
    win.on_load_keys(path="")
    assert win.encryption_keys and len(calls) == 1
    # empty file: keys unchanged, status explains
    (tmp_path / "empty.txt").write_text("# nothing\n")
    win.on_load_keys(path=str(tmp_path / "empty.txt"))
    assert win.encryption_keys  # retained
    assert "no valid keys" in win.status.text()


def test_pipeline_set_keys_reaches_decoders(qt, tmp_path):
    """Pipeline.set_keys pushes runtime keys into every per-carrier
    decoder (host path) — the GUI Load-Keys contract end to end."""
    from tetraear_tpu.api import Pipeline, PipelineConfig
    pipe = Pipeline(PipelineConfig(
        sample_rate=2.4e6, carrier_offsets_hz=(0.0,), voice=False,
        detect_gate=False))
    assert pipe.decoders
    pipe.set_keys(["0123456789abcdef0123"])
    for d in pipe.decoders:
        assert ("TEA1", bytes.fromhex("0123456789abcdef0123")) \
            in d.user_keys


def test_rawfm_checkbox_records_wav(qt, tmp_path):
    """Raw-FM checkbox (modern.py:2040-2061): pipeline FM audio flows
    through the resampling recorder into a 48 kHz WAV."""
    from tetraear_tpu.ui.recording import RawFMRecorder
    win = qt.ModernTetraGUI()
    win.rawfm_recorder = RawFMRecorder(tmp_path, fs=2.4e6)
    win.rawfm_chk.setChecked(True)          # -> on_rawfm_toggled(True)
    assert win.rawfm_recorder.recording
    t = np.arange(48_000) / 2.4e6
    win.rawfm_recorder.feed(
        (0.3 * np.sin(2 * np.pi * 700 * t)).astype(np.float32))
    win.rawfm_chk.setChecked(False)
    assert not win.rawfm_recorder.recording
    wavs = list(tmp_path.glob("rawfm_*.wav"))
    assert len(wavs) == 1
    import wave
    with wave.open(str(wavs[0])) as wf:
        assert wf.getframerate() == 48_000
        n = wf.getnframes()
        # 48000 input samples at 2.4 MHz -> 0.02 s -> ~960 out samples
        assert 800 <= n <= 960


def test_status_strip_updates_from_stats(qt):
    """stats_update -> the always-visible sync/CRC/decrypt strip
    (modern.py:5221-5302)."""
    win = qt.ModernTetraGUI()
    win.status_tracker.min_detect_s = 0.0
    win.on_stats({"frames": 0, "signal_present": False})
    assert "No TETRA Signal" in win.tetra_status.text()
    win.on_stats({"frames": 20, "valid_frames": 10, "crc_pass": 8,
                  "encrypted": 4, "decrypted": 2,
                  "signal_present": True})
    assert "TETRA Signal Detected" in win.tetra_status.text()
    assert "Sync 50%" in win.rate_label.text()
    assert "CRC 40%" in win.rate_label.text()
    assert "Decrypt 50%" in win.rate_label.text()


def test_settings_dialog_roundtrip(qt, tmp_path):
    win = qt.ModernTetraGUI()
    win.on_settings()
    dlg = win._settings_dialog
    dlg.records_edit.setText(str(tmp_path / "recs"))
    dlg.mp3_chk.setChecked(True)
    dlg.silence_chk.setChecked(True)
    dlg.maxrec_edit.setText("5")
    dlg.save_btn.click()
    assert win.settings.get("records_dir") == str(tmp_path / "recs")
    assert win.settings.get("export_mp3") is True
    assert win.settings.get("save_silence") is True
    assert win.settings.get("max_recordings") == 5
    assert win.recorder.export_mp3 is True
    assert win.recorder.delete_silent is False
    assert win.recorder.max_recordings == 5


def test_pre_gui_scan_synthetic(qt):
    """The pre-GUI scan path on a synthetic source: the scan machinery
    runs end to end headlessly (hit-or-not depends on dwell alignment;
    the contract is a float frequency or None)."""
    best = qt.pre_gui_scan(392.49, 392.51, source="synthetic:0",
                           sample_rate=2.4e6)
    assert best is None or isinstance(best, float)
