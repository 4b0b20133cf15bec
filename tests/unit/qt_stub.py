"""Minimal functional PyQt6 stub for headless GUI testing.

The test environment has no Qt; following the reference's hermetic-fake
philosophy (mocked SDR, mocked codec subprocess — reference
tests/conftest.py), this stub implements just enough real behavior —
working signals, checkable buttons, combo boxes with items/data, table
row/item storage — that tetraear_tpu.ui.qt imports and its signal wiring
and table logic execute for real.  Painting, layout and event loops are
no-ops.
"""

from __future__ import annotations

import sys
import types


class _Signal:
    """pyqtSignal: class-level descriptor -> per-instance bound signal."""

    def __init__(self, *types_):
        self._name = None

    def __set_name__(self, owner, name):
        self._name = name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        key = "_sig_" + (self._name or str(id(self)))
        if not hasattr(obj, key):
            setattr(obj, key, _BoundSignal())
        return getattr(obj, key)


class _BoundSignal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def emit(self, *args):
        for fn in list(self._slots):
            fn(*args)


def pyqtSignal(*a, **k):
    return _Signal(*a)


def pyqtSlot(*a, **k):
    def deco(fn):
        return fn
    return deco


_NOOP_PREFIXES = ("set", "scroll", "show", "hide", "resize", "adjust",
                  "update", "clear", "raise", "activate", "move", "close")


class QObject:
    def __init__(self, *a, **k):
        pass

    def __getattr__(self, name):
        # no-op only Qt-method-shaped names so getattr(obj, x, None)
        # probes (e.g. 'aggregator') behave like real objects
        if any(name.startswith(p) for p in _NOOP_PREFIXES):
            return lambda *a, **k: None
        raise AttributeError(name)


class QWidget(QObject):
    def __init__(self, *a, **k):
        super().__init__()
        self._visible = False

    def width(self):
        return 800

    def height(self):
        return 200


class QMainWindow(QWidget):
    pass


class QLabel(QWidget):
    def __init__(self, text: str = "", *a, **k):
        super().__init__()
        self._text = text

    def setText(self, t):
        self._text = str(t)

    def text(self):
        return self._text


class QPushButton(QWidget):
    clicked = pyqtSignal()
    toggled = pyqtSignal(bool)

    def __init__(self, text="", *a, **k):
        super().__init__()
        self._text = text
        self._checkable = False
        self._checked = False

    def setCheckable(self, v):
        self._checkable = bool(v)

    def setChecked(self, v):
        changed = self._checked != bool(v)
        self._checked = bool(v)
        if changed:
            self.toggled.emit(self._checked)

    def isChecked(self):
        return self._checked

    def click(self):
        if self._checkable:
            self.setChecked(not self._checked)
        self.clicked.emit()


class QCheckBox(QPushButton):
    def __init__(self, text="", *a, **k):
        super().__init__(text)
        self._checkable = True


class QComboBox(QWidget):
    currentIndexChanged = pyqtSignal(int)

    def __init__(self, *a, **k):
        super().__init__()
        self._items = []          # (text, data)
        self._idx = 0

    def addItem(self, text, data=None):
        self._items.append((text, data))

    def addItems(self, texts):
        for t in texts:
            self.addItem(t)

    def count(self):
        return len(self._items)

    def itemData(self, i):
        return self._items[i][1]

    def setCurrentIndex(self, i):
        if 0 <= i < len(self._items) and i != self._idx:
            self._idx = i
            self.currentIndexChanged.emit(i)

    def setCurrentText(self, text):
        for i, (t, _) in enumerate(self._items):
            if t == text:
                self.setCurrentIndex(i)
                return

    def currentIndex(self):
        return self._idx

    def itemText(self, i):
        return self._items[i][0]

    def currentText(self):
        return self._items[self._idx][0] if self._items else ""

    def currentData(self):
        return self._items[self._idx][1] if self._items else None


class QDoubleSpinBox(QWidget):
    valueChanged = pyqtSignal(float)

    def __init__(self, *a, **k):
        super().__init__()
        self._value = 0.0

    def setValue(self, v):
        self._value = float(v)
        self.valueChanged.emit(self._value)

    def value(self):
        return self._value


class QSlider(QWidget):
    valueChanged = pyqtSignal(int)

    def __init__(self, *a, **k):
        super().__init__()
        self._value = 0

    def setValue(self, v):
        v = int(v)
        if v != self._value:                   # Qt emits only on change
            self._value = v
            self.valueChanged.emit(self._value)

    def value(self):
        return self._value


class QLineEdit(QWidget):
    textChanged = pyqtSignal(str)

    def __init__(self, text="", *a, **k):
        super().__init__()
        self._text = str(text)

    def setText(self, t):
        self._text = str(t)
        self.textChanged.emit(self._text)

    def text(self):
        return self._text


class QTableWidgetItem:
    def __init__(self, text=""):
        self._text = str(text)

    def text(self):
        return self._text


class QTableWidget(QWidget):
    cellDoubleClicked = pyqtSignal(int, int)

    def __init__(self, rows=0, cols=0, *a, **k):
        super().__init__()
        self._cols = cols
        self._rows = []

    def setHorizontalHeaderLabels(self, labels):
        self._labels = list(labels)

    def rowCount(self):
        return len(self._rows)

    def insertRow(self, r):
        self._rows.insert(r, [None] * self._cols)

    def setRowCount(self, n):
        while len(self._rows) > n:
            self._rows.pop()
        while len(self._rows) < n:
            self._rows.append([None] * self._cols)

    def setItem(self, r, c, item):
        while len(self._rows) <= r:
            self._rows.append([None] * self._cols)
        row = self._rows[r]
        while len(row) <= c:
            row.append(None)
        row[c] = item

    def item(self, r, c):
        try:
            return self._rows[r][c]
        except IndexError:
            return None


class QTabWidget(QWidget):
    def __init__(self, *a, **k):
        super().__init__()
        self._tabs = []

    def addTab(self, w, name):
        self._tabs.append((name, w))


class _Layout(QObject):
    def __init__(self, parent=None):
        super().__init__()

    def addWidget(self, *a, **k):
        pass

    def addLayout(self, *a, **k):
        pass

    def addStretch(self, *a, **k):
        pass


class QVBoxLayout(_Layout):
    pass


class QHBoxLayout(_Layout):
    pass


class QThread(QObject):
    finished = pyqtSignal()

    def start(self):
        pass

    def isRunning(self):
        return False


class QTimer(QObject):
    timeout = pyqtSignal()


class QApplication(QObject):
    def __init__(self, *a, **k):
        super().__init__()

    def exec(self):
        return 0


class _QtNamespace:
    class Orientation:
        Horizontal = 1
        Vertical = 2

    class KeyboardModifier:
        NoModifier = 0
        ControlModifier = 0x04000000


class QFileDialog(QObject):
    # tests monkeypatch this to simulate a user file pick
    @staticmethod
    def getOpenFileName(parent=None, caption="", directory="",
                        filter=""):
        return "", ""


class QImage(QObject):
    class Format:
        Format_RGB888 = 13

    def __init__(self, *a, **k):
        super().__init__()


class QPixmap(QObject):
    @staticmethod
    def fromImage(img):
        return QPixmap()


def install() -> None:
    """Install the stub as PyQt6 in sys.modules (idempotent)."""
    if "PyQt6" in sys.modules and getattr(
            sys.modules["PyQt6"], "_tetraear_stub", False):
        return
    pkg = types.ModuleType("PyQt6")
    pkg._tetraear_stub = True
    core = types.ModuleType("PyQt6.QtCore")
    core.Qt = _QtNamespace
    core.QThread = QThread
    core.QTimer = QTimer
    core.QObject = QObject
    core.pyqtSignal = pyqtSignal
    core.pyqtSlot = pyqtSlot
    gui = types.ModuleType("PyQt6.QtGui")
    gui.QImage = QImage
    gui.QPixmap = QPixmap
    widgets = types.ModuleType("PyQt6.QtWidgets")
    for name, obj in globals().items():
        if name.startswith("Q"):
            setattr(widgets, name, obj)
    pkg.QtCore = core
    pkg.QtGui = gui
    pkg.QtWidgets = widgets
    sys.modules["PyQt6"] = pkg
    sys.modules["PyQt6.QtCore"] = core
    sys.modules["PyQt6.QtGui"] = gui
    sys.modules["PyQt6.QtWidgets"] = widgets
