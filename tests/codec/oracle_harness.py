"""Python driver for the ETSI reference-binary oracle (test tooling).

Loads liboracle.so (tests/codec/oracle/oracle_lib.c), maps a reference
codec executable and exposes its functions as callables taking numpy
arrays / ints — the per-function bit-exactness oracle for the ACELP
reimplementation.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

ORACLE_DIR = pathlib.Path(__file__).parent / "oracle"
LIB_PATH = ORACLE_DIR / "build" / "liboracle.so"
REF_BIN = pathlib.Path("/root/reference/tetraear/tetra_codec/bin")

_loaded: dict = {}


def available() -> bool:
    return (REF_BIN / "sdecoder.exe").exists()


def _lib():
    if not LIB_PATH.exists():
        subprocess.run(["make", "-C", str(ORACLE_DIR)], check=True,
                       capture_output=True)
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", "-o", str(LIB_PATH),
             str(ORACLE_DIR / "oracle_lib.c")], check=True)
    lib = ctypes.CDLL(str(LIB_PATH))
    lib.oracle_load.restype = ctypes.c_void_p
    lib.oracle_load.argtypes = [ctypes.c_char_p]
    lib.oracle_sym.restype = ctypes.c_uint64
    lib.oracle_sym.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.oracle_call4.restype = ctypes.c_int64
    lib.oracle_call4.argtypes = [ctypes.c_uint64] + [ctypes.c_int64] * 4
    return lib


class Oracle:
    """One mapped reference executable; call any symbol by name."""

    def __init__(self, exe: str = "sdecoder.exe"):
        key = str(REF_BIN / exe)
        if key not in _loaded:
            lib = _lib()
            pe = lib.oracle_load(key.encode())
            if not pe:
                raise RuntimeError(f"failed to map {key}")
            _loaded[key] = (lib, pe)
        self.lib, self.pe = _loaded[key]

    def sym(self, name: str) -> int:
        addr = self.lib.oracle_sym(self.pe, name.encode())
        if not addr:
            raise KeyError(name)
        return addr

    def read(self, name: str, n_words: int) -> np.ndarray:
        """Read n int16 words from a data symbol."""
        addr = self.sym(name)
        return np.ctypeslib.as_array(
            (ctypes.c_int16 * n_words).from_address(addr)).copy()

    def write(self, name: str, values: np.ndarray) -> None:
        values = np.asarray(values, np.int16)
        addr = self.sym(name)
        ctypes.memmove(addr, values.ctypes.data, values.nbytes)

    def __call__(self, name: str, *args) -> int:
        a = []
        for x in args:
            if isinstance(x, np.ndarray):
                a.append(x.ctypes.data)
            else:
                a.append(int(x) & 0xFFFFFFFFFFFFFFFF)
        a += [0] * (4 - len(a))
        r = self.lib.oracle_call4(self.sym(name), *a)
        return r


def w16(r: int) -> int:
    """Interpret a call result as Word16."""
    r &= 0xFFFF
    return r - 0x10000 if r & 0x8000 else r


def w32(r: int) -> int:
    r &= 0xFFFFFFFF
    return r - 0x100000000 if r & 0x80000000 else r
