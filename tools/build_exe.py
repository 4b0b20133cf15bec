"""Build a single-file executable of the tetraear-tpu application.

Parity target: the reference ships a PyInstaller onefile build
(/root/reference/tetraear/tools/build_exe.py:34-60).  PyInstaller is
not available offline, so the primary path is a stdlib ``zipapp``
onefile: one executable archive containing the whole package PLUS the
compiled native engines (voice codec + hitparse .so), with a bootstrap
that extracts the natives to a per-version cache dir at first run and
points the ctypes loaders at them (TETRAEAR_CODEC_LIB /
TETRAEAR_HITPARSE_LIB).  Python-level dependencies (jax, numpy) come
from the target interpreter, like any console-script install; when
PyInstaller IS importable, ``--pyinstaller`` produces the fully
self-contained variant instead.

    python tools/build_exe.py              # -> dist/tetraear (executable)
    dist/tetraear decode --source capture.cs16 -s 2.4 --offsets 12500

"""

from __future__ import annotations

import argparse
import py_compile
import shutil
import subprocess
import sys
import zipapp
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

BOOTSTRAP = '''\
"""Single-file bootstrap: extract bundled native libs, run the CLI."""
import hashlib
import os
import sys
import zipfile
from pathlib import Path

def _extract_natives(archive: str) -> None:
    try:
        zf = zipfile.ZipFile(archive)
    except (OSError, zipfile.BadZipFile):
        return
    names = [n for n in zf.namelist()
             if n.startswith("_natives/") and not n.endswith("/")]
    if not names:
        return
    tag = hashlib.sha256(
        "".join(sorted(f"{n}:{zf.getinfo(n).CRC}" for n in names))
        .encode()).hexdigest()[:16]
    dest = Path(os.environ.get("XDG_CACHE_HOME",
                               Path.home() / ".cache")) \\
        / "tetraear-tpu" / tag
    for n in names:
        out = dest / Path(n).name
        if not out.exists():
            dest.mkdir(parents=True, exist_ok=True)
            tmp = out.with_suffix(".tmp%d" % os.getpid())
            tmp.write_bytes(zf.read(n))
            tmp.replace(out)             # atomic: concurrent runs safe
    env = {"libtetracodec.so": "TETRAEAR_CODEC_LIB",
           "libhitparse.so": "TETRAEAR_HITPARSE_LIB"}
    for fname, var in env.items():
        p = dest / fname
        if p.exists():
            os.environ.setdefault(var, str(p))

_extract_natives(os.path.dirname(os.path.abspath(__file__)))

from tetraear_tpu.cli import main            # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
'''


def build_zipapp(out: Path) -> None:
    build = ROOT / "build" / "onefile"
    if build.exists():
        shutil.rmtree(build)
    build.mkdir(parents=True)

    # native engines: build when a compiler is present, bundle what
    # exists (the bootstrap degrades to the pure-Python fallbacks for
    # any lib that is absent, same as a source checkout)
    if shutil.which("g++") or shutil.which("c++"):
        for sub in ("tetraear_tpu/voice/csrc", "tetraear_tpu/frame/csrc"):
            subprocess.run(["make", "-C", str(ROOT / sub)], check=True,
                           capture_output=True, timeout=300)

    shutil.copytree(
        ROOT / "tetraear_tpu", build / "tetraear_tpu",
        ignore=shutil.ignore_patterns(
            "__pycache__", "*.o", "*.obj", "build", "csrc", "*.exe"))
    natives = build / "_natives"
    natives.mkdir()
    for so in ("tetraear_tpu/voice/csrc/build/libtetracodec.so",
               "tetraear_tpu/frame/csrc/build/libhitparse.so"):
        p = ROOT / so
        if p.exists():
            shutil.copy2(p, natives / p.name)
    (build / "__main__.py").write_text(BOOTSTRAP)
    py_compile.compile(str(build / "__main__.py"), doraise=True)

    out.parent.mkdir(parents=True, exist_ok=True)
    zipapp.create_archive(build, out, interpreter="/usr/bin/env python3",
                          compressed=True)
    out.chmod(0o755)
    n_natives = len(list(natives.iterdir()))
    print(f"built {out} ({out.stat().st_size / 1e6:.1f} MB, "
          f"{n_natives} native libs bundled)")


def build_pyinstaller(out: Path) -> None:
    binaries = []
    for so in ("tetraear_tpu/voice/csrc/build/libtetracodec.so",
               "tetraear_tpu/frame/csrc/build/libhitparse.so"):
        if (ROOT / so).exists():
            binaries += ["--add-binary", f"{ROOT / so}:."]
    subprocess.run(
        [sys.executable, "-m", "PyInstaller", "--onefile", "--clean",
         "--name", out.name, "--distpath", str(out.parent), *binaries,
         str(ROOT / "tetraear_tpu" / "__main__.py")],
        check=True)


def main() -> int:
    ap = argparse.ArgumentParser(prog="tools/build_exe.py")
    ap.add_argument("--out", default=str(ROOT / "dist" / "tetraear"))
    ap.add_argument("--pyinstaller", action="store_true",
                    help="use PyInstaller instead of zipapp (needs it "
                         "installed)")
    args = ap.parse_args()
    out = Path(args.out)
    if args.pyinstaller:
        build_pyinstaller(out)
    else:
        build_zipapp(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
