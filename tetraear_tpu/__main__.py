"""``python -m tetraear_tpu`` entry point (reference: tetraear/__main__.py)."""

from tetraear_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
