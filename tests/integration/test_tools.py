"""The headless workload tools end-to-end (reference root scripts:
continuous_capture.py, decrypt_capture.py, rtl_auto_capture.py,
tools/create_release_package.py).  Each test drives the tool's main()
exactly as the CLI dispatcher does."""

import json
import tarfile

import numpy as np
import pytest


def test_continuous_capture_writes_jsonl(tmp_path):
    from tetraear_tpu.tools import continuous_capture

    rc = continuous_capture.main(["--source", "synthetic",
                                  "--max-blocks", "2",
                                  "-o", str(tmp_path)])
    assert rc == 0
    logs = list(tmp_path.glob("continuous_*.jsonl"))
    assert len(logs) == 1
    frames = [json.loads(l) for l in logs[0].read_text().splitlines()]
    assert len(frames) >= 4
    assert all("type_name" in f for f in frames)
    assert any(f.get("sds_message") for f in frames)


def test_decrypt_capture_reports_hits(tmp_path, capsys):
    from tetraear_tpu.crypto.tea import TEADecryptor
    from tetraear_tpu.ref import golden, modulator
    from tetraear_tpu.runtime.sources import write_capture
    from tetraear_tpu.tools import decrypt_capture

    rng = np.random.default_rng(7)
    key = bytes.fromhex("0123456789ABCDEF0123")   # in the common-key list
    clear = b"\x82RELOCATE NOW"
    clear += b"\x00" * ((-len(clear)) % 8)
    cipher = TEADecryptor(key, "TEA1").encrypt(clear)
    slots = []
    for _ in range(6):
        data = golden.build_mac_resource_data_bits(cipher, rng=rng,
                                                   enc_mode=1)
        slots.append(golden.build_slot(data, rng=rng))
    pad = rng.integers(0, 2, 64).astype(np.uint8)
    iq = modulator.generate_carrier(
        np.concatenate([pad] + slots), fs=2.4e6)
    iq = modulator.add_awgn(iq, 25, rng)
    path = tmp_path / "enc.cfile"
    write_capture(path, iq)

    rc = decrypt_capture.main(["--source", str(path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "DECRYPTED" in out
    assert "RELOCATE NOW" in out


def test_auto_capture_finds_text(tmp_path):
    from tetraear_tpu.tools import auto_capture

    rc = auto_capture.main(["--source", "synthetic",
                            "--max-blocks", "5",
                            "-o", str(tmp_path)])
    assert rc == 0
    hit = json.loads((tmp_path / "hit_frame.json").read_text())
    assert "HELLO" in (hit.get("sds_message") or "")


def test_auto_capture_gives_up_on_noise(tmp_path):
    from tetraear_tpu.runtime.sources import write_capture
    from tetraear_tpu.tools import auto_capture

    rng = np.random.default_rng(3)
    noise = (rng.standard_normal(300_000)
             + 1j * rng.standard_normal(300_000)).astype(np.complex64)
    path = tmp_path / "noise.cfile"
    write_capture(path, noise)
    rc = auto_capture.main(["--source", str(path),
                            "--max-blocks", "3",
                            "-o", str(tmp_path)])
    assert rc == 1
    assert not (tmp_path / "hit_frame.json").exists()


def test_build_release_archive(tmp_path):
    from tetraear_tpu.tools import build_release

    archive = build_release.build(tmp_path, with_codec=False)
    assert archive.exists()
    with tarfile.open(archive) as tf:
        names = tf.getnames()
    root = archive.name.replace(".tar.gz", "")
    assert f"{root}/pyproject.toml" in names
    assert f"{root}/tetraear_tpu/api.py" in names
    assert f"{root}/bench.py" in names
    assert not any(n.endswith(".pyc") for n in names)


def test_verify_codec_tool():
    from tetraear_tpu.tools import verify_codec
    from tetraear_tpu.voice import codec

    if not codec.VoiceProcessor().working:
        pytest.skip("codec library not built")
    assert verify_codec.main([]) == 0


def test_cli_wideband_scan(capsys):
    """The `scan --wideband` subcommand end-to-end on a synthetic band."""
    from tetraear_tpu import cli

    rc = cli.main(["scan", "--wideband", "--source", "synthetic:12500",
                   "--dwell", "0.15"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "active TETRA channel(s)" in out
    # the planted 12.5 kHz carrier is found (grid channel 392.5125 MHz)
    assert "392.5125" in out and " *" in out
