"""Recorded-capture regression: decode + tools from a checked-in file.

tests/fixtures/offair_2carrier.cs16 is a committed recorded-style
capture (int16 IQ wire format) built through a real-world impairment
chain — +1.1 kHz LO offset, 150 ppm clock drift, -6 dB multipath echo,
18 dB SNR, int16 quantization (see tests/fixtures/make_capture.py).
These tests pin the disk-file path end to end: the capture-file reader,
the offline decode workflow, the wideband scanner and the bruteforce
tool must all keep decoding this exact byte stream.
"""

import json
import pathlib

import numpy as np
import pytest

FIXTURE = pathlib.Path(__file__).parents[1] / "fixtures" / \
    "offair_2carrier.cs16"
OFFSETS = (12_500.0, -287_500.0)


@pytest.mark.integration
def test_fixture_offline_decode_and_decrypt():
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.runtime.sources import FileIQSource

    got = []
    cfg = PipelineConfig(sample_rate=2.4e6, frequency=392.5e6,
                         carrier_offsets_hz=OFFSETS, detect_gate=False,
                         voice=False, auto_decrypt=True)
    pipe = Pipeline(cfg, on_frame=got.append)
    pipe.run(FileIQSource(FIXTURE, sample_rate=2.4e6))

    crc_ok = [f for f in got if f.get("burst_crc")]
    assert len(crc_ok) >= 16          # 2 carriers x >=8 of 10 slots
    clear = [f for f in got if f["carrier"] == 0]
    assert sum(f.get("sds_message") == "[TXT] FIXTURE CAPTURE OK"
               for f in clear) >= 8
    enc = [f for f in got if f["carrier"] == 1]
    dec = [f for f in enc if f.get("decrypted")]
    assert len(dec) >= 8
    assert all("TEA1" in f["key_used"] for f in dec)
    assert sum(f.get("sds_message") == "[TXT] SECRET FIX MSG"
               for f in dec) >= 8


@pytest.mark.integration
def test_fixture_cli_decode(capsys, tmp_path):
    """The `decode` subcommand (fused runner) consumes the file format."""
    from tetraear_tpu import cli
    rc = cli.main(["decode", "--source", str(FIXTURE), "-s", "2.4",
                   "--offsets", "12500,-287500", "--show-invalid",
                   "--records-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "FIXTURE CAPTURE OK" in out
    summary = json.loads(out[out.index("{"):])
    assert summary["crc_pass"] >= 16
    assert summary["device_dispatches"] >= 1
    # JSONL written for downstream tools
    jsonls = list(tmp_path.glob("frames_*.jsonl"))
    assert jsonls and len(jsonls[0].read_text().splitlines()) >= 16


@pytest.mark.integration
def test_fixture_wideband_scan_finds_carriers():
    from tetraear_tpu.runtime.sources import FileIQSource
    from tetraear_tpu.scan.scanner import WidebandScanner

    src = FileIQSource(FIXTURE, sample_rate=2.4e6)
    with src:
        iq = src.read_samples(340_000)
    ws = WidebandScanner(fs=2.4e6)
    results = ws.scan(np.asarray(iq), center_freq_hz=392.5e6)
    hits = {round(r["offset_hz"]) for r in results if r["is_tetra"]}
    # carriers sit on the +12.5 kHz grid; AFC-less scan still locks
    # within one channel of the true offsets
    assert any(abs(h - 12_500) <= 25_000 for h in hits), hits
    assert any(abs(h + 287_500) <= 25_000 for h in hits), hits


@pytest.mark.integration
def test_fixture_bruteforce_keys_tool(tmp_path, capsys):
    """continuous-capture -> bruteforce-keys replay chain from the file
    (reference workflow: continuous_capture.py -> bruteforce_keys.py)."""
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.runtime.sources import FileIQSource
    from tetraear_tpu.tools import bruteforce_keys

    # record encrypted frames WITHOUT auto-decrypt (as a capture run)
    cfg = PipelineConfig(sample_rate=2.4e6, frequency=392.5e6,
                         carrier_offsets_hz=OFFSETS, detect_gate=False,
                         voice=False, auto_decrypt=False,
                         records_dir=str(tmp_path))
    Pipeline(cfg).run(FileIQSource(FIXTURE, sample_rate=2.4e6))
    jsonl = next(tmp_path.glob("frames_*.jsonl"))

    keyfile = tmp_path / "keys.txt"
    keyfile.write_text("TEA1:0:0123456789ABCDEF0123\n"
                       "TEA1:0:FFFFFFFFFFFFFFFFFFFF\n"
                       "TEA2:0:00112233445566778899AABBCCDDEEFF\n")
    assert bruteforce_keys.main([str(jsonl), "-k", str(keyfile)]) == 0
    out = capsys.readouterr().out
    assert "device search" in out
    assert "SECRET FIX MSG" in out
