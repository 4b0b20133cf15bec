"""Fuzz tests: the host-side parsers consume untrusted RF bits and must
never raise, whatever arrives."""

import numpy as np
import pytest

from tetraear_tpu.frame import lip, sds
from tetraear_tpu.frame.decoder import TetraDecoder
from tetraear_tpu.frame.location import LocationParser
from tetraear_tpu.frame.mac import MacParser


def test_fuzz_decode_frame(rng):
    dec = TetraDecoder(auto_decrypt=False)
    for _ in range(200):
        bits = rng.integers(0, 2, 510)
        frame = dec.decode_frame(bits)
        assert frame is None or isinstance(frame, dict)


def test_fuzz_decode_frame_with_decrypt(rng):
    dec = TetraDecoder(auto_decrypt=True)
    for _ in range(20):
        bits = rng.integers(0, 2, 510)
        frame = dec.decode_frame(bits)
        assert frame is None or isinstance(frame, dict)


def test_fuzz_mac_parser(rng):
    parser = MacParser()
    for n in (0, 1, 5, 8, 40, 216, 400):
        for _ in range(30):
            bits = rng.integers(0, 2, n).astype(np.uint8)
            pdu = parser.parse_mac_pdu(bits)
            if pdu is not None:
                parser.parse_call_metadata(pdu)


def test_fuzz_sds(rng):
    for n in (0, 1, 2, 3, 7, 8, 16, 64, 200):
        for _ in range(30):
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            out = sds.parse_sds_data(data)
            assert out is None or isinstance(out, str)


def test_fuzz_lip_and_location(rng):
    for n in (0, 2, 5, 9, 12, 20):
        for _ in range(30):
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            lip.parse_lip(data)
            LocationParser.parse_lip_message(data)
    for _ in range(50):
        text = "".join(chr(c) for c in rng.integers(32, 300, 40))
        LocationParser.parse_coordinates(text)


def test_fuzz_decoder_symbols(rng):
    dec = TetraDecoder(auto_decrypt=False)
    for _ in range(5):
        symbols = rng.integers(0, 8, 2000)
        frames = dec.decode(symbols)
        assert isinstance(frames, list)


def test_lazy_package_exports():
    import tetraear_tpu
    assert tetraear_tpu.__version__
    assert tetraear_tpu.TetraDecoder is not None
    assert tetraear_tpu.TEADecryptor is not None
    with pytest.raises(AttributeError):
        tetraear_tpu.nope


def test_hitparse_differential_fuzz():
    """10k-window differential fuzz: the native engine equals the
    Python oracles on dense random bits, biased-density bits, and
    near-valid mutated golden slots."""
    import numpy as np
    import pytest
    from tetraear_tpu.frame import hitparse
    if not hitparse.available():
        pytest.skip("hitparse library not built")
    from tetraear_tpu.frame import burst as burst_mod
    from tetraear_tpu.frame import crc as crc_mod
    from tetraear_tpu.frame.mac import extract_mac_fields
    from tetraear_tpu.frame.decoder import TS_OFFSET_BITS, SYNC_LEN
    from tetraear_tpu.ref import golden

    rng = np.random.default_rng(123)
    blocks = []
    blocks.append(rng.integers(0, 2, (4000, 510)).astype(np.uint8))
    for dens in (0.05, 0.5, 0.95):
        blocks.append((rng.random((1500, 510)) < dens).astype(np.uint8))
    base = golden.build_slot(golden.build_mac_resource_data_bits(
        golden.sds_text_payload("FUZZ BASE")))[:510]
    mut = np.tile(base, (1500, 1))
    flips = rng.integers(0, 510, (1500, 6))
    for r in range(1500):
        for c in flips[r, :rng.integers(0, 6)]:
            mut[r, c] ^= 1
    blocks.append(mut.astype(np.uint8))
    wins = np.concatenate(blocks)
    hb = hitparse.parse_windows(wins)
    mismatch = 0
    for i, win in enumerate(wins):
        btype = burst_mod.detect_burst_type(win)
        is_sync = btype == burst_mod.BurstType.Synchronization
        data = burst_mod.extract_data_bits(win, btype)
        ok = (bool(hb.is_sync[i]) == is_sync
              and bool(hb.crc_ok[i]) == crc_mod.soft_crc_check(data)
              and hb.mac_fields(i) == extract_mac_fields(data))
        m1, m2 = burst_mod.sync_agreement(
            win[TS_OFFSET_BITS:TS_OFFSET_BITS + SYNC_LEN])
        ok = ok and bool(hb.stolen[i]) == (m2 > m1)
        mismatch += not ok
    assert mismatch == 0, f"{mismatch} mismatching windows"
