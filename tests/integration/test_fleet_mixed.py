"""Fleet smoke test: mixed traffic across a carrier bank through the
fused offline runner and the carrier-sharded frame layer.

One capture carries, on the same 2.304 MHz span (72 kHz-family fs, the
bench's quantized FFT-frontend configuration):
  * three clear SDS carriers (distinct texts),
  * one TEA1-encrypted carrier using a common key (auto-decrypt),
  * idle noise on the remaining channels.
The DecodeRunner + ShardedFrameLayer path must deliver every carrier's
traffic with correct attribution — the production fleet shape in
miniature (SURVEY.md BASELINE configs 2-3).
"""

import numpy as np
import pytest

from tetraear_tpu.crypto.tea import TEADecryptor
from tetraear_tpu.dsp.pipeline import CarrierBankDemod
from tetraear_tpu.frame.parallel import ShardedFrameLayer
from tetraear_tpu.ref import golden, modulator


@pytest.mark.integration
def test_fleet_mixed_traffic_sharded():
    fs = 2.304e6
    offsets = [(i - 3) * 25_000 + 12_500.0 for i in range(6)]
    texts = {0: "UNIT 12 RESPOND", 2: "ZONE 4 ALL CLEAR",
             4: "STATUS CHECK NOW"}
    enc_carrier = 5
    key = bytes.fromhex("0123456789ABCDEF0123")     # a common TEA1 key
    secret = b"\x82COVERT MSG 7"      # <=16 B padded (CRC field cap)
    cipher = TEADecryptor(key, "TEA1").encrypt(
        secret + b"\x00" * ((-len(secret)) % 8))

    streams = []
    for c in range(6):
        if c in texts:
            streams.append(golden.build_stream(
                [golden.sds_text_payload(texts[c])] * 4))
        elif c == enc_carrier:
            slots = [golden.build_slot(golden.build_mac_resource_data_bits(
                cipher, enc_mode=1,
                rng=np.random.default_rng(40 + i))) for i in range(4)]
            streams.append(np.concatenate(slots))
        else:
            streams.append(np.random.default_rng(50 + c).integers(
                0, 2, 2040).astype(np.uint8))       # unframed filler
    iq = modulator.generate_multi_carrier(
        streams, fs=fs, offsets_hz=offsets, snr_db=25,
        rng=np.random.default_rng(60))

    bank = CarrierBankDemod(fs=fs, freqs_hz=offsets, frontend="fft")
    if len(iq) < 2 * bank.block_len:
        pad = 0.001 * (np.random.default_rng(61).standard_normal(
            2 * bank.block_len - len(iq)).astype(np.float32))
        iq = np.concatenate([iq, pad.astype(np.complex64)])

    from tetraear_tpu.runtime.stream import DecodeRunner
    layer = ShardedFrameLayer(6, n_workers=3, auto_decrypt=True)
    try:
        runner = DecodeRunner(bank, layer, blocks_per_dispatch=2)
        out = runner.run(iq)
    finally:
        layer.close()
    frames = out["frames"]
    assert frames, "no frames decoded"

    by_carrier = {}
    for f in frames:
        by_carrier.setdefault(f["carrier"], []).append(f)

    for c, text in texts.items():
        msgs = [f.get("sds_message", "") for f in by_carrier.get(c, [])]
        assert any(text in m for m in msgs), (c, msgs)
        # attribution: this text appears ONLY on its own carrier
        for c2, fl in by_carrier.items():
            if c2 == c:
                continue
            assert not any(text in (f.get("sds_message") or "")
                           for f in fl), (c, c2)

    enc_frames = by_carrier.get(enc_carrier, [])
    assert any(f.get("decrypted") and "COVERT MSG 7"
               in (f.get("sds_message") or "") for f in enc_frames), (
        [(f.get("encrypted"), f.get("decrypted"), f.get("sds_message"))
         for f in enc_frames])
