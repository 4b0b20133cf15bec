"""Grand scenario: one wideband capture, every subsystem at once.

Six TETRA carriers in a 10.24 Msps capture (the aligned channel grid):

  c0  SYSINFO broadcasts + clear SDS-TL text
  c1  TEA1-encrypted SDS (key in the common-key list -> auto-decrypt)
  c2  LIP location reports
  c3  GSM7-packed SDS
  c4  ACELP voice traffic (when the codec library is built)
  c5  clear SDS at the band edge

One Pipeline instance demodulates and decodes all of it concurrently —
the capability headline of the framework.
"""

import numpy as np
import pytest

from tetraear_tpu.api import Pipeline, PipelineConfig
from tetraear_tpu.crypto.tea import TEADecryptor
from tetraear_tpu.frame import lip as lip_mod
from tetraear_tpu.frame import sds as sds_mod
from tetraear_tpu.ref import golden, modulator
from tetraear_tpu.voice import codec as vcodec


def _speech(n_slots, pitch=57, seed=0):
    rng = np.random.default_rng(seed)
    n = n_slots * 480
    exc = np.zeros(n)
    exc[::pitch] = 1.0
    exc += 0.05 * rng.standard_normal(n)
    y = np.zeros(n)
    for i in range(n):
        y[i] = exc[i]
        if i > 0:
            y[i] += 1.2 * y[i - 1]
        if i > 1:
            y[i] += -0.8 * y[i - 2]
        if i > 2:
            y[i] += 0.3 * y[i - 3]
    return (y / np.max(np.abs(y)) * 8000).astype(np.int16)


def _carrier_bits(kind: str, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "sysinfo+text":
        return golden.build_stream(
            [golden.sds_text_payload("ALPHA SECTOR CLEAR")] * 4,
            seed=seed, sysinfo_every=2)
    if kind == "encrypted":
        key = bytes.fromhex("0123456789ABCDEF0123")   # common_key list
        clear = b"\x82EVAC RT B NOW"
        clear += b"\x00" * ((-len(clear)) % 8)
        cipher = TEADecryptor(key, "TEA1").encrypt(clear)
        slots = []
        for _ in range(4):
            data = golden.build_mac_resource_data_bits(
                cipher, rng=rng, enc_mode=1)
            slots.append(golden.build_slot(data, rng=rng))
        return np.concatenate(slots)
    if kind == "lip":
        payload = bytes([0x0C]) + lip_mod.encode_lip_short(52.2297, 21.0122)
        return golden.build_stream([payload] * 4, seed=seed)
    if kind == "gsm7":
        text = "STATUS GREEN"
        packed = bytes([0x07, 0x00, len(text)]) + sds_mod.pack_gsm7(text)
        return golden.build_stream([packed] * 4, seed=seed)
    if kind == "voice":
        # channel-encoded speech slots (requires the codec library)
        import ctypes
        vp = vcodec.VoiceProcessor()
        lib = vp._lib
        enc = lib.tetra_speech_encoder_new()
        pcm = _speech(4, seed=seed)
        slots = []
        try:
            for si in range(4):
                params = np.zeros((2, 138), np.int16)
                for f in range(2):
                    seg = np.ascontiguousarray(
                        pcm[si * 480 + f * 240: si * 480 + (f + 1) * 240])
                    lib.tetra_speech_encode(
                        enc,
                        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                        params[f].ctypes.data_as(
                            ctypes.POINTER(ctypes.c_int16)))
                block = np.zeros(vcodec.CODEC_BLOCK_WORDS, np.int16)
                lib.tetra_channel_encode(
                    np.ascontiguousarray(params).ctypes.data_as(
                        ctypes.POINTER(ctypes.c_int16)),
                    block.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
                soft = np.concatenate([block[1:115], block[116:230],
                                       block[231:345], block[346:436]])
                slots.append(golden.build_voice_slot(
                    (soft[:432] > 0).astype(np.uint8), rng=rng))
        finally:
            lib.tetra_speech_encoder_free(enc)
        return np.concatenate(slots)
    # plain clear text
    return golden.build_stream(
        [golden.sds_text_payload("ECHO SIX STANDBY")] * 4, seed=seed)


@pytest.mark.integration
@pytest.mark.slow
def test_grand_scenario():
    fs = 10.24e6
    have_voice = vcodec.VoiceProcessor().working
    kinds = ["sysinfo+text", "encrypted", "lip", "gsm7",
             "voice" if have_voice else "clear", "clear"]
    offsets = [-1_512_500.0, -512_500.0, 12_500.0, 512_500.0,
               1_512_500.0, 2_512_500.0]

    rng = np.random.default_rng(0)
    lead = rng.integers(0, 2, 64).astype(np.uint8)
    parts = []
    for i, (kind, off) in enumerate(zip(kinds, offsets)):
        bits = np.concatenate([lead, _carrier_bits(kind, seed=100 + i)])
        parts.append(modulator.generate_carrier(
            bits, fs=fs, freq_offset_hz=off))
    n = min(len(p) for p in parts)
    iq = np.sum([p[:n] for p in parts], axis=0).astype(np.complex64)
    iq = modulator.add_awgn(iq, 22, np.random.default_rng(9))

    frames = []
    audio = []
    cfg = PipelineConfig(sample_rate=fs, carrier_offsets_hz=tuple(offsets),
                         detect_gate=False, voice=have_voice,
                         expected_mcc=260, block_len=102_400)
    pipe = Pipeline(cfg, on_frame=frames.append, on_audio=audio.append)
    pipe.run(_ArraySource(iq, fs))

    by_carrier = {}
    for f in frames:
        by_carrier.setdefault(f["carrier"], []).append(f)

    # c0: SYSINFO decoded + clear text
    msgs0 = [f.get("sds_message") for f in by_carrier[0]]
    assert any(m == "[TXT] ALPHA SECTOR CLEAR" for m in msgs0)
    assert any((f.get("call_metadata") or {}).get("mcc") == 260
               for f in by_carrier[0])

    # c1: encrypted -> auto-decrypted to readable text
    dec1 = [f for f in by_carrier[1] if f.get("decrypted")]
    assert dec1, "no frame decrypted on carrier 1"
    assert any("EVAC RT B NOW" in (f.get("sds_message") or "")
               for f in dec1)

    # c2: LIP position recovered
    msgs2 = [f.get("sds_message") or "" for f in by_carrier[2]]
    assert any(m.startswith("[LIP]") and "52.2" in m for m in msgs2)

    # c3: GSM7 text
    msgs3 = [f.get("sds_message") or "" for f in by_carrier[3]]
    assert any("STATUS GREEN" in m for m in msgs3)

    # c4: voice decoded (when codec built)
    if have_voice:
        assert pipe.stats.voice_frames >= 3
        pcm = np.concatenate(audio)
        seg = pcm[240:] - np.mean(pcm[240:])
        ac = np.correlate(seg, seg, "full")[len(seg) - 1:]
        peak = int(np.argmax(ac[40:80])) + 40
        assert abs(peak - 57) <= 3

    # c5: clear text at the band edge
    msgs5 = [f.get("sds_message") for f in by_carrier[5]]
    assert any(m == "[TXT] ECHO SIX STANDBY" for m in msgs5)


class _ArraySource:
    def __init__(self, iq, fs):
        self._iq = np.asarray(iq, np.complex64)
        self._pos = 0
        self.sample_rate = fs

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def read_samples(self, n):
        out = self._iq[self._pos:self._pos + n]
        self._pos += n
        return out
