"""Generate the checked-in recorded-style capture fixture.

Produces ``offair_2carrier.cs16`` — a 2.4 Msps int16-interleaved IQ
capture in the rtl_sdr/continuous-capture wire format, built from the
synthetic modulator and then passed through a real-world impairment
chain so it behaves like an off-air recording rather than a clean
loopback:

  * carrier A at +12.5 kHz: clear SDS traffic ("FIXTURE CAPTURE OK");
  * carrier B at -287.5 kHz: TEA1-encrypted SDS traffic using the
    common key 0123456789ABCDEF0123 (recoverable by auto-decrypt and by
    the bruteforce tool);
  * impairments: +1.1 kHz LO offset, 150 ppm sample-clock drift,
    -6 dB multipath echo at ~8 us, AWGN at 18 dB wideband SNR, and
    int16 quantization at ~-12 dBFS.

Regenerate with:  python tests/fixtures/make_capture.py
(committed output is the contract — regeneration must be deliberate).
"""

from __future__ import annotations

import pathlib

import numpy as np

FS = 2.4e6
OUT = pathlib.Path(__file__).parent / "offair_2carrier.cs16"
KEY_HEX = "0123456789ABCDEF0123"        # TEA1 common key (decoder list)
TEXT_CLEAR = "FIXTURE CAPTURE OK"
TEXT_SECRET = "SECRET FIX MSG"   # short: ciphertext must fit the MAC PDU
OFFSETS = (12_500.0, -287_500.0)
N_SLOTS = 10


def build() -> np.ndarray:
    from tetraear_tpu.crypto.tea import TEADecryptor
    from tetraear_tpu.ref import golden, modulator

    payload_clear = golden.sds_text_payload(TEXT_CLEAR)
    secret = golden.sds_text_payload(TEXT_SECRET)
    padded = secret + b"\x00" * ((-len(secret)) % 8)
    cipher = TEADecryptor(bytes.fromhex(KEY_HEX), "TEA1").encrypt(padded)

    rng_b = np.random.default_rng(7)
    enc_slots = []
    for _ in range(N_SLOTS):
        data = golden.build_mac_resource_data_bits(cipher, rng=rng_b,
                                                   enc_mode=1)
        enc_slots.append(golden.build_slot(data, rng=rng_b))
    streams = [
        golden.build_stream([payload_clear] * N_SLOTS),
        np.concatenate(enc_slots),
    ]
    iq = modulator.generate_multi_carrier(
        streams, fs=FS, offsets_hz=list(OFFSETS), snr_db=None,
        rng=np.random.default_rng(1234))

    rng = np.random.default_rng(99)
    n = len(iq)

    # 150 ppm sample-clock drift: resample by 1 + 150e-6
    t_out = np.arange(n) * (1.0 + 150e-6)
    keep = t_out < n - 1
    t_out = t_out[keep]
    i0 = t_out.astype(np.int64)
    frac = t_out - i0
    iq = (iq[i0] * (1 - frac) + iq[i0 + 1] * frac).astype(np.complex64)
    n = len(iq)

    # +1.1 kHz LO offset
    iq = iq * np.exp(2j * np.pi * 1_100.0 * np.arange(n) / FS)

    # two-ray multipath: -6 dB echo at ~8 us (19 samples)
    echo = np.zeros_like(iq)
    echo[19:] = iq[:-19] * 0.5
    iq = iq + echo

    # AWGN at 18 dB wideband SNR
    p_sig = float(np.mean(np.abs(iq) ** 2))
    sigma = np.sqrt(p_sig / (10 ** (18 / 10)) / 2)
    iq = iq + sigma * (rng.standard_normal(n)
                       + 1j * rng.standard_normal(n))

    # int16 wire format at ~-12 dBFS
    scale = 0.25 * 32767 / np.max(np.abs([iq.real, iq.imag]))
    out = np.empty(2 * n, np.int16)
    out[0::2] = np.round(iq.real * scale).astype(np.int16)
    out[1::2] = np.round(iq.imag * scale).astype(np.int16)
    return out


if __name__ == "__main__":
    data = build()
    data.tofile(OUT)
    print(f"wrote {OUT} ({data.nbytes / 1e6:.2f} MB, "
          f"{len(data) // 2 / FS * 1e3:.0f} ms)")
