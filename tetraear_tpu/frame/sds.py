"""Short Data Service decoding: SDS-1, SDS-TL PIDs, GSM 03.38 7-bit packing.

Behavioural equivalent of the reference SDS layer
(tetraear/core/protocol.py:786-1235): PID dispatch (0x05/0x07 user types,
0x82/0x03 text, 0x83/0x0C location), GSM7 unpacking with optional septet
count and UDH, multi-encoding fallbacks, entropy-based [BIN-ENC] tagging and
the structured [BIN] preview with TLV / u16 views.
"""

from __future__ import annotations

import numpy as np

from tetraear_tpu.frame import lip as lip_mod

# GSM 03.38 default alphabet (code point -> character)
GSM7_ALPHABET = (
    "@£$¥èéùìòÇ\nØø\rÅåΔ_ΦΓΛΩΠΨΣΘΞ\x1bÆæßÉ"
    " !\"#¤%&'()*+,-./0123456789:;<=>?"
    "¡ABCDEFGHIJKLMNOPQRSTUVWXYZÄÖÑÜ§"
    "¿abcdefghijklmnopqrstuvwxyzäöñüà"
)

GSM7_EXTENSION = {
    0x0A: "\f", 0x14: "^", 0x28: "{", 0x29: "}", 0x2F: "\\",
    0x3C: "[", 0x3D: "~", 0x3E: "]", 0x40: "|", 0x65: "€",
}


def gsm7_map(code: int) -> str:
    if 0 <= code < len(GSM7_ALPHABET):
        ch = GSM7_ALPHABET[code]
        return "" if ch == "\x1b" else ch
    return ""


# escape-free fast path: map septet codes through one str.translate
# (codes are 7-bit, so a latin-1 decode of the code bytes feeds it)
_GSM7_TABLE = str.maketrans(
    {i: ("" if GSM7_ALPHABET[i] == "\x1b" else GSM7_ALPHABET[i])
     for i in range(len(GSM7_ALPHABET))})
_POW7 = None


def unpack_gsm7(data: bytes, septet_count: int | None = None,
                skip_bits: int = 0) -> str:
    """Unpack GSM 03.38 7-bit packed octets (LSB-first within octets).

    Vectorized septet extraction (the per-bit Python loop was a
    measured per-hit hot spot); the 0x1B escape state machine runs
    per-septet only when an escape code is present.  Identical output
    to the reference formulation
    (tests/unit/test_protocol.py::test_unpack_gsm7_vectorized)."""
    if not data:
        return ""
    global _POW7
    if _POW7 is None:
        _POW7 = (1 << np.arange(7)).astype(np.int16)
    bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")
    if skip_bits:
        if skip_bits >= len(bits):
            return ""
        bits = bits[skip_bits:]
    max_septets = len(bits) // 7
    if septet_count is None or septet_count > max_septets:
        septet_count = max_septets
    if septet_count <= 0:
        return ""
    codes = bits[:7 * septet_count].reshape(-1, 7).astype(np.int16) @ _POW7
    if not (codes == 0x1B).any():
        return (codes.astype(np.uint8).tobytes()
                .decode("latin-1").translate(_GSM7_TABLE))
    out = []
    escaped = False
    for code in codes.tolist():
        if escaped:
            out.append(GSM7_EXTENSION.get(code, ""))
            escaped = False
        elif code == 0x1B:
            escaped = True
        else:
            out.append(gsm7_map(code))
    return "".join(out)


def unpack_gsm7_udh(data: bytes, septet_count: int | None = None) -> str:
    """GSM7 unpack treating the first octet as a UDH length header."""
    if not data or len(data) < 2:
        return ""
    udh_len = data[0]
    if udh_len <= 0 or udh_len + 1 > len(data):
        return ""
    skip_bits = (udh_len + 1) * 8
    payload_septets = None
    if septet_count is not None:
        udh_septets = (skip_bits + 6) // 7
        if septet_count > udh_septets:
            payload_septets = septet_count - udh_septets
    return unpack_gsm7(data, septet_count=payload_septets,
                       skip_bits=skip_bits)


def pack_gsm7(text: str) -> bytes:
    """Inverse of unpack_gsm7 — used to build golden SDS fixtures."""
    rev = {c: i for i, c in enumerate(GSM7_ALPHABET) if c != "\x1b"}
    bits = []
    for ch in text:
        code = rev.get(ch)
        if code is None:
            code = rev.get(" ", 0x20)
        for i in range(7):
            bits.append((code >> i) & 1)
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i:i + 8]):
            byte |= b << j
        out.append(byte)
    return bytes(out)


# Fast character-class gates: the per-character generator passes were
# the dominant host cost of the per-hit frame layer once the native
# parse engine landed (every CRC-pass clear frame runs the SDS
# cascade).  Latin-1-encodable text (every SDS-1/SDS-TL decode and most
# GSM7 output) counts character classes via bytes.translate deletion
# tables — one C pass per class; anything else falls back to the
# per-character reference path.  Predicates are IDENTICAL to the
# reference's (protocol.py:1204-1235); equivalence is pinned by
# tests/unit/test_protocol.py::test_text_gates_vectorized.
def _del_table(pred) -> bytes:
    """Bytes whose latin-1 character does NOT satisfy pred — the
    translate 'delete' argument, so len(bt.translate(None, tbl))
    counts the satisfying characters."""
    return bytes(b for b in range(256) if not pred(chr(b)))


_DEL_PRINT_V = _del_table(lambda c: c.isprintable() or c in "\n\r\t")
_DEL_ALNUM_V = _del_table(lambda c: c.isalnum() or c == " ")
_DEL_PRINT_S = _del_table(lambda c: c.isprintable() and c != "\x1b")
_DEL_ALNUM_S = _del_table(lambda c: c.isalnum() or c.isspace())
_DEL_ALPHA = _del_table(str.isalpha)


def score_text(text: str) -> float:
    """Plausibility score for candidate decodes (protocol.py:1204-1211)."""
    if not text:
        return 0.0
    try:
        bt = text.encode("latin-1")
    except UnicodeEncodeError:
        bt = None
    if bt is None:
        printable = sum(1 for c in text if c.isprintable() and c != "\x1b")
        alnum = sum(1 for c in text if c.isalnum() or c.isspace())
        alpha = sum(1 for c in text if c.isalpha())
    else:
        printable = len(bt.translate(None, _DEL_PRINT_S))
        alnum = len(bt.translate(None, _DEL_ALNUM_S))
        alpha = len(bt.translate(None, _DEL_ALPHA))
    return (printable / len(text)) + (alnum / len(text)) + (
        0.5 if alpha > 0 else 0.0)


def is_valid_text(text: str, threshold: float = 0.8) -> bool:
    """Human-readable text gate (protocol.py:1213-1235)."""
    if not text or len(text) < 2:
        return False
    try:
        bt = text.encode("latin-1")
    except UnicodeEncodeError:
        bt = None
    if bt is None:
        clean = "".join(c for c in text if c not in "\n\r\t ")
        if not clean:
            return False
        printable = sum(1 for c in text if c.isprintable() or c in "\n\r\t")
        if len(text) > 4 and text.count(text[0]) == len(text):
            return False
        alnum = sum(1 for c in text if c.isalnum() or c == " ")
        return (printable / len(text) >= threshold
                and (alnum / len(text)) > 0.5)
    if not bt.translate(None, b"\n\r\t "):
        return False
    printable = len(bt.translate(None, _DEL_PRINT_V))
    if len(text) > 4 and bt.count(bt[:1]) == len(bt):
        return False
    alnum = len(bt.translate(None, _DEL_ALNUM_V))
    return (printable / len(text) >= threshold
            and (alnum / len(text)) > 0.5)


def _hex_preview(buf: bytes, max_bytes: int = 48) -> str:
    if len(buf) <= max_bytes:
        return buf.hex(" ").upper()
    return buf[:max_bytes].hex(" ").upper() + " ..."


def parse_sds_data(data: bytes, stats: dict | None = None) -> str | None:
    """Decode an SDS payload to tagged text (protocol.py:802-1018).

    Tags: [SDS-1] [SDS-GSM] [TXT] [LIP] [LOC] [GPS] [GSM7] [BIN-ENC] [BIN].
    """
    def _count(kind: str):
        if stats is not None:
            stats[kind] += 1

    if not data or len(data) < 1:
        return None
    data = bytes(data)
    data_stripped = data.rstrip(b"\x00")
    if not data_stripped:
        return None

    # SDS-1 user type: 05 00 <len> ASCII...
    if len(data) > 3 and data[0] == 0x05 and data[1] == 0x00:
        payload = data[3:].rstrip(b"\x00")
        try:
            text = payload.decode("ascii")
            if is_valid_text(text):
                _count("data_messages")
                return f"[SDS-1] {text}"
        except UnicodeDecodeError:
            pass

    # GSM-7 user type: 07 00 <septets?> packed...
    if len(data) > 3 and data[0] == 0x07 and data[1] == 0x00:
        candidates: list[str] = []
        septets = data[2]
        p3 = data[3:]
        if p3:
            max_septets = (len(p3) * 8) // 7
            if 0 < septets <= min(160, max_septets):
                candidates.append(unpack_gsm7(p3, septet_count=septets))
                candidates.append(unpack_gsm7_udh(p3, septet_count=septets))
            candidates.append(unpack_gsm7(p3))
            candidates.append(unpack_gsm7_udh(p3))
        p2 = data[2:]
        if p2:
            candidates.append(unpack_gsm7(p2))
            candidates.append(unpack_gsm7_udh(p2))
        best, best_score = "", 0.0
        seen = set()
        for t in candidates:
            t = t.strip("\x00").strip()
            if not t or t in seen:
                continue
            seen.add(t)
            s = score_text(t)
            if s > best_score:
                best_score, best = s, t
        if best and is_valid_text(best, threshold=0.55):
            _count("data_messages")
            return f"[SDS-GSM] {best}"

    # SDS-TL protocol identifiers
    pid = data[0]
    payload = data[1:].rstrip(b"\x00")
    if pid == 0x82:        # text messaging, ISO 8859-1
        try:
            text = payload.decode("latin-1")
            if is_valid_text(text):
                _count("data_messages")
                return f"[TXT] {text}"
        except Exception:
            pass
    elif pid == 0x03:      # simple text messaging, ASCII
        try:
            text = payload.decode("ascii")
            if is_valid_text(text):
                _count("data_messages")
                return f"[TXT] {text}"
        except UnicodeDecodeError:
            pass
    elif pid == 0x83:      # location system
        lip_text = lip_mod.parse_lip(payload)
        if lip_text:
            return f"[LIP] {lip_text}"
        return f"[LOC] Location Data: {payload.hex()}"
    elif pid == 0x0C:      # GPS / LIP
        lip_text = lip_mod.parse_lip(payload)
        if lip_text:
            return f"[LIP] {lip_text}"
        return f"[GPS] GPS Data: {payload.hex()}"

    # Heuristic plain-text fallback
    test_data = data_stripped
    printable = sum(1 for b in test_data if 32 <= b <= 126 or b in (10, 13))
    if test_data and printable / len(test_data) > 0.6:
        for encoding in ("utf-8", "latin-1", "ascii", "cp1252"):
            try:
                text = test_data.decode(encoding)
            except (UnicodeDecodeError, LookupError):
                continue
            if is_valid_text(text, threshold=0.6):
                _count("data_messages")
                return f"[TXT] {text}"
        text = test_data.decode("latin-1", errors="replace")
        if is_valid_text(text, threshold=0.6):
            _count("data_messages")
            return f"[TXT] {text}"

    # GSM7 as a last resort.  Unlike the reference (protocol.py:940-962),
    # acceptance additionally requires a high ASCII-alphanumeric ratio:
    # the GSM 03.38 alphabet maps *every* septet to a printable character,
    # so the reference's is_valid_text gate passes on pure noise and random
    # payloads get tagged [GSM7] before [BIN-ENC] is ever reached.
    try:
        best, best_score = "", 0.0
        seen = set()
        for t in (unpack_gsm7(test_data), unpack_gsm7_udh(test_data)):
            t = t.strip("\x00").strip()
            if not t or t in seen:
                continue
            seen.add(t)
            s = score_text(t)
            if s > best_score:
                best_score, best = s, t
        if best and is_valid_text(best, threshold=0.55):
            ascii_alnum = sum(1 for c in best
                              if c.isascii() and (c.isalnum() or c == " "))
            if ascii_alnum / len(best) >= 0.75:
                _count("data_messages")
                return f"[GSM7] {best}"
    except Exception:
        pass

    # High-entropy -> likely encrypted binary
    if len(test_data) > 8:
        if len(set(test_data)) / len(test_data) > 0.7:
            return (f"[BIN-ENC] SDS (Binary/Encrypted) - {len(test_data)} "
                    f"bytes | {_hex_preview(test_data, 32)}")

    # Structured binary preview
    pid = data_stripped[0]
    payload = data_stripped[1:]
    parts = [f"PID=0x{pid:02X}", f"HEX={_hex_preview(data_stripped, 32)}"]
    if payload:
        printable = sum(1 for b in payload
                        if 32 <= b <= 126 or b in (9, 10, 13))
        if printable / len(payload) >= 0.85:
            try:
                txt = payload.decode("latin-1", errors="replace")
                txt = txt.replace("\r", "").replace("\x00", "")
                txt = "".join(c for c in txt
                              if c.isprintable() or c in "\n\t").strip()
                if txt:
                    parts.append(f'ASCII="{txt[:60]}"')
            except Exception:
                pass
        tlv_items = []
        idx = 0
        while idx + 2 <= len(payload):
            tag, length = payload[idx], payload[idx + 1]
            if length == 0 or idx + 2 + length > len(payload):
                break
            val = payload[idx + 2: idx + 2 + length]
            tlv_items.append(f"{tag:02X}:{length}={_hex_preview(val, 12)}")
            idx += 2 + length
            if len(tlv_items) >= 4:
                break
        if tlv_items and idx >= max(3, int(len(payload) * 0.75)):
            parts.append("TLV=" + " ".join(tlv_items))
        if len(payload) in (2, 4, 6, 8, 10, 12):
            le = [int.from_bytes(payload[i:i + 2], "little")
                  for i in range(0, len(payload), 2)]
            be = [int.from_bytes(payload[i:i + 2], "big")
                  for i in range(0, len(payload), 2)]
            parts.append("u16le=" + ",".join(f"0x{w:04X}" for w in le))
            parts.append("u16be=" + ",".join(f"0x{w:04X}" for w in be))
    return "[BIN] " + " | ".join(parts)
