"""G.711 µ-law / A-law audio decode (WAV format tags 0x0007 / 0x0006).

The telephony companding codecs (ITU-T G.711, public spec): one encoded
byte per sample, decoded by pure integer bit arithmetic — which makes
them, like IMA ADPCM, fully oracle-checkable in SQL (the decode formula
restated with ``>>``/``&``/CASE, no lookup-table literals needed).

Decode formulas (the classic reference expansions):

µ-law:  u' = ~u;  exp = (u' >> 4) & 7;  mant = u' & 0xF;
        mag = (((mant << 3) + 0x84) << exp) - 0x84;
        sample = -mag if (u' & 0x80) else mag
A-law:  a' = a ^ 0x55;  exp = (a' >> 4) & 7;  mant = a' & 0xF;
        mag = (mant << 4) + 8            if exp == 0
            = ((mant << 4) + 0x108) << (exp - 1)  otherwise
        sample = -mag if NOT (a' & 0x80) else mag
        (A-law bit 7 SET means positive after the 0x55 flip)
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_mulaw", "decode_alaw", "decode_g711_wav", "encode_g711_wav"]


def decode_mulaw(data: np.ndarray) -> np.ndarray:
    u = (~data.astype(np.int64)) & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0xF
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def decode_alaw(data: np.ndarray) -> np.ndarray:
    a = (data.astype(np.int64) ^ 0x55) & 0xFF
    exp = (a >> 4) & 7
    mant = a & 0xF
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


def decode_g711_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Mono G.711 WAV → (int16 samples, rate). Generic RIFF chunk walk;
    raises NotImplementedError on other format tags (PCM falls through
    to the stdlib path in ``decode_audio``)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    if tag not in (0x0006, 0x0007):
        raise NotImplementedError(f"WAV format tag 0x{tag:04x} is not G.711")
    if channels != 1:
        raise NotImplementedError("mono G.711 only")
    raw = np.frombuffer(data, dtype=np.uint8)
    return (decode_alaw(raw) if tag == 0x0006 else decode_mulaw(raw)), rate


def encode_g711_wav(encoded_bytes: np.ndarray, law: str, rate: int = 8000) -> bytes:
    """Pack already-companded bytes into a mono G.711 WAV (fixture path —
    the queries drive the DECODER with closed-form byte streams)."""
    tag = 0x0007 if law == "mulaw" else 0x0006
    body = encoded_bytes.astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8)
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", len(out)) + out
