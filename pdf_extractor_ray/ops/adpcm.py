"""IMA ADPCM (DVI4) audio codec — WAV format tag 0x0011, mono.

A real lossy crawl-audio format the stdlib ``wave`` module cannot read,
and — unlike MP3/AAC, whose float synthesis filterbanks defeat exact
oracles — IMA ADPCM is a pure INTEGER state machine (predictor +
step-index per block, published tables), so a SQL recursive CTE can
replay the decode bit-for-bit.  Public algorithm (IMA "Recommended
Practices for Enhancing Digital Audio Compatibility", 1992; same tables
as the classic reference implementations).

Container layout (standard IMA-in-WAV, mono): each ``block_align``-byte
data block = 4-byte header (predictor int16 LE = sample 0 of the block,
step index uint8, reserved) + data bytes, two 4-bit nibbles per byte
(LOW nibble first), each nibble producing one sample; samples/block =
(block_align - 4) * 2 + 1.

Decode is vectorized ACROSS blocks: all of a payload's blocks step
through the nibble loop together as numpy arrays (the per-nibble serial
dependency is within a block only — the format's shape, not an
implementation choice).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_ima_wav", "encode_ima_wav", "IMA_STEP_TABLE", "IMA_INDEX_TABLE"]

IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64
)


def _decode_blocks(headers: np.ndarray, indices: np.ndarray, nibbles: np.ndarray) -> np.ndarray:
    """Vectorized-across-blocks IMA decode.  ``headers``: (B,) int
    predictors (block sample 0); ``indices``: (B,) step indices;
    ``nibbles``: (B, N) nibble values.  Returns (B, N+1) int16 samples."""
    b, n = nibbles.shape
    pred = headers.astype(np.int64)
    idx = np.clip(indices.astype(np.int64), 0, 88)
    out = np.empty((b, n + 1), dtype=np.int16)
    out[:, 0] = pred.astype(np.int16)
    for t in range(n):
        nib = nibbles[:, t].astype(np.int64)
        step = IMA_STEP_TABLE[idx]
        diff = step >> 3
        diff += np.where(nib & 1, step >> 2, 0)
        diff += np.where(nib & 2, step >> 1, 0)
        diff += np.where(nib & 4, step, 0)
        pred = np.clip(
            np.where(nib & 8, pred - diff, pred + diff), -32768, 32767
        )
        idx = np.clip(idx + IMA_INDEX_TABLE[nib], 0, 88)
        out[:, t + 1] = pred.astype(np.int16)
    return out


def decode_ima_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a mono IMA-ADPCM WAV → (int16 samples, sample_rate).
    Walks RIFF chunks generically (``fact`` etc. skipped)."""
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
    tag, channels, rate, _, block_align, _ = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 0x0011:
        raise NotImplementedError(f"WAV format tag 0x{tag:04x} is not IMA ADPCM")
    if channels != 1:
        raise NotImplementedError("mono IMA ADPCM only")
    nblocks = len(data) // block_align
    raw = np.frombuffer(data[: nblocks * block_align], dtype=np.uint8).reshape(
        nblocks, block_align
    )
    headers = raw[:, 0].astype(np.int16) | (raw[:, 1].astype(np.int16) << 8)
    indices = raw[:, 2]
    body = raw[:, 4:]
    nibbles = np.empty((nblocks, (block_align - 4) * 2), dtype=np.uint8)
    nibbles[:, 0::2] = body & 0x0F  # LOW nibble = first sample of the pair
    nibbles[:, 1::2] = body >> 4
    return _decode_blocks(headers, indices, nibbles).reshape(-1), rate


def encode_ima_wav(
    block_headers: np.ndarray,
    block_indices: np.ndarray,
    block_nibbles: np.ndarray,
    rate: int = 16000,
) -> bytes:
    """Pack per-block (predictor, index, nibbles) into a standard mono
    IMA-ADPCM WAV — container packing only (the fixture path; a search-
    based encoder is not needed to test decode)."""
    b, n = block_nibbles.shape
    if n % 2:
        raise ValueError("nibble count per block must be even")
    block_align = 4 + n // 2
    samples_per_block = n + 1
    blocks = bytearray()
    for i in range(b):
        blocks += struct.pack(
            "<hBB", int(block_headers[i]), int(block_indices[i]), 0
        )
        body = (block_nibbles[i, 0::2] & 0x0F) | (block_nibbles[i, 1::2] << 4)
        blocks += body.astype(np.uint8).tobytes()
    byte_rate = rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, rate, byte_rate, block_align, 4, 2, samples_per_block
    )
    fact = struct.pack("<I", b * samples_per_block)
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<I", len(fact)) + fact
    out += b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    return b"RIFF" + struct.pack("<I", len(out)) + out
