"""From-scratch video container decode (stdlib + numpy only).

Real decode paths for the uncompressed cases a training-data pipeline can
handle without native codecs:

* **Y4M / YUV4MPEG2** (the mjpegtools interchange format, plain-text
  header + raw planar frames): ``C420``-family (any ``C420*`` chroma
  siting — the luma plane layout is identical), ``C422``, ``C444`` and
  ``Cmono`` color spaces, any frame rate / count. The luma plane is the
  decoded grayscale frame.
* **AVI / RIFF** with uncompressed DIB ``vids`` streams (``00db`` /
  ``00dc`` chunks, ``biCompression=0``, 24-bit bottom-up BGR — the same
  pixel layout as the BMP decoder): frames → integer-luma grayscale.
* **MJPEG inside AVI** (``biCompression='MJPG'``): every frame chunk is
  a standalone baseline JPEG, decoded by the engine's own from-scratch
  :mod:`.jpeg` codec — a REAL DCT video path, exact-oracle-checkable
  via the constant-block round-trip (Q ``mjpeg_video``).

Anything else (MP4/H.264, VP8/9…) stays a declared
``NotImplementedError`` stub — swap :func:`decode_video` for a
PyAV/ffmpeg kernel in production. The Ray-side plumbing (frame
sampling, actor-pool feature stage, integer features for the exact
oracle) is identical either way.

The reference repo has no video path; this exists for the engine's
multimodal columns (SURVEY §2, multimodal)."""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "VideoError",
    "decode_video",
    "video_frame_sample",
    "encode_y4m",
    "encode_avi",
]


class VideoError(ValueError):
    """Typed malformed-/unsupported-video error (contained per row by the
    media stages)."""


# ---------------------------------------------------------------------------
# Y4M


def _decode_y4m(payload: bytes) -> tuple[list[np.ndarray], float]:
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "replace").split(" ")
    if header[0] != "YUV4MPEG2":
        raise VideoError("not a Y4M stream")
    w = h = None
    fps = 25.0
    cs = "420"
    for tok in header[1:]:
        if not tok:
            continue
        tag, val = tok[0], tok[1:]
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = int(num) / int(den)
        elif tag == "C":
            if val in ("420", "420jpeg", "420mpeg2", "420paldv"):
                cs = "420"  # chroma siting variants share the plane layout
            elif val in ("422", "444", "mono"):
                cs = val
            else:  # 10/12-bit (e.g. C420p10) and exotic samplings
                raise VideoError(f"Y4M colourspace C{val} unsupported")
    if not w or not h:
        raise VideoError("Y4M header missing W/H")
    if cs == "420":
        frame_size = w * h + 2 * ((w // 2) * (h // 2))
    elif cs == "422":
        frame_size = w * h + 2 * ((w // 2) * h)
    elif cs == "444":
        frame_size = 3 * w * h
    else:  # mono
        frame_size = w * h
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:fnl].split(b" ")[0] != b"FRAME":
            raise VideoError("malformed Y4M FRAME marker")
        pos = fnl + 1
        if pos + frame_size > len(payload):
            raise VideoError("truncated Y4M frame")
        luma = np.frombuffer(payload[pos : pos + w * h], np.uint8).reshape(h, w)
        frames.append(luma.copy())
        pos += frame_size
    return frames, fps


def encode_y4m(
    frames: list[np.ndarray], fps: tuple[int, int] = (25, 1), colorspace: str = "420jpeg"
) -> bytes:
    """Real Y4M writer for fixtures: grayscale (H, W) frames become the
    luma plane; chroma planes are neutral 128s."""
    h, w = frames[0].shape
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n".encode()
    )
    if colorspace.startswith("420"):
        chroma = bytes([128]) * (2 * (w // 2) * (h // 2))
    elif colorspace == "444":
        chroma = bytes([128]) * (2 * w * h)
    elif colorspace == "mono":
        chroma = b""
    else:
        raise VideoError(f"encoder colourspace {colorspace} unsupported")
    for f in frames:
        out += b"FRAME\n"
        out += np.asarray(f, np.uint8).tobytes()
        out += chroma
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI (RIFF, uncompressed DIB frames)


def _riff_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _decode_avi(payload: bytes) -> tuple[list[np.ndarray], float]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise VideoError("not an AVI file")
    width = height = None
    fps = 25.0
    compression = None
    movi_ranges: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, fps, compression
        for fourcc, body, size in _riff_chunks(payload, pos, end):
            if fourcc == b"LIST":
                list_type = payload[body : body + 4]
                if list_type == b"movi":
                    movi_ranges.append((body + 4, body + size))
                else:
                    walk(body + 4, body + size)
            elif fourcc == b"avih":
                (us_per_frame,) = struct.unpack("<I", payload[body : body + 4])
                if us_per_frame:
                    fps = 1e6 / us_per_frame
                width, height = struct.unpack("<II", payload[body + 32 : body + 40])
            elif fourcc == b"strf" and compression is None:
                # BITMAPINFOHEADER of the first (vids) stream
                (compression,) = struct.unpack("<I", payload[body + 16 : body + 20])

    walk(12, len(payload))
    if width is None or not movi_ranges:
        raise VideoError("AVI missing avih/movi")
    mjpeg = compression == 0x47504A4D  # 'MJPG' — per-frame baseline JPEG
    if compression not in (0, None) and not mjpeg:
        raise VideoError(
            f"AVI compression 0x{compression:08x} unsupported — uncompressed "
            "DIB and MJPG only (H.264/VP9 need native codecs; swap "
            "decode_video for a PyAV kernel in production)"
        )
    stride = (width * 3 + 3) & ~3
    frames: list[np.ndarray] = []
    for movi_pos, movi_end in movi_ranges:
        for fourcc, body, size in _riff_chunks(payload, movi_pos, movi_end):
            if fourcc[2:4] not in (b"db", b"dc"):
                continue
            if mjpeg:
                # Motion JPEG: every chunk is a standalone baseline JPEG —
                # decoded by the engine's own from-scratch codec (round 3).
                from .jpeg import decode_jpeg

                frames.append(decode_jpeg(payload[body : body + size]))
                continue
            if size < stride * height:
                raise VideoError("truncated AVI frame chunk")
            px = np.frombuffer(payload[body : body + stride * height], np.uint8)
            rows = px.reshape(height, stride)[:, : width * 3].reshape(
                height, width, 3
            )
            b, g, r = (
                rows[:, :, 0].astype(np.uint32),
                rows[:, :, 1].astype(np.uint32),
                rows[:, :, 2].astype(np.uint32),
            )
            luma = ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
            frames.append(luma[::-1])  # bottom-up like BMP
    return frames, fps


def encode_avi(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """Real AVI writer for fixtures: grayscale frames as uncompressed
    24-bit DIB ``00db`` chunks (B=G=R, bottom-up), minimal but spec-shaped
    hdrl (avih + strl/strh/strf)."""
    h, w = frames[0].shape
    stride = (w * 3 + 3) & ~3

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def list_chunk(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0x10,        # max bytes/s, padding, flags (AVIF_HASINDEX off)
        len(frames), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(frames), 0, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                       2835, 2835, 0, 0)
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    for f in frames:
        dib = bytearray()
        arr = np.asarray(f, np.uint8)
        for r in range(h - 1, -1, -1):
            row = np.repeat(arr[r], 3).tobytes()
            dib += row + b"\x00" * (stride - w * 3)
        movi_body += chunk(b"00db", bytes(dib))
    riff_body = b"AVI " + hdrl + chunk(b"LIST", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def encode_mjpeg_avi(jpeg_frames: list[bytes], w: int, h: int, fps: int = 25) -> bytes:
    """MJPEG AVI writer for fixtures: pre-encoded baseline JPEGs as
    ``00dc`` chunks with biCompression='MJPG' (the classic webcam/crawl
    container shape)."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def list_chunk(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, 0, 0, 0x10,
        len(jpeg_frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(jpeg_frames), 0, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    for jf in jpeg_frames:
        movi_body += chunk(b"00dc", jf)
    riff_body = b"AVI " + hdrl + chunk(b"LIST", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ---------------------------------------------------------------------------
# dispatch + sampling


def decode_video(payload: bytes) -> tuple[list[np.ndarray], float]:
    """Decode a video payload → (grayscale luma frames, fps). Corrupt
    containers raise typed :class:`VideoError` (round-5 fuzz: a
    truncated AVI chunk header leaked a raw ``struct.error``)."""
    try:
        if payload[:9] == b"YUV4MPEG2":
            return _decode_y4m(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            return _decode_avi(payload)
    except (VideoError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, TypeError, ValueError) as exc:
        raise VideoError(
            f"corrupt video container ({type(exc).__name__}: {exc})"
        ) from exc
    raise VideoError(
        "unrecognized video container — MP4/MKV/WebM need native demuxers; "
        "swap decode_video for a PyAV kernel in production"
    )


def video_frame_sample(payload: bytes, n_frames: int = 4) -> list[np.ndarray]:
    """Uniform frame sampling: ``n_frames`` evenly-spaced luma frames
    (deterministic indices ``floor(i * N / n)``), fewer if the clip is
    shorter — the decode+sample stage of a video pipeline."""
    frames, _ = decode_video(payload)
    if len(frames) <= n_frames:
        return frames
    idx = (np.arange(n_frames) * len(frames)) // n_frames
    return [frames[i] for i in idx]
