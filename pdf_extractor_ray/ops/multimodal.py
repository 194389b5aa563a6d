"""Multimodal (image/audio/video) column plumbing.

Binary media ride as opaque ``binary`` columns with typed metadata, exactly
like the PDF payloads in the main pipeline. The Ray-side plumbing — schema,
actor-pool stage shape, batch sizing for wide binary rows, output layout —
is real and tested. Decode kernels, round 2:

* REAL, from scratch on stdlib/numpy: PNG (8-bit gray/RGB/RGBA, filters
  0-4, zlib IDAT — the PNG spec / RFC 2083), BMP (24-bit uncompressed),
  baseline JPEG (round 3 — :mod:`.jpeg`: Huffman + dequant + IDCT, gray
  and subsampled YCbCr, restart markers), GIF 87a/89a (round 3 —
  LSB-first LZW, global/local palettes, interlace; first frame),
  baseline TIFF (round 3 — both byte orders, none/LZW/PackBits strips,
  predictor 2, gray + RGB), lossless WebP (round 3 — :mod:`.webp`,
  VP8L), WAV (PCM via the stdlib ``wave`` module), FLAC (round 3 —
  :mod:`.flac`: Rice residuals, fixed + LPC predictors, stereo
  decorrelation).
* STUBBED, declared: lossy-VP8 WebP / AVIF / HEIC images and MP3/AAC
  audio — ``NotImplementedError`` with the production swap noted; a
  deterministic fake format keeps the plumbing testable without any
  codec. Video containers decode for real in the uncompressed cases
  (see :mod:`.video`); DCT video codecs stay declared stubs.

Fake payload convention: ``b"IMGv1" + width:uint16 + height:uint16 +
channel bytes``.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("kind", pa.string()),       # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FAKE_MAGIC = b"IMGv1"


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image payload (single channel)."""
    rng = np.random.Generator(np.random.Philox(seed))
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return FAKE_MAGIC + struct.pack("<HH", width, height) + pixels.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Reverse PNG row filters 0-4 (None/Sub/Up/Average/Paeth) with proper
    ``bpp``-offset left neighbors (PNG spec §9 / RFC 2083)."""
    stride = width * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        tag = raw[pos]
        pos += 1
        cur = bytearray(raw[pos : pos + stride])
        pos += stride
        if tag == 1:
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif tag == 2:
            cur = bytearray(
                (np.frombuffer(bytes(cur), np.uint8) + np.frombuffer(bytes(prev), np.uint8)).astype(np.uint8).tobytes()
            )
        elif tag == 3:
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif tag == 4:
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                cur[i] = (cur[i] + pred) & 0xFF
        out += cur
        prev = cur
    return bytes(out)


def decode_png(payload: bytes) -> np.ndarray:
    """From-scratch PNG decode (8-bit depth, color types 0/2/6,
    non-interlaced): chunk walk → concatenated-IDAT inflate → row
    unfilter → grayscale via integer luma. Corrupt streams raise
    ``ValueError`` (typed-error contract, round-5 fuzz — zlib CRC
    failures on rotted IDAT data included)."""
    try:
        return _decode_png_impl(payload)
    except (ValueError, NotImplementedError):
        raise
    except (zlib.error, IndexError, KeyError, TypeError, struct.error) as exc:
        raise ValueError(
            f"corrupt PNG ({type(exc).__name__}: {exc})"
        ) from exc


def _decode_png_impl(payload: bytes) -> np.ndarray:
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color_type not in (0, 2, 6):
                raise NotImplementedError(
                    f"PNG variant unsupported (depth={depth}, color={color_type}, "
                    f"interlace={interlace}) — 8-bit gray/RGB/RGBA only"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    px = np.frombuffer(_png_unfilter(raw, width, height, bpp), np.uint8)
    px = px.reshape(height, width, bpp)
    if bpp == 1:
        return px[:, :, 0].copy()
    r, g, b = px[:, :, 0].astype(np.uint32), px[:, :, 1].astype(np.uint32), px[:, :, 2].astype(np.uint32)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def encode_png(img: np.ndarray, color_type: int = 0, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder for fixtures: 8-bit grayscale (``color_type=0``,
    from an (H, W) array) or RGB (``color_type=2``, (H, W, 3)); per-row
    filter 0 (None) or 2 (Up) to exercise the unfilter path."""

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    if color_type == 0:
        h, w = img.shape
        rows = img.reshape(h, w)
    else:
        h, w, _ = img.shape
        rows = img.reshape(h, w * 3)
    raw = bytearray()
    prev = np.zeros(rows.shape[1], dtype=np.uint8)
    for r in range(h):
        raw.append(filter_type)
        if filter_type == 2:
            raw += ((rows[r].astype(np.int16) - prev) % 256).astype(np.uint8).tobytes()
        else:
            raw += rows[r].astype(np.uint8).tobytes()
        prev = rows[r].astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP decode (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding) → grayscale luma."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError("BMP variant unsupported — 24-bit uncompressed only")
    flip = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    out = np.empty((height, width), dtype=np.uint8)
    for r in range(height):
        row = np.frombuffer(
            payload[pixel_off + r * stride : pixel_off + r * stride + width * 3],
            np.uint8,
        ).reshape(width, 3)
        b, g, rr = row[:, 0].astype(np.uint32), row[:, 1].astype(np.uint32), row[:, 2].astype(np.uint32)
        out[height - 1 - r if flip else r] = ((rr * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
    return out


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit BMP encoder for fixtures ((H, W) grayscale input)."""
    h, w = img.shape
    stride = (w * 3 + 3) & ~3
    pixel_data = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = np.repeat(img[r].astype(np.uint8), 3).tobytes()  # B=G=R=gray
        pixel_data += row + b"\x00" * (stride - w * 3)
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + info + bytes(pixel_data)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W) grayscale array.

    PNG, BMP and baseline JPEG decode for real (from-scratch stdlib/numpy
    kernels — JPEG in :mod:`.jpeg`, added round 3: full marker parse,
    canonical Huffman, dequant + vectorized IDCT, gray + YCbCr subsampled,
    restart markers; luma plane out). The deterministic fake format decodes
    for plumbing tests; WebP decodes VP8L (lossless) for real — lossy VP8
    remains the declared stub (a full DCT video codec; swap in a Pillow
    kernel in production). JPEG's luma IS the Y channel; the others use
    the integer (299r+587g+114b)/1000 luma."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .jpeg import decode_gif

        return decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from .jpeg import decode_tiff

        return decode_tiff(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp import decode_webp

        return decode_webp(payload)
    if payload[:5] == FAKE_MAGIC:
        width, height = struct.unpack("<HH", payload[5:9])
        return np.frombuffer(payload[9 : 9 + width * height], dtype=np.uint8).reshape(
            height, width
        )
    raise NotImplementedError(
        "unrecognized image format; lossy-VP8 WebP / AVIF / HEIC need "
        "native codecs — swap decode_image for a Pillow kernel in production"
    )


class ImageFeatureExtractor:
    """Actor-pool ``map_batches`` stage: decode → resize (area mean-pool) →
    feature vector (normalized intensity histogram). The actor shape is the
    production shape — a real model load belongs in ``__init__``."""

    def __init__(self, target: int = 8, n_bins: int = 16):
        self.target = target
        self.n_bins = n_bins

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape
        th = tw = self.target
        ys = (np.arange(th + 1) * h // th).astype(int)
        xs = (np.arange(tw + 1) * w // tw).astype(int)
        out = np.empty((th, tw), dtype=np.float64)
        for i in range(th):
            for j in range(tw):
                block = img[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
                out[i, j] = block.mean()
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats: list[list[float] | None] = []
        thumbs: list[bytes | None] = []
        errors: list[str | None] = []
        for payload in batch["payload"].to_pylist():
            try:
                img = decode_image(payload)
                hist, _ = np.histogram(img, bins=self.n_bins, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).tolist())
                thumb = self._resize(img).astype(np.uint8)
                thumbs.append(
                    FAKE_MAGIC
                    + struct.pack("<HH", thumb.shape[1], thumb.shape[0])
                    + thumb.tobytes()
                )
                errors.append(None)
            except Exception as exc:  # noqa: BLE001 — containment boundary:
                # corrupt payloads (zlib errors, truncated headers) must
                # yield an error row, never abort a corpus-scale job
                feats.append(None)
                thumbs.append(None)
                errors.append(f"{type(exc).__name__}: {exc}"[:120])
        return (
            batch.drop_columns(["payload"])
            .append_column("features", pa.array(feats, pa.list_(pa.float64())))
            .append_column("thumbnail", pa.array(thumbs, pa.binary()))
            .append_column("decode_error", pa.array(errors, pa.string()))
        )


def media_pipeline(ds, target: int = 8, batch_size: int = 32, concurrency=(1, 4)):
    """Media feature pipeline: SMALL batches (wide binary rows — batch ×
    concurrency must fit worker heap), actor pool for warm codec/model
    state, payload dropped before any downstream exchange."""
    return ds.map_batches(
        ImageFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"target": target},
        concurrency=concurrency,
    )


class AudioFeatureExtractor:
    """Actor-pool ``map_batches`` stage for audio columns: decode
    (WAV/FLAC) → fixed window grid → per-window INTEGER abs-energy
    (``sum(|s|)``) — integers so the ``audio_features`` SQL oracle is
    hash-exact. Same actor shape as :class:`ImageFeatureExtractor`; a
    real fbank/wav2vec kernel drops into ``__call__`` with its model
    loaded here in ``__init__``."""

    def __init__(self, n_windows: int = 8):
        self.n_windows = n_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, wins, energies = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            samples, _ = decode_audio(payload)
            w = len(samples) // self.n_windows
            trimmed = samples[: w * self.n_windows].astype(np.int64)
            per_win = np.abs(trimmed).reshape(self.n_windows, w).sum(axis=1)
            ids.extend([mid] * self.n_windows)
            wins.extend(range(self.n_windows))
            energies.extend(int(x) for x in per_win)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(wins, pa.int32()),
                pa.array(energies, pa.int64()),
            ],
            names=["media_id", "win", "energy"],
        )


def audio_pipeline(ds, n_windows: int = 8, batch_size: int = 64, concurrency=(1, 4)):
    """Audio feature pipeline: actor pool for warm decoder state, small
    batches (binary payload rows), payload dropped at the stage output."""
    return ds.map_batches(
        AudioFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"n_windows": n_windows},
        concurrency=concurrency,
    )


class VideoFeatureExtractor:
    """Actor-pool ``map_batches`` stage for video columns: container
    decode (Y4M / uncompressed AVI via :mod:`.video`) → uniform frame
    sampling → per-sampled-frame INTEGER luma sum (exact-oracle-safe).
    A real CLIP/VideoMAE kernel drops into ``__call__`` with its model
    loaded in ``__init__``."""

    def __init__(self, n_frames: int = 3):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .video import decode_video

        ids, fnos, sums = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            frames, _ = decode_video(payload)
            n = len(frames)
            if n <= self.n_frames:
                idx = np.arange(n)
            else:
                idx = (np.arange(self.n_frames) * n) // self.n_frames
            for i in idx:
                ids.append(mid)
                fnos.append(int(i))
                sums.append(int(frames[i].astype(np.int64).sum()))
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(fnos, pa.int32()),
                pa.array(sums, pa.int64()),
            ],
            names=["media_id", "frame_no", "luma_sum"],
        )


def video_pipeline(ds, n_frames: int = 3, batch_size: int = 32, concurrency=(1, 4)):
    """Video feature pipeline: actor pool, SMALL batches (frames are the
    widest rows in the engine), payload dropped at the stage output."""
    return ds.map_batches(
        VideoFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"n_frames": n_frames},
        concurrency=concurrency,
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV (stdlib ``wave`` for PCM; from-scratch :mod:`.adpcm` for the
    IMA-ADPCM 0x0011 format tag, round 3) or FLAC (from-scratch
    :mod:`.flac`, round 3) → (mono int16 samples, sample_rate). 16-bit
    only; multi-channel audio is mean-downmixed (identical truncation
    semantics on all paths). MP3/AAC stay declared stubs (module doc)."""
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        chans, rate = decode_flac(payload)
        if chans.shape[1] > 1:
            return chans.mean(axis=1).astype(np.int16), rate
        return chans[:, 0].astype(np.int16), rate
    if payload[:4] == b"RIFF":
        from .adpcm import decode_ima_wav
        from .g711 import decode_g711_wav

        try:
            return decode_ima_wav(payload)
        except NotImplementedError:
            pass
        try:
            return decode_g711_wav(payload)
        except NotImplementedError:  # PCM or other tags → stdlib wave
            pass
    with wave.open(io.BytesIO(payload)) as wav:
        if wav.getsampwidth() != 2:
            raise NotImplementedError("16-bit PCM WAV only")
        rate = wav.getframerate()
        frames = wav.readframes(wav.getnframes())
        samples = np.frombuffer(frames, dtype="<i2")
        if wav.getnchannels() > 1:
            samples = (
                samples.reshape(-1, wav.getnchannels()).mean(axis=1).astype(np.int16)
            )
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Minimal mono 16-bit PCM WAV encoder for fixtures."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wav:
        wav.setnchannels(1)
        wav.setsampwidth(2)
        wav.setframerate(rate)
        wav.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def audio_frame_sample(payload: bytes, n_frames: int = 4, frame_ms: int = 100) -> list[bytes]:
    """Evenly spaced raw-PCM windows from a WAV payload — the frame-sample
    stage of an audio pipeline (each window is ``frame_ms`` of mono int16).
    MP3/AAC/video remain declared stubs (ffmpeg territory); they would run
    inside the same actor-pool stage shape."""
    samples, rate = decode_audio(payload)
    win = max(1, rate * frame_ms // 1000)
    if len(samples) == 0:
        return []
    starts = np.linspace(0, max(0, len(samples) - win), num=n_frames).astype(int)
    return [samples[s : s + win].tobytes() for s in starts]


def audio_features(payload: bytes, n_bins: int = 8) -> list[float]:
    """Tiny spectral-free audio feature vector: per-window RMS energy over
    ``n_bins`` equal slices of the clip (normalized) — deterministic, and
    the stage shape a real fbank/wav2vec kernel drops into."""
    samples, _ = decode_audio(payload)
    if len(samples) == 0:
        return [0.0] * n_bins
    parts = np.array_split(samples.astype(np.float64), n_bins)
    rms = np.array([np.sqrt((p**2).mean()) if len(p) else 0.0 for p in parts])
    total = rms.sum() or 1.0
    return (rms / total).tolist()


def media_content_hash(batch: pa.Table) -> pa.Table:
    """Exact-dup signature for media payloads (sha1) — dedup for binary
    columns reuses ops.dedup.exact_dedup on this column."""
    hashes = [
        hashlib.sha1(p or b"").hexdigest() for p in batch["payload"].to_pylist()
    ]
    return batch.append_column("content_hash", pa.array(hashes, pa.string()))


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather (floor mapping
    ``src = (dst * in) // out`` — the deterministic convention the
    ``media_resize`` SQL oracle restates in closed form). Works for any
    (H, W) or (H, W, C) uint8 array, up- or down-scaling."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[np.ix_(ys, xs)]


def downsample_box(img: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Integer box (area) downsample by (fy, fx): each output pixel is
    the floor-mean of its fy×fx block — pure integer arithmetic, so the
    oracle recomputes it exactly. Dimensions must divide."""
    h, w = img.shape[:2]
    if h % fy or w % fx:
        raise ValueError("box downsample requires exact integer factors")
    blocks = img.reshape(h // fy, fy, w // fx, fx, *img.shape[2:])
    return (blocks.astype(np.int64).sum(axis=(1, 3)) // (fy * fx)).astype(img.dtype)


class ImageResizer:
    """Actor-pool ``map_batches`` stage: decode → resize → emit the
    RESIZED PIXELS as rows (media_id, mode, y, x, v) — the thumbnail
    stage of a multimodal pipeline, exact-oracle-friendly. ``modes``
    maps a label to ('nearest', out_h, out_w) or ('box', fy, fx)."""

    def __init__(self, modes: dict | None = None):
        self.modes = modes or {
            "nearest8": ("nearest", 8, 8),
            "box2": ("box", 2, 2),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mlabels, ys, xs, vs = [], [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            img = decode_image(payload)
            if img.ndim == 3:  # decode_image contract is 2-D; keep the
                # module's documented integer-luma convention if that
                # ever changes
                r, g, b = (img[:, :, c].astype(np.uint32) for c in range(3))
                img = ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
            for label, spec in self.modes.items():
                if spec[0] == "nearest":
                    out = resize_nearest(img, spec[1], spec[2])
                else:
                    out = downsample_box(img, spec[1], spec[2])
                oh, ow = out.shape
                yy, xx = np.mgrid[0:oh, 0:ow]
                n = oh * ow
                ids.extend([mid] * n)
                mlabels.extend([label] * n)
                ys.extend(yy.ravel().tolist())
                xs.extend(xx.ravel().tolist())
                vs.extend(out.ravel().astype(int).tolist())
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(mlabels, pa.string()),
                pa.array(ys, pa.int32()),
                pa.array(xs, pa.int32()),
                pa.array(vs, pa.int32()),
            ],
            names=["media_id", "mode", "y", "x", "v"],
        )


def resize_pipeline(ds, modes: dict | None = None, batch_size: int = 32,
                    concurrency=(1, 4)):
    """Thumbnail/resize pipeline: actor pool, small batches (binary
    payload rows), payload dropped at the stage output."""
    return ds.map_batches(
        ImageResizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"modes": modes},
        concurrency=concurrency,
    )


class AudioFingerprinter:
    """Actor-pool ``map_batches`` stage: decode (warm codec state) →
    energy-delta sign fingerprint. The Shazam/Chromaprint family's
    integer core: split the signal into ``n_windows`` equal windows,
    take per-window abs-energy, set bit ``w-1`` iff
    ``energy(w) > energy(w-1)`` — amplitude-scale-robust, byte-exact,
    and (for lossless inputs) restatable in closed-form SQL."""

    def __init__(self, n_windows: int = 32):
        self.n_windows = n_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            samples, _ = decode_audio(bytes(payload))
            n = len(samples) // self.n_windows
            if n == 0:
                ids.append(mid)
                fps.append(0)
                continue
            w = (
                np.abs(samples[: n * self.n_windows].astype(np.int64))
                .reshape(self.n_windows, n)
                .sum(axis=1)
            )
            bits = (w[1:] > w[:-1]).astype(np.uint64)
            fp = int((bits << np.arange(self.n_windows - 1, dtype=np.uint64)).sum())
            ids.append(mid)
            fps.append(fp)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(fps, pa.int64())],
            names=["media_id", "fingerprint"],
        )


def audio_fingerprint_dedup(
    ds, n_windows: int = 32, batch_size: int = 64, concurrency=(1, 4)
):
    """Perceptual audio dedup — the audio twin of image dHash
    (ops/phash.py): fingerprint in the decode actor pool (payloads never
    shuffle), then ONE groupby over (fingerprint, id) rows; each group's
    min id is the cluster representative. → ``(media_id, fingerprint,
    rep_id, cluster_size)``."""
    from .segments import sorted_segment_apply

    fps = ds.map_batches(
        AudioFingerprinter,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"n_windows": n_windows},
        concurrency=concurrency,
    )

    def annotate(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        names = ["media_id", "fingerprint", "rep_id", "cluster_size"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4, names=names
            )
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        fp = batch["fingerprint"].to_numpy(zero_copy_only=False)
        lens = (ends - starts).astype(np.int64)
        # rows belonging to COMPLETE segments only (coverage-diff mask)
        n = batch.num_rows
        cover = np.zeros(n + 1, np.int64)
        np.add.at(cover, starts, 1)
        np.add.at(cover, ends, -1)
        idx = np.flatnonzero(np.cumsum(cover[:-1]) > 0)
        reps = np.repeat(ids[starts], lens)  # within-sorted by id: head=min
        sizes = np.repeat(lens, lens)
        return pa.Table.from_arrays(
            [
                pa.array(ids[idx]),
                pa.array(fp[idx]),
                pa.array(reps),
                pa.array(sizes),
            ],
            names=names,
        )

    return sorted_segment_apply(
        fps, key_col="fingerprint", block_fn=annotate, within_cols=["media_id"]
    )


class SceneCutDetector:
    """Actor-pool ``map_batches`` stage for shot-boundary detection —
    the standard first pass of any video curation pipeline (dedup by
    shot, thumbnail pick, scene-level captioning). Per consecutive
    frame pair it computes the INTEGER sum of absolute luma differences
    (SAD) and flags a cut when the mean per-pixel difference exceeds
    ``threshold`` luma units: ``sad > threshold * n_pixels`` compared
    in exact int64 on both engines — no float thresholds, so the
    closed-form fixture oracle is bit-exact. A real histogram/SSIM
    detector drops into ``__call__`` with its state in ``__init__``."""

    def __init__(self, threshold: int = 8):
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .video import decode_video

        ids, fnos, sads, cuts = [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            frames, _ = decode_video(payload)
            for t in range(1, len(frames)):
                a = frames[t - 1].astype(np.int64)
                b = frames[t].astype(np.int64)
                sad = int(np.abs(a - b).sum())
                ids.append(mid)
                fnos.append(t)
                sads.append(sad)
                cuts.append(sad > self.threshold * a.size)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(fnos, pa.int32()),
                pa.array(sads, pa.int64()),
                pa.array(cuts, pa.bool_()),
            ],
            names=["media_id", "frame_no", "sad", "is_cut"],
        )


def scene_cut_pipeline(ds, threshold: int = 8, batch_size: int = 32,
                       concurrency=(1, 4)):
    """Shot-boundary pipeline: actor pool, small batches (frame pairs
    are the widest transient state), payload dropped at the output."""
    return ds.map_batches(
        SceneCutDetector,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"threshold": threshold},
        concurrency=concurrency,
    )


class SpectralProbeExtractor:
    """Actor-pool ``map_batches`` stage computing an EXACT spectral
    probe bank per audio window: the DFT energies at the three bins
    whose basis functions are integer-valued — DC (k=0), the quarter
    band (k=N/4, cos/sin ∈ {−1,0,1}) and Nyquist (k=N/2, (−1)^n) —
    the integer skeleton of a Goertzel/DTMF detector. Everything stays
    int64 (sums of int16 windows, then squares), so the closed-form
    fixture oracle is bit-exact — no FFT float drift. A real Goertzel
    bank at arbitrary bins drops into ``__call__``; its coefficient
    table belongs in ``__init__``.

    Output: one row per (media_id, win) with ``e_dc = (Σx)²``,
    ``e_q = (Σ x·cos(πn/2))² + (Σ x·sin(πn/2))²``, ``e_ny =
    (Σ (−1)ⁿ x)²`` — phase restarts at each window start."""

    def __init__(self, window: int = 128, n_windows: int = 8):
        self.window = int(window)
        self.n_windows = int(n_windows)
        n = self.window
        base = np.arange(n)
        self._sign_ny = np.where(base % 2 == 0, 1, -1).astype(np.int64)
        self._cos_q = np.select(
            [base % 4 == 0, base % 4 == 2], [1, -1], 0
        ).astype(np.int64)
        self._sin_q = np.select(
            [base % 4 == 1, base % 4 == 3], [1, -1], 0
        ).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, wins, e_dc, e_q, e_ny = [], [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            samples, _ = decode_audio(payload)
            x = samples.astype(np.int64)
            for w in range(self.n_windows):
                seg = x[w * self.window : (w + 1) * self.window]
                if len(seg) == 0:
                    break
                sl = slice(0, len(seg))
                s0 = int(seg.sum())
                c4 = int((seg * self._cos_q[sl]).sum())
                s4 = int((seg * self._sin_q[sl]).sum())
                ny = int((seg * self._sign_ny[sl]).sum())
                ids.append(mid)
                wins.append(w)
                e_dc.append(s0 * s0)
                e_q.append(c4 * c4 + s4 * s4)
                e_ny.append(ny * ny)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(wins, pa.int32()),
                pa.array(e_dc, pa.int64()),
                pa.array(e_q, pa.int64()),
                pa.array(e_ny, pa.int64()),
            ],
            names=["media_id", "win", "e_dc", "e_q", "e_ny"],
        )


def spectral_pipeline(ds, window: int = 128, n_windows: int = 8,
                      batch_size: int = 64, concurrency=(1, 4)):
    """Spectral-probe pipeline: actor pool with the coefficient table
    built once per actor; payload dropped at the stage output."""
    return ds.map_batches(
        SpectralProbeExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={"window": window, "n_windows": n_windows},
        concurrency=concurrency,
    )
