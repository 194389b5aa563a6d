"""Multimodal (image/audio/video) column plumbing.

Binary media ride as opaque ``binary`` columns with typed metadata, exactly
like the PDF payloads in the main pipeline. The Ray-side plumbing — schema,
actor-pool stage shape, batch sizing for wide binary rows, output layout —
is real and tested; only the decode kernels are stubbed (this container has
no image/audio libraries) behind ``NotImplementedError`` or a clearly
marked deterministic fake.

Media payload convention for the deterministic fake codec:
``b"IMGv1" + width:uint16 + height:uint16 + channel bytes`` — enough to
exercise resize/feature plumbing end-to-end without a real codec.
"""

from __future__ import annotations

import hashlib
import struct

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


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W) array.

    Real codecs (JPEG/PNG via Pillow or turbojpeg) are NOT available in this
    container — only the deterministic fake format decodes; anything else
    raises ``NotImplementedError`` (STUB, by design)."""
    if payload[:5] == FAKE_MAGIC:
        width, height = struct.unpack("<HH", payload[5:9])
        return np.frombuffer(payload[9 : 9 + width * height], dtype=np.uint8).reshape(
            height, width
        )
    raise NotImplementedError(
        "real image codecs unavailable in this environment (STUB); "
        "swap decode_image for a Pillow/turbojpeg kernel in production"
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
            except NotImplementedError as exc:
                feats.append(None)
                thumbs.append(None)
                errors.append(str(exc)[:120])
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


def audio_frame_sample(payload: bytes, n_frames: int = 4) -> list[bytes]:
    """STUB: audio/video frame sampling needs ffmpeg — unavailable here."""
    raise NotImplementedError(
        "audio/video decoding unavailable in this environment (STUB); "
        "production kernel: ffmpeg frame extraction inside the same "
        "actor-pool stage shape as ImageFeatureExtractor"
    )


def media_content_hash(batch: pa.Table) -> pa.Table:
    """Exact-dup signature for media payloads (sha1) — dedup for binary
    columns reuses ops.dedup.exact_dedup on this column."""
    hashes = [
        hashlib.sha1(p or b"").hexdigest() for p in batch["payload"].to_pylist()
    ]
    return batch.append_column("content_hash", pa.array(hashes, pa.string()))
