"""Perceptual image dedup via difference hash (dHash).

Byte-level dedup misses re-encoded or slightly-retouched images; the
standard crawl-pipeline answer is a perceptual hash. This op implements
the *difference hash* (Krawetz's dHash, the integer-exact member of the
aHash/dHash/pHash family): nearest-neighbor downsample to 8×9 grayscale
(floor mapping ``src = dst * in // out``, the same kernel as
``multimodal.resize_nearest``), then one bit per horizontal neighbor pair
— 64 bits total. Every step is integer arithmetic on decoded pixels, so a
SQL oracle can restate the hash bit-for-bit from a closed-form fixture,
unlike the float-DCT pHash.

Distributed shape: decode + hash run in an actor-pool ``map_batches``
(codec state in ``__init__``); the exchanges that follow only carry
``(hash, payload_sha, doc_id)`` tuples — 3 small columns, never pixels —
through one groupby to collapse byte-identical payloads and one groupby
over the 64-bit hash to form perceptual clusters. Near-dup robustness is
the hash's own: pixels outside the sample grid don't affect it, so
retouched variants collapse into one cluster while the byte-level
distinct count stays visible per cluster.

No counterpart in the reference repo; joins the multimodal tier
(``ops/multimodal.py``) and the dedup family (``ops/dedup.py``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DHASH_H, DHASH_W = 8, 9


def dhash64(img: np.ndarray) -> str:
    """64-bit difference hash of a grayscale image as a 16-hex-char
    string (big-endian bit order: bit k = row k//8, column pair k%8)."""
    h, w = img.shape
    ys = (np.arange(DHASH_H) * h) // DHASH_H
    xs = (np.arange(DHASH_W) * w) // DHASH_W
    grid = img[np.ix_(ys, xs)].astype(np.int64)
    bits = (grid[:, : DHASH_W - 1] > grid[:, 1:]).astype(np.uint8)
    return bytes(np.packbits(bits.ravel())).hex()


class DHasher:
    """Actor-pool stage: decode each payload once, emit
    ``(doc_id, dhash, payload_sha)``. Decoder dispatch is per-payload
    magic sniffing (``multimodal.decode_image``)."""

    def __init__(self) -> None:
        from .multimodal import decode_image

        self._decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        hashes = []
        shas = []
        for p in payloads:
            # decode_image dispatches on magic and always yields (H, W)
            # grayscale (RGB sources are luma-folded by their decoders).
            img = self._decode(p)
            hashes.append(dhash64(img))
            shas.append(hashlib.sha1(p).hexdigest())
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(hashes, pa.string()),
                pa.array(shas, pa.string()),
            ],
            names=["doc_id", "dhash", "payload_sha"],
        )


def dhash_clusters(ds, batch_size: int = 64, concurrency=(1, 4)):
    """Perceptual clusters over an image Dataset with columns
    ``(doc_id, payload)``: one row per distinct dHash with member count,
    representative (min) doc id, and the number of byte-distinct payloads
    the cluster collapsed."""
    from ray.data.aggregate import Count, Min, Sum

    hashed = ds.map_batches(
        DHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    # Collapse byte-identical payloads first: (dhash, sha) pairs with
    # their doc counts/min ids — the pair table is ≤ corpus-sized and
    # shrinks to the distinct-payload minority immediately.
    pairs = (
        hashed.groupby(["dhash", "payload_sha"])
        .aggregate(
            Count(alias_name="n_docs"),
            Min("doc_id", alias_name="min_doc_id"),
        )
        .map_batches(
            lambda b: b.append_column(
                "one", pa.array(np.ones(b.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
    )
    out = (
        pairs.groupby("dhash")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("min_doc_id", alias_name="min_doc_id"),
            Sum("one", alias_name="n_distinct_payloads"),
        )
        .sort("dhash")
    )
    return out
