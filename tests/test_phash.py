"""dHash perceptual dedup: known-bit hashes, retouch invariance outside
the sample grid, RGB luma path, cluster aggregation."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_extractor_ray.ops.multimodal import encode_bmp, encode_png
from pdf_extractor_ray.ops.phash import DHasher, dhash64, dhash_clusters


def test_dhash_known_bits():
    # Strictly increasing rows: every left pixel < right pixel → all bits 0.
    img = np.tile(np.arange(16, dtype=np.uint8), (16, 1))
    assert dhash64(img) == "0" * 16
    # Strictly decreasing: all bits 1.
    assert dhash64(img[:, ::-1].copy()) == "f" * 16


def test_dhash_retouch_outside_grid_is_invisible():
    rng = np.random.Generator(np.random.Philox(3))
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    # (y=1, x=2) is sampled by neither ys = 2*dy nor xs = 16*dx // 9.
    retouched = img.copy()
    retouched[1, 2] = (int(retouched[1, 2]) + 1) % 256
    assert dhash64(img) == dhash64(retouched)
    # A change ON the grid flips at least one bit for this fixture.
    on_grid = img.copy()
    on_grid[0, 0] = 255 if img[0, 0] < 128 else 0
    assert dhash64(img) != dhash64(on_grid)


def test_dhasher_bmp_matches_png():
    gray = np.tile(np.arange(16, dtype=np.uint8), (16, 1))
    # BMP stores B=G=R=gray; its decoder's luma of (v,v,v) is exactly v,
    # so both formats hash identically.
    tbl = pa.Table.from_arrays(
        [
            pa.array([1, 2], pa.int64()),
            pa.array([encode_png(gray), encode_bmp(gray)], pa.binary()),
        ],
        names=["doc_id", "payload"],
    )
    out = DHasher()(tbl)
    assert out["dhash"][0].as_py() == out["dhash"][1].as_py()


def test_dhash_clusters_collapse_and_count(ray_session):
    base = np.tile(np.arange(16, dtype=np.uint8), (16, 1))
    variant = base.copy()
    variant[1, 2] = 200  # off-grid: same hash, different bytes
    other = base[:, ::-1].copy()  # different hash
    rows = [
        (0, encode_png(base)),
        (1, encode_png(variant)),
        (2, encode_png(base)),  # byte-identical to doc 0
        (3, encode_png(other)),
    ]
    tbl = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.int64()),
            pa.array([r[1] for r in rows], pa.binary()),
        ],
        names=["doc_id", "payload"],
    )
    out = dhash_clusters(ray.data.from_arrow(tbl)).to_pandas()
    out = out.sort_values("min_doc_id").reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[0, "n_docs"] == 3
    assert out.loc[0, "min_doc_id"] == 0
    assert out.loc[0, "n_distinct_payloads"] == 2
    assert out.loc[1, "n_docs"] == 1
    assert out.loc[1, "min_doc_id"] == 3
