"""Integer-exact distributed k-means over an embedding column.

SemDeDup-style semantic clustering (Abbas et al. 2023 cluster documents
by embedding before near-dup pruning) needs k-means as a first-class
pipeline stage. The float version already exists for IVF
(:func:`.ann.build_ivf_centroids_distributed`); this variant makes every
arithmetic step exact integer math so a DuckDB oracle can replay the whole
algorithm bit-for-bit (the same verification strategy as the engine's
fixed-point PageRank and integer HITS):

- Vectors are quantized once: ``floor((float64(e) + OFFSET) * SCALE)`` per
  element. The constant offset keeps every coordinate positive, so later
  floor divisions agree between numpy (floors) and DuckDB (truncates).
- Init = the ``k`` vectors with the lowest ids (found by per-block
  bottom-k partials — no global sort).
- Each Lloyd iteration is ONE pass: per batch, assign to the nearest
  centroid by integer squared L2 (ties → lowest centroid id) and emit
  per-(centroid, dim) int64 partial sums + counts — a fixed
  ``k × dim``-row table per batch regardless of corpus size — folded by a
  Sum aggregate; new centroid coordinate = ``sum // count`` (exact floor;
  empty clusters keep their previous centroid).
- Final pass re-assigns and aggregates per-cluster count, min id, and an
  integer distance checksum (``dist // SCALE`` summed — bounded away from
  int64 overflow at corpus scale).

At 10^12 rows the per-iteration exchange stays ``k × dim`` rows per block;
the only corpus-sized work is the streaming batch passes.

No counterpart in the reference repo; part of the engine's training-data
curation surface (dedup/ANN/embeddings, ``ops/dedup.py`` `ops/ann.py`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 1_000_000
OFFSET = 2.0


def _quantize(batch: pa.Table, vec_col: str) -> np.ndarray:
    """Zero-copy FixedSizeList/list decode → int64 quantized matrix."""
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten()
    vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
    mat = vals.reshape(n, -1)
    return np.floor((mat + OFFSET) * SCALE).astype(np.int64)


def _bottom_k_rows(ds, k: int, vec_col: str, id_col: str):
    """(ids, vectors) of the k lowest ids: per-block bottom-k partials,
    then a driver merge over ≤ k·num_blocks rows."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return batch
        keep = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(np.sort(keep)))

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    rows = rows[:k]
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    vecs = np.floor(
        (np.array([r[vec_col] for r in rows], dtype=np.float64) + OFFSET) * SCALE
    ).astype(np.int64)
    return ids, vecs


def _assign(mat: np.ndarray, centroids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nearest centroid by integer squared L2; ties → lowest centroid id.
    Returns (assignment, distance) with exact int64 distances."""
    # (n, k) distance table: loop over k (small) to stay in int64 — a
    # matmul would go through float64 and lose exactness.
    n = mat.shape[0]
    dists = np.empty((n, len(centroids)), dtype=np.int64)
    for c in range(len(centroids)):
        diff = mat - centroids[c]
        dists[:, c] = np.einsum("ij,ij->i", diff, diff)
    assign = dists.argmin(axis=1)  # argmin takes the FIRST minimum: lowest cid
    return assign, dists[np.arange(n), assign]


def kmeans_clusters(
    ds,
    k: int = 5,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Run ``iters`` exact-integer Lloyd iterations; return one row per
    cluster: ``(cluster_id, n_members, min_vec_id, checksum)`` where
    checksum is ``sum(dist // SCALE)`` over members under the final
    assignment."""
    import ray
    from ray.data.aggregate import Min, Sum

    _, centroids = _bottom_k_rows(ds, k, vec_col, id_col)
    if len(centroids) == 0:
        raise ValueError("kmeans_clusters: empty dataset")
    k = len(centroids)
    dim = centroids.shape[1]

    for _ in range(iters):
        cref = ray.put(centroids)

        def partials(batch: pa.Table) -> pa.Table:
            cen = ray.get(cref)
            if batch.num_rows == 0:
                return pa.Table.from_arrays(
                    [pa.array([], pa.int64())] * 4,
                    names=["cid", "dim", "s", "n"],
                )
            mat = _quantize(batch, vec_col)
            assign, _d = _assign(mat, cen)
            sums = np.zeros((len(cen), mat.shape[1]), dtype=np.int64)
            counts = np.zeros(len(cen), dtype=np.int64)
            np.add.at(sums, assign, mat)
            np.add.at(counts, assign, 1)
            cid = np.repeat(np.arange(len(cen), dtype=np.int64), mat.shape[1])
            d = np.tile(np.arange(mat.shape[1], dtype=np.int64), len(cen))
            return pa.Table.from_arrays(
                [
                    pa.array(cid),
                    pa.array(d),
                    pa.array(sums.ravel()),
                    pa.array(np.repeat(counts, mat.shape[1])),
                ],
                names=["cid", "dim", "s", "n"],
            )

        agg = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby(["cid", "dim"])
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .to_pandas()
            .sort_values(["cid", "dim"])
        )
        sums = agg["s"].to_numpy().reshape(k, dim).astype(np.int64)
        counts = agg["n"].to_numpy().reshape(k, dim)[:, 0].astype(np.int64)
        mask = counts > 0
        new_c = centroids.copy()
        new_c[mask] = sums[mask] // counts[mask, None]
        centroids = new_c

    cref = ray.put(centroids)

    def final(batch: pa.Table) -> pa.Table:
        cen = ray.get(cref)
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4,
                names=["cluster_id", "one", id_col, "chk"],
            )
        mat = _quantize(batch, vec_col)
        assign, dist = _assign(mat, cen)
        return pa.Table.from_arrays(
            [
                pa.array(assign.astype(np.int64)),
                pa.array(np.ones(len(assign), dtype=np.int64)),
                pa.array(batch[id_col].to_numpy(zero_copy_only=False)),
                pa.array(dist // SCALE),
            ],
            names=["cluster_id", "one", id_col, "chk"],
        )

    out = (
        ds.map_batches(final, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(
            Sum("one", alias_name="n_members"),
            Min(id_col, alias_name="min_vec_id"),
            Sum("chk", alias_name="checksum"),
        )
        .sort("cluster_id")
    )
    df = out.to_pandas()[["cluster_id", "n_members", "min_vec_id", "checksum"]]
    return pa.Table.from_pandas(df, preserve_index=False)
