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


def _fit_centroids(
    ds, k: int, iters: int, vec_col: str, id_col: str
) -> np.ndarray:
    """The exact-integer Lloyd loop shared by :func:`kmeans_clusters` and
    :func:`semdedup`: init = k lowest-id vectors, then ``iters`` one-pass
    iterations of per-block (centroid, dim) int64 partial sums folded by
    a Sum aggregate. Returns the final ``k × dim`` int64 centroid
    matrix (quantized space)."""
    import ray
    from ray.data.aggregate import Sum

    _, centroids = _bottom_k_rows(ds, k, vec_col, id_col)
    if len(centroids) == 0:
        raise ValueError("kmeans: empty dataset")
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
    return centroids


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

    centroids = _fit_centroids(ds, k, iters, vec_col, id_col)
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


def semdedup(
    ds,
    k: int = 5,
    iters: int = 3,
    threshold_num: int = 999,
    threshold_den: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pruning by
    k-means clustering first, pairwise cosine only WITHIN each cluster
    (the approximation that makes the paper tractable at corpus scale —
    cross-cluster near-dups are out of contract by design).

    Determinism/exactness: cluster assignment is the engine's
    integer-exact Lloyd (:func:`_fit_centroids` / :func:`_assign`, the
    ``kmeans_clusters`` oracle machinery). The cosine test runs over
    SIGNED quantized vectors ``floor(e * SCALE)`` and is decided as an
    exact integer inequality — ``dot >= 0 AND dot² · den² >= num² ·
    |a|²·|b|²`` with Python big ints — so the SQL oracle (HUGEINT
    arithmetic) reproduces every pair decision bit-for-bit. A float
    matmul pre-filters candidates at ``τ − 1e-4`` (the float error bound
    is ~1e-9 relative, so nothing below the band can pass the exact
    test); only candidates pay big-int verification.

    Within a cluster, duplicates group by connected components over the
    above-threshold pairs; the representative is the lowest id (the
    house dedup rule — the paper keeps the lowest-centroid-distance
    member; min-id keeps the oracle a pure min-label reachability).

    Returns a Dataset of ``(id, cluster_id, rep_id, is_duplicate)``.

    Scale: the per-cluster kernel is O(|cluster|²) in FLOAT matmul (the
    paper's own regime — it runs the same pairwise pass per cluster);
    choose ``k`` so corpus/k fits a worker (SemDeDup uses k ≈ 11k for
    LAION). Beyond that, the documented sub-shape is the embedding-LSH
    bucketer (:func:`.dedup.embedding_dedup`) WITHIN each cluster."""
    import ray

    centroids = _fit_centroids(ds, k, iters, vec_col, id_col)
    cref = ray.put(centroids)

    def with_cluster(batch: pa.Table) -> pa.Table:
        cen = ray.get(cref)
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.list_(pa.float64())),
                ],
                names=[id_col, "cluster_id", "qvec"],
            )
        mat = _quantize(batch, vec_col)
        assign, _d = _assign(mat, cen)
        # signed quantization for the cosine space (no OFFSET shift —
        # cosine is not translation-invariant)
        col = batch[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(flat * SCALE).reshape(batch.num_rows, -1)
        return pa.Table.from_arrays(
            [
                pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False), pa.int64()
                ),
                pa.array(assign.astype(np.int64)),
                pa.array(list(q), pa.list_(pa.float64())),
            ],
            names=[id_col, "cluster_id", "qvec"],
        )

    num2 = threshold_num * threshold_num
    den2 = threshold_den * threshold_den
    tau_f = threshold_num / threshold_den

    def cluster_kernel(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        cid = group["cluster_id"][0].as_py()
        n = len(ids)
        order = np.argsort(ids)
        ids = ids[order]
        q = np.asarray(group["qvec"].to_pylist(), dtype=np.float64)[order]
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        if n > 1:
            norm = np.linalg.norm(q, axis=1)
            norm[norm == 0] = 1.0
            cos = (q @ q.T) / norm[:, None] / norm[None, :]
            ii, jj = np.nonzero(np.triu(cos >= tau_f - 1e-4, 1))
            qi = q.astype(np.int64)
            for a, b in zip(ii.tolist(), jj.tolist()):
                dot = int(np.dot(qi[a], qi[b]))
                if dot < 0:
                    continue
                na2 = int(np.dot(qi[a], qi[a]))
                nb2 = int(np.dot(qi[b], qi[b]))
                # zero-norm quantized vectors have no cosine: never dups
                if na2 == 0 or nb2 == 0:
                    continue
                if dot * dot * den2 >= num2 * na2 * nb2:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        reps = np.array([ids[find(i)] for i in range(n)], dtype=np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(np.full(n, cid, dtype=np.int64)),
                pa.array(reps),
                pa.array(reps != ids),
            ],
            names=[id_col, "cluster_id", "rep_id", "is_duplicate"],
        )

    return (
        ds.map_batches(with_cluster, batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(cluster_kernel, batch_format="pyarrow")
    )


def prototype_prune(
    ds,
    k: int = 5,
    iters: int = 3,
    keep_num: int = 1,
    keep_den: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """SSL-prototype pruning (Sorscher et al. 2022 "Beyond neural scaling
    laws"; the diversification step of D4, Tirumala et al. 2023): cluster
    by k-means, then within each cluster KEEP the ``keep_num/keep_den``
    fraction FARTHEST from the centroid — prototypical (easy, redundant)
    points are dropped, diverse points survive.

    Exactness: assignment and distances are the engine's integer-exact
    Lloyd (:func:`_fit_centroids` / :func:`_assign`), so the within-
    cluster ordering ``(dist DESC, id ASC)`` and the integer keep count
    ``ceil(n_cluster · keep_num / keep_den)`` are replayed bit-for-bit
    by the DuckDB oracle.

    Shape: fitting exchanges ``k × dim`` partial rows per block; the
    ranking is ONE (cluster_id, dist, id) sort over 24-byte rows followed
    by vectorized segment arithmetic (:func:`..segments.sorted_segment_apply`
    — no per-group Python, fragments of clusters straddling block edges
    are deferred and resolved exactly once). Nothing corpus-sized lands
    on the driver at any point.

    Returns a Dataset of ``(id, cluster_id, dist, rank, kept)``.
    """
    import ray

    from .segments import sorted_segment_apply

    centroids = _fit_centroids(ds, k, iters, vec_col, id_col)
    cref = ray.put(centroids)

    def with_dist(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 3,
                names=[id_col, "cluster_id", "dist"],
            )
        mat = _quantize(batch, vec_col)
        assign, dist = _assign(mat, ray.get(cref))
        return pa.Table.from_arrays(
            [
                pa.array(batch[id_col].to_numpy(zero_copy_only=False), pa.int64()),
                pa.array(assign.astype(np.int64)),
                pa.array(dist),
            ],
            names=[id_col, "cluster_id", "dist"],
        )

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        starts = starts.astype(np.int64)
        ends = ends.astype(np.int64)
        lens = ends - starts
        total = int(lens.sum())
        gstarts = np.cumsum(lens) - lens
        within = np.arange(total, dtype=np.int64) - np.repeat(gstarts, lens)
        idx = np.repeat(starts, lens) + within
        take = pa.array(idx)
        rank = within + 1
        n_keep = np.repeat((lens * keep_num + keep_den - 1) // keep_den, lens)
        return pa.Table.from_arrays(
            [
                batch[id_col].take(take),
                batch["cluster_id"].take(take),
                batch["dist"].take(take),
                pa.array(rank),
                pa.array(rank <= n_keep),
            ],
            names=[id_col, "cluster_id", "dist", "rank", "kept"],
        )

    assigned = ds.map_batches(with_dist, batch_format="pyarrow")
    return sorted_segment_apply(
        assigned,
        key_col="cluster_id",
        block_fn=kernel,
        within_cols=["dist", id_col],
        descending=[True, False],
    )


def kcenter_coreset(ds, k: int = 4, vec_col: str = "embedding",
                    id_col: str = "vec_id"):
    """Greedy k-center / farthest-point coreset selection (Gonzalez
    1985) — the diversity-maximizing subset rule used for
    coreset-based training-data selection: start from the lowest-id
    vector, then ``k−1`` times add the point FARTHEST from the chosen
    set (its min distance to any chosen center), a 2-approximation of
    the optimal k-center cover.

    All arithmetic on the module's exact integer quantization grid
    (same ``floor((e+OFFSET)·SCALE)`` as k-means), so selection —
    including ties, broken by lowest id — is bit-exact against the
    unrolled SQL oracle. Shape: the carried per-point min-distance
    column updates in ONE shuffle-free map pass per round (only the
    NEWEST center ships, via ``ray.put``); the next center reduces
    from per-block ``(max dist, min id, vector)`` partials — O(blocks)
    driver rows per round, k passes total, zero exchanges. The carried
    dataset severs its plan per round (:func:`.segments.sever_lineage`).
    Returns a pandas DataFrame ``(sel_order, vec_id, dist)`` where
    ``dist`` is the integer squared distance from the previously
    selected set at selection time (0 for the seed) — the coverage
    radius sequence.
    """
    import ray

    from .segments import sever_lineage

    IMAX = np.iinfo(np.int64).max

    def init(batch: pa.Table) -> pa.Table:
        mat = _quantize(batch, vec_col)
        n = len(mat)
        return pa.Table.from_arrays(
            [batch[id_col].combine_chunks().cast(pa.int64()),
             pa.array(list(mat), pa.list_(pa.int64())),
             pa.array(np.full(n, IMAX, np.int64))],
            names=["id", "v", "mind"],
        )

    state = ds.map_batches(init, batch_format="pyarrow").materialize()

    def seed_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()),
                 pa.array([], pa.list_(pa.int64()))],
                names=["id", "v"])
        ids = t["id"].to_numpy(zero_copy_only=False)
        i = int(np.argmin(ids))
        return t.select(["id", "v"]).slice(i, 1)

    best_id, best_vec = None, None
    for r in state.map_batches(
        seed_partial, batch_size=None, batch_format="pyarrow"
    ).take_all():
        if best_id is None or r["id"] < best_id:
            best_id, best_vec = r["id"], np.asarray(r["v"], np.int64)
    if best_id is None:
        import pandas as pd
        return pd.DataFrame({"sel_order": [], "vec_id": [], "dist": []})

    chosen = [(0, int(best_id), 0)]
    for sel in range(1, k):
        cref = ray.put(best_vec)

        def update(t: pa.Table, cref=cref) -> pa.Table:
            if t.num_rows == 0:
                return t
            c = ray.get(cref)
            vs = t["v"].combine_chunks()
            flat = vs.flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(t.num_rows, -1)
            diff = mat - c[None, :]
            d = np.einsum("ij,ij->i", diff, diff)
            mind = np.minimum(
                t["mind"].to_numpy(zero_copy_only=False), d)
            return pa.Table.from_arrays(
                [t["id"].combine_chunks(), vs, pa.array(mind)],
                names=["id", "v", "mind"],
            )

        state = sever_lineage(
            state.map_batches(update, batch_format="pyarrow"))

        def far_partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.Table.from_arrays(
                    [pa.array([], pa.int64()), pa.array([], pa.int64()),
                     pa.array([], pa.list_(pa.int64()))],
                    names=["d", "id", "v"])
            d = t["mind"].to_numpy(zero_copy_only=False)
            ids = t["id"].to_numpy(zero_copy_only=False)
            dm = int(d.max())
            at = np.flatnonzero(d == dm)
            i = int(at[np.argmin(ids[at])])
            return pa.Table.from_arrays(
                [pa.array([dm], pa.int64()),
                 pa.array([int(ids[i])], pa.int64()),
                 t["v"].combine_chunks().slice(i, 1)],
                names=["d", "id", "v"])

        best = None
        for r in state.map_batches(
            far_partial, batch_size=None, batch_format="pyarrow"
        ).take_all():
            key = (-r["d"], r["id"])
            if best is None or key < best[0]:
                best = (key, r)
        best_id = best[1]["id"]
        best_vec = np.asarray(best[1]["v"], np.int64)
        chosen.append((sel, int(best_id), int(best[1]["d"])))

    import pandas as pd
    return pd.DataFrame(
        {"sel_order": [c[0] for c in chosen],
         "vec_id": [c[1] for c in chosen],
         "dist": [c[2] for c in chosen]})
