"""Bitext mining: mutual-nearest-neighbor pairs between two embedding
sets — the standard criterion for aligning parallel documents across
languages (WikiMatrix/CCMatrix mine candidate translation pairs as
cross-lingual embedding neighbors; mutual top-1 is the deterministic,
margin-free member of that family).

Exchange shape (one scan of the big side):

- side B (the smaller language) is collected once under a size gate and
  broadcast via ``ray.put`` as a normalized float64 matrix — the same
  broadcast-the-small-side shape as :func:`..ops.ann.brute_force_topk`.
- ONE ``map_batches`` pass over side A computes the batch × |B| cosine
  matrix and emits BOTH reductions from the same matmul: each A row's
  best B (final — one row per A), and the batch-local best A per B
  column (a partial, |B| rows per batch). The emitted stream is 4
  narrow columns (ids + rounded score), materialized once so the two
  downstream consumers don't re-run the matmul; the corpus-sized text /
  vector columns never reappear after this stage.
- the B partials reduce to the global best-A-per-B with one
  ``sorted_segment_apply`` argmax (|B|-keyed exchange over
  batches × |B| partial rows, never corpus-sized).
- mutual filter: the |B|-sized best-A table broadcasts back as two
  sorted numpy arrays and a vectorized ``searchsorted`` membership test
  keeps A rows where ``best_a[best_b(a)] == a``.

Scores are rounded BEFORE every comparison (``round_decimals``) and ties
break to the smallest id on both sides, so rankings are reproducible
across engines with different float-summation order (the SQL oracle
replays the same rounding; see ``queries.py::q_bitext_pairs``).

Scale assumption (documented, gated): |B| must fit the broadcast gate —
true for the minority-language side of real bitext mining. For
large × large mining use :func:`mutual_nn_bucketed`: both sides stream
through one shared-centroid assignment pass and each IVF bucket mines
its own mutual pairs (same rounding/tie rules; within-bucket contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _decode_vectors, _normalize


def mutual_nn_pairs(
    ds_a,
    ds_b,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
    b_broadcast_cap: int = 2_000_000,
):
    """Exact mutual-top-1 cosine pairs between two embedding datasets.

    Returns a Dataset of ``(src_id, dst_id)`` — src from ``ds_a``, dst
    from ``ds_b`` — containing exactly the pairs where each side is the
    other's best match (rounded score, smallest-id tiebreak). Raises if
    side B exceeds ``b_broadcast_cap`` rows (see module docstring for
    the bucketed large × large regime).
    """
    import ray

    from .segments import sorted_segment_apply

    refs = ds_b.select_columns([id_col, vec_col]).to_arrow_refs()
    tables = [ray.get(r) for r in refs]
    nonempty = [t for t in tables if t.num_rows] or tables[:1]
    b_tbl = pa.concat_tables(nonempty, promote_options="permissive")
    if b_tbl.num_rows > b_broadcast_cap:
        raise RuntimeError(
            f"side B has {b_tbl.num_rows} rows > b_broadcast_cap="
            f"{b_broadcast_cap}; use mutual_nn_bucketed (IVF-bucketed "
            "large × large regime)"
        )
    b_ids = b_tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(b_ids, kind="stable")  # ascending ids → argmax tiebreak
    b_ids = b_ids[order]
    b_mat = _normalize(_decode_vectors(b_tbl, vec_col))[order]
    bref = ray.put((b_ids, b_mat))

    empty = pa.Table.from_arrays(
        [
            pa.array([], pa.int8()),
            pa.array([], pa.int64()),
            pa.array([], pa.int64()),
            pa.array([], pa.float64()),
        ],
        names=["side", "key", "match", "score"],
    )

    def both_reductions(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        ids_b, mat_b = ray.get(bref)
        if len(ids_b) == 0:
            return empty
        a_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        a_mat = _normalize(_decode_vectors(batch, vec_col))
        # ascending a_id within the batch → axis-0 argmax tiebreak = min id
        aord = np.argsort(a_ids, kind="stable")
        a_ids, a_mat = a_ids[aord], a_mat[aord]
        sims = np.round(a_mat @ mat_b.T, round_decimals)  # (nA, nB)
        best_b = sims.argmax(axis=1)  # first max → min b_id (ids sorted)
        best_a = sims.argmax(axis=0)  # first max → min a_id
        na, nb = sims.shape
        return pa.Table.from_arrays(
            [
                pa.array(
                    np.concatenate([np.zeros(na, np.int8), np.ones(nb, np.int8)])
                ),
                pa.array(np.concatenate([a_ids, ids_b])),
                pa.array(np.concatenate([b_ids[best_b], a_ids[best_a]])),
                pa.array(
                    np.concatenate(
                        [sims[np.arange(na), best_b], sims[best_a, np.arange(nb)]]
                    )
                ),
            ],
            names=["side", "key", "match", "score"],
        )

    # 4 narrow columns; materialized so the two consumers below share it.
    both = ds_a.map_batches(both_reductions, batch_format="pyarrow").materialize()

    def side0(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch["side"], 0))
        return t.select(["key", "match"])

    def side1(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch["side"], 1))
        return t.select(["key", "match", "score"])

    a_best = both.map_batches(side0, batch_format="pyarrow")
    b_parts = both.map_batches(side1, batch_format="pyarrow")

    def head(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        names = ["key", "match"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())], names=names
            )
        take = pa.array(starts)
        return pa.Table.from_arrays(
            [batch["key"].take(take), batch["match"].take(take)], names=names
        )

    # global best A per B: argmax over the per-batch partials.
    b_best = sorted_segment_apply(
        b_parts,
        key_col="key",
        block_fn=head,
        within_cols=["score", "match"],
        descending=[True, False],
    ).take_all()  # |B|-sized by construction (≤ b_broadcast_cap)
    bb_keys = np.array([r["key"] for r in b_best], dtype=np.int64)
    bb_vals = np.array([r["match"] for r in b_best], dtype=np.int64)
    bord = np.argsort(bb_keys, kind="stable")
    backref = ray.put((bb_keys[bord], bb_vals[bord]))

    def mutual(batch: pa.Table) -> pa.Table:
        names = ["src_id", "dst_id"]
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())], names=names
            )
        keys, vals = ray.get(backref)
        a = batch["key"].to_numpy(zero_copy_only=False)
        b = batch["match"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            keep = np.zeros(len(a), dtype=bool)
        else:
            pos = np.searchsorted(keys, b)
            pos_c = np.minimum(pos, len(keys) - 1)
            keep = (keys[pos_c] == b) & (vals[pos_c] == a)
        return pa.Table.from_arrays(
            [pa.array(a[keep]), pa.array(b[keep])], names=names
        )

    return a_best.map_batches(mutual, batch_format="pyarrow")


def mutual_nn_bucketed(
    ds_a,
    ds_b,
    k_buckets: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
):
    """The large × large bitext regime: mutual-top-1 cosine WITHIN IVF
    buckets. Side B no longer broadcasts — both sides stream through one
    assignment pass against shared integer-Lloyd centroids
    (:func:`..cluster._fit_centroids` on side B), then each bucket
    resolves its own exact mutual-NN with the SAME rounded-score /
    smallest-id rules as :func:`mutual_nn_pairs`.

    Contract (the standard IVF trade, documented not silent): a pair
    whose two sides land in different buckets is missed, and "mutual"
    means mutual WITHIN the bucket. With ``k_buckets=1`` the result
    equals the exact path bit-for-bit; real translation pairs sit at
    high cosine and co-locate by construction. Choose ``k_buckets`` so
    (|A|+|B|)/k fits a worker — the per-bucket kernel is one matmul.

    Returns a Dataset of ``(src_id, dst_id)``.
    """
    import ray

    from .cluster import _assign, _fit_centroids, _quantize

    centroids = _fit_centroids(ds_b, k_buckets, iters, vec_col, id_col)
    cref = ray.put(centroids)
    VLIST = pa.list_(pa.float64())

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.Table.from_arrays(
                    [
                        pa.array([], pa.int64()),
                        pa.array([], pa.int8()),
                        pa.array([], pa.int64()),
                        pa.array([], VLIST),
                    ],
                    names=[id_col, "side", "bucket", "v"],
                )
            qmat = _quantize(batch, vec_col)
            assign, _d = _assign(qmat, ray.get(cref))
            vecs = _normalize(_decode_vectors(batch, vec_col))
            return pa.Table.from_arrays(
                [
                    pa.array(
                        batch[id_col].to_numpy(zero_copy_only=False), pa.int64()
                    ),
                    pa.array(np.full(batch.num_rows, side, np.int8)),
                    pa.array(assign.astype(np.int64)),
                    pa.array(list(vecs), VLIST),
                ],
                names=[id_col, "side", "bucket", "v"],
            )

        return fn

    both = ds_a.select_columns([id_col, vec_col]).map_batches(
        tag(0), batch_format="pyarrow"
    ).union(
        ds_b.select_columns([id_col, vec_col]).map_batches(
            tag(1), batch_format="pyarrow"
        )
    )

    def bucket_kernel(group: pa.Table) -> pa.Table:
        names = ["src_id", "dst_id"]
        side = group["side"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        if (side == 0).sum() == 0 or (side == 1).sum() == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=names,
            )
        vecs = np.asarray(group["v"].to_pylist(), dtype=np.float64)
        a_sel = np.nonzero(side == 0)[0]
        b_sel = np.nonzero(side == 1)[0]
        a_ids, b_ids = ids[a_sel], ids[b_sel]
        aord = np.argsort(a_ids, kind="stable")
        bord = np.argsort(b_ids, kind="stable")
        a_ids, b_ids = a_ids[aord], b_ids[bord]
        a_mat = vecs[a_sel][aord]
        b_mat = vecs[b_sel][bord]
        sims = np.round(a_mat @ b_mat.T, round_decimals)
        best_b = sims.argmax(axis=1)  # first max → min b_id (sorted)
        best_a = sims.argmax(axis=0)  # first max → min a_id
        keep = best_a[best_b] == np.arange(len(a_ids))
        return pa.Table.from_arrays(
            [pa.array(a_ids[keep]), pa.array(b_ids[best_b[keep]])],
            names=names,
        )

    return both.groupby("bucket").map_groups(
        bucket_kernel, batch_format="pyarrow"
    )


def hard_negatives(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    ref_broadcast_cap: int = 2_000_000,
):
    """Hard-negative mining — the contrastive-training data op: for
    every embedding, the single most-similar embedding with a DIFFERENT
    label (cosine, rounded to 6 decimals, smallest-id tiebreak). These
    near-boundary cross-class pairs are what dense-retriever and
    contrastive fine-tuning batches want instead of random negatives.

    Shape mirrors :func:`mutual_nn_pairs`: the reference side (ids,
    labels, L2-normalized matrix, id-sorted so numpy's first-argmax IS
    the min-id tiebreak) broadcasts once via ``ray.put`` under
    ``ref_broadcast_cap`` rows (typed error above — the IVF-bucketed
    large × large regime is the documented scale path), then ONE
    shuffle-free matmul pass per block masks same-label columns with
    −inf and reduces. Returns a Dataset ``(vec_id, label, neg_id,
    neg_label)``; rows whose label has no complement are dropped.
    """
    import ray

    refs = ds.select_columns([id_col, label_col, vec_col]).to_arrow_refs()
    tables = [ray.get(r) for r in refs]
    nonempty = [t for t in tables if t.num_rows] or tables[:1]
    r_tbl = pa.concat_tables(nonempty, promote_options="permissive")
    if r_tbl.num_rows > ref_broadcast_cap:
        raise RuntimeError(
            f"hard_negatives: reference side has {r_tbl.num_rows} rows > "
            f"ref_broadcast_cap={ref_broadcast_cap}; bucket by IVF list "
            "first (mutual_nn_bucketed's regime)"
        )
    r_ids = r_tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    r_lab = r_tbl[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(r_ids, kind="stable")
    r_ids, r_lab = r_ids[order], r_lab[order]
    r_mat = _normalize(_decode_vectors(r_tbl, vec_col))[order]
    ref = ray.put((r_ids, r_lab, r_mat))

    def topneg(batch: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64())] * 4,
            names=[id_col, label_col, "neg_id", "neg_label"],
        )
        if batch.num_rows == 0:
            return empty
        ids_r, lab_r, mat_r = ray.get(ref)
        a_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        a_lab = batch[label_col].to_numpy(
            zero_copy_only=False).astype(np.int64)
        a_mat = _normalize(_decode_vectors(batch, vec_col))
        sims = np.round(a_mat @ mat_r.T, 6)
        sims[a_lab[:, None] == lab_r[None, :]] = -np.inf
        best = sims.argmax(axis=1)  # first max → min ref id (ids sorted)
        has = np.isfinite(sims[np.arange(len(a_ids)), best])
        if not has.any():
            return empty
        return pa.Table.from_arrays(
            [pa.array(a_ids[has]), pa.array(a_lab[has]),
             pa.array(ids_r[best[has]]), pa.array(lab_r[best[has]])],
            names=[id_col, label_col, "neg_id", "neg_label"],
        )

    return ds.map_batches(topneg, batch_format="pyarrow")
