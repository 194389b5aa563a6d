"""Deterministic text-embedding stage (hashed n-gram projection).

The engine's stand-in for batched model inference: an actor-pool
``map_batches`` stage whose per-actor ``__init__`` builds the "model" (a
seeded random projection matrix — in production this is the model load) and
whose ``__call__`` embeds a batch vectorized. The embedding itself is a
hashed character-n-gram bag projected to ``dim`` dimensions and
L2-normalized — deterministic, so embeddings are reproducible across runs
and nodes (a real sentence-transformer drops into the same stage shape).

Feeds ops.ann (similarity search) and ops.dedup.embedding_dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    data = (text or "").lower().encode("utf-8", errors="ignore")
    if len(data) < n:
        data = data + b"\x00" * (n - len(data))
    arr = np.frombuffer(data, dtype=np.uint8)
    windows = np.lib.stride_tricks.sliding_window_view(arr, min(n, len(arr)))
    h = np.full(len(windows), _FNV_OFFSET, dtype=np.uint64)
    for col in range(windows.shape[1]):
        h = (h ^ windows[:, col].astype(np.uint64)) * _FNV_PRIME
    return h


class HashedNgramEmbedder:
    """Actor-pool callable: text column → ``embedding`` (list<float>)."""

    def __init__(
        self,
        dim: int = 64,
        n_buckets: int = 4096,
        ngram: int = 3,
        seed: int = 42,
        text_col: str = "text",
        projection: str = "gaussian",
    ):
        # "Model load": the projection matrix, built once per actor.
        # ``projection="identity"`` (forces n_buckets == dim) keeps the
        # embedding a plain normalized n-gram-bucket histogram — exactly
        # replicable in ANSI SQL, which is what the embed_ann oracle needs.
        if projection == "identity":
            n_buckets = dim
            self.projection = np.eye(dim)
        else:
            rng = np.random.Generator(np.random.Philox(seed))
            self.projection = rng.normal(size=(n_buckets, dim)) / np.sqrt(dim)
        self.n_buckets = n_buckets
        self.ngram = ngram
        self.text_col = text_col

    def embed_one(self, text: str) -> np.ndarray:
        hashes = _ngram_hashes(text, self.ngram)
        buckets, counts = np.unique(hashes % np.uint64(self.n_buckets), return_counts=True)
        vec = (counts.astype(np.float64) @ self.projection[buckets.astype(np.int64)])
        norm = np.linalg.norm(vec)
        return vec / norm if norm > 0 else vec

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = [self.embed_one(t).tolist() for t in batch[self.text_col].to_pylist()]
        return batch.append_column("embedding", pa.array(vecs, pa.list_(pa.float64())))


def embed_documents(ds, dim: int = 64, concurrency=(1, 8), batch_size: int = 512,
                    text_col: str = "text", projection: str = "gaussian"):
    """Embedding pipeline stage (actor pool — the model-inference shape)."""
    return ds.map_batches(
        HashedNgramEmbedder,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs={
            "dim": dim, "text_col": text_col, "projection": projection,
        },
        concurrency=concurrency,
    )


def quantize_embeddings(ds, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Int8 symmetric (max-abs) quantization of an embedding column — the
    standard memory-reduction step before ANN serving (a 64-dim float32
    vector becomes 64 bytes + one scale; 4x smaller, distance rankings
    approximately preserved).

    Integer-exact by construction so a SQL oracle can replay every output
    bit: floats enter through the engine's established fixed-point map
    ``floor((float64(e) + OFFSET) * SCALE)`` (ops/cluster.py — the offset
    keeps the pre-centered value positive so floor is unambiguous), are
    re-centered to ``c = v - OFFSET*SCALE``, and quantize as

        q_i = sign(c_i) * ((127 * |c_i|) // max_j |c_j|)

    — truncation toward zero via non-negative floor division only, which
    numpy and DuckDB agree on unconditionally. An all-zero vector gets
    ``scale = 0`` and zeros. The reconstruction-error checksum
    ``sum_i |127*c_i - q_i*scale|`` pins every element through the oracle
    without shipping list columns.

    Shape: ONE ``map_batches`` pass, zero-copy FixedSizeList/list decode,
    no exchange — embarrassingly parallel at any corpus size. Emits
    ``(id, scale, q_min, q_max, q_sum, q_l1, err_sum)``; serving layouts
    would instead attach the int8 list column (same kernel, one cast).
    """
    from .cluster import OFFSET, SCALE, _quantize

    center = int(OFFSET * SCALE)

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 7,
                names=[id_col, "scale", "q_min", "q_max", "q_sum", "q_l1", "err_sum"],
            )
        c = _quantize(batch, vec_col) - center
        absc = np.abs(c)
        m = absc.max(axis=1)
        safe = np.maximum(m, 1)
        q = np.sign(c) * (127 * absc // safe[:, None])
        err = np.abs(127 * c - q * m[:, None]).sum(axis=1)
        ids = batch[id_col].combine_chunks().cast(pa.int64())
        return pa.Table.from_arrays(
            [
                ids,
                pa.array(m),
                pa.array(q.min(axis=1)),
                pa.array(q.max(axis=1)),
                pa.array(q.sum(axis=1)),
                pa.array(np.abs(q).sum(axis=1)),
                pa.array(err),
            ],
            names=[id_col, "scale", "q_min", "q_max", "q_sum", "q_l1", "err_sum"],
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def quantization_recall(
    ds,
    n_queries: int = 10,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Quantization-distortion evaluation — the serving-infra question
    "how much ANN recall does int8 cost?": for the ``n_queries``
    lowest-id vectors, overlap@k between inner-product top-k under the
    engine's fixed-point integer embedding map and top-k under its int8
    symmetric quantization (:func:`quantize_embeddings`'s formula).
    Both rankings are INTEGER-exact (int64 dot products, score-desc /
    id-asc ties), so overlap counts are bit-exact and SQL-replicable
    (``list_dot_product`` on BIGINT lists is double-exact here: |c| <
    2^20 per element, 64 dims → sums < 2^53).

    Shape: query matrices broadcast once (``ray.put``); per block two
    integer matmuls + per-query partial top-k rows (queries × arms × k
    per block) — the ANN brute-force exchange pattern; the driver
    merges blocks × queries × 2k rows. Self-matches are excluded.
    Returns a pandas DataFrame ``(vec_id, overlap)`` sorted by vec_id.
    """
    import pandas as pd
    import ray

    from .cluster import OFFSET, SCALE, _quantize

    center = int(OFFSET * SCALE)

    def bottom_partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return batch
        keep = np.argsort(ids, kind="stable")[:n_queries]
        return batch.take(pa.array(keep))

    qrows = pa.concat_tables(
        list(
            ds.select_columns([id_col, vec_col])
            .map_batches(bottom_partial, batch_format="pyarrow",
                         batch_size=None)
            .iter_batches(batch_format="pyarrow")
        ),
        promote_options="permissive",
    )
    order = np.argsort(
        qrows[id_col].to_numpy(zero_copy_only=False), kind="stable"
    )[:n_queries]
    qrows = qrows.take(pa.array(order))
    q_ids = qrows[id_col].to_numpy(zero_copy_only=False).astype(np.int64)

    def int8_of(c: np.ndarray) -> np.ndarray:
        m = np.abs(c).max(axis=1)
        safe = np.maximum(m, 1)
        q = np.sign(c) * ((127 * np.abs(c)) // safe[:, None])
        q[m == 0] = 0
        return q.astype(np.int64)

    c_q = _quantize(qrows, vec_col) - center
    q_q = int8_of(c_q)
    ref = ray.put((q_ids, c_q, q_q))

    def topk_partial(batch: pa.Table) -> pa.Table:
        qids, cq, qq = ray.get(ref)
        out_q, out_arm, out_id, out_sc = [], [], [], []
        if batch.num_rows:
            ids = batch[id_col].to_numpy(
                zero_copy_only=False).astype(np.int64)
            c = _quantize(batch, vec_col) - center
            q = int8_of(c)
            se = c @ cq.T          # (n, Q) exact int64
            sq = q @ qq.T
            for arm, scores in ((0, se), (1, sq)):
                for j in range(len(qids)):
                    col = scores[:, j]
                    mask = ids != qids[j]
                    cand_ids = ids[mask]
                    cand = col[mask]
                    if len(cand) == 0:
                        continue
                    o = np.lexsort((cand_ids, -cand))[:k]
                    out_q.append(np.full(len(o), qids[j], np.int64))
                    out_arm.append(np.full(len(o), arm, np.int64))
                    out_id.append(cand_ids[o])
                    out_sc.append(cand[o])
        if out_q:
            a = np.concatenate
            cols = [a(out_q), a(out_arm), a(out_id), a(out_sc)]
        else:
            cols = [np.array([], dtype=np.int64)] * 4
        return pa.Table.from_arrays(
            [pa.array(x) for x in cols],
            names=["qid", "arm", "cid", "score"],
        )

    rows = pa.concat_tables(
        list(
            ds.map_batches(topk_partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ),
        promote_options="permissive",
    )
    qid = rows["qid"].to_numpy(zero_copy_only=False)
    arm = rows["arm"].to_numpy(zero_copy_only=False)
    cid = rows["cid"].to_numpy(zero_copy_only=False)
    sc = rows["score"].to_numpy(zero_copy_only=False)
    overlaps = {}
    for j, qv in enumerate(q_ids):
        sets = []
        for a_ in (0, 1):
            m = (qid == qv) & (arm == a_)
            o = np.lexsort((cid[m], -sc[m]))[:k]
            sets.append(set(cid[m][o].tolist()))
        overlaps[int(qv)] = len(sets[0] & sets[1])
    return pd.DataFrame(
        {
            id_col: pd.array(sorted(overlaps), dtype="int64"),
            "overlap": pd.array(
                [overlaps[i] for i in sorted(overlaps)], dtype="int64"),
        }
    )
