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
