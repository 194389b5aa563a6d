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
