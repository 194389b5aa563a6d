"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003).

The MOSS local fingerprinting algorithm: hash every word k-gram, slide a
window of ``w`` consecutive k-gram hashes over the document, and select
each window's minimum hash (RIGHTMOST occurrence on ties — the paper's
tie rule). The selected (position, hash) pairs are the document's
fingerprints: any shared substring of at least ``w + k - 1`` words
between two documents is guaranteed to share a fingerprint, with density
~2/(w+1) — the standard near-dup / plagiarism sketch that, unlike
MinHash, gives a positional match guarantee.

Shape: pure per-document ``map_batches`` (no exchange at all) — the
fingerprint table streams out and any downstream join on the hash is the
caller's exchange. Window selection is numpy over the per-document hash
array (``sliding_window_view`` + reversed ``argmin`` for the rightmost
tie-break); the k-gram hash is FNV-1a over CODE POINTS of the
space-joined gram, the same SQL-replicable recipe as the pack/embed
oracles, so every fingerprint is bit-exactly recomputable in DuckDB.

At 100 TB: no shuffle, no driver state, output is O(words/w) rows per
document. The compact per-doc aggregate (count + hash sum mod 2^63)
exists so correctness checks don't materialize the full fingerprint set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def _fnv_codepoints(s: str) -> int:
    """FNV-1a over code points (xor then multiply per char) — mirrors the
    DuckDB ``list_reduce``/``unicode()`` idiom used by the oracles."""
    h = _FNV_OFFSET
    for ch in s:
        h = ((h ^ ord(ch)) * _FNV_PRIME) & _MASK64
    return h


def winnow_doc(text: str, k: int = 3, w: int = 4):
    """(positions, hashes) of the winnowing fingerprints of one document.

    Tokens are ``text.lower().split()`` (the corpus tokenization); grams
    are space-joined word k-grams. Documents with fewer than ``w``
    k-grams yield no fingerprints (only full windows select — the
    guarantee threshold t = w + k - 1 words).
    """
    words = (text or "").lower().split()
    n = len(words) - k + 1
    if n < w:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    hs = np.fromiter(
        (_fnv_codepoints(" ".join(words[i : i + k])) for i in range(n)),
        dtype=np.uint64,
        count=n,
    )
    wins = np.lib.stride_tricks.sliding_window_view(hs, w)
    # argmin over the REVERSED window → rightmost minimum (paper's rule).
    idx = (w - 1) - np.argmin(wins[:, ::-1], axis=1)
    pos = np.unique(np.arange(n - w + 1, dtype=np.int64) + idx)
    return pos, hs[pos]


def winnow_summary_batch(
    batch: pa.Table,
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> pa.Table:
    """Per-document fingerprint summary: ``n_grams`` (k-gram count),
    ``n_fingerprints`` (selected positions) and ``fp_sum`` (sum of
    selected hashes mod 2^63 — a bit-exact set digest)."""
    texts = batch[text_col].to_pylist()
    n_grams = np.empty(len(texts), np.int64)
    n_fp = np.empty(len(texts), np.int64)
    fp_sum = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        words = (t or "").lower().split()
        n_grams[i] = max(len(words) - k + 1, 0)
        pos, hs = winnow_doc(t, k=k, w=w)
        n_fp[i] = len(pos)
        fp_sum[i] = int(hs.astype(object).sum()) % (1 << 63) if len(hs) else 0
    return (
        batch.append_column("n_grams", pa.array(n_grams, pa.int64()))
        .append_column("n_fingerprints", pa.array(n_fp, pa.int64()))
        .append_column("fp_sum", pa.array(fp_sum, pa.int64()))
    )


def winnow_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, w: int = 4):
    """Exploded fingerprint Dataset ``(id, pos, fp_hash)`` — one row per
    selected fingerprint (``fp_hash`` exposed as int64 bit pattern)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, pos_out, hash_out = [], [], []
        ids = batch[id_col].to_pylist()
        for did, t in zip(ids, batch[text_col].to_pylist()):
            pos, hs = winnow_doc(t, k=k, w=w)
            ids_out.extend([did] * len(pos))
            pos_out.extend(pos.tolist())
            hash_out.extend(hs.view(np.int64).tolist())
        return pa.Table.from_arrays(
            [
                pa.array(ids_out, batch[id_col].type),
                pa.array(pos_out, pa.int64()),
                pa.array(hash_out, pa.int64()),
            ],
            names=[id_col, "pos", "fp_hash"],
        )

    return ds.map_batches(explode, batch_format="pyarrow")
