"""Distributed inverted-index construction (token → posting statistics).

The exchange is the classic search-engine shape: per-block tokenize +
per-document term-frequency dedup (so the exchange carries one row per
DISTINCT (token, doc) pair, never one per occurrence), then ONE sort on
``(token, doc_id)`` with vectorized segment aggregation via
:func:`..ops.segments.sorted_segment_apply` — document frequency is the
segment length, term-frequency totals are an ``np.add.reduceat``, and the
posting sample is a constant number of gathers. No per-token Python in
the hot path; skewed tokens (stopwords) ride the segment machinery's
straddle/mega-group handling rather than a per-group ``map_groups``.

At 10^12 documents a stopword's full posting list cannot be one row; this
op therefore materializes posting STATISTICS plus a bounded sample (the
metadata tier of a real index). Full posting storage is the sorted
``(token, doc_id)`` run itself — already produced by the same sort —
written out partitioned by token hash; ``token_doc_pairs`` exposes it.

No counterpart in the reference repo; this belongs to the engine's
corpus-analysis surface alongside word_topk/tfidf (``ops/text.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .segments import sorted_segment_apply


def token_doc_pairs(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of distinct ``(token, doc_id, tf)`` rows — the raw posting
    run. Per-block vectorized: RE2 split → flatten → lexsort run-length
    over (token, doc) pairs."""

    def emit(batch: pa.Table) -> pa.Table:
        from .text import split_words

        texts = pc.fill_null(batch[text_col], "")
        words_list = split_words(texts)
        w = words_list.flatten().to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
        d = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), reps)
        keep = w != ""
        w, d = w[keep].astype(str), d[keep]
        if len(w) == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.string()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                ],
                names=["token", id_col, "tf"],
            )
        order = np.lexsort((d, w))
        w, d = w[order], d[order]
        new = np.concatenate(([True], (w[1:] != w[:-1]) | (d[1:] != d[:-1])))
        idx = np.flatnonzero(new)
        tf = np.diff(np.append(idx, len(w)))
        return pa.Table.from_arrays(
            [
                pa.array(w[idx].astype(object), pa.string()),
                pa.array(d[idx], pa.int64()),
                pa.array(tf, pa.int64()),
            ],
            names=["token", id_col, "tf"],
        )

    return ds.map_batches(emit, batch_format="pyarrow", batch_size=None)


def inverted_index(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    sample_k: int = 5,
):
    """Build the index metadata tier: one row per token with document
    frequency, total term frequency, and the first ``sample_k`` posting
    doc ids (ascending, comma-joined — a string so the result is directly
    SQL-comparable). Tokens with ``df < min_df`` are dropped."""

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        tokens = batch["token"].to_numpy(zero_copy_only=False)[starts]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        lens = ends - starts
        # cumsum differences, not reduceat: complete segments need not tile
        # the block (straddling groups are deferred by the segment runner).
        csum = np.concatenate(([0], np.cumsum(tf)))
        total_tf = csum[ends] - csum[starts]
        # Vectorized ≤sample_k-way join: one gather per sample slot,
        # masked to segments long enough to have that slot.
        sample = np.full(len(starts), "", dtype=object)
        for j in range(sample_k):
            has = lens > j
            if not has.any():
                break
            piece = ids[starts[has] + j].astype(str).astype(object)
            sample[has] = sample[has] + ("," if j else "") + piece
        keep = lens >= min_df
        return pa.Table.from_arrays(
            [
                pa.array(tokens[keep].astype(object), pa.string()),
                pa.array(lens[keep], pa.int64()),
                pa.array(total_tf[keep], pa.int64()),
                pa.array(sample[keep], pa.string()),
            ],
            names=["token", "df", "total_tf", "sample_postings"],
        )

    return sorted_segment_apply(
        token_doc_pairs(ds, text_col, id_col),
        key_col="token",
        block_fn=kernel,
        within_cols=[id_col],
    )


def write_posting_store(
    ds,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
):
    """Materialize the full posting store: the sorted ``(token, doc_id,
    tf)`` run written as parquet PARTITIONED by a stable token-hash bucket
    (``bucket=K/`` directories). A stopword's postings span many row
    groups inside its bucket — never one giant row or file — and a lookup
    for token *t* touches exactly one bucket directory (hash-pruned), so
    the store scales to corpus-sized vocabularies and a failed write can
    resume per bucket. Returns the bucket count actually written."""
    from ..stages.normalize import stable_hash_mod

    def add_bucket(batch: pa.Table) -> pa.Table:
        toks = batch["token"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(stable_hash_mod(toks, num_buckets), pa.int32())
        )

    pairs = token_doc_pairs(ds, text_col, id_col).map_batches(
        add_bucket, batch_format="pyarrow"
    )
    # Sort by (bucket, token, doc_id): co-locates each token's postings in
    # doc-id order inside its bucket partition.
    pairs.sort(["bucket", "token", id_col]).write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return num_buckets


def lookup_postings(out_dir: str, token: str, num_buckets: int = 256):
    """Read one token's postings from a :func:`write_posting_store` output:
    hash-prune to the single bucket directory, then filter — the access
    path the partitioning exists for. Returns a pyarrow Table."""
    import pyarrow.dataset as pads

    from ..stages.normalize import stable_hash_mod

    bucket = int(stable_hash_mod([token], num_buckets)[0])
    dataset = pads.dataset(
        f"{out_dir}/bucket={bucket}", format="parquet"
    )
    return dataset.to_table(filter=pads.field("token") == token)


def merge_posting_store(
    store_dir: str,
    new_ds,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
):
    """Incremental index maintenance: fold a NEW batch of documents into
    an existing :func:`write_posting_store` output, producing a merged
    store at ``out_dir`` — the daily-crawl indexing loop (build once,
    merge deltas) instead of a full rebuild.

    Shape: the old store reads back bucket-partitioned (one read task per
    bucket directory, already sorted); the new documents reduce to
    (token, doc_id, tf) pairs with the SAME stable bucket hash; a union +
    one (bucket, token, id) sort restores the store invariant. Same-key
    rows from both sides merge by SUMMING tf (a re-crawled doc's counts
    accumulate; exact re-ingests are the caller's dedup concern). The
    exchange carries only posting rows — O(old postings + delta
    postings), which at daily-delta scale is dominated by the EXISTING
    store; a compaction that only rewrites touched buckets is the
    documented next step (filter old-store read to the delta's bucket
    set — same code path, pruned read).

    Returns the bucket count written."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.normalize import stable_hash_mod

    def add_bucket(batch: pa.Table) -> pa.Table:
        toks = batch["token"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(stable_hash_mod(toks, num_buckets), pa.int32())
        )

    old = rd.read_parquet(store_dir).map_batches(
        lambda t: t.select(["token", id_col, "tf"]), batch_format="pyarrow"
    )
    new = token_doc_pairs(new_ds, text_col, id_col)
    merged = (
        old.union(new)
        .groupby(["token", id_col])
        .aggregate(Sum("tf", alias_name="tf"))
        .map_batches(add_bucket, batch_format="pyarrow")
    )
    merged.sort(["bucket", "token", id_col]).write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return num_buckets
