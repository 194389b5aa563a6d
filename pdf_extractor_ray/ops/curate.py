"""End-to-end corpus curation: clean → quality-gate → dedup → shard plan.

The composition a training-data run actually executes, as ONE streaming
Dataset pipeline (each stage is an existing, individually-oracled operator):

1. **Clean** — C4 line/document rules (:func:`.text.c4_clean_batch`);
   documents failing the document rules drop, survivors carry their
   ``cleaned_text``.
2. **Quality gate** — Gopher counters (:func:`.text.gopher_rules_batch`)
   over the CLEANED text, gated on the four corpus-independent rules
   (word count ∈ [min_words, 100 000], mean word length ∈ [3, 10],
   symbol ratio ≤ 0.1, ≥ 80 % alphabetic words) as exact integer
   inequalities. The stopword/bullet/ellipsis rules stay available as
   counters but don't gate here — they are list-/layout-specific.
3. **Dedup** — :func:`.dedup.exact_dedup_large` on the cleaned text
   (min-id survivor; only (hash, id) shuffles).
4. **Shard plan** — :func:`.shard.shard_plan` over survivors in id order
   with size = cleaned code-point length (the write-manifest for
   resumable partitioned output).

Stages 1–2 are per-document Arrow-kernel passes that fuse into one map
stage under the streaming executor; the only exchanges are dedup's
(hash, id) sort and the shard planner's sort — both small-column.
Every rule is deterministic and SQL-replicable, so the full composition
has a single chained-CTE oracle (Q ``curate_corpus``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def curate_corpus(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    shard_bytes: int = 20_000,
) -> pa.Table:
    """Run the four-stage curation over ``ds`` → shard-plan table
    ``(shard_id, n_docs, total_bytes, first_doc)`` for the curated set."""
    from .dedup import exact_dedup_large
    from .shard import shard_plan
    from .text import c4_clean_batch, gopher_rules_batch

    def clean(batch: pa.Table) -> pa.Table:
        out = c4_clean_batch(batch, text_col=text_col)
        out = out.filter(out["kept"])
        return pa.Table.from_arrays(
            [out[id_col].combine_chunks(), out["cleaned_text"].combine_chunks()],
            names=[id_col, "cleaned_text"],
        )

    def quality_gate(batch: pa.Table) -> pa.Table:
        g = gopher_rules_batch(
            batch.rename_columns([id_col, text_col]), text_col=text_col
        )
        nw = g["n_words"]
        wc = g["word_chars"]
        ns = g["n_symbols"]
        aw = g["alpha_words"]
        ok = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(nw, min_words),
                    pc.less_equal(nw, 100_000),
                ),
                pc.and_(
                    pc.less_equal(pc.multiply(nw, 3), wc),
                    pc.less_equal(wc, pc.multiply(nw, 10)),
                ),
            ),
            pc.and_(
                pc.less_equal(pc.multiply(ns, 10), nw),
                pc.greater_equal(pc.multiply(aw, 5), pc.multiply(nw, 4)),
            ),
        )
        kept = batch.filter(ok)
        return pa.Table.from_arrays(
            [
                kept[id_col].combine_chunks(),
                kept.column(1).combine_chunks(),
                pc.utf8_length(kept.column(1)).cast(pa.int64()),
            ],
            names=[id_col, "cleaned_text", "n_bytes"],
        )

    curated = ds.map_batches(clean, batch_format="pyarrow").map_batches(
        quality_gate, batch_format="pyarrow"
    )
    deduped = exact_dedup_large(curated, text_col="cleaned_text", id_col=id_col)
    return shard_plan(
        deduped, shard_bytes=shard_bytes, size_col="n_bytes", key_col=id_col
    )


def dsir_select(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "lang",
    target_value: str = "en",
    buckets: int = 128,
    scale: int = 1_000_000,
    keep_frac: float = 0.1,
    tie_cap: int = 1_000_000,
):
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023),
    hashed-n-gram flavor, INTEGER-exact: documents are scored by how
    target-like their hashed unigram profile is, and the top
    ``ceil(keep_frac * n)`` are selected.

    The published estimator scores ``sum_k c_k * (log p_k - log q_k)``
    over hashed n-gram buckets; this engine follows the house
    integer-surrogate rule (cf. :func:`.text.tfidf_top_terms`) and uses
    per-bucket RATIONAL ratio weights instead of log-ratios::

        w_b    = ((t_b + 1) * scale) // (r_b + 1)      # Laplace-smoothed
        score  = sum over the document's tokens of w_bucket(token)

    (t_b / r_b = bucket token counts in the target / raw corpus). Same
    selection semantics — documents whose hashed profile concentrates in
    target-heavy buckets rank first — with a bit-exact SQL oracle.
    Tokens come from :func:`.text.split_words` (THE corpus tokenizer);
    the bucket is :func:`.dedup._token_hash64` ``% buckets`` (the
    SQL-replicable hash the simhash oracle already mirrors).

    Shape: pass 1 streams per-block ``2 × buckets`` count partials into
    a tiny ``groupby(bucket)`` (the only exchange, ≤ ``buckets`` rows
    out); the weight vector broadcasts via ``ray.put``. Pass 2 scores
    per-row, shuffle-free. The selection threshold is the k-th largest
    score via :func:`.quantiles.exact_quantiles` (streaming counting
    passes — no sort), and only the docs TIED at the threshold (gated by
    ``tie_cap``, typically a handful) are collected to fix the boundary
    by smallest-id, matching ``row_number() OVER (ORDER BY score DESC,
    id)``. Returns a Dataset of ``(id, dsir_score, selected)``.

    Scale note: int64 holds ``score <= L * scale * (T + 1)`` comfortably
    for web documents at ``scale=1e6``; at 100 TB the weight vector is
    still ``buckets`` ints (hashing is what makes DSIR scale-free in
    vocabulary) and the counting-pass threshold avoids materializing or
    sorting the score column."""
    import math

    import ray
    from ray.data.aggregate import Sum

    from .dedup import _token_hash64
    from .quantiles import exact_quantiles
    from .text import split_words

    def bucket_ids(batch: pa.Table) -> list:
        words_list = split_words(pc.fill_null(batch[text_col], ""))
        out = []
        for doc in words_list.to_pylist():
            toks = [w for w in doc if w] if doc else []
            if toks:
                out.append(
                    np.fromiter(
                        (_token_hash64(t) % buckets for t in toks),
                        dtype=np.int64,
                        count=len(toks),
                    )
                )
            else:
                out.append(np.zeros(0, dtype=np.int64))
        return out

    def count_partial(batch: pa.Table) -> pa.Table:
        is_target = pc.equal(
            pc.fill_null(batch[target_col], ""), target_value
        ).to_numpy(zero_copy_only=False)
        t_cnt = np.zeros(buckets, dtype=np.int64)
        r_cnt = np.zeros(buckets, dtype=np.int64)
        for tgt, bs in zip(is_target, bucket_ids(batch)):
            if len(bs) == 0:
                continue
            c = np.bincount(bs, minlength=buckets)
            r_cnt += c
            if tgt:
                t_cnt += c
        nz = np.flatnonzero(r_cnt)
        return pa.Table.from_arrays(
            [
                pa.array(nz, pa.int64()),
                pa.array(t_cnt[nz], pa.int64()),
                pa.array(r_cnt[nz], pa.int64()),
            ],
            names=["b", "t", "r"],
        )

    t_arr = np.zeros(buckets, dtype=np.int64)
    r_arr = np.zeros(buckets, dtype=np.int64)
    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("t"), Sum("r"))
    )
    for tbl in counts.iter_batches(batch_format="pyarrow"):
        b = tbl["b"].to_numpy(zero_copy_only=False)
        t_arr[b] += tbl["sum(t)"].to_numpy(zero_copy_only=False)
        r_arr[b] += tbl["sum(r)"].to_numpy(zero_copy_only=False)
    w = (t_arr + 1) * scale // (r_arr + 1)
    w_ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        scores = np.fromiter(
            (int(wv[bs].sum()) for bs in bucket_ids(batch)),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return pa.Table.from_arrays(
            [batch[id_col].combine_chunks(), pa.array(scores, pa.int64())],
            names=[id_col, "dsir_score"],
        )

    # (id, score) is two small columns — pin it so the threshold passes,
    # the tie scan and the annotate pass don't re-run tokenization.
    scored = ds.map_batches(score, batch_format="pyarrow").materialize()
    n = int(ds.count())
    k = math.ceil(keep_frac * n)
    if k >= n:
        thr, cutoff_id = None, None
    else:
        # k-th LARGEST = value at ascending rank n-k+1; the +0.5 keeps
        # ceil(q*n) at exactly n-k+1 against float representation.
        [(_, thr)] = exact_quantiles(
            scored, "dsir_score", [(n - k + 0.5) / n]
        )
        above = 0
        ties: list = []
        for tbl in scored.iter_batches(batch_format="pyarrow"):
            s = tbl["dsir_score"]
            above += pc.sum(
                pc.greater(s, thr).cast(pa.int64())
            ).as_py() or 0
            ties.extend(
                tbl.filter(pc.equal(s, thr))[id_col].to_pylist()
            )
            if len(ties) > tie_cap:
                raise RuntimeError(
                    f"score ties at threshold exceed tie_cap={tie_cap}; "
                    "re-run with a larger scale (finer weights) or "
                    "resolve the boundary with a distributed id-rank pass"
                )
        ties.sort()
        cutoff_id = ties[k - above - 1]

    def annotate(batch: pa.Table) -> pa.Table:
        if thr is None:
            sel = pa.array([True] * batch.num_rows, pa.bool_())
        else:
            s = batch["dsir_score"]
            sel = pc.or_(
                pc.greater(s, thr),
                pc.and_(
                    pc.equal(s, thr),
                    pc.less_equal(batch[id_col], cutoff_id),
                ),
            )
        return batch.append_column("selected", sel)

    return scored.map_batches(annotate, batch_format="pyarrow")


def k_anonymity(
    ds,
    quasi_cols: list,
    k: int = 5,
    id_col: str = "doc_id",
):
    """k-anonymity census over a quasi-identifier column set (Sweeney
    2002): each row learns the size of its quasi-identifier equivalence
    class and whether that class reaches ``k`` — the release-gate
    question for publishing crawl-derived metadata (a row whose
    (host, lang, length-bucket, …) combination is shared by fewer than
    k rows re-identifies its source).

    Shape (the engine's standard aggregation discipline): quasi columns
    pack into one separator-joined key in-block; per-block (key, cnt)
    partials pre-combine BEFORE the single ``groupby(key).sum``
    exchange, so the shuffle carries one row per distinct class per
    block, never the corpus; class sizes attach back via ONE
    sorted-lookup exchange (:func:`.segments.attach_lookup`). Returns a
    Dataset ``(id_col, group_size, k_anonymous)``; no driver-side state
    at any size.
    """
    from .segments import attach_lookup

    SEP = "\x1f"

    def pack_key(batch: pa.Table) -> pa.Table:
        cols = [
            np.asarray(batch[c].to_pylist(), dtype=object).astype(str)
            for c in quasi_cols
        ]
        key = cols[0]
        for c in cols[1:]:
            key = np.char.add(np.char.add(key, SEP), c)
        return pa.Table.from_arrays(
            [batch[id_col].combine_chunks(),
             pa.array(key.astype(object), pa.string())],
            names=["id", "qkey"],
        )

    keyed = ds.map_batches(pack_key, batch_format="pyarrow").materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        ks = np.asarray(batch["qkey"].to_pylist(), dtype=object).astype(str)
        u, c = np.unique(ks, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(object), pa.string()),
             pa.array(c.astype(np.int64))],
            names=["qkey", "cnt"],
        )

    sizes = (
        keyed.map_batches(count_partial, batch_format="pyarrow",
                          batch_size=None)
        .groupby("qkey")
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["qkey", "group_size"]),
            batch_format="pyarrow",
        )
    )

    out = attach_lookup(
        keyed, sizes, key_col="qkey", val_cols=["group_size"],
        carry_cols=["id"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        gs = batch["group_size"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [batch["id"].combine_chunks(),
             pa.array(gs.astype(np.int64)),
             pa.array((gs >= k).astype(np.int64))],
            names=[id_col, "group_size", "k_anonymous"],
        )

    return out.map_batches(finish, batch_format="pyarrow")
