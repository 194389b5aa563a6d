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
