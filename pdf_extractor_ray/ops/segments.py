"""Ordered per-key aggregation WITHOUT per-group Python calls.

``groupby(key).map_groups(fn)`` invokes Python once per group — a
scale-killer when key cardinality is corpus-proportional (users, customers,
urls). This module factors the sort-based alternative shared with the
sketch-dedup bucket-pair stage (``ops.dedup._sorted_bucket_pairs``):

1. ONE global ``sort`` on ``[key] + within_cols`` — the same all-to-all
   exchange a groupby would pay — yields key-contiguous, in-key-ordered
   blocks.
2. One streaming ``map_batches`` finds equal-key segments vectorized
   (``np.flatnonzero`` over the sorted key column) and hands ALL interior
   segments of a block to one vectorized ``block_fn`` call — numpy
   ``reduceat``/gather kernels, zero per-group Python.
3. Segments touching a block edge may straddle blocks; their rows are
   deferred (they ride along as marker rows) and resolved once on the
   driver with the same ``block_fn`` — O(num_blocks × group size), not
   O(corpus). A ``frag_cap`` gate falls back to per-group ``map_groups``
   for degenerate edge-pinned mega-groups (few, huge groups — the regime
   where per-group calls are fine).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa


def _segment_bounds(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Starts/ends of equal-key runs in a SORTED key array (vectorized)."""
    n = len(keys)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    bounds = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    return (
        np.concatenate(([0], bounds)),
        np.concatenate((bounds, [n])),
    )


def sever_lineage(ds, num_blocks: int | None = None):
    """Materialize ``ds`` and rebuild it zero-copy from the materialized
    block REFS, dropping the lazy logical-plan history.

    Loop-carried datasets (label tables, walker frontiers, live edge
    sets) MUST pass through this instead of bare ``materialize()``:
    each round's derivation chains onto the previous round's plan even
    across ``materialize()``, so the plan GRAPH doubles per round when
    a round unions two branches of the carried dataset — measured on a
    5-node fixture (round 4k) round time grew 1 s → 30 s by round 12
    at flat row/block counts, from plan handling alone. Rebuilding via
    ``from_arrow_refs`` keeps every round's plan O(1); the refs keep
    the blocks alive, nothing is copied.

    ``num_blocks`` additionally coalesces first (streaming
    split/merge, not a shuffle): groupby/sort output block counts
    scale with INPUT block counts, so an uncapped propagation loop
    also doubles its BLOCK count per round (measured 17 → 41 → 89 on
    the same fixture).
    """
    import ray

    if num_blocks is not None:
        ds = ds.repartition(num_blocks)
    return ray.data.from_arrow_refs(ds.materialize().to_arrow_refs())


def sorted_segment_apply(
    ds,
    key_col: str,
    block_fn: Callable[[pa.Table, np.ndarray, np.ndarray], pa.Table],
    within_cols: list | None = None,
    descending: list | None = None,
    frag_cap: int = 200_000,
):
    """Apply a VECTORIZED per-block kernel over complete key groups.

    ``block_fn(batch, starts, ends) -> pa.Table`` receives a sorted block
    and the segment bounds of the COMPLETE key groups it must aggregate
    (each group's rows are contiguous and ordered by ``within_cols``); it
    returns output rows with a fixed schema of its own. It must be
    vectorized across segments (``np.add.reduceat``, gathers at
    ``starts``/``ends``), never loop per group in the hot path.

    Returns a Dataset of ``block_fn`` outputs covering every key exactly
    once. See the module docstring for the straddle/deferral mechanics.
    """
    sort_cols = [key_col] + list(within_cols or [])
    if descending is None:
        sorted_ds = ds.sort(sort_cols)
    else:
        sorted_ds = ds.sort(sort_cols, descending=[False] + list(descending))

    MARK = "__frag__"

    def emit(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            out = block_fn(batch, np.zeros(0, np.int64), np.zeros(0, np.int64))
            return out.append_column(MARK, pa.array([], pa.bool_())).append_column(
                "__rows__", pa.nulls(0, pa.binary())
            )
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        starts, ends = _segment_bounds(keys)
        first_end = int(ends[0])
        last_start = int(starts[-1])
        if first_end >= last_start:  # single segment: defer whole block
            interior_s = np.zeros(0, np.int64)
            interior_e = np.zeros(0, np.int64)
            frag_idx = np.arange(n)
        else:
            interior_s, interior_e = starts[1:-1], ends[1:-1]
            frag_idx = np.concatenate(
                [np.arange(first_end), np.arange(last_start, n)]
            )
        out = block_fn(batch, interior_s, interior_e)
        # Fragment rows ride along IPC-serialized in a binary column (one
        # cell per deferred block edge) so the combined table keeps the
        # block_fn output schema regardless of the input schema.
        frag_tbl = batch.take(pa.array(frag_idx))
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, frag_tbl.schema) as w:
            w.write_table(frag_tbl)
        blob = sink.getvalue().to_pybytes()
        out = out.append_column(
            MARK, pa.array([False] * out.num_rows, type=pa.bool_())
        )
        out = out.append_column("__rows__", pa.nulls(out.num_rows, pa.binary()))
        frag_row = pa.Table.from_arrays(
            [
                *[
                    pa.nulls(1, f.type)
                    for f in out.schema
                    if f.name not in (MARK, "__rows__")
                ],
                pa.array([True]),
                pa.array([blob], pa.binary()),
            ],
            schema=out.schema,
        )
        return pa.concat_tables([out, frag_row])

    combined = sorted_ds.map_batches(
        emit, batch_size=None, batch_format="pyarrow"
    ).materialize()

    def only_out(t: pa.Table) -> pa.Table:
        keep = [c for c in t.schema.names if c not in (MARK, "__rows__")]
        return t.filter(pa.compute.invert(t[MARK].combine_chunks())).select(keep)

    interior_out = combined.map_batches(
        only_out, batch_size=None, batch_format="pyarrow"
    )

    # Driver-side fragment resolution (bounded: 2 edge segments per block).
    frag_tables = []
    n_frag = 0
    for t in combined.iter_batches(batch_format="pyarrow"):
        for blob in t.filter(t[MARK].combine_chunks())["__rows__"].to_pylist():
            ft = pa.ipc.open_stream(blob).read_all()
            frag_tables.append(ft)
            n_frag += ft.num_rows
    if not frag_tables:
        return interior_out

    if n_frag > frag_cap:  # degenerate edge-pinned mega-groups
        import ray

        frag_ds = ray.data.from_arrow(frag_tables)

        def group_apply(group: pd.DataFrame) -> pd.DataFrame:
            t = pa.Table.from_pandas(group, preserve_index=False)
            starts = np.array([0], dtype=np.int64)
            ends = np.array([t.num_rows], dtype=np.int64)
            return block_fn(t, starts, ends).to_pandas()

        frag_out = frag_ds.groupby(key_col).map_groups(
            group_apply, batch_format="pandas"
        )
        return interior_out.union(frag_out)

    import ray

    tbl = pa.concat_tables(frag_tables).combine_chunks()
    # Re-sort the collected fragments so a group split across blocks is
    # contiguous again, preserving the within-group order.
    order_cols = sort_cols
    sort_keys = [
        (c, "descending" if descending and i > 0 and descending[i - 1] else "ascending")
        for i, c in enumerate(order_cols)
    ]
    tbl = tbl.sort_by(sort_keys)
    keys = tbl[key_col].to_numpy(zero_copy_only=False)
    starts, ends = _segment_bounds(keys)
    frag_out_tbl = block_fn(tbl, starts, ends)
    if frag_out_tbl.num_rows == 0:
        return interior_out
    return interior_out.union(ray.data.from_arrow(frag_out_tbl))


def attach_lookup(
    queries,
    table,
    key_col: str,
    val_cols: list,
    carry_cols: list,
    anti: bool = False,
):
    """Distributed lookup join against a UNIQUE-key table without the
    hash-join operator: table rows (flagged ``__tab__=1``) union with
    query rows, ONE sort on ``(key, __tab__ desc)`` co-locates each key's
    table row at its segment head, and a vectorized gather replicates the
    table row's ``val_cols`` onto the segment's query rows.

    Inner semantics: query rows whose key has no table row are dropped;
    with ``val_cols=[]`` this is a pure existence SEMI-join filter. With
    ``anti=True`` (round 4; requires ``val_cols=[]``) the selection
    inverts: query rows whose key HAS a table row are dropped — a
    distributed anti-join. Table keys must be unique (one row per key);
    queries may repeat keys arbitrarily. Chosen over ``Dataset.join``
    for the same reason the connected-components rounds were (round 3):
    the sort exchanges the same bytes without per-invocation
    aggregator-actor spin-up — and the join operator mishandles empty
    partitions (zero-column blocks feed acero a schemaless left side).

    Returns a Dataset with columns ``[key_col] + carry_cols + val_cols``.
    """
    if anti and val_cols:
        raise ValueError("anti=True cannot attach val_cols")
    q_schema = queries.schema()
    t_schema = table.schema()
    q_types = dict(zip(q_schema.names, q_schema.types))
    t_types = dict(zip(t_schema.names, t_schema.types))
    key_type = q_types[key_col]
    carry_types = [q_types[c] for c in carry_cols]
    val_types = [t_types[c] for c in val_cols]
    names = [key_col] + carry_cols + val_cols + ["__tab__"]

    def q_align(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t[key_col].combine_chunks().cast(key_type)]
            + [t[c].combine_chunks().cast(ct) for c, ct in zip(carry_cols, carry_types)]
            + [pa.nulls(n, vt) for vt in val_types]
            + [pa.array(np.zeros(n, np.int8))],
            names=names,
        )

    def t_align(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t[key_col].combine_chunks().cast(key_type)]
            + [pa.nulls(n, ct) for ct in carry_types]
            + [t[c].combine_chunks().cast(vt) for c, vt in zip(val_cols, val_types)]
            + [pa.array(np.ones(n, np.int8))],
            names=names,
        )

    unioned = queries.map_batches(q_align, batch_format="pyarrow").union(
        table.map_batches(t_align, batch_format="pyarrow")
    )
    out_cols = [key_col] + carry_cols + val_cols
    out_types = [key_type] + carry_types + val_types

    def anti_kernel(
        batch: pa.Table, starts: np.ndarray, ends: np.ndarray
    ) -> pa.Table:
        if len(starts) == 0 or batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], t) for t in out_types], names=out_cols
            )
        tab = batch["__tab__"].to_numpy(zero_copy_only=False)
        lens = (ends - starts).astype(np.int64)
        # keyless-in-table segments: no table row at the head → every row
        # is a query row and survives the anti-join.
        sel = np.flatnonzero(tab[starts.astype(np.int64)] == 0)
        if len(sel) == 0:
            return pa.Table.from_arrays(
                [pa.array([], t) for t in out_types], names=out_cols
            )
        qc = lens[sel]
        gstarts = np.cumsum(qc) - qc
        within = np.arange(int(qc.sum()), dtype=np.int64) - np.repeat(gstarts, qc)
        q_idx = pa.array(np.repeat(starts[sel].astype(np.int64), qc) + within)
        return pa.Table.from_arrays(
            [batch[key_col].take(q_idx)]
            + [batch[c].take(q_idx) for c in carry_cols],
            names=out_cols,
        )

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if len(starts) == 0 or batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], t) for t in out_types], names=out_cols
            )
        tab = batch["__tab__"].to_numpy(zero_copy_only=False)
        lens = (ends - starts).astype(np.int64)
        sel = np.flatnonzero((tab[starts] == 1) & (lens > 1))
        if len(sel) == 0:
            return pa.Table.from_arrays(
                [pa.array([], t) for t in out_types], names=out_cols
            )
        qc = lens[sel] - 1
        gstarts = np.cumsum(qc) - qc
        within = np.arange(int(qc.sum()), dtype=np.int64) - np.repeat(gstarts, qc)
        q_idx = np.repeat(starts[sel] + 1, qc) + within
        t_idx = np.repeat(starts[sel], qc)
        # defensive: a duplicate table key would sort extra table rows
        # right after the head — first wins, the extras are not queries
        is_q = tab[q_idx] == 0
        q_idx, t_idx = q_idx[is_q], t_idx[is_q]
        qi, ti = pa.array(q_idx), pa.array(t_idx)
        return pa.Table.from_arrays(
            [batch[key_col].take(ti)]
            + [batch[c].take(qi) for c in carry_cols]
            + [batch[c].take(ti) for c in val_cols],
            names=out_cols,
        )

    return sorted_segment_apply(
        unioned,
        key_col=key_col,
        block_fn=anti_kernel if anti else kernel,
        within_cols=["__tab__"],
        descending=[True],
    )


def cap_per_key(
    ds,
    key_col: str,
    k: int,
    order_cols: list | None = None,
    descending: list | None = None,
):
    """Keep at most ``k`` rows per key, by ``order_cols`` rank (RefinedWeb-
    style per-domain document caps). Vectorized: after the sort each key's
    winners sit at its segment start, so the cap is a pure gather of
    ``starts + 0..k-1`` — no per-group Python at corpus-proportional key
    counts."""

    def cap_block(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        lens = ends - starts
        idx_parts = [
            (starts + j)[lens > j] for j in range(k)
        ]
        idx = (
            np.sort(np.concatenate(idx_parts))
            if idx_parts
            else np.zeros(0, np.int64)
        )
        return batch.take(pa.array(idx))

    return sorted_segment_apply(
        ds,
        key_col=key_col,
        block_fn=cap_block,
        within_cols=order_cols,
        descending=descending,
    )


def distinct_count_per_key(ds, key_col: str, value_col: str):
    """Exact ``count(DISTINCT value)`` per key as ``(key_col, n_distinct)``
    rows.

    Two-stage shape: a per-block ``(key, value)`` pair dedup (lexsort
    run-length — the exchange carries one row per distinct pair per
    block, never one per occurrence), then ONE ``(key, value)`` sort with
    a change-count segment kernel: within a segment the distinct count is
    ``1 + #(value[i] != value[i-1])``, computed for ALL segments at once
    from one block-wide inequality diff + cumsum. No per-key Python, no
    set materialization.
    """

    def dedup_pairs(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return batch.select([key_col, value_col])
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        new = np.concatenate(([True], (k[1:] != k[:-1]) | (v[1:] != v[:-1])))
        return pa.Table.from_arrays(
            [
                pa.array(k[new], batch.schema.field(key_col).type),
                pa.array(v[new], batch.schema.field(value_col).type),
            ],
            names=[key_col, value_col],
        )

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        ktype = batch.schema.field(key_col).type
        names = [key_col, "n_distinct"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], ktype), pa.array([], pa.int64())], names=names
            )
        keys = batch[key_col].to_numpy(zero_copy_only=False)[starts]
        v = batch[value_col].to_numpy(zero_copy_only=False)
        # changes[i] = 1 where v[i] != v[i-1]; csum differences give the
        # change count inside any [start, end) range.
        changes = np.concatenate(([0], (v[1:] != v[:-1]).astype(np.int64)))
        csum = np.concatenate(([0], np.cumsum(changes)))
        n_distinct = 1 + (csum[ends] - csum[starts + 1])
        return pa.Table.from_arrays(
            [pa.array(keys, ktype), pa.array(n_distinct, pa.int64())],
            names=names,
        )

    deduped = ds.map_batches(dedup_pairs, batch_format="pyarrow")
    return sorted_segment_apply(
        deduped, key_col=key_col, block_fn=kernel, within_cols=[value_col]
    )


def rank_per_key(ds, key_col: str, within_cols: list, carry_cols: list,
                 descending: list | None = None, slot_size: int = 0):
    """Dense 1-based rank of every row WITHIN its key group, ordered by
    ``within_cols`` — one sort, vectorized segment arithmetic, no
    per-group Python (crawl politeness schedules, per-host fetch slots,
    per-domain freshness queues).

    With ``slot_size`` > 0 a ``slot = (rank - 1) // slot_size`` column is
    added — the fetch wave a row lands in when at most ``slot_size``
    concurrent requests per key are allowed. Ordering ties are the
    caller's responsibility (add a unique tiebreak column)."""

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        starts = starts.astype(np.int64)
        ends = ends.astype(np.int64)
        lens = ends - starts
        total = int(lens.sum())
        gstarts = np.cumsum(lens) - lens
        within = np.arange(total, dtype=np.int64) - np.repeat(gstarts, lens)
        idx = np.repeat(starts, lens) + within
        take = pa.array(idx)
        cols = [batch[key_col].take(take)] + [
            batch[c].take(take) for c in carry_cols
        ]
        names = [key_col] + list(carry_cols) + ["rank"]
        cols.append(pa.array((within + 1).astype(np.int64)))
        if slot_size > 0:
            cols.append(pa.array((within // slot_size).astype(np.int64)))
            names.append("slot")
        return pa.Table.from_arrays(cols, names=names)

    return sorted_segment_apply(
        ds, key_col=key_col, block_fn=kernel,
        within_cols=within_cols, descending=descending,
    )


def strip_repeated_lines(
    ds,
    id_col: str = "doc_id",
    page_col: str = "page_no",
    text_col: str = "text",
    min_pages: int = 3,
):
    """Header/footer removal for paginated documents: a line appearing on
    ``>= min_pages`` DISTINCT pages of the same document is chrome
    (running header, footer, page furniture) and is dropped from every
    page; remaining lines keep their order. The within-document twin of
    the cross-document paragraph dedup (``ops/text.py:paragraph_dedup``)
    — the reference's page-header concern (assemble.py) inverted into
    removal.

    Shape: all pages of a document must co-locate, so the honest exchange
    is ONE (doc, page) sort; each complete document segment then resolves
    in one pass — line counting via a per-segment dict (documents are
    page-bounded; the per-document Python loop is over ITS OWN pages,
    never the corpus). Emits ``(id, page, cleaned_text, n_dropped)``.
    """

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        names = [id_col, page_col, "cleaned_text", "n_dropped"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], id_type),
                    pa.array([], pa.int64()),
                    pa.array([], pa.string()),
                    pa.array([], pa.int64()),
                ],
                names=names,
            )
        ids = batch[id_col].to_pylist()
        pages = batch[page_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_pg, out_tx, out_dp = [], [], [], []
        for s, e in zip(starts, ends):
            page_count: dict[str, int] = {}
            for i in range(s, e):
                for ln in set((texts[i] or "").split("\n")):
                    page_count[ln] = page_count.get(ln, 0) + 1
            chrome = {ln for ln, c in page_count.items() if c >= min_pages}
            for i in range(s, e):
                lines = (texts[i] or "").split("\n")
                kept = [ln for ln in lines if ln not in chrome]
                out_id.append(ids[i])
                out_pg.append(pages[i])
                out_tx.append("\n".join(kept))
                out_dp.append(len(lines) - len(kept))
        return pa.Table.from_arrays(
            [
                pa.array(out_id, id_type),
                pa.array(out_pg, pa.int64()),
                pa.array(out_tx, pa.string()),
                pa.array(out_dp, pa.int64()),
            ],
            names=names,
        )

    return sorted_segment_apply(
        ds, key_col=id_col, block_fn=kernel, within_cols=[page_col]
    )


def mode_per_key(ds, key_col: str, value_col: str):
    """Exact mode — the most frequent ``value_col`` per key (ties → min
    value) with its count: ``(key, mode, mode_count)``. The categorical
    aggregate Ray Data lacks natively (dominant language per host,
    majority label per cluster).

    Two-stage: per-block pre-combined ``(key, value, cnt)`` partials fold
    through one groupby-sum (the exchange carries distinct pairs per
    block, never rows), then ONE (key, cnt desc, value asc) sort with a
    segment-head gather picks each key's argmax.
    """
    from ray.data.aggregate import Sum

    def pair_partial(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_col].to_pylist(), dtype=object)
        v = np.asarray(batch[value_col].to_pylist(), dtype=object)
        keep = np.array([x is not None and y is not None for x, y in zip(k, v)])
        if keep.any():
            k, v = k[keep], v[keep]
        else:
            k = v = np.array([], dtype=object)
        comp = np.char.add(
            np.char.add(k.astype(str), "\x1f"), v.astype(str)
        )
        u, c = np.unique(comp, return_counts=True)
        parts = np.char.partition(u.astype(str), "\x1f")
        return pa.Table.from_arrays(
            [
                pa.array(parts[:, 0].astype(object), pa.string()),
                pa.array(parts[:, 2].astype(object), pa.string()),
                pa.array(c, pa.int64()),
            ],
            names=["k", "v", "cnt"],
        )

    totals = (
        ds.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["k", "v"])
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["k", "v", "cnt"]),
            batch_format="pyarrow",
        )
    )

    def head(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        names = [key_col, "mode", "mode_count"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.string()),
                 pa.array([], pa.int64())],
                names=names,
            )
        take = pa.array(starts)
        return pa.Table.from_arrays(
            [batch["k"].take(take), batch["v"].take(take),
             batch["cnt"].take(take)],
            names=names,
        )

    return sorted_segment_apply(
        totals, key_col="k", block_fn=head,
        within_cols=["cnt", "v"], descending=[True, False],
    )
