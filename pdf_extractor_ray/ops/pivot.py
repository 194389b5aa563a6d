"""Pivot (long → wide) aggregation: per-key counts of a LOW-CARDINALITY
category column as one wide row per key — the reporting shape every
analytics surface ends in (per-user event-type counts, per-host status
mix, per-source language mix).

Shape: per-block (key, cat) count partials pre-combine before ONE
``groupby(key, cat).sum`` (the exchange carries distinct pairs, never
rows), the category VOCABULARY — bounded by ``cat_cap``, categories
are enums by contract — is collected once and fixes the output column
order, and a :func:`..ops.segments.sorted_segment_apply` kernel
scatters each key's counts into its wide row with one
``np.add.at`` over (segment-index, searchsorted-column) pairs — no
per-key Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pivot_counts(
    ds,
    key_col: str,
    cat_col: str,
    prefix: str = "n_",
    cat_cap: int = 10_000,
):
    """One row per ``key_col`` with a ``{prefix}{category}`` int64
    count column per distinct category (sorted category order fixes
    the schema). Raises if the category vocabulary exceeds
    ``cat_cap`` — pivot columns are a SCHEMA, and a schema derived
    from an unbounded column is a bug upstream, not a bigger pivot.
    """
    from ray.data.aggregate import Sum

    from .segments import sorted_segment_apply

    def partials(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cats = np.asarray(batch[cat_col].to_pylist(), dtype=object).astype(str)
        comp = np.char.add(np.char.add(keys.astype(str), "\x1f"), cats)
        uniq, inv = np.unique(comp, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        parts = np.char.partition(uniq.astype(str), "\x1f")
        return pa.Table.from_arrays(
            [
                pa.array(parts[:, 0].astype(np.int64), pa.int64()),
                pa.array(parts[:, 2].astype(object), pa.string()),
                pa.array(cnt, pa.int64()),
            ],
            names=["key", "cat", "n"],
        )

    pairs = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["key", "cat"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.rename_columns(["key", "cat", "n"]),
            batch_format="pyarrow",
        )
    )

    from ray.data.aggregate import Count

    cat_rows = (
        pairs.groupby("cat")
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda b: b.select(["cat"]), batch_format="pyarrow")
        .take_all()
    )
    if len(cat_rows) > cat_cap:
        raise RuntimeError(
            f"pivot_counts: {len(cat_rows)} categories exceed cat_cap="
            f"{cat_cap} — pivot columns are a schema; bound the category "
            "column upstream"
        )
    cats = np.sort(np.asarray([r["cat"] for r in cat_rows], dtype=object))
    col_names = [key_col] + [f"{prefix}{c}" for c in cats]

    def widen(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()) for _ in col_names], names=col_names
            )
        key = batch["key"].to_numpy(zero_copy_only=False)
        cat = np.asarray(batch["cat"].to_pylist(), dtype=object).astype(str)
        n = batch["n"].to_numpy(zero_copy_only=False)
        seg = np.zeros(len(key), np.int64)
        seg[starts] = 1
        seg = np.cumsum(seg) - 1
        col = np.searchsorted(cats.astype(str), cat)
        mat = np.zeros((len(starts), len(cats)), np.int64)
        inside = np.zeros(len(key), bool)
        for_slices = np.zeros(len(key) + 1, np.int64)
        for_slices[starts] += 1
        for_slices[ends] -= 1
        inside = np.cumsum(for_slices[:-1]) > 0
        np.add.at(mat, (seg[inside], col[inside]), n[inside])
        return pa.Table.from_arrays(
            [pa.array(key[starts], pa.int64())]
            + [pa.array(mat[:, j], pa.int64()) for j in range(len(cats))],
            names=col_names,
        )

    return sorted_segment_apply(
        pairs, key_col="key", block_fn=widen, within_cols=["cat"]
    )
