"""Integer crawl-budget apportionment across hosts (largest remainder).

A polite recrawl plans "fetch B pages this cycle" and must divide B across
hosts in proportion to their page counts (or priority weights) — the exact
apportionment problem. Hamilton's largest-remainder method is used because
it is integer-exact and SQL-replicable: every host gets
``floor(B * w_h / W)``, then the ``B - sum(base)`` hosts with the largest
remainders (ties → key asc) get one extra.

Exchange shape: ONE groupby-sum over (key, weight) rows (hosts-sized,
never pages-sized); the apportionment itself is vectorized over the host
table. The host table is collected to the driver under ``key_cap`` —
beyond it the rank step would become a distributed sort over (remainder,
key) (the engine's rank_per_key shape); that regime raises until needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def apportion_budget(
    ds,
    budget: int,
    key_col: str = "host",
    weight_col: str = "n_pages",
    key_cap: int = 5_000_000,
) -> pa.Table:
    """→ one row per key: ``(key, weight, base, extra, alloc)`` with
    ``sum(alloc) == min(budget, ...)`` exactly (allocations can exceed
    weight for tiny corpora; callers cap downstream if fetches must not
    exceed inventory)."""
    if budget < 0:
        raise ValueError("apportion_budget: budget must be >= 0")
    from ray.data.aggregate import Sum

    totals = ds.groupby(key_col).aggregate(Sum(weight_col))
    if totals.count() > key_cap:
        return _apportion_distributed(
            totals, budget, key_col, weight_col
        )
    rows = pa.concat_tables(
        list(totals.iter_batches(batch_format="pyarrow"))
    )
    keys = np.asarray(rows[key_col].to_pylist(), dtype=object)
    w = rows[f"sum({weight_col})"].to_numpy(zero_copy_only=False).astype(object)
    order = np.argsort(keys)
    keys, w = keys[order], w[order]
    W = int(sum(w))
    if W == 0 or len(keys) == 0:
        base = np.zeros(len(keys), dtype=np.int64)
        extra = np.zeros(len(keys), dtype=np.int64)
    else:
        # exact big-int arithmetic over the host table (bounded by key_cap)
        base = np.array([(budget * int(x)) // W for x in w], dtype=np.int64)
        rem = np.array([(budget * int(x)) % W for x in w], dtype=object)
        n_extra = budget - int(base.sum())
        # largest remainder first, ties by key asc
        rank = np.lexsort((keys, np.array([-int(r) for r in rem])))
        extra = np.zeros(len(keys), dtype=np.int64)
        extra[rank[:n_extra]] = 1
    return pa.Table.from_arrays(
        [
            pa.array(keys.astype(object), pa.string()),
            pa.array(np.array([int(x) for x in w], dtype=np.int64)),
            pa.array(base),
            pa.array(extra),
            pa.array(base + extra),
        ],
        names=[key_col, weight_col, "base", "extra", "alloc"],
    )


def _apportion_distributed(totals, budget: int, key_col: str, weight_col: str):
    """Over-``key_cap`` regime: nothing key-table-sized on the driver.
    ``W`` and ``sum(base)`` come from scalar aggregates; per-key base and
    remainder compute vectorized per block; the ``n_extra`` winners are
    the head of ONE (remainder desc, key asc) sort — bounded by the
    budget, the operationally small number — broadcast back as an
    ``is_in`` set. Returns a Dataset with the same columns as the
    driver-side regime."""
    import ray

    wcol = f"sum({weight_col})"
    W = int(totals.sum(wcol) or 0)
    if W == 0:
        def zero(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            z = pa.array(np.zeros(n, np.int64))
            return pa.Table.from_arrays(
                [batch[key_col].combine_chunks(),
                 batch[wcol].combine_chunks().cast(pa.int64()), z, z, z],
                names=[key_col, weight_col, "base", "extra", "alloc"],
            )

        return totals.map_batches(zero, batch_format="pyarrow")

    def base_rem(batch: pa.Table) -> pa.Table:
        w = batch[wcol].to_numpy(zero_copy_only=False).astype(object)
        base = np.array([(budget * int(x)) // W for x in w], dtype=np.int64)
        rem = np.array([(budget * int(x)) % W for x in w], dtype=np.int64)
        return pa.Table.from_arrays(
            [
                batch[key_col].combine_chunks().cast(pa.string()),
                pa.array(np.array([int(x) for x in w], dtype=np.int64)),
                pa.array(base),
                pa.array(rem),
            ],
            names=[key_col, weight_col, "base", "rem"],
        )

    scored = totals.map_batches(base_rem, batch_format="pyarrow").materialize()
    n_extra = budget - int(scored.sum("base") or 0)
    if n_extra > 0:
        winners = scored.sort(["rem", key_col], descending=[True, False]).limit(
            n_extra
        )
        wkeys = pa.concat_arrays(
            [
                c
                for b in winners.iter_batches(batch_format="pyarrow")
                for c in b.column(key_col).chunks
                if len(c)
            ]
        )
        wref = ray.put(wkeys)
    else:
        wref = None

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if wref is not None:
            extra = pc.is_in(
                batch[key_col], value_set=ray.get(wref)
            ).cast(pa.int64())
        else:
            extra = pa.array(np.zeros(batch.num_rows, np.int64))
        alloc = pc.add(batch["base"], extra)
        return pa.Table.from_arrays(
            [
                batch[key_col].combine_chunks(),
                batch[weight_col].combine_chunks(),
                batch["base"].combine_chunks(),
                extra.combine_chunks() if isinstance(extra, pa.ChunkedArray) else extra,
                alloc.combine_chunks() if isinstance(alloc, pa.ChunkedArray) else alloc,
            ],
            names=[key_col, weight_col, "base", "extra", "alloc"],
        )

    return scored.map_batches(finish, batch_format="pyarrow")
