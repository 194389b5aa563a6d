"""Ordered-funnel analysis over an event stream (view → click → purchase).

The classic web-analytics sequence query: for each user, how far along an
ordered step list did they get, where step *i+1* must occur STRICTLY
after the chosen (earliest) occurrence of step *i*. One ``(user, ts)``
sort — the honest exchange; every user's events are then a contiguous
ts-ordered segment — followed by a per-block kernel that is vectorized
ACROSS segments: per step it does one eligibility mask, one
``np.minimum.reduceat`` over the re-packed segment ranges, and one
gather. The step list is a constant-length loop; there is no per-user
Python.

Timestamp-tie semantics are exact and SQL-replicable: the next step's
event must satisfy ``ts > t_prev`` (not "later in the sort"), so equal
timestamps never advance the funnel — the oracle states the same rule
with nested ``min(ts)`` CTEs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .segments import sorted_segment_apply


def funnel_stages(
    ds,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
):
    """Dataset of ``(user_col, stage)`` — ``stage`` = number of funnel
    steps completed in order (0 … len(steps)); every user with ≥1 event
    appears."""
    steps = tuple(steps)

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        utype = batch.schema.field(user_col).type
        names = [user_col, "stage"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], utype), pa.array([], pa.int32())], names=names
            )
        users = batch[user_col].to_numpy(zero_copy_only=False)[starts]
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        ts_i = ts.view("i8") if ts.dtype.kind == "M" else ts.astype(np.int64)
        types = batch[type_col].to_numpy(zero_copy_only=False).astype(str)
        code = np.full(len(batch), -1, np.int64)
        for si, s in enumerate(steps):
            code[types == s] = si

        # Re-pack the complete segments contiguously so one reduceat per
        # step covers exactly the segment ranges (complete segments need
        # not tile the block — straddling head/tail rows are deferred).
        seg_len = ends - starts
        offsets = np.concatenate(([0], np.cumsum(seg_len)))
        total = int(offsets[-1])
        seg_of = np.repeat(np.arange(len(starts)), seg_len)
        rowpos = (
            np.arange(total) - np.repeat(offsets[:-1], seg_len)
            + np.repeat(starts, seg_len)
        )
        tsr, coder = ts_i[rowpos], code[rowpos]
        loc = np.arange(total)

        alive = np.ones(len(starts), dtype=bool)
        cur_t = np.full(len(starts), np.iinfo(np.int64).min)
        stage = np.zeros(len(starts), np.int32)
        for si in range(len(steps)):
            elig = (coder == si) & (tsr > cur_t[seg_of]) & alive[seg_of]
            cand = np.where(elig, loc, total)
            firsts = np.minimum.reduceat(cand, offsets[:-1])
            found = firsts < offsets[1:]
            stage += found.astype(np.int32)
            hit = np.minimum(firsts, total - 1)
            cur_t = np.where(found, tsr[hit], cur_t)
            alive &= found
        return pa.Table.from_arrays(
            [pa.array(users, utype), pa.array(stage, pa.int32())], names=names
        )

    return sorted_segment_apply(
        ds, key_col=user_col, block_fn=kernel, within_cols=[ts_col]
    )


def cohort_retention(
    ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = 7 * 24 * 3600 * 1_000_000,
):
    """Cohort retention matrix: users are cohorted by the period of their
    FIRST event; for every (cohort, offset) cell, count the distinct
    users of that cohort active ``offset`` periods later.

    Composition of existing exchanges — nothing new moves at scale:

    1. per-block ``(user, period)`` pair dedup (one row per distinct pair
       per block enters any exchange),
    2. one ``groupby(user, period)`` makes the pairs GLOBALLY distinct
       (the block dedup only bounds what this exchange carries),
    3. ``groupby(user).min(period)`` → the per-user cohort table
       (user-cardinality-sized),
    4. one :func:`..ops.segments.attach_lookup` sort join replicates each
       user's cohort onto their activity pairs; the final
       ``groupby(cohort, offset).count()`` is then a distinct-user count.

    Returns a Dataset of ``(cohort, offset, n_users)``.
    """
    from ray.data.aggregate import Count, Min

    from .segments import attach_lookup

    def pairs(batch: pa.Table) -> pa.Table:
        u = batch[user_col].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        ts_i = ts.view("i8") if ts.dtype.kind == "M" else ts.astype(np.int64)
        p = ts_i // period_us
        if len(u) == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], batch.schema.field(user_col).type),
                    pa.array([], pa.int64()),
                ],
                names=[user_col, "period"],
            )
        order = np.lexsort((p, u))
        u, p = u[order], p[order]
        new = np.concatenate(([True], (u[1:] != u[:-1]) | (p[1:] != p[:-1])))
        return pa.Table.from_arrays(
            [
                pa.array(u[new], batch.schema.field(user_col).type),
                pa.array(p[new], pa.int64()),
            ],
            names=[user_col, "period"],
        )

    activity = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby([user_col, "period"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda b: b.select([user_col, "period"]), batch_format="pyarrow"
        )
    )
    cohorts = (
        activity.groupby(user_col)
        .aggregate(Min("period", alias_name="cohort"))
    )
    joined = attach_lookup(
        activity, cohorts, key_col=user_col,
        val_cols=["cohort"], carry_cols=["period"],
    )

    def offset_col(batch: pa.Table) -> pa.Table:
        off = pa.array(
            batch["period"].to_numpy() - batch["cohort"].to_numpy(), pa.int64()
        )
        return pa.Table.from_arrays(
            [batch["cohort"], off], names=["cohort", "offset"]
        )

    return (
        joined.map_batches(offset_col, batch_format="pyarrow")
        .groupby(["cohort", "offset"])
        .aggregate(Count(alias_name="n_users"))
    )


def transition_counts(
    ds,
    k: int = 25,
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
):
    """Markov transition heavy hitters: the ``k`` most frequent adjacent
    ``(src, dst)`` state pairs across all per-user ordered event streams
    (first-order clickstream transition matrix, trimmed to its head) —
    ranked by (count desc, src, dst). Returns a pandas DataFrame
    ``(src, dst, cnt, rank)``.

    Shape: ONE sort by (user, ts, state) under the sorted-segment
    scaffold; the kernel reads adjacency vectorized off the sorted block
    (positions not at a segment start pair with their predecessor) and
    pre-combines pair counts per block before one pair-vocabulary
    ``groupby``; top-k is per-block partials merged from blocks × k
    rows. Equal timestamps tie-break by state for determinism (the
    oracle mirrors the same ORDER BY)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .segments import sorted_segment_apply

    def project(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        return pa.Table.from_arrays(
            [batch[user_col], ts.combine_chunks(), batch[state_col]],
            names=[user_col, "ts_us", "state"],
        )

    rows = ds.map_batches(project, batch_format="pyarrow", batch_size=None)

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if len(starts) == 0 or batch.num_rows < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["pair", "cnt"],
            )
        st = np.asarray(batch["state"].to_pylist(), dtype=object)
        # adjacency positions: every covered row except each segment head,
        # via one coverage prefix sum (no per-segment Python)
        n = batch.num_rows
        cover = np.zeros(n + 1, np.int64)
        np.add.at(cover, starts, 1)
        np.add.at(cover, ends, -1)
        inseg = np.cumsum(cover[:n]) > 0
        head_pos = np.zeros(n, bool)
        head_pos[starts] = True
        idx = np.flatnonzero(inseg & ~head_pos)
        if len(idx) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["pair", "cnt"],
            )
        keys = np.char.add(
            np.char.add(st[idx - 1].astype(str), "\x1f"), st[idx].astype(str)
        )
        u, c = np.unique(keys, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(object), pa.string()),
             pa.array(c.astype(np.int64))],
            names=["pair", "cnt"],
        )

    partials = sorted_segment_apply(
        rows, user_col, kernel, within_cols=["ts_us", "state"]
    )
    totals = partials.groupby("pair").aggregate(Sum("cnt"))

    def topk_partial(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["pair"].to_pylist(), dtype=object)
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, -c))[:k]
        return pa.Table.from_arrays(
            [pa.array(p[order].astype(str), pa.string()),
             pa.array(c[order], pa.int64())],
            names=["pair", "cnt"],
        )

    head = totals.map_batches(
        topk_partial, batch_format="pyarrow", batch_size=None
    ).take_all()  # <= blocks x k
    head.sort(key=lambda r: (-r["cnt"], r["pair"]))
    head = head[:k]
    return pd.DataFrame(
        {
            "src": [r["pair"].split("\x1f", 1)[0] for r in head],
            "dst": [r["pair"].split("\x1f", 1)[1] for r in head],
            "cnt": [r["cnt"] for r in head],
            "rank": list(range(1, len(head) + 1)),
        }
    ).astype({"cnt": "int64", "rank": "int32"})
