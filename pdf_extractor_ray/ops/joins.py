"""As-of join: each left row matched to the latest right row at or before
its timestamp, per key.

Ray Data has no native as-of join; the idiom (per the guide) is a keyed
co-group: align both sides to one unified schema, tag, union,
``groupby(key).map_groups`` with an in-group ``pd.merge_asof`` over
time-sorted frames. The shuffle carries only the projected join columns.
Skew note: a hot key's group is one task — salt hot keys into time-range
sub-buckets if a single key's history exceeds task memory.

Determinism: the right side is deduplicated to one row per (key, ts) with a
deterministic winner before joining, so timestamp ties cannot produce
run-dependent matches.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def broadcast_semi_join(ds, keys, key_col: str, anti: bool = False):
    """Semi (or anti) join against a broadcast key set.

    The small side's keys are ``ray.put`` once and each batch filters with a
    vectorized ``is_in`` — no shuffle (the guide's semi/anti idiom; swap the
    set for a Bloom filter at key-set sizes beyond broadcast reach — false
    positives then only let extra rows through a later exact check, never
    drop rows).
    """
    import ray

    keys_ref = ray.put(pa.array(sorted(set(keys))))

    def filter_batch(batch: pa.Table) -> pa.Table:
        value_set = ray.get(keys_ref)
        mask = pa.compute.is_in(batch[key_col], value_set=value_set)
        if anti:
            mask = pa.compute.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(filter_batch, batch_format="pyarrow")


def broadcast_range_join(
    ds,
    intervals,
    value_col: str,
    label_col: str = "band",
    how: str = "inner",
):
    """Range (interval) join against a broadcast interval table: each row
    whose ``value_col`` falls inside a half-open interval ``[lo, hi)``
    gets that interval's label attached.

    ``intervals`` is a small list of ``(lo, hi, label)`` tuples — the
    broadcast-small-side case that covers the overwhelming share of real
    range joins (IP→geo ranges, time windows, price/size bands): the
    table is ``ray.put`` once, each batch does ONE ``np.searchsorted``
    against the sorted interval starts — no shuffle, no per-row Python.
    Intervals must be sorted and non-overlapping (validated eagerly);
    overlapping-interval workloads decompose into disjoint elementary
    intervals first (standard interval flattening) — by construction the
    searchsorted probe is then exact.

    ``how="inner"`` drops rows outside every interval; ``how="left"``
    keeps them with a null label. NaN / null values never match (they
    compare false against ``hi``), matching SQL ``BETWEEN`` semantics.
    """
    import numpy as np
    import ray

    ivs = sorted(intervals)
    for (lo1, hi1, _), (lo2, _, _) in zip(ivs, ivs[1:]):
        if hi1 > lo2:
            raise ValueError(f"overlapping intervals: [{lo1},{hi1}) and lo={lo2}")
    for lo, hi, _ in ivs:
        if not lo < hi:
            raise ValueError(f"empty interval [{lo},{hi})")
    los = np.array([i[0] for i in ivs], dtype=np.float64)
    his = np.array([i[1] for i in ivs], dtype=np.float64)
    labels = [i[2] for i in ivs]
    ref = ray.put((los, his, labels))

    def assign(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b_los, b_his, b_labels = ray.get(ref)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(b_los, v, side="right") - 1
        safe = np.clip(idx, 0, len(b_his) - 1)
        with np.errstate(invalid="ignore"):
            ok = (idx >= 0) & (v < b_his[safe])
        lab = np.where(ok, np.array(b_labels, object)[safe], None)
        out = batch.append_column(label_col, pa.array(lab, pa.string()))
        if how == "inner":
            out = out.filter(pa.array(ok))
        return out

    return ds.map_batches(assign, batch_format="pyarrow")


def asof_join_salted(
    left_ds,
    right_ds,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tiebreak_col: str | None = None,
    bucket: str = "365D",
):
    """Hot-key-safe as-of join: co-groups on ``(key, time-bucket)`` instead
    of the bare key, so one key's entire history never lands in a single
    task — the salting strategy :func:`asof_join`'s docstring promises.

    Boundary handling (a left row whose match lives in an earlier bucket):
    per ``(key, bucket)`` the right side's LAST row becomes a summary
    (groups bounded by the bucket span), then ONE per-key pass over the
    summaries + the left side's bucket inventory (groups = #buckets per
    key — bounded by time-range/bucket, never by row count) injects "the
    latest right row before this bucket" as a carry row into every bucket
    the left side touches. Row-identical to :func:`asof_join` (tested).
    """
    import pyarrow.compute as pc

    bucket_us = int(pd.Timedelta(bucket).value) // 1000
    tb = tiebreak_col or right_value_cols[0]

    def add_ckey(ts_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            ts_us = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
            b = pc.divide(ts_us, pa.scalar(bucket_us, pa.int64()))
            ck = pc.binary_join_element_wise(
                pc.cast(batch[key_col], pa.string()),
                pc.cast(b, pa.string()),
                "|",
            )
            return batch.append_column("__bucket", b).append_column("__ckey", ck)

        return fn

    left = left_ds.map_batches(add_ckey(left_ts), batch_format="pyarrow")
    right = right_ds.map_batches(add_ckey(right_ts), batch_format="pyarrow")

    # Last right row per (key, bucket) — the bucket summary.
    def last_row(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values([right_ts, tb]).tail(1)

    sum_cols = [key_col, "__bucket", right_ts, *right_value_cols]
    summaries = (
        right.groupby("__ckey")
        .map_groups(last_row, batch_format="pandas")
        .map_batches(lambda t: t.select(sum_cols), batch_format="pyarrow")
    )

    # Distinct (key, bucket) pairs the LEFT side touches (vectorized Count
    # aggregate — no per-group Python).
    from ray.data.aggregate import Count

    lb = (
        left.map_batches(
            lambda t: t.select([key_col, "__bucket"]), batch_format="pyarrow"
        )
        .groupby([key_col, "__bucket"])
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
    )

    right_schema = right_ds.schema()
    right_types = dict(zip(right_schema.names, right_schema.types))
    right_types["__bucket"] = pa.int64()

    def tag(is_sum: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch
            for c in sum_cols:
                if c not in t.schema.names:
                    t = t.append_column(c, pa.nulls(len(t), right_types[c]))
            return t.select(sum_cols).append_column(
                "__is_sum", pa.array([is_sum] * len(t), pa.int8())
            )

        return fn

    # Per-key prefix pass: for every left bucket, carry in the latest
    # summary from any strictly earlier bucket.
    def carries_for(group: pd.DataFrame) -> pd.DataFrame:
        sums = group[group["__is_sum"] == 1].sort_values("__bucket")
        wanted = sorted(group.loc[group["__is_sum"] == 0, "__bucket"].unique())
        out = []
        for b in wanted:
            prev = sums[sums["__bucket"] < b]
            if len(prev):
                carry = prev.tail(1).copy()
                carry["__bucket"] = b
                out.append(carry)
        base = sums.head(0)
        result = pd.concat(out, ignore_index=True) if out else base
        return result.drop(columns=["__is_sum"])

    carry_rows = (
        summaries.map_batches(tag(1), batch_format="pyarrow")
        .union(lb.map_batches(tag(0), batch_format="pyarrow"))
        .groupby(key_col)
        .map_groups(carries_for, batch_format="pandas")
    )

    def with_ckey(batch: pa.Table) -> pa.Table:
        ck = pc.binary_join_element_wise(
            pc.cast(batch[key_col], pa.string()),
            pc.cast(batch["__bucket"], pa.string()),
            "|",
        )
        return batch.append_column("__ckey", ck)

    right_aug = right.map_batches(
        lambda t: t.select(sum_cols + ["__ckey"]), batch_format="pyarrow"
    ).union(carry_rows.map_batches(with_ckey, batch_format="pyarrow"))

    out = asof_join(
        left,
        right_aug,
        key_col="__ckey",
        left_ts=left_ts,
        right_ts=right_ts,
        right_value_cols=right_value_cols,
        tiebreak_col=tiebreak_col,
    )
    return out.drop_columns(["__bucket", "__ckey"])


def asof_join(
    left_ds,
    right_ds,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tiebreak_col: str | None = None,
):
    """``left`` rows matched to the latest ``right`` row with
    ``right_ts <= left_ts`` for the same key; unmatched left rows keep
    nulls in the right-value columns. Output = left columns +
    ``right_value_cols``.
    """
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    right_types = {
        name: dtype for name, dtype in zip(right_schema.names, right_schema.types)
    }
    unified = (
        [(c, t) for c, t in zip(left_cols, left_schema.types)]
        + [(right_ts, right_types[right_ts])]
        + [(c, right_types[c]) for c in right_value_cols]
    )

    def align_left(batch: pa.Table) -> pa.Table:
        arrays = []
        for name, dtype in unified:
            if name in batch.schema.names:
                arrays.append(batch[name])
            else:
                arrays.append(pa.nulls(len(batch), dtype))
        arrays.append(pa.array(["L"] * len(batch)))
        return pa.Table.from_arrays(arrays, names=[n for n, _ in unified] + ["__side"])

    def align_right(batch: pa.Table) -> pa.Table:
        arrays = []
        for name, dtype in unified:
            if name == key_col or name == right_ts or name in right_value_cols:
                arrays.append(batch[name])
            else:
                arrays.append(pa.nulls(len(batch), dtype))
        arrays.append(pa.array(["R"] * len(batch)))
        return pa.Table.from_arrays(arrays, names=[n for n, _ in unified] + ["__side"])

    left = left_ds.map_batches(align_left, batch_format="pyarrow")
    right = right_ds.map_batches(align_right, batch_format="pyarrow")

    def join_group(group: pd.DataFrame) -> pd.DataFrame:
        lhs = group[group["__side"] == "L"]
        rhs = group[group["__side"] == "R"]
        lhs = lhs[left_cols].sort_values([left_ts] + [key_col]).reset_index(drop=True)
        if lhs.empty:
            return lhs
        if rhs.empty:
            out = lhs.copy()
            for col in right_value_cols:
                out[col] = None
            return out
        rhs = rhs[[right_ts, *right_value_cols]]
        # Deterministic dedupe: one row per ts, max tiebreak (or max first
        # value column) wins.
        tb = tiebreak_col or right_value_cols[0]
        rhs = (
            rhs.sort_values([right_ts, tb])
            .groupby(right_ts, as_index=False)
            .tail(1)
            .sort_values(right_ts)
            .reset_index(drop=True)
        )
        out = pd.merge_asof(
            lhs, rhs, left_on=left_ts, right_on=right_ts, direction="backward"
        )
        return out.drop(columns=[right_ts])

    return (
        left.union(right).groupby(key_col).map_groups(join_group, batch_format="pandas")
    )
