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
