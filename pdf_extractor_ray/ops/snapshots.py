"""Crawl-snapshot operators: latest-version-per-url and snapshot diffing.

A recrawl corpus holds many captures of the same url at different
``warc_ts``. Two operations dominate snapshot hygiene at 100 TB:

* ``latest_per_key`` — keep each url's newest capture WITHOUT shuffling
  payloads: only the (key, ts) pair rides the exchange (the same
  small-columns-through-the-shuffle regime as ``exact_dedup_large``,
  ops/dedup.py:70); winners come back as a broadcast (key, max_ts) set the
  full rows are semi-joined against. At winner-set sizes beyond broadcast
  reach, swap the set for the hash-partitioned semi-join (joins.py note) —
  the winning-(key,ts) table is one row per url, the strictly smaller side.

* ``snapshot_diff`` — classify urls across two snapshots as
  added / removed / changed / same. Each side is projected to
  (key, content-hash) inside ``map_batches`` (payloads never shuffle),
  tagged, unioned, and resolved per key from per-side partials.

Both shapes scale as O(distinct urls) exchange volume, never O(bytes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _key_ts(batch_keys, batch_ts) -> pa.Array:
    """Composite (key, ts) match token — ts rendered as fixed-width int."""
    return pa.array(
        [f"{k}\x00{t}" for k, t in zip(batch_keys, batch_ts)], pa.string()
    )


def latest_per_key(ds, key_col: str = "url", ts_col: str = "warc_ts"):
    """Keep each key's max-``ts_col`` row. Requires ts unique per key
    (capture timestamps are; assert cheaply via the winners count).

    Stage 1 shuffles ONLY (key, ts): per-batch partial max (combiner) →
    tiny ``groupby().max()``. Stage 2 semi-joins the full rows against the
    broadcast winner set — payload columns never leave their blocks.
    """
    import ray

    def partial_max(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": batch[key_col].to_pylist(),
                "t": batch[ts_col].cast(pa.int64()).to_numpy(),
            }
        )
        g = df.groupby("k", sort=False)["t"].max().reset_index()
        return pa.Table.from_arrays(
            [pa.array(g["k"], pa.string()), pa.array(g["t"], pa.int64())],
            names=["k", "t"],
        )

    winners = (
        ds.select_columns([key_col, ts_col])
        .map_batches(partial_max, batch_format="pyarrow")
        .groupby("k")
        .max("t")
    ).to_pandas()
    tokens = ray.put(
        pa.array(
            [f"{k}\x00{t}" for k, t in zip(winners["k"], winners["max(t)"])],
            pa.string(),
        )
    )

    def keep_winners(batch: pa.Table) -> pa.Table:
        tok = _key_ts(
            batch[key_col].to_pylist(),
            batch[ts_col].cast(pa.int64()).to_pylist(),
        )
        return batch.filter(pc.is_in(tok, value_set=ray.get(tokens)))

    return ds.map_batches(keep_winners, batch_format="pyarrow")


def _hash_side(ds, key_col: str, content_col: str, side: int):
    """Project one snapshot to (key, side, content sha1-prefix int64)."""

    def project(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        contents = batch[content_col].to_pylist()
        hashes = np.fromiter(
            (
                int.from_bytes(
                    hashlib.sha1(
                        c.encode() if isinstance(c, str) else bytes(c or b"")
                    ).digest()[:8],
                    "big",
                    signed=True,
                )
                for c in contents
            ),
            dtype=np.int64,
            count=len(contents),
        )
        return pa.Table.from_arrays(
            [
                pa.array(keys, pa.string()),
                pa.array(np.full(len(keys), side, dtype=np.int8)),
                pa.array(hashes),
            ],
            names=["k", "side", "h"],
        )

    return ds.map_batches(project, batch_format="pyarrow")


def snapshot_diff(old_ds, new_ds, key_col: str = "url", content_col: str = "text"):
    """→ Dataset of (key, status) with status ∈ added|removed|changed|same.

    Payloads reduce to 8-byte hashes inside ``map_batches``; the single
    exchange is a groupby over (key, side, hash) rows. Per-key resolution
    is vectorized over each group (one url appears at most once per side).
    """
    from ray.data.aggregate import Max, Min, Sum

    tagged = _hash_side(old_ds, key_col, content_col, 1).union(
        _hash_side(new_ds, key_col, content_col, 2)
    )
    # side codes 1|2 → sum 1 = old only, 2 = new only, 3 = both; for both,
    # same ⇔ min(h) == max(h). Zero per-group Python: one aggregate + a
    # vectorized case afterwards.
    agg = tagged.groupby("k").aggregate(Sum("side"), Min("h"), Max("h"))

    def classify(batch: pa.Table) -> pa.Table:
        s = batch["sum(side)"].to_numpy()
        same = pc.equal(batch["min(h)"], batch["max(h)"]).to_numpy(zero_copy_only=False)
        status = np.where(
            s == 1, "removed",
            np.where(s == 2, "added", np.where(same, "same", "changed")),
        )
        return pa.Table.from_arrays(
            [batch["k"], pa.array(status.tolist(), pa.string())],
            names=["url", "status"],
        )

    return agg.map_batches(classify, batch_format="pyarrow")
