"""Size-balanced output sharding via a distributed prefix sum.

Writing 100 TB as resumable Parquet needs a shard plan: assign documents
(in a stable global order) to fixed-byte-budget shards, so each shard is
an independently writable, restartable unit. The core primitive is a
global *exclusive prefix sum* of per-document sizes — computed here with
the classic three-step parallel scan, never materializing the corpus:

1. ONE sort by the order key (the honest exchange; output order is the
   contract).
2. Per-block partials: each sorted block reports ``(first_key,
   total_bytes)`` — one row per block crosses to the driver.
3. Driver exclusive-scans the ~num_blocks partials and broadcasts the
   per-block offsets; a second pass over the SAME materialized blocks
   adds ``offset + local exclusive cumsum`` and emits per-shard partial
   aggregates (shard id = ``global_offset // shard_bytes``).

Blocks are keyed by their first key value (unique under a unique sort
key), so the two passes agree without any Ray-internal block-index API.
A document larger than the budget still gets exactly one shard;
deterministic either way.

No counterpart in the reference repo (its sink writes one file per
folder run, ``src/api/routes.py``); this generalizes the engine's
partitioned checkpoint sink (``pipelines/checkpoint.py``) to
byte-budgeted shards.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def shard_plan(
    ds,
    shard_bytes: int,
    size_col: str = "n_chars",
    key_col: str = "doc_id",
) -> pa.Table:
    """Plan byte-budgeted shards over ``ds`` ordered by ``key_col``.

    Returns one row per shard: ``(shard_id, n_docs, total_bytes,
    first_doc)`` with ``shard_id = exclusive_prefix_bytes //
    shard_bytes``.
    """
    if shard_bytes <= 0:
        raise ValueError("shard_plan: shard_bytes must be positive")
    from ray.data.aggregate import Min, Sum

    ordered = ds.select_columns([key_col, size_col]).sort(key_col).materialize()

    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["first_key", "block_bytes"],
            )
        sizes = batch[size_col].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array([batch[key_col][0].as_py()], pa.int64()),
                pa.array([int(sizes.sum())], pa.int64()),
            ],
            names=["first_key", "block_bytes"],
        )

    partials = ordered.map_batches(
        block_partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    partials.sort(key=lambda r: r["first_key"])
    offsets = {}
    running = 0
    for r in partials:
        offsets[r["first_key"]] = running
        running += r["block_bytes"]

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4,
                names=["shard_id", "one", size_col, key_col],
            )
        sizes = batch[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = offsets[batch[key_col][0].as_py()]
        excl = base + np.concatenate(([0], np.cumsum(sizes)[:-1]))
        return pa.Table.from_arrays(
            [
                pa.array(excl // shard_bytes),
                pa.array(np.ones(len(sizes), dtype=np.int64)),
                pa.array(sizes),
                pa.array(batch[key_col].to_numpy(zero_copy_only=False)),
            ],
            names=["shard_id", "one", size_col, key_col],
        )

    out = (
        ordered.map_batches(assign, batch_format="pyarrow", batch_size=None)
        .groupby("shard_id")
        .aggregate(
            Sum("one", alias_name="n_docs"),
            Sum(size_col, alias_name="total_bytes"),
            Min(key_col, alias_name="first_doc"),
        )
        .sort("shard_id")
    )
    df = out.to_pandas()[["shard_id", "n_docs", "total_bytes", "first_doc"]]
    return pa.Table.from_pandas(df, preserve_index=False)
