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


def rendezvous_shards(
    ds,
    id_col: str = "doc_id",
    n_shards: int = 8,
    n_shards_new: int | None = None,
):
    """Rendezvous (highest-random-weight, Thaler–Ravishankar 1996)
    consistent-hash shard assignment, plus the resharding-movement
    census when growing to ``n_shards_new``: every key goes to
    ``argmax_s splitmix64(key·64 + s)`` (ties → smaller s), so adding a
    shard moves ONLY the keys whose new shard wins — the ~1/(S+1)
    minimal-movement property that makes reshards cheap at 10^12 keys,
    versus mod-hashing's (S)/(S+1) reshuffle. ``n_shards_new`` must stay
    ≤ 64 (the key·64 packing keeps every (key, s) weight distinct and
    SQL-replicable via the repo's HUGEINT splitmix oracle).

    Shape: shuffle-free — per-batch vectorized weight matrices (rows ×
    shards) pick both assignments, fixed-size per-shard partial counts
    reduce through one tiny ``groupby(shard)``; nothing key-cardinality
    ever aggregates. Returns a pandas DataFrame ``(shard, n_old, n_new,
    moved_in, moved_out)`` for shards 0..n_shards_new-1.
    """
    import pandas as pd

    from .text import splitmix64_np

    S_old = int(n_shards)
    S_new = int(n_shards_new if n_shards_new is not None else n_shards)
    S_max = max(S_old, S_new)
    if S_max > 64 or S_old < 1 or S_new < 1:
        raise ValueError("rendezvous_shards: 1 <= shards <= 64")

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 5,
                names=["shard", "n_old", "n_new", "moved_in", "moved_out"],
            )
        keys = ids[:, None].astype(np.uint64) * np.uint64(64) + np.arange(
            S_max, dtype=np.uint64
        )[None, :]
        w = splitmix64_np(keys.ravel()).reshape(len(ids), S_max)
        old = np.argmax(w[:, :S_old], axis=1)
        new = np.argmax(w[:, :S_new], axis=1)
        moved = old != new
        n_old = np.bincount(old, minlength=S_max)
        n_new = np.bincount(new, minlength=S_max)
        m_in = np.bincount(new[moved], minlength=S_max)
        m_out = np.bincount(old[moved], minlength=S_max)
        return pa.Table.from_arrays(
            [
                pa.array(np.arange(S_max, dtype=np.int64)),
                pa.array(n_old.astype(np.int64)),
                pa.array(n_new.astype(np.int64)),
                pa.array(m_in.astype(np.int64)),
                pa.array(m_out.astype(np.int64)),
            ],
            names=["shard", "n_old", "n_new", "moved_in", "moved_out"],
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .sum(["n_old", "n_new", "moved_in", "moved_out"])
        .to_pandas()
    )
    out = out.rename(
        columns={
            "sum(n_old)": "n_old",
            "sum(n_new)": "n_new",
            "sum(moved_in)": "moved_in",
            "sum(moved_out)": "moved_out",
        }
    )
    keep = out[out.shard < max(S_old, S_new)]
    return (
        keep.sort_values("shard")
        .reset_index(drop=True)
        .astype("int64")
    )


def zorder_layout(
    ds,
    x_col: str,
    y_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 8,
    bits: int = 21,
):
    """Z-order (Morton) layout clustering — the lakehouse data-layout
    primitive (Delta/Iceberg OPTIMIZE ZORDER BY): interleave the bits of
    two int columns so rows close in BOTH dimensions land in the same
    output bucket, making min/max pruning effective on either column.
    ``z = Σ_i ((x>>i & 1) << 2i) | ((y>>i & 1) << 2i+1)`` over ``bits``
    bits per column (values must fit; raises otherwise), bucket =
    exact global NTILE of the z-value (ties → id) via
    :func:`..ops.quantiles.global_ntile`'s distributed prefix scan.

    Returns a Dataset ``(id, z, bucket)`` plus effectiveness evidence:
    per-bucket min/max of BOTH source columns land in the companion
    stats frame from :func:`zorder_bucket_stats`. Shape: one vectorized
    interleave pass, ONE (z, id) sort — the honest exchange, layout IS
    a global order — and the per-block prefix-scan partials.
    """
    if not 1 <= bits <= 31:
        raise ValueError("zorder_layout: bits must be in [1, 31]")
    lim = 1 << bits

    def interleave(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and (x.min() < 0 or y.min() < 0 or x.max() >= lim
                       or y.max() >= lim):
            raise ValueError(
                f"zorder_layout: values must be in [0, 2^{bits})")
        z = np.zeros(len(x), np.int64)
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return pa.Table.from_arrays(
            [batch[id_col].combine_chunks().cast(pa.int64()),
             pa.array(z)],
            names=[id_col, "z"],
        )

    from .quantiles import global_ntile

    zs = ds.map_batches(interleave, batch_format="pyarrow")
    return global_ntile(zs, n_buckets, score_col="z", id_col=id_col)


def zorder_bucket_stats(
    ds,
    x_col: str,
    y_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 8,
    bits: int = 21,
):
    """Per-bucket min/max spans of BOTH source columns under the z-order
    layout of :func:`zorder_layout` — the pruning-effectiveness census a
    lakehouse optimizer reads (tight per-bucket ranges on either column
    ⇒ min/max skipping works). One extra sorted-lookup attach of the
    bucket onto the source rows, per-block partial min/max, one tiny
    ``groupby(bucket)``. Returns a pandas DataFrame ``(bucket, n_rows,
    x_min, x_max, y_min, y_max)``.
    """
    from .segments import attach_lookup

    assignment = zorder_layout(
        ds, x_col, y_col, id_col=id_col, n_buckets=n_buckets, bits=bits
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [t[id_col].combine_chunks(), t["tier"].combine_chunks()],
            names=[id_col, "bucket"]),
        batch_format="pyarrow",
    )
    src = ds.map_batches(
        lambda t, xc=x_col, yc=y_col, ic=id_col: pa.Table.from_arrays(
            [t[ic].combine_chunks().cast(pa.int64()),
             t[xc].combine_chunks().cast(pa.int64()),
             t[yc].combine_chunks().cast(pa.int64())],
            names=[ic, "x", "y"]),
        batch_format="pyarrow",
    )
    joined = attach_lookup(
        src, assignment, key_col=id_col, val_cols=["bucket"],
        carry_cols=["x", "y"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        un, inv = np.unique(b, return_inverse=True)
        n = len(un)
        xmin = np.full(n, np.iinfo(np.int64).max)
        xmax = np.full(n, np.iinfo(np.int64).min)
        ymin = np.full(n, np.iinfo(np.int64).max)
        ymax = np.full(n, np.iinfo(np.int64).min)
        cnt = np.zeros(n, np.int64)
        np.minimum.at(xmin, inv, x)
        np.maximum.at(xmax, inv, x)
        np.minimum.at(ymin, inv, y)
        np.maximum.at(ymax, inv, y)
        np.add.at(cnt, inv, 1)
        return pa.Table.from_arrays(
            [pa.array(un.astype(np.int64)), pa.array(cnt),
             pa.array(xmin), pa.array(xmax),
             pa.array(ymin), pa.array(ymax)],
            names=["bucket", "n_rows", "x_min", "x_max", "y_min", "y_max"],
        )

    from ray.data.aggregate import Max, Min, Sum

    out = (
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
        .groupby("bucket")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Min("x_min", alias_name="x_min"),
            Max("x_max", alias_name="x_max"),
            Min("y_min", alias_name="y_min"),
            Max("y_max", alias_name="y_max"),
        )
        .to_pandas()
    )
    return (
        out.sort_values("bucket").reset_index(drop=True).astype("int64")
    )
