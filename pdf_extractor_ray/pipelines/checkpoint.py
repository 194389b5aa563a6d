"""Resumable, checkpointed partitioned output.

The reference has no resume story (a failed request is retried whole,
reference: scripts/process_folder.py:74-76); at 100 TB a resumable layout is
mandatory (BASELINE.json north_rule: "resumable from checkpoint with
per-partition lineage + metrics"). Layout:

    out_dir/
      part=<k>/ *.parquet          # all documents with partition_id == k
      _metrics/part=<k>.parquet    # per-partition lineage metrics row
      _manifest/part=<k>.json      # commit marker, written LAST

A partition is complete iff its manifest marker exists; the marker is
written atomically (temp file + rename) only after data and metrics are on
disk, so a killed run can never leave a half-written partition that resume
treats as done. ``run_with_checkpoints`` filters already-committed
partitions out of the *input* (cheap: partition_id is derived from url at
read time), so a rerun recomputes only missing partitions and the final
output is byte-identical to an uninterrupted run (tested in
tests/test_resume.py).

At cluster scale each partition group is written by whichever node holds its
blocks; the groupby here is the explicit hash exchange on the ONE
partitioning key the engine uses everywhere (partition_id = crc32(url) % P).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import EngineConfig
from ..stages.metrics import METRIC_FIELDS


def completed_partitions(out_dir: str) -> set[int]:
    """Partitions with a commit marker."""
    manifest_dir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(manifest_dir):
        return set()
    done = set()
    for name in os.listdir(manifest_dir):
        if name.startswith("part=") and name.endswith(".json"):
            done.add(int(name[len("part="):-len(".json")]))
    return done


def _commit_partition(out_dir: str, partition_id: int, table: pa.Table) -> dict:
    """Write one partition's data + metrics, then atomically commit."""
    part_dir = os.path.join(out_dir, f"part={partition_id}")
    metrics_dir = os.path.join(out_dir, "_metrics")
    manifest_dir = os.path.join(out_dir, "_manifest")
    for d in (part_dir, metrics_dir, manifest_dir):
        os.makedirs(d, exist_ok=True)

    data_tmp = os.path.join(part_dir, "data.parquet.tmp")
    data_path = os.path.join(part_dir, "data.parquet")
    pq.write_table(table, data_tmp)
    os.replace(data_tmp, data_path)

    bytes_out = sum(len(t) for t in table["extracted_text"].to_pylist())
    sims = table["similarity"].to_pylist()
    # Reference cost model: ~500 tokens/page at $0.01/1K tokens per
    # validated page (reference: validation_orchestrator.py:52-53, 432).
    n_pages_validated = (
        sum(table["n_pages_validated"].to_pylist())
        if "n_pages_validated" in table.schema.names
        else sum(1 for s in sims if s is not None)
    )
    metrics = {
        "partition_id": partition_id,
        "docs": len(table),
        "bytes_in": sum(table["payload_bytes"].to_pylist()),
        "bytes_out": bytes_out,
        "n_problem_docs": sum(1 for v in table["has_problem"].to_pylist() if v),
        "n_replaced": sum(1 for s in table["source"].to_pylist() if s == "provided"),
        "n_failed_validation": sum(
            1 for sim, ok in zip(sims, table["passed"].to_pylist())
            if sim is not None and not ok
        ),
        "n_validated": sum(1 for sim in sims if sim is not None),
        "n_pages_validated": int(n_pages_validated),
        "est_validation_cost_usd": round(n_pages_validated * 500 * 0.01 / 1000, 4),
    }
    metrics_tmp = os.path.join(metrics_dir, f"part={partition_id}.parquet.tmp")
    metrics_path = os.path.join(metrics_dir, f"part={partition_id}.parquet")
    pq.write_table(
        pa.Table.from_pylist([metrics]), metrics_tmp
    )
    os.replace(metrics_tmp, metrics_path)

    marker_tmp = os.path.join(manifest_dir, f"part={partition_id}.json.tmp")
    marker_path = os.path.join(manifest_dir, f"part={partition_id}.json")
    with open(marker_tmp, "w") as fh:
        json.dump(metrics, fh, sort_keys=True)
    os.replace(marker_tmp, marker_path)
    return metrics


def _make_partition_writer(out_dir: str):
    """map_groups fn: commits one partition group and returns its metrics
    row (the Dataset result is the metrics table)."""

    def write_partition_group(group: pa.Table) -> pa.Table:
        partition_id = int(group["partition_id"][0].as_py())
        # Deterministic intra-partition order (url is unique per corpus
        # row), so the committed file is byte-stable across runs.
        order = pa.compute.sort_indices(group["url"])
        metrics = _commit_partition(out_dir, partition_id, group.take(order))
        return pa.Table.from_pylist([metrics])

    return write_partition_group


def run_with_checkpoints(
    ds,
    out_dir: str,
    config: EngineConfig | None = None,
    fail_after_partitions: int | None = None,
):
    """Consume a result Dataset into the checkpointed layout, skipping
    already-committed partitions. Returns the metrics table (pandas).

    ``fail_after_partitions`` is a test hook: raise after N commits to
    exercise resume.
    """
    done = completed_partitions(out_dir)
    if done:
        import pyarrow.compute as pc

        done_arr = list(done)
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t["partition_id"], value_set=pa.array(done_arr, pa.int32())))
            ),
            batch_format="pyarrow",
        )
    writer = _make_partition_writer(out_dir)
    if fail_after_partitions is not None:
        committed = 0
        for batch in (
            ds.groupby("partition_id")
            .map_groups(writer, batch_format="pyarrow")
            .iter_batches(batch_size=1, batch_format="pyarrow")
        ):
            committed += len(batch)
            if committed >= fail_after_partitions:
                raise RuntimeError(
                    f"injected failure after {committed} partitions"
                )
        return read_metrics(out_dir)
    result = ds.groupby("partition_id").map_groups(writer, batch_format="pyarrow")
    result.materialize()
    return read_metrics(out_dir)


def run_direct(ds, out_dir: str):
    """Shuffle-free alternative sink for the largest corpora.

    ``write_parquet(partition_cols=["partition_id"])`` writes each task's
    blocks straight into hive-partitioned directories — no exchange at all,
    at the cost of coarser resume granularity: completion is all-or-nothing
    per RUN (a `_SUCCESS` marker written after the write completes), not per
    partition. Use :func:`run_with_checkpoints` when partition-granular
    resume matters more than avoiding the output exchange; at 100 TB the
    grouped mode's exchange moves extracted text only (payloads are dropped
    before validation), which is why it remains the default.
    """
    ds.write_parquet(out_dir, partition_cols=["partition_id"])
    marker_tmp = os.path.join(out_dir, "_SUCCESS.tmp")
    with open(marker_tmp, "w") as fh:
        fh.write("ok")
    os.replace(marker_tmp, os.path.join(out_dir, "_SUCCESS"))


def read_metrics(out_dir: str):
    """All committed partitions' metrics as a pandas DataFrame."""
    import glob

    import pandas as pd

    paths = sorted(glob.glob(os.path.join(out_dir, "_metrics", "part=*.parquet")))
    if not paths:
        return pd.DataFrame(columns=["partition_id", *METRIC_FIELDS])
    frames = [pq.read_table(p).to_pandas() for p in paths]
    return (
        pd.concat(frames, ignore_index=True)
        .sort_values("partition_id")
        .reset_index(drop=True)
    )


def read_output(out_dir: str) -> pa.Table:
    """All committed partitions' data as one Arrow table (test helper)."""
    import glob

    paths = sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet")))
    return pa.concat_tables([pq.read_table(p) for p in paths])
