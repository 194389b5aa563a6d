"""Per-partition lineage and extraction metrics.

The engine's analogue of the reference's validation-report aggregation
(reference: src/services/workflows/default_handler.py:199-238 and
src/services/validation/problem_detector.py:488-523), lifted from
per-document dicts to a per-partition metrics table: pre-aggregated inside
``map_batches`` (one partial row per partition per batch — the
combiner-before-shuffle pattern), then reduced by a tiny
``groupby(partition_id)`` so the all-to-all exchange moves kilobytes, not
the corpus.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

METRIC_FIELDS = (
    "docs",
    "bytes_in",
    "bytes_out",
    "n_problem_docs",
    "n_replaced",
    "n_failed_validation",
    "n_validated",
)


def partial_metrics(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregate: one row per partition_id present."""
    df = pd.DataFrame(
        {
            "partition_id": batch["partition_id"].to_numpy(zero_copy_only=False),
            "bytes_in": batch["payload_bytes"].to_numpy(zero_copy_only=False),
            "bytes_out": [len(t) for t in batch["extracted_text"].to_pylist()],
            "has_problem": batch["has_problem"].to_numpy(zero_copy_only=False),
            "replaced": [s == "provided" for s in batch["source"].to_pylist()],
            "failed": [
                (sim is not None and not ok)
                for sim, ok in zip(
                    batch["similarity"].to_pylist(), batch["passed"].to_pylist()
                )
            ],
            "validated": [sim is not None for sim in batch["similarity"].to_pylist()],
        }
    )
    grouped = df.groupby("partition_id", sort=True)
    out = pd.DataFrame(
        {
            "partition_id": list(grouped.groups.keys()),
            "docs": grouped.size().to_numpy(),
            "bytes_in": grouped["bytes_in"].sum().to_numpy(),
            "bytes_out": grouped["bytes_out"].sum().to_numpy(),
            "n_problem_docs": grouped["has_problem"].sum().to_numpy(),
            "n_replaced": grouped["replaced"].sum().to_numpy(),
            "n_failed_validation": grouped["failed"].sum().to_numpy(),
            "n_validated": grouped["validated"].sum().to_numpy(),
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def partition_metrics(ds):
    """Dataset of final per-partition metrics (tiny groupby over partials)."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial_metrics, batch_format="pyarrow")
    aggs = [Sum(f, alias_name=f) for f in METRIC_FIELDS]
    return partials.groupby("partition_id").aggregate(*aggs)


def overall_status(metrics_df: pd.DataFrame) -> str:
    """Document-level rollup of validation status, mirroring the reference's
    precedence problems_fixed > warnings > passed
    (reference: default_handler.py:199-238)."""
    if metrics_df.empty:
        return "passed"
    if metrics_df["n_replaced"].sum() > 0:
        return "problems_fixed"
    if metrics_df["n_failed_validation"].sum() > 0:
        return "warnings"
    return "passed"
