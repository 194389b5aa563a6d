"""Event-time window operators beyond plain tumbling groupby.

Ray Data has no native event-time windows (SURVEY.md §2.9 — neither does
the reference); these are compositions per the guide idiom: bucket
vectorized in ``map_batches``, then ``groupby(key).map_groups`` with an
in-group time sort. Ordering assumption: only per-key order matters, which
the in-group sort establishes regardless of shuffle layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

HOUR_US = 3_600_000_000


def hourly_buckets(batch: pa.Table, ts_col: str = "ts") -> pa.Table:
    """Vectorized event-time → hour bucket projection."""
    epoch_us = pc.cast(batch[ts_col], pa.int64())
    return batch.append_column("hour", pc.divide(epoch_us, pa.scalar(HOUR_US)))


def sliding_window_counts(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_hours: int = 3,
):
    """Sliding window: for every (key, hour) PRESENT in the data, the count
    and value-cents sum of events in ``[hour - window + 1, hour]``.

    Pre-aggregate to hourly partials per batch (combiner), then one
    ``groupby(key)`` over the tiny partials; the in-group pandas pass does
    the range-window sum (range semantics — missing hours contribute
    nothing but do not break the window, matching SQL
    ``RANGE BETWEEN n PRECEDING AND CURRENT ROW``).
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = hourly_buckets(batch, ts_col)
        cents = pc.cast(
            pc.round(pc.multiply(batch["value"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                key_col: batch[key_col].to_pylist(),
                "hour": batch["hour"].to_numpy(),
                "n": np.ones(len(batch), dtype=np.int64),
                "value_cents": cents.to_numpy(),
            }
        )
        return pa.Table.from_pandas(
            df.groupby([key_col, "hour"], sort=True).sum().reset_index(),
            preserve_index=False,
        )

    def window(group: pd.DataFrame) -> pd.DataFrame:
        hourly = (
            group.groupby("hour", sort=True)[["n", "value_cents"]].sum().reset_index()
        )
        hours = hourly["hour"].to_numpy()
        n = hourly["n"].to_numpy()
        cents = hourly["value_cents"].to_numpy()
        # For each present hour, sum over hours in (h - window, h]: two
        # searchsorted cuts over the sorted hour axis (vectorized).
        lo = np.searchsorted(hours, hours - window_hours + 1, side="left")
        hi = np.arange(len(hours)) + 1
        csum_n = np.concatenate(([0], np.cumsum(n)))
        csum_c = np.concatenate(([0], np.cumsum(cents)))
        return pd.DataFrame(
            {
                key_col: group[key_col].iloc[0],
                "hour": hours,
                "window_events": csum_n[hi] - csum_n[lo],
                "window_value_cents": csum_c[hi] - csum_c[lo],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(window, batch_format="pandas")
    )
