"""Sliding windows and as-of join on small controlled inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_extractor_ray.ops.joins import asof_join
from pdf_extractor_ray.ops.windows import sliding_window_counts

US = 1_000_000
HOUR = 3600 * US


def _events_table():
    # type A: events in hours 0, 1, 5 (gap) · type B: hour 2 only
    rows = [
        ("A", 0 * HOUR + 5, 1.00),
        ("A", 0 * HOUR + 10, 2.00),
        ("A", 1 * HOUR + 1, 3.00),
        ("A", 5 * HOUR + 1, 4.00),
        ("B", 2 * HOUR + 1, 5.00),
    ]
    return pa.Table.from_arrays(
        [
            pa.array([r[1] for r in rows], pa.timestamp("us")),
            pa.array([r[0] for r in rows]),
            pa.array([r[2] for r in rows], pa.float64()),
        ],
        names=["ts", "event_type", "value"],
    )


class TestSlidingWindow:
    def test_range_semantics_with_gaps(self, ray_session):
        import ray.data as rd

        out = (
            sliding_window_counts(rd.from_arrow(_events_table()), window_hours=3)
            .to_pandas()
            .sort_values(["event_type", "hour"])
            .reset_index(drop=True)
        )
        a = out[out["event_type"] == "A"].set_index("hour")
        # hour 0: events at hour 0 → 2; hour 1: hours -1..1 → 3
        assert a.loc[0, "window_events"] == 2
        assert a.loc[1, "window_events"] == 3
        # hour 5: window covers hours 3..5 → only the hour-5 event (gap!)
        assert a.loc[5, "window_events"] == 1
        assert a.loc[5, "window_value_cents"] == 400


class TestAsofJoin:
    def test_backward_match_and_unmatched(self, ray_session):
        import ray.data as rd

        left = rd.from_items(
            [
                {"event_id": 1, "user_id": 7, "ts": pd.Timestamp("2026-01-10")},
                {"event_id": 2, "user_id": 7, "ts": pd.Timestamp("2026-01-01")},
                {"event_id": 3, "user_id": 9, "ts": pd.Timestamp("2026-01-10")},
            ]
        )
        right = rd.from_items(
            [
                {"user_id": 7, "odate": pd.Timestamp("2026-01-05"), "okey": 100},
                {"user_id": 7, "odate": pd.Timestamp("2026-01-08"), "okey": 200},
                {"user_id": 7, "odate": pd.Timestamp("2026-01-08"), "okey": 150},  # tie
            ]
        )
        out = asof_join(
            left, right, key_col="user_id", left_ts="ts", right_ts="odate",
            right_value_cols=["okey"], tiebreak_col="okey",
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        # event 1: latest order <= 01-10 is 01-08; tie resolved to max okey
        assert out.loc[0, "okey"] == 200
        # event 2: before any order → null
        assert pd.isna(out.loc[1, "okey"])
        # event 3: user with no orders at all → null
        assert pd.isna(out.loc[2, "okey"])
