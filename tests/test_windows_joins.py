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


class TestSaltedAsofJoin:
    def test_row_identical_to_unsalted(self, ray_session):
        """The hot-key-safe (key, time-bucket) co-group with carry rows must
        reproduce the plain keyed as-of join row-for-row, including matches
        that live in EARLIER buckets than the probing row."""
        import ray.data as rd
        from pdf_extractor_ray.ops.joins import asof_join, asof_join_salted

        rows_l, rows_r = [], []
        base = 1_700_000_000_000_000  # us epoch
        day = 86_400_000_000
        for user in (1, 2, 3):
            for k in range(40):
                rows_l.append(
                    {"event_id": user * 1000 + k, "user_id": user,
                     "ts": base + k * 30 * day}  # spans ~3 years
                )
            # sparse right side: one order every ~200 days, none for user 3
            if user != 3:
                for k in range(6):
                    rows_r.append(
                        {"user_id": user, "ots": base + k * 200 * day + user,
                         "order_id": user * 100 + k}
                    )
        import pyarrow as pa

        left = rd.from_items(rows_l).map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("ts"), "ts",
                pa.compute.cast(t["ts"], pa.timestamp("us"))),
            batch_format="pyarrow",
        )
        right = rd.from_items(rows_r).map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("ots"), "ots",
                pa.compute.cast(t["ots"], pa.timestamp("us"))),
            batch_format="pyarrow",
        )
        kw = dict(key_col="user_id", left_ts="ts", right_ts="ots",
                  right_value_cols=["order_id"], tiebreak_col="order_id")
        base_df = asof_join(left, right, **kw).to_pandas()
        salted_df = asof_join_salted(left, right, bucket="90D", **kw).to_pandas()

        def norm(df):
            df = df[["event_id", "user_id", "order_id"]].copy()
            for c in df.columns:
                df[c] = df[c].fillna(-1).astype("int64")
            return df.sort_values("event_id").reset_index(drop=True)

        assert norm(base_df).equals(norm(salted_df))
        # cross-bucket carries actually fired: with 90D buckets and 200D
        # order spacing, most matches live outside the probing bucket (the
        # k=0 event of each user legitimately precedes the first order)
        s = norm(salted_df).query("user_id != 3")
        later_events = s[s["event_id"] % 1000 != 0]["order_id"]
        assert (later_events >= 0).all()


class TestRangeJoin:
    BANDS = [(0.0, 10.0, "low"), (10.0, 20.0, "mid"), (30.0, 40.0, "gap-right")]

    def test_inner_and_left(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from pdf_extractor_ray.ops.joins import broadcast_range_join

        tbl = pa.table(
            {
                "event_id": [1, 2, 3, 4, 5, 6, 7],
                "value": [0.0, 9.99, 10.0, 25.0, 39.9, 40.0, float("nan")],
            }
        )
        ds = rd.from_arrow(tbl).repartition(2)
        inner = {
            r["event_id"]: r["band"]
            for r in broadcast_range_join(ds, self.BANDS, "value").take_all()
        }
        # half-open: 10.0 joins 'mid', 40.0 drops; 25.0 in the gap drops;
        # NaN never matches
        assert inner == {1: "low", 2: "low", 3: "mid", 5: "gap-right"}
        left = {
            r["event_id"]: r["band"]
            for r in broadcast_range_join(
                ds, self.BANDS, "value", how="left"
            ).take_all()
        }
        assert left[4] is None and left[6] is None and left[7] is None
        assert left[1] == "low" and len(left) == 7

    def test_rejects_bad_intervals(self):
        import pytest

        from pdf_extractor_ray.ops.joins import broadcast_range_join

        with pytest.raises(ValueError, match="overlapping"):
            broadcast_range_join(None, [(0, 10, "a"), (5, 15, "b")], "v")
        with pytest.raises(ValueError, match="empty"):
            broadcast_range_join(None, [(10, 10, "a")], "v")


class TestOutOfOrderStats:
    def _brute(self, rows):
        from collections import defaultdict

        per = defaultdict(list)
        for u, seq, ts in rows:
            per[u].append((seq, ts))
        out = {}
        for u, evs in per.items():
            evs.sort()
            run, n_late, max_skew = None, 0, 0
            for _, ts in evs:
                if run is not None and ts < run:
                    n_late += 1
                    max_skew = max(max_skew, run - ts)
                run = ts if run is None else max(run, ts)
            out[u] = (len(evs), n_late, max_skew)
        return out

    @pytest.mark.parametrize("parts", [1, 3, 11])
    def test_matches_brute_force_any_layout(self, ray_session, parts):
        import ray

        from pdf_extractor_ray.ops.windows import out_of_order_stats

        rng = np.random.RandomState(5)
        rows = [
            (int(rng.randint(0, 9)), seq, int(rng.randint(0, 1000)))
            for seq in range(400)
        ]
        tab = pa.Table.from_arrays(
            [
                pa.array([r[0] for r in rows], pa.int64()),
                pa.array([r[1] for r in rows], pa.int64()),
                pa.array([r[2] for r in rows], pa.int64()),
            ],
            names=["user_id", "event_id", "ts"],
        )
        got = (
            out_of_order_stats(ray.data.from_arrow(tab).repartition(parts))
            .to_pandas()
            .sort_values("user_id")
        )
        exp = self._brute(rows)
        assert len(got) == len(exp)
        for r in got.itertuples():
            assert exp[int(r.user_id)] == (
                int(r.n_events),
                int(r.n_late),
                int(r.max_skew_us),
            )

    def test_all_in_order_stream(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.windows import out_of_order_stats

        tab = pa.Table.from_arrays(
            [
                pa.array([1, 1, 1], pa.int64()),
                pa.array([0, 1, 2], pa.int64()),
                pa.array([10, 20, 30], pa.int64()),
            ],
            names=["user_id", "event_id", "ts"],
        )
        df = out_of_order_stats(ray.data.from_arrow(tab)).to_pandas()
        assert df["n_late"].tolist() == [0]
        assert df["max_skew_us"].tolist() == [0]


class TestBurstinessStats:
    def test_fano_exact(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.windows import burstiness_stats

        HOUR = 3_600_000_000
        # user 1: 3 buckets with counts [1, 1, 4]; user 2: [2, 2]
        rows = (
            [(1, 0), (1, HOUR), (1, 2 * HOUR)]
            + [(1, 2 * HOUR + i + 1) for i in range(3)]
            + [(2, 0), (2, 1), (2, HOUR), (2, HOUR + 1)]
        )
        tab = pa.Table.from_arrays(
            [
                pa.array([r[0] for r in rows], pa.int64()),
                pa.array([r[1] for r in rows], pa.int64()),
            ],
            names=["user_id", "ts"],
        )
        df = (
            burstiness_stats(ray.data.from_arrow(tab).repartition(3))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        # user1: n=3, tot=6, tot2=18 -> (3*18-36)*1000 // (3*6) = 1000
        assert df.iloc[0].tolist() == [1, 3, 6, 1000]
        # user2: n=2, tot=4, tot2=8 -> (16-16)*1000 // 8 = 0
        assert df.iloc[1].tolist() == [2, 2, 4, 0]


class TestAutocorrelation:
    def test_periodic_series(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.windows import autocorrelation_stats

        HOUR = 3_600_000_000
        # group 'a': 1 event at hours 0,2,4,6 (period 2)
        rows = [("a", h * HOUR) for h in (0, 2, 4, 6)]
        tab = pa.Table.from_arrays(
            [
                pa.array([r[0] for r in rows], pa.string()),
                pa.array([r[1] for r in rows], pa.int64()),
            ],
            names=["event_type", "ts"],
        )
        df = autocorrelation_stats(
            ray.data.from_arrow(tab), lags=(1, 2)
        ).sort_values("lag")
        # den = 4; lag1 products all 0; lag2: hours 0,2,4 pair up -> 3
        assert df[df["lag"] == 1]["autocorr_milli"].iloc[0] == 0
        assert df[df["lag"] == 2]["autocorr_milli"].iloc[0] == 1000 * 3 // 4

    def test_bucket_cap(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.windows import autocorrelation_stats

        HOUR = 3_600_000_000
        rows = [("a", h * HOUR) for h in range(10)]
        tab = pa.Table.from_arrays(
            [
                pa.array([r[0] for r in rows], pa.string()),
                pa.array([r[1] for r in rows], pa.int64()),
            ],
            names=["event_type", "ts"],
        )
        with pytest.raises(RuntimeError, match="bucket_cap"):
            autocorrelation_stats(ray.data.from_arrow(tab), bucket_cap=3)


class TestCusumAlerts:
    def test_prefix_scan_equals_recursion(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.windows import cusum_alerts

        HOUR = 3_600_000_000
        # counts per hour: [1,1,1,1,10,10] -> surge at the end
        rows = []
        for h, c in enumerate([1, 1, 1, 1, 10, 10]):
            rows += [("a", h * HOUR + i) for i in range(c)]
        tab = pa.Table.from_arrays(
            [
                pa.array([r[0] for r in rows], pa.string()),
                pa.array([r[1] for r in rows], pa.int64()),
            ],
            names=["event_type", "ts"],
        )
        df = cusum_alerts(ray.data.from_arrow(tab).repartition(3))
        # recursive reference with drift 0: S = cumsum (all positive)
        counts = [1, 1, 1, 1, 10, 10]
        s, smax, alerts = 0, 0, 0
        total, n_hours = sum(counts), len(counts)
        for c in counts:
            s = max(0, s + c)
            smax = max(smax, s)
            if s * 2 * n_hours > 3 * total:
                alerts += 1
        row = df.iloc[0]
        assert (row["n_hours"], row["n_alert_hours"], row["max_stat"]) == (
            n_hours, alerts, smax
        )
