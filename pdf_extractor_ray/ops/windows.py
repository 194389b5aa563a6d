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


def out_of_order_stats(
    ds,
    user_col: str = "user_id",
    seq_col: str = "event_id",
    ts_col: str = "ts",
):
    """Per-key late-event census — the watermark-sizing statistic every
    event-time streaming pipeline needs (Flink/Beam allowed-lateness
    tuning): processing order is ``seq_col`` (ingest id), event time is
    ``ts_col``; an event is LATE when its timestamp is strictly below
    the running maximum of previously-ingested events for the same key,
    and its skew is that running max minus its own timestamp.

    Shape: ONE (user, seq) sort under :func:`..ops.segments.
    sorted_segment_apply`; the kernel computes segment-reset running
    maxima with pandas ``groupby(...).cummax()`` / ``.shift()`` —
    single C passes vectorized ACROSS segments, no per-group Python —
    then reduces each segment with prefix-sum gathers. Integer µs
    arithmetic end to end, so the window-function oracle is bit-exact.

    Returns a Dataset ``(user_id, n_events, n_late, max_skew_us)``.
    """
    from .segments import sorted_segment_apply

    proj = ds.select_columns([user_col, seq_col, ts_col])

    def to_us(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        return pa.Table.from_arrays(
            [
                batch[user_col].combine_chunks().cast(pa.int64()),
                batch[seq_col].combine_chunks().cast(pa.int64()),
                ts.cast(pa.int64()),
            ],
            names=["user", "seq", "ts_us"],
        )

    def census(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        names = ["user_id", "n_events", "n_late", "max_skew_us"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4, names=names
            )
        user = batch["user"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        n = len(user)
        seg = np.zeros(n, np.int64)
        seg[starts] = 1
        seg = np.cumsum(seg) - 1  # rows before starts[0] (deferred) get -1
        s = pd.Series(ts)
        g = s.groupby(seg)
        prev_max = g.cummax().groupby(seg).shift(1)
        late = (s < prev_max).to_numpy()
        skew = np.where(late, (prev_max - s).fillna(0).to_numpy(), 0).astype(
            np.int64
        )
        cs_late = np.concatenate([[0], np.cumsum(late.astype(np.int64))])
        out_user = user[starts]
        n_events = (ends - starts).astype(np.int64)
        n_late = cs_late[ends] - cs_late[starts]
        # per-segment max skew via reduceat over [starts, ends) slices;
        # guard empty trailing slice semantics by masking zero-late segs
        max_skew = np.maximum.reduceat(
            np.concatenate([skew, [0]]), starts
        ) if len(starts) else np.array([], np.int64)
        # reduceat(x, starts) reduces starts[i]..starts[i+1]-1 and the
        # final start..end-of-array: rows past ends[-1] are deferred
        # fragments belonging to the NEXT block's first segment — mask
        # them out of the last segment's reduction explicitly.
        tail = ends[-1]
        if tail < n:
            last = slice(starts[-1], tail)
            max_skew = max_skew.copy()
            max_skew[-1] = skew[last].max() if tail > starts[-1] else 0
        return pa.Table.from_arrays(
            [
                pa.array(out_user, pa.int64()),
                pa.array(n_events, pa.int64()),
                pa.array(n_late, pa.int64()),
                pa.array(max_skew.astype(np.int64), pa.int64()),
            ],
            names=names,
        )

    return sorted_segment_apply(
        proj.map_batches(to_us, batch_format="pyarrow"),
        key_col="user",
        block_fn=census,
        within_cols=["seq"],
    )


def burstiness_stats(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_us: int = HOUR_US,
):
    """Per-key traffic burstiness: the Fano factor (variance-to-mean
    ratio) of per-bucket event counts — the classic dispersion
    statistic separating steady crawl/user traffic (≈1, Poisson-like)
    from bursty scrapers and flash crowds (≫1). Computed as the EXACT
    RATIONAL ``(n·Σc² − (Σc)²) / (n·Σc)`` over the key's OCCUPIED
    buckets, reported in floor milli-units — integer arithmetic end to
    end, so the SQL oracle is bit-exact.

    Shape: per-block (key, bucket) count partials pre-combine before
    ONE ``groupby(key, bucket).sum`` (the exchange carries occupied
    (key, bucket) pairs, never events), then one
    :func:`..ops.segments.sorted_segment_apply` reduces each key's
    moments with prefix-sum gathers.

    Returns a Dataset ``(user_id, n_buckets, n_events, fano_milli)``.
    """
    from ray.data.aggregate import Sum

    from .segments import sorted_segment_apply

    def partials(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        buckets = ts.cast(pa.int64()).to_numpy() // bucket_us
        comp = keys * np.int64(1 << 32) ^ (buckets & np.int64(0xFFFFFFFF))
        uniq, inv = np.unique(comp, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array((uniq >> np.int64(32)), pa.int64()),
                pa.array(uniq & np.int64(0xFFFFFFFF), pa.int64()),
                pa.array(cnt, pa.int64()),
            ],
            names=["key", "bucket", "n"],
        )

    pairs = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["key", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.rename_columns(["key", "bucket", "n"]),
            batch_format="pyarrow",
        )
    )

    def fano(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        names = ["user_id", "n_buckets", "n_events", "fano_milli"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4, names=names
            )
        key = batch["key"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        cs = np.concatenate([[0], np.cumsum(n)])
        cs2 = np.concatenate([[0], np.cumsum(n * n)])
        tot = cs[ends] - cs[starts]
        tot2 = cs2[ends] - cs2[starts]
        nb = (ends - starts).astype(np.int64)
        fano_milli = (1000 * (nb * tot2 - tot * tot)) // (nb * tot)
        return pa.Table.from_arrays(
            [
                pa.array(key[starts], pa.int64()),
                pa.array(nb, pa.int64()),
                pa.array(tot, pa.int64()),
                pa.array(fano_milli, pa.int64()),
            ],
            names=names,
        )

    return sorted_segment_apply(
        pairs, key_col="key", block_fn=fano, within_cols=["bucket"]
    )


def autocorrelation_stats(
    ds,
    ts_col: str = "ts",
    group_col: str = "event_type",
    lags: tuple = (1, 2, 3, 24),
    bucket_us: int = HOUR_US,
    bucket_cap: int = 2_000_000,
):
    """Per-group integer autocorrelation of the hourly event-count
    series at fixed lags — the periodicity screen that separates
    scheduled crawlers/bots (strong lag-24 structure) from organic
    traffic. Reported RAW (non-centered) in floor milli:
    ``1000 · Σ_t c_t·c_{t+lag} // Σ_t c_t²`` — pure integers, missing
    hours count as zero (only occupied-hour products contribute).

    Shape: per-block (group, bucket) partials pre-combine before ONE
    ``groupby(group, bucket).sum``; the occupied-bucket series
    (time-range-bounded — hours × groups, NOT event-bounded; gated by
    ``bucket_cap``) reduces on the driver with numpy dot products per
    lag. Returns a pandas DataFrame ``(group, lag, num, den,
    autocorr_milli)``.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        groups = np.asarray(batch[group_col].to_pylist(), dtype=object)
        ts = batch[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        buckets = ts.cast(pa.int64()).to_numpy() // bucket_us
        comp = np.char.add(
            np.char.add(groups.astype(str), "\x1f"), buckets.astype(str)
        )
        uniq, inv = np.unique(comp, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        parts = np.char.partition(uniq.astype(str), "\x1f")
        return pa.Table.from_arrays(
            [
                pa.array(parts[:, 0].astype(object), pa.string()),
                pa.array(parts[:, 2].astype(np.int64), pa.int64()),
                pa.array(cnt, pa.int64()),
            ],
            names=["grp", "bucket", "n"],
        )

    series_ds = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["grp", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.rename_columns(["grp", "bucket", "n"]),
            batch_format="pyarrow",
        )
    )
    n_rows = series_ds.count()
    if n_rows > bucket_cap:
        raise RuntimeError(
            f"autocorrelation_stats: {n_rows} occupied (group, hour) "
            f"buckets exceed bucket_cap={bucket_cap}"
        )
    series = series_ds.to_pandas()
    out_g, out_l, out_num, out_den, out_m = [], [], [], [], []
    for g, sub in series.groupby("grp"):
        b = sub["bucket"].to_numpy()
        c = sub["n"].to_numpy()
        order = np.argsort(b)
        b, c = b[order], c[order]
        den = int((c.astype(object) * c).sum())
        pos = {int(x): int(v) for x, v in zip(b, c)}
        for lag in lags:
            num = sum(v * pos.get(t + lag, 0) for t, v in pos.items())
            out_g.append(str(g))
            out_l.append(int(lag))
            out_num.append(num)
            out_den.append(den)
            out_m.append(1000 * num // den if den else 0)
    return pd.DataFrame(
        {
            "group": out_g,
            "lag": out_l,
            "num": out_num,
            "den": out_den,
            "autocorr_milli": out_m,
        }
    )


def cusum_alerts(
    ds,
    ts_col: str = "ts",
    group_col: str = "event_type",
    drift: int = 0,
    threshold_num: int = 3,
    threshold_den: int = 2,
    bucket_us: int = HOUR_US,
    bucket_cap: int = 2_000_000,
):
    """Per-group CUSUM change detection on the hourly count series —
    the classic upward-shift alarm (Page 1954) for traffic surges.
    The recursive statistic ``S_t = max(0, S_{t-1} + (c_t − k))``
    equals ``cumsum_t − min_{j<=t} cumsum_j`` (running sum minus its
    running minimum), so it vectorizes as two prefix scans with no
    sequential loop; ``k = drift`` and the alarm threshold is the
    rational ``threshold_num/threshold_den × mean`` hourly count,
    compared cross-multiplied in exact integers.

    Series gaps count as zero-event hours (the full hour range per
    group densifies between its min and max occupied hour). The
    occupied range is time-bounded driver state gated by
    ``bucket_cap`` — the same contract as
    :func:`autocorrelation_stats`.

    Returns a pandas DataFrame ``(group, n_hours, n_alert_hours,
    max_stat)``.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        groups = np.asarray(batch[group_col].to_pylist(), dtype=object)
        ts = batch[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        buckets = ts.cast(pa.int64()).to_numpy() // bucket_us
        comp = np.char.add(
            np.char.add(groups.astype(str), "\x1f"), buckets.astype(str)
        )
        uniq, inv = np.unique(comp, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        parts = np.char.partition(uniq.astype(str), "\x1f")
        return pa.Table.from_arrays(
            [
                pa.array(parts[:, 0].astype(object), pa.string()),
                pa.array(parts[:, 2].astype(np.int64), pa.int64()),
                pa.array(cnt, pa.int64()),
            ],
            names=["grp", "bucket", "n"],
        )

    series_ds = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["grp", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.rename_columns(["grp", "bucket", "n"]),
            batch_format="pyarrow",
        )
    )
    if series_ds.count() > bucket_cap:
        raise RuntimeError("cusum_alerts: occupied buckets exceed bucket_cap")
    series = series_ds.to_pandas()
    out = {"group": [], "n_hours": [], "n_alert_hours": [], "max_stat": []}
    for g, sub in series.groupby("grp"):
        b = sub["bucket"].to_numpy()
        c = sub["n"].to_numpy()
        lo, hi = int(b.min()), int(b.max())
        dense = np.zeros(hi - lo + 1, np.int64)
        dense[b - lo] = c
        x = dense - drift
        cum = np.cumsum(x)
        run_min = np.minimum.accumulate(np.concatenate([[0], cum]))[:-1]
        s = cum - run_min  # S_t with S_0 = 0 before the first hour
        n_hours = len(dense)
        total = int(dense.sum())
        # alert: S_t · den · n_hours > num · total  (threshold = num/den · mean)
        alert = s * threshold_den * n_hours > threshold_num * total
        out["group"].append(str(g))
        out["n_hours"].append(n_hours)
        out["n_alert_hours"].append(int(alert.sum()))
        out["max_stat"].append(int(s.max()))
    return pd.DataFrame(out)
