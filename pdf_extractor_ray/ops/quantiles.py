"""Exact distributed order statistics via iterative histogram refinement.

The reference has no corpus-level statistics at all (its only numbers are
per-document, SURVEY.md §2.7); a curation pipeline constantly needs exact
percentiles (length caps, quality-score cut lines, price bands) over
columns far too large to sort.  A global ``ds.sort`` is an all-to-all
shuffle of the full column; this operator instead finds the exact value at
any set of ranks with a handful of **counting passes**:

1. One per-block (count, min, max) pass fixes the global interval and
   turns each quantile ``q`` into a target rank ``ceil(q*n)``.
2. Each refinement pass runs one vectorized ``map_batches`` partial
   (whole-block histograms over the active intervals, plus per-bucket
   min/max).  The pre-aggregated ``(interval, bucket)`` rows merge
   either by STREAMING into a dense driver array (default — zero
   exchanges, constant driver state, driver traffic
   O(blocks × buckets × 40 B)) or via one tiny ``groupby`` exchange
   (``combine="shuffle"``, for 10^5+-block inputs).  Either way the
   data column itself never moves.
3. A bucket whose observed ``min == max`` resolves its ranks immediately;
   otherwise the rank recurses into the *observed* ``[min, max]`` of its
   bucket, so every pass shrinks the value range by ~``num_buckets``×.
   Integer columns run ENTIRELY in int64 arithmetic (exact at any
   magnitude, including >2^53 where float64 would merge neighbors) and
   terminate exactly; float columns terminate when the interval
   collapses to one representable value or the remaining rows fit under
   ``collect_cap`` (then one filtered, pre-aggregated value-count pass
   finishes the job — bounded, documented driver state).

Nulls are excluded from both the ranks and the values (SQL aggregate
semantics: ``quantile`` over non-null rows).

For ``num_buckets=4096`` this is ≤3 passes for any int64 column and for
doubles of ordinary spread — O(passes) full scans, zero shuffles of data
rows, O(num_buckets × intervals) driver state.  At 100 TB each pass
streams; the combine exchange carries ~``num_blocks × 4096`` tiny rows.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyarrow.compute import max as pc_max
from pyarrow.compute import min as pc_min
from pyarrow.compute import sum as pc_sum

__all__ = ["exact_quantiles", "group_quantiles"]


def _rank_targets(qs: list[float], n: int) -> list[int]:
    """Rank (1-based) of each quantile: smallest r with r >= q*n, min 1."""
    return [max(1, math.ceil(q * n)) for q in qs]


def _values(batch: pa.Table, col: str, as_int: bool) -> np.ndarray:
    """Non-null column values in the working dtype (int64 stays exact)."""
    arr = batch[col]
    if arr.null_count:
        arr = arr.drop_null()
    x = arr.to_numpy(zero_copy_only=False)
    return x.astype(np.int64 if as_int else np.float64)


def _hist_partial(intervals: list[tuple], col: str, nb: int, as_int: bool):
    """Whole-block partial: for each active interval emit nonzero-bucket
    rows (iv, bucket, cnt, bmin, bmax). Runs with batch_size=None so one
    call sees one block — the per-block pre-combine that keeps the
    combine step tiny. Bucket arithmetic stays in int64 for integer
    columns (exact beyond 2^53)."""
    dt = np.int64 if as_int else np.float64
    los = np.array([iv[0] for iv in intervals], dtype=dt)
    his = np.array([iv[1] for iv in intervals], dtype=dt)
    val_type = pa.int64() if as_int else pa.float64()
    # Integer spans near the full int64 range would overflow (hi-lo);
    # those intervals bucket via monotonic float division instead (still
    # deterministic and order-preserving; per-bucket min/max stay exact
    # int64, so the recursion re-enters exact arithmetic immediately).
    float_bucket = [
        as_int and (int(iv[1]) - int(iv[0])) > 2**62 for iv in intervals
    ]

    def partial(batch: pa.Table) -> pa.Table:
        x = _values(batch, col, as_int)
        ivs, bks, cnts, mins, maxs = [], [], [], [], []
        for i in range(len(los)):
            lo, hi = los[i], his[i]
            sel = x[(x >= lo) & (x <= hi)]
            if len(sel) == 0:
                continue
            if as_int and float_bucket[i]:
                fw = (float(int(hi) - int(lo))) / nb
                b = np.minimum(
                    ((sel.astype(np.float64) - float(lo)) / fw).astype(np.int64),
                    nb - 1,
                )
            elif as_int:
                width = -((hi - lo + 1) // -nb)  # ceil divide, ≥1
                b = (sel - lo) // width
            else:
                width = (hi - lo) / nb
                if width <= 0 or not np.isfinite(width):
                    b = np.zeros(len(sel), dtype=np.int64)
                else:
                    b = np.minimum(((sel - lo) / width).astype(np.int64), nb - 1)
            order = np.argsort(b, kind="stable")
            bs, ss = b[order], sel[order]
            ub, start = np.unique(bs, return_index=True)
            end = np.r_[start[1:], len(bs)]
            ivs.extend([i] * len(ub))
            bks.extend(ub.tolist())
            cnts.extend((end - start).tolist())
            mins.extend(np.minimum.reduceat(ss, start).tolist())
            maxs.extend(np.maximum.reduceat(ss, start).tolist())
        return pa.Table.from_arrays(
            [
                pa.array(ivs, pa.int32()),
                pa.array(bks, pa.int32()),
                pa.array(cnts, pa.int64()),
                pa.array(mins, val_type),
                pa.array(maxs, val_type),
            ],
            names=["iv", "bucket", "cnt", "bmin", "bmax"],
        )

    return partial


def exact_quantiles(
    ds,
    col: str,
    qs: list[float],
    num_buckets: int = 4096,
    collect_cap: int = 200_000,
    max_passes: int = 12,
    combine: str = "stream",
) -> list[tuple[float, float]]:
    """Exact value at rank ``ceil(q*n)`` for each q in ``qs`` (the
    "smallest value whose <=-count reaches the rank" definition over the
    NON-NULL rows — matches ``min(x) FILTER (row_number >= ceil(q*n))``
    in SQL).

    Returns ``[(q, value), ...]`` in the input order of ``qs``; values
    are Python ints for integer columns (exact at any magnitude), floats
    otherwise. Runs O(passes) streaming counting passes; see module
    docstring for the scale story. Raises ``ValueError`` on an
    empty/all-null column.

    ``combine``: how per-block histogram partials merge. ``"stream"``
    (default) pulls the tiny partial rows straight into a dense driver
    array via ``iter_batches`` — zero exchanges end-to-end; driver
    STATE stays O(buckets × intervals) but driver TRAFFIC is
    O(blocks × nonzero-buckets × 40 B), fine up to ~10^4 blocks.
    ``"shuffle"`` combines via ``groupby(iv, bucket)`` first — one
    exchange per pass but driver traffic independent of block count;
    use it at 10^5+-block scale (SCALE.md)."""
    if combine not in ("stream", "shuffle"):
        raise ValueError("combine must be 'stream' or 'shuffle'")

    def stats_partial(batch: pa.Table) -> pa.Table:
        is_int = pa.types.is_integer(batch.schema.field(col).type)
        x = _values(batch, col, is_int)
        if len(x) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.float64()),
                 pa.array([], pa.float64()), pa.array([], pa.int64()),
                 pa.array([], pa.int64()), pa.array([], pa.bool_())],
                names=["cnt", "mn", "mx", "imn", "imx", "is_int"],
            )
        return pa.Table.from_arrays(
            [pa.array([len(x)], pa.int64()),
             pa.array([float(x.min())], pa.float64()),
             pa.array([float(x.max())], pa.float64()),
             pa.array([int(x.min()) if is_int else 0], pa.int64()),
             pa.array([int(x.max()) if is_int else 0], pa.int64()),
             pa.array([is_int], pa.bool_())],
            names=["cnt", "mn", "mx", "imn", "imx", "is_int"],
        )

    n, fglo, fghi = 0, np.inf, -np.inf
    iglo, ighi = None, None
    as_int = True
    for tbl in ds.map_batches(
        stats_partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        if not tbl.num_rows:
            continue
        n += pc_sum(tbl["cnt"]).as_py()
        fglo = min(fglo, pc_min(tbl["mn"]).as_py())
        fghi = max(fghi, pc_max(tbl["mx"]).as_py())
        if not all(tbl["is_int"].to_pylist()):
            as_int = False
        bmn, bmx = pc_min(tbl["imn"]).as_py(), pc_max(tbl["imx"]).as_py()
        iglo = bmn if iglo is None else min(iglo, bmn)
        ighi = bmx if ighi is None else max(ighi, bmx)
    if not n:
        raise ValueError("exact_quantiles: empty column")
    glo, ghi = (iglo, ighi) if as_int else (fglo, fghi)

    targets = _rank_targets(qs, n)
    results: dict[int, float] = {}
    # Active work: interval -> (lo, hi, {qi: rank_within_interval}) where
    # rank is 1-based among rows with value in [lo, hi].
    work: list[tuple] = [(glo, ghi, {i: t for i, t in enumerate(targets)})]

    from ray.data.aggregate import Max, Min, Sum

    passes = 0
    while work:
        passes += 1
        if passes > max_passes:
            raise RuntimeError(
                f"exact_quantiles: no convergence after {max_passes} passes "
                f"(pathological float distribution?); raise collect_cap"
            )
        # Resolve degenerate intervals without a pass.
        still = []
        for lo, hi, ranks in work:
            if lo == hi:
                for qi in ranks:
                    results[qi] = lo
            else:
                still.append((lo, hi, ranks))
        if not still:
            break
        intervals = [(lo, hi) for lo, hi, _ in still]
        part = _hist_partial(intervals, col, num_buckets, as_int)
        partials = ds.map_batches(part, batch_format="pyarrow", batch_size=None)
        niv = len(intervals)
        if combine == "stream":
            # Dense driver accumulators — constant state, zero exchanges.
            vdt = np.int64 if as_int else np.float64
            vmin = np.iinfo(np.int64).max if as_int else np.inf
            vmax = np.iinfo(np.int64).min if as_int else -np.inf
            cnts = np.zeros((niv, num_buckets), dtype=np.int64)
            mins = np.full((niv, num_buckets), vmin, dtype=vdt)
            maxs = np.full((niv, num_buckets), vmax, dtype=vdt)
            for tbl in partials.iter_batches(batch_format="pyarrow"):
                if not tbl.num_rows:
                    continue
                iv = tbl["iv"].to_numpy(zero_copy_only=False)
                bk = tbl["bucket"].to_numpy(zero_copy_only=False)
                flat = iv.astype(np.int64) * num_buckets + bk
                np.add.at(cnts.ravel(), flat, tbl["cnt"].to_numpy(zero_copy_only=False))
                np.minimum.at(mins.ravel(), flat, tbl["bmin"].to_numpy(zero_copy_only=False))
                np.maximum.at(maxs.ravel(), flat, tbl["bmax"].to_numpy(zero_copy_only=False))
            per_iv = {
                i: [
                    (int(b), int(cnts[i, b]), mins[i, b].item(), maxs[i, b].item())
                    for b in np.flatnonzero(cnts[i])
                ]
                for i in range(niv)
            }
        else:
            rows = (
                partials.groupby(["iv", "bucket"])
                .aggregate(Sum("cnt"), Min("bmin"), Max("bmax"))
                .take_all()  # ≤ intervals × num_buckets tiny rows
            )
            per_iv = {}
            for r in rows:
                per_iv.setdefault(r["iv"], []).append(
                    (r["bucket"], r["sum(cnt)"], r["min(bmin)"], r["max(bmax)"])
                )
        # Per interval: sorted bucket table → cumulative counts → locate
        # each rank's bucket; recurse into the bucket's OBSERVED [min,max].
        next_work: dict[tuple, dict[int, int]] = {}
        for i, (lo, hi, ranks) in enumerate(still):
            buckets = sorted(per_iv.get(i, []))
            cum = np.cumsum([b[1] for b in buckets])
            for qi, rank in ranks.items():
                j = int(np.searchsorted(cum, rank, side="left"))
                _, cnt, bmin, bmax = buckets[j]
                rank_in_bucket = rank - (int(cum[j - 1]) if j else 0)
                if bmin == bmax:
                    results[qi] = bmin
                elif (bmin, bmax) == (lo, hi) and cnt <= collect_cap:
                    # Histogram made no progress (interval width at float
                    # resolution) but the cluster is small — count exactly.
                    results[qi] = _collect_rank(
                        ds, col, bmin, bmax, rank_in_bucket, as_int
                    )
                elif (bmin, bmax) == (lo, hi):
                    raise RuntimeError(
                        "exact_quantiles: dense float cluster beyond "
                        f"collect_cap={collect_cap} at [{lo}, {hi}]"
                    )
                else:
                    key = (bmin, bmax)
                    next_work.setdefault(key, {})[qi] = rank_in_bucket
        work = [(lo, hi, ranks) for (lo, hi), ranks in next_work.items()]

    return [(q, results[i]) for i, q in enumerate(qs)]


def _collect_rank(ds, col: str, lo, hi, rank: int, as_int: bool):
    """Finisher for pathological float clusters: one filtered pass emits
    pre-aggregated per-block (value, count) rows for values in [lo, hi];
    the groupby result is ≤ collect_cap distinct values — pick the rank
    from its cumulative counts on the driver."""
    from ray.data.aggregate import Sum

    val_type = pa.int64() if as_int else pa.float64()

    def vals(batch: pa.Table) -> pa.Table:
        x = _values(batch, col, as_int)
        sel = x[(x >= lo) & (x <= hi)]
        u, c = np.unique(sel, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u, val_type), pa.array(c, pa.int64())],
            names=["value", "cnt"],
        )

    rows = (
        ds.map_batches(vals, batch_format="pyarrow", batch_size=None)
        .groupby("value")
        .aggregate(Sum("cnt"))
        .sort("value")
        .take_all()
    )
    cum = 0
    for r in rows:
        cum += r["sum(cnt)"]
        if cum >= rank:
            return r["value"]
    raise RuntimeError("exact_quantiles: rank beyond interval count")

def group_quantiles(ds, group_col: str, value_col: str, qs: list[float]):
    """Exact per-GROUP quantiles: value at rank ``ceil(q*n)`` (1-based,
    ascending, IEEE-double rank arithmetic — the same convention as
    :func:`exact_quantiles`, so a ``row_number`` SQL oracle is value-exact
    including ties) within each group.

    Groups are assumed numerous-but-bounded-cardinality relative to rows
    (languages, domains, buckets): the op is one ``(group, value)`` sort —
    the honest exchange when every group needs an order statistic — with a
    vectorized per-segment gather (no per-group Python; straddling groups
    ride the segment runner's deferral). For ONE global quantile over a
    huge column use :func:`exact_quantiles`, which never moves the column.
    Null values are excluded per SQL aggregate semantics (all-null groups
    vanish); null group keys are excluded like every groupby here.
    """
    from .segments import sorted_segment_apply

    qs = list(qs)

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        # Explicit output types: a kernel call with zero complete segments
        # must still emit the same schema (pa.array on an empty object
        # array would infer `null` and desynchronize block schemas).
        gtype = batch.schema.field(group_col).type
        vtype = batch.schema.field(value_col).type
        names = [group_col, "q", "value"]
        if len(starts) == 0 or not qs:
            return pa.Table.from_arrays(
                [pa.array([], gtype), pa.array([], pa.float64()), pa.array([], vtype)],
                names=names,
            )
        groups = batch[group_col].to_numpy(zero_copy_only=False)[starts]
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        lens = ends - starts
        out_g, out_q, out_v = [], [], []
        for q in qs:  # constant-length loop; vectorized across segments
            ranks = np.ceil(np.float64(q) * lens).astype(np.int64)
            np.clip(ranks, 1, lens, out=ranks)
            idx = starts + ranks - 1
            out_g.append(groups)
            out_q.append(np.full(len(starts), q))
            out_v.append(vals[idx])
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_g), gtype),
                pa.array(np.concatenate(out_q), pa.float64()),
                pa.array(np.concatenate(out_v), vtype),
            ],
            names=names,
        )

    clean = ds.map_batches(
        lambda b: b.filter(
            pc.and_(pc.is_valid(b[group_col]), pc.is_valid(b[value_col]))
        ),
        batch_format="pyarrow",
    )
    return sorted_segment_apply(
        clean, key_col=group_col, block_fn=kernel, within_cols=[value_col]
    )


def group_winsorize(
    ds, group_col: str, value_col: str, q_lo: float = 0.05, q_hi: float = 0.95
):
    """Per-group winsorized statistics: clip each group's values to its own
    exact rank quantiles [value@ceil(q_lo·n), value@ceil(q_hi·n)] and emit
    one row per group — ``(group, n, lo, hi, sum_raw, sum_clipped,
    n_clipped)``. The robust-mean building block for per-language /
    per-domain length normalization (outlier pages don't drag the mean).

    Same honest exchange as :func:`group_quantiles` — ONE (group, value)
    sort — but clipping folds into the same segment pass: with values
    sorted within each segment, the clipped sum is

        lo·(r_lo−1) + (prefix[hi] − prefix[lo−1]) + hi·(n−r_hi)

    from one block-wide cumulative sum, all segments at once, no
    per-group Python. Integer inputs stay integer-exact end to end.
    """
    from .segments import sorted_segment_apply

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        gtype = batch.schema.field(group_col).type
        names = [group_col, "n", "lo", "hi", "sum_raw", "sum_clipped", "n_clipped"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], gtype)] + [pa.array([], pa.int64())] * 6,
                names=names,
            )
        groups = batch[group_col].to_numpy(zero_copy_only=False)[starts]
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = (ends - starts).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(vals)])

        r_lo = np.clip(np.ceil(np.float64(q_lo) * lens).astype(np.int64), 1, lens)
        r_hi = np.clip(np.ceil(np.float64(q_hi) * lens).astype(np.int64), 1, lens)
        lo = vals[starts + r_lo - 1]
        hi = vals[starts + r_hi - 1]
        sum_raw = csum[ends] - csum[starts]
        mid = csum[starts + r_hi] - csum[starts + r_lo - 1]
        sum_clipped = lo * (r_lo - 1) + mid + hi * (lens - r_hi)
        n_clipped = (r_lo - 1) + (lens - r_hi)
        return pa.Table.from_arrays(
            [
                pa.array(groups, gtype),
                pa.array(lens),
                pa.array(lo),
                pa.array(hi),
                pa.array(sum_raw),
                pa.array(sum_clipped),
                pa.array(n_clipped),
            ],
            names=names,
        )

    clean = ds.map_batches(
        lambda b: b.filter(
            pc.and_(pc.is_valid(b[group_col]), pc.is_valid(b[value_col]))
        ),
        batch_format="pyarrow",
    )
    return sorted_segment_apply(
        clean, key_col=group_col, block_fn=kernel, within_cols=[value_col]
    )


def gini_concentration(
    ds,
    key_col: str,
    weight_col: str,
):
    """Exact Gini coefficient of the per-key weight distribution — the
    standard concentration number for a training mix ("how skewed is the
    corpus across domains/sources?"; 0 = uniform, →1 = one key holds
    everything).

    Formula over the n per-key totals sorted ascending (1-based rank i):
    ``G = (2·Σ i·x_i − (n+1)·Σ x) / (n·Σ x)``. Ties in x contribute a
    fixed Σi regardless of intra-tie order, so the value is independent
    of tiebreaks and of how a tie group straddles sorted blocks.

    Exchange shape: one ``groupby(key).sum`` (keys-sized, the honest
    exchange) → one keys-sized sort by total → one per-block partial
    pass emitting ``(first_total, count, Σx, Σ local_i·x)`` — the same
    block-offset scheme as :func:`..ops.shard.shard_plan` — combined on
    the driver with Python big-ints (blocks-sized driver state, never
    keys-sized rows beyond the partials).

    Integer exactness: the per-block weighted sum (the QUADRATIC term,
    which can exceed int64 long before the totals do) uses a fast int64
    vectorized path when ``n_block² · max|x|`` provably fits 62 bits,
    else an object-dtype exact fallback, and travels as a decimal
    string; the driver combine and the final numerator/denominator are
    Python ints. ``Σx`` itself must fit int64 — corpus bytes/tokens do
    by orders of magnitude. The returned
    ``gini`` is ``float(num)/float(den)`` — numerator and denominator
    each rounded to float64 THEN divided, exactly what SQL's
    ``CAST(a AS DOUBLE)/CAST(b AS DOUBLE)`` computes, so the oracle
    reproduces the double bit-for-bit.

    Returns a one-row pa.Table ``(n_keys, total, gini)``.
    """
    from ray.data.aggregate import Sum

    totals = (
        ds.select_columns([key_col, weight_col])
        .groupby(key_col)
        .aggregate(Sum(weight_col, alias_name="x"))
        .select_columns(["x"])
        .sort("x")
        .materialize()
    )

    def block_partial(batch: pa.Table) -> pa.Table:
        names = ["first_x", "cnt", "s", "swx"]
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.string()),
                ],
                names=names,
            )
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        i = np.arange(1, n + 1, dtype=np.int64)  # local 1-based ranks
        mx = int(np.abs(x).max()) if n else 0
        if mx and n * mx < (1 << 62) // max(n, 1):
            swx = int(np.dot(i, x))
        else:  # exact big-int fallback for extreme magnitudes
            swx = int(np.dot(i.astype(object), x.astype(object)))
        return pa.Table.from_arrays(
            [
                pa.array([int(x[0])], pa.int64()),
                pa.array([n], pa.int64()),
                pa.array([int(x.sum(dtype=np.int64))], pa.int64()),
                pa.array([str(swx)], pa.string()),
            ],
            names=names,
        )

    parts = totals.map_batches(
        block_partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    parts.sort(key=lambda r: (r["first_x"], r["cnt"]))
    n_total = 0
    s_total = 0
    swx_total = 0
    for r in parts:
        # global Σ i·x for the block = local Σ i·x + offset · Σx
        swx_total += int(r["swx"]) + n_total * int(r["s"])
        n_total += int(r["cnt"])
        s_total += int(r["s"])
    if n_total == 0 or s_total == 0:
        gini = 0.0
    else:
        num = 2 * swx_total - (n_total + 1) * s_total
        den = n_total * s_total
        gini = float(num) / float(den)
    return pa.Table.from_arrays(
        [
            pa.array([n_total], pa.int64()),
            pa.array([s_total], pa.int64()),
            pa.array([gini], pa.float64()),
        ],
        names=["n_keys", "total", "gini"],
    )


def global_ntile(
    ds,
    n_tiles: int,
    score_col: str,
    id_col: str = "doc_id",
):
    """Exact corpus-wide tier assignment (the "tier extraction" primitive
    quality-bucketed curation pipelines need — FineWeb-Edu / DCLM style
    quality tiers, but with exact rank semantics instead of sampled
    thresholds): every row gets its global 1-based rank under
    ``(score ASC, id ASC)`` and ``tier = (rank - 1) * n_tiles // n`` —
    tier ``n_tiles - 1`` holds the top scores. Ties are broken by id, so
    the assignment is deterministic and layout-independent.

    Shape (shard_plan's distributed prefix scan, `ops/shard.py`): ONE
    global sort over 16-byte ``(score, id)`` rows — the honest exchange,
    rank is a global order statistic — then per-block ``(first_id,
    n_rows)`` partials (one row per block to the driver), a driver
    exclusive scan over ~num_blocks rows, and a second pass over the SAME
    materialized blocks adding ``offset + arange``. Nothing corpus-sized
    ever lands on the driver; at 10^12 rows the driver holds one row per
    block.

    Returns a Dataset of ``(id, score, rank, tier)``.
    """
    if n_tiles <= 0:
        raise ValueError("global_ntile: n_tiles must be positive")

    ordered = (
        ds.select_columns([id_col, score_col])
        .sort([score_col, id_col])
        .materialize()
    )

    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                ],
                names=["first_score", "first_id", "n_rows"],
            )
        return pa.Table.from_arrays(
            [
                pa.array([batch[score_col][0].as_py()], pa.int64()),
                pa.array([batch[id_col][0].as_py()], pa.int64()),
                pa.array([batch.num_rows], pa.int64()),
            ],
            names=["first_score", "first_id", "n_rows"],
        )

    partials = ordered.map_batches(
        block_partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    partials.sort(key=lambda r: (r["first_score"], r["first_id"]))
    offsets: dict[int, int] = {}
    running = 0
    for r in partials:
        offsets[r["first_id"]] = running
        running += r["n_rows"]
    total = running

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4,
                names=[id_col, score_col, "rank", "tier"],
            )
        base = offsets[batch[id_col][0].as_py()]
        rank0 = base + np.arange(batch.num_rows, dtype=np.int64)
        return pa.Table.from_arrays(
            [
                batch[id_col],
                batch[score_col],
                pa.array(rank0 + 1),
                pa.array(rank0 * n_tiles // total),
            ],
            names=[id_col, score_col, "rank", "tier"],
        )

    return ordered.map_batches(assign, batch_format="pyarrow", batch_size=None)


def outlier_census(
    ds,
    group_col: str,
    value_col: str,
    group_cap: int = 100_000,
):
    """Per-group Tukey-fence outlier census over an INTEGER value
    column: with q1/q3 the exact rank-``ceil(q·n)`` quartiles
    (:func:`group_quantiles` convention), a value is an outlier when
    ``2·v < 2·q1 − 3·IQR`` or ``2·v > 2·q3 + 3·IQR`` — the classic
    1.5·IQR fences doubled into pure integer arithmetic, so the
    window-function oracle is bit-exact (no 1.5 float anywhere).

    Shape: one :func:`group_quantiles` sort for the quartiles (driver
    collects 2 rows per group, gated by ``group_cap``; groups are
    enum-like by contract), the bounds broadcast once, then ONE
    shuffle-free counting pass with per-block partials into a
    ``groupby(group).sum``. Returns a Dataset ``(group, n, n_low,
    n_high)``.
    """
    import ray
    from ray.data.aggregate import Sum

    qdf = group_quantiles(ds, group_col, value_col, [0.25, 0.75]).to_pandas()
    if qdf[group_col].nunique() > group_cap:
        raise RuntimeError(
            f"outlier_census: {qdf[group_col].nunique()} groups exceed "
            f"group_cap={group_cap} — fence bounds are per-group driver "
            "state; bound the group column"
        )
    bounds = {}
    for g, sub in qdf.groupby(group_col):
        q1 = int(sub.loc[sub["q"] == 0.25, "value"].iloc[0])
        q3 = int(sub.loc[sub["q"] == 0.75, "value"].iloc[0])
        iqr = q3 - q1
        bounds[g] = (2 * q1 - 3 * iqr, 2 * q3 + 3 * iqr)
    bref = ray.put(bounds)

    def partial(batch: pa.Table) -> pa.Table:
        bd = ray.get(bref)
        groups = np.asarray(batch[group_col].to_pylist(), dtype=object)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        ok = np.asarray(
            [g is not None for g in groups], bool
        ) & ~pa.compute.is_null(batch[value_col]).to_numpy(
            zero_copy_only=False
        )
        out_g, n, lo, hi = [], [], [], []
        for g in set(groups[ok].tolist()):
            if g not in bd:
                continue
            lo2, hi2 = bd[g]
            sel = ok & (groups == g)
            v2 = 2 * vals[sel].astype(np.int64)
            out_g.append(str(g))
            n.append(int(sel.sum()))
            lo.append(int((v2 < lo2).sum()))
            hi.append(int((v2 > hi2).sum()))
        return pa.Table.from_arrays(
            [
                pa.array(out_g, pa.string()),
                pa.array(n, pa.int64()),
                pa.array(lo, pa.int64()),
                pa.array(hi, pa.int64()),
            ],
            names=["group", "n", "n_low", "n_high"],
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("group")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_low", alias_name="n_low"),
            Sum("n_high", alias_name="n_high"),
        )
        .map_batches(
            lambda t: t.rename_columns(["group", "n", "n_low", "n_high"]),
            batch_format="pyarrow",
        )
    )


def group_mad(
    ds,
    group_col: str,
    value_col: str,
    group_cap: int = 100_000,
):
    """Per-group median absolute deviation — the robust dispersion
    companion to :func:`outlier_census` (MAD survives the exact heavy
    tails that wreck a stddev): ``median`` is the rank-``ceil(n/2)``
    value (:func:`group_quantiles` convention), ``mad`` the same rank
    over ``|v − median|``, both exact integers.

    Shape: one :func:`group_quantiles` sort for the medians (2 rows
    per group on the driver, ``group_cap``-gated), the medians
    broadcast once, one shuffle-free transform pass, then a SECOND
    group_quantiles sort over the deviations — two honest exchanges,
    the price of two order statistics. Returns a Dataset
    ``(group, median, mad)``.
    """
    import ray

    qdf = group_quantiles(ds, group_col, value_col, [0.5]).to_pandas()
    if qdf[group_col].nunique() > group_cap:
        raise RuntimeError(
            f"group_mad: {qdf[group_col].nunique()} groups exceed group_cap"
        )
    med = {
        r[group_col]: int(r["value"]) for _, r in qdf.iterrows()
    }
    mref = ray.put(med)

    def deviations(batch: pa.Table) -> pa.Table:
        md = ray.get(mref)
        groups = np.asarray(batch[group_col].to_pylist(), dtype=object)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        keep = np.array([g in md for g in groups], bool) & ~pa.compute.is_null(
            batch[value_col]
        ).to_numpy(zero_copy_only=False)
        groups, vals = groups[keep], vals[keep].astype(np.int64)
        meds = np.array([md[g] for g in groups], np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(groups.astype(str), pa.string()),
                pa.array(np.abs(vals - meds), pa.int64()),
            ],
            names=["grp", "dev"],
        )

    mad_ds = group_quantiles(
        ds.map_batches(deviations, batch_format="pyarrow"), "grp", "dev", [0.5]
    )

    def emit(batch: pa.Table) -> pa.Table:
        md = ray.get(mref)
        groups = batch["grp"].to_pylist()
        return pa.Table.from_arrays(
            [
                pa.array([str(g) for g in groups], pa.string()),
                pa.array([md[g] for g in groups], pa.int64()),
                batch["value"].cast(pa.int64()),
            ],
            names=["group", "median", "mad"],
        )

    return mad_ds.map_batches(emit, batch_format="pyarrow")
