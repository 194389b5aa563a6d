"""Table profiling: per-column row/null/distinct/min/max statistics.

The data-quality pass a pipeline runs before trusting a new drop of
parquet: for each requested column, row count, null count, EXACT distinct
count, and min/max. Shape:

- ONE streaming pass emits per-block partials — a fixed row per (block,
  column) with counts and native-typed min/max (never value lists), plus
  per-block-DEDUPED ``(column, value)`` pairs for the distinct count.
- The only exchange is the distinct-pair sort inside
  :func:`..segments.distinct_count_per_key` (one row per distinct pair
  per block — the same discipline as the inverted index).
- Driver state: O(blocks × columns) partial rows, never values.

Min/max render as strings in the OUTPUT ONLY (comparison happens on
native types per block and on the preserved native partials at the
merge), so one uniform schema covers int and string columns and the SQL
oracle states ``CAST(min(col) AS VARCHAR)``.
"""

from __future__ import annotations

import numpy as np

import pyarrow as pa
import pyarrow.compute as pc


def profile_table(ds, cols: list[str]) -> pa.Table:
    """→ one row per column: ``(column, n_rows, n_nulls, n_distinct,
    min_val, max_val)`` — min/max as strings, null when all-null."""
    from .segments import distinct_count_per_key

    cols = list(cols)

    def partials(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins_i, maxs_i, mins_s, maxs_s = (
            [], [], [], [], [], [], [],
        )
        for c in cols:
            col = batch[c]
            names.append(c)
            ns.append(batch.num_rows)
            nulls.append(col.null_count)
            mn = pc.min(col).as_py() if batch.num_rows else None
            mx = pc.max(col).as_py() if batch.num_rows else None
            if pa.types.is_integer(col.type):
                mins_i.append(mn); maxs_i.append(mx)
                mins_s.append(None); maxs_s.append(None)
            else:
                mins_i.append(None); maxs_i.append(None)
                mins_s.append(None if mn is None else str(mn))
                maxs_s.append(None if mx is None else str(mx))
        return pa.Table.from_arrays(
            [
                pa.array(names, pa.string()),
                pa.array(ns, pa.int64()),
                pa.array(nulls, pa.int64()),
                pa.array(mins_i, pa.int64()),
                pa.array(maxs_i, pa.int64()),
                pa.array(mins_s, pa.string()),
                pa.array(maxs_s, pa.string()),
            ],
            names=["column", "n", "n_null", "min_i", "max_i", "min_s", "max_s"],
        )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        out_c, out_v = [], []
        for c in cols:
            vals = batch[c].drop_null()
            uniq = pc.unique(vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals)
            sv = [str(x) for x in uniq.to_pylist()]
            out_c.extend([c] * len(sv))
            out_v.extend(sv)
        return pa.Table.from_arrays(
            [pa.array(out_c, pa.string()), pa.array(out_v, pa.string())],
            names=["column", "value"],
        )

    nd_rows = distinct_count_per_key(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        key_col="column",
        value_col="value",
    ).take_all()
    nd = {r["column"]: int(r["n_distinct"]) for r in nd_rows}

    agg: dict[str, dict] = {
        c: {"n": 0, "n_null": 0, "min_i": None, "max_i": None,
            "min_s": None, "max_s": None}
        for c in cols
    }
    for batch in ds.map_batches(
        partials, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for r in batch.to_pylist():
            a = agg[r["column"]]
            a["n"] += r["n"]
            a["n_null"] += r["n_null"]
            for lo, hi in (("min_i", "max_i"), ("min_s", "max_s")):
                if r[lo] is not None:
                    a[lo] = r[lo] if a[lo] is None else min(a[lo], r[lo])
                if r[hi] is not None:
                    a[hi] = r[hi] if a[hi] is None else max(a[hi], r[hi])

    return pa.Table.from_arrays(
        [
            pa.array(cols, pa.string()),
            pa.array([agg[c]["n"] for c in cols], pa.int64()),
            pa.array([agg[c]["n_null"] for c in cols], pa.int64()),
            pa.array([nd.get(c, 0) for c in cols], pa.int64()),
            pa.array(
                [
                    str(agg[c]["min_i"]) if agg[c]["min_i"] is not None
                    else agg[c]["min_s"]
                    for c in cols
                ],
                pa.string(),
            ),
            pa.array(
                [
                    str(agg[c]["max_i"]) if agg[c]["max_i"] is not None
                    else agg[c]["max_s"]
                    for c in cols
                ],
                pa.string(),
            ),
        ],
        names=["column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"],
    )


def chi_square_census(
    ds,
    col_a: str,
    col_b: str,
    cat_cap: int = 10_000,
):
    """Pearson chi-square independence census between two enum-like
    columns, as an EXACT RATIONAL in floor milli-units: with N total
    rows, row sums R_i, column sums C_j and observed O_ij,

        chi2 = Σ_ij (O_ij·N − R_i·C_j)² / (N·R_i·C_j)

    — the (O−E)²/E sum with every term over the common structure
    N·R_i·C_j, computed in Python big-ints (the numerator squares
    overflow int64 by design) and reported as ``1000·chi2`` floored.
    The independence screen for corpus curation: language × quality
    tier, host × status class, source × dedup fate.

    Shape: per-block (a, b) pair-count partials pre-combine before ONE
    ``groupby(a, b).sum``; the contingency table (bounded by
    ``cat_cap`` cells, categories are enums by contract) is the only
    driver collection. Returns a one-row pandas DataFrame
    ``(n, n_rows_cat, n_cols_cat, dof, chi2_milli)``.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[col_a].to_pylist(), dtype=object)
        b = np.asarray(batch[col_b].to_pylist(), dtype=object)
        keep = np.array(
            [x is not None and y is not None for x, y in zip(a, b)], bool
        )
        comp = np.char.add(
            np.char.add(a[keep].astype(str), "\x1f"), b[keep].astype(str)
        )
        uniq, inv = np.unique(comp, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        parts = np.char.partition(uniq.astype(str), "\x1f")
        return pa.Table.from_arrays(
            [
                pa.array(parts[:, 0].astype(object), pa.string()),
                pa.array(parts[:, 2].astype(object), pa.string()),
                pa.array(cnt, pa.int64()),
            ],
            names=["a", "b", "n"],
        )

    cells = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.rename_columns(["a", "b", "n"]), batch_format="pyarrow"
        )
        .to_pandas()
    )
    if len(cells) > cat_cap:
        raise RuntimeError(
            f"chi_square_census: {len(cells)} contingency cells exceed "
            f"cat_cap={cat_cap} — both columns must be enum-like"
        )
    n_total = int(cells["n"].sum())
    r_sum = cells.groupby("a")["n"].sum().to_dict()
    c_sum = cells.groupby("b")["n"].sum().to_dict()
    # Per-cell floor-milli terms, summed as exact integers: SQL cannot
    # sum exact rationals with heterogeneous denominators, so the
    # metric is DEFINED as Σ_ij floor(1000·(O·N − R·C)² / (N·R_i·C_j))
    # over the full category cross product — order-independent and
    # bit-identical on both engines (each term is one HUGEINT floor).
    obs = {(r.a, r.b): int(r.n) for r in cells.itertuples()}
    chi2_milli = 0
    for ra, rv in r_sum.items():
        for cb, cv in c_sum.items():
            o = obs.get((ra, cb), 0)
            d = o * n_total - rv * cv
            chi2_milli += (1000 * d * d) // (n_total * rv * cv)
    dof = (len(r_sum) - 1) * (len(c_sum) - 1)
    return pd.DataFrame(
        {
            "n": [n_total],
            "n_rows_cat": [len(r_sum)],
            "n_cols_cat": [len(c_sum)],
            "dof": [dof],
            "chi2_milli": [chi2_milli],
        }
    )


def benford_census(
    ds,
    group_col: str,
    value_col: str,
):
    """Leading-significant-digit census per group (Benford screen —
    fabricated or synthetic numeric columns drift from the log
    distribution; the classic forensic-accounting signal applied to
    crawl metrics): counts of first significant digits 1–9 of the
    absolute INTEGER value column, zero values excluded, plus each
    group's digit-1 share in floor milli.

    Shape: per-block (group, digit) partials pre-combine before ONE
    ``groupby(group, digit).sum``; one segment pass widens to the
    fixed 9-digit schema. Returns a Dataset ``(group, d1..d9,
    digit1_milli)``.
    """
    from ray.data.aggregate import Sum

    from .segments import sorted_segment_apply

    def partials(batch: pa.Table) -> pa.Table:
        groups = np.asarray(batch[group_col].to_pylist(), dtype=object)
        vals = np.abs(batch[value_col].to_numpy(zero_copy_only=False))
        keep = np.array([g is not None for g in groups], bool) & (vals > 0)
        groups, vals = groups[keep], vals[keep].astype(np.int64)
        # first significant digit: strip trailing magnitude via log-free
        # integer division (vectorized loop over <=19 decades)
        v = vals.copy()
        big = v >= 10
        while big.any():
            v[big] //= 10
            big = v >= 10
        comp = np.char.add(
            np.char.add(groups.astype(str), "\x1f"), v.astype(str)
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
            names=["grp", "digit", "n"],
        )

    pairs = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["grp", "digit"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.rename_columns(["grp", "digit", "n"]),
            batch_format="pyarrow",
        )
    )

    names = ["group"] + [f"d{d}" for d in range(1, 10)] + ["digit1_milli"]

    def widen(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string())] + [pa.array([], pa.int64())] * 10,
                names=names,
            )
        grp = batch["grp"].combine_chunks()
        digit = batch["digit"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        seg = np.zeros(len(digit), np.int64)
        seg[starts] = 1
        seg = np.cumsum(seg) - 1
        ok = np.zeros(len(digit) + 1, np.int64)
        ok[starts] += 1
        ok[ends] -= 1
        inside = np.cumsum(ok[:-1]) > 0
        mat = np.zeros((len(starts), 9), np.int64)
        np.add.at(
            mat, (seg[inside], digit[inside] - 1), n[inside]
        )
        tot = mat.sum(axis=1)
        d1m = np.where(tot > 0, 1000 * mat[:, 0] // np.maximum(tot, 1), 0)
        return pa.Table.from_arrays(
            [grp.take(pa.array(starts))]
            + [pa.array(mat[:, j], pa.int64()) for j in range(9)]
            + [pa.array(d1m.astype(np.int64), pa.int64())],
            names=names,
        )

    return sorted_segment_apply(
        pairs, key_col="grp", block_fn=widen, within_cols=["digit"]
    )


def source_rollup(
    ds,
    group_col: str = "source",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
):
    """Per-source corpus dashboard rollup — the summary every curation
    run reports per provenance slice: document count, total characters,
    floor mean characters, exact distinct language count, the majority
    language (ties → lexicographically smallest) and its floor-milli
    share. Language-skewed sources (majority share ≈ 1000) and
    mixed-language sources separate at a glance.

    Shape: per-block (source, lang) partials carrying doc and char
    counts pre-combine before ONE ``groupby(source, lang).sum`` — the
    exchange is source×lang cardinality, never rows — then one
    :func:`..ops.segments.sorted_segment_apply` reduces each source's
    totals, distinct-language count and argmax in vectorized gathers.

    Returns a Dataset ``(source, n_docs, total_chars, mean_chars,
    n_langs, major_lang, major_milli)``.
    """
    from ray.data.aggregate import Sum

    from .segments import sorted_segment_apply

    def partials(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch[group_col].to_pylist(), dtype=object)
        lang = np.asarray(batch[lang_col].to_pylist(), dtype=object)
        chars = batch[chars_col].to_numpy(zero_copy_only=False)
        keep = np.array(
            [s is not None and l is not None for s, l in zip(src, lang)], bool
        )
        src, lang, chars = src[keep], lang[keep], chars[keep].astype(np.int64)
        comp = np.char.add(np.char.add(src.astype(str), "\x1f"),
                           lang.astype(str))
        uniq, inv = np.unique(comp, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        ch = np.bincount(inv, weights=chars.astype(np.float64)).astype(np.int64)
        parts = np.char.partition(uniq.astype(str), "\x1f")
        return pa.Table.from_arrays(
            [
                pa.array(parts[:, 0].astype(object), pa.string()),
                pa.array(parts[:, 2].astype(object), pa.string()),
                pa.array(n, pa.int64()),
                pa.array(ch, pa.int64()),
            ],
            names=["src", "lang", "n", "chars"],
        )

    pairs = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["src", "lang"])
        .aggregate(Sum("n", alias_name="n"), Sum("chars", alias_name="chars"))
        .map_batches(
            lambda t: t.rename_columns(["src", "lang", "n", "chars"]),
            batch_format="pyarrow",
        )
    )

    names = ["source", "n_docs", "total_chars", "mean_chars", "n_langs",
             "major_lang", "major_milli"]

    def rollup(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string())] + [pa.array([], pa.int64())] * 4
                + [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=names,
            )
        src = batch["src"].combine_chunks()
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        n = batch["n"].to_numpy(zero_copy_only=False)
        ch = batch["chars"].to_numpy(zero_copy_only=False)
        cs_n = np.concatenate([[0], np.cumsum(n)])
        cs_c = np.concatenate([[0], np.cumsum(ch)])
        n_docs = cs_n[ends] - cs_n[starts]
        total = cs_c[ends] - cs_c[starts]
        n_langs = (ends - starts).astype(np.int64)
        # argmax per segment: rows are sorted by (src, lang); find the
        # max count with min-lang tiebreak via a masked lexsort trick —
        # within each segment take the first row after ordering by
        # (-n, lang); rows are already lang-ascending, so a stable
        # per-segment max scan suffices.
        major_idx = np.empty(len(starts), np.int64)
        for i, (s, e) in enumerate(zip(starts, ends)):  # segments are
            # source-cardinality, not row-cardinality; the inner argmax
            # is vectorized
            seg = n[s:e]
            major_idx[i] = s + int(np.argmax(seg))
        major_lang = lang[major_idx]
        major_n = n[major_idx]
        return pa.Table.from_arrays(
            [
                src.take(pa.array(starts)),
                pa.array(n_docs, pa.int64()),
                pa.array(total, pa.int64()),
                pa.array(total // np.maximum(n_docs, 1), pa.int64()),
                pa.array(n_langs, pa.int64()),
                pa.array(major_lang.astype(str), pa.string()),
                pa.array(1000 * major_n // np.maximum(n_docs, 1), pa.int64()),
            ],
            names=names,
        )

    return sorted_segment_apply(
        pairs, key_col="src", block_fn=rollup, within_cols=["lang"]
    )
