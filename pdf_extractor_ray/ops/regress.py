"""Exact distributed ordinary-least-squares regression.

The distributed-ML primitive behind quality-score calibration and feature
weighting in curation pipelines (e.g. weighting doc-level heuristics
against a labeled target): fit ``y ≈ β₀ + Σ βᵢ·xᵢ`` by the normal
equations ``(XᵀX)·β = Xᵀy``, computed EXACTLY over integer features.

Scale shape — the textbook one-pass decomposition:

1. Each block reduces to ONE partial row carrying the upper triangle of
   ``XᵀX`` and ``Xᵀy`` (``(p+1)(p+2)/2 + (p+1)`` int64 sums for ``p``
   features, intercept included). The corpus never moves; the exchange is
   O(blocks) tiny rows.
2. The driver merges partials as unbounded Python ints and solves by
   Cramer's rule with a fraction-free Bareiss determinant — no floating
   point anywhere, so the result is layout-independent and byte-exactly
   reproducible by integer SQL.

Coefficients are reported UNREDUCED as ``num = det(Aᵢ)``, ``den =
det(A)`` (decimal strings — they exceed int64 quickly): both sides of an
oracle can replay the same determinant polynomial without agreeing on a
gcd convention or a float rounding mode.

Per-block int64 overflow bound: ``max|x|·max|y|·block_rows`` must stay
below 2⁶³ (e.g. features ≤ 3·10⁴, blocks ≤ 10⁶ rows → ≤ 10¹⁵). The
driver-side merge and solve are unbounded.

No counterpart in the reference repo; this belongs to the engine's
training-data-pipeline surface (SURVEY §2 additions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bareiss_det(m: list[list[int]]) -> int:
    """Exact integer determinant (fraction-free Bareiss elimination)."""
    a = [row[:] for row in m]
    n = len(a)
    sign = 1
    prev = 1
    for k in range(n - 1):
        if a[k][k] == 0:
            for r in range(k + 1, n):
                if a[r][k] != 0:
                    a[k], a[r] = a[r], a[k]
                    sign = -sign
                    break
            else:
                return 0
        for i in range(k + 1, n):
            for j in range(k + 1, n):
                a[i][j] = (a[i][j] * a[k][k] - a[i][k] * a[k][j]) // prev
        prev = a[k][k]
    return sign * a[n - 1][n - 1]


def linear_fit(ds, feature_cols: list[str], target_col: str, max_features: int = 8):
    """Exact OLS over integer columns: returns a pyarrow Table with one
    row per coefficient (``const`` first, then ``feature_cols`` in order)
    and columns ``coef``, ``num``, ``den`` (decimal strings of the
    unreduced Cramer determinants). Raises on a singular normal matrix
    (collinear features) and on non-integer inputs."""
    if len(feature_cols) > max_features:
        raise ValueError(
            f"linear_fit caps at {max_features} features (Cramer solve is "
            f"O(p!) via p+1 Bareiss determinants); got {len(feature_cols)}"
        )
    cols = list(feature_cols) + [target_col]
    p1 = len(feature_cols) + 1  # design width incl. intercept

    def partial(batch: pa.Table) -> pa.Table:
        arrs = []
        for c in cols:
            a = batch[c].to_numpy(zero_copy_only=False)
            if len(a) and not np.issubdtype(a.dtype, np.integer):
                raise TypeError(f"linear_fit requires integer column {c!r}")
            arrs.append(a.astype(np.int64, copy=False))
        n = len(batch)
        design = [np.ones(n, np.int64)] + arrs[:-1]
        y = arrs[-1]
        sums: list[int] = []
        for i in range(p1):
            for j in range(i, p1):
                sums.append(int(np.sum(design[i] * design[j])))
        for i in range(p1):
            sums.append(int(np.sum(design[i] * y)))
        names = [f"s_{i}_{j}" for i in range(p1) for j in range(i, p1)] + [
            f"t_{i}" for i in range(p1)
        ]
        return pa.Table.from_arrays(
            [pa.array([s], pa.int64()) for s in sums], names=names
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    # Merge partials as unbounded Python ints (int64 only bounds one block).
    totals = {c: sum(int(v) for v in parts[c]) for c in parts.columns}

    a = [[0] * p1 for _ in range(p1)]
    for i in range(p1):
        for j in range(i, p1):
            a[i][j] = a[j][i] = totals[f"s_{i}_{j}"]
    b = [totals[f"t_{i}"] for i in range(p1)]

    den = _bareiss_det(a)
    if den == 0:
        raise ValueError("singular normal matrix: collinear features")
    nums = []
    for i in range(p1):
        ai = [row[:] for row in a]
        for r in range(p1):
            ai[r][i] = b[r]
        nums.append(_bareiss_det(ai))

    names = ["const"] + list(feature_cols)
    return pa.Table.from_arrays(
        [
            pa.array(names, pa.string()),
            pa.array([str(v) for v in nums], pa.string()),
            pa.array([str(den)] * p1, pa.string()),
        ],
        names=["coef", "num", "den"],
    )


def linear_fit_frame(ds, feature_cols: list[str], target_col: str) -> pd.DataFrame:
    """:func:`linear_fit` as a pandas DataFrame sorted by coefficient
    name — the query-registry shape."""
    return (
        linear_fit(ds, feature_cols, target_col)
        .to_pandas()
        .sort_values("coef")
        .reset_index(drop=True)
    )
