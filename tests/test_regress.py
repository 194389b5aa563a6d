"""Exact distributed OLS: planted exact fits, numpy cross-check, layout
invariance, singular/typed-input failure modes."""

from fractions import Fraction

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.ops.regress import _bareiss_det, linear_fit


def _ds(tbl, parts=4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(parts)


def _coefs(out):
    df = out.to_pandas().set_index("coef")
    return {
        k: Fraction(int(r["num"]), int(r["den"])) for k, r in df.iterrows()
    }


class TestBareiss:
    def test_known_dets(self):
        assert _bareiss_det([[5]]) == 5
        assert _bareiss_det([[1, 2], [3, 4]]) == -2
        assert _bareiss_det([[2, 0, 1], [1, 3, 2], [0, 1, 4]]) == 2 * 10 - 0 + 1 * 1
        assert _bareiss_det([[1, 2], [2, 4]]) == 0

    def test_vs_numpy_random(self):
        rng = np.random.default_rng(11)
        for _ in range(50):
            n = int(rng.integers(1, 6))
            m = rng.integers(-9, 10, (n, n))
            exact = _bareiss_det(m.tolist())
            approx = np.linalg.det(m.astype(float))
            assert exact == round(approx), m

    def test_pivot_swap(self):
        # zero leading pivot forces the row swap path
        assert _bareiss_det([[0, 1], [1, 0]]) == -1
        assert _bareiss_det([[0, 0], [0, 1]]) == 0


class TestLinearFit:
    def test_exact_planted(self, ray_session):
        rng = np.random.default_rng(3)
        a = rng.integers(0, 50, 200)
        b = rng.integers(0, 30, 200)
        y = 3 + 2 * a - b  # exact integer relation
        tbl = pa.table({"a": a, "b": b, "y": y})
        coefs = _coefs(linear_fit(_ds(tbl), ["a", "b"], "y"))
        assert coefs == {
            "const": Fraction(3),
            "a": Fraction(2),
            "b": Fraction(-1),
        }

    def test_vs_numpy_lstsq(self, ray_session):
        rng = np.random.default_rng(5)
        a = rng.integers(0, 100, 300)
        b = rng.integers(0, 100, 300)
        y = rng.integers(0, 1000, 300)
        tbl = pa.table({"a": a, "b": b, "y": y})
        coefs = _coefs(linear_fit(_ds(tbl), ["a", "b"], "y"))
        x = np.column_stack([np.ones(300), a, b]).astype(float)
        beta = np.linalg.lstsq(x, y.astype(float), rcond=None)[0]
        for name, ref in zip(("const", "a", "b"), beta):
            assert abs(float(coefs[name]) - ref) < 1e-8

    def test_layout_invariance(self, ray_session):
        rng = np.random.default_rng(9)
        tbl = pa.table(
            {
                "a": rng.integers(0, 40, 157),
                "y": rng.integers(0, 500, 157),
            }
        )
        outs = [
            linear_fit(_ds(tbl, parts=p), ["a"], "y").to_pandas()
            for p in (1, 3, 11)
        ]
        for o in outs[1:]:
            assert o.equals(outs[0])

    def test_singular_raises(self, ray_session):
        a = np.arange(20)
        tbl = pa.table({"a": a, "b": 2 * a, "y": a + 1})
        with pytest.raises(ValueError, match="singular"):
            linear_fit(_ds(tbl), ["a", "b"], "y")

    def test_non_integer_raises(self, ray_session):
        tbl = pa.table({"a": [1.5, 2.0], "y": [1, 2]})
        with pytest.raises(Exception):  # TypeError inside the Ray task
            linear_fit(_ds(tbl, parts=1), ["a"], "y")

    def test_feature_cap(self, ray_session):
        tbl = pa.table({f"f{i}": [1, 2] for i in range(10)} | {"y": [0, 1]})
        with pytest.raises(ValueError, match="caps"):
            linear_fit(_ds(tbl, parts=1), [f"f{i}" for i in range(9)], "y")
