"""Unit tests for ops/quantiles.py (exact order statistics) and
ops/sketch.py (HyperLogLog) — brute-force parity, merge laws, accuracy."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest


def _expected_quantiles(vals, qs):
    s = np.sort(np.asarray(vals, dtype=np.float64))
    return [(q, float(s[max(1, math.ceil(q * len(s))) - 1])) for q in qs]


QS = [0.01, 0.1, 0.5, 0.9, 0.99, 1.0]


class TestExactQuantiles:
    @pytest.mark.parametrize(
        "name,maker",
        [
            ("uniform_int", lambda r: r.integers(0, 10_000, 20_000)),
            ("skewed_int", lambda r: (r.pareto(1.2, 20_000) * 100).astype(np.int64)),
            ("normal_float", lambda r: r.normal(1000.0, 50.0, 20_000)),
            ("negatives", lambda r: r.normal(-5.0, 100.0, 5_000)),
            ("all_equal", lambda r: np.full(777, 42.0)),
            ("tiny", lambda r: np.array([3.0, 1.0, 2.0])),
            (
                "dense_float_cluster",
                lambda r: np.r_[np.full(5_000, 1.0), 1.0 + np.arange(50) * 1e-15],
            ),
        ],
    )
    def test_matches_sort(self, ray_session, name, maker):
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import exact_quantiles

        vals = maker(np.random.default_rng(7))
        typ = pa.float64() if vals.dtype == np.float64 else pa.int64()
        ds = rd.from_arrow(pa.table({"x": pa.array(vals, typ)})).repartition(5)
        got = exact_quantiles(ds, "x", QS)
        assert got == _expected_quantiles(vals, QS)

    def test_empty_raises(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import exact_quantiles

        ds = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
        with pytest.raises(ValueError):
            exact_quantiles(ds, "x", [0.5])

    def test_stream_and_shuffle_combine_agree(self, ray_session):
        """Both combine strategies are the same algorithm with different
        partial-merge transports — answers must be identical."""
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import exact_quantiles

        vals = np.random.default_rng(11).normal(50, 10, 8_000)
        ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(7)
        a = exact_quantiles(ds, "x", QS, combine="stream")
        b = exact_quantiles(ds, "x", QS, combine="shuffle")
        assert a == b == _expected_quantiles(vals, QS)
        with pytest.raises(ValueError):
            exact_quantiles(ds, "x", QS, combine="bogus")

    def test_block_layout_invariance(self, ray_session):
        """Same values, different partitioning → identical answers (the
        partial/combine must be layout-free)."""
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import exact_quantiles

        vals = np.random.default_rng(1).normal(0, 1, 9_999)
        tbl = pa.table({"x": pa.array(vals, pa.float64())})
        answers = [
            exact_quantiles(rd.from_arrow(tbl).repartition(k), "x", QS)
            for k in (1, 3, 16)
        ]
        assert answers[0] == answers[1] == answers[2]


class TestHLL:
    def test_registers_match_bruteforce(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.sketch import hll_rho, hll_sketch
        from pdf_extractor_ray.ops.text import splitmix64_np

        keys = np.random.default_rng(3).integers(0, 10**6, 50_000, dtype=np.int64)
        ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})).repartition(6)
        got = {r["register"]: r["max(rho)"] for r in hll_sketch(ds, "k", 12).take_all()}
        reg, rho = hll_rho(splitmix64_np(keys.astype(np.uint64)), 12)
        dense = np.zeros(4096, dtype=np.int32)
        np.maximum.at(dense, reg, rho)
        assert got == {int(i): int(dense[i]) for i in np.flatnonzero(dense)}

    def test_merge_associative(self, ray_session):
        """Sketch of the union == element-wise max of the two sketches —
        the property that makes HLL shuffle-free at any scale."""
        import ray.data as rd

        from pdf_extractor_ray.ops.sketch import hll_sketch

        keys = np.random.default_rng(5).integers(0, 10**7, 40_000, dtype=np.int64)

        def sk(arr):
            ds = rd.from_arrow(pa.table({"k": pa.array(arr, pa.int64())}))
            return {r["register"]: r["max(rho)"] for r in hll_sketch(ds, "k", 12).take_all()}

        whole = sk(keys)
        merged: dict[int, int] = {}
        for part in (sk(keys[:15_000]), sk(keys[15_000:])):
            for r, v in part.items():
                merged[r] = max(merged.get(r, 0), v)
        assert merged == whole

    @pytest.mark.parametrize("n_distinct", [100, 5_000, 200_000])
    def test_estimate_accuracy(self, ray_session, n_distinct):
        """Relative error within 5·(1.04/√m) at p=12 across three orders
        of magnitude, including the linear-counting small range."""
        import ray.data as rd

        from pdf_extractor_ray.ops.sketch import hll_estimate, hll_sketch

        keys = np.arange(n_distinct, dtype=np.int64)
        keys = np.r_[keys, keys[: n_distinct // 2]]  # duplicates change nothing
        ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})).repartition(4)
        dense = np.zeros(4096)
        for r in hll_sketch(ds, "k", 12).take_all():
            dense[r["register"]] = r["max(rho)"]
        est = hll_estimate(dense, 12)
        assert abs(est - n_distinct) / n_distinct < 5 * 1.04 / math.sqrt(4096)

    def test_rho_bounds_and_p_guard(self):
        from pdf_extractor_ray.ops.sketch import hll_rho

        reg, rho = hll_rho(np.array([0, 2**63, 2**52 - 1, 1], dtype=np.uint64), 12)
        assert list(reg) == [0, 2048, 0, 0]
        # 2^52-1: all 52 rest bits set -> rho 1 (float log2 would say 0);
        # hv=1: 51 leading zeros -> rho 52.
        assert list(rho) == [53, 53, 1, 52]
        with pytest.raises(ValueError):
            hll_rho(np.array([1], dtype=np.uint64), 3)


class TestWordTopk:
    def test_exact_vs_bruteforce(self, ray_session):
        import collections

        import ray.data as rd

        from pdf_extractor_ray.ops.text import word_topk

        docs = [
            ("en", "the cat the dog The THE tie tie"),
            ("en", "dog dog bird"),
            ("de", "der die das der"),
            ("de", ""),
            ("de", "   "),
        ]
        tbl = pa.table(
            {"lang": [d[0] for d in docs], "text": [d[1] for d in docs]}
        )
        got = word_topk(rd.from_arrow(tbl).repartition(3), k=2)
        counts: dict[str, collections.Counter] = {}
        for lang, text in docs:
            counts.setdefault(lang, collections.Counter()).update(
                text.lower().split()
            )
        rows = []
        for lang in sorted(counts):
            best = sorted(counts[lang].items(), key=lambda kv: (-kv[1], kv[0]))[:2]
            rows += [(lang, w, c, r) for r, (w, c) in enumerate(best, 1)]
        exp = [tuple(r) for r in rows]
        assert list(map(tuple, got.itertuples(index=False))) == exp

    def test_tie_break_is_word_ascending(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.text import word_topk

        tbl = pa.table({"lang": ["en"], "text": ["b a c b a c"]})
        got = word_topk(rd.from_arrow(tbl), k=2)
        assert list(got["word"]) == ["a", "b"]


class TestSubstringDup:
    def test_counts_match_bruteforce(self, ray_session):
        import collections

        import ray.data as rd

        from pdf_extractor_ray.ops.substr import duplicate_window_counts

        w = 10
        bp = "SHARED-BOILERPLATE-SUFFIX-1234"
        docs = {
            1: "abcdefghijklmnopqrstuvwxyz" + bp,
            2: "zyxwvutsrqponmlkjihgfedcba" + bp,
            3: "aaaaaaaaaaaaaaaaaaaa",          # within-doc repeats
            4: "short",                          # < window: no row
            5: "completely unique text block with no repeats at all",
        }
        tbl = pa.table(
            {"doc_id": list(docs), "text": list(docs.values())}
        )
        out = {
            r["doc_id"]: (r["total_windows"], r["dup_windows"])
            for r in duplicate_window_counts(
                rd.from_arrow(tbl).repartition(3), window=w
            ).take_all()
        }
        # brute force over true substrings
        cnt = collections.Counter(
            t[i : i + w] for t in docs.values() for i in range(len(t) - w + 1)
        )
        exp = {}
        for d, t in docs.items():
            wins = [t[i : i + w] for i in range(len(t) - w + 1)]
            if wins:
                exp[d] = (len(wins), sum(1 for s in wins if cnt[s] >= 2))
        assert out == exp
        assert 4 not in out

    def test_dup_cap_semijoin_fallback_matches(self, ray_session):
        """Round 4: past ``dup_cap`` the duplicated-hash broadcast switches
        to the hash-partitioned semi-join — identical per-doc counts,
        nothing dup-set-sized on the driver."""
        import ray.data as rd

        from pdf_extractor_ray.ops.substr import duplicate_window_counts

        bp = "SHARED-BOILERPLATE-SUFFIX-1234"
        tbl = pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "abcdefghijklmnopqrstuvwxyz" + bp,
                    "zyxwvutsrqponmlkjihgfedcba" + bp,
                    "aaaaaaaaaaaaaaaaaaaa",
                    "completely unique text block with no repeats at all",
                ],
            }
        )
        ds = rd.from_arrow(tbl).repartition(3)

        def canon(out):
            df = out.to_pandas()
            return (
                df[["doc_id", "total_windows", "dup_windows"]]
                .astype({"total_windows": "int64", "dup_windows": "int64"})
                .sort_values("doc_id")
                .reset_index(drop=True)
            )

        base = canon(duplicate_window_counts(ds, window=10))
        over = canon(duplicate_window_counts(ds, window=10, dup_cap=1))
        assert base.equals(over)
        assert int(base["dup_windows"].sum()) > 0


class TestNullHandling:
    """Null-safety regressions (code-review round 3): nulls are excluded
    like SQL aggregates, never crashes or phantom keys."""

    def test_quantiles_skip_nulls(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import exact_quantiles

        tbl = pa.table({"x": pa.array([1.0, None, 2.0, 3.0, None, 4.0], pa.float64())})
        got = exact_quantiles(rd.from_arrow(tbl).repartition(2), "x", [0.5, 1.0])
        assert got == [(0.5, 2.0), (1.0, 4.0)]
        with pytest.raises(ValueError):
            exact_quantiles(
                rd.from_arrow(pa.table({"x": pa.array([None, None], pa.float64())})),
                "x", [0.5],
            )

    def test_quantiles_int64_beyond_2_53(self, ray_session):
        """Integer columns stay exact above float64 precision."""
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import exact_quantiles

        vals = [2**60, 2**60 + 1, 2**60 + 2, 2**60 + 3] * 10
        tbl = pa.table({"x": pa.array(vals, pa.int64())})
        got = exact_quantiles(rd.from_arrow(tbl).repartition(3), "x", [0.25, 0.75])
        assert got == [(0.25, 2**60), (0.75, 2**60 + 2)]

    def test_quantiles_full_range_int64(self, ray_session):
        """hi-lo beyond int64 (hash-key columns) must not wrap."""
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import exact_quantiles

        vals = np.random.default_rng(4).integers(
            -(2**63), 2**63 - 1, 5_000, dtype=np.int64
        )
        tbl = pa.table({"x": pa.array(vals, pa.int64())})
        got = exact_quantiles(rd.from_arrow(tbl).repartition(4), "x", [0.1, 0.9])
        s = np.sort(vals)
        assert got == [
            (0.1, int(s[math.ceil(0.1 * len(s)) - 1])),
            (0.9, int(s[math.ceil(0.9 * len(s)) - 1])),
        ]

    def test_hll_ignores_nulls(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.sketch import hll_sketch

        with_nulls = pa.table({"k": pa.array([1, 2, None, None], pa.int64())})
        without = pa.table({"k": pa.array([1, 2], pa.int64())})
        a = {r["register"]: r["max(rho)"]
             for r in hll_sketch(rd.from_arrow(with_nulls), "k", 12).take_all()}
        b = {r["register"]: r["max(rho)"]
             for r in hll_sketch(rd.from_arrow(without), "k", 12).take_all()}
        assert a == b and len(a) == 2

    def test_word_topk_null_text_and_group(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.text import word_topk

        tbl = pa.table(
            {
                "lang": pa.array(["en", "en", None], pa.string()),
                "text": pa.array(["a b a", None, "zz zz"], pa.string()),
            }
        )
        got = word_topk(rd.from_arrow(tbl).repartition(2), k=1)
        # null text counts nothing; null group rows are excluded entirely
        assert list(map(tuple, got.itertuples(index=False))) == [("en", "a", 2, 1)]


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.one_of(
            st.integers(-(2**40), 2**40),
            st.none(),
        ),
        min_size=1,
        max_size=300,
    ),
    st.lists(st.floats(0.001, 1.0), min_size=1, max_size=4),
)
@settings(max_examples=25, deadline=None)
def test_quantiles_property_int_with_nulls(ray_session, vals, qs):
    """Any int column with nulls: engine == rank over sorted non-nulls."""
    import ray.data as rd

    from pdf_extractor_ray.ops.quantiles import exact_quantiles

    nn = [v for v in vals if v is not None]
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})).repartition(3)
    if not nn:
        with pytest.raises(ValueError):
            exact_quantiles(ds, "x", qs)
        return
    got = exact_quantiles(ds, "x", qs)
    s = sorted(nn)
    exp = [(q, s[max(1, math.ceil(q * len(s))) - 1]) for q in qs]
    assert got == exp


class TestTfidfTopTerms:
    def test_matches_bruteforce(self, ray_session):
        import collections

        import ray.data as rd

        from pdf_extractor_ray.ops.text import tfidf_top_terms

        docs = {
            1: "apple banana apple rare",
            2: "banana banana cherry",
            3: "apple cherry cherry cherry",
            4: "",
        }
        tbl = pa.table({"doc_id": list(docs), "text": list(docs.values())})
        got = [
            (r["doc_id"], r["term"], r["score"], r["rank"])
            for r in sorted(
                tfidf_top_terms(rd.from_arrow(tbl).repartition(2), k=2).take_all(),
                key=lambda r: (r["doc_id"], r["rank"]),
            )
        ]
        n = len(docs)
        df: collections.Counter = collections.Counter()
        for t in docs.values():
            df.update(set(t.split()))
        exp = []
        for d, t in docs.items():
            tf = collections.Counter(t.split())
            best = sorted(
                ((-(c * n // df[w]), w) for w, c in tf.items())
            )[:2]
            exp += [(d, w, -negs, r) for r, (negs, w) in enumerate(best, 1)]
        assert got == exp  # doc 4 contributes no rows

    @pytest.mark.parametrize("nparts", [1, 3])
    def test_over_cap_semijoin_matches_broadcast(self, ray_session, nparts):
        """df_cap=0 forces the sorted-lookup semi-join regime; output
        (values, ties, schema) must equal the broadcast path exactly."""
        import ray.data as rd

        from pdf_extractor_ray.ops.text import tfidf_top_terms

        docs = {
            1: "apple banana apple rare",
            2: "banana banana cherry",
            3: "apple cherry cherry cherry",
            4: "",
            5: "zeta zeta apple apple banana rare rare rare",
        }
        tbl = pa.table({"doc_id": list(docs), "text": list(docs.values())})
        ds = rd.from_arrow(tbl).repartition(nparts)

        def norm(rows):
            return sorted(
                (r["doc_id"], r["term"], r["score"], r["rank"]) for r in rows
            )

        broadcast = tfidf_top_terms(ds, k=2).take_all()
        semijoin = tfidf_top_terms(ds, k=2, df_cap=0).take_all()
        assert norm(semijoin) == norm(broadcast)
        assert {type(r["rank"]) for r in semijoin} == {
            type(r["rank"]) for r in broadcast
        }


class TestGroupQuantiles:
    """Per-group exact quantiles: rank = ceil(q*n) (1-based) within each
    group, vs numpy sorting — including ties, nulls, and block layouts."""

    def _want(self, groups, values, qs):
        import collections

        by_g = collections.defaultdict(list)
        for g, v in zip(groups, values):
            if g is not None and v is not None:
                by_g[g].append(v)
        out = []
        for g in sorted(by_g):
            vs = sorted(by_g[g])
            for q in qs:
                rank = max(1, min(len(vs), math.ceil(q * len(vs))))
                out.append((g, q, vs[rank - 1]))
        return out

    def _got(self, groups, values, qs, parts):
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import group_quantiles

        ds = rd.from_arrow(pa.table({"g": groups, "v": values})).repartition(parts)
        df = (
            group_quantiles(ds, "g", "v", qs)
            .to_pandas()
            .sort_values(["g", "q"])
            .reset_index(drop=True)
        )
        return list(map(tuple, df.itertuples(index=False)))

    def test_matches_numpy_with_ties_and_nulls(self, ray_session):
        rng = np.random.default_rng(7)
        groups = [f"g{i % 5}" for i in range(400)] + [None] * 3
        values = [int(x) for x in rng.integers(0, 40, 400)] + [1, 2, 3]
        values[10] = None  # null value inside a group
        qs = [0.1, 0.5, 0.9, 1.0]
        assert self._got(groups, values, qs, 7) == self._want(groups, values, qs)

    def test_single_row_groups(self, ray_session):
        groups = ["a", "b", "c"]
        values = [5, 7, 9]
        qs = [0.01, 0.5, 0.99]
        assert self._got(groups, values, qs, 3) == self._want(groups, values, qs)

    def test_layout_independent(self, ray_session):
        groups = [f"g{i % 3}" for i in range(90)]
        values = [(i * 37) % 50 for i in range(90)]
        qs = [0.25, 0.75]
        assert self._got(groups, values, qs, 2) == self._got(groups, values, qs, 11)

    def test_schema_stays_typed_with_empty_blocks(self, ray_session):
        """Kernel calls with zero complete segments must not emit a
        null-typed group column (block-schema desync)."""
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import group_quantiles

        # One giant group over many blocks -> most kernel calls see no
        # complete segment.
        tbl = pa.table({"g": ["only"] * 200, "v": list(range(200))})
        out = group_quantiles(rd.from_arrow(tbl).repartition(16), "g", "v", [0.5])
        schema = out.schema()
        assert str(schema.base_schema.field("g").type) == "string"
        assert out.to_pandas().iloc[0]["value"] == 99  # ceil(0.5*200)=100 -> v[99]


class TestGroupedHll:
    def test_registers_match_single_group_runs(self, ray_session):
        """Grouped sketch == independent per-group hll_sketch runs, at any
        block layout."""
        import numpy as np
        import ray.data as rd

        from pdf_extractor_ray.ops.sketch import hll_sketch, hll_sketch_grouped

        rng = np.random.default_rng(5)
        groups = [f"g{i % 3}" for i in range(600)]
        keys = [int(x) for x in rng.integers(0, 10_000, 600)]
        tbl = pa.table({"g": groups, "k": keys})
        got = {}
        for r in hll_sketch_grouped(
            rd.from_arrow(tbl).repartition(7), "g", "k", p=8
        ).take_all():
            got[(r["g"], r["register"])] = r["max(rho)"]
        for gv in ("g0", "g1", "g2"):
            sub = tbl.filter(pa.compute.equal(tbl["g"], gv))
            want = {
                r["register"]: r["max(rho)"]
                for r in hll_sketch(rd.from_arrow(sub), "k", p=8).take_all()
            }
            assert {reg: v for (g, reg), v in got.items() if g == gv} == want

    def test_estimate_accuracy_per_group(self, ray_session):
        import numpy as np
        import ray.data as rd

        from pdf_extractor_ray.ops.sketch import hll_estimate, hll_sketch_grouped

        n = {"a": 500, "b": 2000}
        rows_g, rows_k = [], []
        for gv, cnt in n.items():
            rows_g += [gv] * cnt
            rows_k += [hash((gv, i)) & ((1 << 62) - 1) for i in range(cnt)]
        ds = rd.from_arrow(pa.table({"g": rows_g, "k": rows_k})).repartition(5)
        dense = {gv: np.zeros(1 << 12) for gv in n}
        for r in hll_sketch_grouped(ds, "g", "k", p=12).take_all():
            dense[r["g"]][r["register"]] = r["max(rho)"]
        for gv, cnt in n.items():
            est = hll_estimate(dense[gv], p=12)
            assert abs(est - cnt) / cnt < 0.1


class TestCountMin:
    """ops/sketch.py Count-Min: estimates upper-bound exact counts, absent
    tokens collide-or-zero, block layout does not change any counter."""

    def _corpus(self):
        texts = [
            "hash join spark window hash hash",
            "join join window tiny hash",
            "spark spark spark window window window",
            "",
            "unrelated filler words here hash",
        ] * 7
        return pa.table({"text": texts})

    def test_upper_bound_and_exact_arm(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.sketch import count_min_estimates

        ds = rd.from_arrow(self._corpus()).repartition(4)
        out = count_min_estimates(ds, ["hash", "join", "spark", "zzzunseen"])
        rows = {r["token"]: r for r in out.to_pylist()}
        assert rows["hash"]["exact_count"] == 5 * 7
        assert rows["join"]["exact_count"] == 3 * 7
        assert rows["spark"]["exact_count"] == 4 * 7
        assert rows["zzzunseen"]["exact_count"] == 0
        for r in rows.values():
            # one-sided error: Count-Min never under-estimates
            assert r["cm_estimate"] >= r["exact_count"]
            assert r["overestimate"] == r["cm_estimate"] - r["exact_count"]

    def test_block_layout_invariant(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.sketch import count_min_sketch

        tbl = self._corpus()
        a = count_min_sketch(rd.from_arrow(tbl).repartition(1))
        b = count_min_sketch(rd.from_arrow(tbl).repartition(9))
        assert (a == b).all()
        # total mass per row == total token count
        total = sum(len(t.split()) for t in tbl["text"].to_pylist())
        assert (a.sum(axis=1) == total).all()


class TestGroupWinsorize:
    """ops/quantiles.py group_winsorize: brute-force parity incl ties,
    tiny groups, layout independence."""

    def _brute(self, rows, q_lo=0.05, q_hi=0.95):
        from collections import defaultdict

        groups = defaultdict(list)
        for g, v in rows:
            groups[g].append(v)
        out = {}
        for g, vs in groups.items():
            vs = sorted(vs)
            n = len(vs)
            rlo = min(max(int(np.ceil(q_lo * n)), 1), n)
            rhi = min(max(int(np.ceil(q_hi * n)), 1), n)
            lo, hi = vs[rlo - 1], vs[rhi - 1]
            clipped = [min(max(v, lo), hi) for v in vs]
            out[g] = (
                n, lo, hi, sum(vs), sum(clipped),
                (rlo - 1) + (n - rhi),
            )
        return out

    def test_brute_force(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import group_winsorize

        rng = np.random.Generator(np.random.Philox(5))
        rows = [
            (f"g{int(rng.integers(0, 4))}", int(rng.integers(0, 50)))
            for _ in range(400)
        ] + [("tiny", 7)]  # single-element group
        for parts in (1, 6):
            ds = rd.from_items(
                [{"lang": g, "n_chars": v} for g, v in rows]
            ).repartition(parts)
            got = {
                r["lang"]: (
                    r["n"], r["lo"], r["hi"], r["sum_raw"],
                    r["sum_clipped"], r["n_clipped"],
                )
                for r in group_winsorize(ds, "lang", "n_chars").take_all()
            }
            assert got == self._brute(rows)


class TestGiniConcentration:
    """Exact Gini (ops/quantiles.py::gini_concentration)."""

    @staticmethod
    def _brute(weights):
        x = sorted(weights)
        n, s = len(x), sum(x)
        if n == 0 or s == 0:
            return 0.0
        swx = sum((i + 1) * v for i, v in enumerate(x))
        return float(2 * swx - (n + 1) * s) / float(n * s)

    @staticmethod
    def _run(rows, parts=4):
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import gini_concentration

        ds = rd.from_items([{"k": k, "w": w} for k, w in rows]).repartition(parts)
        t = gini_concentration(ds, "k", "w")
        return t.to_pydict()

    def test_matches_brute(self, ray_session):
        rng = np.random.Generator(np.random.Philox(5))
        rows = [(int(rng.integers(0, 13)), int(rng.integers(1, 500))) for _ in range(300)]
        import collections

        tot = collections.Counter()
        for k, w in rows:
            tot[k] += w
        got = self._run(rows)
        assert got["n_keys"] == [len(tot)]
        assert got["total"] == [sum(tot.values())]
        assert got["gini"] == [self._brute(list(tot.values()))]

    def test_uniform_is_zero(self, ray_session):
        got = self._run([(k, 10) for k in range(8)], parts=3)
        assert got["gini"] == [0.0]

    def test_layout_independent(self, ray_session):
        rows = [(k, (k * 7) % 11 + 1) for k in range(40)]
        assert self._run(rows, parts=1) == self._run(rows, parts=7)

    def test_bigint_fallback_exact(self, ray_session):
        # weights near 2^59 force the object-dtype exact path for the
        # quadratic term while Σx still fits the int64 total column
        rows = [(k, (1 << 59) + k) for k in range(6)]
        got = self._run(rows, parts=2)
        import collections

        tot = collections.Counter()
        for k, w in rows:
            tot[k] += w
        assert got["gini"] == [self._brute(list(tot.values()))]


class TestGlobalNtile:
    """Exact corpus-wide tier assignment: brute-force rank replay with
    heavy ties, layout invariance, degenerate tile counts."""

    @staticmethod
    def _brute(ids, scores, n_tiles):
        order = sorted(range(len(ids)), key=lambda i: (scores[i], ids[i]))
        n = len(ids)
        out = {}
        for rank0, i in enumerate(order):
            out[ids[i]] = {
                "doc_id": ids[i],
                "score": scores[i],
                "rank": rank0 + 1,
                "tier": rank0 * n_tiles // n,
            }
        return [out[i] for i in sorted(ids)]

    @pytest.mark.parametrize("nparts", [1, 4, 11])
    @pytest.mark.parametrize("n_tiles", [1, 4, 7])
    def test_matches_brute_force(self, ray_session, nparts, n_tiles):
        import ray

        from pdf_extractor_ray.ops.quantiles import global_ntile

        rng = np.random.Generator(np.random.Philox(23))
        ids = list(range(83))
        scores = [int(x) for x in rng.integers(0, 9, size=83)]  # heavy ties
        tbl = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        got = (
            global_ntile(ds, n_tiles, score_col="score")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
            .to_dict("records")
        )
        assert got == self._brute(ids, scores, n_tiles)

    def test_invalid_tiles_raises(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.quantiles import global_ntile

        tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                        "score": pa.array([0], pa.int64())})
        with pytest.raises(ValueError):
            global_ntile(ray.data.from_arrow(tbl), 0, score_col="score")


class TestHyperBall:
    """ops/sketch.py hyperball: brute-force ball-merge parity on random
    graphs; saturation at large radius equals reachability sets; id
    bounds guard."""

    def _brute(self, pairs, radius, p):
        from pdf_extractor_ray.ops.sketch import hll_rho
        from pdf_extractor_ray.ops.text import splitmix64_np

        e = sorted({(u, v) for u, v in pairs if u != v})
        nodes = sorted({u for u, _ in e} | {v for _, v in e})
        reach = {v: {v} for v in nodes}
        for _ in range(radius):
            nxt = {v: set(r) for v, r in reach.items()}
            for u, v in e:
                nxt[u] |= reach[v]
            reach = nxt
        out = {}
        for v in nodes:
            ids = np.array(sorted(reach[v]), dtype=np.uint64)
            reg, rho = hll_rho(splitmix64_np(ids), p)
            regs = {}
            for r_, q in zip(reg, rho):
                regs[int(r_)] = max(regs.get(int(r_), 0), int(q))
            for r_, q in sorted(regs.items()):
                out[(v, r_)] = q
        return out

    def test_random_parity(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.sketch import hyperball

        rng = np.random.Generator(np.random.Philox(9))
        pairs = [
            (int(rng.integers(0, 20)), int(rng.integers(0, 20)))
            for _ in range(60)
        ]
        ds = rd.from_items(
            [{"src": u, "dst": v} for u, v in pairs]).repartition(4)
        for radius in (1, 3):
            got = {
                (r["node"], r["reg"]): r["val"]
                for r in hyperball(ds, radius=radius, p=4).take_all()
            }
            assert got == self._brute(pairs, radius, 4)

    def test_id_guard(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from pdf_extractor_ray.ops.sketch import hyperball

        ds = rd.from_items([{"src": 1 << 33, "dst": 2}])
        with _pytest.raises(Exception, match="dense-rank|2\\^32"):
            hyperball(ds, radius=1).take_all()


class TestOutlierCensus:
    def test_fences_exact(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.quantiles import outlier_census

        # group 'a': values 1..8 plus outliers -100 and 100
        vals = list(range(1, 9)) + [-100, 100]
        tab = pa.Table.from_arrays(
            [
                pa.array(["a"] * len(vals), pa.string()),
                pa.array(vals, pa.int64()),
            ],
            names=["g", "v"],
        )
        df = (
            outlier_census(ray.data.from_arrow(tab).repartition(3), "g", "v")
            .to_pandas()
        )
        # n=10; ranks ceil(2.5)=3 -> sorted[-100,1..8,100][2]=2 =q1;
        # ceil(7.5)=8 -> value 7 =q3; IQR=5; fences [2-7.5, 7+7.5]
        assert df.iloc[0].tolist() == ["a", 10, 1, 1]

    def test_brute_force_random(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.quantiles import outlier_census

        rng = np.random.RandomState(8)
        groups = rng.choice(["x", "y"], 400)
        vals = rng.randint(-1000, 1000, 400)
        tab = pa.Table.from_arrays(
            [pa.array(groups, pa.string()), pa.array(vals, pa.int64())],
            names=["g", "v"],
        )
        df = (
            outlier_census(ray.data.from_arrow(tab).repartition(5), "g", "v")
            .to_pandas()
            .sort_values("group")
            .reset_index(drop=True)
        )
        import math

        for r in df.itertuples():
            sub = np.sort(vals[groups == r.group])
            n = len(sub)
            q1 = int(sub[math.ceil(0.25 * n) - 1])
            q3 = int(sub[math.ceil(0.75 * n) - 1])
            lo, hi = 2 * q1 - 3 * (q3 - q1), 2 * q3 + 3 * (q3 - q1)
            assert (int(r.n), int(r.n_low), int(r.n_high)) == (
                n,
                int((2 * sub < lo).sum()),
                int((2 * sub > hi).sum()),
            )


class TestGroupMad:
    def test_exact_values(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.quantiles import group_mad

        vals = [1, 2, 3, 4, 100]  # median=3 (ceil(2.5)=3rd), devs [2,1,0,1,97]
        tab = pa.Table.from_arrays(
            [
                pa.array(["a"] * 5, pa.string()),
                pa.array(vals, pa.int64()),
            ],
            names=["g", "v"],
        )
        df = group_mad(ray.data.from_arrow(tab).repartition(2), "g", "v").to_pandas()
        # devs sorted [0,1,1,2,97]; rank ceil(2.5)=3 -> 1
        assert df.iloc[0].tolist() == ["a", 3, 1]

    def test_brute_random(self, ray_session):
        import math

        import ray

        from pdf_extractor_ray.ops.quantiles import group_mad

        rng = np.random.RandomState(4)
        groups = rng.choice(["x", "y", "z"], 300)
        vals = rng.randint(-500, 500, 300)
        tab = pa.Table.from_arrays(
            [pa.array(groups, pa.string()), pa.array(vals, pa.int64())],
            names=["g", "v"],
        )
        df = (
            group_mad(ray.data.from_arrow(tab).repartition(4), "g", "v")
            .to_pandas()
            .sort_values("group")
        )
        for r in df.itertuples():
            sub = np.sort(vals[groups == r.group])
            n = len(sub)
            m = int(sub[math.ceil(0.5 * n) - 1])
            dev = np.sort(np.abs(vals[groups == r.group] - m))
            assert (int(r.median), int(r.mad)) == (
                m, int(dev[math.ceil(0.5 * n) - 1])
            )


class TestMisraGriesHeavyHitters:
    def test_matches_exact_counts(self, ray_session):
        import ray
        from collections import Counter

        from pdf_extractor_ray.ops.sketch import misra_gries_heavy_hitters

        rng = np.random.RandomState(6)
        # zipf-ish corpus: token t{i} appears ~ 1/(i+1)
        toks = [f"t{i}" for i in range(50) for _ in range(200 // (i + 1))]
        rng.shuffle(toks)
        docs = [" ".join(toks[i::20]) for i in range(20)]
        tab = pa.Table.from_arrays([pa.array(docs, pa.string())], names=["text"])
        k = 10
        got = misra_gries_heavy_hitters(
            ray.data.from_arrow(tab).repartition(7), k=k
        )
        cnt = Counter(toks)
        n = sum(cnt.values())
        exp = sorted(
            ((t, c) for t, c in cnt.items() if c * k > n),
            key=lambda x: (-x[1], x[0]),
        )
        assert [(r.token, r.cnt) for r in got.itertuples()] == exp
        assert (got["n_total"] == n).all()

    def test_empty_corpus(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.sketch import misra_gries_heavy_hitters

        tab = pa.Table.from_arrays(
            [pa.array(["", None], pa.string())], names=["text"]
        )
        got = misra_gries_heavy_hitters(ray.data.from_arrow(tab), k=5)
        assert len(got) == 0
