"""BM25 retrieval op: integer-exact scores vs a brute-force reference
computed with Python bigints, plus determinism across block layouts."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_extractor_ray.ops.search import SCALE, bm25_topk

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat sat sat"),
    (2, "cat cat cat dog"),
    (3, ""),
    (4, None),
    (5, "THE Cat DOG"),  # case folding
    (6, "mat the mat unrelated filler words here"),
]


def brute_force(queries: dict[str, str], k: int = 10):
    toks = {d: (t or "").lower().split() for d, t in DOCS}
    n = len(DOCS)
    total = sum(len(v) for v in toks.values())
    a = max(1, total // n)
    out = []
    for qid in sorted(queries):
        terms = list(dict.fromkeys(queries[qid].lower().split()))
        dfv = {
            t: sum(1 for v in toks.values() if t in v) for t in terms
        }
        scores = {}
        for d, v in toks.items():
            s = 0
            hit = False
            for t in terms:
                tf = v.count(t)
                if tf == 0:
                    continue
                hit = True
                num = SCALE * (2 * n - 2 * dfv[t] + 1) * (20 * a) * tf
                den = (2 * dfv[t] + 1) * (8 * a * tf + 3 * a + 9 * len(v))
                s += num // den
            if hit:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend(
            (qid, d, s, r + 1) for r, (d, s) in enumerate(ranked)
        )
    return out


QUERIES = {"a": "cat mat", "b": "dog", "c": "the sat"}


@pytest.mark.parametrize("nparts", [1, 3, 7])
def test_bm25_matches_brute_force(ray_session, nparts):
    tbl = pa.Table.from_pylist([{"doc_id": d, "text": t} for d, t in DOCS])
    ds = ray.data.from_arrow(tbl).repartition(nparts)
    got = bm25_topk(ds, QUERIES, k=10).to_pylist()
    got_tuples = [
        (r["query_id"], r["doc_id"], r["score"], r["rank"]) for r in got
    ]
    assert got_tuples == brute_force(QUERIES)


def test_bm25_scores_are_positive_and_ranked(ray_session):
    tbl = pa.Table.from_pylist([{"doc_id": d, "text": t} for d, t in DOCS])
    ds = ray.data.from_arrow(tbl)
    out = bm25_topk(ds, {"q": "cat"}, k=3).to_pylist()
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(r["rank"] == i + 1 for i, r in enumerate(out))
    # df("cat") = 3 docs: 0, 2, 5 — all and only those retrieved.
    assert sorted(r["doc_id"] for r in out) == [0, 2, 5]


def test_bm25_empty_query_raises(ray_session):
    tbl = pa.Table.from_pylist([{"doc_id": d, "text": t} for d, t in DOCS])
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError):
        bm25_topk(ds, {"q": "   "})


class TestRrfFuse:
    def test_fusion_semantics(self):
        import pandas as pd

        from pdf_extractor_ray.ops.fuse import rrf_fuse

        lex = pd.DataFrame(
            {"query_id": ["q", "q"], "doc_id": [1, 2], "rank": [1, 2]}
        )
        dense = pd.DataFrame(
            {"query_id": ["q", "q"], "doc_id": [2, 3], "rank": [1, 2]}
        )
        out = rrf_fuse({"lex": lex, "dense": dense}, k=10)
        by_doc = dict(zip(out["doc_id"], out["rrf_score"]))
        s1, s2 = 1_000_000 // 61, 1_000_000 // 62
        # doc 2 appears in both arms; docs 1 and 3 in one arm each.
        assert by_doc == {1: s1, 2: s2 + s1, 3: s2}
        assert list(out.sort_values("rank")["doc_id"]) == [2, 1, 3]

    def test_tie_breaks_by_doc_id_and_k_truncates(self):
        import pandas as pd

        from pdf_extractor_ray.ops.fuse import rrf_fuse

        arm = pd.DataFrame(
            {"query_id": ["q"] * 3, "doc_id": [9, 3, 7], "rank": [1, 1, 1]}
        )
        out = rrf_fuse({"a": arm}, k=2)
        assert list(out["doc_id"]) == [3, 7]
        assert list(out["rank"]) == [1, 2]

    def test_empty_arms_raise(self):
        import pytest as _pytest

        from pdf_extractor_ray.ops.fuse import rrf_fuse

        with _pytest.raises(ValueError):
            rrf_fuse({})


class TestPhraseSearch:
    """Positional phrase search: brute force, regime equivalence, layouts."""

    DOCS = [
        (0, "the needle in haystack again needle in haystack"),
        (1, "needle in haystack"),
        (2, "needle in the haystack"),  # gap: no match
        (3, ""),
        (4, None),
        (5, "Needle IN Haystack needle in"),  # case fold
        (6, "in haystack needle"),  # wrong order
        (7, "needle needle in haystack"),  # match at 1
        (8, "a a a a"),  # repeated-token doc
        (9, "x needle in haystack y needle in haystack"),
    ]

    @staticmethod
    def brute(docs, phrase):
        toks = phrase.lower().split()
        out = {}
        for d, t in docs:
            w = [x for x in (t or "").lower().split() if x]
            starts = [
                s
                for s in range(len(w) - len(toks) + 1)
                if w[s : s + len(toks)] == toks
            ]
            if starts:
                out[d] = (len(starts), starts[0])
        return out

    def _ds(self, docs, nparts):
        import ray

        t = pa.Table.from_arrays(
            [
                pa.array([r[0] for r in docs], pa.int64()),
                pa.array([r[1] for r in docs], pa.string()),
            ],
            names=["doc_id", "text"],
        )
        return ray.data.from_arrow(t).repartition(nparts)

    @pytest.mark.parametrize("via", ["local", "positions"])
    @pytest.mark.parametrize("nparts", [1, 3])
    def test_matches_brute_force(self, via, nparts):
        from pdf_extractor_ray.ops.search import phrase_search

        ds = self._ds(self.DOCS, nparts)
        got = phrase_search(ds, "needle in haystack", via=via).to_pandas()
        want = self.brute(self.DOCS, "needle in haystack")
        assert {
            int(r.doc_id): (int(r.n_matches), int(r.first_pos))
            for r in got.itertuples()
        } == want

    @pytest.mark.parametrize("via", ["local", "positions"])
    def test_overlapping_repeated_token_phrase(self, via):
        from pdf_extractor_ray.ops.search import phrase_search

        ds = self._ds(self.DOCS, 2)
        got = phrase_search(ds, "a a", via=via).to_pandas()
        want = self.brute(self.DOCS, "a a")  # doc 8: starts 0,1,2
        assert {
            int(r.doc_id): (int(r.n_matches), int(r.first_pos))
            for r in got.itertuples()
        } == want
        assert want[8] == (3, 0)

    def test_single_token_phrase_and_empty_raises(self):
        from pdf_extractor_ray.ops.search import phrase_search

        ds = self._ds(self.DOCS, 2)
        got = phrase_search(ds, "needle").to_pandas()
        want = self.brute(self.DOCS, "needle")
        assert {
            int(r.doc_id): (int(r.n_matches), int(r.first_pos))
            for r in got.itertuples()
        } == want
        with pytest.raises(ValueError):
            phrase_search(ds, "   ")

    def test_string_ids_flow_through(self):
        import ray

        from pdf_extractor_ray.ops.search import phrase_search

        t = pa.Table.from_arrays(
            [
                pa.array(["u1", "u2"], pa.string()),
                pa.array(["needle in haystack", "nothing here"], pa.string()),
            ],
            names=["doc_id", "text"],
        )
        ds = ray.data.from_arrow(t)
        for via in ("local", "positions"):
            got = phrase_search(ds, "needle in haystack", via=via).to_pandas()
            assert list(got["doc_id"]) == ["u1"]


class TestProximityTopk:
    """ops/search.py proximity_topk: brute-force cross-join min parity
    on random token streams; missing-term exclusion; ordering."""

    def test_random(self, ray_session):
        import itertools

        import ray.data as rd

        from pdf_extractor_ray.ops.search import proximity_topk

        rng = np.random.Generator(np.random.Philox(77))
        vocab = ["qa", "qb", "qc", "x", "y"]
        docs = []
        for i in range(60):
            toks = [vocab[int(j)] for j in rng.integers(0, 5, size=12)]
            docs.append((i, " ".join(toks)))
        want = {}
        for i, t in docs:
            toks = t.split()
            pos = {q: [p for p, w in enumerate(toks) if w == q]
                   for q in ("qa", "qb", "qc")}
            if all(pos.values()):
                want[i] = min(
                    max(c) - min(c) + 1
                    for c in itertools.product(*pos.values())
                )
        ds = rd.from_items(
            [{"doc_id": i, "text": t} for i, t in docs]).repartition(4)
        df = proximity_topk(ds, ["qa", "qb", "qc"], k=1000)
        got = dict(zip(df.doc_id, df.window))
        assert got == want
        wins = list(df.window)
        assert wins == sorted(wins)

    def test_case_and_duplicate_terms(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.search import proximity_topk

        ds = rd.from_items([{"doc_id": 1, "text": "QA z z QB qa"}])
        df = proximity_topk(ds, ["qa", "qb", "QA"], k=5)
        assert list(df.window) == [2]  # dedup terms; lowercase match


class TestRankingOverlap:
    def test_rbo_exact_values(self):
        from pdf_extractor_ray.ops.search import rbo_milli_exact

        a = list("abcdefghij")
        # truncated RBO (no extrapolation) maxes at 1 − p^k = 1 − 0.9^10
        assert rbo_milli_exact(a, a) == 651
        assert rbo_milli_exact(a, list("qrstuvwxyz")) == 0
        # brute-force rational comparison on partial overlap
        from fractions import Fraction

        b = list("abcxyzdefg")
        sa, sb = set(), set()
        r = Fraction(0)
        for d in range(1, 11):
            sa.add(a[d - 1]); sb.add(b[d - 1])
            r += Fraction(1, 10) * Fraction(9, 10) ** (d - 1) * Fraction(
                len(sa & sb), d
            )
        assert rbo_milli_exact(a, b) == (1000 * r.numerator) // r.denominator

    def test_ranking_overlap_small_corpus(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.search import ranking_overlap

        # 'cat' occurs 12x in one doc (occurrence head) but in only 1 doc;
        # 'dog' occurs once in each of 6 docs (doc-frequency head).
        texts = ["cat " * 12] + ["dog x%d" % i for i in range(6)]
        tab = pa.Table.from_arrays(
            [
                pa.array(list(range(len(texts))), pa.int64()),
                pa.array(texts, pa.string()),
            ],
            names=["doc_id", "text"],
        )
        df = ranking_overlap(ray.data.from_arrow(tab).repartition(3), k=10)
        assert df["k"][0] == 10
        assert 0 < df["rbo_milli"][0] < 1000


class TestKendallTau:
    def test_exact_values(self):
        from pdf_extractor_ray.ops.search import kendall_tau_milli

        a = list("abcde")
        assert kendall_tau_milli(a, a) == (5, 10, 1000)
        assert kendall_tau_milli(a, a[::-1]) == (5, 10, -1000)
        assert kendall_tau_milli(a, list("vwxyz")) == (0, 0, 0)
        # partial overlap: common = [a, b] ordered same way
        assert kendall_tau_milli(list("abxyz"), list("abpqr")) == (2, 1, 1000)

    def test_brute_random(self):
        import itertools

        import numpy as np

        from pdf_extractor_ray.ops.search import kendall_tau_milli

        rng = np.random.RandomState(2)
        for _ in range(50):
            pool = [f"i{j}" for j in range(12)]
            a = list(rng.permutation(pool))[:8]
            b = list(rng.permutation(pool))[:8]
            n, pairs, tau = kendall_tau_milli(a, b)
            common = [x for x in a if x in set(b)]
            assert n == len(common)
            pa_, pb = {x: i for i, x in enumerate(a)}, {x: i for i, x in enumerate(b)}
            conc = disc = 0
            for x, y in itertools.combinations(common, 2):
                if (pa_[x] < pa_[y]) == (pb[x] < pb[y]):
                    conc += 1
                else:
                    disc += 1
            num = conc - disc
            exp = 0 if pairs == 0 else (
                (1000 * abs(num)) // pairs * (1 if num >= 0 else -1)
            )
            assert tau == exp
