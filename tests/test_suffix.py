"""Distributed prefix-doubling suffix array vs a Python brute force."""

import pyarrow as pa
import ray

from pdf_extractor_ray.ops.suffix import suffix_ranks


def brute_ranks(docs):
    sfx = sorted(
        (t[p:], d, p) for d, t in docs for p in range(len(t))
    )
    return {(d, p): i + 1 for i, (_, d, p) in enumerate(sfx)}


def run(docs, nparts=7):
    tbl = pa.Table.from_pylist(
        [{"doc_id": d, "text": t} for d, t in docs]
    )
    ds = ray.data.from_arrow(tbl).repartition(nparts)
    out = suffix_ranks(ds).take_all()
    return {(r["doc_id"], r["pos"]): r["srank"] for r in out}


class TestSuffixRanks:
    def test_cross_doc_ties_and_prefix_order(self, ray_session):
        # doc1's whole text is a suffix of doc0 (exact cross-doc tie,
        # broken by doc_id); "aaa"/"aaaa" exercise prefix-of ordering.
        docs = [(0, "abcab"), (1, "bcab"), (2, "aaa"), (3, "aaaa")]
        assert run(docs) == brute_ranks(docs)

    def test_long_repeats_force_many_rounds(self, ray_session):
        # Periodic strings keep ranks tied until h exceeds the period
        # span — the loop must run to the doubling bound, and ties on
        # full-identical suffixes must persist to the final row_number.
        docs = [(0, "ab" * 30), (1, "ab" * 25 + "x"), (2, "ba" * 20)]
        assert run(docs) == brute_ranks(docs)

    def test_unicode_and_degenerate_docs(self, ray_session):
        docs = [(0, "héllo wörld"), (1, ""), (2, "z"), (3, "héllo"), (4, " ")]
        assert run(docs) == brute_ranks(docs)

    def test_single_block_matches_many_blocks(self, ray_session):
        docs = [(i, f"common tail {i % 3}") for i in range(20)]
        assert run(docs, nparts=1) == run(docs, nparts=13) == brute_ranks(docs)


def brute_repeats(docs, k=20):
    sfx = sorted((t[p:], d, p) for d, t in docs for p in range(len(t)))

    def lcp(x, y):
        n = min(len(x), len(y))
        for i in range(n):
            if x[i] != y[i]:
                return i
        return n

    rows = []
    for (s1, d1, p1), (s2, d2, p2) in zip(sfx, sfx[1:]):
        rows.append((lcp(s1, s2), d1, p1, d2, p2))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    return rows[:k]


class TestLongestRepeats:
    def _check(self, docs, k=20, **kw):
        from pdf_extractor_ray.ops.suffix import longest_repeats

        tbl = pa.Table.from_pylist([{"doc_id": d, "text": t} for d, t in docs])
        ds = ray.data.from_arrow(tbl).repartition(5)
        out = longest_repeats(ds, k=k, **kw)
        got = list(
            zip(
                out["lcp"].to_pylist(),
                out["doc_id"].to_pylist(),
                out["pos"].to_pylist(),
                out["doc_id2"].to_pylist(),
                out["pos2"].to_pylist(),
            )
        )
        assert got == brute_repeats(docs, k=k)

    def test_cross_doc_repeat_and_overlap(self, ray_session):
        self._check(
            [
                (0, "the quick brown fox jumps"),
                (1, "a quick brown fox runs"),
                (2, "aaaaaa"),
                (3, "unrelated zzz"),
            ]
        )

    def test_identical_docs_full_tie(self, ray_session):
        # Byte-identical documents: every suffix pair ties fully; the
        # end-cap min(l, rem) must stop the lifted advance exactly.
        self._check([(0, "same text here"), (1, "same text here"), (2, "x")])

    def test_many_docs_many_blocks(self, ray_session):
        docs = [(i, f"shared shard body {i % 2}") for i in range(8)]
        self._check(docs)


class TestDistinctSubstringCensus:
    def test_vs_brute_force(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.substr import distinct_substring_census

        texts = ["abcabc", "", "aaaa", "abcd", None, "xyxyxyzz"]
        tab = pa.Table.from_arrays(
            [
                pa.array(list(range(len(texts))), pa.int64()),
                pa.array(texts, pa.string()),
            ],
            names=["doc_id", "text"],
        )
        df = (
            distinct_substring_census(ray.data.from_arrow(tab))
            .to_pandas()
            .sort_values("doc_id")
        )

        def brute(s):
            from collections import Counter

            c = Counter(
                s[i:j] for i in range(len(s)) for j in range(i + 1, len(s) + 1)
            )
            mr = max((len(x) for x, n in c.items() if n >= 2), default=0)
            return len(c), mr

        for r in df.itertuples():
            s = texts[int(r.doc_id)] or ""
            nd, mr = brute(s)
            assert (int(r.n_chars), int(r.n_distinct), int(r.max_repeat_len)) == (
                len(s), nd, mr
            )

    def test_truncation_cap(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.substr import distinct_substring_census

        tab = pa.Table.from_arrays(
            [pa.array([1], pa.int64()), pa.array(["ab" * 100], pa.string())],
            names=["doc_id", "text"],
        )
        df = distinct_substring_census(
            ray.data.from_arrow(tab), max_chars=8
        ).to_pandas()
        # "abababab": distinct substrings of length l: 2 each (shifted),
        # except l where only one fits... brute: ab,ba,a,b, aba,bab, ...
        assert df["n_chars"][0] == 8
        assert df["n_distinct"][0] == 2 * 8 - 1  # known for (ab)^4: 15
        assert df["max_repeat_len"][0] == 6  # "ababab" occurs twice


class TestLzCensus:
    def test_vs_brute_force(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.substr import lz_census

        texts = ["abababab", "", "aaaa", "abcdefgh", "xyxyxzzz", None]
        tab = pa.Table.from_arrays(
            [
                pa.array(list(range(len(texts))), pa.int64()),
                pa.array(texts, pa.string()),
            ],
            names=["doc_id", "text"],
        )
        df = (
            lz_census(ray.data.from_arrow(tab))
            .to_pandas()
            .sort_values("doc_id")
        )

        def brute(s):
            n, pos, k = len(s), 0, 0
            while pos < n:
                best = 1
                for l in range(1, n - pos + 1):
                    if s.find(s[pos : pos + l]) < pos:
                        best = l
                if s.find(s[pos : pos + best]) >= pos:
                    best = 1
                k += 1
                pos += best
            return k

        for r in df.itertuples():
            s = texts[int(r.doc_id)] or ""
            assert (int(r.n_chars), int(r.n_phrases)) == (len(s), brute(s))

    def test_known_values(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.substr import lz_census

        # 'aaaa' -> 'a' + 'aaa' (overlap-allowed source) = 2 phrases
        tab = pa.Table.from_arrays(
            [pa.array([0], pa.int64()), pa.array(["aaaa"], pa.string())],
            names=["doc_id", "text"],
        )
        df = lz_census(ray.data.from_arrow(tab)).to_pandas()
        assert df["n_phrases"][0] == 2
