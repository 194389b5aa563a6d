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
