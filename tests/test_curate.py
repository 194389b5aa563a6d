"""ops/curate.py: the clean → gate → dedup → shard composition."""

import numpy as np
import pyarrow as pa


def _doc(words: int, seed: int) -> str:
    rng = np.random.Generator(np.random.Philox(seed))
    vocab = ["the", "data", "merge", "sort", "table", "join", "row", "scan"]
    toks = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(words)]
    lines = [" ".join(toks[k : k + 8]) + "." for k in range(0, len(toks), 8)]
    return "\n".join(lines)


class TestCurateCorpus:
    def test_composition(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.curate import curate_corpus

        rows = [
            {"doc_id": 0, "text": _doc(80, 1)},     # passes everything
            {"doc_id": 1, "text": _doc(80, 2)},     # passes
            {"doc_id": 2, "text": _doc(80, 1)},     # exact dup of 0 -> dropped
            {"doc_id": 3, "text": _doc(10, 3)},     # <3 kept lines -> C4 drop
            {"doc_id": 4, "text": _doc(30, 4)},     # <50 words -> Gopher drop
            {"doc_id": 5, "text": "x{y\n" + _doc(80, 5)},  # '{' -> C4 doc drop
        ]
        ds = rd.from_items(rows).repartition(3)
        plan = curate_corpus(ds, min_words=50, shard_bytes=10_000).to_pandas()
        # survivors: docs 0 and 1 only
        assert plan["n_docs"].sum() == 2
        assert plan["first_doc"].iloc[0] == 0
        total = plan["total_bytes"].sum()
        # cleaned text of an 80-word doc: 10 lines of 8 words + '.' each
        import re

        def clean_len(t):
            kl = [
                l for l in t.split("\n")
                if re.search(r'[.!?"]$', l)
                and len(re.findall(r"\S+", l)) >= 5
                and "javascript" not in l.lower()
            ]
            return len("\n".join(kl))

        assert total == clean_len(rows[0]["text"]) + clean_len(rows[1]["text"])

    def test_shard_budget(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.curate import curate_corpus

        rows = [{"doc_id": i, "text": _doc(64, 100 + i)} for i in range(40)]
        ds = rd.from_items(rows).repartition(4)
        plan = (
            curate_corpus(ds, min_words=50, shard_bytes=2_000)
            .to_pandas().sort_values("shard_id").reset_index(drop=True)
        )
        assert plan["n_docs"].sum() == 40  # all pass, no dups
        # shards are contiguous in id order and ids are 0..k
        assert plan["shard_id"].tolist() == list(range(len(plan)))
        assert plan["first_doc"].is_monotonic_increasing


class TestKAnonymity:
    """ops/curate.py k_anonymity: brute-force group sizes, flag
    threshold, block-layout invariance."""

    def _rows(self):
        rows = []
        for i in range(30):
            rows.append({
                "doc_id": i,
                "lang": ["en", "de", "fr"][i % 3],
                "source": ["web", "pdf"][(i // 3) % 2],
                "len_bucket": (i // 6) % 2,
            })
        return rows

    def _brute(self, rows, k):
        from collections import Counter
        sizes = Counter(
            (r["lang"], r["source"], r["len_bucket"]) for r in rows)
        return {
            r["doc_id"]: (
                sizes[(r["lang"], r["source"], r["len_bucket"])],
                int(sizes[(r["lang"], r["source"], r["len_bucket"])] >= k),
            )
            for r in rows
        }

    def test_parity_and_layouts(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.curate import k_anonymity

        rows = self._rows()
        for k in (2, 5, 100):
            want = self._brute(rows, k)
            for parts in (1, 4):
                ds = rd.from_items(rows).repartition(parts)
                df = k_anonymity(
                    ds, quasi_cols=["lang", "source", "len_bucket"], k=k
                ).to_pandas()
                got = {
                    int(r.doc_id): (int(r.group_size), int(r.k_anonymous))
                    for r in df.itertuples()
                }
                assert got == want, (k, parts)

    def test_single_row_never_anonymous(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.curate import k_anonymity

        ds = rd.from_items(
            [{"doc_id": 1, "lang": "en", "source": "web", "len_bucket": 0}])
        df = k_anonymity(
            ds, quasi_cols=["lang", "source", "len_bucket"], k=2
        ).to_pandas()
        assert int(df.group_size[0]) == 1 and int(df.k_anonymous[0]) == 0
