"""BM25 retrieval op: integer-exact scores vs a brute-force reference
computed with Python bigints, plus determinism across block layouts."""

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
