"""Reciprocal-rank fusion of ranked retrieval arms (hybrid search).

Fuses the top-``depth`` candidate lists of independent retrieval systems
(lexical BM25, dense cosine ANN, ...) with the RRF formula of Cormack,
Clarke & Buettcher (SIGIR 2009): ``score(d) = Σ_arms 1 / (K + rank_arm(d))``
with the canonical ``K = 60``.  To keep fusion integer-exact and therefore
bit-reproducible across engines, the reciprocal is computed as
``SCALE // (K + rank)`` with ``SCALE = 1_000_000`` — the same
rational-to-integer floor trick as the engine's BM25 and TF-IDF scoring
(:mod:`ops.search`, ``ops/text.py:tfidf_top_terms``).

Distribution story: the heavy lifting is inside the ARMS (each is its own
distributed retrieval pass over the corpus — one vectorized broadcast-match
scan for BM25, one broadcast ``Q @ B.T`` partial-top-k scan for dense).
Each arm hands the driver only its per-query top-``depth`` table —
O(queries × depth) rows, never corpus-sized — so the fusion itself is a
driver-side dictionary merge by construction, independent of corpus scale.
A 10^12-document corpus changes the arms' scan cost, not the fusion's.

No counterpart in the reference repo (its retrieval surface is per-page
validation lookups); this completes the engine's ranked-search tier
(inverted_index → tfidf → bm25 → hybrid fusion).
"""

from __future__ import annotations

import pandas as pd

RRF_K = 60
RRF_SCALE = 1_000_000


def rrf_fuse(
    arms: dict[str, pd.DataFrame],
    k: int = 10,
    id_col: str = "doc_id",
    rrf_k: int = RRF_K,
    scale: int = RRF_SCALE,
) -> pd.DataFrame:
    """Fuse per-arm rank tables into a top-``k`` per query.

    Each value in ``arms`` is a DataFrame with columns
    ``(query_id, <id_col>, rank)`` — an arm's top-depth candidates, rank
    1-based. A document absent from an arm contributes 0 from that arm
    (the standard RRF convention for truncated lists). Returns columns
    ``(query_id, <id_col>, rrf_score, rank)`` with rank 1..k per query,
    ties broken by ascending document id; ``rrf_score`` is the exact
    integer ``Σ scale // (rrf_k + rank_arm)``.
    """
    if not arms:
        raise ValueError("rrf_fuse: no arms given")
    scores: dict[tuple, int] = {}
    for arm in arms.values():
        for qid, did, rank in zip(arm["query_id"], arm[id_col], arm["rank"]):
            key = (qid, did)
            scores[key] = scores.get(key, 0) + scale // (rrf_k + int(rank))
    rows = sorted(
        ((qid, did, s) for (qid, did), s in scores.items()),
        key=lambda r: (r[0], -r[2], r[1]),
    )
    out_q, out_d, out_s, out_r = [], [], [], []
    seen: dict = {}
    for qid, did, s in rows:
        n = seen.get(qid, 0)
        if n >= k:
            continue
        seen[qid] = n + 1
        out_q.append(qid)
        out_d.append(did)
        out_s.append(s)
        out_r.append(n + 1)
    return pd.DataFrame(
        {
            "query_id": pd.Series(out_q, dtype=object),
            id_col: pd.Series(out_d, dtype="int64"),
            "rrf_score": pd.Series(out_s, dtype="int64"),
            "rank": pd.Series(out_r, dtype="int32"),
        }
    )
