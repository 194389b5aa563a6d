"""BM25 ranked retrieval over the corpus, integer-exact.

The distributed shape is retrieval's classic one, inverted: instead of
building the whole vocabulary's index and probing it, the (tiny) query-term
set is broadcast into a single ``map_batches`` pass that emits one row per
(query term, matching doc) — postings for O(query terms) tokens only, never
the corpus vocabulary — plus per-block corpus statistics partials. The only
exchanges after that touch the match rows (O(matching docs), the selective
minority at web scale): one tiny groupby for per-term document frequency
and one groupby-sum for per-(query, doc) scores, then a global top-k.

Scoring is Okapi BM25 with ``k1 = 3/2`` and ``b = 3/4`` and a *rational*
IDF — ``(N - df + 1/2) / (df + 1/2)`` used directly instead of its log —
so every term weight is an exact integer floor division reproducible
bit-for-bit in ANSI SQL (the same trick as the engine's integer-exact
TF-IDF, ``ops/text.py:tfidf_top_terms``). The monotone ln() is dropped,
not the ranking semantics: for a fixed query the score stays a monotone
combination of tf, df, and length normalization. Derivation used below,
with ``A = floor(total_tokens / N)`` the integer average document length:

    tf_part = tf * (k1+1) / (tf + k1 * (1 - b + b * dl / A))
            = 20*A*tf / (8*A*tf + 3*A + 9*dl)          (multiply by 8A)
    score   = sum_t floor( SCALE * (2N-2df+1) * 20*A*tf
                           / ((2df+1) * (8*A*tf + 3*A + 9*dl)) )

No counterpart in the reference repo (its retrieval surface is per-page
validation lookups, ``src/services/validation_service.py``); this extends
the engine's corpus-analysis tier (inverted_index, tfidf) to ranked search.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 10_000  # k1 = 3/2 and b = 3/4 are folded into the integer formula


def _match_rows(ds, terms: tuple[str, ...], text_col: str, id_col: str):
    """One vectorized pass: per doc, its token count ``dl`` and the tf of
    every query term it contains. Emits only matching (term, doc) rows."""
    term_arr = pa.array(sorted(set(terms)), pa.string())

    def emit(batch: pa.Table) -> pa.Table:
        from .text import split_words

        texts = pc.fill_null(batch[text_col], "")
        words_list = split_words(texts)
        w = words_list.flatten()
        reps = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
        ids = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), reps)
        nonempty = pc.not_equal(w, "").to_numpy(zero_copy_only=False)
        # dl counts every nonempty token; per-doc via reduceat over offsets.
        bounds = np.concatenate(([0], np.cumsum(reps)))
        csum = np.concatenate(([0], np.cumsum(nonempty.astype(np.int64))))
        dl_all = csum[bounds[1:]] - csum[bounds[:-1]]
        dl_rep = np.repeat(dl_all, reps)
        hit = pc.is_in(w, value_set=term_arr).to_numpy(zero_copy_only=False)
        hit &= nonempty
        wh = w.to_numpy(zero_copy_only=False)[hit]
        dh = ids[hit]
        lh = dl_rep[hit]
        # One corpus-stats sentinel row per block ("" is never a token):
        # tf carries the block's doc count, dl its nonempty-token count.
        stats_row = pa.Table.from_arrays(
            [
                pa.array([""], pa.string()),
                pa.array([-1], pa.int64()),
                pa.array([len(batch)], pa.int64()),
                pa.array([int(dl_all.sum())], pa.int64()),
            ],
            names=["token", id_col, "tf", "dl"],
        )
        if len(wh) == 0:
            return stats_row
        wh = wh.astype(str)
        order = np.lexsort((dh, wh))
        wh, dh, lh = wh[order], dh[order], lh[order]
        new = np.concatenate(([True], (wh[1:] != wh[:-1]) | (dh[1:] != dh[:-1])))
        idx = np.flatnonzero(new)
        tf = np.diff(np.append(idx, len(wh)))
        dls = lh[idx]
        out = pa.Table.from_arrays(
            [
                pa.array(wh[idx].astype(object), pa.string()),
                pa.array(dh[idx], pa.int64()),
                pa.array(tf, pa.int64()),
                pa.array(dls, pa.int64()),
            ],
            names=["token", id_col, "tf", "dl"],
        )
        return pa.concat_tables([stats_row, out])

    return ds.map_batches(emit, batch_format="pyarrow", batch_size=None)


def bm25_topk(
    ds,
    queries: dict[str, str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Top-``k`` documents per query by integer-exact rational-IDF BM25.

    ``queries`` maps query_id → whitespace query string. Returns columns
    ``(query_id, doc_id, score, rank)`` with rank 1..k per query, ties
    broken by ascending doc id. The per-query candidate set is every doc
    containing ≥1 query term; scores for docs sharing no term are 0 and
    never materialize.
    """
    q_terms = {
        qid: tuple(dict.fromkeys(q.lower().split())) for qid, q in queries.items()
    }
    all_terms = tuple({t for ts in q_terms.values() for t in ts})
    if not all_terms:
        raise ValueError("bm25_topk: queries contain no terms")

    # ONE corpus scan: match rows + per-block stats sentinels, kept in
    # the object store for the two consumers below.
    raw = _match_rows(ds, all_terms, text_col, id_col).materialize()

    def _split(sentinel: bool):
        def f(batch: pa.Table) -> pa.Table:
            mask = pc.equal(batch[id_col], -1)
            return batch.filter(mask if sentinel else pc.invert(mask))

        return f

    stats = raw.map_batches(_split(True), batch_format="pyarrow").sum(["tf", "dl"])
    n_docs, n_toks = int(stats["sum(tf)"]), int(stats["sum(dl)"])
    avgdl = max(1, n_toks // max(1, n_docs))

    matches = raw.map_batches(_split(False), batch_format="pyarrow")
    # Document frequency per query term: a groupby over the match minority.
    df_rows = matches.groupby("token").count().take_all()
    df_by_term = {r["token"]: int(r["count()"]) for r in df_rows}
    terms_sorted = np.array(sorted(df_by_term))
    dfs_sorted = np.array([df_by_term[t] for t in terms_sorted], dtype=np.int64)

    # term → the query ids containing it (a term may serve several
    # queries; the score stage replicates its match rows per query, so
    # ONE exchange scores every query at once).
    qids_by_term: dict[str, list[str]] = {}
    for qid, terms in q_terms.items():
        for t in terms:
            qids_by_term.setdefault(t, []).append(qid)

    def score(batch: pa.Table) -> pa.Table:
        tok = batch["token"].to_numpy(zero_copy_only=False).astype(str)
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        dl = batch["dl"].to_numpy(zero_copy_only=False)
        # Every match token is a query term: sorted-lookup its global df.
        dfv = dfs_sorted[np.searchsorted(terms_sorted, tok)]
        num = SCALE * (2 * n_docs - 2 * dfv + 1) * (20 * avgdl) * tf
        den = (2 * dfv + 1) * (8 * avgdl * tf + 3 * avgdl + 9 * dl)
        w = num // den
        reps = np.fromiter(
            (len(qids_by_term[t]) for t in tok), dtype=np.int64, count=len(tok)
        )
        qid_col = [q for t in tok for q in qids_by_term[t]]
        return pa.Table.from_arrays(
            [
                pa.array(qid_col, pa.string()),
                pa.array(np.repeat(batch[id_col].to_numpy(zero_copy_only=False), reps)),
                pa.array(np.repeat(w, reps)),
            ],
            names=["query_id", id_col, "w"],
        )

    per_doc = (
        matches.map_batches(score, batch_format="pyarrow")
        .groupby(["query_id", id_col])
        .sum("w")
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        # Per-block top-k per query: bounds the driver merge at
        # k × num_blocks × num_queries rows.
        qv = batch["query_id"].to_numpy(zero_copy_only=False).astype(str)
        dv = batch[id_col].to_numpy(zero_copy_only=False)
        wv = batch["sum(w)"].to_numpy(zero_copy_only=False)
        keep_idx = []
        for q in np.unique(qv):
            sel = np.flatnonzero(qv == q)
            order = np.lexsort((dv[sel], -wv[sel]))[:k]
            keep_idx.extend(sel[order].tolist())
        return batch.take(pa.array(sorted(keep_idx)))

    rows = per_doc.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=None
    ).take_all()
    rows.sort(key=lambda r: (r["query_id"], -r["sum(w)"], r[id_col]))
    out_q, out_d, out_s, out_r = [], [], [], []
    seen: dict[str, int] = {}
    for r in rows:
        qid = r["query_id"]
        n = seen.get(qid, 0)
        if n >= k:
            continue
        seen[qid] = n + 1
        out_q.append(qid)
        out_d.append(int(r[id_col]))
        out_s.append(int(r["sum(w)"]))
        out_r.append(n + 1)
    return pa.Table.from_arrays(
        [
            pa.array(out_q, pa.string()),
            pa.array(out_d, pa.int64()),
            pa.array(out_s, pa.int64()),
            pa.array(out_r, pa.int32()),
        ],
        names=["query_id", id_col, "score", "rank"],
    )


# ---------------------------------------------------------------------------
# Positional phrase search
# ---------------------------------------------------------------------------
# The second classic index operation after ranked retrieval: exact token
# phrase matching via positional postings intersection ("to be or not to
# be" must match those tokens ADJACENT, not merely co-occurring). The
# engine's inverted index (`ops/index.py`) stores tf-level postings; this
# op supplies the positions tier, query-driven: positions are emitted for
# the O(phrase length) query tokens only — never a corpus-wide positional
# index — so the exchange is O(occurrences of phrase tokens), the
# selective minority at web scale.
#
# Two equivalence-tested regimes (same contract as the engine's other
# dual-regime ops):
#
# - block-local (default): each document's tokens are co-resident in its
#   block, so the positional intersect runs inside ONE shuffle-free
#   map_batches pass: for phrase token j at document position p, a match
#   starts at p - j iff ALL m phrase slots vote for that start — counted
#   vectorized with one np.unique over (doc, start) keys per block.
# - positions exchange (`via="positions"`): the textbook distributed
#   intersect for when token positions arrive as an exploded table (e.g.
#   read back from a posting store): the same (doc, start, slot) votes
#   become rows, one groupby(doc, start) counts slots, count == m is a
#   match. Used above `block_cap` document tokens or on demand.
#
# A start can never be double-voted by one slot (one token owns one
# position), and negative/overflow starts are impossible matches (slot j
# would need a token at a position outside the document), so count == m is
# exact. Overlapping occurrences all count. No counterpart in the
# reference repo; tokenization is THE corpus tokenization
# (`ops/text.py:split_words`), mirrored by every SQL oracle.


def _phrase_votes(batch: pa.Table, phrase_tokens: list[str],
                  text_col: str, id_col: str):
    """Vectorized (doc_id, start, slot) votes for one block: slot j votes
    for start p - j wherever phrase token j sits at document position p."""
    from .text import split_words

    texts = pc.fill_null(batch[text_col], "")
    words_list = split_words(texts)
    w = words_list.flatten()
    reps = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(w, "").to_numpy(zero_copy_only=False)
    # Document positions count nonempty tokens only (split_words edge "").
    bounds = np.concatenate(([0], np.cumsum(reps)))
    csum = np.concatenate(([0], np.cumsum(nonempty.astype(np.int64))))
    pos_all = csum[:-1][: len(w)] if len(w) else np.empty(0, np.int64)
    # position of token t within its doc = csum[t] - csum[doc_start]
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
    pos_in_doc = pos_all - csum[bounds[:-1]][doc_idx] if len(w) else pos_all
    wv = w.to_numpy(zero_copy_only=False)
    out_doc, out_start, out_slot = [], [], []
    for j, tok in enumerate(phrase_tokens):
        hit = nonempty & (wv == tok)
        if not hit.any():
            continue
        out_doc.append(doc_idx[hit])
        out_start.append(pos_in_doc[hit] - j)
        out_slot.append(np.full(int(hit.sum()), j, np.int64))
    if not out_doc:
        e = np.empty(0, np.int64)
        return ids, e, e, e
    return (
        ids,
        np.concatenate(out_doc),
        np.concatenate(out_start),
        np.concatenate(out_slot),
    )


def phrase_search(ds, phrase: str, text_col: str = "text",
                  id_col: str = "doc_id", via: str = "local"):
    """Exact token-phrase occurrence counts per document.

    Returns a Dataset of ``(id_col, n_matches, first_pos)`` rows for
    documents with >= 1 occurrence. ``via="local"`` intersects inside the
    block (shuffle-free); ``via="positions"`` routes the votes through the
    distributed groupby intersect — identical output (equivalence-tested).
    """
    phrase_tokens = [t for t in phrase.lower().split() if t]
    if not phrase_tokens:
        raise ValueError("empty phrase")
    m = len(phrase_tokens)

    if via == "local":

        def match_block(batch: pa.Table) -> pa.Table:
            id_type = batch.schema.field(id_col).type
            ids, doc, start, slot = _phrase_votes(
                batch, phrase_tokens, text_col, id_col
            )
            if len(doc) == 0:
                return pa.Table.from_arrays(
                    [
                        pa.array([], id_type),
                        pa.array([], pa.int64()),
                        pa.array([], pa.int64()),
                    ],
                    names=[id_col, "n_matches", "first_pos"],
                )
            valid = start >= 0
            doc, start, slot = doc[valid], start[valid], slot[valid]
            # one vote per (doc, start, slot) by construction; a match is
            # a (doc, start) key holding all m slots.
            key = (doc << 32) | start  # positions < 2^32 per document
            uk, cnt = np.unique(key, return_counts=True)
            mk = uk[cnt == m]
            if len(mk) == 0:
                return pa.Table.from_arrays(
                    [
                        pa.array([], id_type),
                        pa.array([], pa.int64()),
                        pa.array([], pa.int64()),
                    ],
                    names=[id_col, "n_matches", "first_pos"],
                )
            mdoc = mk >> 32
            mstart = mk & 0xFFFFFFFF
            udoc = np.unique(mdoc)
            seg = np.searchsorted(mdoc, udoc)
            n_matches = np.diff(np.append(seg, len(mdoc)))
            first = mstart[seg]  # np.unique sorts keys: first start per doc
            return pa.Table.from_arrays(
                [
                    pa.array(ids[udoc]).cast(id_type),
                    pa.array(n_matches, pa.int64()),
                    pa.array(first, pa.int64()),
                ],
                names=[id_col, "n_matches", "first_pos"],
            )

        return ds.map_batches(
            match_block, batch_format="pyarrow", batch_size=None
        ).sort(id_col)

    if via != "positions":
        raise ValueError(f"unknown via={via!r}")

    def vote_rows(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        ids, doc, start, slot = _phrase_votes(
            batch, phrase_tokens, text_col, id_col
        )
        valid = start >= 0
        doc, start, slot = doc[valid], start[valid], slot[valid]
        return pa.Table.from_arrays(
            [
                pa.array(ids[doc] if len(doc) else [], id_type)
                if len(doc)
                else pa.array([], id_type),
                pa.array(start, pa.int64()),
                pa.array(slot, pa.int64()),
            ],
            names=[id_col, "start", "slot"],
        )

    from ray.data.aggregate import Count, Min

    votes = ds.map_batches(vote_rows, batch_format="pyarrow", batch_size=None)

    def full_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["count()"], m))

    hits = (
        votes.groupby([id_col, "start"])
        .count()
        .map_batches(full_only, batch_format="pyarrow", batch_size=None)
    )
    agg = hits.groupby(id_col).aggregate(Count(), Min("start"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch[id_col],
                batch["count()"].cast(pa.int64()),
                batch["min(start)"].cast(pa.int64()),
            ],
            names=[id_col, "n_matches", "first_pos"],
        )

    return agg.map_batches(
        rename, batch_format="pyarrow", batch_size=None
    ).sort(id_col)


def proximity_topk(
    ds,
    terms: list[str],
    k: int = 25,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Minimal-window proximity ranking (the classic "all query terms
    near each other" relevance signal, Clarke et al.'s cover semantics):
    for every document containing ALL ``terms`` (bag semantics, any
    order), the length of the shortest token span covering every term —
    top-k by ``(window ASC, id ASC)``. Exact and integer-valued, so the
    SQL oracle (a per-doc positions cross-join min) matches bit-for-bit.

    Shape: one vectorized pass per block extracts (doc, pos, slot)
    occurrence votes with the single-sourced corpus tokenization
    (:func:`..ops.text.split_words`); the two-pointer cover scan runs
    per MATCHED document over its query-term occurrences only (the
    matched minority — never the token stream); candidates are one
    small ``(id, window)`` row per matched doc, ranked by ONE top-k
    sort. Returns a pandas DataFrame ``(doc_id, window, rank)``.
    """
    import pandas as pd

    from .text import split_words

    uniq = list(dict.fromkeys(t.lower() for t in terms if t))
    m = len(uniq)
    if m == 0:
        raise ValueError("proximity_topk: no terms")
    slot_of = {t: j for j, t in enumerate(uniq)}

    def candidates(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        words_list = split_words(texts)
        w = words_list.flatten()
        reps = pc.list_value_length(words_list).to_numpy(
            zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(w, "").to_numpy(zero_copy_only=False)
        bounds = np.concatenate(([0], np.cumsum(reps)))
        csum = np.concatenate(([0], np.cumsum(nonempty.astype(np.int64))))
        pos_all = (csum[:-1][: len(w)] if len(w)
                   else np.empty(0, np.int64))
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        pos_in_doc = (pos_all - csum[bounds[:-1]][doc_idx]
                      if len(w) else pos_all)
        wv = w.to_numpy(zero_copy_only=False)
        hit_doc, hit_pos, hit_slot = [], [], []
        for tok, j in slot_of.items():
            hit = nonempty & (wv == tok)
            if hit.any():
                hit_doc.append(doc_idx[hit])
                hit_pos.append(pos_in_doc[hit])
                hit_slot.append(np.full(int(hit.sum()), j, np.int64))
        if not hit_doc:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=[id_col, "window"],
            )
        d = np.concatenate(hit_doc)
        p = np.concatenate(hit_pos)
        s = np.concatenate(hit_slot)
        order = np.lexsort((p, d))
        d, p, s = d[order], p[order], s[order]
        starts = np.searchsorted(d, np.unique(d))
        ends = np.append(starts[1:], len(d))
        out_ids, out_win = [], []
        for a, b in zip(starts, ends):
            sp, ss = p[a:b], s[a:b]
            counts = np.zeros(m, np.int64)
            covered = 0
            best = -1
            lo = 0
            for hi in range(len(sp)):
                if counts[ss[hi]] == 0:
                    covered += 1
                counts[ss[hi]] += 1
                while covered == m:
                    win = int(sp[hi] - sp[lo] + 1)
                    if best < 0 or win < best:
                        best = win
                    counts[ss[lo]] -= 1
                    if counts[ss[lo]] == 0:
                        covered -= 1
                    lo += 1
            if best > 0:
                out_ids.append(int(ids[d[a]]))
                out_win.append(best)
        return pa.Table.from_arrays(
            [pa.array(out_ids, pa.int64()), pa.array(out_win, pa.int64())],
            names=[id_col, "window"],
        )

    top = (
        ds.map_batches(candidates, batch_format="pyarrow")
        .sort(["window", id_col])
        .limit(k)
    )
    rows = top.take_all()
    return pd.DataFrame(
        {
            id_col: pd.array([r[id_col] for r in rows], dtype="int64"),
            "window": pd.array([r["window"] for r in rows], dtype="int64"),
            "rank": pd.array(range(1, len(rows) + 1), dtype="int64"),
        }
    )


_RBO_DEN_LCM = 2520  # lcm(1..10)


def rbo_milli_exact(rank_a: list, rank_b: list, k: int = 10) -> int:
    """Truncated rank-biased overlap (Webber, Moffat, Zobel 2010) at
    persistence p = 9/10, as an EXACT integer in floor milli-units:
    ``RBO@k = (1−p) Σ_{d=1..k} p^{d-1} · |A[:d] ∩ B[:d]| / d`` with the
    common denominator ``10^k · lcm(1..k)`` — pure integer arithmetic,
    replayable in HUGEINT SQL with a literal coefficient table."""
    if k != 10:
        raise ValueError("rbo_milli_exact: coefficient table is built for k=10")
    num = 0
    seen_a: set = set()
    seen_b: set = set()
    for d in range(1, k + 1):
        if d <= len(rank_a):
            seen_a.add(rank_a[d - 1])
        if d <= len(rank_b):
            seen_b.add(rank_b[d - 1])
        x_d = len(seen_a & seen_b)
        num += x_d * (9 ** (d - 1)) * (10 ** (k - d)) * (_RBO_DEN_LCM // d)
    den = (10**k) * _RBO_DEN_LCM
    return (1000 * num) // den


def ranking_overlap(ds, k: int = 10, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Eval-harness operator: how differently do two corpus term
    rankings order the head? Ranking A = top-``k`` tokens by OCCURRENCE
    count, ranking B = top-``k`` by DISTINCT-DOCUMENT count (the same
    head under a different weighting — stopword-ish terms move), both
    under THE corpus tokenization with (count desc, token) tiebreaks;
    agreement scored by exact-integer truncated RBO (p = 9/10).

    Shape: per-block (token, occ, one-per-doc) partials pre-combine
    before ONE ``groupby(token).sum``; each output block reduces to its
    local top-``k`` rows for BOTH weightings and the driver merges
    O(blocks·k) rows — the word_topk partial-top-k regime, nothing
    vocabulary-sized on the driver.

    Returns a one-row pandas DataFrame ``(k, overlap_at_k,
    rbo_milli)``.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .text import split_words

    def partials(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if pa.types.is_null(col.type):
            col = pa.nulls(len(col), pa.string())
        words = split_words(pc.fill_null(col, ""))
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = np.asarray(pc.list_flatten(words).to_pylist(), dtype=object)
        ids = np.repeat(
            batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        keep = flat != ""
        flat, ids = flat[keep], ids[keep]
        # occurrences
        occ_u, occ_c = np.unique(flat.astype(str), return_counts=True)
        # distinct docs: unique (token, doc) pairs then count per token
        comp = np.char.add(
            np.char.add(flat.astype(str), "\x1f"), ids.astype(str)
        )
        pair_u = np.unique(comp)
        toks = np.char.partition(pair_u, "\x1f")[:, 0]
        doc_u, doc_c = np.unique(toks, return_counts=True)
        # align: doc_u ⊆ occ_u
        doc_counts = np.zeros(len(occ_u), np.int64)
        doc_counts[np.searchsorted(occ_u, doc_u)] = doc_c
        return pa.Table.from_arrays(
            [
                pa.array(occ_u.astype(object), pa.string()),
                pa.array(occ_c.astype(np.int64), pa.int64()),
                pa.array(doc_counts, pa.int64()),
            ],
            names=["token", "occ", "docs"],
        )

    totals = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("occ", alias_name="occ"), Sum("docs", alias_name="docs"))
        .map_batches(
            lambda t: t.rename_columns(["token", "occ", "docs"]),
            batch_format="pyarrow",
        )
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        tok = np.asarray(batch["token"].to_pylist(), dtype=object)
        occ = batch["occ"].to_numpy(zero_copy_only=False)
        docs = batch["docs"].to_numpy(zero_copy_only=False)
        ia = np.lexsort((tok, -occ))[:k]
        ib = np.lexsort((tok, -docs))[:k]
        idx = np.unique(np.concatenate([ia, ib]))
        return pa.Table.from_arrays(
            [
                pa.array(tok[idx].astype(str), pa.string()),
                pa.array(occ[idx], pa.int64()),
                pa.array(docs[idx], pa.int64()),
            ],
            names=["token", "occ", "docs"],
        )

    head = totals.map_batches(
        local_topk, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    rank_a = head.sort_values(
        ["occ", "token"], ascending=[False, True]
    )["token"].head(k).tolist()
    rank_b = head.sort_values(
        ["docs", "token"], ascending=[False, True]
    )["token"].head(k).tolist()
    out = pd.DataFrame(
        {
            "k": [k],
            "overlap_at_k": [len(set(rank_a) & set(rank_b))],
            "rbo_milli": [rbo_milli_exact(rank_a, rank_b, k)],
        }
    )
    out.attrs["rank_a"] = rank_a
    out.attrs["rank_b"] = rank_b
    return out


def term_head_rankings(ds, k: int = 10, text_col: str = "text",
                       id_col: str = "doc_id"):
    """The two term-head rankings :func:`ranking_overlap` compares —
    top-``k`` tokens by occurrence count and by distinct-document
    count, (count desc, token) tiebreaks — exposed for other rank-
    agreement metrics. Same exchange shape (one token groupby with
    both weightings, per-block partial top-k, O(blocks·k) driver
    merge). Returns ``(rank_a, rank_b)`` as lists."""
    df = ranking_overlap(ds, k=k, text_col=text_col, id_col=id_col)
    # ranking_overlap already computed them; recomputing twice would
    # double the corpus passes — so it stashes the lists on the frame.
    return df.attrs["rank_a"], df.attrs["rank_b"]


def kendall_tau_milli(rank_a: list, rank_b: list) -> tuple[int, int, int]:
    """Kendall tau-a between two rankings RESTRICTED to their common
    items (distinct ranks, no ties): returns ``(n_common, n_pairs,
    tau_milli)`` with ``tau_milli = 1000·(C − D) // pairs`` in
    magnitude-truncating milli (SQL ``//`` convention via sign
    factoring); fewer than two common items yields tau 0."""
    common = [x for x in rank_a if x in set(rank_b)]
    pa_ = {x: i for i, x in enumerate(rank_a)}
    pb = {x: i for i, x in enumerate(rank_b)}
    n = len(common)
    pairs = n * (n - 1) // 2
    if pairs == 0:
        return n, 0, 0
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            a_ord = pa_[common[i]] < pa_[common[j]]
            b_ord = pb[common[i]] < pb[common[j]]
            if a_ord == b_ord:
                conc += 1
            else:
                disc += 1
    num = conc - disc
    tau = (1000 * abs(num)) // pairs
    return n, pairs, tau if num >= 0 else -tau
