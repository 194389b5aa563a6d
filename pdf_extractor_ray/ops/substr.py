"""Exact duplicated-substring detection (ExactSubstr-style signal).

"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2022, arXiv:2107.06499 — public) showed that EXACT substrings repeated
across a corpus (50-token/char windows) are a distinct contamination
signal from near-dup documents: boilerplate, licenses, quoted passages.
Their reference implementation builds a corpus suffix array; the
shuffle-equivalent here is rolling-hash windows:

1. Per-block partial: every document's ``window``-char rolling
   polynomial hashes (vectorized: ``w`` wrapping uint64 multiply-adds
   over the code-point array per doc), pre-combined to unique
   ``(hash, cnt)`` rows per block.
2. One ``groupby(hash).sum`` — this exchange carries up to
   O(total_chars) 16-byte rows and is the honest, irreducible cost of
   exact-substring matching (a distributed suffix array shuffles the
   same order of data). Filter to ``cnt >= 2`` = the duplicated-window
   set, typically a tiny fraction of windows.
3. Second streaming pass recomputes per-doc hashes and counts window
   positions hitting the duplicated set — broadcast via ``ray.put``
   when the set fits (``dup_cap``, documented), mirroring the
   candidate-minority broadcast in ``ops/dedup``'s verify stage; at
   corpus scale swap step 3's membership test for a hash-partitioned
   semi-join on the window hash (same key as step 2's exchange).

Windows are CHARACTER (code-point) windows, matching SQL
``substring(text, i, w)`` semantics so the oracle can recount with
string equality.  Hash collisions (2^-64 per pair) can only overcount a
duplicate — same documented caveat as ``fingerprint_dedup``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["duplicate_window_counts", "window_hashes"]

_B = np.uint64(1099511628211)  # FNV prime as polynomial base


def window_hashes(text: str, window: int) -> np.ndarray:
    """Rolling polynomial hashes (mod 2^64) of every ``window``-char
    substring: h(i) = Σ_j cp[i+j]·B^(w-1-j). Vectorized as ``w``
    wrapping multiply-adds over the code-point array."""
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(cps)
    if n < window:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):  # wrapping mod-2^64 is the point
        pows = np.empty(window, dtype=np.uint64)
        pows[-1] = np.uint64(1)
        for j in range(window - 2, -1, -1):
            pows[j] = pows[j + 1] * _B
    acc = np.zeros(n - window + 1, dtype=np.uint64)
    for j in range(window):
        acc += cps[j : n - window + 1 + j] * pows[j]
    return acc


def duplicate_window_counts(
    ds,
    window: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_cap: int = 2_000_000,
):
    """Per-document duplicated-window statistics: a Dataset of
    ``(id, total_windows, dup_windows)`` rows — ``dup_windows`` counts
    window POSITIONS whose ``window``-char substring occurs ≥2 times
    anywhere in the corpus (including overlaps and within-doc repeats).
    Documents shorter than ``window`` produce no row (no windows).

    Past ``dup_cap`` duplicated hashes the membership broadcast switches
    to the documented hash-partitioned semi-join on the window hash (the
    same key as the counting exchange): per-(doc, hash) partial counts
    join the duplicated-hash table, a ``groupby(id)`` folds the hits, and
    per-doc totals ride a second message kind through the same exchange —
    nothing dup-set-sized ever lands on the driver."""
    import ray
    from ray.data.aggregate import Sum

    def hash_count_partial(batch: pa.Table) -> pa.Table:
        hs = [window_hashes(t or "", window) for t in batch[text_col].to_pylist()]
        allh = (
            np.concatenate(hs) if hs else np.empty(0, dtype=np.uint64)
        )
        u, c = np.unique(allh, return_counts=True)
        return pa.Table.from_arrays(
            [
                pa.array(u.view(np.int64), pa.int64()),
                pa.array(c, pa.int64()),
            ],
            names=["h", "cnt"],
        )

    def dups_only(tbl: pa.Table) -> pa.Table:
        # Vectorized (a per-row lambda filter over the vocabulary-sized
        # groupby output was the measured bottleneck: 17 s -> 6 s at sf0.1)
        mask = np.asarray(tbl["sum(cnt)"].to_numpy(zero_copy_only=False)) >= 2
        return tbl.select(["h"]).filter(pa.array(mask))

    dups_ds = (
        ds.map_batches(hash_count_partial, batch_format="pyarrow", batch_size=None)
        .groupby("h")
        .aggregate(Sum("cnt"))
        .map_batches(dups_only, batch_format="pyarrow", batch_size=None)
    )
    # Stream the (lazy) dup pipeline ONCE with an early exit at dup_cap —
    # a materialize-then-count would pay an extra pin/copy on the common
    # under-cap path (measured +5 s at sf0.1). Over the cap, the semi-join
    # regime re-executes the lazy pipeline inside its attach_lookup.
    dup_tables: list[pa.Table] = []
    n_dups = 0
    for t in dups_ds.iter_batches(batch_format="pyarrow"):
        n_dups += t.num_rows
        if n_dups > dup_cap:
            return _dup_counts_semijoin(ds, dups_ds, window, text_col, id_col)
        dup_tables.append(t)
    # View FIRST, then sort — int64 order differs from uint64 order for
    # hashes with the top bit set, and searchsorted needs uint64 order.
    dup_sorted = np.sort(
        np.concatenate(
            [t["h"].to_numpy(zero_copy_only=False) for t in dup_tables]
        ).view(np.uint64)
        if dup_tables
        else np.empty(0, dtype=np.uint64)
    )
    dup_ref = ray.put(dup_sorted)

    def per_doc(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        ids, totals, dups = [], [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            h = window_hashes(t or "", window)
            if len(h) == 0:
                continue
            if len(dup):
                idx = np.searchsorted(dup, h)
                hit = (idx < len(dup)) & (dup[np.minimum(idx, len(dup) - 1)] == h)
                n_dup = int(hit.sum())
            else:
                n_dup = 0
            ids.append(i)
            totals.append(len(h))
            dups.append(n_dup)
        return pa.Table.from_arrays(
            [
                pa.array(ids, batch[id_col].type),
                pa.array(totals, pa.int64()),
                pa.array(dups, pa.int64()),
            ],
            names=[id_col, "total_windows", "dup_windows"],
        )

    return ds.map_batches(per_doc, batch_format="pyarrow")


def _dup_counts_semijoin(ds, dups_ds, window: int, text_col: str, id_col: str):
    """The over-``dup_cap`` regime of :func:`duplicate_window_counts`:
    exact same output, no driver-resident dup set.

    Per-block partials emit one ``(h, id, cnt)`` row per (document,
    distinct window hash); a :func:`..segments.attach_lookup` existence
    SEMI-join against the (materialized) duplicated-hash table keeps only
    duplicated positions — keyed on the SAME hash the counting groupby
    already exchanged on. Per-doc totals need no hash data at all
    (#windows = #codepoints − window + 1), so they ride as zero-filled
    rows into one final ``groupby(id).sum`` that folds both message
    kinds. Everything is a Dataset; the driver holds nothing."""
    from ray.data.aggregate import Sum

    from .segments import attach_lookup

    def doc_hash_partial(batch: pa.Table) -> pa.Table:
        hs, ids, cnts = [], [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            h = window_hashes(t or "", window)
            if len(h) == 0:
                continue
            u, c = np.unique(h, return_counts=True)
            hs.append(u)
            ids.extend([i] * len(u))
            cnts.append(c)
        id_type = batch.schema.field(id_col).type
        if not hs:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.int64()),
                    pa.array([], id_type),
                    pa.array([], pa.int64()),
                ],
                names=["h", id_col, "cnt"],
            )
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(hs).view(np.int64)),
                pa.array(ids, id_type),
                pa.array(np.concatenate(cnts).astype(np.int64)),
            ],
            names=["h", id_col, "cnt"],
        )

    dup_hits = attach_lookup(
        ds.map_batches(doc_hash_partial, batch_format="pyarrow"),
        dups_ds,
        key_col="h",
        val_cols=[],
        carry_cols=[id_col, "cnt"],
    )

    def hit_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                t[id_col],
                pa.array(np.zeros(n, np.int64)),
                t["cnt"].combine_chunks().cast(pa.int64()),
            ],
            names=[id_col, "tw", "dw"],
        )

    def total_rows(batch: pa.Table) -> pa.Table:
        ids, totals = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            n_win = len(t or "") - window + 1
            if n_win > 0:
                ids.append(i)
                totals.append(n_win)
        return pa.Table.from_arrays(
            [
                pa.array(ids, batch.schema.field(id_col).type),
                pa.array(totals, pa.int64()),
                pa.array(np.zeros(len(ids), np.int64)),
            ],
            names=[id_col, "tw", "dw"],
        )

    totals = ds.map_batches(total_rows, batch_format="pyarrow")
    out = (
        totals.union(dup_hits.map_batches(hit_rows, batch_format="pyarrow"))
        .groupby(id_col)
        .aggregate(
            Sum("tw", alias_name="total_windows"),
            Sum("dw", alias_name="dup_windows"),
        )
    )
    return out.map_batches(
        lambda t: t.select([id_col, "total_windows", "dup_windows"]),
        batch_format="pyarrow",
    )


def remove_dup_substrings(
    ds,
    window: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_cap: int = 2_000_000,
):
    """The REMOVAL step of Lee et al.'s ExactSubstr dedup: delete every
    character covered by a ``window``-char substring that occurs ≥2 times
    in the corpus (boilerplate, licenses, quoted passages vanish from
    every document, unique prose survives). → ``(id, cleaned_text,
    n_chars, n_removed)``; docs shorter than ``window`` pass through
    untouched.

    Same two-pass shape as :func:`duplicate_window_counts`: the
    duplicated-hash set comes from the one honest ``groupby(hash)``
    exchange and broadcasts under ``dup_cap``; the removal pass is
    per-document (position hits → coverage-diff char mask → rebuild).
    Above ``dup_cap`` the membership test switches to the hash-partitioned
    positions semi-join (doc, pos, hash) — see the over-cap regime below,
    equivalence-tested with a lowered cap against the broadcast path."""
    import ray
    from ray.data.aggregate import Sum

    def hash_count_partial(batch: pa.Table) -> pa.Table:
        hs = [window_hashes(t or "", window) for t in batch[text_col].to_pylist()]
        allh = np.concatenate(hs) if hs else np.empty(0, dtype=np.uint64)
        u, c = np.unique(allh, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.view(np.int64), pa.int64()), pa.array(c, pa.int64())],
            names=["h", "cnt"],
        )

    def dups_only(tbl: pa.Table) -> pa.Table:
        mask = np.asarray(tbl["sum(cnt)"].to_numpy(zero_copy_only=False)) >= 2
        return tbl.select(["h"]).filter(pa.array(mask))

    dups_ds = (
        ds.map_batches(hash_count_partial, batch_format="pyarrow", batch_size=None)
        .groupby("h")
        .aggregate(Sum("cnt"))
        .map_batches(dups_only, batch_format="pyarrow", batch_size=None)
    )
    chunks = []
    n_dups = 0
    over = False
    for batch in dups_ds.iter_batches(batch_format="pyarrow"):
        n_dups += batch.num_rows
        if n_dups > dup_cap:
            over = True
            break
        chunks.append(
            np.asarray(batch["h"].to_numpy(zero_copy_only=False)).view(np.uint64)
        )
    if over:
        return _remove_dups_semijoin(ds, dups_ds, window, text_col, id_col)
    dup_arr = (
        np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.uint64)
    )
    dref = ray.put(dup_arr)

    def clean(batch: pa.Table) -> pa.Table:
        dups = ray.get(dref)
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_t, out_n, out_r = [], [], []
        for t in texts:
            t = t or ""
            cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            n = len(cps)
            hs = window_hashes(t, window)
            if not len(hs) or not len(dups):
                out_t.append(t)
                out_n.append(n)
                out_r.append(0)
                continue
            hits = np.flatnonzero(np.isin(hs, dups))
            if not len(hits):
                out_t.append(t)
                out_n.append(n)
                out_r.append(0)
                continue
            cover = np.zeros(n + 1, np.int64)
            np.add.at(cover, hits, 1)
            np.add.at(cover, np.minimum(hits + window, n), -1)
            covered = np.cumsum(cover[:-1]) > 0
            kept = cps[~covered]
            out_t.append(kept.tobytes().decode("utf-32-le"))
            out_n.append(n)
            out_r.append(int(covered.sum()))
        return pa.Table.from_arrays(
            [
                pa.array(ids, batch.schema.field(id_col).type),
                pa.array(out_t, pa.string()),
                pa.array(out_n, pa.int64()),
                pa.array(out_r, pa.int64()),
            ],
            names=[id_col, "cleaned_text", "n_chars", "n_removed"],
        )

    return ds.map_batches(clean, batch_format="pyarrow")


def _remove_dups_semijoin(ds, dups_ds, window: int, text_col: str, id_col: str):
    """Over-``dup_cap`` regime of :func:`remove_dup_substrings`: nothing
    dup-set-sized on the driver. Three honest exchanges, all keyed on
    columns the counting pass already shuffles:

    1. every window emits a ``(h, id, pos)`` row (the corpus-sized
       position stream — same order of bytes as the counting exchange);
    2. positions semi-join the duplicated-hash table on ``h``
       (:func:`..segments.attach_lookup`), leaving only the duplicated
       MINORITY of positions;
    3. per-doc position lists rebuild via one (id) sort and attach back
       onto the corpus stream (matched docs strip, unmatched docs pass
       through an anti-join side untouched).
    """
    from .segments import attach_lookup, sorted_segment_apply

    dups_tbl = dups_ds.materialize()  # consumed once; keyed table side

    def positions(batch: pa.Table) -> pa.Table:
        ids_out, hs_out, pos_out = [], [], []
        for i, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            hs = window_hashes(t or "", window)
            if not len(hs):
                continue
            ids_out.append(np.full(len(hs), i, dtype=np.int64))
            hs_out.append(hs.view(np.int64))
            pos_out.append(np.arange(len(hs), dtype=np.int64))
        if not ids_out:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 3, names=["h", id_col, "pos"]
            )
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(hs_out)),
                pa.array(np.concatenate(ids_out)),
                pa.array(np.concatenate(pos_out)),
            ],
            names=["h", id_col, "pos"],
        )

    dup_pos = attach_lookup(
        ds.map_batches(positions, batch_format="pyarrow"),
        dups_tbl,
        key_col="h",
        val_cols=[],
        carry_cols=[id_col, "pos"],
    )

    def pos_lists(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        names = [id_col, "poslist"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()),
                 pa.array([], pa.list_(pa.int64()))],
                names=names,
            )
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pos = batch["pos"].to_numpy(zero_copy_only=False)
        lists = [pos[s:e].tolist() for s, e in zip(starts, ends)]
        return pa.Table.from_arrays(
            [
                pa.array(ids[starts]),
                pa.array(lists, pa.list_(pa.int64())),
            ],
            names=names,
        )

    posagg = sorted_segment_apply(
        dup_pos, key_col=id_col, block_fn=pos_lists, within_cols=["pos"]
    ).materialize()  # O(docs with dups) rows; table side of two joins

    def strip(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        plists = batch["poslist"].to_pylist()
        out_t, out_n, out_r = [], [], []
        for t, pl in zip(texts, plists):
            t = t or ""
            cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            n = len(cps)
            hits = np.asarray(pl, dtype=np.int64)
            cover = np.zeros(n + 1, np.int64)
            np.add.at(cover, hits, 1)
            np.add.at(cover, np.minimum(hits + window, n), -1)
            covered = np.cumsum(cover[:-1]) > 0
            kept = cps[~covered]
            out_t.append(kept.tobytes().decode("utf-32-le"))
            out_n.append(n)
            out_r.append(int(covered.sum()))
        return pa.Table.from_arrays(
            [
                pa.array(ids, batch.schema.field(id_col).type),
                pa.array(out_t, pa.string()),
                pa.array(out_n, pa.int64()),
                pa.array(out_r, pa.int64()),
            ],
            names=[id_col, "cleaned_text", "n_chars", "n_removed"],
        )

    def untouched(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = batch[text_col].combine_chunks()
        texts = pc.fill_null(texts, "")
        return pa.Table.from_arrays(
            [
                batch[id_col].combine_chunks(),
                texts,
                pc.utf8_length(texts).cast(pa.int64()),
                pa.array(np.zeros(batch.num_rows, np.int64)),
            ],
            names=[id_col, "cleaned_text", "n_chars", "n_removed"],
        )

    with_dups = attach_lookup(
        ds,
        posagg,
        key_col=id_col,
        val_cols=["poslist"],
        carry_cols=[text_col],
    ).map_batches(strip, batch_format="pyarrow")
    clean = attach_lookup(
        ds,
        posagg,
        key_col=id_col,
        val_cols=[],
        carry_cols=[text_col],
        anti=True,
    ).map_batches(untouched, batch_format="pyarrow")
    return with_dups.union(clean)


def _sam_stats(s: str) -> tuple[int, int]:
    """Suffix-automaton pass over one string (Blumer et al. 1985 /
    Crochemore; the textbook online construction): returns
    ``(n_distinct_substrings, max_repeated_len)`` in O(len·alphabet).

    - distinct substrings = Σ over states of ``len(v) − len(link(v))``
      (each state's interval of right-extension lengths).
    - max repeated length = the longest substring occurring >= 2 times
      = max ``len(v)`` over states whose endpos-class size >= 2
      (occurrence counts propagate up suffix links from the clone-free
      terminal states).
    """
    # state arrays: transition dicts, suffix link, max length, clone flag
    trans: list[dict[str, int]] = [{}]
    link = [-1]
    length = [0]
    cloned = [False]
    last = 0
    for ch in s:
        cur = len(trans)
        trans.append({})
        link.append(-1)
        length.append(length[last] + 1)
        cloned.append(False)
        p = last
        while p != -1 and ch not in trans[p]:
            trans[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = trans[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = len(trans)
                trans.append(dict(trans[q]))
                link.append(link[q])
                length.append(length[p] + 1)
                cloned.append(True)
                while p != -1 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    n_states = len(trans)
    n_distinct = sum(
        length[v] - length[link[v]] for v in range(1, n_states)
    )
    # occurrence counts: 1 per non-clone state, summed up suffix links
    # in order of decreasing length (counting sort by length).
    cnt = [0 if cloned[v] else 1 for v in range(n_states)]
    cnt[0] = 0
    order = sorted(range(1, n_states), key=length.__getitem__, reverse=True)
    for v in order:
        if link[v] > 0:
            cnt[link[v]] += cnt[v]
    max_rep = 0
    for v in range(1, n_states):
        if cnt[v] >= 2 and length[v] > max_rep:
            max_rep = length[v]
    return n_distinct, max_rep


def distinct_substring_census(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 64,
):
    """Per-document substring-complexity census: the number of DISTINCT
    substrings and the longest repeated substring of the first
    ``max_chars`` characters — memorization/compressibility signals
    (a low distinct count or a long internal repeat marks boilerplate
    and template spam; cf. the ExactSubstr dedup family, Lee et al.
    2022). One suffix automaton per document inside ``map_batches`` —
    per-document linear construction, the same per-row compute pattern
    as the extract stage; no exchange at all.

    Returns a Dataset ``(doc_id, n_chars, n_distinct, max_repeat_len)``.
    """

    def census(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        nch, nd, mr = [], [], []
        for t in texts:
            t = (t or "")[:max_chars]
            d, m = _sam_stats(t)
            nch.append(len(t))
            nd.append(d)
            mr.append(m)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(nch, pa.int64()),
                pa.array(nd, pa.int64()),
                pa.array(mr, pa.int64()),
            ],
            names=["doc_id", "n_chars", "n_distinct", "max_repeat_len"],
        )

    return ds.map_batches(census, batch_format="pyarrow")


def _lz_phrases(s: str) -> int:
    """Greedy LZ77 factorization phrase count (Lempel & Ziv 1976;
    sources may start anywhere strictly before the current position,
    overlap with the target allowed): at each position take the longest
    prefix of the remainder that occurs starting earlier, else emit a
    literal. The phrase count is a classic compressibility measure —
    low counts mark templated/repetitive boilerplate.

    Greedy length is monotone (any occurrence of length l contains one
    of length l−1), so the scan extends incrementally; ``str.find``
    gives "first occurrence index < pos ⟺ some source starts before
    pos"."""
    n = len(s)
    pos = 0
    phrases = 0
    while pos < n:
        l = 1
        # extend while the longer prefix still occurs starting earlier
        while pos + l < n and s.find(s[pos : pos + l + 1]) < pos:
            l += 1
        if s.find(s[pos : pos + l]) >= pos:
            l = 1  # literal
        phrases += 1
        pos += l
    return phrases


def lz_census(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 64,
):
    """Per-document LZ77 phrase census of the first ``max_chars``
    characters — the factorization-count compressibility signal that
    complements :func:`distinct_substring_census` (few phrases ⟺ high
    internal redundancy ⟺ boilerplate/template spam). Pure per-row
    ``map_batches`` compute, no exchange.

    Returns a Dataset ``(doc_id, n_chars, n_phrases)``.
    """

    def census(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        nch, nph = [], []
        for t in texts:
            t = (t or "")[:max_chars]
            nch.append(len(t))
            nph.append(_lz_phrases(t))
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(nch, pa.int64()),
                pa.array(nph, pa.int64()),
            ],
            names=["doc_id", "n_chars", "n_phrases"],
        )

    return ds.map_batches(census, batch_format="pyarrow")
