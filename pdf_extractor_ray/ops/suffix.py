"""Distributed suffix-array construction by prefix doubling.

The suffix array is the structure exact-substring deduplication is defined
over (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" — their dedup tool builds one over the concatenated corpus). The
engine's ``ops/substr.py`` answers the fixed-window form of that question
with rolling hashes; this module builds the real thing: a GLOBAL
lexicographic rank for every suffix ``text[pos:]`` of every document,
via the Manber–Myers prefix-doubling recurrence expressed entirely in
Ray Data primitives.

Algorithm (h = 1, 2, 4, ... until ranks are distinct or h ≥ max doc len):

1. rows are ``(skey, rank)`` with ``skey = doc_id * 2^32 + pos`` — rank_h
   equality ⟺ equal ``min(h, |suffix|)``-length prefixes.
2. **Shift**: sorted by ``skey``, each block computes
   ``rank2 = rank[skey + h]`` (the rank of the suffix h positions later,
   0-sentinel when ``pos + h`` falls off the document — the shorter
   suffix, being a strict prefix, must sort first). The lookup needs no
   exchange: a row's successor-at-h lies at most h rows ahead in skey
   order, so a broadcast *halo* of each block's first h rows covers every
   cross-block reference.
3. **Re-rank**: ONE sort by ``(rank, rank2)`` (the honest all-to-all —
   24-byte rows, never text), then a distributed dense rank with the
   engine's standard two-pass prefix scan (per-block partials keyed by
   the block's unique first skey → driver exclusive scan over ~num_blocks
   rows → broadcast offsets; same shape as ``ops/shard.py``).

⌈log2(max doc len)⌉ rounds, each moving only fixed-width integer rows;
the corpus text is touched exactly once (the explode pass reads the first
CODEPOINT per position — numpy utf-32 decode, so ordering matches both
Python and DuckDB's binary UTF-8 collation, which UTF-8 order-preservation
makes identical to codepoint order). At 10^12 documents the per-round
exchange is the published cost of distributed suffix sorting (pDC3 /
prefix-doubling MapReduce formulations); the halo broadcast is
``h × num_blocks`` rows, bounded by max-document-length × blocks, and the
driver only ever sees one partial row per block per round.

No counterpart in the reference repo (no corpus-scale analysis at all);
this extends the dedup tier's fixed-window substring machinery to full
suffix ranking.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_POS_BITS = 32


def _empty(names: list[str]) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([], pa.int64()) for _ in names], names=names
    )


def _prefix_double(ds, text_col: str, id_col: str, keep_tables: bool):
    """Core prefix-doubling loop.

    Returns ``(final, n_total, tables)`` where ``final`` is the rank
    dataset ``(skey, rank)`` (dense ranks, equal for byte-identical
    suffixes), and ``tables`` — when ``keep_tables`` — is the list of
    ``(m, Dataset(skey, rank))`` snapshots with ranks by the first
    ``min(m, len)`` characters, for every power of two ``m`` reached
    (the binary-lifting ladder LCP queries descend). ``final is None``
    with ``n_total == 0`` for an empty corpus.
    """
    import ray

    # --- Explode: one row per suffix, carrying only its FIRST codepoint.
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        keys, cps = [], []
        for d, t in zip(ids, texts):
            if not t:
                continue
            cp = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(np.int64)
            keys.append((int(d) << _POS_BITS) + np.arange(len(cp), dtype=np.int64))
            cps.append(cp)
        if not keys:
            return _empty(["skey", "rank"])
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(keys)), pa.array(np.concatenate(cps))],
            names=["skey", "rank"],
        )

    exploded = (
        ds.select_columns([id_col, text_col])
        .map_batches(explode, batch_format="pyarrow")
        .materialize()
    )
    n_total = exploded.count()
    if n_total == 0:
        return None, 0, []

    # --- Per-block partials: the codepoint alphabet (σ × num_blocks rows
    # to the driver, never the corpus) and the max position (= max doc
    # length − 1, the doubling bound).
    def block_alphabet(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(["cp", "maxpos"])
        u = np.unique(batch["rank"].to_numpy(zero_copy_only=False))
        mp = int(
            (batch["skey"].to_numpy(zero_copy_only=False) & ((1 << _POS_BITS) - 1))
            .max()
        )
        return pa.Table.from_arrays(
            [pa.array(u), pa.array(np.full(len(u), mp))], names=["cp", "maxpos"]
        )

    alpha_rows = exploded.map_batches(
        block_alphabet, batch_format="pyarrow", batch_size=None
    ).take_all()
    alphabet = np.unique(np.array([r["cp"] for r in alpha_rows], dtype=np.int64))
    max_len = max(r["maxpos"] for r in alpha_rows) + 1

    # --- Initial rank: dense rank of the first codepoint (1-based; the
    # 0 sentinel is reserved for "suffix ended").
    def init_rank(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(["skey", "rank"])
        r = np.searchsorted(alphabet, batch["rank"].to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays(
            [batch["skey"], pa.array(r.astype(np.int64) + 1)],
            names=["skey", "rank"],
        )

    cur = exploded.map_batches(init_rank, batch_format="pyarrow")

    # --- Doubling rounds.
    tables: list[tuple[int, object]] = []
    h = 1
    ran = False
    while h < max_len:
        ran = True
        # cur's plan accretes across doubling rounds even through
        # materialize(); sever keeps each round's plan O(1)
        # (see segments.sever_lineage). Sort output stays range-ordered:
        # from_arrow_refs preserves block order.
        from .segments import sever_lineage
        by_key = sever_lineage(cur.sort("skey"))
        if keep_tables:
            tables.append((h, by_key))

        # Halo: the first h rows of every block, broadcast — covers any
        # (skey + h) reference that crosses a block boundary.
        def halo_head(batch: pa.Table, h=h) -> pa.Table:
            return batch.slice(0, min(h, batch.num_rows))

        halo_rows = by_key.map_batches(
            halo_head, batch_format="pyarrow", batch_size=None
        ).take_all()
        hk = np.array([r["skey"] for r in halo_rows], dtype=np.int64)
        hr = np.array([r["rank"] for r in halo_rows], dtype=np.int64)
        ho = np.argsort(hk)
        halo_ref = ray.put((hk[ho], hr[ho]))

        def shift(batch: pa.Table, h=h, halo_ref=halo_ref) -> pa.Table:
            if batch.num_rows == 0:
                return _empty(["skey", "rank", "rank2"])
            hk_s, hr_s = ray.get(halo_ref)
            k = batch["skey"].to_numpy(zero_copy_only=False)
            r = batch["rank"].to_numpy(zero_copy_only=False)
            tgt = k + h
            r2 = np.zeros(len(k), dtype=np.int64)
            # in-block lookup first, then the halo for the block tail
            i = np.searchsorted(k, tgt)
            in_blk = (i < len(k)) & (k[np.minimum(i, len(k) - 1)] == tgt)
            r2[in_blk] = r[i[in_blk]]
            rest = ~in_blk
            if rest.any() and len(hk_s):
                j = np.searchsorted(hk_s, tgt[rest])
                hit = (j < len(hk_s)) & (
                    hk_s[np.minimum(j, len(hk_s) - 1)] == tgt[rest]
                )
                sub = r2[rest]
                sub[hit] = hr_s[j[hit]]
                r2[rest] = sub
            return pa.Table.from_arrays(
                [pa.array(k), pa.array(r), pa.array(r2)],
                names=["skey", "rank", "rank2"],
            )

        paired = by_key.map_batches(shift, batch_format="pyarrow", batch_size=None)

        cur, n_distinct = _dense_rank_pairs(paired, n_total)
        h *= 2
        if n_distinct == n_total:
            break

    if keep_tables:
        if ran:
            tables.append((h, cur))
        else:  # every doc has length ≤ 1: the initial ranks are final
            cur = cur.materialize()
            tables.append((1, cur))
    return cur, n_total, tables


def suffix_ranks(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Global suffix ranks over every ``(doc, pos)`` suffix in ``ds``.

    Returns a Dataset with columns ``(doc_id, pos, srank)`` where
    ``srank`` is the 1-based global row number of suffix ``text[pos:]``
    under lexicographic codepoint order, ties (byte-identical suffixes
    across documents) broken by ``(doc_id, pos)`` — exactly
    ``row_number() OVER (ORDER BY suffix, doc_id, pos)``.
    """
    import ray

    cur, n_total, _ = _prefix_double(ds, text_col, id_col, keep_tables=False)
    if n_total == 0:
        return ray.data.from_arrow(_empty([id_col, "pos", "srank"]))

    # --- Final row number: sort by (rank, skey) — skey IS (doc, pos), so
    # the tiebreak matches `ORDER BY suffix, doc_id, pos` — then assign
    # global sequential indices with the same two-pass prefix scan.
    final = cur.sort(["rank", "skey"]).materialize()

    def block_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(["first_skey", "f_r", "nrows"])
        return pa.Table.from_arrays(
            [
                pa.array([batch["skey"][0].as_py()], pa.int64()),
                pa.array([batch["rank"][0].as_py()], pa.int64()),
                pa.array([batch.num_rows], pa.int64()),
            ],
            names=["first_skey", "f_r", "nrows"],
        )

    partials = final.map_batches(
        block_counts, batch_format="pyarrow", batch_size=None
    ).take_all()
    partials.sort(key=lambda r: (r["f_r"], r["first_skey"]))
    offsets, running = {}, 0
    for r in partials:
        offsets[r["first_skey"]] = running
        running += r["nrows"]

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty([id_col, "pos", "srank"])
        k = batch["skey"].to_numpy(zero_copy_only=False)
        base = offsets[int(k[0])]
        sr = base + np.arange(1, len(k) + 1, dtype=np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(k >> _POS_BITS),
                pa.array(k & ((1 << _POS_BITS) - 1)),
                pa.array(sr),
            ],
            names=[id_col, "pos", "srank"],
        )

    return final.map_batches(assign, batch_format="pyarrow", batch_size=None)


def _dense_rank_pairs(paired, n_total: int):
    """Distributed dense rank of ``(rank, rank2)`` pairs.

    One sort (the round's honest exchange), then the two-pass prefix
    scan: per-block partials — first/last pair, internal new-pair count,
    and the block's unique first ``skey`` as its identity — an exclusive
    driver scan over ~num_blocks rows, and a broadcast-offset second
    pass. Returns ``(Dataset(skey, rank), n_distinct)``; equal pairs keep
    equal ranks, which is what lets the next doubling round compare
    2h-prefixes through them.
    """
    by_pair = paired.sort(["rank", "rank2"]).materialize()

    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(["first_skey", "f_r", "f_r2", "l_r", "l_r2", "new_in"])
        r = batch["rank"].to_numpy(zero_copy_only=False)
        r2 = batch["rank2"].to_numpy(zero_copy_only=False)
        new_in = int(((r[1:] != r[:-1]) | (r2[1:] != r2[:-1])).sum())
        return pa.Table.from_arrays(
            [
                pa.array([batch["skey"][0].as_py()], pa.int64()),
                pa.array([int(r[0])], pa.int64()),
                pa.array([int(r2[0])], pa.int64()),
                pa.array([int(r[-1])], pa.int64()),
                pa.array([int(r2[-1])], pa.int64()),
                pa.array([new_in], pa.int64()),
            ],
            names=["first_skey", "f_r", "f_r2", "l_r", "l_r2", "new_in"],
        )

    partials = by_pair.map_batches(
        block_partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    # Order blocks by their pair range; blocks interchangeable under this
    # key are all-ties and contribute identically to the scan.
    partials.sort(key=lambda r: (r["f_r"], r["f_r2"], r["l_r"], r["l_r2"]))
    offsets: dict[int, tuple[int, bool]] = {}
    running = 0
    prev_last: tuple[int, int] | None = None
    for r in partials:
        first_new = (r["f_r"], r["f_r2"]) != prev_last
        offsets[r["first_skey"]] = (running, first_new)
        running += r["new_in"] + int(first_new)
        prev_last = (r["l_r"], r["l_r2"])
    n_distinct = running

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(["skey", "rank"])
        k = batch["skey"].to_numpy(zero_copy_only=False)
        r = batch["rank"].to_numpy(zero_copy_only=False)
        r2 = batch["rank2"].to_numpy(zero_copy_only=False)
        base, first_new = offsets[int(k[0])]
        new = np.empty(len(k), dtype=np.int64)
        new[0] = int(first_new)
        if len(k) > 1:
            new[1:] = (r[1:] != r[:-1]) | (r2[1:] != r2[:-1])
        return pa.Table.from_arrays(
            [pa.array(k), pa.array(base + np.cumsum(new))],
            names=["skey", "rank"],
        )

    out = by_pair.map_batches(
        assign, batch_format="pyarrow", batch_size=None
    ).materialize()
    return out, n_distinct


def longest_repeats(
    ds,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Top-``k`` longest repeated substrings in the corpus.

    The longest substring occurring ≥ 2 times (anywhere, overlaps and
    cross-document occurrences included) is the maximum LCP between
    suffixes ADJACENT in suffix-array order — so this computes the LCP of
    every adjacent pair and returns the ``k`` largest, with both
    occurrences' coordinates. Returns a pa.Table
    ``(lcp, doc_id, pos, doc_id2, pos2)`` ordered by
    ``(lcp DESC, doc_id, pos)``.

    LCP is computed by **binary lifting over the doubling ladder** the
    suffix sort already built: descend m = H, H/2, ..., 1; at each level,
    look both suffixes up at offset ``l`` in the rank-by-first-
    ``min(m, len)``-chars table ``T_m`` and advance ``l += m`` on rank
    equality. Each lookup is ONE :func:`..segments.attach_lookup` sorted
    exchange over 24-byte rows — the engine's join (chosen over
    ``Dataset.join`` for the same empty-partition-schema reason that
    function documents). Document lengths attach to the pair rows ONCE
    up front (two more sorted lookups), so out-of-range offsets are
    detected locally — the lookup key is clamped to the always-present
    suffix head and the advance masked — and no broadcast or size gate
    is needed at any corpus scale. Rank equality where a suffix is
    shorter than ``m`` implies the two tails are byte-identical, so the
    final exact LCP is ``min(l, rem_a, rem_b)``. Keeping the ladder
    costs ⌈log₂ max-doc-len⌉ × corpus-positions rows in the object
    store: the documented trade for an exchange-parallel LCP (Kasai\'s
    O(n) scan is inherently sequential).
    """
    import ray

    from .segments import attach_lookup

    cur, n_total, tables = _prefix_double(ds, text_col, id_col, keep_tables=True)
    out_names = ["lcp", id_col, "pos", id_col + "2", "pos2"]
    if n_total < 2:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()) for _ in out_names], names=out_names
        )

    final = cur.sort(["rank", "skey"]).materialize()

    # --- Adjacent pairs: block-internal pairs + driver-stitched block
    # boundaries (one (first, last) row per block).
    def internal_pairs(batch: pa.Table) -> pa.Table:
        keys = batch["skey"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(keys[:-1]), pa.array(keys[1:])], names=["a", "b"]
        )

    def block_edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(["f_r", "first_skey", "last_skey"])
        return pa.Table.from_arrays(
            [
                pa.array([batch["rank"][0].as_py()], pa.int64()),
                pa.array([batch["skey"][0].as_py()], pa.int64()),
                pa.array([batch["skey"][-1].as_py()], pa.int64()),
            ],
            names=["f_r", "first_skey", "last_skey"],
        )

    edges = final.map_batches(
        block_edges, batch_format="pyarrow", batch_size=None
    ).take_all()
    edges.sort(key=lambda r: (r["f_r"], r["first_skey"]))
    ba = [e1["last_skey"] for e1 in edges[:-1]]
    bb = [e2["first_skey"] for e2 in edges[1:]]
    boundary = pa.Table.from_arrays(
        [pa.array(ba, pa.int64()), pa.array(bb, pa.int64())], names=["a", "b"]
    )
    mask = (1 << _POS_BITS) - 1

    def with_doc_a(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        return batch.append_column("da", pa.array(a >> _POS_BITS))

    def with_doc_b(batch: pa.Table) -> pa.Table:
        b = batch["b"].to_numpy(zero_copy_only=False)
        return batch.append_column("db", pa.array(b >> _POS_BITS))

    raw_pairs = final.map_batches(
        internal_pairs, batch_format="pyarrow", batch_size=None
    ).union(ray.data.from_arrow(boundary))

    # --- Attach both documents\' lengths to each pair row ONCE (sorted
    # lookups against the doc-length table) — rem is then a local
    # computation at every level and at the final cap, with no broadcast
    # gate or over-cap regime to maintain.
    lens_ds = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b[id_col].combine_chunks().cast(pa.int64()),
                pa.array(
                    [len(t) if t else 0 for t in b[text_col].to_pylist()],
                    pa.int64(),
                ),
            ],
            names=["da", "len_a"],
        ),
        batch_format="pyarrow",
    ).materialize()

    def relabel_b(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["db", "len_b"])

    pairs = attach_lookup(
        raw_pairs.map_batches(with_doc_a, batch_format="pyarrow"),
        lens_ds,
        key_col="da",
        val_cols=["len_a"],
        carry_cols=["a", "b"],
    )
    pairs = attach_lookup(
        pairs.map_batches(with_doc_b, batch_format="pyarrow"),
        lens_ds.map_batches(relabel_b, batch_format="pyarrow"),
        key_col="db",
        val_cols=["len_b"],
        carry_cols=["a", "b", "len_a"],
    )
    pairs = pairs.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b["a"],
                b["b"],
                b["len_a"],
                b["len_b"],
                pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            ],
            names=["a", "b", "len_a", "len_b", "l"],
        ),
        batch_format="pyarrow",
    ).materialize()

    # --- Binary-lifting descent over the ladder, largest level first.
    for m, tbl in sorted(tables, key=lambda t: -t[0]):

        def add_keys(batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            l = batch["l"].to_numpy(zero_copy_only=False)
            la = batch["len_a"].to_numpy(zero_copy_only=False)
            lb = batch["len_b"].to_numpy(zero_copy_only=False)
            # Clamp out-of-range offsets to the (always present) suffix
            # head; the advance step re-derives validity from the
            # lengths, so the clamped lookup result is ignored.
            va = l < la - (a & mask)
            vb = l < lb - (b & mask)
            return pa.Table.from_arrays(
                [
                    batch["a"],
                    batch["b"],
                    batch["l"],
                    batch["len_a"],
                    batch["len_b"],
                    pa.array(np.where(va, a + l, a)),
                    pa.array(np.where(vb, b + l, b)),
                ],
                names=["a", "b", "l", "len_a", "len_b", "ka", "kb"],
            )

        def as_lookup(cols):
            def f(batch: pa.Table) -> pa.Table:
                return batch.rename_columns(cols)

            return f

        looked = attach_lookup(
            pairs.map_batches(add_keys, batch_format="pyarrow"),
            tbl.map_batches(as_lookup(["ka", "ra"]), batch_format="pyarrow"),
            key_col="ka",
            val_cols=["ra"],
            carry_cols=["a", "b", "l", "len_a", "len_b", "kb"],
        )
        looked = attach_lookup(
            looked,
            tbl.map_batches(as_lookup(["kb", "rb"]), batch_format="pyarrow"),
            key_col="kb",
            val_cols=["rb"],
            carry_cols=["a", "b", "l", "len_a", "len_b", "ra"],
        )

        def advance(batch: pa.Table, m=m) -> pa.Table:
            if batch.num_rows == 0:
                return pa.Table.from_arrays(
                    [pa.array([], pa.int64()) for _ in range(5)],
                    names=["a", "b", "len_a", "len_b", "l"],
                )
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            la = batch["len_a"].to_numpy(zero_copy_only=False)
            lb = batch["len_b"].to_numpy(zero_copy_only=False)
            ra = batch["ra"].to_numpy(zero_copy_only=False)
            rb = batch["rb"].to_numpy(zero_copy_only=False)
            l = batch["l"].to_numpy(zero_copy_only=False).copy()
            eq = (l < la - (a & mask)) & (l < lb - (b & mask)) & (ra == rb)
            l[eq] += m
            return pa.Table.from_arrays(
                [batch["a"], batch["b"], batch["len_a"], batch["len_b"], pa.array(l)],
                names=["a", "b", "len_a", "len_b", "l"],
            )

        # One barrier per level keeps exactly one sorted exchange pair
        # live at a time (a fully lazy ladder oversubscribes the
        # executor with every level\'s sorts at once).
        pairs = looked.map_batches(advance, batch_format="pyarrow").materialize()

    # --- Exact LCP: cap by both suffixes\' remaining lengths.
    def cap(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(["a", "b", "lcp"])
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        l = batch["l"].to_numpy(zero_copy_only=False)
        rem_a = batch["len_a"].to_numpy(zero_copy_only=False) - (a & mask)
        rem_b = batch["len_b"].to_numpy(zero_copy_only=False) - (b & mask)
        return pa.Table.from_arrays(
            [
                batch["a"],
                batch["b"],
                pa.array(np.minimum(l, np.minimum(rem_a, rem_b))),
            ],
            names=["a", "b", "lcp"],
        )

    capped = pairs.map_batches(cap, batch_format="pyarrow")

    # --- Global top-k: per-block partials, tiny driver merge.
    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(["a", "b", "lcp"])
        a = batch["a"].to_numpy(zero_copy_only=False)
        lcp = batch["lcp"].to_numpy(zero_copy_only=False)
        order = np.lexsort((a, -lcp))[:k]
        return batch.take(pa.array(np.sort(order)))

    rows = capped.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=None
    ).take_all()
    rows.sort(key=lambda r: (-r["lcp"], r["a"] >> _POS_BITS, r["a"] & mask))
    rows = rows[:k]
    return pa.Table.from_arrays(
        [
            pa.array([r["lcp"] for r in rows], pa.int64()),
            pa.array([r["a"] >> _POS_BITS for r in rows], pa.int64()),
            pa.array([r["a"] & mask for r in rows], pa.int64()),
            pa.array([r["b"] >> _POS_BITS for r in rows], pa.int64()),
            pa.array([r["b"] & mask for r in rows], pa.int64()),
        ],
        names=out_names,
    )
