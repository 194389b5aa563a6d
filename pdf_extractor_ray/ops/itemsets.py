"""Frequent-itemset mining over documents (A-Priori, pass 1 + pass 2).

The classic two-pass MapReduce workload (Agrawal & Srikant 1994; the
SON/"Savasere" partition trick is what per-block pre-combining amounts
to): pass 1 finds frequent ITEMS (tokens contained in >= ``support``
documents), pass 2 counts candidate PAIRS restricted to frequent items —
the A-Priori pruning that keeps the quadratic pair space tractable.
Distinct from PMI bigrams (``ops/text.py``): itemset support counts
DOCUMENT co-membership anywhere in the doc, not token adjacency, and
ranks by raw support, not association strength.

Exchange shape: pass 1 is the word_topk regime (per-block distinct-doc
counts pre-combine, one vocabulary-sized groupby); the frequent-item set
is collected under ``frequent_cap`` and broadcast (``ray.put``). ABOVE
the cap (round 5) the frequent set never lands on the driver: per-doc
``(text-hash, token)`` rows semi-join against the distributed frequent
table (:func:`..ops.segments.attach_lookup`), one
:func:`..ops.segments.sorted_segment_apply` on the doc hash reassembles
each document's frequent tokens and emits its pairs (duplicate texts
collapse to one segment whose per-token row count IS the multiplicity),
and rule statistics attach ante/cons counts by two more sorted-lookup
exchanges — nothing frequent-set- or corpus-sized on the driver; both
regimes are bit-identical (forced-cap equality tests). Pass 2 emits
per-block pre-combined (t1, t2) pair counts over frequent items only,
one pair-vocabulary groupby, per-block partial top-k. Per-doc pair
emission is O(frequent items in the doc)² — the A-Priori contract:
``support`` is the knob that bounds it.

No counterpart in the reference repo (its aggregation surface is
validation-report rollups, SURVEY G3); this extends the engine's corpus
association tier (pmi_bigrams, cocitation) with the support-threshold
family. Tokenization is THE corpus tokenization (``split_words``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import split_words


def _doc_texts(batch: pa.Table, text_col: str) -> pa.ChunkedArray:
    """Null-safe text column (all-None blocks type as null)."""
    col = batch[text_col]
    if pa.types.is_null(col.type):
        col = pa.nulls(len(col), pa.string())
    return pc.fill_null(col, "")


def _pair_totals_semijoin(ds, freq_ds, text_col: str):
    """Over-``frequent_cap`` pair-count regime: the frequent-item table
    stays a Dataset. Per-doc distinct ``(sha1(text), token)`` rows
    semi-join against it (one sorted-lookup exchange), then ONE
    ``sorted_segment_apply`` on the doc hash reassembles each document's
    surviving tokens and emits its token pairs. Duplicate texts share a
    hash, so a segment holds every distinct frequent token exactly
    ``multiplicity`` times — the pair count per segment is that
    multiplicity, no separate doc-count table needed. Returns the same
    ``(pair, sum(cnt))`` Dataset the broadcast regime's groupby yields."""
    import hashlib

    from ray.data.aggregate import Sum

    from .segments import attach_lookup, sorted_segment_apply

    def doc_token_rows(batch: pa.Table) -> pa.Table:
        per_doc = _distinct_doc_tokens(batch, text_col)
        texts = _doc_texts(batch, text_col).to_pylist()
        hs: list = []
        toks: list = []
        for txt, td in zip(texts, per_doc):
            if len(td) == 0:
                continue
            h = hashlib.sha1(txt.encode()).hexdigest()
            hs.extend([h] * len(td))
            toks.extend(td.tolist())
        return pa.Table.from_arrays(
            [pa.array(hs, pa.string()), pa.array(toks, pa.string())],
            names=["h", "token"],
        )

    rows = ds.map_batches(doc_token_rows, batch_format="pyarrow")
    kept = attach_lookup(
        rows, freq_ds, key_col="token", val_cols=[], carry_cols=["h"]
    )

    def pairs_block(
        batch: pa.Table, starts: np.ndarray, ends: np.ndarray
    ) -> pa.Table:
        toks = np.asarray(batch["token"].to_pylist(), dtype=object)
        outp: list = []
        outc: list = []
        for s, e in zip(starts, ends):
            u, c = np.unique(toks[s:e].astype(str), return_counts=True)
            if len(u) < 2:
                continue
            m = int(c[0])  # uniform: dup texts repeat the whole token set
            ia, ib = np.triu_indices(len(u), 1)
            outp.append(np.char.add(np.char.add(u[ia], " "), u[ib]))
            outc.append(np.full(len(ia), m, np.int64))
        if not outp:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["pair", "cnt"],
            )
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(outp).astype(object), pa.string()),
                pa.array(np.concatenate(outc)),
            ],
            names=["pair", "cnt"],
        )

    pairs = sorted_segment_apply(
        kept, key_col="h", block_fn=pairs_block, within_cols=["token"]
    )
    return pairs.groupby("pair").aggregate(Sum("cnt"))


_I64_MAX = np.iinfo(np.int64).max


def _rules_semijoin(
    ds, freq_cnt_ds, support, min_conf_milli, n_docs, text_col, empty
):
    """Over-``frequent_cap`` association-rule regime: pair totals from
    :func:`_pair_totals_semijoin`, then each direction's antecedent /
    consequent doc-counts attach from the distributed frequent table via
    two sorted-lookup exchanges; confidence and lift compute vectorized
    with the big-int overflow guard (exact fallback). Bit-identical to
    the broadcast path (forced-cap equality test)."""
    from .segments import attach_lookup

    pair_totals = _pair_totals_semijoin(ds, freq_cnt_ds, text_col)

    def split_dirs(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.greater_equal(batch["sum(cnt)"], support))
        p = np.asarray(keep["pair"].to_pylist(), dtype=object).astype(str)
        n_ab = keep["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(p):
            parts = np.char.partition(p, " ")
            t1 = parts[:, 0].astype(object)
            t2 = parts[:, 2].astype(object)
        else:
            t1 = t2 = np.array([], dtype=object)
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate([t1, t2]), pa.string()),
                pa.array(np.concatenate([t2, t1]), pa.string()),
                pa.array(np.concatenate([n_ab, n_ab]), pa.int64()),
            ],
            names=["antecedent", "consequent", "pair_cnt"],
        )

    dirs = pair_totals.map_batches(split_dirs, batch_format="pyarrow")
    ante_tab = freq_cnt_ds.map_batches(
        lambda t: t.rename_columns(["antecedent", "ante_cnt"]),
        batch_format="pyarrow",
    )
    cons_tab = freq_cnt_ds.map_batches(
        lambda t: t.rename_columns(["consequent", "cons_cnt"]),
        batch_format="pyarrow",
    )
    withs = attach_lookup(
        dirs, ante_tab, key_col="antecedent",
        val_cols=["ante_cnt"], carry_cols=["consequent", "pair_cnt"],
    )
    full = attach_lookup(
        withs, cons_tab, key_col="consequent",
        val_cols=["cons_cnt"],
        carry_cols=["antecedent", "pair_cnt", "ante_cnt"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        n_ab = batch["pair_cnt"].to_numpy(zero_copy_only=False)
        ca = batch["ante_cnt"].to_numpy(zero_copy_only=False)
        cc = batch["cons_cnt"].to_numpy(zero_copy_only=False)
        n = len(n_ab)
        if n and (
            1000 * int(n_ab.max()) * n_docs <= _I64_MAX
            and int(ca.max()) * int(cc.max()) <= _I64_MAX
        ):
            conf = 1000 * n_ab // ca
            lift = 1000 * n_ab * n_docs // (ca * cc)
        else:  # exact big-int fallback (lift numerator past int64)
            conf = np.fromiter(
                ((1000 * int(x)) // int(a) for x, a in zip(n_ab, ca)),
                np.int64, n,
            )
            lift = np.fromiter(
                (
                    (1000 * int(x) * n_docs) // (int(a) * int(c))
                    for x, a, c in zip(n_ab, ca, cc)
                ),
                np.int64, n,
            )
        keep = conf >= min_conf_milli
        idx = np.flatnonzero(keep)
        sel = batch.take(pa.array(idx, pa.int64()))
        return pa.Table.from_arrays(
            [
                sel["antecedent"].combine_chunks(),
                sel["consequent"].combine_chunks(),
                sel["pair_cnt"].combine_chunks().cast(pa.int64()),
                sel["ante_cnt"].combine_chunks().cast(pa.int64()),
                sel["cons_cnt"].combine_chunks().cast(pa.int64()),
                pa.array(conf[idx], pa.int64()),
                pa.array(lift[idx], pa.int64()),
            ],
            names=[
                "antecedent", "consequent", "pair_cnt", "ante_cnt",
                "cons_cnt", "conf_milli", "lift_milli",
            ],
        )

    df = full.map_batches(finish, batch_format="pyarrow").to_pandas()
    if df.empty:
        return empty
    return df.sort_values(["antecedent", "consequent"]).reset_index(drop=True)


def _distinct_doc_tokens(batch: pa.Table, text_col: str):
    """Per-document sorted-unique token arrays for one block."""
    texts = _doc_texts(batch, text_col)
    words_list = split_words(texts)
    out = []
    for i in range(len(batch)):
        w = words_list[i].as_py()
        toks = np.unique(np.asarray([x for x in w if x], dtype=object))
        out.append(toks)
    return out


def frequent_pairs(
    ds,
    support: int = 10,
    k: int = 20,
    text_col: str = "text",
    frequent_cap: int = 1_000_000,
):
    """Top-``k`` frequent token pairs: pairs of tokens co-occurring in at
    least ``support`` documents, ranked by (support desc, t1, t2). Above
    ``frequent_cap`` frequent items the broadcast swaps for the
    distributed semi-join regime (:func:`_pair_totals_semijoin`) — same
    result, nothing frequent-set-sized on the driver. Returns a pandas
    DataFrame ``(t1, t2, cnt, rank)``."""
    import ray
    from ray.data.aggregate import Sum

    def item_partial(batch: pa.Table) -> pa.Table:
        per_doc = _distinct_doc_tokens(batch, text_col)
        if per_doc:
            flat = np.concatenate([t for t in per_doc if len(t)] or
                                  [np.array([], object)])
        else:
            flat = np.array([], object)
        if len(flat) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["token", "cnt"],
            )
        u, c = np.unique(flat.astype(str), return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(object), pa.string()),
             pa.array(c.astype(np.int64))],
            names=["token", "cnt"],
        )

    items = (
        ds.map_batches(item_partial, batch_format="pyarrow", batch_size=None)
        .groupby("token")
        .aggregate(Sum("cnt"))
    )

    def freq_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch["sum(cnt)"], support)
        ).select(["token"])

    freq_ds = items.map_batches(
        freq_only, batch_format="pyarrow", batch_size=None
    )
    head = freq_ds.take(frequent_cap + 1)
    if len(head) > frequent_cap:
        pair_totals = _pair_totals_semijoin(ds, freq_ds, text_col)
    else:
        fset = np.sort(np.asarray([r["token"] for r in head], dtype=object))
        if len(fset) < 2:
            return pd.DataFrame(
                {"t1": [], "t2": [], "cnt": [], "rank": []}
            ).astype({"cnt": "int64", "rank": "int32"})
        fref = ray.put(fset)

        def pair_partial(batch: pa.Table) -> pa.Table:
            fs = ray.get(fref)
            per_doc = _distinct_doc_tokens(batch, text_col)
            keys = []
            for toks in per_doc:
                ft = toks[np.isin(toks, fs)]
                m = len(ft)
                if m < 2:
                    continue
                ia, ib = np.triu_indices(m, 1)
                keys.append(
                    np.char.add(
                        np.char.add(ft[ia].astype(str), " "),
                        ft[ib].astype(str),
                    )
                )
            if not keys:
                return pa.Table.from_arrays(
                    [pa.array([], pa.string()), pa.array([], pa.int64())],
                    names=["pair", "cnt"],
                )
            u, c = np.unique(np.concatenate(keys), return_counts=True)
            return pa.Table.from_arrays(
                [pa.array(u.astype(object), pa.string()),
                 pa.array(c.astype(np.int64))],
                names=["pair", "cnt"],
            )

        pair_totals = (
            ds.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
            .groupby("pair")
            .aggregate(Sum("cnt"))
        )

    def topk_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater_equal(batch["sum(cnt)"], support))
        p = np.asarray(batch["pair"].to_pylist(), dtype=object)
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, -c))[:k]
        return pa.Table.from_arrays(
            [pa.array(p[order].astype(str), pa.string()),
             pa.array(c[order], pa.int64())],
            names=["pair", "cnt"],
        )

    partials = pair_totals.map_batches(
        topk_partial, batch_format="pyarrow", batch_size=None
    ).take_all()  # <= blocks x k rows
    partials.sort(key=lambda r: (-r["cnt"], r["pair"]))
    head = partials[:k]
    t1 = [r["pair"].split(" ", 1)[0] for r in head]
    t2 = [r["pair"].split(" ", 1)[1] for r in head]
    return pd.DataFrame(
        {
            "t1": t1,
            "t2": t2,
            "cnt": [r["cnt"] for r in head],
            "rank": list(range(1, len(head) + 1)),
        }
    ).astype({"cnt": "int64", "rank": "int32"})


def association_rules(
    ds,
    support: int = 50,
    min_conf_milli: int = 300,
    text_col: str = "text",
    frequent_cap: int = 1_000_000,
):
    """Directed association rules over frequent token pairs (Agrawal &
    Srikant 1994 step 2): for every frequent pair {a, b} emit a→b and
    b→a with exact integer confidence and lift in milli-units —
    ``conf = 1000·cnt(ab) // cnt(a)``, ``lift = 1000·cnt(ab)·N //
    (cnt(a)·cnt(b))`` — keeping rules with ``conf >= min_conf_milli``.
    Integer floors on both engines make every rule bit-exact.

    Same two-pass exchange shape as :func:`frequent_pairs` (per-block
    distinct-doc partials → one token groupby; frequent-item broadcast
    → per-block pair partials → one pair groupby); the only extra state
    is the frequent items' doc-counts riding the SAME gated broadcast.
    Returns a pandas DataFrame ``(antecedent, consequent, pair_cnt,
    ante_cnt, cons_cnt, conf_milli, lift_milli)``.
    """
    import ray
    from ray.data.aggregate import Sum

    def item_partial(batch: pa.Table) -> pa.Table:
        per_doc = _distinct_doc_tokens(batch, text_col)
        flat = (
            np.concatenate([t for t in per_doc if len(t)] or [np.array([], object)])
            if per_doc
            else np.array([], object)
        )
        if len(flat) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["token", "cnt"],
            )
        u, c = np.unique(flat.astype(str), return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(object), pa.string()), pa.array(c.astype(np.int64))],
            names=["token", "cnt"],
        )

    n_docs = ds.count()
    items = (
        ds.map_batches(item_partial, batch_format="pyarrow", batch_size=None)
        .groupby("token")
        .aggregate(Sum("cnt"))
    )

    def freq_with_cnt(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.greater_equal(batch["sum(cnt)"], support))
        return pa.Table.from_arrays(
            [keep["token"], keep["sum(cnt)"].cast(pa.int64())],
            names=["token", "cnt"],
        )

    freq_cnt_ds = items.map_batches(
        freq_with_cnt, batch_format="pyarrow", batch_size=None
    )
    freq_rows = freq_cnt_ds.take(frequent_cap + 1)
    empty = pd.DataFrame(
        {
            "antecedent": [], "consequent": [], "pair_cnt": [],
            "ante_cnt": [], "cons_cnt": [], "conf_milli": [], "lift_milli": [],
        }
    ).astype(
        {c: "int64" for c in
         ("pair_cnt", "ante_cnt", "cons_cnt", "conf_milli", "lift_milli")}
    )
    if len(freq_rows) > frequent_cap:
        return _rules_semijoin(
            ds, freq_cnt_ds, support, min_conf_milli, n_docs, text_col, empty
        )
    counts = {r["token"]: int(r["cnt"]) for r in freq_rows}
    fset = np.sort(np.asarray(list(counts), dtype=object))
    if len(fset) < 2:
        return empty
    fref = ray.put((fset, counts))

    def pair_partial(batch: pa.Table) -> pa.Table:
        fs, _ = ray.get(fref)
        per_doc = _distinct_doc_tokens(batch, text_col)
        keys = []
        for toks in per_doc:
            ft = toks[np.isin(toks, fs)]
            if len(ft) < 2:
                continue
            ia, ib = np.triu_indices(len(ft), 1)
            keys.append(
                np.char.add(np.char.add(ft[ia].astype(str), " "), ft[ib].astype(str))
            )
        if not keys:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["pair", "cnt"],
            )
        u, c = np.unique(np.concatenate(keys), return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(object), pa.string()), pa.array(c.astype(np.int64))],
            names=["pair", "cnt"],
        )

    pair_totals = (
        ds.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
        .groupby("pair")
        .aggregate(Sum("cnt"))
    )

    def rules_partial(batch: pa.Table) -> pa.Table:
        _, cnts = ray.get(fref)
        keep = batch.filter(pc.greater_equal(batch["sum(cnt)"], support))
        ante, cons, pcnt, acnt, ccnt, conf, lift = [], [], [], [], [], [], []
        for pair, n_ab in zip(
            keep["pair"].to_pylist(), keep["sum(cnt)"].to_pylist()
        ):
            t1, t2 = pair.split(" ", 1)
            n_ab = int(n_ab)
            for a, c in ((t1, t2), (t2, t1)):
                ca, cc = cnts[a], cnts[c]
                cm = 1000 * n_ab // ca
                if cm < min_conf_milli:
                    continue
                ante.append(a)
                cons.append(c)
                pcnt.append(n_ab)
                acnt.append(ca)
                ccnt.append(cc)
                conf.append(cm)
                lift.append(1000 * n_ab * n_docs // (ca * cc))
        return pa.Table.from_arrays(
            [
                pa.array(ante, pa.string()), pa.array(cons, pa.string()),
                pa.array(pcnt, pa.int64()), pa.array(acnt, pa.int64()),
                pa.array(ccnt, pa.int64()), pa.array(conf, pa.int64()),
                pa.array(lift, pa.int64()),
            ],
            names=[
                "antecedent", "consequent", "pair_cnt", "ante_cnt",
                "cons_cnt", "conf_milli", "lift_milli",
            ],
        )

    df = pair_totals.map_batches(
        rules_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if df.empty:
        return empty
    return df.sort_values(["antecedent", "consequent"]).reset_index(drop=True)
