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
is collected under ``frequent_cap`` and broadcast (``ray.put``) — above
the cap a typed error documents the regime change a semi-join would need.
Pass 2 emits per-block pre-combined (t1, t2) pair counts over frequent
items only, one pair-vocabulary groupby, per-block partial top-k. Per-doc
pair emission is O(frequent items in the doc)² — the A-Priori contract:
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


class FrequentSetOverflow(RuntimeError):
    """Raised when the pass-1 frequent-item set exceeds ``frequent_cap``."""


def _distinct_doc_tokens(batch: pa.Table, text_col: str):
    """Per-document sorted-unique token arrays for one block."""
    col = batch[text_col]
    if pa.types.is_null(col.type):  # an all-None block types as null
        col = pa.nulls(len(col), pa.string())
    texts = pc.fill_null(col, "")
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
    least ``support`` documents, ranked by (support desc, t1, t2). Returns
    a pandas DataFrame ``(t1, t2, cnt, rank)``."""
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

    freq_rows = items.map_batches(
        freq_only, batch_format="pyarrow", batch_size=None
    ).take_all()
    if len(freq_rows) > frequent_cap:
        raise FrequentSetOverflow(
            f"{len(freq_rows)} frequent items exceed frequent_cap="
            f"{frequent_cap}; raise support or the cap"
        )
    fset = np.sort(np.asarray([r["token"] for r in freq_rows], dtype=object))
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

    freq_rows = items.map_batches(
        freq_with_cnt, batch_format="pyarrow", batch_size=None
    ).take_all()
    if len(freq_rows) > frequent_cap:
        raise FrequentSetOverflow(
            f"{len(freq_rows)} frequent items exceed frequent_cap={frequent_cap}"
        )
    counts = {r["token"]: int(r["cnt"]) for r in freq_rows}
    fset = np.sort(np.asarray(list(counts), dtype=object))
    empty = pd.DataFrame(
        {
            "antecedent": [], "consequent": [], "pair_cnt": [],
            "ante_cnt": [], "cons_cnt": [], "conf_milli": [], "lift_milli": [],
        }
    ).astype(
        {c: "int64" for c in
         ("pair_cnt", "ante_cnt", "cons_cnt", "conf_milli", "lift_milli")}
    )
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
