"""Distributed cardinality sketches (HyperLogLog) with bit-exact oracles.

A 100 TB curation run constantly needs "how many distinct hosts / users /
keys" where exact distinct (``groupby`` on the key) is an all-to-all
shuffle of every key.  HyperLogLog answers it with **fixed** state:
``2^p`` one-byte registers, combined by element-wise max — associative,
commutative, and order-free, so it maps onto Ray Data as a per-block
``map_batches`` partial (vectorized ``np.maximum.at``) followed by one
tiny ``groupby("register").max()`` over at most ``blocks × 2^p``
pre-combined rows.  Nothing corpus-sized moves.

Determinism story: the hash is the same public-domain splitmix64 finalizer
used by :func:`..ops.text.hash_sample`, already reproduced bit-for-bit in
ANSI SQL (HUGEINT modular arithmetic) by the ``stratified_sample`` oracle
— so the *entire sketch* (every register value) is oracle-checkable, not
just the estimate.  The reference has no corpus operators (SURVEY.md
§2.7); this is net-new engine surface.

String keys: hash them to int64 first (e.g. the rolling-hash fingerprint
stage in :mod:`.text`) and sketch the fingerprint column — composition
keeps this kernel branch-free and fully vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import splitmix64_np

__all__ = ["hll_sketch", "hll_estimate", "hll_rho"]


def _bitlength(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (0 → 0) via six
    binary-search mask steps — NOT float log2, which rounds values within
    half an ulp of 2^k UP to k (e.g. log2(2^52-1) == 52.0 exactly)."""
    x = x.copy()
    bl = np.zeros(len(x), dtype=np.int32)
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= np.uint64(1) << np.uint64(shift)
        bl[m] += shift
        x[m] >>= np.uint64(shift)
    return bl + (x > 0)


def hll_rho(hv: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) for 64-bit hashes: register = top ``p`` bits, rho =
    1 + leading zeros of the remaining ``w = 64-p`` bits (in [1, w+1]),
    computed with exact integer bit arithmetic."""
    if not 4 <= p <= 18:
        raise ValueError("hll_rho: p must be in [4, 18]")
    w = 64 - p
    hv = np.asarray(hv, dtype=np.uint64)
    register = (hv >> np.uint64(w)).astype(np.int32)
    rest = hv & np.uint64((1 << w) - 1)
    rho = (w + 1 - _bitlength(rest)).astype(np.int32)
    return register, rho


def hll_sketch(ds, col: str, p: int = 12):
    """HyperLogLog register table for an integer key column: a Dataset of
    ``(register int32, max_rho int32)`` rows, one per occupied register
    (``<= 2^p`` rows total).  Partials are per-block dense max-combines;
    the only exchange is the final tiny groupby."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch[col]
        if arr.null_count:  # nulls are not keys (SQL COUNT DISTINCT semantics)
            arr = arr.drop_null()
        keys = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        hv = splitmix64_np(keys)
        reg, rho = hll_rho(hv, p)
        dense = np.zeros(m, dtype=np.int32)
        np.maximum.at(dense, reg, rho)
        occ = np.flatnonzero(dense)
        return pa.Table.from_arrays(
            [
                pa.array(occ.astype(np.int32), pa.int32()),
                pa.array(dense[occ], pa.int32()),
            ],
            names=["register", "rho"],
        )

    from ray.data.aggregate import Max

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("register")
        .aggregate(Max("rho"))
    )


def hll_estimate(registers: np.ndarray, p: int = 12) -> float:
    """Standard HLL estimate from a DENSE register array of size 2^p
    (zeros for unoccupied registers): alpha_m·m²/Σ2^(-M_j) with the usual
    small-range linear-counting correction (Flajolet et al. 2007)."""
    m = 1 << p
    registers = np.asarray(registers, dtype=np.float64)
    if len(registers) != m:
        raise ValueError(f"expected dense array of {m} registers")
    if p < 7:
        alpha = {4: 0.673, 5: 0.697, 6: 0.709}[p]
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers))
    zeros = int(np.sum(registers == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_sketch_grouped(ds, group_col: str, col: str, p: int = 12):
    """Per-GROUP HyperLogLog register tables: a Dataset of
    ``(group, register, max_rho)`` rows, ≤ ``groups × 2^p`` total — the
    mergeable approximate counterpart of
    :func:`..ops.segments.distinct_count_per_key` for when the value
    column is too hot to sort. Per-block partials keep one dense register
    array per group present in the block (bounded group cardinality —
    event types, languages, sources — same contract as ``word_topk``);
    the only exchange is the tiny ``groupby(group, register).max``.
    Same splitmix64 hash as :func:`hll_sketch`, so every register is
    bit-exactly SQL-checkable."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(
            pc.and_(pc.is_valid(batch[group_col]), pc.is_valid(batch[col]))
        )
        gtype = batch.schema.field(group_col).type
        g = batch[group_col].to_numpy(zero_copy_only=False)
        keys = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        hv = splitmix64_np(keys)
        reg, rho = hll_rho(hv, p)
        out_g, out_r, out_rho = [], [], []
        for gv in np.unique(g):  # bounded group cardinality
            mask = g == gv
            dense = np.zeros(m, dtype=np.int32)
            np.maximum.at(dense, reg[mask], rho[mask])
            occ = np.flatnonzero(dense)
            out_g.append(np.full(len(occ), gv, dtype=object))
            out_r.append(occ.astype(np.int32))
            out_rho.append(dense[occ])
        empty_o = np.array([], dtype=object)
        empty_i = np.array([], dtype=np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_g) if out_g else empty_o, gtype),
                pa.array(np.concatenate(out_r) if out_r else empty_i, pa.int32()),
                pa.array(np.concatenate(out_rho) if out_rho else empty_i, pa.int32()),
            ],
            names=[group_col, "register", "rho"],
        )

    from ray.data.aggregate import Max

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby([group_col, "register"])
        .aggregate(Max("rho"))
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): fixed d×w counter state
# for frequency estimation under the same regime as the HLL above — per-
# block vectorized partials (np.add.at into the d×w array), ONE groupby-sum
# over at most blocks × d·w pre-combined rows, nothing corpus-sized moving.
# The d row-hashes are disjoint bit-slices of the engine's SQL-replicable
# 64-bit token hash (ops/dedup.py:_token_hash64), so the DuckDB oracle can
# restate every probed counter exactly: est(t) = min_r sketch[r][slice_r(t)]
# upper-bounds the true count with one-sided error ≤ e·N/w at confidence
# 1 - e^-d.

CM_DEPTH = 4
CM_WIDTH = 1024  # 10 bits per row-slice; 4 × 10 = 40 ≤ 64 hash bits


def _cm_cells(hashes: np.ndarray) -> np.ndarray:
    """(n, d) cell indices: row r uses hash bits [10r, 10r+10)."""
    h = hashes.astype(np.uint64)
    return np.stack(
        [((h >> np.uint64(10 * r)) & np.uint64(CM_WIDTH - 1)) for r in range(CM_DEPTH)],
        axis=1,
    ).astype(np.int64)


def count_min_sketch(ds, text_col: str = "text"):
    """Build the d×w sketch over word tokens (corpus tokenization,
    :func:`..ops.text.split_words`). Returns the dense (d, w) int64 array."""
    import pyarrow.compute as pc

    from .dedup import _token_hash64

    def partial(batch: pa.Table) -> pa.Table:
        from .text import split_words

        texts = pc.fill_null(batch[text_col], "")
        w = split_words(texts).flatten()
        toks = w.to_numpy(zero_copy_only=False)
        toks = toks[toks != ""].astype(str)
        sk = np.zeros((CM_DEPTH, CM_WIDTH), dtype=np.int64)
        if len(toks):
            # hash per DISTINCT token (memoized), then add multiplicities.
            uniq, counts = np.unique(toks, return_counts=True)
            hs = np.fromiter(
                (_token_hash64(t) for t in uniq), dtype=np.uint64, count=len(uniq)
            )
            cells = _cm_cells(hs)
            for r in range(CM_DEPTH):
                np.add.at(sk[r], cells[:, r], counts)
        rows = np.repeat(np.arange(CM_DEPTH, dtype=np.int64), CM_WIDTH)
        cols = np.tile(np.arange(CM_WIDTH, dtype=np.int64), CM_DEPTH)
        return pa.Table.from_arrays(
            [pa.array(rows), pa.array(cols), pa.array(sk.ravel())],
            names=["r", "c", "cnt"],
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["r", "c"])
        .sum("cnt")
        .to_pandas()
        .sort_values(["r", "c"])
    )
    return agg["sum(cnt)"].to_numpy().reshape(CM_DEPTH, CM_WIDTH).astype(np.int64)


def count_min_estimates(ds, probes: list[str], text_col: str = "text") -> pa.Table:
    """Sketch the corpus, then report for each probe token the Count-Min
    estimate, the exact count (one vectorized counting pass over the same
    corpus — the verification arm), and the overestimate delta."""
    import pyarrow.compute as pc

    from .dedup import _token_hash64

    sk = count_min_sketch(ds, text_col)
    probe_arr = pa.array(sorted(set(probes)), pa.string())

    def exact_partial(batch: pa.Table) -> pa.Table:
        from .text import split_words

        texts = pc.fill_null(batch[text_col], "")
        w = split_words(texts).flatten()
        hitmask = pc.is_in(w, value_set=probe_arr)
        hits = w.filter(hitmask).to_numpy(zero_copy_only=False).astype(str)
        uniq, counts = np.unique(hits, return_counts=True)
        return pa.Table.from_arrays(
            [
                pa.array(uniq.astype(object), pa.string()),
                pa.array(counts.astype(np.int64)),
            ],
            names=["token", "cnt"],
        )

    exact_rows = (
        ds.map_batches(exact_partial, batch_format="pyarrow", batch_size=None)
        .groupby("token")
        .sum("cnt")
        .take_all()
    )
    exact = {r["token"]: int(r["sum(cnt)"]) for r in exact_rows}

    out_t, out_e, out_x = [], [], []
    for t in sorted(set(probes)):
        cells = _cm_cells(np.array([_token_hash64(t)], dtype=np.uint64))[0]
        est = int(min(sk[r, cells[r]] for r in range(CM_DEPTH)))
        out_t.append(t)
        out_e.append(est)
        out_x.append(exact.get(t, 0))
    return pa.Table.from_arrays(
        [
            pa.array(out_t, pa.string()),
            pa.array(out_e, pa.int64()),
            pa.array(out_x, pa.int64()),
            pa.array(np.array(out_e) - np.array(out_x)),
        ],
        names=["token", "cm_estimate", "exact_count", "overestimate"],
    )


def hyperball(
    edges_ds,
    radius: int = 2,
    p: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
):
    """HyperBall (Boldi–Rosa–Vigna 2011): per-node HyperLogLog sketches
    of the radius-``radius`` OUT-ball, the web-graph-scale way to get
    neighborhood functions / centralities where exact all-pairs BFS is
    impossible. Each node starts with its own splitmix64 hash in one
    register; every round each node max-merges its successors' register
    tables — after R rounds node v's sketch covers every node reachable
    in ≤ R hops.

    Node ids must be int64 (string graphs go through the dense-rank
    mapping stage the repo's CC path documents). State is SPARSE rows
    ``(node, reg, val)`` — ≤ 2^p per node, ≤ 16·n at the default p=4 —
    and each round is ONE sort co-locating successor state with the
    reversed adjacency (sorted-block cross product, the same
    many-to-many shape as :func:`..ops.links.harmonic_centrality`)
    plus one ``groupby(node, reg).max`` — nothing ever driver-sized.
    The artifact returned is the exact integer register table (Dataset,
    sorted consumers decide), bit-exactly SQL-replicable: estimates
    come from :func:`hll_estimate` per node downstream.
    """
    from .segments import sever_lineage, sorted_segment_apply

    def distinct_edges(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        if len(s) and (int(max(s.max(), d.max())) >= 1 << 32
                       or int(min(s.min(), d.min())) < 0):
            raise ValueError(
                "hyperball: node ids must be in [0, 2^32) — run the "
                "dense-rank mapping stage first")
        k = np.unique((s.astype(np.uint64) << np.uint64(32))
                      | d.astype(np.uint64))
        return pa.Table.from_arrays(
            [pa.array(k.astype(np.int64)),
             pa.array(np.ones(len(k), np.int64))],
            names=["k", "one"],
        )

    e = (
        edges_ds.map_batches(distinct_edges, batch_format="pyarrow")
        .groupby("k")
        .sum("one")
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t["k"].combine_chunks()], names=["k"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def adj_rows(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
        src = (k >> np.uint64(32)).astype(np.int64)
        dst = (k & np.uint64(0xFFFFFFFF)).astype(np.int64)
        # reversed: successor w is the co-location key, v receives
        return pa.Table.from_arrays(
            [pa.array(dst), pa.array(src),
             pa.array(np.full(len(k), -1, np.int64)),
             pa.array(np.zeros(len(k), np.int64)),
             pa.array(np.zeros(len(k), np.int64))],
            names=["mid", "v", "reg", "val", "tag"],
        )

    adj = e.map_batches(adj_rows, batch_format="pyarrow").materialize()

    def node_rows(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nodes = np.unique(np.concatenate(
            [(k >> np.uint64(32)), k & np.uint64(0xFFFFFFFF)]
        )).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(nodes), pa.array(np.ones(len(nodes), np.int64))],
            names=["node", "one"],
        )

    def seed(batch: pa.Table) -> pa.Table:
        nodes = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        from .text import splitmix64_np

        hv = splitmix64_np(nodes.astype(np.uint64))
        reg, rho = hll_rho(hv, p)
        return pa.Table.from_arrays(
            [pa.array(nodes), pa.array(reg.astype(np.int64)),
             pa.array(rho.astype(np.int64))],
            names=["node", "reg", "val"],
        )

    state = (
        e.map_batches(node_rows, batch_format="pyarrow")
        .groupby("node")
        .sum("one")
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t["node"].combine_chunks()], names=["node"]),
            batch_format="pyarrow",
        )
        .map_batches(seed, batch_format="pyarrow")
        .materialize()
    )

    def state_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [batch["node"].combine_chunks().cast(pa.int64()),
             pa.array(np.full(n, -1, np.int64)),
             batch["reg"].combine_chunks().cast(pa.int64()),
             batch["val"].combine_chunks().cast(pa.int64()),
             pa.array(np.ones(n, np.int64))],
            names=["mid", "v", "reg", "val", "tag"],
        )

    def cross_block(batch: pa.Table, starts: np.ndarray,
                    ends: np.ndarray) -> pa.Table:
        tag = batch["tag"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        reg = batch["reg"].to_numpy(zero_copy_only=False)
        val = batch["val"].to_numpy(zero_copy_only=False)
        out_n, out_r, out_v = [], [], []
        for s, e_ in zip(starts, ends):
            t = tag[s:e_]
            recv = v[s:e_][t == 0]          # predecessors of mid
            sreg = reg[s:e_][t == 1]        # mid's register rows
            sval = val[s:e_][t == 1]
            if len(recv) == 0 or len(sreg) == 0:
                continue
            out_n.append(np.repeat(recv, len(sreg)))
            out_r.append(np.tile(sreg, len(recv)))
            out_v.append(np.tile(sval, len(recv)))
        if out_n:
            nn = np.concatenate(out_n)
            rr = np.concatenate(out_r)
            vv = np.concatenate(out_v)
        else:
            nn = rr = vv = np.array([], dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(nn.astype(np.int64)), pa.array(rr.astype(np.int64)),
             pa.array(vv.astype(np.int64))],
            names=["node", "reg", "val"],
        )

    for _ in range(radius):
        contrib = sorted_segment_apply(
            adj.union(state.map_batches(state_rows,
                                        batch_format="pyarrow")),
            key_col="mid", block_fn=cross_block,
            within_cols=["tag", "reg", "val", "v"],
        )
        # state is referenced twice per round (cross-product input +
        # union): sever or the plan graph doubles per round
        # (see segments.sever_lineage).
        state = sever_lineage(
            state.union(contrib)
            .groupby(["node", "reg"])
            .max("val")
            .map_batches(
                lambda t: t.rename_columns(["node", "reg", "val"]),
                batch_format="pyarrow",
            ),
            num_blocks=adj.num_blocks(),
        )

    return state.sort(["node", "reg"])


def misra_gries_heavy_hitters(
    ds,
    k: int = 100,
    text_col: str = "text",
    candidate_cap: int = 5_000_000,
):
    """Deterministic φ-heavy hitters (φ = 1/k) in TWO passes with a
    ``blocks·k``-sized exchange — the Misra–Gries (1982) summary
    shape, the scale alternative to a vocabulary-sized ``groupby``
    when only the head matters:

    1. each block runs an exact-decrement Misra–Gries summary of size
       ``k`` over its tokens (vectorized rounds: count the block's
       distinct tokens, keep the top-``k`` by local count — a block
       with its full count table IS a perfect MG summary, and the
       pigeonhole guarantee survives the union: any token with global
       frequency > n/k exceeds n_b/k in at least one block, so it
       appears in that block's top-``k`` candidates with local count
       > n_b/k).
    2. the candidate union (≤ blocks·k rows, ``candidate_cap``-gated)
       broadcasts once; a second exact counting pass over the corpus
       restricted to candidates + one small ``groupby(token).sum``
       yields EXACT counts, and tokens with ``cnt·k > n_total`` are
       the certified heavy hitters — no false negatives by the
       pigeonhole, no false positives after the recount.

    Tokenization is THE corpus tokenization (:func:`..ops.text.
    split_words`). Returns a pandas DataFrame ``(token, cnt)`` sorted
    by (cnt desc, token) with the exact total in every row
    (``n_total``) for auditability.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .text import split_words

    def block_tokens(batch: pa.Table) -> np.ndarray:
        col = batch[text_col]
        if pa.types.is_null(col.type):
            col = pa.nulls(len(col), pa.string())
        words = pc.list_flatten(split_words(pc.fill_null(col, "")))
        flat = np.asarray(words.to_pylist(), dtype=object)
        return flat[flat != ""]

    def candidates(batch: pa.Table) -> pa.Table:
        flat = block_tokens(batch)
        total = np.int64(len(flat))
        if len(flat) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["token", "n_part"],
            )
        u, c = np.unique(flat.astype(str), return_counts=True)
        order = np.lexsort((u, -c))[:k]
        # one sentinel row per block carries the block's token total so
        # n_total needs no extra pass ('' never appears as a token).
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate([u[order], ["" ]]).astype(object),
                         pa.string()),
                pa.array(np.concatenate([np.zeros(len(order), np.int64),
                                         [total]]), pa.int64()),
            ],
            names=["token", "n_part"],
        )

    cand_rows = (
        ds.map_batches(candidates, batch_format="pyarrow", batch_size=None)
        .groupby("token")
        .aggregate(Sum("n_part", alias_name="n_part"))
        .to_pandas()
    )
    if len(cand_rows) > candidate_cap:
        raise RuntimeError(
            f"misra_gries_heavy_hitters: {len(cand_rows)} candidates exceed "
            f"candidate_cap={candidate_cap}"
        )
    empty = pd.DataFrame(
        {"token": pd.Series([], dtype=object),
         "cnt": pd.Series([], dtype="int64"),
         "n_total": pd.Series([], dtype="int64")}
    )
    if cand_rows.empty or "token" not in cand_rows.columns:
        return empty
    n_total = int(cand_rows.loc[cand_rows["token"] == "", "n_part"].sum())
    cset = np.sort(
        cand_rows.loc[cand_rows["token"] != "", "token"]
        .to_numpy(dtype=object)
        .astype(str)
    )
    if len(cset) == 0:
        return empty
    import ray

    cref = ray.put(cset)

    def recount(batch: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        flat = block_tokens(batch).astype(str)
        hit = flat[np.isin(flat, cs)]
        if len(hit) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["token", "cnt"],
            )
        u, c = np.unique(hit, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(object), pa.string()),
             pa.array(c.astype(np.int64), pa.int64())],
            names=["token", "cnt"],
        )

    counts = (
        ds.map_batches(recount, batch_format="pyarrow", batch_size=None)
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    if counts.empty or "token" not in counts.columns:
        return empty
    counts = counts[counts["cnt"] * k > n_total].copy()
    counts["cnt"] = counts["cnt"].astype("int64")
    counts["n_total"] = n_total
    return (
        counts.sort_values(["cnt", "token"], ascending=[False, True])
        .reset_index(drop=True)[["token", "cnt", "n_total"]]
    )
