"""Distributed symmetry-breaking primitives over the host graph:
Luby-style maximal independent set and Israeli–Itai-style greedy
maximal matching.

Both are classic building blocks of web-graph processing (scheduler
conflict sets, one-per-neighborhood sampling, crawl-frontier
de-conflicting, graph coarsening for multilevel partitioners) and both
are the canonical examples of *round-synchronous* distributed
algorithms: every round each node/edge decides locally from hashed
priorities, so a fixed round schedule makes the output bit-exact at any
block layout AND replicable in SQL by unrolling the rounds as chained
CTEs — the same contract as :func:`..ops.links.pagerank` /
:func:`..ops.links.label_propagation`.

Determinism without coordination: round ``r`` priorities are
``splitmix64(id + 1000003*r + salt)`` (node id for MIS; a two-stage
``splitmix64(splitmix64(u + 1000003*r + salt) + v)`` chain for edges so
no id-width packing constraint exists). Re-drawing per round is what
gives Luby's O(log n) expected round bound; with the priorities fixed
by a seed-free hash the run is fully deterministic.

Exchange shape per round (MIS): losers are computed PER EDGE with zero
joins (both endpoint priorities are hashes of the ids the edge row
already carries), winners fall out of one sentinel-union
``groupby(node).max``, and the removal wave is one semi-join
(neighbors-of-winners) plus anti-join filters — every exchanged row is
a bare int64 node id. Nothing node- or edge-sized lands on the driver;
winner rows stream out as a Dataset per round and union. Matching is
one ``sorted_segment_apply`` argmin per round over (node, priority)
rows — two rows per live edge — plus the same anti-join removal.

At 10^12-document scale the live set shrinks geometrically per round
(each round removes the hashed-priority local minima and their
neighborhoods), so the fixed ``num_rounds`` cap is a convergence
ASSERTION, not a truncation: both functions raise if live work remains
after the last round rather than silently emitting a non-maximal set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .segments import attach_lookup, sever_lineage, sorted_segment_apply
from .text import splitmix64_np

_ROUND_SALT = 1000003


def _round_prio(ids: np.ndarray, rnd: int, salt: int) -> np.ndarray:
    """Round-``rnd`` node priority: splitmix64(id + 1000003*rnd + salt)."""
    x = ids.astype(np.uint64) + np.uint64(_ROUND_SALT * rnd + salt)
    return splitmix64_np(x)


def _edge_prio(u: np.ndarray, v: np.ndarray, rnd: int, salt: int) -> np.ndarray:
    """Round-``rnd`` edge priority: two chained splitmix64 mixes, so ids
    of any width stay injectively mixed (no bit-packing assumption)."""
    p1 = _round_prio(u, rnd, salt)
    return splitmix64_np(p1 + v.astype(np.uint64))


def _int_table(names: list[str], arrays: list[np.ndarray]) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array(a, pa.int64()) for a in arrays], names=names
    )


def _canonical_edges(edges, u_col: str, v_col: str):
    """Undirected canonical form: drop self loops, order u < v, distinct."""
    import pyarrow.compute as pc

    def canon(batch: pa.Table) -> pa.Table:
        u = batch[u_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[v_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        # per-block pre-distinct before the global groupby
        comp = np.unique(lo.astype(np.uint64) * np.uint64(0x100000000) + hi.astype(np.uint64))
        # ids are int64 but the composite only round-trips below 2^32;
        # fall back to a structured unique when any id overflows.
        if len(lo) and (lo.max() >= 1 << 32 or hi.max() >= 1 << 32):
            pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
            return _int_table(["u", "v"], [pairs[:, 0], pairs[:, 1]])
        return _int_table(
            ["u", "v"],
            [
                (comp >> np.uint64(32)).astype(np.int64),
                (comp & np.uint64(0xFFFFFFFF)).astype(np.int64),
            ],
        )

    from ray.data.aggregate import Count

    return (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda b: b.select(["u", "v"]), batch_format="pyarrow")
    )


def _distinct_nodes(ds, cols: list[str]):
    """Distinct int64 node ids appearing in any of ``cols``."""
    from ray.data.aggregate import Count

    def emit(batch: pa.Table) -> pa.Table:
        parts = [
            batch[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in cols
        ]
        return _int_table(["node"], [np.unique(np.concatenate(parts))])

    return (
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda b: b.select(["node"]), batch_format="pyarrow")
    )


def _anti_nodes(nodes, removed):
    """nodes \\ removed, both (node:int64) with unique keys."""
    return attach_lookup(
        nodes, removed, key_col="node", val_cols=[], carry_cols=[], anti=True
    )


def _empty_edges():
    import ray

    return ray.data.from_arrow(_int_table(["u", "v"], [np.array([], np.int64)] * 2))


def _live_filter(live, removed):
    """Edges with NEITHER endpoint in ``removed`` (u,v int64)."""
    out = attach_lookup(
        live.map_batches(
            lambda b: b.rename_columns(["node", "v"]), batch_format="pyarrow"
        ),
        removed,
        key_col="node",
        val_cols=[],
        carry_cols=["v"],
        anti=True,
    ).map_batches(lambda b: b.rename_columns(["u", "node"]), batch_format="pyarrow")
    # attach_lookup reads queries.schema() eagerly; the first attach's
    # output is lazy with unknown schema, so pin it first (and an
    # empty anti-join result drops its schema entirely — short-circuit).
    out = sever_lineage(out)
    if out.schema() is None or out.count() == 0:
        return _empty_edges()
    return attach_lookup(
        out, removed, key_col="node", val_cols=[], carry_cols=["u"], anti=True
    ).map_batches(
        lambda b: pa.Table.from_arrays([b["u"], b["node"]], names=["u", "v"]),
        batch_format="pyarrow",
    )


def _keep_unblocked(t: pa.Table) -> pa.Table:
    """(node, blocked) groupby output → nodes with blocked == 0."""
    import pyarrow.compute as pc

    t = t.rename_columns(["node", "blocked"])
    return t.filter(pc.equal(t["blocked"], 0)).select(["node"])


def _keep_both_heads(t: pa.Table) -> pa.Table:
    """(u, v, n) groupby output → edges that head BOTH endpoints."""
    import pyarrow.compute as pc

    t = t.rename_columns(["u", "v", "n"])
    return t.filter(pc.equal(t["n"], 2)).select(["u", "v"])


def luby_mis(
    edges,
    num_rounds: int = 8,
    u_col: str = "u",
    v_col: str = "v",
    salt: int = 0,
):
    """Maximal independent set via Luby's algorithm (Luby 1986) with
    deterministic per-round splitmix64 priorities.

    Round ``r`` over the live (undecided) subgraph:

    1. every live edge locally computes both endpoints' priorities
       ``p = splitmix64(id + 1000003*r + salt)`` and emits its LOSER —
       the endpoint with the lexicographically larger ``(p, id)`` —
       as a blocked node (zero joins: priorities derive from ids).
    2. winners = live nodes never emitted as a loser: sentinel union
       (``(node, 0)`` for every live node, ``(node, 1)`` per loser row)
       → ``groupby(node).max`` → keep 0. Winners join the MIS.
    3. removal wave: winners' neighbors via one semi-join over the live
       edges; live nodes and live edges are anti-joined against
       ``winners ∪ neighbors``.

    Exactly the classic guarantee: the result is an independent set
    (two adjacent live nodes can't both win round ``r`` — one of them
    is the edge's loser) and maximal once no live node remains. Raises
    ``RuntimeError`` if nodes remain live after ``num_rounds`` (a
    convergence assertion, never a silent truncation; expected rounds
    are O(log n) because priorities re-draw each round).

    Returns a Dataset of ``(node:int64, mis_round:int64)`` — the MIS
    members and the round each joined.
    """
    from ray.data.aggregate import Max

    live_edges = sever_lineage(_canonical_edges(edges, u_col, v_col))
    live_nodes = sever_lineage(_distinct_nodes(live_edges, ["u", "v"]))
    winner_sets: list = []
    nb = max(1, live_edges.num_blocks())

    for rnd in range(num_rounds):
        if live_nodes.count() == 0:
            break

        def losers(batch: pa.Table, rnd=rnd) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            pu, pv = _round_prio(u, rnd, salt), _round_prio(v, rnd, salt)
            u_loses = (pu > pv) | ((pu == pv) & (u > v))
            lose = np.unique(np.where(u_loses, u, v))
            return _int_table(
                ["node", "blocked"], [lose, np.ones(len(lose), np.int64)]
            )

        blocked = live_edges.map_batches(losers, batch_format="pyarrow")
        sentinel = live_nodes.map_batches(
            lambda b: _int_table(
                ["node", "blocked"],
                [
                    b["node"].to_numpy(zero_copy_only=False).astype(np.int64),
                    np.zeros(len(b), np.int64),
                ],
            ),
            batch_format="pyarrow",
        )
        winners = (
            blocked.union(sentinel)
            .groupby("node")
            .aggregate(Max("blocked", alias_name="blocked"))
            .map_batches(_keep_unblocked, batch_format="pyarrow")
        )
        winners = sever_lineage(winners, num_blocks=nb)
        winner_sets.append(
            winners.map_batches(
                lambda b, rnd=rnd: _int_table(
                    ["node", "mis_round"],
                    [
                        b["node"].to_numpy(zero_copy_only=False).astype(np.int64),
                        np.full(len(b), rnd, np.int64),
                    ],
                ),
                batch_format="pyarrow",
            )
        )

        # removal wave: winners plus their live neighbors. An isolated
        # live node (all edges gone in earlier waves) wins via the
        # sentinel alone — skip the neighbor semi-join when no live
        # edges remain (and avoid schema-less empty-dataset plumbing).
        if live_edges.count() == 0:
            removed = sever_lineage(_distinct_nodes(winners, ["node"]), num_blocks=nb)
            live_nodes = sever_lineage(_anti_nodes(live_nodes, removed), num_blocks=nb)
            continue
        nbrs = attach_lookup(
            live_edges.map_batches(
                lambda b: pa.Table.from_arrays(
                    [b["u"], b["v"]], names=["node", "other"]
                ).select(["node", "other"]),
                batch_format="pyarrow",
            ).union(
                live_edges.map_batches(
                    lambda b: pa.Table.from_arrays(
                        [b["v"], b["u"]], names=["node", "other"]
                    ),
                    batch_format="pyarrow",
                )
            ),
            winners,
            key_col="node",
            val_cols=[],
            carry_cols=["other"],
        ).map_batches(
            lambda b: _int_table(
                ["node"],
                [np.unique(b["other"].to_numpy(zero_copy_only=False).astype(np.int64))],
            ),
            batch_format="pyarrow",
        )
        removed = sever_lineage(
            _distinct_nodes(
                winners.union(nbrs), ["node"]
            ),
            num_blocks=nb,
        )
        live_nodes = sever_lineage(_anti_nodes(live_nodes, removed), num_blocks=nb)
        live_edges = sever_lineage(_live_filter(live_edges, removed), num_blocks=nb)
    else:
        if live_nodes.count() != 0:
            raise RuntimeError(
                f"luby_mis: {live_nodes.count()} nodes still undecided after "
                f"{num_rounds} rounds — raise num_rounds"
            )

    if not winner_sets:
        import ray

        return ray.data.from_arrow(_int_table(["node", "mis_round"], [np.array([], np.int64)] * 2))
    out = winner_sets[0]
    for w in winner_sets[1:]:
        out = out.union(w)
    return out


def greedy_matching(
    edges,
    num_rounds: int = 8,
    u_col: str = "u",
    v_col: str = "v",
    salt: int = 0,
):
    """Maximal matching via round-synchronous local-minimum edge
    selection (Israeli & Itai 1986): round ``r`` an edge joins the
    matching iff its priority ``splitmix64(splitmix64(u + 1000003*r +
    salt) + v)`` is the strict minimum among live edges at BOTH of its
    endpoints (ties break to the smaller ``(u, v)``); matched endpoints
    and their incident edges then leave the live set.

    Two adjacent edges share an endpoint, so both cannot be that
    endpoint's minimum — the per-round selection is a matching, and the
    union over rounds is maximal once no live edge remains. Raises
    ``RuntimeError`` if live edges survive ``num_rounds``.

    Exchange shape per round: two (node, prio, u, v) rows per live edge
    into ONE :func:`sorted_segment_apply` argmin, a ``groupby(u,
    v).count == 2`` both-endpoints check, then the same anti-join
    removal wave as :func:`luby_mis`.

    Returns a Dataset of ``(u:int64, v:int64, match_round:int64)``.
    """
    from ray.data.aggregate import Count

    live = sever_lineage(_canonical_edges(edges, u_col, v_col))
    matched_sets: list = []
    nb = max(1, live.num_blocks())

    for rnd in range(num_rounds):
        if live.count() == 0:
            break

        def head(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
            if len(starts) == 0:
                return _int_table(["u", "v"], [np.array([], np.int64)] * 2)
            take = pa.array(starts)
            return pa.Table.from_arrays(
                [batch["u"].take(take), batch["v"].take(take)], names=["u", "v"]
            )

        # per-node minimum-priority incident edge; int64 view of the
        # uint64 hash sorts differently, so shift to unsigned order by
        # XOR with the sign bit before emitting (monotone bijection).
        def endpoint_rows_fixed(batch: pa.Table, rnd=rnd) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            pe = (_edge_prio(u, v, rnd, salt) ^ np.uint64(1 << 63)).astype(np.int64)
            return _int_table(
                ["node", "pe", "u", "v"],
                [np.concatenate([u, v]), np.concatenate([pe, pe]),
                 np.concatenate([u, u]), np.concatenate([v, v])],
            )

        heads = sorted_segment_apply(
            live.map_batches(endpoint_rows_fixed, batch_format="pyarrow"),
            key_col="node",
            block_fn=head,
            within_cols=["pe", "u", "v"],
            descending=[False, False, False],
        )
        matched = (
            heads.groupby(["u", "v"])
            .aggregate(Count(alias_name="n"))
            .map_batches(_keep_both_heads, batch_format="pyarrow")
        )
        matched = sever_lineage(matched, num_blocks=nb)
        matched_sets.append(
            matched.map_batches(
                lambda b, rnd=rnd: _int_table(
                    ["u", "v", "match_round"],
                    [
                        b["u"].to_numpy(zero_copy_only=False).astype(np.int64),
                        b["v"].to_numpy(zero_copy_only=False).astype(np.int64),
                        np.full(len(b), rnd, np.int64),
                    ],
                ),
                batch_format="pyarrow",
            )
        )
        removed = sever_lineage(_distinct_nodes(matched, ["u", "v"]), num_blocks=nb)
        live = sever_lineage(_live_filter(live, removed), num_blocks=nb)
    else:
        if live.count() != 0:
            raise RuntimeError(
                f"greedy_matching: {live.count()} live edges after "
                f"{num_rounds} rounds — raise num_rounds"
            )

    if not matched_sets:
        import ray

        return ray.data.from_arrow(
            _int_table(["u", "v", "match_round"], [np.array([], np.int64)] * 3)
        )
    out = matched_sets[0]
    for m in matched_sets[1:]:
        out = out.union(m)
    return out
