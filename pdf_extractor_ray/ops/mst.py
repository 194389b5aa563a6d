"""Borůvka minimum spanning forest over the weighted host graph.

The MSF is the standard backbone for single-linkage clustering, mirror
detection and graph sparsification at crawl scale, and Borůvka (1926)
is THE distributed algorithm for it: every component selects its
minimum outgoing edge simultaneously, components merge, and the live
graph shrinks geometrically — O(log n) rounds, each round expressible
as sorted-lookup joins + one segment argmin, exactly this engine's
exchange vocabulary.

Determinism without distinct weights: edges are totally ordered by
``(w, u, v)``, which makes the spanning forest UNIQUE — so the oracle
need not replay Borůvka at all: a Kruskal replay under the same total
order (sequential recursive CTE, one edge per step, label merge as a
CASE over the two merged labels) produces the identical edge set. Two
genuinely different published algorithms agreeing on the same unique
object is a stronger check than a step replay.

Shape per round: two :func:`..ops.segments.attach_lookup` sorts attach
component labels to edge endpoints, a vectorized filter keeps
inter-component edges, one :func:`..ops.segments.sorted_segment_apply`
argmin picks each component's minimum edge (two (label, w, u, v) rows
per live edge), and the chosen component-graph — COMPONENT-sized, the
geometrically shrinking minority, never the node or edge set — runs
through :func:`..ops.dedup.connected_components` (inheriting its
driver-cap/distributed regime split) to produce the merge map, which
re-enters the label table via mapped/unmapped attach-lookups (a
dataset-native left join). Forest edges stream out as a Dataset per
round. The fixed ``num_rounds`` is a convergence ASSERTION (raises if
live edges remain), never a truncation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .segments import attach_lookup, sever_lineage, sorted_segment_apply


def _int_cols(names: list[str], arrays: list[np.ndarray]) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array(a, pa.int64()) for a in arrays], names=names
    )


def canonical_weighted_edges(edges, u_col: str = "u", v_col: str = "v",
                             w_col: str = "w"):
    """Undirected canonical weighted form: self loops dropped, endpoints
    ordered ``u < v``, parallel edges' weights SUMMED (one groupby)."""
    from ray.data.aggregate import Sum

    def canon(batch: pa.Table) -> pa.Table:
        u = batch[u_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[v_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch[w_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v, w = u[keep], v[keep], w[keep]
        return _int_cols(
            ["u", "v", "w"], [np.minimum(u, v), np.maximum(u, v), w]
        )

    return (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Sum("w", alias_name="w"))
        .map_batches(
            lambda t: t.rename_columns(["u", "v", "w"]), batch_format="pyarrow"
        )
    )


def boruvka_msf(edges, num_rounds: int = 8, u_col: str = "u",
                v_col: str = "v", w_col: str = "w"):
    """Minimum spanning forest of the undirected weighted graph under
    the total edge order ``(w, u, v)`` — see the module docstring for
    the round shape and the uniqueness argument. Returns a Dataset
    ``(u, v, w, msf_round)``; raises ``RuntimeError`` if
    inter-component edges survive ``num_rounds``.
    """
    import ray
    from ray.data.aggregate import Count

    from .dedup import connected_components

    work = sever_lineage(canonical_weighted_edges(edges, u_col, v_col, w_col))
    nb = max(1, work.num_blocks())

    # labels: every endpoint starts as its own component.
    def emit_nodes(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        n = np.unique(np.concatenate([u, v])).astype(np.int64)
        return _int_cols(["node", "lab"], [n, n])

    labels = sever_lineage(
        work.map_batches(emit_nodes, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda b: pa.Table.from_arrays(
                [b["node"], b["node"]], names=["node", "lab"]
            ),
            batch_format="pyarrow",
        ),
        num_blocks=nb,
    )

    forest_parts: list = []
    rnd = 0
    while True:
        # attach component labels to both endpoints (sever between the
        # two lookups: attach_lookup reads queries.schema() eagerly).
        with_la = sever_lineage(
            attach_lookup(
                work.map_batches(
                    lambda b: pa.Table.from_arrays(
                        [b["u"], b["v"], b["w"]], names=["node", "v", "w"]
                    ),
                    batch_format="pyarrow",
                ),
                labels.map_batches(
                    lambda b: b.rename_columns(["node", "la"]),
                    batch_format="pyarrow",
                ),
                key_col="node",
                val_cols=["la"],
                carry_cols=["v", "w"],
            )
        )
        both = sever_lineage(
            attach_lookup(
                with_la.map_batches(
                    lambda b: pa.Table.from_arrays(
                        [b["v"], b["node"], b["w"], b["la"]],
                        names=["node", "u", "w", "la"],
                    ),
                    batch_format="pyarrow",
                ),
                labels.map_batches(
                    lambda b: b.rename_columns(["node", "lb"]),
                    batch_format="pyarrow",
                ),
                key_col="node",
                val_cols=["lb"],
                carry_cols=["u", "w", "la"],
            ).map_batches(
                lambda b: pa.Table.from_arrays(
                    [b["u"], b["node"], b["w"], b["la"], b["lb"]],
                    names=["u", "v", "w", "la", "lb"],
                ),
                batch_format="pyarrow",
            )
        )

        def live_only(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.not_equal(batch["la"], batch["lb"]))

        live = sever_lineage(
            both.map_batches(live_only, batch_format="pyarrow"), num_blocks=nb
        )
        if live.count() == 0:
            break
        if rnd >= num_rounds:
            raise RuntimeError(
                f"boruvka_msf: inter-component edges remain after "
                f"{num_rounds} rounds — raise num_rounds"
            )

        def side_rows(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            la = batch["la"].to_numpy(zero_copy_only=False)
            lb = batch["lb"].to_numpy(zero_copy_only=False)
            return _int_cols(
                ["lab", "w", "u", "v", "la", "lb"],
                [
                    np.concatenate([la, lb]),
                    np.concatenate([w, w]),
                    np.concatenate([u, u]),
                    np.concatenate([v, v]),
                    np.concatenate([la, la]),
                    np.concatenate([lb, lb]),
                ],
            )

        def head(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
            names = ["u", "v", "w", "la", "lb"]
            if len(starts) == 0:
                return _int_cols(names, [np.array([], np.int64)] * 5)
            take = pa.array(starts)
            return pa.Table.from_arrays(
                [batch[c].take(take) for c in names], names=names
            )

        chosen = sever_lineage(
            sorted_segment_apply(
                live.map_batches(side_rows, batch_format="pyarrow"),
                key_col="lab",
                block_fn=head,
                within_cols=["w", "u", "v"],
            )
            .groupby(["u", "v", "w", "la", "lb"])
            .aggregate(Count(alias_name="_c"))
            .map_batches(
                lambda b: b.select(["u", "v", "w", "la", "lb"]),
                batch_format="pyarrow",
            ),
            num_blocks=nb,
        )
        forest_parts.append(
            chosen.map_batches(
                lambda b, rnd=rnd: _int_cols(
                    ["u", "v", "w", "msf_round"],
                    [
                        b["u"].to_numpy(zero_copy_only=False),
                        b["v"].to_numpy(zero_copy_only=False),
                        b["w"].to_numpy(zero_copy_only=False),
                        np.full(len(b), rnd, np.int64),
                    ],
                ),
                batch_format="pyarrow",
            )
        )

        # merge map: CC over the chosen COMPONENT graph (component-sized).
        lab_edges = chosen.map_batches(
            lambda b: pa.Table.from_arrays(
                [b["la"], b["lb"]], names=["id_a", "id_b"]
            ),
            batch_format="pyarrow",
        )
        merge_map = connected_components(lab_edges)
        map_ds = ray.data.from_arrow(
            _int_cols(
                ["lab", "new"],
                [
                    merge_map["node"].to_numpy().astype(np.int64),
                    merge_map["label"].to_numpy().astype(np.int64),
                ],
            )
        )
        mapped = attach_lookup(
            labels, map_ds, key_col="lab", val_cols=["new"], carry_cols=["node"]
        ).map_batches(
            lambda b: pa.Table.from_arrays(
                [b["node"], b["new"]], names=["node", "lab"]
            ),
            batch_format="pyarrow",
        )
        unmapped = attach_lookup(
            labels, map_ds, key_col="lab", val_cols=[], carry_cols=["node"],
            anti=True,
        ).map_batches(
            lambda b: pa.Table.from_arrays(
                [b["node"], b["lab"]], names=["node", "lab"]
            ),
            batch_format="pyarrow",
        )
        labels = sever_lineage(mapped.union(unmapped), num_blocks=nb)
        work = sever_lineage(
            live.map_batches(
                lambda b: b.select(["u", "v", "w"]), batch_format="pyarrow"
            ),
            num_blocks=nb,
        )
        rnd += 1

    if not forest_parts:
        return ray.data.from_arrow(
            _int_cols(["u", "v", "w", "msf_round"], [np.array([], np.int64)] * 4)
        )
    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.union(p)
    return out


def single_linkage_clusters(edges, threshold: int, u_col: str = "u",
                            v_col: str = "v", w_col: str = "w",
                            num_rounds: int = 8):
    """Single-linkage clustering at distance ``threshold`` the MST way:
    clusters are the connected components of the spanning forest's
    edges with ``w <= threshold`` — equal, by the classic single-
    linkage/MST property, to components of the FULL subgraph at that
    threshold, but the CC input is the forest (``n − 1`` edges), not
    the edge set: the standard trick that makes threshold sweeps cheap
    at crawl scale (one Borůvka run, many cuts).

    Returns a Dataset ``(node, cluster)`` covering every node incident
    to any edge (nodes with no under-threshold edge cluster alone).
    The oracle can therefore verify with a reachability closure over
    the THRESHOLDED subgraph — a different derivation of the same
    unique partition.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    from .dedup import connected_components

    forest = boruvka_msf(edges, num_rounds=num_rounds, u_col=u_col,
                         v_col=v_col, w_col=w_col)
    kept = forest.map_batches(
        lambda b: b.filter(pc.less_equal(b["w"], threshold)).select(
            ["u", "v"]
        ).rename_columns(["id_a", "id_b"]),
        batch_format="pyarrow",
    )
    labels = connected_components(kept)

    nodes = (
        canonical_weighted_edges(edges, u_col, v_col, w_col)
        .map_batches(
            lambda b: _int_cols(
                ["node"],
                [np.unique(np.concatenate([
                    b["u"].to_numpy(zero_copy_only=False),
                    b["v"].to_numpy(zero_copy_only=False),
                ])).astype(np.int64)],
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda b: b.select(["node"]), batch_format="pyarrow")
    )
    from .segments import attach_lookup, sever_lineage

    nodes = sever_lineage(nodes)
    map_ds = ray.data.from_arrow(
        _int_cols(
            ["node", "cluster"],
            [
                labels["node"].to_numpy().astype(np.int64)
                if len(labels) else np.array([], np.int64),
                labels["label"].to_numpy().astype(np.int64)
                if len(labels) else np.array([], np.int64),
            ],
        )
    )
    mapped = attach_lookup(
        nodes, map_ds, key_col="node", val_cols=["cluster"], carry_cols=[]
    )
    unmapped = attach_lookup(
        nodes, map_ds, key_col="node", val_cols=[], carry_cols=[], anti=True
    ).map_batches(
        lambda b: pa.Table.from_arrays(
            [b["node"], b["node"]], names=["node", "cluster"]
        ),
        batch_format="pyarrow",
    )
    return mapped.union(unmapped)


def bellman_ford(edges, source: int, num_rounds: int = 6,
                 u_col: str = "u", v_col: str = "v", w_col: str = "w",
                 directed: bool = False):
    """Single-source shortest paths by synchronous Bellman–Ford
    relaxation rounds over integer weights — crawl-latency / hop-cost
    modeling on the weighted host graph. Exactly ``num_rounds`` rounds
    run (distances to all nodes within that many hops are final; a
    round is also a no-op once converged), so the result is bit-exact
    at any layout and SQL-replicable by unrolling the rounds — the
    same fixed-round contract as pagerank/label_propagation. Min over
    integer sums has no tie ambiguity, so no tiebreak machinery is
    needed.

    Shape per round: ONE :func:`..ops.segments.attach_lookup` ships
    current distances onto edge tails (only REACHED nodes propagate —
    frontier-proportional, not graph-proportional in early rounds),
    then one ``groupby(node).min`` folds relaxed candidates with the
    carried distances. Returns a Dataset ``(node, dist)`` over reached
    nodes only.
    """
    from ray.data.aggregate import Min

    import ray

    can = sever_lineage(canonical_weighted_edges(edges, u_col, v_col, w_col))

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        if directed:
            return _int_cols(["src", "dst", "w"], [u, v, w])
        return _int_cols(
            ["src", "dst", "w"],
            [np.concatenate([u, v]), np.concatenate([v, u]),
             np.concatenate([w, w])],
        )

    adj = sever_lineage(can.map_batches(both_dirs, batch_format="pyarrow"))
    dist = ray.data.from_arrow(
        _int_cols(["node", "dist"], [np.array([source], np.int64),
                                     np.array([0], np.int64)])
    )
    nb = max(1, adj.num_blocks())
    for _ in range(num_rounds):
        relaxed = attach_lookup(
            adj.map_batches(
                lambda b: pa.Table.from_arrays(
                    [b["src"], b["dst"], b["w"]], names=["node", "dst", "w"]
                ),
                batch_format="pyarrow",
            ),
            dist,
            key_col="node",
            val_cols=["dist"],
            carry_cols=["dst", "w"],
        ).map_batches(
            lambda b: _int_cols(
                ["node", "dist"],
                [
                    b["dst"].to_numpy(zero_copy_only=False),
                    b["w"].to_numpy(zero_copy_only=False)
                    + b["dist"].to_numpy(zero_copy_only=False),
                ],
            ),
            batch_format="pyarrow",
        )
        dist = sever_lineage(
            dist.union(relaxed)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .map_batches(
                lambda t: t.rename_columns(["node", "dist"]),
                batch_format="pyarrow",
            ),
            num_blocks=nb,
        )
    return dist
