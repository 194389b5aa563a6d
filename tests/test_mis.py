"""Luby MIS / greedy maximal matching vs brute-force replays with the
identical splitmix64 round priorities (ops/mis.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_extractor_ray.ops.mis import (
    _edge_prio,
    _round_prio,
    greedy_matching,
    luby_mis,
)


def _random_graph(seed: int, n: int, m: int):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, n, m).astype(np.int64)
    v = rng.randint(0, n, m).astype(np.int64)
    keep = u != v
    cu, cv = np.minimum(u[keep], v[keep]), np.maximum(u[keep], v[keep])
    pairs = set(zip(cu.tolist(), cv.tolist()))
    nodes = sorted({x for e in pairs for x in e})
    ds = ray.data.from_arrow(
        pa.Table.from_arrays([pa.array(u), pa.array(v)], names=["u", "v"])
    ).repartition(5)
    return ds, pairs, nodes


def _brute_mis(pairs, nodes, num_rounds=8, salt=0):
    live_nodes, live_edges, out = set(nodes), set(pairs), {}
    for r in range(num_rounds):
        if not live_nodes:
            break
        pr = {x: int(_round_prio(np.array([x]), r, salt)[0]) for x in live_nodes}
        blocked = set()
        for a, b in live_edges:
            blocked.add(a if (pr[a], a) > (pr[b], b) else b)
        winners = live_nodes - blocked
        removed = set(winners)
        for a, b in live_edges:
            if a in winners:
                removed.add(b)
            if b in winners:
                removed.add(a)
        out.update({w: r for w in winners})
        live_nodes -= removed
        live_edges = {
            e for e in live_edges if e[0] not in removed and e[1] not in removed
        }
    assert not live_nodes
    return out


def _brute_matching(pairs, num_rounds=8, salt=0):
    live, out = set(pairs), {}
    for r in range(num_rounds):
        if not live:
            break
        pe = {
            (a, b): int(_edge_prio(np.array([a]), np.array([b]), r, salt)[0])
            for a, b in live
        }
        best = {}
        for e in live:
            k = (pe[e], e[0], e[1])
            for node in e:
                if node not in best or k < best[node]:
                    best[node] = k
        matched = {
            e for e in live if best[e[0]] == (pe[e], *e) and best[e[1]] == (pe[e], *e)
        }
        out.update({e: r for e in matched})
        mn = {x for e in matched for x in e}
        live = {e for e in live if e[0] not in mn and e[1] not in mn}
    assert not live
    return out


class TestLubyMis:
    @pytest.mark.parametrize("seed,n,m", [(7, 60, 180), (1, 25, 40)])
    def test_matches_brute_force(self, ray_session, seed, n, m):
        ds, pairs, nodes = _random_graph(seed, n, m)
        got = luby_mis(ds).to_pandas()
        got_map = dict(zip(got["node"], got["mis_round"]))
        assert got_map == _brute_mis(pairs, nodes)

    def test_independent_and_maximal(self, ray_session):
        ds, pairs, nodes = _random_graph(3, 40, 120)
        mis = set(luby_mis(ds).to_pandas()["node"])
        for a, b in pairs:
            assert not (a in mis and b in mis)
        nbr = {x: set() for x in nodes}
        for a, b in pairs:
            nbr[a].add(b)
            nbr[b].add(a)
        for x in nodes:
            assert x in mis or nbr[x] & mis, f"node {x} not dominated"

    def test_convergence_assertion(self, ray_session):
        # a path graph with adversarial luck still finishes in 1-2 rounds
        # at this size; num_rounds=0 must raise, never silently truncate.
        ds, _, _ = _random_graph(5, 10, 12)
        with pytest.raises(RuntimeError, match="undecided"):
            luby_mis(ds, num_rounds=0)


class TestGreedyMatching:
    @pytest.mark.parametrize("seed,n,m", [(7, 60, 180), (2, 30, 55)])
    def test_matches_brute_force(self, ray_session, seed, n, m):
        ds, pairs, _ = _random_graph(seed, n, m)
        got = greedy_matching(ds).to_pandas()
        got_map = {
            (int(r.u), int(r.v)): int(r.match_round) for r in got.itertuples()
        }
        assert got_map == _brute_matching(pairs)

    def test_is_maximal_matching(self, ray_session):
        ds, pairs, _ = _random_graph(11, 40, 100)
        got = greedy_matching(ds).to_pandas()
        matched = {(int(r.u), int(r.v)) for r in got.itertuples()}
        nodes_used = [x for e in matched for x in e]
        assert len(nodes_used) == len(set(nodes_used))  # a matching
        covered = set(nodes_used)
        for e in pairs:  # maximal: no live edge remains
            assert e[0] in covered or e[1] in covered
