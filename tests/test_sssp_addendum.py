"""Bellman–Ford SSSP (ops/mst.py) vs brute-force Dijkstra."""

import heapq

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_extractor_ray.ops.mst import bellman_ford


def _dijkstra(agg, source):
    adj = {}
    for (a, b), w in agg.items():
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        d, x = heapq.heappop(pq)
        if d > dist.get(x, float("inf")):
            continue
        for y, w in adj.get(x, ()):
            nd = d + w
            if nd < dist.get(y, float("inf")):
                dist[y] = nd
                heapq.heappush(pq, (nd, y))
    return dist


class TestBellmanFord:
    @pytest.mark.parametrize("seed", [0, 7])
    def test_matches_dijkstra_when_rounds_cover_hops(self, ray_session, seed):
        from collections import defaultdict

        rng = np.random.RandomState(seed)
        n, m = 25, 70
        u = rng.randint(0, n, m).astype(np.int64)
        v = rng.randint(0, n, m).astype(np.int64)
        w = rng.randint(1, 15, m).astype(np.int64)
        agg = defaultdict(int)
        for a, b, ww in zip(u, v, w):
            if a != b:
                agg[(min(a, b), max(a, b))] += int(ww)
        ds = ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array(u), pa.array(v), pa.array(w)], names=["u", "v", "w"]
            )
        ).repartition(4)
        # num_rounds = n guarantees convergence on any graph this size
        got = bellman_ford(ds, source=0, num_rounds=n).to_pandas()
        got_map = dict(zip(got["node"].astype(int), got["dist"].astype(int)))
        assert got_map == _dijkstra(dict(agg), 0)

    def test_unreached_nodes_absent(self, ray_session):
        rows = [(0, 1, 5), (2, 3, 1)]
        ds = ray.data.from_arrow(
            pa.Table.from_arrays(
                [
                    pa.array([r[0] for r in rows], pa.int64()),
                    pa.array([r[1] for r in rows], pa.int64()),
                    pa.array([r[2] for r in rows], pa.int64()),
                ],
                names=["u", "v", "w"],
            )
        )
        got = bellman_ford(ds, source=0, num_rounds=4).to_pandas()
        assert dict(zip(got["node"], got["dist"])) == {0: 0, 1: 5}
