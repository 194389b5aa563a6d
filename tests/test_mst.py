"""Borůvka MSF (ops/mst.py) vs brute-force Kruskal under the same
(w, u, v) total edge order."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_extractor_ray.ops.mst import boruvka_msf, canonical_weighted_edges


def _kruskal(agg):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = set()
    for w, a, b in sorted((w, a, b) for (a, b), w in agg.items()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            mst.add((a, b, w))
    return mst


def _agg_edges(u, v, w):
    from collections import defaultdict

    agg = defaultdict(int)
    for a, b, ww in zip(u, v, w):
        if a != b:
            agg[(min(a, b), max(a, b))] += int(ww)
    return agg


class TestBoruvkaMsf:
    @pytest.mark.parametrize("seed,n,m", [(4, 40, 120), (9, 15, 20)])
    def test_matches_kruskal(self, ray_session, seed, n, m):
        rng = np.random.RandomState(seed)
        u = rng.randint(0, n, m).astype(np.int64)
        v = rng.randint(0, n, m).astype(np.int64)
        w = rng.randint(1, 9, m).astype(np.int64)  # heavy ties on purpose
        ds = ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array(u), pa.array(v), pa.array(w)], names=["u", "v", "w"]
            )
        ).repartition(5)
        got = boruvka_msf(ds).to_pandas()
        got_set = {(int(r.u), int(r.v), int(r.w)) for r in got.itertuples()}
        assert len(got) == len(got_set)  # no duplicate forest edges
        assert got_set == _kruskal(_agg_edges(u, v, w))

    def test_disconnected_forest(self, ray_session):
        # two components + an isolated self-loop node: forest, not tree
        rows = [(0, 1, 5), (1, 2, 3), (10, 11, 1), (20, 20, 9)]
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
        got = boruvka_msf(ds).to_pandas()
        assert {(int(r.u), int(r.v)) for r in got.itertuples()} == {
            (0, 1), (1, 2), (10, 11)
        }

    def test_parallel_edges_sum(self, ray_session):
        ds = ray.data.from_arrow(
            pa.Table.from_arrays(
                [
                    pa.array([0, 1, 0], pa.int64()),
                    pa.array([1, 0, 2], pa.int64()),
                    pa.array([4, 3, 5], pa.int64()),
                ],
                names=["u", "v", "w"],
            )
        )
        can = canonical_weighted_edges(ds).to_pandas().sort_values(["u", "v"])
        assert can.values.tolist() == [[0, 1, 7], [0, 2, 5]]


class TestSingleLinkage:
    def test_equals_thresholded_subgraph_components(self, ray_session):
        from pdf_extractor_ray.ops.mst import single_linkage_clusters

        rng = np.random.RandomState(2)
        n, m = 30, 80
        u = rng.randint(0, n, m).astype(np.int64)
        v = rng.randint(0, n, m).astype(np.int64)
        w = rng.randint(1, 20, m).astype(np.int64)
        ds = ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array(u), pa.array(v), pa.array(w)], names=["u", "v", "w"]
            )
        ).repartition(4)
        tau = 6
        got = single_linkage_clusters(ds, threshold=tau).to_pandas()
        got_map = dict(zip(got["node"].astype(int), got["cluster"].astype(int)))

        # brute: components of the FULL subgraph with summed weights <= tau
        agg = _agg_edges(u, v, w)
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        nodes = {x for e in agg for x in e}
        for (a, b), ww in agg.items():
            if ww <= tau:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        exp = {x: find(x) for x in nodes}
        # normalize both to min-member representative
        from collections import defaultdict

        def canon(mapping):
            groups = defaultdict(set)
            for k, lab in mapping.items():
                groups[lab].add(k)
            return {frozenset(g) for g in groups.values()}

        assert canon(got_map) == canon(exp)
        assert set(got_map) == nodes
