"""Integer-exact k-means: vs a brute-force bigint reference, invariant to
block layout, exact empty-cluster handling."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_extractor_ray.ops.cluster import (
    OFFSET,
    SCALE,
    kmeans_clusters,
    prototype_prune,
    semdedup,
)


def make_vectors(n: int, dim: int = 8, seed: int = 7) -> list[list[float]]:
    rng = np.random.Generator(np.random.Philox(seed))
    return (rng.standard_normal((n, dim)) * 0.3).astype(np.float32).tolist()


def brute_force(ids, vecs, k, iters):
    q = {
        i: [int(np.floor((np.float64(np.float32(x)) + OFFSET) * SCALE)) for x in v]
        for i, v in zip(ids, vecs)
    }
    order = sorted(ids)
    cents = {c: list(q[order[c]]) for c in range(min(k, len(order)))}

    def dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for _ in range(iters):
        members = {c: [] for c in cents}
        for i in ids:
            best = min(cents, key=lambda c: (dist(q[i], cents[c]), c))
            members[best].append(i)
        for c, ms in members.items():
            if ms:
                dim = len(cents[c])
                cents[c] = [
                    sum(q[i][d] for i in ms) // len(ms) for d in range(dim)
                ]
    out = {}
    for i in ids:
        best = min(cents, key=lambda c: (dist(q[i], cents[c]), c))
        n, m, s = out.get(best, (0, None, 0))
        out[best] = (
            n + 1,
            i if m is None else min(m, i),
            s + dist(q[i], cents[best]) // SCALE,
        )
    return [
        {"cluster_id": c, "n_members": v[0], "min_vec_id": v[1], "checksum": v[2]}
        for c, v in sorted(out.items())
    ]


IDS = list(range(40))
VECS = make_vectors(40)


@pytest.mark.parametrize("nparts", [1, 4, 11])
def test_kmeans_matches_brute_force(ray_session, nparts):
    tbl = pa.Table.from_pydict(
        {
            "vec_id": pa.array(IDS, pa.int64()),
            "embedding": pa.array(VECS, pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(nparts)
    got = kmeans_clusters(ds, k=3, iters=2).to_pylist()
    assert got == brute_force(IDS, VECS, k=3, iters=2)


def test_kmeans_empty_raises(ray_session):
    tbl = pa.Table.from_pydict(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    with pytest.raises(ValueError):
        kmeans_clusters(ray.data.from_arrow(tbl), k=3, iters=1)


def test_kmeans_k_exceeding_n(ray_session):
    """k > n degrades to n singleton-seeded clusters, all assignments
    exact (each point is its own centroid after iteration 1)."""
    tbl = pa.Table.from_pydict(
        {
            "vec_id": pa.array([5, 9], pa.int64()),
            "embedding": pa.array(
                [[0.1, 0.2], [-0.3, 0.4]], pa.list_(pa.float32())
            ),
        }
    )
    out = kmeans_clusters(ray.data.from_arrow(tbl), k=4, iters=1).to_pylist()
    assert [r["n_members"] for r in out] == [1, 1]
    assert [r["min_vec_id"] for r in out] == [5, 9]
    assert all(r["checksum"] == 0 for r in out)


def brute_semdedup(ids, vecs, k, iters, num=999, den=1000):
    """Replay: integer-Lloyd assignment, then within-cluster exact
    big-int cosine pairs + min-id union-find."""
    q = {
        i: [int(np.floor((np.float64(np.float32(x)) + OFFSET) * SCALE)) for x in v]
        for i, v in zip(ids, vecs)
    }
    qs = {
        i: [int(np.floor(np.float64(np.float32(x)) * SCALE)) for x in v]
        for i, v in zip(ids, vecs)
    }
    order = sorted(ids)
    cents = {c: list(q[order[c]]) for c in range(min(k, len(order)))}

    def dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for _ in range(iters):
        members = {c: [] for c in cents}
        for i in ids:
            best = min(cents, key=lambda c: (dist(q[i], cents[c]), c))
            members[best].append(i)
        for c, ms in members.items():
            if ms:
                dim = len(cents[c])
                cents[c] = [
                    sum(q[i][d] for i in ms) // len(ms) for d in range(dim)
                ]
    assign = {
        i: min(cents, key=lambda c: (dist(q[i], cents[c]), c)) for i in ids
    }
    rep = {i: i for i in ids}

    def find(x):
        while rep[x] != x:
            rep[x] = rep[rep[x]]
            x = rep[x]
        return x

    sids = sorted(ids)
    for ai in range(len(sids)):
        for bi in range(ai + 1, len(sids)):
            a, b = sids[ai], sids[bi]
            if assign[a] != assign[b]:
                continue
            dot = sum(x * y for x, y in zip(qs[a], qs[b]))
            na2 = sum(x * x for x in qs[a])
            nb2 = sum(x * x for x in qs[b])
            if dot < 0 or na2 == 0 or nb2 == 0:
                continue
            if dot * dot * den * den >= num * num * na2 * nb2:
                ra, rb = find(a), find(b)
                if ra != rb:
                    rep[max(ra, rb)] = min(ra, rb)
    return [
        {
            "vec_id": i,
            "cluster_id": assign[i],
            "rep_id": find(i),
            "is_duplicate": find(i) != i,
        }
        for i in sorted(ids)
    ]


class TestSemDedup:
    """SemDeDup: within-cluster exact-cosine dedup vs a brute-force
    replay; exact copies collapse to the lowest id, across block layouts."""

    @pytest.mark.parametrize("nparts", [1, 5])
    def test_matches_brute_force_with_planted_copies(self, ray_session, nparts):
        ids = list(IDS)
        vecs = [list(v) for v in VECS]
        # exact copies of ids 0..9 under ids 100..109: same cluster,
        # cosine exactly 1 -> duplicates with rep = original id
        for i in range(10):
            ids.append(100 + i)
            vecs.append(list(VECS[i]))
        tbl = pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        got = (
            semdedup(ds, k=3, iters=2)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
            .to_dict("records")
        )
        want = brute_semdedup(ids, vecs, k=3, iters=2)
        assert got == want
        by_id = {r["vec_id"]: r for r in got}
        for i in range(10):
            assert by_id[100 + i]["is_duplicate"]
            assert by_id[100 + i]["rep_id"] == i
            assert by_id[100 + i]["cluster_id"] == by_id[i]["cluster_id"]

    def test_no_duplicates_when_threshold_unreachable(self, ray_session):
        tbl = pa.Table.from_pydict(
            {
                "vec_id": pa.array(IDS, pa.int64()),
                "embedding": pa.array(VECS, pa.list_(pa.float32())),
            }
        )
        out = semdedup(
            ray.data.from_arrow(tbl), k=2, iters=1
        ).to_pandas()
        # random gaussians: no pair at cosine >= 0.999
        assert not out["is_duplicate"].any()
        assert (out["rep_id"] == out["vec_id"]).all()


def brute_prototype_prune(ids, vecs, k, iters, num, den):
    """Replay: integer-Lloyd assignment + distances, then within-cluster
    (dist DESC, id ASC) rank; keep ceil(n * num / den)."""
    q = {
        i: [int(np.floor((np.float64(np.float32(x)) + OFFSET) * SCALE)) for x in v]
        for i, v in zip(ids, vecs)
    }
    order = sorted(ids)
    cents = {c: list(q[order[c]]) for c in range(min(k, len(order)))}

    def dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for _ in range(iters):
        members = {c: [] for c in cents}
        for i in ids:
            best = min(cents, key=lambda c: (dist(q[i], cents[c]), c))
            members[best].append(i)
        for c, ms in members.items():
            if ms:
                dim = len(cents[c])
                cents[c] = [
                    sum(q[i][d] for i in ms) // len(ms) for d in range(dim)
                ]
    rows = []
    for i in ids:
        best = min(cents, key=lambda c: (dist(q[i], cents[c]), c))
        rows.append((best, -dist(q[i], cents[best]), i))
    out = []
    for cid in sorted({r[0] for r in rows}):
        group = sorted(r for r in rows if r[0] == cid)
        n_keep = (len(group) * num + den - 1) // den
        for rank, (c, negd, i) in enumerate(group, 1):
            out.append(
                {
                    "vec_id": i,
                    "cluster_id": c,
                    "dist": -negd,
                    "rank": rank,
                    "kept": rank <= n_keep,
                }
            )
    return sorted(out, key=lambda r: r["vec_id"])


class TestPrototypePrune:
    """D4 prototype pruning: within-cluster farthest-kept ranking vs a
    brute-force replay, across block layouts and keep fractions."""

    @pytest.mark.parametrize("nparts", [1, 5])
    @pytest.mark.parametrize("num,den", [(1, 2), (3, 4)])
    def test_matches_brute_force(self, ray_session, nparts, num, den):
        tbl = pa.Table.from_pydict(
            {
                "vec_id": pa.array(IDS, pa.int64()),
                "embedding": pa.array(VECS, pa.list_(pa.float32())),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        got = (
            prototype_prune(ds, k=3, iters=2, keep_num=num, keep_den=den)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
            .to_dict("records")
        )
        assert got == brute_prototype_prune(IDS, VECS, k=3, iters=2, num=num, den=den)

    def test_keep_all(self, ray_session):
        tbl = pa.Table.from_pydict(
            {
                "vec_id": pa.array(IDS, pa.int64()),
                "embedding": pa.array(VECS, pa.list_(pa.float32())),
            }
        )
        out = prototype_prune(
            ray.data.from_arrow(tbl), k=3, iters=1, keep_num=1, keep_den=1
        ).to_pandas()
        assert out["kept"].all()
        assert len(out) == len(IDS)


class TestQuantizeEmbeddings:
    """ops/embed.py quantize_embeddings: int8 range, element-level
    agreement with a brute-force reference, zero-vector edge."""

    def test_brute_force_agreement(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.cluster import OFFSET, SCALE
        from pdf_extractor_ray.ops.embed import quantize_embeddings

        rng = np.random.Generator(np.random.Philox(17))
        vecs = rng.normal(scale=0.4, size=(60, 16)).astype(np.float32)
        tbl = pa.Table.from_pydict(
            {
                "vec_id": pa.array(range(60), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
        out = (
            quantize_embeddings(rd.from_arrow(tbl).repartition(5))
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        center = int(OFFSET * SCALE)
        for i, v in enumerate(vecs):
            c = np.floor((v.astype(np.float64) + OFFSET) * SCALE).astype(np.int64) - center
            m = int(np.abs(c).max())
            q = np.sign(c) * (127 * np.abs(c) // max(m, 1))
            assert out.loc[i, "scale"] == m
            assert out.loc[i, "q_min"] == q.min()
            assert out.loc[i, "q_max"] == q.max()
            assert out.loc[i, "q_sum"] == q.sum()
            assert out.loc[i, "q_l1"] == np.abs(q).sum()
            assert out.loc[i, "err_sum"] == np.abs(127 * c - q * m).sum()
            assert -127 <= q.min() and q.max() <= 127
            # per-element reconstruction error bound: |127*c - q*m| < m
            assert (np.abs(127 * c - q * m) < max(m, 1)).all()

    def test_zero_vector(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.embed import quantize_embeddings

        tbl = pa.Table.from_pydict(
            {
                "vec_id": pa.array([0], pa.int64()),
                "embedding": pa.array([[0.0, 0.0, 0.0]], pa.list_(pa.float32())),
            }
        )
        r = quantize_embeddings(rd.from_arrow(tbl)).take_all()[0]
        assert r["scale"] == 0 and r["q_sum"] == 0 and r["err_sum"] == 0


class TestKCenterCoreset:
    """ops/cluster.py kcenter_coreset: brute greedy parity on the same
    quantization grid; lowest-id tie-breaks; seed = min id."""

    @staticmethod
    def _brute(ids, vecs, k):
        import numpy as np

        from pdf_extractor_ray.ops.cluster import OFFSET, SCALE
        q = np.floor((np.asarray(vecs, np.float64) + OFFSET) * SCALE
                     ).astype(np.int64)
        order = np.argsort(ids)
        ids = np.asarray(ids)[order]
        q = q[order]
        sel = [0]
        out = [(0, int(ids[0]), 0)]
        mind = np.full(len(ids), np.iinfo(np.int64).max, np.int64)
        for s in range(1, k):
            diff = q - q[sel[-1]][None, :]
            mind = np.minimum(mind, np.einsum("ij,ij->i", diff, diff))
            dm = mind.copy()
            dm[sel] = -1
            best = int(np.max(dm))
            cand = np.flatnonzero(dm == best)
            i = int(cand[np.argmin(ids[cand])])
            sel.append(i)
            out.append((s, int(ids[i]), best))
        return out

    def test_random_parity(self, ray_session):
        import numpy as np
        import ray.data as rd

        from pdf_extractor_ray.ops.cluster import kcenter_coreset

        rng = np.random.Generator(np.random.Philox(11))
        ids = list(range(20))
        vecs = rng.normal(0, 0.5, size=(20, 8)).clip(-1.9, 1.9)
        rows = [{"vec_id": i, "embedding": list(map(float, v))}
                for i, v in zip(ids, vecs)]
        for parts in (1, 4):
            df = kcenter_coreset(
                rd.from_items(rows).repartition(parts), k=5)
            got = list(zip(df.sel_order, df.vec_id, df.dist))
            want = self._brute(ids, vecs, 5)
            assert [(int(a), int(b), int(c)) for a, b, c in got] == want

    def test_tiebreak_lowest_id(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.cluster import kcenter_coreset

        # two identical far points: the lower id must be picked first
        rows = [
            {"vec_id": 0, "embedding": [0.0, 0.0]},
            {"vec_id": 7, "embedding": [1.0, 0.0]},
            {"vec_id": 3, "embedding": [1.0, 0.0]},
        ]
        df = kcenter_coreset(rd.from_items(rows), k=2)
        assert list(df.vec_id) == [0, 3]
