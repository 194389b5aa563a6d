"""Shard planner: distributed prefix sum vs a serial reference across
block layouts, oversized docs, and invalid budgets."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_extractor_ray.ops.shard import shard_plan


def brute_force(ids, sizes, cap):
    order = np.argsort(ids)
    out = {}
    off = 0
    for i in order:
        s = int(sizes[i])
        sid = off // cap
        n, b, f = out.get(sid, (0, 0, None))
        out[sid] = (n + 1, b + s, ids[i] if f is None else min(f, ids[i]))
        off += s
    return [
        {"shard_id": k, "n_docs": v[0], "total_bytes": v[1], "first_doc": v[2]}
        for k, v in sorted(out.items())
    ]


@pytest.mark.parametrize("nparts", [1, 3, 9])
def test_shard_plan_matches_serial_scan(ray_session, nparts):
    rng = np.random.Generator(np.random.Philox(11))
    ids = rng.permutation(60).astype(np.int64)  # unsorted input
    sizes = rng.integers(1, 400, 60).astype(np.int64)
    tbl = pa.Table.from_pydict({"doc_id": ids, "n_chars": sizes})
    ds = ray.data.from_arrow(tbl).repartition(nparts)
    got = shard_plan(ds, shard_bytes=1000).to_pylist()
    assert got == brute_force(ids, sizes, 1000)


def test_shard_plan_oversized_doc_gets_one_shard(ray_session):
    tbl = pa.Table.from_pydict(
        {"doc_id": [0, 1, 2], "n_chars": [10, 5000, 10]}
    )
    got = shard_plan(ray.data.from_arrow(tbl), shard_bytes=100).to_pylist()
    # doc 1 starts at offset 10 → shard 0; doc 2 starts at 5010 → shard 50.
    assert [r["shard_id"] for r in got] == [0, 50]
    assert got[0]["n_docs"] == 2 and got[1]["first_doc"] == 2


def test_shard_plan_invalid_budget_raises(ray_session):
    tbl = pa.Table.from_pydict({"doc_id": [0], "n_chars": [1]})
    with pytest.raises(ValueError):
        shard_plan(ray.data.from_arrow(tbl), shard_bytes=0)


class TestRendezvousShards:
    """ops/shard.py rendezvous_shards: brute-force HRW parity, the
    minimal-movement invariant, and layout independence."""

    def _brute(self, ids, s_old, s_new):
        from pdf_extractor_ray.ops.text import splitmix64_np

        rows = {}
        for i in ids:
            w = splitmix64_np(
                np.uint64(i) * np.uint64(64)
                + np.arange(max(s_old, s_new), dtype=np.uint64)
            )
            rows[i] = (int(np.argmax(w[:s_old])), int(np.argmax(w[:s_new])))
        return rows

    def test_parity_and_movement(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.shard import rendezvous_shards

        ids = list(range(400))
        want = self._brute(ids, 8, 9)
        for parts in (1, 5):
            ds = rd.from_items([{"doc_id": i} for i in ids]).repartition(parts)
            df = rendezvous_shards(ds, n_shards=8, n_shards_new=9)
            n_old = np.zeros(9, np.int64)
            n_new = np.zeros(9, np.int64)
            m_in = np.zeros(9, np.int64)
            m_out = np.zeros(9, np.int64)
            for o, n in want.values():
                n_old[o] += 1
                n_new[n] += 1
                if o != n:
                    m_in[n] += 1
                    m_out[o] += 1
            assert list(df.n_old) == list(n_old)
            assert list(df.n_new) == list(n_new)
            assert list(df.moved_in) == list(m_in)
            assert list(df.moved_out) == list(m_out)
            # HRW minimal movement: every move lands on the NEW shard
            assert (df.moved_in[:8] == 0).all()
            assert int(df.moved_in[8]) == int(df.moved_out.sum())

    def test_bounds(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from pdf_extractor_ray.ops.shard import rendezvous_shards

        ds = rd.from_items([{"doc_id": 1}])
        with _pytest.raises(ValueError, match="<= 64"):
            rendezvous_shards(ds, n_shards=65)


class TestZorder:
    """ops/shard.py zorder_layout / zorder_bucket_stats: brute-force
    Morton parity, locality effectiveness vs 1-D sort, bounds guard."""

    @staticmethod
    def _morton(x, y, bits=7):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    def test_assignment_parity(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.shard import zorder_layout

        rows = [(i, (i * 13) % 64, (i * 29) % 64) for i in range(200)]
        ds = rd.from_items(
            [{"doc_id": i, "x": x, "y": y} for i, x, y in rows]
        ).repartition(4)
        out = {r["doc_id"]: (r["z"], r["tier"])
               for r in zorder_layout(ds, "x", "y", n_buckets=4,
                                      bits=7).take_all()}
        zs = sorted((self._morton(x, y), i) for i, x, y in rows)
        want = {}
        for rk, (z, i) in enumerate(zs):
            want[i] = (z, rk * 4 // len(zs))
        assert out == want

    def test_locality_beats_1d(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.shard import zorder_bucket_stats

        rows = [(i, i % 64, (i * 37) % 64) for i in range(512)]
        ds = rd.from_items(
            [{"doc_id": i, "x": x, "y": y} for i, x, y in rows])
        st = zorder_bucket_stats(ds, "x", "y", n_buckets=8, bits=7)
        # z-order bounds BOTH dims well below the full 0..63 span
        assert (st.x_max - st.x_min).max() < 63
        assert (st.y_max - st.y_min).max() < 63
        assert int(st.n_rows.sum()) == 512

    def test_bounds_guard(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from pdf_extractor_ray.ops.shard import zorder_layout

        ds = rd.from_items([{"doc_id": 1, "x": 200, "y": 0}])
        with _pytest.raises(Exception, match="2\\^7"):
            zorder_layout(ds, "x", "y", bits=7).take_all()
