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
