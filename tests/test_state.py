"""Sharded seen-index: exactly-once admission, incremental-run semantics."""

import pyarrow as pa
import pytest

from pdf_extractor_ray.state import ShardedSeenIndex, filter_unseen


@pytest.fixture()
def index(ray_session):
    return ShardedSeenIndex(n_shards=4)


class TestShardedSeenIndex:
    def test_check_and_add(self, index):
        keys = [f"u{i}" for i in range(100)]
        first = index.check_and_add(keys)
        assert not any(first)
        second = index.check_and_add(keys)
        assert all(second)
        assert index.size() == 100

    def test_contains_and_dump(self, index):
        index.add(["a", "b"])
        assert index.contains(["a", "b", "c"]) == [True, True, False]
        assert index.dump() == ["a", "b"]

    def test_filter_unseen_across_runs(self, ray_session):
        import ray.data as rd

        index = ShardedSeenIndex(n_shards=4)
        run1 = rd.from_items([{"url": f"u{i}"} for i in range(50)]).repartition(4)
        out1 = pa.concat_tables(
            filter_unseen(run1, index).iter_batches(batch_format="pyarrow")
        )
        assert len(out1) == 50

        # Second run: 30 overlapping urls + 20 new ones.
        run2 = rd.from_items(
            [{"url": f"u{i}"} for i in range(20, 70)]
        ).repartition(4)
        out2 = pa.concat_tables(
            filter_unseen(run2, index).iter_batches(batch_format="pyarrow")
        )
        assert sorted(out2["url"].to_pylist()) == sorted(f"u{i}" for i in range(50, 70))
        assert index.size() == 70

    def test_duplicates_within_one_run_admitted_once(self, ray_session):
        import ray.data as rd

        index = ShardedSeenIndex(n_shards=4)
        rows = [{"url": f"u{i % 10}"} for i in range(100)]
        ds = rd.from_items(rows).repartition(8)
        out = pa.concat_tables(
            filter_unseen(ds, index).iter_batches(batch_format="pyarrow")
        )
        # exactly one admission per distinct key, regardless of block layout
        assert sorted(out["url"].to_pylist()) == sorted(f"u{i}" for i in range(10))
