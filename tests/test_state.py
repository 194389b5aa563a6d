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


class TestSnapshotRestore:
    def test_snapshot_roundtrip(self, ray_session, tmp_path):
        a = ShardedSeenIndex(n_shards=4)
        a.add([f"k{i}" for i in range(200)])
        a.snapshot(str(tmp_path / "snap"))

        b = ShardedSeenIndex(n_shards=4)
        restored = b.restore(str(tmp_path / "snap"))
        assert restored == 200
        assert b.contains(["k0", "k199", "nope"]) == [True, True, False]


class TestBloomIndex:
    def test_no_false_negatives_and_low_fp(self, ray_session):
        from pdf_extractor_ray.state.bloom_index import BloomSeenIndex

        idx = BloomSeenIndex(n_shards=2, m_bits_per_shard=1 << 16)
        keys = [f"key-{i}" for i in range(2000)]
        first = idx.check_and_add(keys)
        assert not any(first[:100]) or sum(first) < 20  # near-zero FPs on empty filter
        # no false negatives: everything added reports present
        assert all(idx.contains(keys))
        # false-positive rate on fresh keys stays low at this load factor
        fresh = [f"other-{i}" for i in range(2000)]
        fp = sum(idx.contains(fresh))
        assert fp / len(fresh) < 0.05, fp

    def test_filter_unseen_bloom(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from pdf_extractor_ray.state.bloom_index import (
            BloomSeenIndex,
            filter_unseen_bloom,
        )

        idx = BloomSeenIndex(n_shards=2, m_bits_per_shard=1 << 16)
        ds = rd.from_items([{"url": f"u{i % 20}"} for i in range(100)]).repartition(4)
        out = pa.concat_tables(
            filter_unseen_bloom(ds, idx).iter_batches(batch_format="pyarrow")
        )
        admitted = out["url"].to_pylist()
        # never admits a key twice
        assert len(admitted) == len(set(admitted))
        assert len(admitted) <= 20


class TestStreamingAggregation:
    def test_incremental_equals_batch(self, ray_session):
        import ray.data as rd
        import pandas as pd

        from pdf_extractor_ray.state.stream import run_streaming_counts

        rows = [
            {
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i * 37),
                "event_type": f"t{i % 3}",
                "value": float(i % 7) + 0.25,
            }
            for i in range(500)
        ]
        ds = rd.from_items(rows).repartition(6)
        out = run_streaming_counts(ds, micro_batch_rows=64, n_shards=3)
        batch = (
            pd.DataFrame(rows)
            .assign(cents=lambda d: (d["value"] * 100).round().astype(int))
            .groupby("event_type")
            .agg(n_events=("value", "size"), value_cents=("cents", "sum"))
            .reset_index()
        )
        merged = out.merge(batch, on="event_type", suffixes=("", "_batch"))
        assert (merged["n_events"] == merged["n_events_batch"]).all()
        assert (merged["value_cents"] == merged["value_cents_batch"]).all()
