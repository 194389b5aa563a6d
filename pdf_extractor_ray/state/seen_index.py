"""Sharded seen-key index: incremental-processing membership state.

Use case (corpus scale): a recurring crawl-extraction job must skip urls a
previous run already produced output for, without re-reading the previous
output. The reference has no such state (each request independent,
SURVEY.md §3.4); at 10^12 documents it is the difference between an
incremental run and a full recompute.

Design rules for shared state on a cluster:
- **Sharded**, not global: keys hash to one of N actors (same stable crc32
  as the pipeline's ``partition_id``), so no actor is a hot spot and memory
  scales horizontally.
- **Batch APIs only**: one ``check_and_add`` call per (batch × shard), never
  per key — actor RPCs are the expensive unit.
- **Deterministic sharding** means a key always lands on the same shard, so
  membership answers are exact (no cross-shard races for a given key).
- Persistence: ``snapshot``/``restore`` move shard contents to/from the
  partitioned checkpoint layout so the index survives runs.

For read-mostly membership at much larger scale, swap the per-shard set for
a Bloom filter (same interface; accepted false-positive rate = skipped
work, never wrong output).
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import ray


@ray.remote(num_cpus=0.1)
class _SeenShard:
    """One shard: owns the keys whose crc32 % n_shards == shard_id."""

    def __init__(self) -> None:
        self._seen: set[str] = set()

    def check_and_add(self, keys: list[str]) -> list[bool]:
        """For each key: True if it was already present (seen before this
        call); unseen keys are added atomically within the shard."""
        out = []
        seen = self._seen
        for key in keys:
            if key in seen:
                out.append(True)
            else:
                seen.add(key)
                out.append(False)
        return out

    def contains(self, keys: list[str]) -> list[bool]:
        seen = self._seen
        return [k in seen for k in keys]

    def add(self, keys: list[str]) -> int:
        self._seen.update(keys)
        return len(self._seen)

    def size(self) -> int:
        return len(self._seen)

    def dump(self) -> list[str]:
        return sorted(self._seen)

    def restore(self, keys: list[str]) -> int:
        self._seen = set(keys)
        return len(self._seen)


class ShardedSeenIndex:
    """Driver-side handle over N shard actors."""

    def __init__(self, n_shards: int = 8, name_prefix: str | None = None):
        self.n_shards = n_shards
        opts = {}
        self.shards = [
            _SeenShard.options(
                **({"name": f"{name_prefix}:{i}", "get_if_exists": True} if name_prefix else {}),
                **opts,
            ).remote()
            for i in range(n_shards)
        ]

    def _shard_of(self, key: str) -> int:
        return zlib.crc32(key.encode()) % self.n_shards

    def _scatter(self, keys: list[str]) -> tuple[list[list[str]], list[list[int]]]:
        by_shard: list[list[str]] = [[] for _ in range(self.n_shards)]
        positions: list[list[int]] = [[] for _ in range(self.n_shards)]
        for pos, key in enumerate(keys):
            s = self._shard_of(key)
            by_shard[s].append(key)
            positions[s].append(pos)
        return by_shard, positions

    def check_and_add(self, keys: list[str]) -> list[bool]:
        """Batch membership-test-and-insert across shards (one RPC per
        non-empty shard, issued concurrently)."""
        by_shard, positions = self._scatter(keys)
        futures = {
            s: self.shards[s].check_and_add.remote(by_shard[s])
            for s in range(self.n_shards)
            if by_shard[s]
        }
        out = [False] * len(keys)
        for s, fut in futures.items():
            for pos, seen in zip(positions[s], ray.get(fut)):
                out[pos] = seen
        return out

    def contains(self, keys: list[str]) -> list[bool]:
        by_shard, positions = self._scatter(keys)
        futures = {
            s: self.shards[s].contains.remote(by_shard[s])
            for s in range(self.n_shards)
            if by_shard[s]
        }
        out = [False] * len(keys)
        for s, fut in futures.items():
            for pos, seen in zip(positions[s], ray.get(fut)):
                out[pos] = seen
        return out

    def add(self, keys: list[str]) -> None:
        by_shard, _ = self._scatter(keys)
        ray.get(
            [
                self.shards[s].add.remote(by_shard[s])
                for s in range(self.n_shards)
                if by_shard[s]
            ]
        )

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def dump(self) -> list[str]:
        out: list[str] = []
        for part in ray.get([s.dump.remote() for s in self.shards]):
            out.extend(part)
        return sorted(out)

    def snapshot(self, out_dir: str) -> None:
        """Persist shard contents as parquet (one file per shard, atomic
        rename) so the index survives runs — the state-layer analogue of
        the pipeline's partition checkpoints."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        for i, keys in enumerate(ray.get([s.dump.remote() for s in self.shards])):
            tmp = os.path.join(out_dir, f"shard={i}.parquet.tmp")
            pq.write_table(pa.table({"key": pa.array(keys, pa.string())}), tmp)
            os.replace(tmp, os.path.join(out_dir, f"shard={i}.parquet"))

    def restore(self, out_dir: str) -> int:
        """Load a snapshot written with the SAME n_shards (sharding is
        deterministic, so per-shard files restore 1:1)."""
        import os

        import pyarrow.parquet as pq

        futures = []
        for i in range(self.n_shards):
            path = os.path.join(out_dir, f"shard={i}.parquet")
            keys = (
                pq.read_table(path)["key"].to_pylist() if os.path.exists(path) else []
            )
            futures.append(self.shards[i].restore.remote(keys))
        return sum(ray.get(futures))


def filter_unseen(ds, index: ShardedSeenIndex, key_col: str = "url"):
    """Dataset stage: drop rows whose key the index has already seen, and
    mark the survivors as seen (exactly-once admission per key across the
    whole job, including duplicates arriving in different blocks).

    The actor handles ride into the UDF closure; each task issues one
    batched RPC per shard it touches.
    """

    def admit(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        seen = index.check_and_add(keys)
        mask = pa.array([not s for s in seen])
        return batch.filter(mask)

    return ds.map_batches(admit, batch_format="pyarrow")
