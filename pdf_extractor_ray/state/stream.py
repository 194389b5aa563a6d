"""Streaming-shaped processing: incremental aggregation state in actors.

Ray Data is a batch engine (no watermarks/event-time triggers — SURVEY.md
§2.9: the reference has no streaming either). For stream-shaped workloads
the guide idiom is: treat the input as an ordered, partitioned log, feed
micro-batches through stateful actors keyed by hash bucket, and checkpoint
actor state between micro-batches. This module implements that shape:

- ``StreamAggregator`` actors hold running per-key aggregates
  (count + value-cents sum), sharded by key hash.
- ``run_streaming_counts`` replays an events Dataset as event-time-ordered
  micro-batches (simulated arrival), updating the actors incrementally.
- Convergence guarantee (tested): after the full replay, the incremental
  state equals the batch ``groupby`` answer exactly — the aggregates are
  commutative monoids, so arrival batching cannot change the result.
"""

from __future__ import annotations

import zlib
from collections import defaultdict

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


@ray.remote(num_cpus=0.1)
class StreamAggregator:
    """One shard of running per-key aggregates."""

    def __init__(self) -> None:
        self._counts: dict[str, int] = defaultdict(int)
        self._cents: dict[str, int] = defaultdict(int)

    def update(self, keys: list[str], cents: list[int]) -> None:
        for key, c in zip(keys, cents):
            self._counts[key] += 1
            self._cents[key] += c

    def state(self) -> dict[str, tuple[int, int]]:
        return {k: (self._counts[k], self._cents[k]) for k in self._counts}


class ShardedStreamAggregator:
    def __init__(self, n_shards: int = 4):
        self.n_shards = n_shards
        self.shards = [StreamAggregator.remote() for _ in range(n_shards)]

    def update_batch(self, keys: list[str], cents: list[int]) -> None:
        by_shard: dict[int, tuple[list[str], list[int]]] = {}
        for key, c in zip(keys, cents):
            s = zlib.crc32(key.encode()) % self.n_shards
            by_shard.setdefault(s, ([], []))
            by_shard[s][0].append(key)
            by_shard[s][1].append(c)
        ray.get(
            [self.shards[s].update.remote(k, c) for s, (k, c) in by_shard.items()]
        )

    def final_state(self) -> pd.DataFrame:
        merged: dict[str, list[int]] = {}
        for state in ray.get([s.state.remote() for s in self.shards]):
            for key, (n, cents) in state.items():
                if key in merged:
                    merged[key][0] += n
                    merged[key][1] += cents
                else:
                    merged[key] = [n, cents]
        return pd.DataFrame(
            {
                "event_type": sorted(merged),
                "n_events": [merged[k][0] for k in sorted(merged)],
                "value_cents": [merged[k][1] for k in sorted(merged)],
            }
        )


def run_streaming_counts(
    ds,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    micro_batch_rows: int = 2048,
    n_shards: int = 4,
) -> pd.DataFrame:
    """Replay an events Dataset as event-time-ordered micro-batches through
    the sharded incremental aggregators; returns the final per-key state.

    The event-time sort is the "ordered log" assumption made explicit; at
    true streaming scale each partition's log arrives ordered and each
    micro-batch is one consumption step.
    """
    agg = ShardedStreamAggregator(n_shards)
    ordered = ds.sort(ts_col)
    for batch in ordered.iter_batches(
        batch_size=micro_batch_rows, batch_format="pyarrow"
    ):
        cents = pc.cast(
            pc.round(
                pc.multiply(batch[value_col], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        agg.update_batch(batch[key_col].to_pylist(), cents.to_pylist())
    return agg.final_state()
