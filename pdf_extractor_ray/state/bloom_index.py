"""Bloom-filter variant of the sharded seen-index (the billion-key path).

Same interface and deterministic crc32 sharding as
:class:`..state.seen_index.ShardedSeenIndex`, but each shard holds a fixed
``m``-bit numpy filter with ``k`` hash functions instead of a Python set —
O(1) memory per key-class regardless of key count. Membership answers may
be FALSE POSITIVES (a never-seen key reported seen → its row is skipped);
there are never false negatives, so output is never wrong, only
conservatively smaller. Size the filter for the expected key count:
``m_bits ≈ -n · ln(p) / ln(2)²`` (n=10⁹, p=1% → ~1.2 GiB across shards).

Hashes: double hashing over two independent blake2b-64 digests
(h_i = h1 + i·h2), the standard Kirsch–Mitzenmacher construction.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import ray


def _hash_pair(key: str) -> tuple[int, int]:
    d1 = hashlib.blake2b(key.encode(), digest_size=8, salt=b"bloom-h1").digest()
    d2 = hashlib.blake2b(key.encode(), digest_size=8, salt=b"bloom-h2").digest()
    return int.from_bytes(d1, "little"), int.from_bytes(d2, "little") | 1


@ray.remote(num_cpus=0.1)
class _BloomShard:
    def __init__(self, m_bits: int, k_hashes: int):
        self.m = m_bits
        self.k = k_hashes
        self.bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
        self.n_added = 0

    def _positions(self, key: str) -> np.ndarray:
        h1, h2 = _hash_pair(key)
        idx = (h1 + np.arange(self.k, dtype=np.uint64) * np.uint64(h2)) % np.uint64(self.m)
        return idx.astype(np.int64)

    def check_and_add(self, keys: list[str]) -> list[bool]:
        out = []
        for key in keys:
            pos = self._positions(key)
            byte_idx, bit = pos >> 3, (np.uint8(1) << (pos & 7).astype(np.uint8))
            present = bool(np.all(self.bits[byte_idx] & bit))
            if not present:
                # unbuffered |= — duplicate byte indices (two hash positions
                # in one byte) would silently drop bits with plain fancy
                # assignment
                np.bitwise_or.at(self.bits, byte_idx, bit)
                self.n_added += 1
            out.append(present)
        return out

    def contains(self, keys: list[str]) -> list[bool]:
        out = []
        for key in keys:
            pos = self._positions(key)
            byte_idx, bit = pos >> 3, (np.uint8(1) << (pos & 7).astype(np.uint8))
            out.append(bool(np.all(self.bits[byte_idx] & bit)))
        return out

    def approx_size(self) -> int:
        return self.n_added


class BloomSeenIndex:
    """Sharded Bloom membership index; drop-in for ShardedSeenIndex where
    approximate membership (no false negatives) is acceptable."""

    def __init__(self, n_shards: int = 8, m_bits_per_shard: int = 1 << 22, k_hashes: int = 7):
        self.n_shards = n_shards
        self.shards = [
            _BloomShard.remote(m_bits_per_shard, k_hashes) for _ in range(n_shards)
        ]

    def _scatter(self, keys: list[str]):
        by_shard: list[list[str]] = [[] for _ in range(self.n_shards)]
        positions: list[list[int]] = [[] for _ in range(self.n_shards)]
        for pos, key in enumerate(keys):
            s = zlib.crc32(key.encode()) % self.n_shards
            by_shard[s].append(key)
            positions[s].append(pos)
        return by_shard, positions

    def check_and_add(self, keys: list[str]) -> list[bool]:
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

    def approx_size(self) -> int:
        return sum(ray.get([s.approx_size.remote() for s in self.shards]))


def filter_unseen_bloom(ds, index: BloomSeenIndex, key_col: str = "url"):
    """Like state.seen_index.filter_unseen but approximate: a false positive
    skips a row (conservative), never admits a duplicate."""

    def admit(batch: pa.Table) -> pa.Table:
        seen = index.check_and_add(batch[key_col].to_pylist())
        return batch.filter(pa.array([not s for s in seen]))

    return ds.map_batches(admit, batch_format="pyarrow")
