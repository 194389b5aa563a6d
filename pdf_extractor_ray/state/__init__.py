"""Shared mutable state — the one layer where raw Ray actors are warranted.

Everything else in this engine is expressible as Dataset transforms; a
cross-run, cross-task mutable membership index (incremental crawl state:
"which urls did previous runs already process?") is not — it needs a shared
writable structure. ``ShardedSeenIndex`` implements it as N hash-sharded
actors, each owning a disjoint key space, batch APIs only.
"""

from .seen_index import ShardedSeenIndex, filter_unseen
