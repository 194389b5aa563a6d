"""Pages-table sources.

``read_pages`` is the production source: parquet shards of
``(url, warc_ts, html, text, lang)`` with column pruning at the read (only
requested columns leave storage — at 100 TB the difference between reading
5 columns and reading 2 is the job). ``synthesize_pages_dataset`` generates
the deterministic FIXTURES.md corpus *as a Ray Data job* (range →
map_batches) so arbitrarily large test corpora never bottleneck on the
driver.
"""

from __future__ import annotations

import ray.data as rd

from ..fixtures import pages_batch

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(paths: str | list[str], columns: list[str] | None = None):
    """Read pages parquet shards with column pruning."""
    return rd.read_parquet(paths, columns=columns or PAGES_COLUMNS)


def synthesize_pages_dataset(n_rows: int, seed: int = 42, parallelism: int = -1):
    """Deterministic synthetic corpus as a distributed generation job."""
    ds = rd.range(n_rows, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(
        lambda batch: pages_batch(batch["id"], seed=seed),
        batch_format="numpy",
        batch_size=256,
    )
