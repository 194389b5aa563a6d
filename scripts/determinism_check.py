"""Byte-identity at scale: run the flagship pipeline over the same corpus
under two different block layouts (different task boundaries, different
batch compositions) and compare a content hash of every (url,
extracted_text) pair.

Usage: python scripts/determinism_check.py [corpus_dir] [n_pages]
Defaults to the cached bench corpus (/tmp/graft_bench/pages_100000_v6),
generating it if missing.
"""

from __future__ import annotations

import hashlib
import sys


def corpus_hash(ds) -> tuple[str, int]:
    hashes = {}
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        for url, text in zip(
            batch["url"].to_pylist(), batch["extracted_text"].to_pylist()
        ):
            hashes[url] = hashlib.sha1((text or "").encode()).hexdigest()
    h = hashlib.sha256()
    for url in sorted(hashes):
        h.update(url.encode())
        h.update(hashes[url].encode())
    return h.hexdigest(), len(hashes)


def main() -> int:
    import ray
    import ray.data as rd

    sys.path.insert(0, ".")
    from pdf_extractor_ray.pipelines.extract import extraction_pipeline

    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_bench/pages_100000_v6"
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import os

    if not os.path.exists(corpus):
        from pdf_extractor_ray.sources.pages import synthesize_pages_dataset

        synthesize_pages_dataset(n_pages, seed=42, parallelism=64).write_parquet(corpus)

    layouts = {
        "as-read": rd.read_parquet(corpus),
        "repartition-17": rd.read_parquet(corpus).repartition(17),
        "repartition-333": rd.read_parquet(corpus).repartition(333),
    }
    results = {}
    for name, ds in layouts.items():
        digest, rows = corpus_hash(extraction_pipeline(ds))
        results[name] = (digest, rows)
        print(f"{name}: {rows} rows, sha256 {digest[:16]}…")
    digests = {d for d, _ in results.values()}
    ray.shutdown()
    if len(digests) == 1:
        print(f"BYTE-IDENTICAL across {len(layouts)} block layouts ✓")
        return 0
    print("MISMATCH between layouts ✗")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
