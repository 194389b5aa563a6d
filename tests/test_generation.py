"""Fixture-generation determinism: the distributed generator (Ray range →
map_batches) must produce exactly the single-process corpus, row for row —
generation is keyed by doc_id, never by worker/order."""

import pyarrow as pa


def test_distributed_generation_matches_single_process(ray_session):
    from pdf_extractor_ray.fixtures import generate_pages
    from pdf_extractor_ray.sources.pages import synthesize_pages_dataset

    single = generate_pages(100, seed=42)
    distributed = pa.concat_tables(
        synthesize_pages_dataset(100, seed=42, parallelism=7).iter_batches(
            batch_format="pyarrow"
        )
    )
    s = {single["url"][i].as_py(): (single["html"][i].as_py(), single["text"][i].as_py())
         for i in range(len(single))}
    d = {distributed["url"][i].as_py(): (distributed["html"][i].as_py(), distributed["text"][i].as_py())
         for i in range(len(distributed))}
    assert s == d
