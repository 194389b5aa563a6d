"""Embedding stage and JSONL base64 source."""

import base64
import json

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.ops.embed import HashedNgramEmbedder, embed_documents
from pdf_extractor_ray.sources.jsonl import decode_jsonl_batch, read_pages_jsonl


class TestEmbedder:
    def test_deterministic_and_normalized(self):
        emb = HashedNgramEmbedder(dim=32)
        a = emb.embed_one("the quick brown fox")
        b = emb.embed_one("the quick brown fox")
        assert np.allclose(a, b)
        assert np.isclose(np.linalg.norm(a), 1.0)

    def test_similar_texts_closer_than_different(self):
        emb = HashedNgramEmbedder(dim=32)
        a = emb.embed_one("the quick brown fox jumps over the lazy dog")
        b = emb.embed_one("the quick brown fox jumps over the lazy cat")
        c = emb.embed_one("completely unrelated text about databases")
        assert a @ b > a @ c

    def test_pipeline_stage(self, ray_session):
        import ray.data as rd

        ds = rd.from_items([{"doc_id": i, "text": f"document number {i}"} for i in range(20)])
        out = pa.concat_tables(
            embed_documents(ds, dim=16, concurrency=2).iter_batches(batch_format="pyarrow")
        )
        vecs = out["embedding"].to_pylist()
        assert len(vecs) == 20 and all(len(v) == 16 for v in vecs)

    def test_embed_then_ann(self, ray_session):
        """Composition: embed a corpus → ANN search finds the source doc."""
        import ray.data as rd

        from pdf_extractor_ray.ops.ann import brute_force_topk

        texts = [f"unique document about topic {i} with words {i*7}" for i in range(50)]
        ds = rd.from_items([{"vec_id": i, "text": t} for i, t in enumerate(texts)])
        embedded = embed_documents(ds, dim=32, concurrency=2)
        emb = HashedNgramEmbedder(dim=32)
        queries = np.stack([emb.embed_one(texts[3]), emb.embed_one(texts[17])])
        out = brute_force_topk(embedded, queries, k=1, query_ids=[3, 17])
        assert out[out["rank"] == 1]["vec_id"].tolist() == [3, 17]


class TestJsonlSource:
    def test_decode_batch(self):
        batch = pa.Table.from_pylist(
            [
                {
                    "url": "u://1", "warc_ts": 1_000_000,
                    "payload_b64": base64.b64encode(b"<p>hello</p>").decode(),
                    "text": "hello", "lang": "en",
                },
                {
                    "url": "u://2", "warc_ts": 2_000_000,
                    "payload_b64": "!!!not-base64!!!",
                    "text": "", "lang": "en",
                },
            ]
        )
        out = decode_jsonl_batch(batch)
        assert out["html"][0].as_py() == b"<p>hello</p>"
        assert out["html"][1].as_py() is None
        assert out["ingest_error"][1].as_py().startswith("invalid base64")

    def test_read_jsonl_end_to_end(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.extract import extraction_pipeline

        rows = []
        for i in range(10):
            html = f"<html><body><p>main content of document {i} with enough words</p></body></html>"
            rows.append(
                {
                    "url": f"u://{i}", "warc_ts": i * 1_000_000,
                    "payload_b64": base64.b64encode(html.encode()).decode(),
                    "text": f"main content of document {i} with enough words",
                    "lang": "en",
                }
            )
        path = tmp_path / "pages.jsonl"
        path.write_text("\n".join(json.dumps(r) for r in rows))
        pages = read_pages_jsonl(str(path))
        out = pa.concat_tables(
            extraction_pipeline(pages).iter_batches(batch_format="pyarrow")
        )
        texts = dict(zip(out["url"].to_pylist(), out["extracted_text"].to_pylist()))
        assert texts["u://3"] == "main content of document 3 with enough words"


class TestQuantizationRecall:
    """ops/embed.py quantization_recall: brute-force parity across
    layouts; identical-arm case gives full overlap."""

    def test_parity(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.cluster import OFFSET, SCALE
        from pdf_extractor_ray.ops.embed import quantization_recall

        rng = np.random.Generator(np.random.Philox(61))
        n, d, Q, K = 60, 8, 4, 5
        vecs = (rng.normal(size=(n, d)) * 0.3).astype(np.float32)
        items = [
            {"vec_id": i, "embedding": [float(v) for v in vecs[i]]}
            for i in range(n)
        ]
        c = np.floor((vecs.astype(np.float64) + OFFSET) * SCALE).astype(
            np.int64) - int(OFFSET * SCALE)
        m = np.abs(c).max(axis=1)
        q = np.sign(c) * ((127 * np.abs(c)) // np.maximum(m, 1)[:, None])
        want = {}
        for qi in range(Q):
            sets = []
            for mat in (c, q):
                sc = mat @ mat[qi].T
                order = sorted(
                    (j for j in range(n) if j != qi),
                    key=lambda j: (-sc[j], j))
                sets.append(set(order[:K]))
            want[qi] = len(sets[0] & sets[1])
        for parts in (1, 5):
            ds = rd.from_items(items).repartition(parts)
            df = quantization_recall(ds, n_queries=Q, k=K)
            got = dict(zip(df.vec_id, df.overlap))
            assert got == want

    def test_identity_when_unquantized(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.embed import quantization_recall

        # axis-aligned unit-ish vectors: int8 preserves the ranking
        items = [
            {"vec_id": i, "embedding": [0.4 if j == i % 4 else 0.0
                                        for j in range(4)]}
            for i in range(12)
        ]
        df = quantization_recall(rd.from_items(items), n_queries=3, k=4)
        assert (df.overlap == 4).all()
