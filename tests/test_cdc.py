"""Gear CDC chunking vs a brute-force reference."""

import numpy as np
import pyarrow as pa
import ray

from pdf_extractor_ray.ops.cdc import _P, cdc_chunks, cdc_dedup_stats
from pdf_extractor_ray.ops.text import splitmix64_np


def brute_chunks(text, window=16, mask_bits=5):
    cp = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    n = len(cp)
    g = splitmix64_np(cp)
    mask = np.uint64((1 << mask_bits) - 1)
    cuts = []
    for i in range(window - 1, n - 1):
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for j in range(window):
                h += g[i - j] << np.uint64(j)
        if (h & mask) == 0:
            cuts.append(i)
    starts = [0] + [c + 1 for c in cuts]
    ends = [c + 1 for c in cuts] + [n]
    out = []
    for s, e in zip(starts, ends):
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for k in range(s, e):
                h = h * _P + cp[k]
        out.append((s, e - s, int(np.int64(h))))
    return out


class TestCdcChunks:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(7)
        docs = []
        base = "the common crawl corpus carries much repeated boilerplate "
        for i in range(12):
            extra = "".join(
                chr(int(c)) for c in rng.integers(97, 123, rng.integers(0, 80))
            )
            docs.append((i, extra + base * (i % 3 + 1)))
        docs.append((12, "short"))
        docs.append((13, ""))
        tbl = pa.Table.from_pylist([{"doc_id": d, "text": t} for d, t in docs])
        out = cdc_chunks(ray.data.from_arrow(tbl).repartition(4)).take_all()
        got = {}
        for r in out:
            got.setdefault(r["doc_id"], []).append(
                (r["start"], r["length"], r["chunk_hash"])
            )
        for d, t in docs:
            exp = brute_chunks(t) if t else []
            assert sorted(got.get(d, [])) == sorted(exp), d

    def test_shifted_duplicate_run_shares_interior_chunks(self, ray_session):
        # The CDC property fixed-size chunking lacks: a shifted shared
        # run still yields identical interior chunks.
        run = " ".join(f"token{i:04d}" for i in range(200))
        docs = [(0, "PREFIX-A " + run), (1, "a different longer prefix " + run)]
        tbl = pa.Table.from_pylist([{"doc_id": d, "text": t} for d, t in docs])
        out = cdc_chunks(ray.data.from_arrow(tbl)).take_all()
        sets = {0: set(), 1: set()}
        for r in out:
            sets[r["doc_id"]].add((r["length"], r["chunk_hash"]))
        assert len(sets[0] & sets[1]) >= 3

    def test_dedup_stats_consistent(self, ray_session):
        docs = [(i, "identical body of text " * 10) for i in range(5)]
        tbl = pa.Table.from_pylist([{"doc_id": d, "text": t} for d, t in docs])
        stats = cdc_dedup_stats(ray.data.from_arrow(tbl)).to_pylist()[0]
        assert stats["total_chunks"] == 5 * stats["distinct_chunks"]
        assert stats["total_chars"] == sum(len(t) for _, t in docs)
        assert stats["distinct_chars"] * 5 == stats["total_chars"]
