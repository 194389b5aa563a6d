"""Inverted-index op: posting statistics vs a brute-force reference, with
segments straddling block boundaries (many small blocks)."""

from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.ops.index import inverted_index, token_doc_pairs

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "cat cat cat"),
    (3, ""),
    (4, None),
    (5, "THE Cat"),  # case folding
    (6, "mat the mat"),
]


def brute_force():
    post = defaultdict(dict)  # token -> {doc: tf}
    for d, t in DOCS:
        for w in (t or "").lower().split():
            post[w][d] = post[w].get(d, 0) + 1
    return post


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    ids, texts = zip(*DOCS)
    return rd.from_arrow(
        pa.table({"doc_id": list(ids), "text": list(texts)})
    ).repartition(6)


class TestTokenDocPairs:
    def test_distinct_pairs_with_tf(self, docs_ds):
        got = {
            (r["token"], r["doc_id"]): r["tf"]
            for r in token_doc_pairs(docs_ds).take_all()
        }
        want = {
            (tok, d): tf
            for tok, docs in brute_force().items()
            for d, tf in docs.items()
        }
        assert got == want


class TestInvertedIndex:
    def test_matches_brute_force(self, docs_ds):
        df = inverted_index(docs_ds, min_df=1).to_pandas()
        post = brute_force()
        assert set(df["token"]) == set(post)
        for r in df.itertuples(index=False):
            docs = post[r.token]
            assert r.df == len(docs)
            assert r.total_tf == sum(docs.values())
            assert r.sample_postings == ",".join(
                str(d) for d in sorted(docs)[:5]
            )

    def test_min_df_filters(self, docs_ds):
        df = inverted_index(docs_ds, min_df=3).to_pandas()
        post = brute_force()
        assert set(df["token"]) == {t for t, d in post.items() if len(d) >= 3}

    def test_sample_k_bounds_sample(self, docs_ds):
        df = inverted_index(docs_ds, min_df=1, sample_k=2).to_pandas()
        the = df[df["token"] == "the"].iloc[0]
        assert the["sample_postings"] == "0,1"
        assert the["df"] == 4  # docs 0, 1, 5, 6

    def test_layout_independent(self, ray_session):
        import ray.data as rd

        ids, texts = zip(*DOCS)
        tbl = pa.table({"doc_id": list(ids), "text": list(texts)})
        a = (
            inverted_index(rd.from_arrow(tbl).repartition(2))
            .to_pandas()
            .sort_values("token")
            .reset_index(drop=True)
        )
        b = (
            inverted_index(rd.from_arrow(tbl).repartition(7))
            .to_pandas()
            .sort_values("token")
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)


class TestPostingStore:
    def test_write_and_lookup(self, docs_ds, tmp_path):
        from pdf_extractor_ray.ops.index import lookup_postings, write_posting_store

        out = str(tmp_path / "store")
        write_posting_store(docs_ds, out, num_buckets=8)
        post = brute_force()
        for token in ("the", "cat", "mat"):
            got = lookup_postings(out, token, num_buckets=8)
            assert got["token"].to_pylist() == [token] * len(post[token])
            # postings are doc-id sorted within the bucket
            assert got["doc_id"].to_pylist() == sorted(post[token])
            assert dict(
                zip(got["doc_id"].to_pylist(), got["tf"].to_pylist())
            ) == post[token]

    def test_bucket_dirs_partition_tokens(self, docs_ds, tmp_path):
        import os

        from pdf_extractor_ray.ops.index import write_posting_store

        out = str(tmp_path / "store2")
        write_posting_store(docs_ds, out, num_buckets=4)
        buckets = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
        assert buckets  # hive-partitioned layout exists
        import pyarrow.dataset as pads

        from pdf_extractor_ray.stages.normalize import stable_hash_mod

        for b in buckets:
            toks = set(
                pads.dataset(f"{out}/{b}", format="parquet")
                .to_table(columns=["token"])["token"]
                .to_pylist()
            )
            want_bucket = int(b.split("=")[1])
            assert all(
                int(stable_hash_mod([t], 4)[0]) == want_bucket for t in toks
            )


class TestMergePostingStore:
    def test_merge_equals_full_rebuild(self, ray_session, tmp_path):
        import ray.data as rd

        from pdf_extractor_ray.ops.index import (
            lookup_postings, merge_posting_store, write_posting_store,
        )

        day1 = [
            {"doc_id": 1, "text": "alpha beta alpha"},
            {"doc_id": 2, "text": "beta gamma"},
        ]
        day2 = [
            {"doc_id": 3, "text": "alpha delta"},
            {"doc_id": 1, "text": "alpha"},  # re-crawl: tf accumulates
        ]
        store1 = str(tmp_path / "s1")
        merged = str(tmp_path / "m")
        full = str(tmp_path / "f")
        nb = 8
        write_posting_store(rd.from_items(day1), store1, num_buckets=nb)
        merge_posting_store(
            store1, rd.from_items(day2), merged, num_buckets=nb
        )
        # reference: one store built from the union with summed tf
        write_posting_store(
            rd.from_items(day1 + day2), full, num_buckets=nb
        )
        for tok in ("alpha", "beta", "gamma", "delta"):
            got = (
                lookup_postings(merged, tok, num_buckets=nb)
                .to_pandas().groupby("doc_id")["tf"].sum().to_dict()
            )
            want = (
                lookup_postings(full, tok, num_buckets=nb)
                .to_pandas().groupby("doc_id")["tf"].sum().to_dict()
            )
            assert got == want, tok
        # the accumulated re-crawl: doc 1 'alpha' tf = 2 + 1
        a = lookup_postings(merged, "alpha", num_buckets=nb).to_pandas()
        assert a.set_index("doc_id")["tf"].to_dict()[1] == 3


class TestVarbyte:
    def test_roundtrip_boundaries(self):
        import numpy as np

        from pdf_extractor_ray.ops.index import varbyte_decode, varbyte_encode

        # gap byte-width boundaries: 127/128, 16383/16384, 2097151/2097152
        for ids in (
            [0],
            [126],  # first gap 127 → 1 byte
            [127],  # first gap 128 → 2 bytes
            [0, 127],  # second gap 127
            [0, 128],  # second gap 128
            [16382],
            [16383],
            [0, 16383, 16383 + 2097151, 16383 + 2097152 + 5],
            list(range(0, 5000, 7)),
            [2**40, 2**40 + 1, 2**50],
        ):
            buf = varbyte_encode(np.array(ids, dtype=np.int64))
            out = varbyte_decode(buf)
            assert out.tolist() == ids, ids

    def test_roundtrip_random(self):
        import numpy as np

        rng = np.random.default_rng(7)
        from pdf_extractor_ray.ops.index import varbyte_decode, varbyte_encode

        for _ in range(200):
            n = int(rng.integers(0, 60))
            ids = np.unique(rng.integers(0, 1 << int(rng.integers(7, 45)), n))
            buf = varbyte_encode(ids)
            assert varbyte_decode(buf).tolist() == ids.tolist()

    def test_encode_sizes(self):
        import numpy as np

        from pdf_extractor_ray.ops.index import varbyte_encode

        assert varbyte_encode(np.array([], np.int64)) == b""
        # id 0 → gap 1 → single byte 0x01
        assert varbyte_encode(np.array([0], np.int64)) == b"\x01"
        # id 127 → gap 128 → little-endian groups (0, 1): 0x80 0x01
        assert varbyte_encode(np.array([127], np.int64)) == b"\x80\x01"

    def test_rejects_unsorted(self):
        import numpy as np

        from pdf_extractor_ray.ops.index import varbyte_encode

        with pytest.raises(ValueError):
            varbyte_encode(np.array([3, 3], np.int64))
        with pytest.raises(ValueError):
            varbyte_encode(np.array([-1, 2], np.int64))


class TestCompressPostings:
    def test_matches_brute_force(self, docs_ds):
        import numpy as np

        from pdf_extractor_ray.ops.index import (
            compress_postings,
            varbyte_decode,
            varbyte_encode,
        )

        out = compress_postings(docs_ds, min_df=1).to_pandas()
        post = brute_force()
        assert sorted(out["token"]) == sorted(post)
        for row in out.itertuples():
            ids = sorted(post[row.token])
            buf = varbyte_encode(np.array(ids, np.int64))
            assert row.df == len(ids)
            assert row.n_bytes == len(buf)
            assert row.byte_sum == sum(buf)
            assert row.first_id == ids[0]
            assert row.last_id == ids[-1]
            assert bytes(row.encoded) == buf
            assert varbyte_decode(bytes(row.encoded)).tolist() == ids

    def test_min_df(self, docs_ds):
        from pdf_extractor_ray.ops.index import compress_postings

        out = compress_postings(docs_ds, min_df=3).to_pandas()
        post = brute_force()
        assert sorted(out["token"]) == sorted(
            t for t, p in post.items() if len(p) >= 3
        )

    def test_many_blocks_large_ids(self, ray_session):
        """Segments straddling blocks + multi-byte gaps through the
        distributed path."""
        import numpy as np
        import ray.data as rd

        from pdf_extractor_ray.ops.index import compress_postings, varbyte_encode

        rng = np.random.default_rng(3)
        rows = []
        for tok in ("alpha", "beta", "gamma"):
            ids = np.unique(rng.integers(0, 1 << 30, 40))
            rows += [(int(i), tok) for i in ids]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                }
            )
        ).repartition(9)
        out = compress_postings(ds).to_pandas().set_index("token")
        for tok in ("alpha", "beta", "gamma"):
            ids = sorted({r[0] for r in rows if r[1] == tok})
            buf = varbyte_encode(np.array(ids, np.int64))
            assert bytes(out.loc[tok, "encoded"]) == buf
            assert out.loc[tok, "n_bytes"] == len(buf)
            assert out.loc[tok, "byte_sum"] == sum(buf)


class TestFrontCoding:
    """Front-coded URL dictionary (ops/index.py::front_code_urls)."""

    @staticmethod
    def _brute(urls, K):
        su = sorted(set(urls))

        def vbl(x):
            return 1 if x < 128 else (2 if x < 16384 else 3)

        raw = enc = ps = 0
        prev = None
        for g, u in enumerate(su):
            b = u.encode()
            raw += len(b)
            if g % K == 0:
                enc += vbl(len(b)) + len(b)
            else:
                pb = prev.encode()
                p = 0
                while p < min(len(b), len(pb)) and b[p] == pb[p]:
                    p += 1
                ps += p
                suf = len(b) - p
                enc += vbl(p) + vbl(suf) + suf
            prev = u
        return {"n": len(su), "raw_bytes": raw, "enc_bytes": enc,
                "prefix_sum": ps}

    @staticmethod
    def _run(urls, K=16, parts=4):
        import ray.data as rd

        from pdf_extractor_ray.ops.index import front_code_urls

        ds = rd.from_items([{"url": u} for u in urls]).repartition(parts)
        out = front_code_urls(ds, restart=K).take_all()
        return {k: sum(r[k] for r in out)
                for k in ("n", "raw_bytes", "enc_bytes", "prefix_sum")}

    def test_random_urls_match_brute(self, ray_session):
        rng = np.random.Generator(np.random.Philox(23))
        urls = [
            f"http://h{int(rng.integers(0, 9))}.example.com/"
            + "/".join(f"s{int(rng.integers(0, 5))}" for _ in range(int(rng.integers(1, 4))))
            for _ in range(120)
        ]
        for K in (1, 4, 16):
            assert self._run(urls, K) == self._brute(urls, K), K

    def test_unicode_lcp_is_bytewise(self, ray_session):
        urls = ["http://x/α1", "http://x/α2", "http://x/β", "http://x/a"]
        assert self._run(urls, 16, parts=2) == self._brute(urls, 16)

    def test_layout_independent(self, ray_session):
        urls = [f"http://site{i % 7}.example.com/p/{i}" for i in range(60)]
        assert self._run(urls, 8, parts=1) == self._run(urls, 8, parts=6)

    def test_pair_lcp_kernel(self):
        from pdf_extractor_ray.ops.index import _pair_lcp

        strs = [b"abcdef", b"abcxyz", b"", b"abc", b"abcdef"]
        flat = np.frombuffer(b"".join(strs), np.uint8)
        offs = np.cumsum([0] + [len(s) for s in strs]).astype(np.int64)
        prev = np.array([0, 1, 2, 3], dtype=np.int64)
        cur = np.array([1, 2, 3, 4], dtype=np.int64)
        got = _pair_lcp(flat, offs, prev, cur).tolist()
        assert got == [3, 0, 0, 3]


class TestEliasFano:
    def test_known_vector(self):
        # Vigna's worked example shape: ids [5,8,8..] must be strictly
        # ascending; use [2,3,5,7,11,24] → n=6, u=25, l=floor(log2(25/6))=2
        from pdf_extractor_ray.ops.index import ef_decode, ef_encode

        ids = np.array([2, 3, 5, 7, 11, 24], dtype=np.int64)
        low, high, l = ef_encode(ids)
        assert l == 2
        # low bits (l=2, LSB-first): 10 11 01 11 11 00 → bytes
        lows = [v & 3 for v in ids]
        exp = 0
        for i, lv in enumerate(lows):
            exp |= lv << (2 * i)
        assert int.from_bytes(low, "little") == exp
        # high positions: (v>>2)+i = 0,1,3,4,6,11
        hi_bits = np.unpackbits(np.frombuffer(high, np.uint8), bitorder="little")
        assert list(np.flatnonzero(hi_bits)) == [0, 1, 3, 4, 6, 11]
        assert (ef_decode(low, high, len(ids), l) == ids).all()

    def test_roundtrip_regimes(self):
        from pdf_extractor_ray.ops.index import ef_decode, ef_encode

        rng = np.random.RandomState(3)
        cases = [
            np.array([0], dtype=np.int64),
            np.array([0, 1, 2, 3], dtype=np.int64),  # dense: l=0
            np.array([10**12], dtype=np.int64),  # huge universe, n=1
            np.sort(rng.choice(10**9, 500, replace=False)).astype(np.int64),
            np.arange(0, 10000, 1, dtype=np.int64),
        ]
        for ids in cases:
            low, high, l = ef_encode(ids)
            back = ef_decode(low, high, len(ids), l)
            assert (back == ids).all()
            n, last = len(ids), int(ids[-1])
            assert len(low) == (n * l + 7) // 8
            assert len(high) == ((last >> l) + n + 7) // 8

    def test_rejects_descending_and_negative(self):
        from pdf_extractor_ray.ops.index import ef_encode

        with pytest.raises(ValueError):
            ef_encode(np.array([3, 2], dtype=np.int64))
        with pytest.raises(ValueError):
            ef_encode(np.array([-1, 2], dtype=np.int64))

    def test_dataset_kernel_matches_per_list(self, docs_ds):
        from pdf_extractor_ray.ops.index import ef_decode, ef_encode, ef_postings

        out = ef_postings(docs_ds, min_df=1).to_pandas()
        post = brute_force()
        assert set(out["token"]) == set(post)
        for _, r in out.iterrows():
            ids = np.array(sorted(post[r["token"]]), dtype=np.int64)
            low, high, l = ef_encode(ids)
            assert r["df"] == len(ids)
            assert r["low_width"] == l
            assert bytes(r["low"]) == low
            assert bytes(r["high"]) == high
            assert r["encoded_bits"] == len(ids) * l + (int(ids[-1]) >> l) + len(ids)
            back = ef_decode(
                bytes(r["low"]), bytes(r["high"]), int(r["df"]), int(r["low_width"])
            )
            assert (back == ids).all()

    def test_min_df_filter(self, docs_ds):
        from pdf_extractor_ray.ops.index import ef_postings

        out = ef_postings(docs_ds, min_df=3).to_pandas()
        post = brute_force()
        assert set(out["token"]) == {t for t, d in post.items() if len(d) >= 3}
