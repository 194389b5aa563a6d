"""Winnowing fingerprint tests (ops/winnow.py)."""

import numpy as np
import pyarrow as pa


def brute_winnow(text, k=3, w=4):
    """Literal transcription of the paper's algorithm: every window of w
    k-gram hashes selects its rightmost minimum."""
    from pdf_extractor_ray.ops.winnow import _fnv_codepoints

    words = (text or "").lower().split()
    grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    hs = [_fnv_codepoints(g) for g in grams]
    sel = set()
    for s in range(len(hs) - w + 1):
        window = hs[s:s + w]
        m = min(window)
        # rightmost occurrence of the minimum
        j = max(i for i, v in enumerate(window) if v == m)
        sel.add((s + j, m))
    return sorted(sel)


class TestWinnowDoc:
    def test_matches_brute_force(self):
        from pdf_extractor_ray.ops.winnow import winnow_doc

        texts = [
            "the quick brown fox jumps over the lazy dog and runs away fast",
            "a b c d e f g h i j",
            "one two three four five six",
        ]
        for t in texts:
            pos, hs = winnow_doc(t)
            got = sorted(zip(pos.tolist(), hs.tolist()))
            assert got == brute_winnow(t)

    def test_tie_breaks_rightmost(self):
        from pdf_extractor_ray.ops.winnow import winnow_doc

        # identical k-grams everywhere -> every window's min is repeated;
        # the rightmost rule must pick the window's LAST position.
        t = " ".join(["spam"] * 12)   # 10 identical 3-grams
        pos, hs = winnow_doc(t)
        assert sorted(zip(pos.tolist(), hs.tolist())) == brute_winnow(t)
        # with all-equal hashes each window selects its last index:
        # windows s=0..6 select s+3 -> positions 3..9
        assert pos.tolist() == list(range(3, 10))

    def test_short_docs_empty(self):
        from pdf_extractor_ray.ops.winnow import winnow_doc

        for t in ("", "one two", "one two three four five six"[:0], None):
            pos, hs = winnow_doc(t)
            assert len(pos) == 0 and len(hs) == 0
        # exactly w grams -> exactly one window
        t = "a b c d e f"   # 4 grams, w=4
        pos, _ = winnow_doc(t)
        assert len(pos) >= 1

    def test_shared_substring_guarantee(self):
        """Any shared run of >= w + k - 1 words shares a fingerprint hash
        (the paper's guarantee)."""
        from pdf_extractor_ray.ops.winnow import winnow_doc

        shared = "alpha beta gamma delta epsilon zeta"  # 6 = w + k - 1
        d1 = "intro words here first. " + shared + " tail one"
        d2 = "totally different prefix text " + shared + " other ending"
        _, h1 = winnow_doc(d1)
        _, h2 = winnow_doc(d2)
        assert set(h1.tolist()) & set(h2.tolist())


class TestWinnowDataset:
    def test_explode_and_summary_agree(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.winnow import (
            winnow_fingerprints,
            winnow_summary_batch,
        )

        texts = [
            "the quick brown fox jumps over the lazy dog today",
            "short one",
            " ".join(f"w{i % 7}" for i in range(30)),
        ]
        tbl = pa.table({"doc_id": [0, 1, 2], "text": texts})
        rows = winnow_fingerprints(
            rd.from_arrow(tbl).repartition(2)
        ).take_all()
        summary = winnow_summary_batch(tbl)
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r["fp_hash"])
        for i in range(3):
            hs = by_doc.get(i, [])
            assert len(hs) == summary["n_fingerprints"].to_pylist()[i]
            s = sum(np.uint64(h).astype(object) for h in np.array(hs, np.int64).view(np.uint64)) if hs else 0
            assert int(s) % (1 << 63) == summary["fp_sum"].to_pylist()[i]
