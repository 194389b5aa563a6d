"""Exact edit-distance similarity join (ops/editjoin.py) vs brute force."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_extractor_ray.ops.editjoin import edit_distance_join, lev_banded


def _lev(a: str, b: str) -> int:
    n, m = len(a), len(b)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[m]


class TestLevBanded:
    @pytest.mark.parametrize("cap", [1, 2, 3])
    def test_matches_full_dp_under_cap(self, cap):
        rng = np.random.RandomState(3)
        alpha = "abcde"
        for _ in range(300):
            a = "".join(rng.choice(list(alpha), rng.randint(0, 12)))
            b = "".join(rng.choice(list(alpha), rng.randint(0, 12)))
            d = _lev(a, b)
            got = lev_banded(a, b, cap)
            assert got == (d if d <= cap else cap + 1), (a, b, cap)

    def test_unicode_and_empty(self):
        assert lev_banded("", "", 2) == 0
        assert lev_banded("", "ab", 2) == 2
        assert lev_banded("héllo", "hello", 1) == 1
        assert lev_banded("aaaa", "aaaa", 0) == 0


def _brute_pairs(items, k):
    out = []
    for i, (ia, ka) in enumerate(items):
        for ib, kb in items[i + 1 :]:
            d = _lev(ka, kb)
            if d <= k:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                kaa, kbb = (ka, kb) if ia < ib else (kb, ka)
                out.append((a, b, kaa, kbb, d))
    return sorted(out)


def _run(items, k, parts=5):
    tab = pa.Table.from_arrays(
        [
            pa.array([i for i, _ in items], pa.int64()),
            pa.array([s for _, s in items], pa.string()),
        ],
        names=["doc_id", "key"],
    )
    ds = ray.data.from_arrow(tab).repartition(parts)
    df = edit_distance_join(ds, "key", k=k).to_pandas()
    return sorted(
        (int(r.id_a), int(r.id_b), r.key_a, r.key_b, int(r.dist))
        for r in df.itertuples()
    )


class TestEditDistanceJoin:
    @pytest.mark.parametrize("k", [1, 2])
    def test_random_short_keys(self, ray_session, k):
        rng = np.random.RandomState(11)
        items = [
            (i, "".join(rng.choice(list("abc0"), rng.randint(1, 9))))
            for i in range(120)
        ]
        assert _run(items, k) == _brute_pairs(items, k)

    def test_repeat_heavy_keys_occurrence_numbering(self, ray_session):
        # repeated grams would collapse without occurrence indices;
        # recall must survive strings like "aaaa" vs "aaab".
        items = [(0, "aaaa"), (1, "aaab"), (2, "aaaaaa"), (3, "bbbb"), (4, "aaaa")]
        assert _run(items, 2) == _brute_pairs(items, 2)

    def test_empty_and_tiny_keys(self, ray_session):
        items = [(0, ""), (1, "a"), (2, "ab"), (3, ""), (4, "b")]
        assert _run(items, 1) == _brute_pairs(items, 1)

    @pytest.mark.parametrize("k", [1, 2])
    def test_forced_short_cap_band_regime_identical(self, ray_session, k):
        """short_cap=0 forces the length-band short-key regime; pairs
        must match brute force (full recall) and the single-bucket
        default bit-exactly."""
        rng = np.random.RandomState(7)
        items = [
            (i, "".join(rng.choice(list("abc0"), rng.randint(0, 6))))
            for i in range(80)
        ]
        tab = pa.Table.from_arrays(
            [
                pa.array([i for i, _ in items], pa.int64()),
                pa.array([s for _, s in items], pa.string()),
            ],
            names=["doc_id", "key"],
        )
        ds = ray.data.from_arrow(tab).repartition(5)
        forced = sorted(
            (int(r.id_a), int(r.id_b), r.key_a, r.key_b, int(r.dist))
            for r in edit_distance_join(ds, "key", k=k, short_cap=0)
            .to_pandas()
            .itertuples()
        )
        assert forced == _brute_pairs(items, k)
        assert forced == _run(items, k)

    def test_vocab_cap_raises(self, ray_session):
        items = [(i, f"key-{i:04d}") for i in range(50)]
        tab = pa.Table.from_arrays(
            [
                pa.array([i for i, _ in items], pa.int64()),
                pa.array([s for _, s in items], pa.string()),
            ],
            names=["doc_id", "key"],
        )
        ds = ray.data.from_arrow(tab)
        with pytest.raises(RuntimeError, match="vocab"):
            edit_distance_join(ds, "key", k=1, vocab_cap=3)


class TestBlockingRecall:
    def test_recall_bounds_and_exact_case(self, ray_session):
        from pdf_extractor_ray.ops.editjoin import blocking_recall

        # adjacent-when-sorted near-dups: SN at window 2 finds them all
        items = [(i, f"team-{i // 2:03d}" + ("" if i % 2 == 0 else "x"))
                 for i in range(40)]
        tab = pa.Table.from_arrays(
            [
                pa.array([i for i, _ in items], pa.int64()),
                pa.array([s for _, s in items], pa.string()),
            ],
            names=["doc_id", "key"],
        )
        ds = ray.data.from_arrow(tab).repartition(3)
        df = blocking_recall(ds, "key", k=1, window=3)
        assert df["n_truth"][0] >= 20
        assert 0 <= df["n_found"][0] <= df["n_truth"][0]
        assert df["recall_milli"][0] == 1000 * df["n_found"][0] // df["n_truth"][0]
