"""Tests for ops.segments.sorted_segment_apply — the ordered per-key
aggregation primitive that replaces corpus-proportional map_groups."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.ops.segments import _segment_bounds, sorted_segment_apply


class TestSegmentBounds:
    def test_runs(self):
        s, e = _segment_bounds(np.array([1, 1, 2, 3, 3, 3]))
        assert s.tolist() == [0, 2, 3] and e.tolist() == [2, 3, 6]

    def test_empty(self):
        s, e = _segment_bounds(np.array([]))
        assert len(s) == 0 and len(e) == 0


def _make_count_block():
    # Nested so cloudpickle serializes it by VALUE (the tests/ dir is not
    # importable from Ray workers).
    def count_block(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        keys = batch["k"].to_numpy(zero_copy_only=False)
        vals = batch["v"].to_numpy(zero_copy_only=False)
        csum = np.concatenate(([0], np.cumsum(vals)))
        return pa.Table.from_arrays(
            [
                pa.array(keys[starts].astype(np.int64)),
                pa.array((ends - starts).astype(np.int64)),
                pa.array((csum[ends] - csum[starts]).astype(np.int64)),
            ],
            names=["k", "n", "total"],
        )

    return count_block


def _make_ds(n_keys=50, rows_per_key=7, blocks=16):
    import random

    import ray.data as rd

    rnd = random.Random(9)
    rows = []
    for k in range(n_keys):
        for j in range(rows_per_key):
            rows.append({"k": k, "v": k * 100 + j})
    rnd.shuffle(rows)
    return rd.from_items(rows).repartition(blocks)


EXPECTED = {
    k: (7, sum(k * 100 + j for j in range(7))) for k in range(50)
}


class TestSortedSegmentApply:
    def test_every_key_exactly_once(self, ray_session):
        """Groups straddling block edges (tiny blocks force many) must be
        deferred and aggregated exactly once, in sorted order."""
        out = sorted_segment_apply(
            _make_ds(), key_col="k", block_fn=_make_count_block(), within_cols=["v"]
        ).to_pandas()
        assert len(out) == 50
        got = {r.k: (r.n, r.total) for r in out.itertuples()}
        assert got == EXPECTED

    def test_fallback_regime(self, ray_session):
        """frag_cap=1 forces the per-group map_groups fallback — results
        must be identical."""
        out = sorted_segment_apply(
            _make_ds(),
            key_col="k",
            block_fn=_make_count_block(),
            within_cols=["v"],
            frag_cap=1,
        ).to_pandas()
        got = {r.k: (r.n, r.total) for r in out.itertuples()}
        assert got == EXPECTED

    def test_within_order_descending(self, ray_session):
        """within_cols order must hold inside each segment (top-1 gather)."""

        def top1(batch, starts, ends):
            keys = batch["k"].to_numpy(zero_copy_only=False)
            vals = batch["v"].to_numpy(zero_copy_only=False)
            return pa.Table.from_arrays(
                [
                    pa.array(keys[starts].astype(np.int64)),
                    pa.array(vals[starts].astype(np.int64)),
                ],
                names=["k", "top_v"],
            )

        out = sorted_segment_apply(
            _make_ds(),
            key_col="k",
            block_fn=top1,
            within_cols=["v"],
            descending=[True],
        ).to_pandas()
        got = dict(zip(out["k"], out["top_v"]))
        assert got == {k: k * 100 + 6 for k in range(50)}


class TestAttachLookup:
    """Sort-based lookup join (round 4): the exchange behind the dedup
    verify semi-join, the substr dup-hash semi-join and the string-id CC
    mapping stages."""

    def _tables(self, rd):
        queries = rd.from_arrow(
            pa.table(
                {
                    "k": ["a", "b", "a", "c", "b", "zz"],
                    "payload": [10, 20, 11, 30, 21, 99],
                }
            )
        ).repartition(3)
        table = rd.from_arrow(
            pa.table({"k": ["a", "b", "d"], "val": [1.5, 2.5, 4.5]})
        ).repartition(2)
        return queries, table

    def test_inner_lookup_attaches_vals(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import attach_lookup

        queries, table = self._tables(rd)
        out = attach_lookup(
            queries, table, key_col="k", val_cols=["val"], carry_cols=["payload"]
        ).to_pandas()
        # inner semantics: 'c'/'zz' queries dropped, 'd' table row unused
        got = sorted(zip(out["k"], out["payload"], out["val"]))
        assert got == [
            ("a", 10, 1.5),
            ("a", 11, 1.5),
            ("b", 20, 2.5),
            ("b", 21, 2.5),
        ]

    def test_semi_join_filter(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import attach_lookup

        queries, table = self._tables(rd)
        out = attach_lookup(
            queries, table, key_col="k", val_cols=[], carry_cols=["payload"]
        ).to_pandas()
        assert sorted(out["payload"]) == [10, 11, 20, 21]

    def test_anti_join_keeps_keyless_rows(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import attach_lookup

        queries, table = self._tables(rd)
        out = attach_lookup(
            queries, table, key_col="k", val_cols=[], carry_cols=["payload"],
            anti=True,
        ).to_pandas()
        # 'a'/'b' rows dropped (present in table), 'c'/'zz' kept
        assert sorted(out["payload"]) == [30, 99]
        with pytest.raises(ValueError, match="anti"):
            attach_lookup(
                queries, table, key_col="k", val_cols=["val"],
                carry_cols=["payload"], anti=True,
            )

    def test_no_matches_yields_empty(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import attach_lookup

        queries = rd.from_arrow(pa.table({"k": [1, 2], "payload": [5, 6]}))
        table = rd.from_arrow(pa.table({"k": [7], "val": [0.0]}))
        out = attach_lookup(
            queries, table, key_col="k", val_cols=["val"], carry_cols=["payload"]
        ).to_pandas()
        assert len(out) == 0


class TestCapPerKey:
    def test_cap_keeps_top_k_by_order(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import cap_per_key

        rows = [
            {"host": f"h{i % 4}", "doc_id": i, "score": i % 10}
            for i in range(80)
        ]
        out = cap_per_key(
            rd.from_items(rows).repartition(8),
            key_col="host",
            k=3,
            order_cols=["doc_id"],
        ).to_pandas()
        assert len(out) == 12
        for h in range(4):
            got = sorted(out[out["host"] == f"h{h}"]["doc_id"])
            assert got == [h, h + 4, h + 8]  # lowest 3 doc_ids per host

    def test_cap_descending(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import cap_per_key

        rows = [{"k": i % 2, "v": i} for i in range(20)]
        out = cap_per_key(
            rd.from_items(rows).repartition(4),
            key_col="k",
            k=2,
            order_cols=["v"],
            descending=[True],
        ).to_pandas()
        got = {k: sorted(g["v"]) for k, g in out.groupby("k")}
        assert got == {0: [16, 18], 1: [17, 19]}


class TestDistinctCountPerKey:
    def test_matches_python(self, ray_session):
        import collections

        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import distinct_count_per_key

        rng = np.random.default_rng(3)
        keys = [f"k{i % 7}" for i in range(500)]
        vals = [int(x) for x in rng.integers(0, 40, 500)]
        want = collections.defaultdict(set)
        for k, v in zip(keys, vals):
            want[k].add(v)
        ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(9)
        got = {
            r["k"]: r["n_distinct"]
            for r in distinct_count_per_key(ds, "k", "v").take_all()
        }
        assert got == {k: len(s) for k, s in want.items()}

    def test_single_value_keys(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import distinct_count_per_key

        ds = rd.from_arrow(
            pa.table({"k": ["a", "a", "b"], "v": [1, 1, 2]})
        ).repartition(3)
        got = {
            r["k"]: r["n_distinct"]
            for r in distinct_count_per_key(ds, "k", "v").take_all()
        }
        assert got == {"a": 1, "b": 1}


class TestRankPerKey:
    def test_ranks_and_slots_across_blocks(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import rank_per_key

        tbl = pa.table(
            {
                "host": ["a", "a", "a", "b", "a", "b"],
                "ts": [30, 10, 20, 5, 40, 1],
                "url": [f"u{i}" for i in range(6)],
            }
        )
        out = (
            rank_per_key(
                rd.from_arrow(tbl).repartition(3),
                key_col="host",
                within_cols=["ts"],
                carry_cols=["url", "ts"],
                slot_size=2,
            )
            .to_pandas()
            .sort_values(["host", "rank"])
        )
        a = out[out["host"] == "a"]
        assert a["ts"].tolist() == [10, 20, 30, 40]
        assert a["rank"].tolist() == [1, 2, 3, 4]
        assert a["slot"].tolist() == [0, 0, 1, 1]
        b = out[out["host"] == "b"]
        assert b["ts"].tolist() == [1, 5] and b["rank"].tolist() == [1, 2]

    def test_descending_order(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import rank_per_key

        tbl = pa.table({"k": ["x", "x"], "v": [1, 9]})
        out = (
            rank_per_key(
                rd.from_arrow(tbl), key_col="k", within_cols=["v"],
                carry_cols=["v"], descending=[True],
            )
            .to_pandas()
            .sort_values("rank")
        )
        assert out["v"].tolist() == [9, 1]


class TestProfileTable:
    """ops/profile.py: per-column stats vs hand counts; nulls; layouts."""

    def test_stats_with_nulls(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.profile import profile_table

        tbl = pa.table(
            {
                "a": pa.array([3, 1, None, 7, 1, None], pa.int64()),
                "s": pa.array(["x", None, "b", "x", "aa", "z"], pa.string()),
            }
        )
        for parts in (1, 4):
            out = {
                r["column"]: r
                for r in profile_table(
                    rd.from_arrow(tbl).repartition(parts), ["a", "s"]
                ).to_pylist()
            }
            assert out["a"]["n_rows"] == 6 and out["a"]["n_nulls"] == 2
            assert out["a"]["n_distinct"] == 3
            assert out["a"]["min_val"] == "1" and out["a"]["max_val"] == "7"
            assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 4
            assert out["s"]["min_val"] == "aa" and out["s"]["max_val"] == "z"


class TestStripRepeatedLines:
    def test_chrome_detection(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import strip_repeated_lines

        rows = []
        # doc 1: header on all 3 pages, footer on 2 of 3 (below min_pages)
        for p in range(3):
            foot = "\nfoot" if p < 2 else ""
            rows.append(
                {"doc_id": 1, "page_no": p, "text": f"HEAD\nbody {p}{foot}"}
            )
        # doc 2: single page — nothing can repeat across pages
        rows.append({"doc_id": 2, "page_no": 0, "text": "HEAD\nonly"})
        ds = rd.from_items(rows).repartition(2)
        out = (
            strip_repeated_lines(ds, min_pages=3)
            .to_pandas().sort_values(["doc_id", "page_no"]).reset_index(drop=True)
        )
        assert out.loc[0, "cleaned_text"] == "body 0\nfoot"
        assert out.loc[0, "n_dropped"] == 1
        assert out.loc[2, "cleaned_text"] == "body 2"
        # doc 2 untouched (its HEAD appears on one page only)
        assert out.loc[3, "cleaned_text"] == "HEAD\nonly"
        assert out.loc[3, "n_dropped"] == 0

    def test_duplicate_line_on_one_page_counts_once(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import strip_repeated_lines

        # "x" twice on page 0, once on page 1 -> distinct-page count 2 < 3
        rows = [
            {"doc_id": 1, "page_no": 0, "text": "x\nx\na"},
            {"doc_id": 1, "page_no": 1, "text": "x\nb"},
            {"doc_id": 1, "page_no": 2, "text": "c"},
        ]
        out = (
            strip_repeated_lines(rd.from_items(rows), min_pages=3)
            .to_pandas().sort_values("page_no").reset_index(drop=True)
        )
        assert out["cleaned_text"].tolist() == ["x\nx\na", "x\nb", "c"]


class TestModePerKey:
    def test_argmax_and_ties(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.segments import mode_per_key

        rows = (
            [{"k": "u1", "v": "click"}] * 3
            + [{"k": "u1", "v": "view"}] * 5
            + [{"k": "u2", "v": "b"}, {"k": "u2", "v": "a"}]  # tie -> 'a'
            + [{"k": "u3", "v": None}, {"k": "u3", "v": "solo"}]
        )
        out = (
            mode_per_key(rd.from_items(rows).repartition(3), "k", "v")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert list(zip(out["k"], out["mode"], out["mode_count"])) == [
            ("u1", "view", 5), ("u2", "a", 1), ("u3", "solo", 1),
        ]
