"""Crawl-snapshot operators (ops/snapshots.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _versions_table():
    rows = [
        # url, ts, text — b's newest is in a DIFFERENT "block position"
        ("a", 100, "a-old"), ("a", 300, "a-new"), ("a", 200, "a-mid"),
        ("b", 50, "b-only"),
        ("c", 2, "c-old"), ("c", 9, "c-new"),
    ]
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows]),
            pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("us")),
            pa.array([r[2] for r in rows]),
        ],
        names=["url", "warc_ts", "text"],
    )


class TestLatestPerKey:
    def test_keeps_max_ts_row(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.snapshots import latest_per_key

        out = (
            latest_per_key(rd.from_arrow(_versions_table()))
            .to_pandas()
            .sort_values("url")
        )
        assert out["text"].tolist() == ["a-new", "b-only", "c-new"]

    def test_across_blocks(self, ray_session):
        """Winner and losers in different blocks: the partial-max combiner
        alone cannot resolve this — the global groupby must."""
        import ray.data as rd

        from pdf_extractor_ray.ops.snapshots import latest_per_key

        t = _versions_table()
        ds = rd.from_arrow(t).repartition(6)  # ~1 row per block
        out = latest_per_key(ds).to_pandas().sort_values("url")
        assert out["text"].tolist() == ["a-new", "b-only", "c-new"]


class TestSnapshotDiff:
    def test_all_four_statuses(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.snapshots import snapshot_diff

        old = pa.Table.from_arrays(
            [pa.array(["same1", "gone", "edit"]), pa.array(["x", "y", "v1"])],
            names=["url", "text"],
        )
        new = pa.Table.from_arrays(
            [pa.array(["same1", "edit", "born"]), pa.array(["x", "v2", "z"])],
            names=["url", "text"],
        )
        out = (
            snapshot_diff(rd.from_arrow(old), rd.from_arrow(new))
            .to_pandas()
            .set_index("url")["status"]
            .to_dict()
        )
        assert out == {
            "same1": "same", "gone": "removed", "edit": "changed", "born": "added",
        }

    def test_binary_content(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.snapshots import snapshot_diff

        old = pa.Table.from_arrays(
            [pa.array(["u"]), pa.array([b"\x00\x01"], pa.binary())],
            names=["url", "html"],
        )
        new = pa.Table.from_arrays(
            [pa.array(["u"]), pa.array([b"\x00\x02"], pa.binary())],
            names=["url", "html"],
        )
        out = snapshot_diff(
            rd.from_arrow(old), rd.from_arrow(new), content_col="html"
        ).to_pandas()
        assert out["status"].tolist() == ["changed"]


class TestSnapshotEditDistance:
    """ops/snapshots.py snapshot_edit_distance: changed-only rows, byte
    (UTF-8 code unit) semantics, DP kernel vs brute force, layouts."""

    def test_changed_only_and_values(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.snapshots import snapshot_edit_distance

        old = rd.from_items(
            [
                {"url": "a", "text": "kitten"},
                {"url": "b", "text": "same text"},
                {"url": "c", "text": "old only"},
                {"url": "d", "text": "café"},
            ]
        ).repartition(2)
        new = rd.from_items(
            [
                {"url": "a", "text": "sitting"},
                {"url": "b", "text": "same text"},
                {"url": "e", "text": "new only"},
                {"url": "d", "text": "cafe"},
            ]
        ).repartition(3)
        out = (
            snapshot_edit_distance(old, new)
            .to_pandas().sort_values("url").reset_index(drop=True)
        )
        # b unchanged, c removed, e added -> only a and d appear
        assert out["url"].tolist() == ["a", "d"]
        assert out["edit_distance"].tolist() == [3, 2]  # café→cafe = 2 BYTES
        assert out["bytes_old"].tolist() == [6, 5]      # é is 2 bytes
        assert out["bytes_new"].tolist() == [7, 4]

    def test_dp_matches_brute_force(self):
        import itertools

        from pdf_extractor_ray.ops.snapshots import _lev_bytes

        def brute(a: bytes, b: bytes) -> int:
            d = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
            for i in range(len(a) + 1):
                d[i][0] = i
            for j in range(len(b) + 1):
                d[0][j] = j
            for i in range(1, len(a) + 1):
                for j in range(1, len(b) + 1):
                    d[i][j] = min(
                        d[i - 1][j] + 1,
                        d[i][j - 1] + 1,
                        d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                    )
            return d[len(a)][len(b)]

        words = [b"", b"a", b"ab", b"abc", b"bca", b"aabbcc", b"ccbbaa", b"abcabc"]
        for a, b in itertools.product(words, repeat=2):
            assert _lev_bytes(a, b) == brute(a, b), (a, b)

    def test_regimes_agree(self, ray_session):
        """broadcast_cap=0 forces the sorted-lookup semi-join — identical
        rows to the default broadcast regime."""
        import ray.data as rd

        from pdf_extractor_ray.ops.snapshots import snapshot_edit_distance

        old = rd.from_items(
            [{"url": f"u{i}", "text": f"text {i} alpha beta"} for i in range(30)]
        ).repartition(3)
        new = rd.from_items(
            [
                {"url": f"u{i}", "text": f"text {i} alpha beta" + ("!" if i % 4 == 0 else "")}
                for i in range(30)
            ]
        ).repartition(4)
        a = (
            snapshot_edit_distance(old, new)
            .to_pandas().sort_values("url").reset_index(drop=True)
        )
        b = (
            snapshot_edit_distance(old, new, broadcast_cap=0)
            .to_pandas().sort_values("url").reset_index(drop=True)
        )
        assert a.equals(b)
        assert (a["edit_distance"] == 1).all() and len(a) == 8


class TestChangeRate:
    """Recrawl change-rate estimation: brute force + layouts + ties."""

    DAY = 86_400_000_000
    BASE = 1_700_000_000_000_000

    def _rows(self):
        rows = []
        for v in range(4):  # a: changes every capture
            rows.append(("a", self.BASE + v * self.DAY, f"a v{v}"))
        for v in range(3):  # b: never changes
            rows.append(("b", self.BASE + v * self.DAY, "same"))
        rows.append(("c", self.BASE, "only"))  # single capture
        rows.append(("d", self.BASE, "x"))
        rows.append(("d", self.BASE + 2 * self.DAY, "y"))
        return rows

    @pytest.mark.parametrize("nparts", [1, 4])
    def test_matches_brute_force(self, ray_session, nparts):
        import ray.data as rd

        from pdf_extractor_ray.ops.snapshots import change_rate

        rows = self._rows()
        now = self.BASE + 10 * self.DAY
        ds = rd.from_items(
            [{"url": u, "warc_ts": t, "text": c} for u, t, c in rows]
        ).repartition(nparts)
        got = (
            change_rate(ds, now, ts_col="warc_ts")
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        # brute force
        from collections import defaultdict

        hist = defaultdict(list)
        for u, t, c in rows:
            hist[u].append((t, c))
        want = {}
        for u, caps in hist.items():
            caps.sort()
            ch = sum(
                1 for i in range(1, len(caps)) if caps[i][1] != caps[i - 1][1]
            )
            span = caps[-1][0] - caps[0][0]
            age = now - caps[-1][0]
            prio = (ch * age * 1000) // span if span > 0 and ch > 0 else 0
            want[u] = (len(caps), ch, span, age, prio)
        assert {
            r.url: (
                int(r.n_caps),
                int(r.n_changes),
                int(r.span_us),
                int(r.age_us),
                int(r.priority_milli),
            )
            for r in got.itertuples()
        } == want

    def test_equal_ts_ties_are_deterministic(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.snapshots import change_rate

        rows = [
            {"url": "t", "warc_ts": self.BASE, "text": "p"},
            {"url": "t", "warc_ts": self.BASE, "text": "q"},
            {"url": "t", "warc_ts": self.BASE + self.DAY, "text": "q"},
        ]
        outs = []
        for nparts in (1, 2, 3):
            ds = rd.from_items(rows).repartition(nparts)
            outs.append(
                change_rate(ds, self.BASE + 2 * self.DAY, ts_col="warc_ts")
                .to_pandas()
                .sort_values("url")
                .reset_index(drop=True)
            )
        assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])


class TestRevisitSavings:
    """ops/snapshots.py revisit_savings: brute-force lag parity across
    layouts, all-same and all-distinct extremes, binary payloads."""

    def _brute(self, rows):
        from collections import defaultdict

        per = defaultdict(list)
        for url, ts, c in rows:
            per[url].append((ts, c))
        out = {}
        for url, caps in per.items():
            caps.sort()
            prev = None
            tot = st = 0
            for _, c in caps:
                b = len(c.encode() if isinstance(c, str) else c)
                tot += b
                if prev is None or prev != c:
                    st += b
                prev = c
            out[url] = (len(caps), tot, st, tot - st)
        return out

    def test_random_layouts(self, ray_session):
        import ray.data as rd

        rng = np.random.Generator(np.random.Philox(41))
        rows = [
            (f"u{int(rng.integers(0, 9))}", int(t),
             f"pay{int(rng.integers(0, 3))}x")
            for t in range(120)
        ]
        from pdf_extractor_ray.ops.snapshots import revisit_savings

        want = self._brute(rows)
        for parts in (1, 6):
            ds = rd.from_items(
                [{"url": u, "warc_ts": t, "text": c} for u, t, c in rows]
            ).repartition(parts)
            got = {
                r["url"]: (r["n_caps"], r["total_bytes"],
                           r["stored_bytes"], r["saved_bytes"])
                for r in revisit_savings(ds).take_all()
            }
            assert got == want

    def test_extremes(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.snapshots import revisit_savings

        same = [{"url": "a", "warc_ts": t, "text": "zz"} for t in range(5)]
        out = revisit_savings(rd.from_items(same)).take_all()[0]
        assert (out["total_bytes"], out["stored_bytes"],
                out["saved_bytes"]) == (10, 2, 8)

        uniq = [{"url": "b", "warc_ts": t, "text": f"v{t}"}
                for t in range(4)]
        out = revisit_savings(rd.from_items(uniq)).take_all()[0]
        assert out["saved_bytes"] == 0 and out["stored_bytes"] == 8
