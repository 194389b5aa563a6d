"""Funnel op: hand-crafted sequences exercising strict-time semantics,
timestamp ties, out-of-order steps, and users straddling blocks."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.ops.funnel import funnel_stages


def events_table(rows):
    uids, tss, types = zip(*rows)
    return pa.table(
        {
            "user_id": list(uids),
            "ts": pa.array(
                [np.datetime64(1_000_000 * t, "us") for t in tss],
                pa.timestamp("us"),
            ),
            "event_type": list(types),
        }
    )


CASES = {
    # full funnel in order
    1: ([(1, 1, "view"), (1, 2, "click"), (1, 3, "purchase")], 3),
    # purchase BEFORE click: stops at click
    2: ([(2, 1, "view"), (2, 2, "purchase"), (2, 3, "click")], 2),
    # click tied with view's timestamp: strict > means NOT advanced
    3: ([(3, 5, "view"), (3, 5, "click"), (3, 9, "purchase")], 1),
    # later second view must not resurrect the funnel (earliest view counts)
    4: ([(4, 4, "click"), (4, 5, "view"), (4, 6, "view"), (4, 7, "click"),
         (4, 8, "purchase")], 3),
    # no view at all
    5: ([(5, 1, "click"), (5, 2, "purchase")], 0),
    # view only
    6: ([(6, 1, "view"), (6, 2, "error")], 1),
    # tie at step 2: purchase at same ts as chosen click -> not counted
    7: ([(7, 1, "view"), (7, 2, "click"), (7, 2, "purchase")], 2),
}


@pytest.mark.parametrize("parts", [1, 5, 13])
def test_funnel_cases(ray_session, parts):
    import ray.data as rd

    rows = [r for case, (rs, _) in sorted(CASES.items()) for r in rs]
    ds = rd.from_arrow(events_table(rows)).repartition(parts)
    got = {
        r["user_id"]: r["stage"] for r in funnel_stages(ds).take_all()
    }
    want = {case: stage for case, (_, stage) in CASES.items()}
    assert got == want


def test_funnel_custom_steps(ray_session):
    import ray.data as rd

    rows = [(1, 1, "signup"), (1, 2, "purchase"), (2, 1, "purchase")]
    ds = rd.from_arrow(events_table(rows))
    got = {
        r["user_id"]: r["stage"]
        for r in funnel_stages(ds, steps=("signup", "purchase")).take_all()
    }
    assert got == {1: 2, 2: 0}


class TestCohortRetention:
    def test_matches_brute_force(self, ray_session):
        import collections

        import ray.data as rd

        from pdf_extractor_ray.ops.funnel import cohort_retention

        WEEK = 7 * 24 * 3600
        rng = np.random.default_rng(11)
        rows = []
        for uid in range(12):
            first_week = int(rng.integers(0, 3))
            for _ in range(int(rng.integers(1, 9))):
                week = first_week + int(rng.integers(0, 4))
                sec = week * WEEK + int(rng.integers(0, WEEK))
                rows.append((uid, sec, "view"))
        # same (user, week) pair lands in MANY blocks (regression: the
        # per-block dedup alone double-counted distinct users)
        rows = rows * 3
        ds = rd.from_arrow(events_table(rows)).repartition(13)
        got = {
            (r["cohort"], r["offset"]): r["n_users"]
            for r in cohort_retention(ds).take_all()
        }
        act = {(u, s // WEEK) for u, s, _ in rows}
        coh = {}
        for u, w in act:
            coh[u] = min(coh.get(u, w), w)
        want = collections.Counter((coh[u], w - coh[u]) for u, w in act)
        assert got == dict(want)
        assert all(off >= 0 for _, off in got)


class TestTransitionCounts:
    """Markov transition top-k: brute force, boundaries, layouts."""

    EVENTS = [
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        (2, 1, "view"), (2, 2, "click"), (2, 3, "view"), (2, 4, "click"),
        (3, 5, "view"),  # single-event user: no transitions
        (4, 1, "error"), (4, 1, "click"),  # equal ts: state tie-break
    ]

    @staticmethod
    def _brute(events, k):
        from collections import Counter, defaultdict

        per_user = defaultdict(list)
        for u, t, s in events:
            per_user[u].append((t, s))
        c = Counter()
        for caps in per_user.values():
            caps.sort()
            for i in range(1, len(caps)):
                c[(caps[i - 1][1], caps[i][1])] += 1
        rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(a, b, n) for (a, b), n in rows]

    @pytest.mark.parametrize("nparts", [1, 4])
    def test_matches_brute_force(self, ray_session, nparts):
        import ray.data as rd

        from pdf_extractor_ray.ops.funnel import transition_counts

        ds = rd.from_items(
            [
                {"user_id": u, "ts": t * 1_000_000, "event_type": s}
                for u, t, s in self.EVENTS
            ]
        ).repartition(nparts)
        got = transition_counts(ds, k=10)
        want = self._brute(self.EVENTS, 10)
        assert [
            (r.src, r.dst, int(r.cnt)) for r in got.itertuples()
        ] == want
        assert ("view", "click") == want[0][:2] and want[0][2] == 3

    def test_single_user_stream_never_crosses_users(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.funnel import transition_counts

        # adjacent rows from DIFFERENT users must not pair
        rows = [
            {"user_id": 1, "ts": 1, "event_type": "a"},
            {"user_id": 2, "ts": 2, "event_type": "b"},
        ]
        out = transition_counts(rd.from_items(rows), k=5)
        assert len(out) == 0
