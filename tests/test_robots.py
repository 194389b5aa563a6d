"""RFC 9309 robots.txt subset (ops/robots.py)."""

from __future__ import annotations

import pyarrow as pa

from pdf_extractor_ray.ops.robots import parse_robots, robots_filter


def allowed(body: str, path: str, agent: str = "graftbot") -> bool:
    return parse_robots(body, agent).allowed(path)


class TestRuleMatching:
    def test_prefix_disallow(self):
        body = "User-agent: *\nDisallow: /private/"
        assert not allowed(body, "/private/x")
        assert allowed(body, "/public/x")
        assert allowed(body, "/privatetooth")  # prefix is /private/ not /private

    def test_longest_match_wins(self):
        body = "User-agent: *\nDisallow: /p/\nAllow: /p/ok"
        assert not allowed(body, "/p/x")
        assert allowed(body, "/p/okay")

    def test_allow_wins_ties_regardless_of_order(self):
        for body in (
            "User-agent: *\nDisallow: /dir\nAllow: /dir",
            "User-agent: *\nAllow: /dir\nDisallow: /dir",
        ):
            assert allowed(body, "/dir/x")

    def test_star_wildcard(self):
        body = "User-agent: *\nDisallow: /*.pdf"
        assert not allowed(body, "/a/b.pdf")
        assert not allowed(body, "/a/b.pdfx")  # unanchored
        assert allowed(body, "/a/b.txt")

    def test_dollar_anchor(self):
        body = "User-agent: *\nDisallow: /*.pdf$"
        assert not allowed(body, "/a/b.pdf")
        assert allowed(body, "/a/b.pdfx")

    def test_empty_disallow_allows_all(self):
        assert allowed("User-agent: *\nDisallow:", "/anything")

    def test_disallow_root(self):
        assert not allowed("User-agent: *\nDisallow: /", "/")


class TestGroupSelection:
    BODY = (
        "User-agent: graftbot\nDisallow: /bot-only/\n\n"
        "User-agent: *\nDisallow: /\n"
    )

    def test_named_group_beats_star(self):
        assert not allowed(self.BODY, "/bot-only/x")
        assert allowed(self.BODY, "/anything-else")

    def test_other_agent_falls_to_star(self):
        assert not allowed(self.BODY, "/anything-else", agent="otherbot")

    def test_agent_prefix_match(self):
        body = "User-agent: graft\nDisallow: /g/\nUser-agent: *\nDisallow: /x/"
        assert not allowed(body, "/g/1")  # 'graftbot' startswith 'graft'
        assert allowed(body, "/x/1")

    def test_multiple_agent_lines_one_group(self):
        body = "User-agent: a\nUser-agent: graftbot\nDisallow: /q/"
        assert not allowed(body, "/q/z")

    def test_comments_and_blank_lines(self):
        body = "# hi\nUser-agent: * # star\n\nDisallow: /s/ # rule\n"
        assert not allowed(body, "/s/1")
        assert allowed(body, "/t/1")

    def test_merged_groups_with_same_token(self):
        body = (
            "User-agent: *\nDisallow: /a/\n\n"
            "User-agent: *\nDisallow: /b/\n"
        )
        assert not allowed(body, "/a/1") and not allowed(body, "/b/1")


class TestFilterStage:
    def test_missing_policy_allows(self, ray_session):
        import ray.data as rd

        tbl = pa.table(
            {
                "url": ["https://k.com/a", "https://p.com/private/x"],
                "host": ["k.com", "p.com"],
            }
        )
        out = robots_filter(
            rd.from_arrow(tbl),
            {"p.com": "User-agent: *\nDisallow: /private/"},
        ).to_pandas()
        assert out["allowed"].tolist() == [True, False]

    def test_hostonly_url_is_root_path(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"url": ["https://p.com"], "host": ["p.com"]})
        out = robots_filter(
            rd.from_arrow(tbl), {"p.com": "User-agent: *\nDisallow: /"}
        ).to_pandas()
        assert out["allowed"].tolist() == [False]


class TestCrawlDelay:
    def test_selected_group_delay(self):
        from pdf_extractor_ray.ops.robots import parse_robots

        body = (
            "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n\n"
            "User-agent: graftbot\nCrawl-delay: 3\nAllow: /\n"
        )
        assert parse_robots(body, agent="graftbot").crawl_delay == 3
        assert parse_robots(body, agent="otherbot").crawl_delay == 10

    def test_no_delay_is_none_and_garbage_ignored(self):
        from pdf_extractor_ray.ops.robots import parse_robots

        assert parse_robots("User-agent: *\nDisallow:\n").crawl_delay is None
        assert parse_robots(
            "User-agent: *\nCrawl-delay: fast\n"
        ).crawl_delay is None

    def test_min_across_winning_groups(self):
        from pdf_extractor_ray.ops.robots import parse_robots

        body = (
            "User-agent: graftbot\nCrawl-delay: 7\n\n"
            "User-agent: graftbot\nCrawl-delay: 4\n"
        )
        assert parse_robots(body, agent="graftbot").crawl_delay == 4
