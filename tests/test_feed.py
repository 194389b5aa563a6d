"""sources/feed.py: RSS/Atom parsing — variants, hostile inputs."""

import pyarrow as pa
import pytest

from pdf_extractor_ray.sources.feed import FeedError, feed_rows_batch, parse_feed


class TestParseFeed:
    def test_rss_items(self):
        rss = (
            '<?xml version="1.0"?><rss version="2.0"><channel>'
            "<title>chan</title><link>https://chan</link>"
            "<item><title>A &amp; B</title><link>https://x/1</link>"
            "<pubDate>d1</pubDate></item>"
            "<item><title>T2</title><link>https://x/2</link></item>"
            "</channel></rss>"
        )
        items = parse_feed(rss)
        assert [i["link"] for i in items] == ["https://x/1", "https://x/2"]
        assert items[0]["title"] == "A & B"
        assert items[0]["published"] == "d1" and items[1]["published"] is None
        # channel-level title/link never leak into items
        assert all(i["title"] != "chan" for i in items)

    def test_atom_rel_filtering(self):
        atom = (
            "<feed><entry><title>E</title>"
            '<link rel="self" href="https://self"/>'
            '<link rel="alternate" href="https://alt"/>'
            '<link href="https://bare"/>'
            "<updated>u</updated><published>p</published></entry></feed>"
        )
        (item,) = parse_feed(atom)
        assert item["link"] == "https://alt"  # first rel=alternate wins
        assert item["published"] == "u"  # first timestamp field wins

    def test_not_a_feed_raises(self):
        with pytest.raises(FeedError):
            parse_feed("<html><body>nope</body></html>")

    def test_batch(self):
        rss = b"<rss><channel><item><title>t</title><link>https://l</link></item></channel></rss>"
        out = feed_rows_batch(pa.table({"xml": [rss, rss]}))
        assert out.num_rows == 2
        assert out["kind"].to_pylist() == ["rss", "rss"]
