"""Sitemap XML subset parser (sources/sitemap.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from pdf_extractor_ray.sources.sitemap import (
    SitemapError,
    parse_sitemap,
    sitemap_rows_batch,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.com/p?x=1&amp;y=2</loc>
    <lastmod>2026-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.com/q</loc></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.com/sitemap1.xml</loc>
  <lastmod>2026-02-01</lastmod></sitemap>
  <sitemap><loc>https://a.com/sitemap2.xml</loc></sitemap>
</sitemapindex>"""


class TestParse:
    def test_urlset_fields_and_entities(self):
        rows = parse_sitemap(URLSET)
        assert rows[0] == {
            "loc": "https://a.com/p?x=1&y=2",
            "lastmod": "2026-01-05",
            "changefreq": "daily",
            "priority": "0.8",
            "kind": "url",
        }
        assert rows[1]["loc"] == "https://a.com/q"
        assert rows[1]["lastmod"] is None

    def test_sitemapindex_children(self):
        rows = parse_sitemap(INDEX)
        assert [r["kind"] for r in rows] == ["sitemap", "sitemap"]
        assert rows[0]["lastmod"] == "2026-02-01"

    def test_namespace_prefixes_tolerated(self):
        xml = (
            "<sm:urlset xmlns:sm='x'><sm:url><sm:loc>u</sm:loc></sm:url>"
            "</sm:urlset>"
        )
        assert parse_sitemap(xml)[0]["loc"] == "u"

    def test_bytes_input(self):
        assert parse_sitemap(URLSET.encode())[0]["kind"] == "url"

    def test_unknown_root_raises(self):
        with pytest.raises(SitemapError, match="unknown root"):
            parse_sitemap("<rss><channel/></rss>")

    def test_unterminated_tag_raises(self):
        with pytest.raises(SitemapError, match="unterminated"):
            parse_sitemap("<urlset><url><loc")

    def test_entry_without_loc_dropped(self):
        xml = "<urlset><url><lastmod>2026-01-01</lastmod></url></urlset>"
        assert parse_sitemap(xml) == []

    def test_over_limit_raises(self):
        entries = "".join(f"<url><loc>u{i}</loc></url>" for i in range(50_001))
        with pytest.raises(SitemapError, match="50k"):
            parse_sitemap(f"<urlset>{entries}</urlset>")


class TestBatchStage:
    def test_flattening_and_src_idx(self):
        batch = pa.Table.from_arrays(
            [pa.array([URLSET, INDEX, None], pa.string())], names=["xml"]
        )
        out = sitemap_rows_batch(batch)
        assert out.num_rows == 4
        assert out["src_idx"].to_pylist() == [0, 0, 1, 1]
        assert out["kind"].to_pylist() == ["url", "url", "sitemap", "sitemap"]


class TestGzippedSitemap:
    def test_gz_magic_sniffed(self):
        import gzip

        from pdf_extractor_ray.sources.sitemap import parse_sitemap

        xml = (
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<url><loc>https://e.com/a</loc></url></urlset>"
        )
        plain = parse_sitemap(xml.encode())
        gz = parse_sitemap(gzip.compress(xml.encode(), mtime=0))
        assert gz == plain and gz[0]["loc"] == "https://e.com/a"
