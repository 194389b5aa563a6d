"""Spatial join, source-preference merge, and section building."""

import pyarrow as pa
import pytest

from pdf_extractor_ray.functions.spatial import (
    bbox_overlap,
    map_words_to_cells,
    merge_table_sources,
)
from pdf_extractor_ray.stages.sections import build_sections, sections_rows


class TestBboxOverlap:
    def test_overlap(self):
        assert bbox_overlap((0, 0, 10, 10), (5, 5, 15, 15)) == 25
        assert bbox_overlap((0, 0, 1, 1), (2, 2, 3, 3)) == 0


class TestSpatialJoin:
    CELLS = [(0, 0, 50, 10), (50, 0, 100, 10)]  # two cells side by side

    def test_words_assigned_by_majority_overlap(self):
        words = [
            {"text": "hello", "bbox": (1, 1, 20, 9)},     # fully in cell 0
            {"text": "world", "bbox": (45, 1, 60, 9)},    # 1/3 in cell 0, 2/3 in cell 1
            {"text": "edge", "bbox": (48, 1, 52, 9)},     # split 50/50 → neither >0.5
        ]
        cells = map_words_to_cells(self.CELLS, words)
        assert cells[0]["text"] == "hello"
        assert cells[1]["text"] == "world"
        assert cells[0]["word_count"] == 1

    def test_reading_order(self):
        cells = [(0, 0, 100, 100)]
        words = [
            {"text": "second", "bbox": (10, 50, 30, 60)},
            {"text": "first", "bbox": (10, 10, 30, 20)},
            {"text": "third", "bbox": (50, 50, 70, 60)},
        ]
        out = map_words_to_cells(cells, words)
        assert out[0]["text"] == "first second third"

    def test_empty_sides(self):
        assert map_words_to_cells([], [{"text": "x", "bbox": (0, 0, 1, 1)}]) == []
        out = map_words_to_cells([(0, 0, 1, 1)], [])
        assert out == [{"text": "", "word_count": 0}]


class TestSourcePreference:
    def test_preferred_wins_per_page(self):
        preferred = [{"page": 1, "name": "c1"}]
        fallback = [{"page": 1, "name": "a1"}, {"page": 2, "name": "a2"}]
        merged = merge_table_sources(preferred, fallback)
        assert [(t["page"], t["name"], t["used_source"]) for t in merged] == [
            (1, "c1", "preferred"),
            (2, "a2", "fallback"),
        ]


class TestSections:
    MD = "# Intro\n\nintro text\n\n# Results\n\nresult text\n\n## Sub\n\nsub text"

    def test_build_sections(self):
        sections = build_sections(self.MD)
        assert [s["title"] for s in sections] == ["Intro", "Results", "Sub"]
        assert sections[1]["content"] == "result text"

    def test_preamble_section(self):
        sections = build_sections("no heading preamble\n\n# One\n\nbody")
        assert sections[0] == {"title": "", "content": "no heading preamble"}

    def test_max_sections_cap(self):
        md = "\n".join(f"# H{i}\n\nbody{i}" for i in range(8))
        sections = build_sections(md)
        assert len(sections) == 4
        # remaining headings stay inside the last section
        assert "# H7" in sections[-1]["content"]

    def test_sections_rows_with_query_filter(self, ray_session):
        import ray.data as rd

        ds = rd.from_items(
            [{"url": "https://x/doc1", "extracted_text": self.MD}]
        )
        out = pa.concat_tables(
            sections_rows(ds, query="results").iter_batches(batch_format="pyarrow")
        )
        assert out["title"].to_pylist() == ["Results"]
        assert out["filename"][0].as_py() == "Results_doc1.md"

    def test_sections_rows_no_match_returns_all(self, ray_session):
        import ray.data as rd

        ds = rd.from_items(
            [{"url": "https://x/doc1", "extracted_text": self.MD}]
        )
        out = pa.concat_tables(
            sections_rows(ds, query="zzz").iter_batches(batch_format="pyarrow")
        )
        assert out["title"].to_pylist() == ["Intro", "Results", "Sub"]


class TestPdfSectionsContainment:
    def test_hostile_payload_degrades_per_row(self, ray_session):
        """One corrupt PDF payload must yield a single empty error section,
        not abort the whole sections stage (round-2 advice: decode_records
        ran outside the containment boundary)."""
        import ray.data as rd

        from pdf_extractor_ray.functions.pdf_codec import build_sectioned_pdf
        from pdf_extractor_ray.stages.sections import pdf_sections_rows

        good = build_sectioned_pdf([("Alpha", "one two three"), ("Beta", "four")])
        # Truncate mid-stream: decode_records raises (damaged Flate data).
        hostile = good[: len(good) // 3]
        rows = [
            {"url": "https://x/good.pdf", "html": good},
            {"url": "https://x/bad.pdf", "html": hostile},
            {"url": "https://x/junk.pdf", "html": b"%PDF-1.4 garbage \xff\xfe"},
        ]
        out = pa.concat_tables(
            pdf_sections_rows(rd.from_items(rows)).iter_batches(
                batch_format="pyarrow"
            )
        )
        by_url = {}
        for u, t in zip(out["url"].to_pylist(), out["title"].to_pylist()):
            by_url.setdefault(u, []).append(t)
        assert by_url["https://x/good.pdf"] == ["Alpha", "Beta"]
        for bad in ("https://x/bad.pdf", "https://x/junk.pdf"):
            assert by_url[bad] == ["extract_error"]
