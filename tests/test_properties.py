"""Property-based tests (hypothesis) for the scalar operator invariants —
beyond the reference's example-based coverage (SURVEY.md §5 notes the
reference has no randomized testing)."""

from hypothesis import given, settings, strategies as st

from pdf_extractor_ray.functions.assemble import combine_pages
from pdf_extractor_ray.functions.normalize import extract_numbers, normalize_for_comparison
from pdf_extractor_ray.functions.numbers import parse_number
from pdf_extractor_ray.functions.pdf_extract import extract_pdf, layout_text
from pdf_extractor_ray.functions.similarity import (
    levenshtein_distance,
    similarity_levenshtein,
)
from pdf_extractor_ray.functions.validate import split_pages

TEXT = st.text(max_size=300)
SHORT = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x2FF),
    max_size=60,
)
WORDS = st.lists(
    st.text(alphabet="abcdefghijklmnop", min_size=1, max_size=12), min_size=1, max_size=120
)


class TestNormalizeProperties:
    @given(TEXT)
    def test_normalize_idempotent(self, text):
        once = normalize_for_comparison(text)
        assert normalize_for_comparison(once) == once

    @given(TEXT)
    def test_extract_numbers_all_parseable(self, text):
        for num in extract_numbers(text):
            float(num)  # must not raise

    @given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False))
    def test_parse_number_roundtrip_us_format(self, value):
        value = round(value, 2)
        parsed = parse_number(f"{value:,.2f}")
        assert parsed is not None
        assert abs(parsed - value) < 1e-6


class TestLevenshteinProperties:
    @given(SHORT, SHORT)
    def test_symmetry(self, a, b):
        assert levenshtein_distance(a, b) == levenshtein_distance(b, a)

    @given(SHORT, SHORT)
    def test_bounds(self, a, b):
        d = levenshtein_distance(a, b)
        assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))

    @given(SHORT)
    def test_self_similarity(self, a):
        assert levenshtein_distance(a, a) == 0
        assert similarity_levenshtein(a + "x", a + "x") == 1.0

    @settings(max_examples=30)
    @given(SHORT, SHORT, SHORT)
    def test_triangle_inequality(self, a, b, c):
        assert levenshtein_distance(a, c) <= (
            levenshtein_distance(a, b) + levenshtein_distance(b, c)
        )


class TestLayoutProperties:
    @settings(max_examples=30)
    @given(WORDS)
    def test_pdf_layout_roundtrip_single_paragraph(self, words):
        text = " ".join(words)
        out, _ = extract_pdf(layout_text(text))
        if len(text) <= 80 * 39:  # fits one page → byte-exact
            assert out == text

    @given(st.lists(st.text(alphabet="abc d", min_size=1, max_size=40), min_size=2, max_size=6))
    def test_combine_split_pages_roundtrip(self, pages):
        pages = [p.strip() for p in pages if p.strip()]
        if len(pages) < 2:
            return
        # page contents with no separator/header collisions round-trip
        assert split_pages(combine_pages(pages)) == pages


class TestTableMergeProperties:
    @settings(max_examples=60)
    @given(
        st.lists(
            st.tuples(
                st.integers(1, 5),                                  # page
                st.booleans(),                                      # has_headers
                st.integers(0, 4),                                  # n data rows
            ),
            min_size=0,
            max_size=8,
        )
    )
    def test_row_conservation(self, specs):
        """Every input data row (and header row of headerless continuation
        tables after the first table) appears in exactly one merged table."""
        from pdf_extractor_ray.functions.tables import PageTable, merge_tables_across_pages

        tables = []
        for i, (page, has_headers, n_rows) in enumerate(sorted(specs)):
            headers = [f"H{i}a", f"H{i}b"] if has_headers else [f"d{i}x", f"d{i}y"]
            rows = [[f"r{i}-{j}", str(j)] for j in range(n_rows)]
            tables.append(PageTable(headers, rows, page, has_headers=has_headers))
        merged = merge_tables_across_pages(tables, use_numerical_validation=False)
        out_rows = sum(len(m.data_rows) for m in merged)
        expected = sum(len(t.data_rows) for t in tables)
        # headerless tables merged into a predecessor contribute their
        # pseudo-header row as data (reference: table_merger.py:145-154)
        for idx, t in enumerate(tables):
            if not t.has_headers and idx > 0 and t.headers:
                expected += 1
        assert out_rows == expected
        assert sum(1 for m in merged) <= max(1, len(tables))


class TestTwoColumnLayout:
    def test_column_major_reading_order(self):
        from pdf_extractor_ray.functions.pdf_extract import (
            extract_pdf,
            layout_text_two_column,
        )

        left = "alpha beta gamma delta words\n\nsecond left paragraph"
        right = "one two three four five six\n\nsecond right paragraph"
        out, stats = extract_pdf(layout_text_two_column(left, right))
        assert out == left + "\n\n" + right
        assert stats["n_blocks"] == 4

    def test_single_column_not_misdetected(self, small_pages):
        """No single-column fixture PDF may trigger column splitting."""
        from pdf_extractor_ray.functions.pdf_extract import extract_pdf, layout_text

        text = "word " * 200  # long single paragraph
        out, _ = extract_pdf(layout_text(text.strip()))
        assert out == text.strip()
