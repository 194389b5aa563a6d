"""Per-page validation semantics (reference: validation_orchestrator.py,
mistral_client.py:237-251 substitution policy)."""

from pdf_extractor_ray.functions.assemble import combine_pages
from pdf_extractor_ray.functions.validate import (
    should_validate_page,
    split_pages,
    validate_document,
)

ENABLED = ("low_content_density", "garbled_text")

GOOD = (
    "This page has plenty of perfectly reasonable alphanumeric content in it, "
    "more than one hundred characters of it in fact, so no detector fires."
)
BAD = "@#$%^&*~`" * 40 + "ab"  # garbled AND low density


class TestSplitPages:
    def test_roundtrip(self):
        pages = ["first page content", "second page content", "third"]
        combined = combine_pages(pages)
        assert split_pages(combined) == pages

    def test_single_page_returns_none(self):
        assert split_pages("just one page") is None

    def test_non_canonical_headers_return_none(self):
        assert split_pages("# Page 2\n\nx\n\n---\n\n# Page 3\n\ny") is None


class TestPerPageRepair:
    def test_only_problem_page_replaced(self):
        extracted = combine_pages([GOOD, BAD, GOOD])
        provided = combine_pages([GOOD, "clean replacement page", GOOD])
        result = validate_document(
            extracted, provided, "u://x", ENABLED, sample_rate=1000
        )
        assert result.n_pages_replaced == 1
        assert result.source == "provided"
        assert result.text == combine_pages([GOOD, "clean replacement page", GOOD])
        assert "garbled_text" in result.problems

    def test_clean_doc_untouched(self):
        extracted = combine_pages([GOOD, GOOD])
        result = validate_document(
            extracted, extracted, "u://x", ENABLED, sample_rate=1000
        )
        assert result.n_pages_replaced == 0
        assert result.text == extracted
        assert result.source == "extracted"

    def test_unalignable_page_counts_fall_back_to_whole_doc(self):
        extracted = combine_pages([BAD, GOOD])
        provided = "a single-page alternative"
        result = validate_document(
            extracted, provided, "u://x", ENABLED, sample_rate=1000
        )
        # whole-doc granularity: doc has problems (page 1 garbled) → replaced
        assert result.text == provided
        assert result.n_pages_replaced == 1

    def test_low_similarity_kept_but_flagged(self):
        page = GOOD + " with the number 567 in it"
        alt = GOOD + " with the number 557 in it"  # OCR-style number error
        result = validate_document(page, alt, "u://x", ENABLED, sample_rate=1)
        assert result.text == page  # kept (reference keeps originals)
        assert not result.passed
        assert result.similarity == 0.0

    def test_sampling_is_deterministic_per_url(self):
        a = [should_validate_page("u://a", i, 5) for i in range(10)]
        b = [should_validate_page("u://a", i, 5) for i in range(10)]
        assert a == b
        assert sum(a) == 2  # every 5th page
