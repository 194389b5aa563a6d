"""Deterministic markdown assembly and outline filtering.

These functions define the byte-exact output layout of extracted documents
(reference: src/core/utils.py:112-161, src/core/constants.py:9-10) and the
query→outline filter with its return-all fallback
(reference: src/core/utils.py:11-32).
"""

from __future__ import annotations

MARKDOWN_SECTION_SEPARATOR = "\n\n---\n\n"  # reference: src/core/constants.py:9
MARKDOWN_PAGE_HEADER_TEMPLATE = "# Page {page_number}\n\n"  # constants.py:10
EMPTY_CONTENT_MESSAGE = "# No content extracted\n\n"


def format_page_header(page_number: int, zero_based: bool = True) -> str:
    """``# Page {n}\\n\\n`` header; converts 0-based to display 1-based
    (reference: src/core/utils.py:143-161)."""
    display = page_number + 1 if zero_based else page_number
    return MARKDOWN_PAGE_HEADER_TEMPLATE.format(page_number=display)


def combine_markdown_sections(
    sections: list[str],
    separator: str = MARKDOWN_SECTION_SEPARATOR,
    empty_message: str = EMPTY_CONTENT_MESSAGE,
) -> str:
    """Join markdown sections with the canonical separator.

    Empty list → empty message; single section returned verbatim; multiple
    sections stripped, empties dropped, joined
    (reference: src/core/utils.py:112-140).
    """
    if not sections:
        return empty_message
    if len(sections) == 1:
        return sections[0]
    return separator.join(s.strip() for s in sections if s.strip())


def combine_pages(page_markdowns: list[str]) -> str:
    """Canonical whole-document text from per-page markdown.

    Single-page documents are returned verbatim (no page header); multi-page
    documents get ``# Page {n}`` headers then the section join. Page numbers
    are positional (0-based index → 1-based display), mirroring the
    reference's page-ordered concatenation
    (reference: src/models/mistral_models.py:93-107, src/core/utils.py:112-161).
    """
    if not page_markdowns:
        return EMPTY_CONTENT_MESSAGE
    if len(page_markdowns) == 1:
        return page_markdowns[0]
    headed = [
        format_page_header(i) + md for i, md in enumerate(page_markdowns)
    ]
    return combine_markdown_sections(headed)


def filter_outlines_by_query(outline_info: list[dict], query: str) -> list[dict]:
    """Case-insensitive substring filter over outline titles; returns ALL
    outlines when nothing matches or the query is empty
    (reference: src/core/utils.py:11-32)."""
    if not outline_info or not query:
        return outline_info
    query_lower = query.lower()
    filtered = [o for o in outline_info if query_lower in o["title"].lower()]
    return filtered if filtered else outline_info
