"""Synthetic-PDF layout parsing: char → line → block clustering.

The real container has no PDF rendering library, so the PDF branch operates
on a deterministic toy layout stream (FIXTURES.md §1 bucket 8): a payload
beginning with the ``%PDF`` magic (so routing matches the reference's magic
check, reference: src/services/pdf_input_handler.py:88-92) followed by a
fixed-width binary array of per-character boxes. The PARSER is the real
thing — pdfminer-style layout analysis (char clustering into lines by
baseline, word-gap detection, line clustering into blocks by leading,
reading-order sort), fully vectorized with numpy — only the *decode* of a
real PDF byte stream is replaced by the toy format.

Format
------
``b"%PDF-GRAFT1\\n"`` then a little-endian record array:
``(page:int32, x0:f32, y0:f32, x1:f32, y1:f32, cp:int32)``, one record per
character; y grows upward (PDF convention), origin bottom-left.
"""

from __future__ import annotations

import numpy as np

from .assemble import combine_pages

MAGIC = b"%PDF-GRAFT1\n"

RECORD_DTYPE = np.dtype(
    [
        ("page", "<i4"),
        ("x0", "<f4"),
        ("y0", "<f4"),
        ("x1", "<f4"),
        ("y1", "<f4"),
        ("cp", "<i4"),
    ]
)

CHAR_W = 6.0
LINE_H = 12.0
PAGE_W = 612.0
PAGE_H = 792.0
CHARS_PER_LINE = 80
LINES_PER_PAGE = 40


def layout_text(text: str, chars_per_line: int = CHARS_PER_LINE,
                lines_per_page: int = LINES_PER_PAGE) -> bytes:
    """Lay text out as a toy-PDF payload (the fixture generator's inverse of
    :func:`extract_pdf`).

    Paragraphs (``\\n\\n``-separated) wrap at word boundaries to
    ``chars_per_line`` columns; a blank line separates paragraphs; pages
    break every ``lines_per_page`` rows. Round-trips exactly through
    :func:`extract_pdf` for single-space-separated word text.
    """
    rows: list[str | None] = []  # None = blank separator row
    for p_idx, para in enumerate(text.split("\n\n")):
        words = para.split()
        if not words:
            continue
        if rows:
            rows.append(None)
        line = ""
        for word in words:
            if not line:
                line = word
            elif len(line) + 1 + len(word) <= chars_per_line:
                line += " " + word
            else:
                rows.append(line)
                line = word
        if line:
            rows.append(line)

    records = []
    page, row_on_page = 0, 0
    for row in rows:
        if row_on_page >= lines_per_page:
            page += 1
            row_on_page = 0
        if row is None:
            row_on_page += 1
            continue
        y1 = PAGE_H - row_on_page * LINE_H
        y0 = y1 - LINE_H
        for col, ch in enumerate(row):
            if ch == " ":
                continue
            x0 = col * CHAR_W
            records.append((page, x0, y0, x0 + CHAR_W, y1, ord(ch)))
        row_on_page += 1

    arr = np.array(records, dtype=RECORD_DTYPE)
    return MAGIC + arr.tobytes()


def _line_to_text(cps: np.ndarray, x0s: np.ndarray, x1s: np.ndarray) -> str:
    """Chars of one line (already x-sorted) → string, inserting a space at
    gaps wider than half a character cell (word-gap detection)."""
    if len(cps) == 0:
        return ""
    gaps = x0s[1:] - x1s[:-1]
    spaced = gaps > CHAR_W * 0.5
    # Interleave: char, [space], char, ...
    out_cps = np.empty(len(cps) + int(spaced.sum()), dtype="<u4")
    positions = np.arange(len(cps)) + np.concatenate(([0], np.cumsum(spaced)))
    out_cps[:] = ord(" ")
    out_cps[positions] = cps.astype("<u4")
    return out_cps.tobytes().decode("utf-32-le")


def extract_pdf_pages(payload: bytes) -> tuple[list[str], dict]:
    """Layout analysis returning per-page markdowns (pages with no glyphs are
    omitted); see :func:`extract_pdf` for the algorithm. This is the unit of
    chunk reassembly for skew-split oversized PDFs."""
    markdown_pages, stats = _extract_pages(payload)
    return markdown_pages, stats


def extract_pdf(payload: bytes) -> tuple[str, dict]:
    """Whole-document extraction: per-page layout analysis + the canonical
    page combine (reference: src/core/utils.py:112-161)."""
    markdown_pages, stats = _extract_pages(payload)
    return combine_pages(markdown_pages), stats


def _extract_pages(payload: bytes) -> tuple[list[str], dict]:
    """Parse a toy-PDF payload into markdown via layout analysis.

    Pipeline (the pdfminer-style semantics from the north star):
    1. decode char boxes (vectorized ``np.frombuffer``)
    2. cluster chars into lines: same page, baseline (y0) within half a
       line-height (single lexsort — no Python loop over chars)
    3. within a line, sort by x and split words at horizontal gaps
    4. cluster lines into blocks: vertical gap > 1.5 × line-height starts a
       new block (paragraph leading)
    5. reading order: pages ascending, lines top-to-bottom (single-column
       assumption — documented; multi-column would x-band first)
    6. blocks join lines with spaces; blocks join with blank lines; pages
       combine with the canonical page layout
       (reference: src/core/utils.py:112-161).

    Returns ``(markdown, stats)``.
    """
    if not payload.startswith(MAGIC):
        raise ValueError("not a GRAFT toy-PDF payload")
    body = payload[len(MAGIC):]
    usable = len(body) - len(body) % RECORD_DTYPE.itemsize
    arr = np.frombuffer(body[:usable], dtype=RECORD_DTYPE)
    if len(arr) == 0:
        return [], {"n_pages": 0, "n_blocks": 0, "n_chars": 0}

    # Reading order: page asc, y desc (top first), x asc.
    order = np.lexsort((arr["x0"], -arr["y0"], arr["page"]))
    arr = arr[order]

    # Line boundaries: page change or baseline drop > LINE_H/2.
    page_change = np.diff(arr["page"]) != 0
    y_change = np.abs(np.diff(arr["y0"])) > LINE_H * 0.5
    line_starts = np.concatenate(([True], page_change | y_change))
    line_ids = np.cumsum(line_starts) - 1
    n_lines = line_ids[-1] + 1
    line_first = np.flatnonzero(line_starts)
    line_last = np.concatenate((line_first[1:], [len(arr)])) - 1

    line_pages = arr["page"][line_first]
    line_y0 = arr["y0"][line_first]

    # Block boundaries: page change or vertical gap > 1.5 × LINE_H between
    # consecutive lines (paragraph leading).
    if n_lines > 1:
        gap = line_y0[:-1] - line_y0[1:]
        block_break = (np.diff(line_pages) != 0) | (gap > LINE_H * 1.5)
        block_starts = np.concatenate(([True], block_break))
    else:
        block_starts = np.array([True])
    block_ids = np.cumsum(block_starts) - 1

    # Build text per line, group into blocks, group into pages.
    pages: dict[int, list[list[str]]] = {}
    current_block: list[str] | None = None
    prev_block_id = -1
    for li in range(n_lines):
        lo, hi = line_first[li], line_last[li] + 1
        text = _line_to_text(arr["cp"][lo:hi], arr["x0"][lo:hi], arr["x1"][lo:hi])
        page = int(line_pages[li])
        if block_ids[li] != prev_block_id:
            current_block = []
            pages.setdefault(page, []).append(current_block)
            prev_block_id = block_ids[li]
        current_block.append(text)

    page_markdowns = []
    n_blocks = 0
    for page in sorted(pages):
        block_texts = [" ".join(lines) for lines in pages[page]]
        n_blocks += len(block_texts)
        page_markdowns.append("\n\n".join(block_texts))
    stats = {"n_pages": len(pages), "n_blocks": n_blocks, "n_chars": int(len(arr))}
    return page_markdowns, stats
