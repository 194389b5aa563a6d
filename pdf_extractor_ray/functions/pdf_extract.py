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


def layout_text_two_column(left_text: str, right_text: str,
                           chars_per_line: int = 38) -> bytes:
    """Lay two texts out as the columns of a single two-column page (left
    column x ∈ [0, ~280], right column offset past the gutter at
    ``PAGE_W/2``). :func:`extract_pdf` must read left column fully, then
    right (column-major reading order)."""

    def column_records(text: str, x_offset: float) -> list[tuple]:
        records = []
        row = 0
        for para in text.split("\n\n"):
            words = para.split()
            if not words:
                continue
            if records:
                row += 1
            line = ""
            lines = []
            for word in words:
                if not line:
                    line = word
                elif len(line) + 1 + len(word) <= chars_per_line:
                    line += " " + word
                else:
                    lines.append(line)
                    line = word
            if line:
                lines.append(line)
            for text_line in lines:
                y1 = PAGE_H - row * LINE_H
                for col, ch in enumerate(text_line):
                    if ch != " ":
                        x0 = x_offset + col * CHAR_W
                        records.append((0, x0, y1 - LINE_H, x0 + CHAR_W, y1, ord(ch)))
                row += 1
        return records

    records = column_records(left_text, 0.0) + column_records(
        right_text, PAGE_W / 2 + 2 * CHAR_W
    )
    return MAGIC + np.array(records, dtype=RECORD_DTYPE).tobytes()


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


def extract_pdf_pages(payload: bytes, password: bytes = b"") -> tuple[list[str], dict]:
    """Layout analysis returning per-page markdowns (pages with no glyphs are
    omitted); see :func:`extract_pdf` for the algorithm. This is the unit of
    chunk reassembly for skew-split oversized PDFs. ``password`` opens
    standard-handler-encrypted files (user or owner)."""
    markdown_pages, stats = _extract_pages(payload, password=password)
    return markdown_pages, stats


def extract_pdf(payload: bytes, password: bytes = b"") -> tuple[str, dict]:
    """Whole-document extraction: per-page layout analysis + the canonical
    page combine (reference: src/core/utils.py:112-161). ``password``
    opens standard-handler-encrypted files (user or owner, round 4)."""
    markdown_pages, stats = _extract_pages(payload, password=password)
    return combine_pages(markdown_pages), stats


def _cluster_blocks(sub: np.ndarray) -> list[list[str]]:
    """Cluster one page-column's chars into blocks of line texts.

    Lines: baseline (y0) within half a line-height after a (-y, x) sort;
    words: horizontal gaps inside a line; blocks: vertical gap > 1.5 ×
    line-height between consecutive lines (paragraph leading).
    """
    order = np.lexsort((sub["x0"], -sub["y0"]))
    sub = sub[order]
    y_change = np.abs(np.diff(sub["y0"])) > LINE_H * 0.5
    line_starts = np.concatenate(([True], y_change))
    line_first = np.flatnonzero(line_starts)
    line_last = np.concatenate((line_first[1:], [len(sub)])) - 1
    line_y0 = sub["y0"][line_first]

    blocks: list[list[str]] = []
    current: list[str] | None = None
    prev_y = None
    for li in range(len(line_first)):
        lo, hi = line_first[li], line_last[li] + 1
        text = _line_to_text(sub["cp"][lo:hi], sub["x0"][lo:hi], sub["x1"][lo:hi])
        y = float(line_y0[li])
        if current is None or (prev_y is not None and prev_y - y > LINE_H * 1.5):
            current = []
            blocks.append(current)
        current.append(text)
        prev_y = y
    return blocks


def _detect_columns(sub: np.ndarray) -> list[np.ndarray]:
    """Column detection for one page: find a vertical gutter (a ≥3-char-wide
    x-gap in the union of char intervals, within the middle half of the
    page) that no character crosses; if found, return [left, right] char
    subsets, else [whole page]. Deterministic; single-column pages are
    untouched."""
    if len(sub) < 4:
        return [sub]
    order = np.argsort(sub["x0"], kind="stable")
    x0s = sub["x0"][order]
    x1s = sub["x1"][order]
    running_max = np.maximum.accumulate(x1s)
    gaps = x0s[1:] - running_max[:-1]
    lo_bound, hi_bound = PAGE_W * 0.25, PAGE_W * 0.75
    candidates = np.flatnonzero(
        (gaps >= CHAR_W * 3)
        & (running_max[:-1] >= lo_bound)
        & (x0s[1:] <= hi_bound)
    )
    if len(candidates) == 0:
        return [sub]
    # Widest qualifying gutter wins (ties: leftmost — argmax is first max).
    best = candidates[np.argmax(gaps[candidates])]
    gutter = (float(running_max[best]) + float(x0s[best + 1])) / 2
    left = sub[sub["x1"] <= gutter]
    right = sub[sub["x0"] >= gutter]
    if len(left) == 0 or len(right) == 0 or len(left) + len(right) != len(sub):
        return [sub]
    return [left, right]


def records_to_markdown(arr: np.ndarray) -> tuple[list[str], dict]:
    """The decoder-agnostic layout-analysis kernel: char records → per-page
    markdown.

    Pipeline (the pdfminer-style semantics from the north star):
    1. per page: detect columns (gutter that no char crosses —
       :func:`_detect_columns`); reading order is column-major (left column
       top-to-bottom, then right)
    2. per column: cluster chars into lines by baseline, split words at
       horizontal gaps, cluster lines into blocks by paragraph leading
       (:func:`_cluster_blocks`)
    3. blocks join lines with spaces; blocks join with blank lines; pages
       combine with the canonical page layout
       (reference: src/core/utils.py:112-161).

    Both decode frontends feed this: the toy ``%PDF-GRAFT1`` record array
    and the real ``%PDF-1.x`` content-stream interpreter
    (:mod:`.pdf_codec`).
    """
    if len(arr) == 0:
        return [], {"n_pages": 0, "n_blocks": 0, "n_chars": 0}
    page_markdowns = []
    n_blocks = 0
    n_pages = 0
    for page in np.unique(arr["page"]):
        sub = arr[arr["page"] == page]
        block_texts: list[str] = []
        for column in _detect_columns(sub):
            for lines in _cluster_blocks(column):
                block_texts.append(" ".join(lines))
        n_blocks += len(block_texts)
        n_pages += 1
        page_markdowns.append("\n\n".join(block_texts))
    stats = {"n_pages": n_pages, "n_blocks": n_blocks, "n_chars": int(len(arr))}
    return page_markdowns, stats


def decode_records(payload: bytes, password: bytes = b"") -> np.ndarray:
    """Decode a PDF payload to char records: toy ``%PDF-GRAFT1`` arrays via
    ``np.frombuffer``; genuine ``%PDF-1.x`` files via the from-scratch
    structure parser + content-stream interpreter (:mod:`.pdf_codec` —
    replaces the reference's pdfplumber frontend,
    reference: src/services/extraction_service.py:26-114)."""
    if payload.startswith(MAGIC):
        body = payload[len(MAGIC):]
        usable = len(body) - len(body) % RECORD_DTYPE.itemsize
        return np.frombuffer(body[:usable], dtype=RECORD_DTYPE)
    if b"%PDF-" in payload[:1024]:  # leading-junk tolerance (Adobe note)
        from .pdf_codec import parse_pdf_records

        return parse_pdf_records(payload, password=password)
    raise ValueError("not a PDF payload")


def _extract_pages(payload: bytes, password: bytes = b"") -> tuple[list[str], dict]:
    return records_to_markdown(decode_records(payload, password=password))


# ---------------------------------------------------------------------------
# Table-aware PDF extraction (the text_extraction / bank-statement flavor)
# ---------------------------------------------------------------------------

_CELL_GAP = CHAR_W * 3  # ≥3 char-cells of whitespace separates table columns


def _line_cells(cps: np.ndarray, x0s: np.ndarray, x1s: np.ndarray) -> list[tuple[float, str]]:
    """One x-sorted line's chars → ``(start_x, text)`` cell segments, split
    at gaps ≥ 3 character cells (the column separator); within a cell,
    ordinary word-gap detection applies."""
    if len(cps) == 0:
        return []
    gaps = x0s[1:] - x1s[:-1]
    breaks = np.flatnonzero(gaps >= _CELL_GAP) + 1
    cells = []
    for lo, hi in zip(np.concatenate(([0], breaks)), np.concatenate((breaks, [len(cps)]))):
        cells.append((float(x0s[lo]), _line_to_text(cps[lo:hi], x0s[lo:hi], x1s[lo:hi])))
    return cells


def _map_to_columns(
    ref_starts: list[float], cells: list[tuple[float, str]]
) -> list[str] | None:
    """Place a line's cells into the reference column slots by x position
    (±1 char tolerance). Sparse rows — EMPTY interior cells — map their
    present cells and leave the rest blank; any cell that matches no
    column (or doubles up) disqualifies the line from the table run."""
    out = [""] * len(ref_starts)
    for x, text in cells:
        col = None
        for j, rx in enumerate(ref_starts):
            if abs(x - rx) <= CHAR_W:
                col = j
                break
        if col is None or out[col]:
            return None
        out[col] = text
    return out


def extract_pdf_pages_tables(
    payload: bytes, password: bytes = b""
) -> tuple[list[str], dict]:
    """Table-aware layout analysis — the PDF counterpart of the reference's
    pdfplumber ``extract_table`` path used by the text_extraction
    (bank-statement) workflow (reference: src/services/
    extraction_service.py:26-114 + per-cell ``fix_bidi_text`` :49-57).

    Per page: lines whose cells (≥2, split at 3-char column gaps) start at
    matching x positions across consecutive lines form a TABLE (first line
    = headers, rendered as a markdown pipe table with the per-cell BiDi
    fix); remaining lines are paragraph text, clustered by leading as in
    :func:`records_to_markdown`. Column (gutter) detection is intentionally
    OFF here — a table's column gaps ARE gutters.
    """
    from .normalize import fix_bidi_text

    arr = decode_records(payload, password=password)
    if len(arr) == 0:
        return [], {"n_pages": 0, "n_blocks": 0, "n_chars": 0, "n_tables": 0}

    page_markdowns = []
    n_blocks = n_tables = 0
    for page in np.unique(arr["page"]):
        sub = arr[arr["page"] == page]
        order = np.lexsort((sub["x0"], -sub["y0"]))
        sub = sub[order]
        y_change = np.abs(np.diff(sub["y0"])) > LINE_H * 0.5
        line_first = np.flatnonzero(np.concatenate(([True], y_change)))
        line_last = np.concatenate((line_first[1:], [len(sub)])) - 1
        lines: list[tuple[float, list[tuple[float, str]]]] = []
        for li in range(len(line_first)):
            lo, hi = line_first[li], line_last[li] + 1
            lines.append(
                (
                    float(sub["y0"][lo]),
                    _line_cells(sub["cp"][lo:hi], sub["x0"][lo:hi], sub["x1"][lo:hi]),
                )
            )

        blocks: list[str] = []
        text_run: list[str] = []
        prev_text_y: float | None = None
        i = 0

        def flush_text():
            nonlocal text_run
            if text_run:
                blocks.append(" ".join(text_run))
                text_run = []

        while i < len(lines):
            y, cells = lines[i]
            starts = [c[0] for c in cells]
            if len(cells) >= 2:
                # grow a table run: the first line's starts define the
                # column grid; later lines may be SPARSE (empty interior
                # cells) as long as every present cell sits on the grid
                rows_mapped = []
                j = i + 1
                while j < len(lines):
                    nxt = lines[j][1]
                    mapped = _map_to_columns(starts, nxt) if len(nxt) >= 2 else None
                    if mapped is not None:
                        rows_mapped.append(mapped)
                        j += 1
                    else:
                        break
                if rows_mapped:
                    flush_text()
                    headers = [c[1] for c in cells]
                    width = len(headers)
                    md = ["| " + " | ".join(fix_bidi_text(h) for h in headers) + " |"]
                    md.append("| " + " | ".join(["---"] * width) + " |")
                    for vals in rows_mapped:
                        md.append(
                            "| " + " | ".join(fix_bidi_text(c) for c in vals) + " |"
                        )
                    blocks.append("\n".join(md))
                    n_tables += 1
                    prev_text_y = None
                    i = j
                    continue
            # plain text line: paragraph-leading clustering
            line_text = " ".join(c[1] for c in cells)
            if prev_text_y is not None and prev_text_y - y > LINE_H * 1.5:
                flush_text()
            text_run.append(line_text)
            prev_text_y = y
            i += 1
        flush_text()
        n_blocks += len(blocks)
        page_markdowns.append("\n\n".join(blocks))
    stats = {
        "n_pages": len(page_markdowns),
        "n_blocks": n_blocks,
        "n_chars": int(len(arr)),
        "n_tables": n_tables,
    }
    return page_markdowns, stats
