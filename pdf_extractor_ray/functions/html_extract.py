"""Deterministic HTML main-content extraction (boilerplate removal).

This is the engine's analogue of the reference's OCR extraction step
(reference: src/services/extraction_service.py:26-114 — per-page markdown with
tables rendered as pipe tables): a single-pass DOM tokenizer (stdlib
``html.parser``) producing a block-feature stream, followed by
Boilerpipe/trafilatura-style text-density / link-density block scoring. Pure
and wall-clock-free so the same bytes produce byte-identical markdown at any
parallelism level.

Block model
-----------
- Text accumulates between block-level tag boundaries; whitespace runs
  collapse to single spaces.
- Blocks inside ``nav/header/footer/aside/form/button`` (or elements whose
  class/id tokens look like navigation chrome) are boilerplate.
- A block whose linked-character density exceeds ``max_link_density`` is
  boilerplate (link lists, menus).
- Short non-heading blocks (< ``min_block_text_len`` chars) are dropped.
- ``<table>`` elements parse into :class:`..functions.tables.PageTable`;
  header row = a leading ``<th>`` row.
- ``<div class="page">`` marks a page boundary (the fixture analogue of a
  PDF page); per-page markdowns are combined by
  :func:`..functions.assemble.combine_pages` (page headers only for
  multi-page documents, reference: src/core/utils.py:112-161).

Two flavors mirror the reference's workflow routes
(reference: src/workflows/workflow_router.py:15-46):
- ``article`` (default / "mistral" analogue): headings + paragraphs +
  inline tables.
- ``table_merge`` ("azure_document_intelligence" analogue): tables only,
  merged across pages with the header-match / continuation /
  balance-continuity rules (reference: table_merger.py:102-186), rendered
  with page-range captions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html import unescape as _unescape
from html.parser import HTMLParser
import re

from .assemble import EMPTY_CONTENT_MESSAGE, combine_pages
from .normalize import fix_bidi_text
from .tables import MergedTable, PageTable, merge_tables_across_pages

_WS_RE = re.compile(r"\s+")

IGNORED_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "head", "iframe"})
BOILERPLATE_TAGS = frozenset({"nav", "header", "footer", "aside", "form", "button"})
BOILERPLATE_CLASS_TOKENS = frozenset(
    {
        "nav", "navbar", "menu", "sidebar", "footer", "header", "banner",
        "cookie", "consent", "ad", "ads", "advert", "breadcrumb", "comment",
        "share", "social", "related", "widget", "promo", "subscribe",
    }
)
BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "body", "li", "ul", "ol",
        "h1", "h2", "h3", "h4", "h5", "h6", "pre", "blockquote", "tr",
        "table", "figcaption", "dt", "dd",
    }
)
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})


@dataclass
class Block:
    """One candidate content block with its scoring features."""

    kind: str  # 'text' | 'heading' | 'table'
    page: int
    text: str = ""
    text_len: int = 0
    link_len: int = 0
    boilerplate: bool = False
    heading_level: int = 0
    table: PageTable | None = None
    # Raw-source char span [span_start, span_end) covering the block's
    # text runs — provenance for span-level training-data alignment.
    # Tracked by the fast engine (the regex scanner knows positions);
    # stdlib-engine and synthetic runs carry -1 (SURVEY north star:
    # "reconciles extracted spans against the provided text column").
    span_start: int = field(default=-1, compare=False)
    span_end: int = field(default=-1, compare=False)

    @property
    def link_density(self) -> float:
        return self.link_len / self.text_len if self.text_len else 0.0


class _Tokenizer(HTMLParser):
    """Single-pass DOM walk producing the block stream."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self.page = 0
        self.n_page_divs = 0
        self._ignore_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._li_depth = 0
        self._pre_depth = 0
        self._quote_depth = 0
        self._heading: str | None = None
        self._parts: list[str] = []
        self._link_chars = 0
        # table state
        self._table: PageTable | None = None
        self._table_depth = 0
        self._rows: list[list[str]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None
        self._row_has_th = False
        self._first_row_th = False
        # Open block-element stack: (tag, is_boilerplate). Implicit end tags
        # (messy HTML) are handled by popping to the nearest matching tag.
        self._stack: list[tuple[str, bool]] = []
        # Source-position tracking (fast engine sets these around
        # handle_data; -1 = position unknown/synthetic).
        self._cur_pos = -1
        self._cur_end = -1
        self._span_start = -1
        self._span_end = -1

    # -- block accumulation -------------------------------------------------
    def _flush(self) -> None:
        if self._pre_depth:
            # Preformatted content keeps its whitespace verbatim
            # (rendered as a fenced code block).
            raw = "".join(self._parts).strip("\n")
        else:
            raw = _WS_RE.sub(" ", "".join(self._parts)).strip()
        if raw:
            if self._heading:
                kind = "heading"
            elif self._pre_depth:
                kind = "pre"
            elif self._li_depth:
                kind = "list_item"
            elif self._quote_depth:
                kind = "blockquote"
            else:
                kind = "text"
            level = int(self._heading[1]) if self._heading else 0
            self.blocks.append(
                Block(
                    kind=kind,
                    page=self.page,
                    text=raw,
                    text_len=len(raw),
                    link_len=min(self._link_chars, len(raw)),
                    boilerplate=self._boiler_depth > 0,
                    heading_level=level,
                    span_start=self._span_start,
                    span_end=self._span_end,
                )
            )
        self._parts = []
        self._link_chars = 0
        self._span_start = -1
        self._span_end = -1

    @staticmethod
    def _is_boiler_attrs(attrs: list[tuple[str, str | None]]) -> bool:
        for key, value in attrs:
            if key in ("class", "id", "role") and value:
                tokens = re.split(r"[\s_\-]+", value.lower())
                if any(tok in BOILERPLATE_CLASS_TOKENS for tok in tokens):
                    return True
        return False

    @staticmethod
    def _is_page_div(tag: str, attrs: list[tuple[str, str | None]]) -> bool:
        if tag != "div":
            return False
        for key, value in attrs:
            if key == "class" and value:
                if "page" in re.split(r"[\s_\-]+", value.lower()):
                    return True
        return False

    # -- HTMLParser hooks ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in IGNORED_TAGS:
            self._ignore_depth += 1
            return
        if self._ignore_depth:
            return
        if tag == "a":
            self._link_depth += 1
            return
        if tag == "table":
            self._table_depth += 1
            if self._table_depth == 1:
                self._flush()
                self._table = PageTable([], [], self.page)
                self._rows = []
                self._first_row_th = False
            return
        if self._table is not None:
            if self._table_depth > 1:
                return  # nested table: structure flattens into the open cell
            if tag == "tr":
                self._end_row()
                self._row = []
                self._row_has_th = False
            elif tag in ("td", "th"):
                self._end_cell()
                self._cell = []
                if tag == "th":
                    self._row_has_th = True
            return
        if tag in BLOCK_TAGS or tag in BOILERPLATE_TAGS:
            self._flush()
            if self._is_page_div(tag, attrs):
                self.n_page_divs += 1
                self.page = self.n_page_divs
            if tag in HEADING_TAGS:
                self._heading = tag
            if tag == "li":
                self._li_depth += 1
            elif tag == "pre":
                self._pre_depth += 1
            elif tag == "blockquote":
                self._quote_depth += 1
            is_boiler = tag in BOILERPLATE_TAGS or self._is_boiler_attrs(attrs)
            if is_boiler:
                self._boiler_depth += 1
            self._stack.append((tag, is_boiler))
        elif tag == "br":
            self._parts.append(" ")

    def handle_endtag(self, tag):
        if tag in IGNORED_TAGS:
            self._ignore_depth = max(0, self._ignore_depth - 1)
            return
        if self._ignore_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
            return
        if tag == "table":
            if self._table_depth == 1 and self._table is not None:
                self._end_row()
                self._finish_table()
            self._table_depth = max(0, self._table_depth - 1)
            return
        if self._table is not None:
            if self._table_depth > 1:
                return  # nested table: see handle_starttag
            if tag == "tr":
                self._end_row()
            elif tag in ("td", "th"):
                self._end_cell()
            return
        if tag in BLOCK_TAGS or tag in BOILERPLATE_TAGS:
            self._flush()
            if tag in HEADING_TAGS and self._heading == tag:
                self._heading = None
            # Pop to the nearest matching open element (implicit end tags).
            if any(t == tag for t, _ in self._stack):
                while self._stack:
                    popped_tag, popped_boiler = self._stack.pop()
                    if popped_boiler:
                        self._boiler_depth = max(0, self._boiler_depth - 1)
                    if popped_tag == "li":
                        self._li_depth = max(0, self._li_depth - 1)
                    elif popped_tag == "pre":
                        self._pre_depth = max(0, self._pre_depth - 1)
                    elif popped_tag == "blockquote":
                        self._quote_depth = max(0, self._quote_depth - 1)
                    if popped_tag == tag:
                        break

    def handle_data(self, data):
        if self._ignore_depth or not data:
            return
        if self._cell is not None:
            self._cell.append(data)
            return
        if self._table is not None:
            return  # stray text between table cells is layout noise
        self._parts.append(data)
        if self._cur_pos >= 0 and data.strip():
            if self._span_start < 0:
                self._span_start = self._cur_pos
            self._span_end = self._cur_end
        if self._link_depth:
            self._link_chars += len(_WS_RE.sub(" ", data).strip())

    # -- table helpers ------------------------------------------------------
    def _end_cell(self) -> None:
        if self._cell is not None and self._row is not None:
            self._row.append(_WS_RE.sub(" ", "".join(self._cell)).strip())
        self._cell = None

    def _end_row(self) -> None:
        self._end_cell()
        if self._row is not None and self._row:
            if not self._rows:
                self._first_row_th = self._row_has_th
            self._rows.append(self._row)
        self._row = None

    def _finish_table(self) -> None:
        table = self._table
        self._table = None
        if table is None or not self._rows:
            return
        if (
            not self._first_row_th
            and len(self._rows) == 1
            and len(self._rows[0]) == 1
        ):
            # Layout table (single headerless cell — the classic old-web
            # centering shell): unwrap to a plain text block.
            text = self._rows[0][0]
            self._rows = []
            if text:
                self.blocks.append(
                    Block(
                        kind="text",
                        page=table.page,
                        text=text,
                        text_len=len(text),
                        boilerplate=self._boiler_depth > 0,
                    )
                )
            return
        if self._first_row_th:
            table.headers = self._rows[0]
            table.data_rows = self._rows[1:]
            table.has_headers = True
        else:
            table.headers = []
            table.data_rows = self._rows
            table.has_headers = False
        self.blocks.append(
            Block(
                kind="table",
                page=table.page,
                text_len=sum(len(c) for r in self._rows for c in r),
                boilerplate=self._boiler_depth > 0,
                table=table,
            )
        )
        self._rows = []


# ---------------------------------------------------------------------------
# Fast regex-based frontend
# ---------------------------------------------------------------------------
# The block-builder state machine above is frontend-agnostic: its handle_*
# methods can be driven by stdlib html.parser (reference implementation —
# handles every corner of real-world HTML) or by this regex scanner, which
# produces an identical block stream ~3× faster on typical pages
# (differential-tested in tests/test_html_fast.py). The scanner only parses
# attributes for tags whose attributes matter (page divs, boilerplate
# classes), skips <script>/<style> raw content with a single find, and
# unescapes entities lazily.

_FAST_TOKEN_RE = re.compile(
    r"<!--.*?-->"                        # comments
    r"|<!\[[A-Za-z]*\[.*?\]\]>"          # marked sections: CDATA/INCLUDE/…
    r"|<![^>]*>"                          # doctype / declarations
    r"|<\?[^>]*>"                         # processing instructions
    r"|</(?:[^a-zA-Z>][^>]*)?>"          # bogus end tag (</ p>, </>): drop
    r"|<(/?)([a-zA-Z][a-zA-Z0-9:-]*)"    # tag open: slash + name
    # Attributes: quoted strings may contain '>', otherwise any non-'>'
    # char (lenient like html.parser — unpaired quotes are plain chars).
    r"((?:\"[^\"]*\"|'[^']*'|[^>])*)"
    r">"
    r"|[^<]+"                             # text
    r"|<",                                # stray '<' → literal text
    re.DOTALL,
)
_FAST_ATTR_RE = re.compile(
    r"([a-zA-Z][a-zA-Z0-9_:-]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)
# Tags whose attributes the block builder inspects (page divs, boilerplate
# class/id/role); all others get an empty attr list — parsing skipped.
_ATTR_TAGS = BLOCK_TAGS | BOILERPLATE_TAGS
_RAW_TEXT_TAGS = ("script", "style")  # html.parser CDATA_CONTENT_ELEMENTS


def _fast_parse_attrs(raw: str) -> list[tuple[str, str | None]]:
    attrs: list[tuple[str, str | None]] = []
    for match in _FAST_ATTR_RE.finditer(raw):
        name = match.group(1).lower()
        value = match.group(2)
        if value:
            if value[:1] in ("\"", "'"):
                value = value[1:-1]
            if "&" in value:
                value = _unescape(value)
        attrs.append((name, value))
    return attrs


def _fast_feed(html: str, builder: "_Tokenizer") -> None:
    pos = 0
    n = len(html)
    lower = None  # lazily lowered copy for raw-content close-tag search
    while pos < n:
        match = _FAST_TOKEN_RE.match(html, pos)
        if match is None:  # defensive; the alternation is total
            builder.handle_data(html[pos])
            pos += 1
            continue
        pos = match.end()
        name = match.group(2)
        if name is None:
            text = match.group(0)
            if text[0] != "<":
                if "&" in text:
                    text = _unescape(text)
                builder._cur_pos = match.start()
                builder._cur_end = match.end()
                builder.handle_data(text)
                builder._cur_pos = builder._cur_end = -1
            elif text == "<":
                nxt = html[pos : pos + 1]
                if nxt and (nxt.isalpha() or nxt in "/!?") and ">" not in html[pos:]:
                    # Truncated tag at EOF (crawl cut mid-payload): drop
                    # the unterminated tail, per browser EOF-in-tag
                    # handling, instead of leaking it as text.
                    break
                builder._cur_pos = match.start()
                builder._cur_end = match.end()
                builder.handle_data("<")
                builder._cur_pos = builder._cur_end = -1
            # comments/doctype/PI: dropped, same as the builder's stdlib path
            continue
        tag = name.lower()
        if match.group(1):  # closing tag
            builder.handle_endtag(tag)
            continue
        raw_attrs = match.group(3)
        attrs = (
            _fast_parse_attrs(raw_attrs)
            if raw_attrs and tag in _ATTR_TAGS
            else []
        )
        # Self-closing only when the trailing '/' is NOT part of an unquoted
        # attribute value: html.parser's attrfind value pattern ([^>\s]*)
        # swallows a '/' glued to an unquoted value (<div data-x=foo/> keeps
        # the element open with value "foo/"), so the fast path must too —
        # the '/' counts only after whitespace, a quote, or the bare tag name.
        stripped = raw_attrs.rstrip() if raw_attrs else ""
        self_closing = stripped.endswith("/") and (
            len(stripped) == 1 or stripped[-2] in " \t\n\r\f\"'"
        )
        builder.handle_starttag(tag, attrs)
        if self_closing:
            builder.handle_endtag(tag)
        elif tag in _RAW_TEXT_TAGS:
            # Raw-content element: skip to its close tag in one find.
            if lower is None:
                lower = html.lower()
            close = lower.find(f"</{tag}", pos)
            pos = n if close < 0 else close
            # (content dropped — the builder ignores it anyway)
    # no trailing buffer: the regex consumes the input fully


def tokenize_blocks(html: str, engine: str = "fast") -> list[Block]:
    """Tokenize HTML into the raw block-feature stream (pre-scoring).

    ``engine="fast"`` (default): regex scanner; ``engine="stdlib"``: the
    html.parser frontend (reference implementation for the differential
    test, and the fallback for HTML the scanner mishandles).
    """
    parser = _Tokenizer()
    if engine == "stdlib":
        parser.feed(html)
        parser.close()
    else:
        _fast_feed(html, parser)
    parser._flush()
    return parser.blocks


def score_blocks(
    blocks: list[Block],
    min_block_text_len: int = 8,
    max_link_density: float = 0.35,
) -> list[Block]:
    """Keep content blocks, drop boilerplate.

    Rules: ancestor-boilerplate blocks drop; blocks with link density above
    the threshold drop; short non-heading, non-table blocks drop. Headings
    with no following kept text block within the same page still survive —
    section structure is part of main content.
    """
    kept: list[Block] = []
    for block in blocks:
        if block.boilerplate:
            continue
        if block.kind == "table":
            kept.append(block)
            continue
        if block.link_density > max_link_density:
            continue
        if block.kind != "heading" and block.text_len < min_block_text_len:
            continue
        kept.append(block)
    return kept


def _render_inline_table(table: PageTable, bidi_cells: bool = False) -> str:
    """Inline (article-flavor) pipe-table rendering: header + separator +
    rows when the table has headers, bare pipe rows otherwise.

    ``bidi_cells`` applies the RTL display-order fix per cell — the
    text_extraction workflow's behavior (reference:
    src/services/extraction_service.py:50-57 runs fix_bidi_text on every
    pdfplumber cell)."""
    fix = fix_bidi_text if bidi_cells else (lambda s: s)
    lines: list[str] = []
    if table.has_headers and table.headers:
        width = len(table.headers)
        lines.append("| " + " | ".join(fix(h) for h in table.headers) + " |")
        lines.append("| " + " | ".join(["---"] * width) + " |")
        for row in table.data_rows:
            padded = (row + [""] * (width - len(row)))[:width]
            lines.append("| " + " | ".join(fix(c) for c in padded) + " |")
    else:
        for row in table.data_rows:
            lines.append("| " + " | ".join(fix(c) for c in row) + " |")
    return "\n".join(lines)


def article_pages(blocks: list[Block], bidi_cells: bool = False) -> list[str]:
    """Article flavor as per-page markdowns (non-empty pages only, in page
    order). The chunked path concatenates these across chunks before the
    final :func:`..functions.assemble.combine_pages`."""
    pages: dict[int, list[str]] = {}
    for block in blocks:
        if block.kind == "heading":
            md = "#" * block.heading_level + " " + block.text
        elif block.kind == "table":
            md = _render_inline_table(block.table, bidi_cells)
        elif block.kind == "list_item":
            md = "- " + block.text
        elif block.kind == "pre":
            md = f"```\n{block.text}\n```"
        elif block.kind == "blockquote":
            md = "> " + block.text
        else:
            md = block.text
        if md:
            pages.setdefault(block.page, []).append(md)
    return ["\n\n".join(pages[p]) for p in sorted(pages)]


def render_article(blocks: list[Block]) -> str:
    """Article flavor: headings/paragraphs/inline tables, per page, combined
    with the canonical page layout."""
    return combine_pages(article_pages(blocks))


def render_merged_tables(blocks: list[Block]) -> str:
    """Table-merge flavor: cross-page merged tables with captions
    (reference: table_merger.py:102-186, 38-92), joined with blank lines."""
    tables = [b.table for b in blocks if b.kind == "table" and b.table is not None]
    if not tables:
        return EMPTY_CONTENT_MESSAGE
    merged: list[MergedTable] = merge_tables_across_pages(tables)
    return "\n\n".join(t.to_markdown() for t in merged if t.to_markdown())


def extract_html(
    html: str,
    flavor: str = "article",
    min_block_text_len: int = 8,
    max_link_density: float = 0.35,
) -> tuple[str, dict]:
    """Extract main content markdown from an HTML string.

    Returns ``(markdown, stats)`` where stats carries per-document extraction
    metrics (kept/dropped blocks, tables, pages) for the lineage aggregate.
    """
    blocks = tokenize_blocks(html)
    kept = score_blocks(blocks, min_block_text_len, max_link_density)
    if flavor == "table_merge":
        text = render_merged_tables(kept)
    elif flavor == "text_extraction":
        # pdfplumber-analogue route: article layout + per-cell bidi fix
        # (reference: extraction_service.py:26-114).
        text = combine_pages(article_pages(kept, bidi_cells=True))
    else:
        text = render_article(kept)
    stats = {
        "n_blocks_raw": len(blocks),
        "n_blocks_kept": len(kept),
        "n_tables": sum(1 for b in kept if b.kind == "table"),
        "n_pages": len({b.page for b in kept}) or 1,
    }
    return text, stats


def extract_html_spans(
    html: str,
    min_block_text_len: int = 8,
    max_link_density: float = 0.35,
) -> list[tuple[str, int, int, str]]:
    """Kept-block PROVENANCE SPANS over the raw source: one
    ``(kind, span_start, span_end, text)`` tuple per kept block, where
    ``html[span_start:span_end]`` covers the block's raw text runs —
    the span-level alignment a training-data pipeline reconciles
    against the provided text column (SURVEY north star). Fast-engine
    feature; table blocks carry (-1, -1)."""
    kept = score_blocks(
        tokenize_blocks(html), min_block_text_len, max_link_density
    )
    return [(b.kind, b.span_start, b.span_end, b.text) for b in kept]


def extract_html_pages(
    html: str,
    min_block_text_len: int = 8,
    max_link_density: float = 0.35,
) -> tuple[list[str], dict]:
    """Article-flavor extraction returning per-page markdowns (the unit the
    chunked skew path reassembles; ``combine_pages`` over the concatenation
    across chunks is byte-identical to whole-document extraction)."""
    blocks = tokenize_blocks(html)
    kept = score_blocks(blocks, min_block_text_len, max_link_density)
    pages = article_pages(kept)
    stats = {
        "n_blocks_raw": len(blocks),
        "n_blocks_kept": len(kept),
        "n_tables": sum(1 for b in kept if b.kind == "table"),
        "n_pages": len(pages),
    }
    return pages, stats
