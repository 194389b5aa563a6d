"""HTML head-metadata extraction: title, meta description, canonical link,
Open Graph properties.

Crawl pipelines key search/dedup/display logic off head metadata long
before body extraction runs; the reference has no equivalent (it consumes
PDFs), so this is engine-native surface. Single pass, stops at the end of
``<head>`` (or the first body-content tag in head-less soup) — the parser
never walks a page's body, which at crawl scale is most of the bytes.
"""

from __future__ import annotations

from html.parser import HTMLParser


class _HeadParser(HTMLParser):
    """Tolerant of attribute order, quoting style, self-closing slashes,
    uppercase tag/attr names, and missing </head>."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.description: str | None = None
        self.canonical: str | None = None
        self.og: dict[str, str] = {}
        self._in_title = False
        self.done = False

    def handle_starttag(self, tag, attrs):
        if self.done:
            return
        if tag == "title":
            self._in_title = True
            return
        a = {k.lower(): (v or "") for k, v in attrs}
        if tag == "meta":
            name = a.get("name", "").lower()
            prop = a.get("property", "").lower()
            content = a.get("content", "")
            if name == "description" and self.description is None:
                self.description = content
            elif prop.startswith("og:"):
                self.og.setdefault(prop[3:], content)
        elif tag == "link":
            rels = a.get("rel", "").lower().split()
            if "canonical" in rels and self.canonical is None:
                self.canonical = a.get("href") or None
        elif tag == "body":
            self.done = True

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        elif tag == "head":
            self.done = True

    def handle_data(self, data):
        if self._in_title and not self.done:
            self.title_parts.append(data)


def parse_head_meta(html: str) -> dict:
    """→ ``{title, description, canonical, og}`` (None / {} when absent).
    Whitespace inside the title collapses to single spaces (what a crawler
    indexes), entity references are resolved by the tokenizer."""
    p = _HeadParser()
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001 — soup must never kill a batch
        pass
    title = " ".join("".join(p.title_parts).split()) or None
    return {
        "title": title,
        "description": p.description,
        "canonical": p.canonical,
        "og": p.og,
    }
