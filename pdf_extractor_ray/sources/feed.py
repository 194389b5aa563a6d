"""RSS 2.0 / Atom feed parsing as a Dataset stage — crawl discovery's
other seed channel besides sitemaps.

Reuses the sitemap module's from-scratch linear tag scanner
(:func:`.sitemap.iter_tags` — namespace-tolerant, entity-decoding, no
regex): RSS ``<item>`` and Atom ``<entry>`` elements yield
``(feed_kind, title, link, published)`` rows. Atom links live in the
``href`` attribute of ``<link rel="alternate">`` (or the first bare
``<link>``); RSS links are element text. Unknown roots raise the typed
:class:`FeedError`; malformed entries are skipped, never fatal —
real-world feeds are soup.
"""

from __future__ import annotations

import pyarrow as pa

from .sitemap import _decode_entities, iter_tags


class FeedError(ValueError):
    """Typed parse failure: not an RSS/Atom document."""


def _attr(raw_tag: str, name: str) -> str | None:
    """Attribute value from a raw tag body (quote-tolerant, lowercase)."""
    low = raw_tag.lower()
    for q in ('"', "'"):
        key = name + "="
        i = low.find(key)
        while i >= 0:
            j = i + len(key)
            if j < len(raw_tag) and raw_tag[j] == q:
                k = raw_tag.find(q, j + 1)
                if k > 0:
                    return raw_tag[j + 1 : k]
            i = low.find(key, i + 1)
    return None


def parse_feed(xml: str | bytes) -> list[dict]:
    """→ one dict per item/entry: ``{kind, title, link, published}``
    (missing fields are None)."""
    if isinstance(xml, (bytes, bytearray)):
        xml = xml.decode("utf-8", errors="replace")
    kind = None
    items: list[dict] = []
    cur: dict | None = None
    text_field = None
    # need raw tag bodies for Atom link attributes: re-scan alongside
    raw_tags: list[str] = []
    pos = 0
    while True:
        lt = xml.find("<", pos)
        if lt < 0:
            break
        gt = xml.find(">", lt)
        if gt < 0:
            break
        raw_tags.append(xml[lt + 1 : gt].strip())
        pos = gt + 1
    ri = -1
    for ev, name, text in iter_tags(xml):
        ri += 1
        if cur is not None and text_field and text.strip():
            cur[text_field] = _decode_entities(text.strip())
            text_field = None
        if ev == "pi":
            continue
        if kind is None and ev in ("open", "selfclose"):
            if name == "rss":
                kind = "rss"
                continue
            if name == "feed":
                kind = "atom"
                continue
            if name not in ("rss", "feed"):
                raise FeedError(f"not an RSS/Atom root: <{name}>")
        if ev == "open" and name in ("item", "entry"):
            cur = {"kind": kind, "title": None, "link": None, "published": None}
            continue
        if ev == "close" and name in ("item", "entry"):
            if cur is not None:
                items.append(cur)
            cur = None
            text_field = None
            continue
        if cur is None:
            continue
        if ev == "open" and name == "title":
            text_field = "title"
        elif ev == "open" and name in ("pubdate", "published", "updated"):
            text_field = "published" if cur["published"] is None else None
        elif name == "link":
            if kind == "atom" and ev in ("open", "selfclose"):
                raw = raw_tags[ri] if ri < len(raw_tags) else ""
                rel = (_attr(raw, "rel") or "alternate").lower()
                href = _attr(raw, "href")
                if href and rel == "alternate" and cur["link"] is None:
                    cur["link"] = _decode_entities(href)
            elif kind == "rss" and ev == "open":
                text_field = "link"
    return items


def feed_rows_batch(batch: pa.Table, xml_col: str = "xml") -> pa.Table:
    """Feed blobs → item rows inside ``map_batches`` (one read task per
    feed file at scale, like the sitemap source)."""
    kinds, titles, links, pubs = [], [], [], []
    for blob in batch[xml_col].to_pylist():
        for it in parse_feed(blob):
            kinds.append(it["kind"])
            titles.append(it["title"])
            links.append(it["link"])
            pubs.append(it["published"])
    return pa.Table.from_arrays(
        [
            pa.array(kinds, pa.string()),
            pa.array(titles, pa.string()),
            pa.array(links, pa.string()),
            pa.array(pubs, pa.string()),
        ],
        names=["kind", "title", "link", "published"],
    )
