"""Sitemap parsing (sitemaps.org XML protocol subset) as a Dataset stage.

Crawl seeding consumes sitemap.xml files: ``<urlset>`` leaves carrying
``<url><loc>/<lastmod>/<changefreq>/<priority>`` entries and
``<sitemapindex>`` nodes pointing at child sitemaps. This is a
from-scratch, regex-free tokenizer for the subset the protocol actually
uses (no attributes matter, entities in ``<loc>`` do): a linear scanner
over tag events, namespace-prefix tolerant, entity-decoding, bounded by
the protocol's 50k-urls-per-file rule.

Dataflow: one sitemap blob → rows inside ``map_batches``; an index file
yields (child_url, kind='sitemap') rows a driver loop can feed back as the
next wave's fetch list — the recursion is data-level, never call-stack.
"""

from __future__ import annotations

import pyarrow as pa

_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'",
}

MAX_URLS_PER_FILE = 50_000  # sitemaps.org hard limit


class SitemapError(ValueError):
    """Typed parse failure (unterminated tag, unknown root, over-limit)."""


def _decode_entities(s: str) -> str:
    for k, v in _ENTITIES.items():
        s = s.replace(k, v)
    return s


def _local(tag: str) -> str:
    """Tag token → lowercased local name (namespace prefix + attrs off)."""
    name = tag.split()[0] if tag.split() else ""
    return name.rsplit(":", 1)[-1].lower()


def iter_tags(xml: str):
    """Linear tag-event scanner → (kind, name, text-before). kind is
    'open' | 'close' | 'selfclose' | 'pi'."""
    pos, n = 0, len(xml)
    while pos < n:
        lt = xml.find("<", pos)
        if lt < 0:
            break
        gt = xml.find(">", lt)
        if gt < 0:
            raise SitemapError("unterminated tag")
        text = xml[pos:lt]
        raw = xml[lt + 1 : gt].strip()
        if raw.startswith("?") or raw.startswith("!"):
            yield "pi", "", text
        elif raw.startswith("/"):
            yield "close", _local(raw[1:]), text
        elif raw.endswith("/"):
            yield "selfclose", _local(raw[:-1]), text
        else:
            yield "open", _local(raw), text
        pos = gt + 1


def parse_sitemap(xml: str | bytes) -> list[dict]:
    """→ rows ``{loc, lastmod, changefreq, priority, kind}``; kind is
    'url' for urlset leaves, 'sitemap' for index children. Gzipped
    payloads (``sitemap.xml.gz`` — the robots.txt-advertised norm for
    large sites) are detected by magic and decompressed (round 5)."""
    if isinstance(xml, (bytes, bytearray)):
        if bytes(xml[:2]) == b"\x1f\x8b":
            import gzip

            xml = gzip.decompress(bytes(xml))
        xml = xml.decode("utf-8", errors="replace")
    rows: list[dict] = []
    root: str | None = None
    entry: dict | None = None
    field: str | None = None
    for kind, name, text in iter_tags(xml):
        if field is not None and entry is not None and kind == "close" and name == field:
            entry[field] = _decode_entities(text.strip())
            field = None
            continue
        if kind == "pi":
            continue
        if kind == "open":
            if root is None:
                if name not in ("urlset", "sitemapindex"):
                    raise SitemapError(f"unknown root element <{name}>")
                root = name
            elif name in ("url", "sitemap"):
                entry = {}
            elif entry is not None and name in (
                "loc", "lastmod", "changefreq", "priority",
            ):
                field = name
        elif kind == "close" and name in ("url", "sitemap") and entry is not None:
            if "loc" in entry:
                rows.append(
                    {
                        "loc": entry.get("loc"),
                        "lastmod": entry.get("lastmod"),
                        "changefreq": entry.get("changefreq"),
                        "priority": entry.get("priority"),
                        "kind": "url" if root == "urlset" else "sitemap",
                    }
                )
                if len(rows) > MAX_URLS_PER_FILE:
                    raise SitemapError("over the 50k-entries-per-file limit")
            entry = None
    return rows


def sitemap_rows_batch(batch: pa.Table, xml_col: str = "xml") -> pa.Table:
    """Sitemap blobs column → flat entry rows (+ source index)."""
    locs, lastmods, freqs, prios, kinds, srcs = [], [], [], [], [], []
    for i, blob in enumerate(batch[xml_col].to_pylist()):
        if blob is None:
            continue
        for row in parse_sitemap(blob):
            locs.append(row["loc"])
            lastmods.append(row["lastmod"])
            freqs.append(row["changefreq"])
            prios.append(row["priority"])
            kinds.append(row["kind"])
            srcs.append(i)
    return pa.Table.from_arrays(
        [
            pa.array(locs, pa.string()),
            pa.array(lastmods, pa.string()),
            pa.array(freqs, pa.string()),
            pa.array(prios, pa.string()),
            pa.array(kinds, pa.string()),
            pa.array(srcs, pa.int32()),
        ],
        names=["loc", "lastmod", "changefreq", "priority", "kind", "src_idx"],
    )
