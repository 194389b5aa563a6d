"""Charset sniffing + decoding for crawled HTML (WHATWG encoding-sniff
subset).

Real crawl payloads are NOT all UTF-8: a large minority of pages are
windows-1252 (often mislabeled "latin1"/"iso-8859-1") or UTF-16 with a
BOM. The reference operates on uploaded PDFs and never faces this
(reference: src/services/pdf_input_handler.py decodes base64, not text);
at crawl scale the decode step is mandatory before any DOM work.

Sniff order (the WHATWG algorithm's deterministic core):
1. BOM: EF BB BF → utf-8, FF FE → utf-16-le, FE FF → utf-16-be
   (BOM always wins over any in-document label).
2. ``<meta charset=...>`` / ``<meta http-equiv=content-type ...>`` scan of
   the first 1024 bytes (ASCII-superset encodings only — exactly why the
   scan works before the encoding is known).
3. Default: utf-8.

Label normalization follows the WHATWG table's relevant rows: latin1 /
iso-8859-1 / ascii / us-ascii are ALL windows-1252 in web content.
"""

from __future__ import annotations

import re

import pyarrow as pa

# WHATWG label → canonical encoding (subset covering crawl-dominant labels)
_LABELS = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "l1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "utf-16": "utf-16-le",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    # Round 5 — the remaining crawl-significant WHATWG rows, decoded by
    # the stdlib codecs they map to (all ASCII-superset, so the 1 KiB
    # meta pre-scan stays valid for every one of them):
    "windows-1251": "windows-1251",   # Cyrillic web default
    "cp1251": "windows-1251",
    "koi8-r": "koi8-r",
    "koi8-u": "koi8-u",
    "iso-8859-2": "iso-8859-2",       # Central European
    "latin2": "iso-8859-2",
    "iso-8859-5": "iso-8859-5",
    "iso-8859-7": "iso-8859-7",       # Greek
    "iso-8859-9": "windows-1254",     # WHATWG: 8859-9 IS windows-1254
    "windows-1254": "windows-1254",
    "iso-8859-15": "iso-8859-15",
    "windows-1250": "windows-1250",
    "windows-1253": "windows-1253",
    "windows-1255": "windows-1255",   # Hebrew
    "windows-1256": "windows-1256",   # Arabic
    "windows-874": "cp874",           # Thai
    "tis-620": "cp874",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "ms_kanji": "shift_jis",
    "euc-jp": "euc_jp",
    "gbk": "gbk",
    "gb2312": "gbk",                  # WHATWG: gb2312 label decodes as GBK
    "gb_2312": "gbk",
    "chinese": "gbk",
    "big5": "big5",
    "big5-hkscs": "big5hkscs",
    "euc-kr": "euc_kr",
    "korean": "euc_kr",
    "ks_c_5601-1987": "euc_kr",
}

_META_CHARSET = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I)


def normalize_label(label: str) -> str | None:
    return _LABELS.get(label.strip().lower())


def sniff_charset(raw: bytes) -> tuple[str, int]:
    """→ (canonical encoding, BOM length to strip)."""
    if raw[:3] == b"\xef\xbb\xbf":
        return "utf-8", 3
    if raw[:2] == b"\xff\xfe":
        return "utf-16-le", 2
    if raw[:2] == b"\xfe\xff":
        return "utf-16-be", 2
    m = _META_CHARSET.search(raw[:1024])
    if m:
        enc = normalize_label(m.group(1).decode("ascii", "replace"))
        if enc:
            return enc, 0
    return "utf-8", 0


def decode_html_bytes(raw: bytes) -> tuple[str, str]:
    """→ (decoded text, canonical encoding used). Undecodable byte
    sequences are replaced (U+FFFD), never raised — a crawl decode stage
    must not die on one mojibake page."""
    enc, bom = sniff_charset(raw)
    return raw[bom:].decode(enc, errors="replace"), enc


def decode_pages_batch(batch: pa.Table) -> pa.Table:
    """Pages batch → same schema with ``html`` re-encoded utf-8 (+
    ``charset`` lineage column). PDF payloads pass through untouched —
    charset decoding is an HTML-route concern. Round 5: PDF detection
    delegates to the routing sniff, so leading-junk PDFs (header within
    the first 1024 bytes, Adobe note) also pass through instead of
    being mojibake-re-encoded."""
    from .routing import ROUTE_PDF, sniff_payload_route

    payloads = batch["html"].to_pylist()
    out, charsets = [], []
    for p in payloads:
        if p is None or sniff_payload_route(p) == ROUTE_PDF:
            out.append(p)
            charsets.append("binary" if p else "empty")
            continue
        text, enc = decode_html_bytes(p)
        out.append(text.encode("utf-8"))
        charsets.append(enc)
    cols = {name: batch[name] for name in batch.column_names}
    cols["html"] = pa.array(out, pa.binary())
    cols["charset"] = pa.array(charsets, pa.string())
    return pa.Table.from_arrays(list(cols.values()), names=list(cols.keys()))


def encode_html(text: str, encoding: str, with_bom: bool = False) -> bytes:
    """Test/synthesis helper: encode to a target charset (+ optional BOM)."""
    body = text.encode(encoding)
    if with_bom:
        if encoding == "utf-8":
            return b"\xef\xbb\xbf" + body
        if encoding == "utf-16-le":
            return b"\xff\xfe" + body
        if encoding == "utf-16-be":
            return b"\xfe\xff" + body
    return body
