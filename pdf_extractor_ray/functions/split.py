"""Skew-aware splitting of oversized payloads into page-range chunks.

The engine's analogue of the reference's outline/count-based chunker
(reference: src/services/pdf_processor.py:29-68, 223-311 — documents are cut
into ≤ ``MAX_PAGES_PER_CHUNK`` page chunks before extraction). HTML splits
at ``<div class="page">`` boundaries; toy-PDF payloads split by page-id
ranges of the record array. Both are pure byte-level operations — each chunk
is independently extractable, and concatenating the chunks' per-page
markdowns in chunk order then applying
:func:`..functions.assemble.combine_pages` is byte-identical to
whole-document extraction (tested in tests/test_split.py).
"""

from __future__ import annotations

import re

import numpy as np

from .pdf_extract import MAGIC, RECORD_DTYPE

_PAGE_DIV_RE = re.compile(rb'<div\s+class="[^"]*\bpage\b[^"]*"', re.IGNORECASE)


def split_html_payload(payload: bytes, max_pages_per_chunk: int = 15) -> list[bytes]:
    """Split an HTML payload into chunks of ≤ ``max_pages_per_chunk`` page
    divs. Content before the first page div (the shell preamble) rides with
    the first chunk; the tail after the last page div (footer) with the last.
    Documents without page structure are returned whole."""
    starts = [m.start() for m in _PAGE_DIV_RE.finditer(payload)]
    if len(starts) <= max_pages_per_chunk:
        return [payload]
    chunks: list[bytes] = []
    for i in range(0, len(starts), max_pages_per_chunk):
        lo = 0 if i == 0 else starts[i]
        hi = len(payload) if i + max_pages_per_chunk >= len(starts) else starts[i + max_pages_per_chunk]
        chunks.append(payload[lo:hi])
    return chunks


def split_pdf_payload(
    payload: bytes, max_pages_per_chunk: int = 15, password: bytes = b""
) -> list[bytes]:
    """Split a PDF payload by page-id ranges. Toy payloads slice the record
    array directly; a real ``%PDF-1.x`` payload is decoded ONCE here and its
    chunks are re-emitted in the (internal) record format — each chunk is
    independently extractable by the same layout kernel, and the decode cost
    moves to the split stage instead of being paid per chunk."""
    if payload.startswith(MAGIC):
        body = payload[len(MAGIC):]
        usable = len(body) - len(body) % RECORD_DTYPE.itemsize
        arr = np.frombuffer(body[:usable], dtype=RECORD_DTYPE)
    else:
        from .pdf_extract import decode_records

        try:
            arr = decode_records(payload, password=password)
        except Exception:
            return [payload]  # undecodable: error containment downstream
    if len(arr) == 0:
        return [payload]
    pages = np.unique(arr["page"])
    if len(pages) <= max_pages_per_chunk:
        return [payload]
    order = np.argsort(arr["page"], kind="stable")
    arr = arr[order]
    chunks: list[bytes] = []
    for i in range(0, len(pages), max_pages_per_chunk):
        page_set = pages[i : i + max_pages_per_chunk]
        mask = (arr["page"] >= page_set[0]) & (arr["page"] <= page_set[-1])
        chunks.append(MAGIC + arr[mask].tobytes())
    return chunks


def split_payload(
    payload: bytes, route: str, max_pages_per_chunk: int = 15, password: bytes = b""
) -> list[bytes]:
    """Route-aware split; non-splittable routes return the payload whole.
    ``password`` opens encrypted PDFs for the decode-once split (the
    re-emitted record chunks are plaintext — the decrypt cost is paid
    exactly once, at the split)."""
    if route == "pdf":
        return split_pdf_payload(payload, max_pages_per_chunk, password=password)
    if route == "html":
        return split_html_payload(payload, max_pages_per_chunk)
    return [payload]
