"""Payload sniffing and query→workflow routing.

Routing semantics mirrored from the reference
(reference: src/workflows/workflow_router.py:15-46, query mapping
src/core/config.py:60-73, PDF magic check
src/services/pdf_input_handler.py:88-92). In the Ray engine, routing is a
cheap vectorized projection computed once per row; downstream extraction
branches per row inside a single UDF (no dataset split).
"""

from __future__ import annotations

PDF_MAGIC = b"%PDF"

# Route names for the payload branch of the engine.
ROUTE_HTML = "html"
ROUTE_PDF = "pdf"
ROUTE_EMPTY = "empty"

# Query-pattern → workflow mapping (reference: src/core/config.py:60-73).
# Patterns are matched as case-insensitive substrings of the query, in
# insertion order; "default" is the fallback.
DEFAULT_QUERY_WORKFLOW_MAPPING: dict[str, str] = {
    "01_fin_reports": "mistral",
    "02_trial_balance": "azure_document_intelligence",
    "03_balances": "azure_document_intelligence",
    "04_bank_statements": "text_extraction",
    "05_esna": "azure_document_intelligence",
    "ocr with images": "ocr_with_images",
    "gemini-wf": "gemini-wf",
    "default": "mistral",
}

KNOWN_WORKFLOWS = (
    "mistral",
    "text_extraction",
    "azure_document_intelligence",
    "openai",
    "gemini",
    "gemini-wf",
    "ocr_with_images",
)


def sniff_payload_route(payload: bytes | None) -> str:
    """Classify a raw payload: ``%PDF`` magic → pdf branch, empty → empty,
    else html (reference: pdf_input_handler.py:88-92 magic check).

    Round 5: a ``%PDF-`` header within the first 1024 bytes also routes
    to the pdf branch (the Adobe implementation-note scan — crawl
    payloads carry HTTP fragments/BOM junk before the header), UNLESS
    the prefix already looks like HTML (``<html``/``<!doctype``) — an
    HTML page merely mentioning ``%PDF-`` must not misroute."""
    if not payload:
        return ROUTE_EMPTY
    if payload[:4] == PDF_MAGIC:
        return ROUTE_PDF
    head = payload[:1024]
    idx = head.find(b"%PDF-")
    if idx > 0:
        prefix = head[:idx].lower()
        if b"<html" not in prefix and b"<!doctype" not in prefix:
            return ROUTE_PDF
    return ROUTE_HTML


def get_workflow_for_query(
    query: str | None,
    mapping: dict[str, str] | None = None,
) -> str:
    """Map a query string to a workflow name by case-insensitive substring
    match against the mapping, with default fallback
    (reference: workflow_router.py:15-46). Unknown workflow strings fall back
    to ``mistral`` (reference: workflow_router.py:101-129)."""
    mapping = mapping if mapping is not None else DEFAULT_QUERY_WORKFLOW_MAPPING
    default = mapping.get("default", "mistral")
    if not query:
        return _valid_workflow(default)
    query_lower = query.lower().strip()
    for pattern, workflow in mapping.items():
        if pattern == "default":
            continue
        if pattern.lower() in query_lower:
            return _valid_workflow(workflow)
    return _valid_workflow(default)


def _valid_workflow(name: str) -> str:
    return name.lower() if name.lower() in KNOWN_WORKFLOWS else "mistral"
