"""Normalize-and-route stage: payload sniffing, routing, partitioning.

The cheap stateless projection that runs first (SURVEY.md §7.1): sniffs the
payload magic (reference: src/services/pdf_input_handler.py:88-92), assigns
the workflow route (reference: src/workflows/workflow_router.py:15-46),
computes the explicit ``partition_id = stable_hash(url) % P`` used for
lineage metrics and the resumable output layout, and classifies sizes for
skew-aware splitting.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig
from ..functions.routing import ROUTE_EMPTY, ROUTE_PDF, ROUTE_HTML, PDF_MAGIC


def stable_hash_mod(values: list[str] | np.ndarray, modulus: int) -> np.ndarray:
    """Deterministic url hash → [0, modulus); crc32-based, stable across
    processes/nodes (never Python's salted ``hash``)."""
    return np.fromiter(
        (zlib.crc32(v.encode() if isinstance(v, str) else v) % modulus for v in values),
        dtype=np.int32,
        count=len(values),
    )


def normalize_route(batch: pa.Table, config: EngineConfig | None = None) -> pa.Table:
    """Add ``route``, ``partition_id``, ``payload_bytes``, ``needs_split``.

    Vectorized: the PDF-magic check is an Arrow kernel over the first four
    payload bytes; only the url hash iterates (short strings).
    """
    config = config or EngineConfig()
    payload = batch["html"]
    sizes = pc.binary_length(payload)
    # First-4-bytes magic check, vectorized.
    prefix = pc.binary_slice(payload, 0, 4)
    is_pdf = pc.equal(prefix, pa.scalar(PDF_MAGIC, pa.binary()))
    # Kleene or: null payload must classify as empty, not propagate null.
    is_empty = pc.or_kleene(
        pc.is_null(payload), pc.equal(pc.fill_null(sizes, 0), 0)
    )
    route = pc.if_else(
        is_empty,
        pa.scalar(ROUTE_EMPTY),
        pc.if_else(
            pc.fill_null(is_pdf, False), pa.scalar(ROUTE_PDF), pa.scalar(ROUTE_HTML)
        ),
    )
    # Leading-junk PDFs (round 5): a %PDF- header within the first 1024
    # bytes re-routes to the pdf branch unless the prefix looks like
    # HTML — the Adobe implementation-note scan, mirrored by
    # sniff_payload_route. The bytes-in pre-filter keeps this a cheap
    # scan over the 1 KiB head; genuine HTML rows fail it immediately.
    vals = route.to_pylist()
    if ROUTE_HTML in vals:
        from ..functions.routing import sniff_payload_route

        heads = pc.binary_slice(payload, 0, 1024).to_pylist()
        route = pa.array(
            [
                sniff_payload_route(h)
                if (r == ROUTE_HTML and h and b"%PDF-" in h)
                else r
                for r, h in zip(vals, heads)
            ],
            pa.string(),
        )
    partition_id = stable_hash_mod(
        batch["url"].to_pylist(), config.num_partitions
    )
    needs_split = pc.greater(pc.fill_null(sizes, 0), config.split_threshold_bytes)
    return (
        batch.append_column("route", route)
        .append_column("payload_bytes", pc.cast(pc.fill_null(sizes, 0), pa.int64()))
        .append_column("partition_id", pa.array(partition_id, pa.int32()))
        .append_column("needs_split", needs_split)
    )
