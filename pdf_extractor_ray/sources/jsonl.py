"""JSONL pages source with base64 payloads.

The reference's base64 ingest path (reference:
src/services/pdf_input_handler.py:67-106 — base64 string → bytes, magic
check, size guardrails) as a dataflow source: JSON-lines shards with
``{url, warc_ts, payload_b64, text, lang}`` decode into the engine's pages
schema inside a vectorized ``map_batches``. Oversized or undecodable
payloads are nulled + flagged, mirroring the reference's request
validation (reference: src/core/config.py:39-42 guardrails).
"""

from __future__ import annotations

import base64
import binascii

import pyarrow as pa

MAX_PAYLOAD_B64_CHARS = 40_000_000  # reference: MAX_BASE64_LENGTH, config.py:41


def decode_jsonl_batch(batch: pa.Table) -> pa.Table:
    """``payload_b64`` → ``html`` binary column (+ ``ingest_error``)."""
    payloads: list[bytes | None] = []
    errors: list[str | None] = []
    for b64 in batch["payload_b64"].to_pylist():
        if b64 is None:
            payloads.append(None)
            errors.append("missing payload")
            continue
        if len(b64) > MAX_PAYLOAD_B64_CHARS:
            payloads.append(None)
            errors.append("payload exceeds base64 size limit")
            continue
        try:
            payloads.append(base64.b64decode(b64, validate=True))
            errors.append(None)
        except (binascii.Error, ValueError) as exc:
            payloads.append(None)
            errors.append(f"invalid base64: {exc}"[:120])
    out = batch.drop_columns(["payload_b64"])
    ts = out["warc_ts"]
    if not pa.types.is_timestamp(ts.type):
        out = out.set_column(
            out.schema.get_field_index("warc_ts"),
            "warc_ts",
            pa.compute.cast(ts, pa.timestamp("us")),
        )
    return out.append_column("html", pa.array(payloads, pa.binary())).append_column(
        "ingest_error", pa.array(errors, pa.string())
    )


def read_pages_jsonl(paths: str | list[str]):
    """Read JSONL shards and decode to the pages schema."""
    import ray.data as rd

    ds = rd.read_json(paths)
    return ds.map_batches(decode_jsonl_batch, batch_format="pyarrow")
