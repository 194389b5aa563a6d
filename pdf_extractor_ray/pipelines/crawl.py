"""WARC-in → extract → WET-out: the end-to-end Common Crawl workflow.

Ties the engine's crawl formats into one streaming job: ``.warc.gz``
shards (HTTP response records) → from-scratch WARC parse → WHATWG charset
sniff/decode → route (HTML boilerplate strip / real PDF parse) → extract →
``.wet.gz`` shards (``conversion`` records carrying the extracted text) —
the same product shape Common Crawl publishes next to each crawl.

Every stage is a ``map_batches`` over the streaming Dataset: no shuffle
anywhere (the job is embarrassingly parallel end-to-end), payloads never
leave their blocks, output shards are content-addressed and idempotent.
Validation is deliberately absent: a real crawl has no reference ``text``
column to validate against (that stage belongs to the corpus-with-golden
pipelines, pipelines/extract.py).
"""

from __future__ import annotations

import functools

import pyarrow as pa

from ..config import EngineConfig
from ..functions.charset import decode_pages_batch
from ..sources.warc import read_warc, write_warc
from ..stages.extract import extract_batch
from ..stages.normalize import normalize_route


def warc_to_wet(paths: str | list[str], out_dir: str,
                config: EngineConfig | None = None,
                records_per_blob: int = 64) -> list[str]:
    """Run the crawl extraction job; returns the written ``.wet.gz`` paths."""
    config = config or EngineConfig()
    pages = read_warc(paths)
    extracted = (
        pages.map_batches(decode_pages_batch, batch_format="pyarrow")
        .map_batches(
            functools.partial(normalize_route, config=config),
            batch_format="pyarrow",
            batch_size=config.html_batch_size,
        )
        .map_batches(
            functools.partial(extract_batch, config=config),
            batch_format="pyarrow",
            batch_size=config.html_batch_size,
        )
    )

    def to_wet_rows(batch: pa.Table) -> pa.Table:
        texts = batch["extracted_text"].to_pylist()
        return pa.Table.from_arrays(
            [
                batch["url"],
                batch["warc_ts"],
                pa.array([(t or "").encode() for t in texts], pa.binary()),
            ],
            names=["url", "warc_ts", "payload"],
        )

    wet_rows = extracted.map_batches(to_wet_rows, batch_format="pyarrow")
    return write_warc(
        wet_rows, out_dir, records_per_blob=records_per_blob,
        payload_col="payload", record_type="conversion",
        content_type="text/plain", suffix=".wet.gz",
    )
