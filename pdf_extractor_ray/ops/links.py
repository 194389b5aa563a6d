"""Host link-graph extraction from raw HTML payloads.

The link graph is a core product of any web-scale crawl pipeline
(PageRank-style quality priors, seed discovery, spam clustering). The
shape here is extraction-heavy and exchange-light: per-document href
scanning is a compiled-regex ``map_batches`` stage (HTML parsing is
inherently per-document, like the extract stage), edges pre-combine per
block via ``np.unique`` on composite keys, and the only exchange is one
``groupby(src_host, dst_host).sum`` over host-pair rows — host-pair
cardinality, never link cardinality.

Resolution rules (documented, deterministic):

- ``http://``/``https://`` hrefs → target host via
  :func:`..ops.urls.host_of` (lowercased, default ports stripped).
- scheme-relative ``//host/...`` → that host.
- every other non-skipped href (rooted or relative path) → the SOURCE
  page's host.
- ``mailto:``/``javascript:``/``tel:``/``data:`` and pure-fragment
  (``#...``) hrefs are skipped.

``domain_level="registered"`` collapses hosts to registered domains
(:func:`..ops.urls.registered_domain`) for the domain-level graph.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .urls import host_of, registered_domain

_HREF_RE = re.compile(r"""href\s*=\s*["']([^"'<>]+)["']""", re.IGNORECASE)
_SKIP = ("mailto:", "javascript:", "tel:", "data:")


def _resolve_host(href: str, src_host: str) -> str | None:
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    low = href.lower()
    if low.startswith(_SKIP):
        return None
    if low.startswith(("http://", "https://")):
        return host_of(href)
    if href.startswith("//"):
        return host_of("http:" + href)
    return src_host  # rooted or relative path: same host


def extract_edges_batch(
    batch: pa.Table,
    html_col: str = "html",
    url_col: str = "url",
    domain_level: str = "host",
) -> pa.Table:
    """Per-block ``(src_host, dst_host, cnt)`` partials (pre-combined)."""
    htmls = batch[html_col]
    urls = batch[url_col].to_pylist()
    keys: list[str] = []
    for i in range(len(batch)):
        payload = htmls[i].as_py()
        src = host_of(urls[i] or "")
        if payload is None or not src:
            continue
        text = (
            payload.decode("utf-8", errors="replace")
            if isinstance(payload, (bytes, bytearray))
            else str(payload)
        )
        for href in _HREF_RE.findall(text):
            dst = _resolve_host(href, src)
            if not dst:
                continue
            if domain_level == "registered":
                s, d = registered_domain(src), registered_domain(dst)
            else:
                s, d = src, dst
            keys.append(f"{s}\x00{d}")
    if not keys:
        return pa.Table.from_arrays(
            [
                pa.array([], pa.string()),
                pa.array([], pa.string()),
                pa.array([], pa.int64()),
            ],
            names=["src_host", "dst_host", "cnt"],
        )
    u, c = np.unique(np.array(keys, dtype=object), return_counts=True)
    pairs = [k.split("\x00", 1) for k in u]
    return pa.Table.from_arrays(
        [
            pa.array([p[0] for p in pairs], pa.string()),
            pa.array([p[1] for p in pairs], pa.string()),
            pa.array(c, pa.int64()),
        ],
        names=["src_host", "dst_host", "cnt"],
    )


def link_graph(
    ds,
    html_col: str = "html",
    url_col: str = "url",
    domain_level: str = "host",
):
    """Dataset of ``(src_host, dst_host, n_links)`` edges over the corpus."""
    import functools

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(
            functools.partial(
                extract_edges_batch,
                html_col=html_col,
                url_col=url_col,
                domain_level=domain_level,
            ),
            batch_format="pyarrow",
        )
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("cnt", alias_name="n_links"))
    )
