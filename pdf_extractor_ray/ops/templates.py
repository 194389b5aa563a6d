"""Template detection: cluster pages by DOM-structure fingerprint.

Boilerplate removal and spam triage both want "which pages share a page
template" — content varies, markup skeleton repeats. The fingerprint here
is the sequence of opening tag names (content-free by construction),
hashed to int64; clustering is a ``groupby(fingerprint)`` over (id, fp)
pairs — payloads never shuffle — and the (representative, size) stats
attach back through the same sorted-lookup exchange the engine uses for
semi-joins (:func:`..ops.segments.attach_lookup`), so no driver state at
any corpus size.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_TAG_OPEN_RE = re.compile(rb"<([a-zA-Z][a-zA-Z0-9]*)")


def template_fingerprint(html: bytes | str) -> int:
    """Opening-tag-name sequence → signed int64 sha1 prefix."""
    if isinstance(html, str):
        html = html.encode("utf-8", errors="replace")
    tags = b" ".join(m.lower() for m in _TAG_OPEN_RE.findall(html))
    return int.from_bytes(hashlib.sha1(tags).digest()[:8], "big", signed=True)


def template_clusters(ds, html_col: str = "html", id_col: str = "doc_id"):
    """→ Dataset of ``(id, cluster_rep, cluster_size)``: pages grouped by
    markup skeleton; the representative is the cluster's min id."""
    from ray.data.aggregate import Count, Min

    from .segments import attach_lookup

    def fp_batch(batch: pa.Table) -> pa.Table:
        fps = np.fromiter(
            (
                template_fingerprint(h) if h is not None else 0
                for h in batch[html_col].to_pylist()
            ),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(fps)], names=[id_col, "fp"]
        )

    fps = ds.map_batches(fp_batch, batch_format="pyarrow")
    stats = fps.groupby("fp").aggregate(
        Min(id_col, alias_name="cluster_rep"), Count(alias_name="cluster_size")
    )
    return attach_lookup(
        fps,
        stats,
        key_col="fp",
        val_cols=["cluster_rep", "cluster_size"],
        carry_cols=[id_col],
    ).select_columns([id_col, "cluster_rep", "cluster_size"])
