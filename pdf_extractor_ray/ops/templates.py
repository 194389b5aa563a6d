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


# ---------------------------------------------------------------------------
# pq-gram structural similarity (Augsten, Böhlen, Gamper, VLDB 2005):
# near-duplicate page TEMPLATES, not just exact skeleton matches — the
# pq-gram profile approximates tree edit distance, so a page whose nav
# gained one item still clusters with its siblings.

_VOID_TAGS = frozenset(
    b"area base br col embed hr img input link meta param source track wbr".split()
)
_TAG_TOKEN_RE = re.compile(
    rb"<!--.*?-->|<!(?:[^>]*)>|<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*?(/?)>",
    re.DOTALL,
)
_RAWTEXT_CLOSE = {
    b"script": re.compile(rb"</script[^>]*>", re.IGNORECASE),
    b"style": re.compile(rb"</style[^>]*>", re.IGNORECASE),
}


def parse_tag_tree(html: bytes | str):
    """Lenient tag-name tree from raw HTML: returns parallel arrays
    ``(labels, parents)`` with node 0 a synthetic ``#root`` so fragments
    with multiple top-level elements still form one tree. Comments,
    doctypes and attribute contents are skipped; void elements never
    push; ``<script>``/``<style>`` bodies are raw-text-skipped; stray
    close tags pop to the nearest matching open tag (HTML recovery) or
    are ignored."""
    if isinstance(html, str):
        html = html.encode("utf-8", errors="replace")
    labels: list[bytes] = [b"#root"]
    parents: list[int] = [-1]
    stack: list[int] = [0]
    pos = 0
    n = len(html)
    while pos < n:
        m = _TAG_TOKEN_RE.search(html, pos)
        if m is None:
            break
        pos = m.end()
        closing, name, selfclose = m.group(1), m.group(2), m.group(3)
        if name is None:  # comment / doctype
            continue
        name = name.lower()
        if closing:
            if name in _VOID_TAGS:
                continue
            # pop to nearest matching open tag, if any
            for depth in range(len(stack) - 1, 0, -1):
                if labels[stack[depth]] == name:
                    del stack[depth:]
                    break
            continue
        node = len(labels)
        labels.append(name)
        parents.append(stack[-1])
        if name in _RAWTEXT_CLOSE:
            mm = _RAWTEXT_CLOSE[name].search(html, pos)
            pos = mm.end() if mm else n
            continue
        if not selfclose and name not in _VOID_TAGS:
            stack.append(node)
    return labels, parents


_STAR = b"*"


def pqgram_strings(html: bytes | str, p: int = 2, q: int = 3) -> list[bytes]:
    """The page's pq-gram profile as a SORTED UNIQUE list of gram
    strings ``stem_1/…/stem_p|base_1/…/base_q`` (stems are the node plus
    its p−1 nearest ancestors, star-padded above the root; bases are
    q-windows over the node's children padded with q−1 stars each side).
    The SET variant (paper uses a bag) — what the Jaccard join needs."""
    labels, parents = parse_tag_tree(html)
    children: list[list[int]] = [[] for _ in labels]
    for node in range(1, len(labels)):
        children[parents[node]].append(node)
    grams: set[bytes] = set()
    pad = [_STAR] * (q - 1)
    # iterative DFS carrying the (p-1)-deep ancestor stem
    stack = [(0, tuple([_STAR] * (p - 1)))]
    while stack:
        node, anc = stack.pop()
        stem = b"/".join(anc + (labels[node],))
        kid_labels = pad + [labels[c] for c in children[node]] + pad
        for i in range(len(kid_labels) - q + 1):
            grams.add(stem + b"|" + b"/".join(kid_labels[i : i + q]))
        kid_anc = (anc + (labels[node],))[-(p - 1) :] if p > 1 else ()
        for c in children[node]:
            stack.append((c, kid_anc))
    return sorted(grams)


def pqgram_hashes(html: bytes | str, p: int = 2, q: int = 3) -> np.ndarray:
    """Sorted unique uint64 sha1-prefix hashes of the pq-gram profile —
    the gram kernel for the AllPairs prefix-filter join (collision odds
    ~|grams|²/2⁶⁴; the SQL oracle compares over gram STRINGS, which is
    equivalent absent collisions)."""
    strs = pqgram_strings(html, p, q)
    if not strs:
        return np.zeros(0, dtype=np.uint64)
    out = np.fromiter(
        (
            int.from_bytes(hashlib.sha1(s).digest()[:8], "big")
            for s in strs
        ),
        dtype=np.uint64,
        count=len(strs),
    )
    return np.unique(out)


def structural_dedup(
    ds,
    html_col: str = "html",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    p: int = 2,
    q: int = 3,
    **kwargs,
):
    """Near-duplicate page-template clustering: exact pq-gram-set Jaccard
    ≥ ``threshold`` via the shared AllPairs prefix-filter machinery
    (:func:`..ops.dedup.ngram_jaccard_dedup` with the pq-gram kernel).
    Returns ``(id, cluster_id, is_duplicate)`` like its text sibling;
    every exchange shape (prefix rows, bucket sort, gated verify,
    components) is inherited."""
    from .dedup import ngram_jaccard_dedup

    return ngram_jaccard_dedup(
        ds,
        text_col=html_col,
        id_col=id_col,
        threshold=threshold,
        gram_fn=lambda h: pqgram_hashes(h, p, q),
        **kwargs,
    )
