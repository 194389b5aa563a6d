"""URL canonicalization for web-crawl corpora.

Web pipelines key nearly everything on URLs (dedup identity, domain
caps, host-level quality priors), and raw crawl URLs are noisy: case,
default ports, tracking parameters, dot-segments, fragments.  This module
gives the engine one deterministic, documented canonical form — per-row
pure functions (compiled regexes, no I/O) applied in a vectorized
``map_batches`` stage, the same shape as ``ops/text.py::scrub_pii``.

Canonicalization rules (RFC 3986 normalization plus the usual crawl
conventions, each SQL-reproducible so the query oracle can state the
expected output in closed form):

1. scheme and host lowercased; default ports (``:80`` http, ``:443``
   https) stripped; fragment stripped.
2. leading ``www.`` stripped from the host.
3. percent-decoding of UNRESERVED characters only (``%41`` → ``A``);
   remaining percent triplets uppercased (``%2f`` → ``%2F``).
4. dot-segments resolved (``/a/./b/../c`` → ``/a/c``), duplicate
   slashes collapsed, trailing slash dropped except at the root.
5. tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``); remaining query parameters kept in original order
   (no sort — order can be semantic).

``registered_domain`` is a heuristic (last two host labels, three when
the second-to-last is a well-known second-level suffix like ``co.uk``)
— a deliberate, documented stand-in for the full Public Suffix List,
which is an external data file this sandbox doesn't ship.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "canonicalize_parts",
    "canonicalize_url",
    "registered_domain",
    "canonicalize_urls",
]

_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?:(?P<userinfo>[^@/?#]*)@)?"
    r"(?P<host>\[[^\]/?#]*\]|[^/?#:@\[\]]*)(?::(?P<port>\d*))?"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_TRACKING_RE = re.compile(r"^(utm_|fbclid$|gclid$|msclkid$)", re.IGNORECASE)
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORTS = {"http": "80", "https": "443"}
# Common second-level public suffixes (heuristic subset; see module doc).
_SECOND_LEVEL = frozenset(
    "co com net org ac gov edu or ne".split()
)
_SL_TLD = frozenset("uk jp au nz za br in kr il".split())


def _pct_normalize(s: str) -> str:
    """Decode unreserved %XX; uppercase the rest (RFC 3986 §6.2.2)."""

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _resolve_path(path: str) -> str:
    segs: list[str] = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if segs:
                segs.pop()
        else:
            segs.append(seg)
    return "/" + "/".join(segs) if segs else "/"


def canonicalize_parts(url: str) -> tuple[str, str] | None:
    """One parse → (canonical URL, bare host) or None. Userinfo is
    preserved in the canonical form but never part of the host (a
    ``user:pass@site`` URL must not dedup-key under ``user``); bracketed
    IPv6 hosts pass through lowercased with brackets intact."""
    m = _URL_RE.match((url or "").strip())
    if not m:
        return None
    scheme = m.group("scheme").lower()
    host = m.group("host").lower()
    if not host or host == "[]":
        return None
    if host.startswith("www."):
        host = host[4:]
    port = m.group("port")
    netloc = host
    if port and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    userinfo = m.group("userinfo")
    if userinfo is not None:
        netloc = f"{userinfo}@{netloc}"
    path = _resolve_path(_pct_normalize(m.group("path") or ""))
    query = m.group("query")
    canon = f"{scheme}://{netloc}{path}"
    if query:
        kept = [
            p
            for p in query.split("&")
            if p and not _TRACKING_RE.match(p.split("=", 1)[0])
        ]
        if kept:
            canon += "?" + "&".join(_pct_normalize(p) for p in kept)
    return canon, host


def canonicalize_url(url: str) -> str | None:
    """Canonical form per the module rules, or None if not an
    absolute http(s)-style URL."""
    parts = canonicalize_parts(url)
    return parts[0] if parts else None


def host_of(url: str) -> str | None:
    parts = canonicalize_parts(url)
    return parts[1] if parts else None


def registered_domain(host: str | None) -> str | None:
    """Last two labels, or three when label[-2] is a known second-level
    suffix under a ccTLD (``example.co.uk``). Heuristic — see module doc."""
    if not host:
        return None
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if labels[-2] in _SECOND_LEVEL and labels[-1] in _SL_TLD and len(labels) >= 3:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def canonicalize_urls(ds, url_col: str = "url"):
    """Vectorized stage: adds ``canon_url``, ``host``,
    ``registered_domain`` columns (null for unparseable URLs). Per-row
    pure string work — shuffle-free, trivially parallel."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        canon, hosts, doms = [], [], []
        for u in urls:
            parts = canonicalize_parts(u)  # single parse per URL
            c, h = parts if parts else (None, None)
            canon.append(c)
            hosts.append(h)
            doms.append(registered_domain(h))
        return (
            batch.append_column("canon_url", pa.array(canon, pa.string()))
            .append_column("host", pa.array(hosts, pa.string()))
            .append_column("registered_domain", pa.array(doms, pa.string()))
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SURT keys + CDX-style index (the Common Crawl url-index key order)
# ---------------------------------------------------------------------------

def surt_key(url: str) -> str | None:
    """Sort-friendly URI Reordering Transform (Heritrix/CDX subset):
    ``com,example,sub)/path?query`` — host labels reversed and
    comma-joined (www. stripped), non-default port kept, path dot-segment
    resolved + percent-normalized, tracking params stripped, everything
    lowercased. Keys sort so all captures of a host (and its subdomains)
    are contiguous — the property a crawl index shards on."""
    m = _URL_RE.match((url or "").strip())
    if not m:
        return None
    scheme = m.group("scheme").lower()
    host = m.group("host").lower()
    if not host or host == "[]":
        return None
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split(".")))
    port = m.group("port")
    if port and port != _DEFAULT_PORTS.get(scheme):
        key += ":" + port
    key += ")" + _resolve_path(_pct_normalize(m.group("path") or "")).lower()
    query = m.group("query")
    if query:
        kept = [
            p
            for p in query.split("&")
            if p and not _TRACKING_RE.match(p.split("=", 1)[0])
        ]
        if kept:
            key += "?" + "&".join(_pct_normalize(p) for p in kept).lower()
    return key


def add_surt_keys(ds, url_col: str = "url"):
    """Stage: add a ``surt`` column (null for unparseable URLs)."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        keys = [surt_key(u) for u in batch[url_col].to_pylist()]
        return batch.append_column("surt", pa.array(keys, pa.string()))

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def cdx_index(ds, url_col: str = "url", id_col: str = "doc_id",
              broadcast_cap: int = 5_000_000):
    """CDX-style index: (id, surt, global rank in (surt, id) order).

    Rank assignment: the (surt, id) composite column — tens of bytes per
    row, never the payload — is collected once, sorted, and broadcast;
    each batch ranks itself with a vectorized ``searchsorted``. The
    ``broadcast_cap`` gates the composite collection (at 5M rows ≈ 250 MB
    it stops being a broadcast); beyond it, rank via range-partitioned
    prefix counts: ``ds.sort(surt)`` + per-partition counts cumsum'd on
    the driver (P values), then per-partition local ranks + offset. Rows
    whose URL does not parse are dropped (no key, no index entry)."""
    import numpy as np

    keyed = add_surt_keys(ds, url_col).map_batches(
        lambda b: b.filter(pa.compute.is_valid(b["surt"])),
        batch_format="pyarrow",
    )

    def composite(batch: pa.Table) -> pa.Table:
        comp = [
            f"{s}\x00{i:020d}"
            for s, i in zip(batch["surt"].to_pylist(), batch[id_col].to_pylist())
        ]
        return pa.Table.from_arrays([pa.array(comp, pa.string())], names=["c"])

    comp_ds = keyed.map_batches(composite, batch_format="pyarrow").materialize()
    n = comp_ds.count()
    if n > broadcast_cap:
        raise NotImplementedError(
            f"{n} index rows exceed broadcast_cap={broadcast_cap}; use the "
            "range-partitioned prefix-count path (see docstring)"
        )
    import ray

    all_comp = np.sort(comp_ds.to_pandas()["c"].to_numpy())
    comp_ref = ray.put(all_comp)

    def rank(batch: pa.Table) -> pa.Table:
        ref = ray.get(comp_ref)
        comp = np.array(
            [
                f"{s}\x00{i:020d}"
                for s, i in zip(
                    batch["surt"].to_pylist(), batch[id_col].to_pylist()
                )
            ]
        )
        ranks = np.searchsorted(ref, comp, side="left") + 1
        return pa.Table.from_arrays(
            [batch[id_col], batch["surt"], pa.array(ranks, pa.int64())],
            names=[id_col, "surt", "cdx_rank"],
        )

    return keyed.map_batches(rank, batch_format="pyarrow")


def path_templates(ds, url_col: str = "url", k: int = 20):
    """Top-``k`` URL path templates: host + path with every digit run
    generalized to ``<d>`` (``/item/123/review/4`` → ``/item/<d>/review/<d>``)
    — the crawl-side twin of DOM template clustering (ops/templates.py):
    sites' dynamic-page families surface as one template each, which is
    what crawl schedulers dedup/deprioritize on.

    Shape: one RE2 kernel pass (scheme/query strip + digit-run replace —
    all ``pyarrow.compute``, no Python per row), per-block pre-combined
    counts, ONE template-vocabulary groupby, per-block partial top-k merged
    exactly on the driver (ties → template asc). Exchange is
    template-vocabulary-sized, never corpus-sized.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def tpl_partial(batch: pa.Table) -> pa.Table:
        u = pc.fill_null(batch[url_col], "")
        # strip scheme, then query/fragment, then generalize digit runs
        t = pc.replace_substring_regex(u, pattern=r"^[a-zA-Z][a-zA-Z0-9+.-]*://", replacement="")
        t = pc.replace_substring_regex(t, pattern=r"[?#].*$", replacement="")
        t = pc.replace_substring_regex(t, pattern=r"[0-9]+", replacement="<d>")
        arr = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
        vals = arr.to_numpy(zero_copy_only=False).astype(str)
        vals = vals[vals != ""]
        uq, c = np.unique(vals, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(uq.astype(object), pa.string()), pa.array(c, pa.int64())],
            names=["template", "cnt"],
        )

    totals = (
        ds.map_batches(tpl_partial, batch_format="pyarrow", batch_size=None)
        .groupby("template")
        .sum("cnt")
    )

    def topk_partial(batch: pa.Table) -> pa.Table:
        t = np.asarray(batch["template"].to_pylist(), dtype=object)
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -c))[:k]
        return pa.Table.from_arrays(
            [
                pa.array(t[order].astype(str), pa.string()),
                pa.array(c[order], pa.int64()),
            ],
            names=["template", "cnt"],
        )

    partials = totals.map_batches(
        topk_partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    cand = sorted({(-r["cnt"], r["template"]) for r in partials})[:k]
    return pd.DataFrame(
        {
            "template": [t for _, t in cand],
            "cnt": [-negc for negc, _ in cand],
            "rank": list(range(1, len(cand) + 1)),
        }
    ).astype({"cnt": "int64", "rank": "int32"})


# UTS #39 confusables, the high-frequency Cyrillic/Greek → Latin subset
# (spoofed-domain detection; the full table is data-driven, this is the
# documented deterministic core).
_CONFUSABLES = {
    "а": "a",  # Cyrillic а
    "е": "e",  # Cyrillic е
    "о": "o",  # Cyrillic о
    "р": "p",  # Cyrillic р
    "с": "c",  # Cyrillic с
    "х": "x",  # Cyrillic х
    "у": "y",  # Cyrillic у
    "ѕ": "s",  # Cyrillic ѕ
    "і": "i",  # Cyrillic і
    "ј": "j",  # Cyrillic ј
    "ο": "o",  # Greek ο
    "α": "a",  # Greek α
    "ν": "v",  # Greek ν
    "ɑ": "a",  # Latin ɑ
    "‐": "-",  # hyphen
    "−": "-",  # minus sign
}
_CONF_TRANS = str.maketrans(_CONFUSABLES)


def homoglyph_skeleton(values: list) -> list[str]:
    """Confusable-folded lowercase skeletons (UTS #39 §4 'skeleton'
    restricted to the table above): two strings with the same skeleton
    are visually confusable under this subset."""
    return [(v or "").lower().translate(_CONF_TRANS) for v in values]


def homoglyph_dedup(ds, col: str = "host"):
    """Group values by homoglyph skeleton and flag spoof clusters —
    skeletons carrying ≥2 DISTINCT raw spellings (the canonical
    spoofed-domain signal). One (skeleton, value) exchange over
    per-block-deduped pairs; per-segment resolution keeps the min raw
    value as the cluster representative. → ``(host, skeleton, rep,
    n_variants, is_spoofed)`` one row per distinct raw value."""
    from .segments import sorted_segment_apply

    def pairs(batch: pa.Table) -> pa.Table:
        vals = [v for v in batch[col].to_pylist()]
        sk = homoglyph_skeleton(vals)
        uniq = sorted({(s, v or "") for s, v in zip(sk, vals)})
        return pa.Table.from_arrays(
            [
                pa.array([s for s, _ in uniq], pa.string()),
                pa.array([v for _, v in uniq], pa.string()),
            ],
            names=["skeleton", col],
        )

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        names = [col, "skeleton", "rep", "n_variants", "is_spoofed"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string())] * 3
                + [pa.array([], pa.int64()), pa.array([], pa.bool_())],
                names=names,
            )
        sk = np.asarray(batch["skeleton"].to_pylist(), dtype=object)
        vals = np.asarray(batch[col].to_pylist(), dtype=object)
        # distinct raw values per segment (pairs may repeat across blocks)
        out_v, out_s, out_r, out_n = [], [], [], []
        for s, e in zip(starts, ends):
            seg_vals = sorted(set(vals[s:e]))
            for v in seg_vals:
                out_v.append(v)
                out_s.append(sk[s])
                out_r.append(seg_vals[0])
                out_n.append(len(seg_vals))
        return pa.Table.from_arrays(
            [
                pa.array(out_v, pa.string()),
                pa.array(out_s, pa.string()),
                pa.array(out_r, pa.string()),
                pa.array(np.asarray(out_n, dtype=np.int64)),
                pa.array([n > 1 for n in out_n], pa.bool_()),
            ],
            names=names,
        )

    return sorted_segment_apply(
        ds.map_batches(pairs, batch_format="pyarrow"),
        key_col="skeleton",
        block_fn=kernel,
        within_cols=[col],
    )
