"""Content-defined chunking (gear CDC) and chunk-level dedup stats.

Storage-layer deduplication for a 100 TB crawl archive: fixed-size
chunking misses every duplicate that is shifted by an insertion, so
dedup stores cut on CONTENT-defined boundaries instead — a rolling
*gear* hash over a fixed window, with a chunk boundary wherever the
window hash's low bits are all zero (Xia et al., FastCDC / Ddelta; the
gear construction ``H_i = Σ_j gear(c_{i-j}) · 2^j`` is their Gear hash).
Boundaries depend only on the local window, so two documents sharing a
long run of text produce byte-identical interior chunks regardless of
where the run starts — exactly what fixed-size chunking cannot do.

Determinism/oracle story: ``gear(c) = splitmix64(c)`` — the engine's
standard SQL-replicable mixer — and the window hash at position ``i``
is a plain mod-2^64 sum of shifted gear values over the last ``window``
codepoints: position-local, so DuckDB reproduces every cut with a
16-row window self-join. (FastCDC's min/max-size normalization makes
the NEXT cut depend on the previous one — inherently sequential — and
is deliberately omitted; this is the basic position-local gear CDC.)
Chunk identity is ``(length, polynomial fingerprint)``: the fold
``h ← h·P + cp`` (P = 1099511628211, the FNV prime), computed here in
O(doc) via prefix sums and modular inverses, and in SQL by a
``list_reduce`` over the chunk's characters.

Distribution: chunking is a stateless shuffle-free ``map_batches`` pass
(one row per chunk, text never leaves the pass — only 24-byte chunk
records); the dedup statistics are ONE groupby over ``(length, hash)``
records with per-block pre-combined partials. No counterpart in the
reference repo; this extends the dedup tier below the document level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import splitmix64_np

_P = np.uint64(1099511628211)
_PINV = np.uint64(pow(1099511628211, -1, 2**64))


def _chunk_doc(cp: np.ndarray, window: int, mask: np.uint64):
    """Cut positions and per-chunk (start, length, fingerprint) for one
    document's codepoint array. Vectorized: the gear window sum is
    ``window`` shifted adds; fingerprints come from one prefix-sum pass
    (slice fold = (cs[e] − cs[s]) · P^{−(n−e)} mod 2^64)."""
    n = len(cp)
    with np.errstate(over="ignore"):
        g = splitmix64_np(cp)
        H = np.zeros(n, np.uint64)
        for j in range(min(window, n)):
            H[j:] += g[: n - j] << np.uint64(j)
        # cuts AFTER position i: full window present, never at doc end
        lo = window - 1
        cuts = (
            np.flatnonzero((H[lo : n - 1] & mask) == 0) + lo if n > lo + 1 else
            np.empty(0, np.int64)
        )
        starts = np.concatenate(([0], cuts + 1)).astype(np.int64)
        ends = np.concatenate((cuts + 1, [n])).astype(np.int64)
        # prefix polynomial: w[k] = cp[k] * P^(n-1-k); fold of [s, e) =
        # (cs[e] - cs[s]) * PINV^(n-e)
        pows = np.ones(n + 1, np.uint64)
        np.multiply.accumulate(np.full(n, _P, np.uint64), out=pows[1:])
        w = cp.astype(np.uint64) * pows[n - 1 :: -1]
        cs = np.zeros(n + 1, np.uint64)
        np.cumsum(w, out=cs[1:])
        ipows = np.ones(n + 1, np.uint64)
        np.multiply.accumulate(np.full(n, _PINV, np.uint64), out=ipows[1:])
        fp = (cs[ends] - cs[starts]) * ipows[n - ends]
    return starts, ends - starts, fp


def cdc_chunks(
    ds,
    window: int = 16,
    mask_bits: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """One row per content-defined chunk: ``(doc_id, start, length,
    chunk_hash)`` with ``chunk_hash`` the signed-int64 reinterpretation
    of the polynomial fingerprint (chunk identity is the PAIR
    ``(length, chunk_hash)`` — the fold alone does not encode leading
    zeros). Average chunk length ≈ ``2^mask_bits``; documents shorter
    than ``window`` are a single chunk. Shuffle-free."""
    mask = np.uint64((1 << mask_bits) - 1)

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        od, os_, ol, oh = [], [], [], []
        for d, t in zip(ids, texts):
            if not t:
                continue
            cp = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(
                np.uint64
            )
            starts, lens, fp = _chunk_doc(cp, window, mask)
            od.append(np.full(len(starts), d, np.int64))
            os_.append(starts)
            ol.append(lens)
            oh.append(fp.astype(np.int64))
        if not od:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()) for _ in range(4)],
                names=[id_col, "start", "length", "chunk_hash"],
            )
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(od)),
                pa.array(np.concatenate(os_)),
                pa.array(np.concatenate(ol)),
                pa.array(np.concatenate(oh)),
            ],
            names=[id_col, "start", "length", "chunk_hash"],
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow"
    )


def cdc_dedup_stats(
    ds,
    window: int = 16,
    mask_bits: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Corpus chunk-store dedup summary: ``(total_chunks,
    distinct_chunks, total_chars, distinct_chars)`` — what a
    content-addressed store would hold versus what the corpus ships.
    Per-block pre-combined ``(length, hash, n, 1)`` partials feed ONE
    groupby; the final reduce is another pre-combined pass over the
    distinct-chunk table (never collected raw)."""
    from ray.data.aggregate import Sum

    chunks = cdc_chunks(ds, window, mask_bits, text_col, id_col)

    def precombine(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "length": batch["length"].to_numpy(),
                "chunk_hash": batch["chunk_hash"].to_numpy(),
            }
        )
        g = (
            df.groupby(["length", "chunk_hash"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    per_chunk = (
        chunks.map_batches(precombine, batch_format="pyarrow")
        .groupby(["length", "chunk_hash"])
        .aggregate(Sum("n", alias_name="copies"))
    )

    def reduce_partial(batch: pa.Table) -> pa.Table:
        ln = batch["length"].to_numpy(zero_copy_only=False)
        cp = batch["copies"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array([int(cp.sum())], pa.int64()),
                pa.array([len(ln)], pa.int64()),
                pa.array([int((ln * cp).sum())], pa.int64()),
                pa.array([int(ln.sum())], pa.int64()),
            ],
            names=[
                "total_chunks",
                "distinct_chunks",
                "total_chars",
                "distinct_chars",
            ],
        )

    agg = per_chunk.map_batches(
        reduce_partial, batch_format="pyarrow", batch_size=None
    ).sum(
        ["total_chunks", "distinct_chunks", "total_chars", "distinct_chars"]
    )
    return pa.Table.from_arrays(
        [
            pa.array([int(agg["sum(total_chunks)"])], pa.int64()),
            pa.array([int(agg["sum(distinct_chunks)"])], pa.int64()),
            pa.array([int(agg["sum(total_chars)"])], pa.int64()),
            pa.array([int(agg["sum(distinct_chars)"])], pa.int64()),
        ],
        names=["total_chunks", "distinct_chunks", "total_chars", "distinct_chars"],
    )
