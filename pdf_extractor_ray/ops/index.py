"""Distributed inverted-index construction (token → posting statistics).

The exchange is the classic search-engine shape: per-block tokenize +
per-document term-frequency dedup (so the exchange carries one row per
DISTINCT (token, doc) pair, never one per occurrence), then ONE sort on
``(token, doc_id)`` with vectorized segment aggregation via
:func:`..ops.segments.sorted_segment_apply` — document frequency is the
segment length, term-frequency totals are an ``np.add.reduceat``, and the
posting sample is a constant number of gathers. No per-token Python in
the hot path; skewed tokens (stopwords) ride the segment machinery's
straddle/mega-group handling rather than a per-group ``map_groups``.

At 10^12 documents a stopword's full posting list cannot be one row; this
op therefore materializes posting STATISTICS plus a bounded sample (the
metadata tier of a real index). Full posting storage is the sorted
``(token, doc_id)`` run itself — already produced by the same sort —
written out partitioned by token hash; ``token_doc_pairs`` exposes it.

No counterpart in the reference repo; this belongs to the engine's
corpus-analysis surface alongside word_topk/tfidf (``ops/text.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .segments import sorted_segment_apply


def token_doc_pairs(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of distinct ``(token, doc_id, tf)`` rows — the raw posting
    run. Per-block vectorized: RE2 split → flatten → lexsort run-length
    over (token, doc) pairs."""

    def emit(batch: pa.Table) -> pa.Table:
        from .text import split_words

        texts = pc.fill_null(batch[text_col], "")
        words_list = split_words(texts)
        w = words_list.flatten().to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
        d = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), reps)
        keep = w != ""
        w, d = w[keep].astype(str), d[keep]
        if len(w) == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.string()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                ],
                names=["token", id_col, "tf"],
            )
        order = np.lexsort((d, w))
        w, d = w[order], d[order]
        new = np.concatenate(([True], (w[1:] != w[:-1]) | (d[1:] != d[:-1])))
        idx = np.flatnonzero(new)
        tf = np.diff(np.append(idx, len(w)))
        return pa.Table.from_arrays(
            [
                pa.array(w[idx].astype(object), pa.string()),
                pa.array(d[idx], pa.int64()),
                pa.array(tf, pa.int64()),
            ],
            names=["token", id_col, "tf"],
        )

    return ds.map_batches(emit, batch_format="pyarrow", batch_size=None)


def inverted_index(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    sample_k: int = 5,
):
    """Build the index metadata tier: one row per token with document
    frequency, total term frequency, and the first ``sample_k`` posting
    doc ids (ascending, comma-joined — a string so the result is directly
    SQL-comparable). Tokens with ``df < min_df`` are dropped."""

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        tokens = batch["token"].to_numpy(zero_copy_only=False)[starts]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        lens = ends - starts
        # cumsum differences, not reduceat: complete segments need not tile
        # the block (straddling groups are deferred by the segment runner).
        csum = np.concatenate(([0], np.cumsum(tf)))
        total_tf = csum[ends] - csum[starts]
        # Vectorized ≤sample_k-way join: one gather per sample slot,
        # masked to segments long enough to have that slot.
        sample = np.full(len(starts), "", dtype=object)
        for j in range(sample_k):
            has = lens > j
            if not has.any():
                break
            piece = ids[starts[has] + j].astype(str).astype(object)
            sample[has] = sample[has] + ("," if j else "") + piece
        keep = lens >= min_df
        return pa.Table.from_arrays(
            [
                pa.array(tokens[keep].astype(object), pa.string()),
                pa.array(lens[keep], pa.int64()),
                pa.array(total_tf[keep], pa.int64()),
                pa.array(sample[keep], pa.string()),
            ],
            names=["token", "df", "total_tf", "sample_postings"],
        )

    return sorted_segment_apply(
        token_doc_pairs(ds, text_col, id_col),
        key_col="token",
        block_fn=kernel,
        within_cols=[id_col],
    )


def write_posting_store(
    ds,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
):
    """Materialize the full posting store: the sorted ``(token, doc_id,
    tf)`` run written as parquet PARTITIONED by a stable token-hash bucket
    (``bucket=K/`` directories). A stopword's postings span many row
    groups inside its bucket — never one giant row or file — and a lookup
    for token *t* touches exactly one bucket directory (hash-pruned), so
    the store scales to corpus-sized vocabularies and a failed write can
    resume per bucket. Returns the bucket count actually written."""
    from ..stages.normalize import stable_hash_mod

    def add_bucket(batch: pa.Table) -> pa.Table:
        toks = batch["token"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(stable_hash_mod(toks, num_buckets), pa.int32())
        )

    pairs = token_doc_pairs(ds, text_col, id_col).map_batches(
        add_bucket, batch_format="pyarrow"
    )
    # Sort by (bucket, token, doc_id): co-locates each token's postings in
    # doc-id order inside its bucket partition.
    pairs.sort(["bucket", "token", id_col]).write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return num_buckets


def lookup_postings(out_dir: str, token: str, num_buckets: int = 256):
    """Read one token's postings from a :func:`write_posting_store` output:
    hash-prune to the single bucket directory, then filter — the access
    path the partitioning exists for. Returns a pyarrow Table."""
    import pyarrow.dataset as pads

    from ..stages.normalize import stable_hash_mod

    bucket = int(stable_hash_mod([token], num_buckets)[0])
    dataset = pads.dataset(
        f"{out_dir}/bucket={bucket}", format="parquet"
    )
    return dataset.to_table(filter=pads.field("token") == token)


# ---------------------------------------------------------------------------
# Variable-byte delta compression of posting lists
# ---------------------------------------------------------------------------
#
# The classic index-compression step (Scholer, Williams, Yiannis & Zobel
# 2002, "Compression of inverted indexes for fast query evaluation",
# SIGIR — public paper; also Manning/Raghavan/Schütze IIR §5.3): each
# token's ascending doc-id posting list becomes first-order deltas
# ("gaps", first gap = doc_id + 1 so every gap is ≥ 1 for non-negative
# ids), each gap encoded as little-endian 7-bit groups with the
# continuation bit (0x80) set on every byte except the terminal one.
#
# Scale shape: identical to :func:`inverted_index` — one (token, doc_id)
# sort over DISTINCT pairs, then a segment-local fully vectorized encode
# (digit matrix + masked flatten; the per-token binary values are built
# zero-copy from an offsets buffer, no per-group Python). Output is
# vocabulary-sized. No counterpart in the reference repo.

_VB_GROUPS = 10  # 10 × 7 bits covers any non-negative int64 gap
_VB_SHIFTS = np.arange(0, 7 * _VB_GROUPS, 7, dtype=np.int64)


def _vb_digit_matrix(gaps: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, 10) little-endian 7-bit digit matrix and per-gap byte count
    for strictly positive int64 gaps."""
    digits = (gaps[:, None] >> _VB_SHIFTS[None, :]) & 0x7F
    nbytes = _VB_GROUPS - (digits[:, ::-1] != 0).argmax(axis=1)
    return digits, nbytes


def varbyte_encode(ids: np.ndarray) -> bytes:
    """Encode one ascending posting list of non-negative int64 doc ids."""
    ids = np.asarray(ids, dtype=np.int64)
    if len(ids) == 0:
        return b""
    if ids[0] < 0 or (len(ids) > 1 and (np.diff(ids) <= 0).any()):
        raise ValueError("posting list must be strictly ascending and >= 0")
    gaps = ids.copy()
    gaps[1:] = ids[1:] - ids[:-1]
    gaps[0] = ids[0] + 1
    digits, nbytes = _vb_digit_matrix(gaps)
    vals = digits + 0x80
    vals[np.arange(len(gaps)), nbytes - 1] -= 0x80
    mask = np.arange(_VB_GROUPS)[None, :] < nbytes[:, None]
    return vals[mask].astype(np.uint8).tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Decode one :func:`varbyte_encode` buffer back to the doc-id array."""
    arr = np.frombuffer(buf, np.uint8).astype(np.int64)
    if len(arr) == 0:
        return np.array([], dtype=np.int64)
    term = arr < 0x80
    if not term[-1]:
        raise ValueError("truncated varbyte stream")
    starts = np.flatnonzero(np.concatenate(([True], term[:-1])))
    group = np.cumsum(np.concatenate(([False], term[:-1])))
    pos = np.arange(len(arr)) - starts[group]
    contrib = (arr & 0x7F) << (7 * pos)
    gaps = np.add.reduceat(contrib, starts)
    return np.cumsum(gaps) - 1


def compress_postings(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
):
    """Per-token varbyte-compressed posting lists: one row per token with
    ``df`` ≥ ``min_df`` carrying the encoded bytes plus integer-exact
    compression statistics (``n_bytes``, ``byte_sum`` — the sum of every
    encoded byte value, which pins the exact byte stream for the SQL
    oracle — and ``first_id``/``last_id``). Doc ids must be non-negative
    integers (gap coding is undefined otherwise)."""

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        tokens = batch["token"].to_numpy(zero_copy_only=False)[starts]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) and not np.issubdtype(ids.dtype, np.integer):
            raise TypeError("compress_postings requires integer doc ids")
        ids = ids.astype(np.int64, copy=False)
        gaps = ids.copy()
        gaps[1:] = ids[1:] - ids[:-1]
        gaps[starts] = ids[starts] + 1  # first gap of every segment
        digits, nbytes = _vb_digit_matrix(gaps)
        elem_sum = digits.sum(axis=1) + 0x80 * (nbytes - 1)

        csum_nb = np.concatenate(([0], np.cumsum(nbytes)))
        csum_bs = np.concatenate(([0], np.cumsum(elem_sum)))
        seg_nbytes = csum_nb[ends] - csum_nb[starts]
        seg_bytesum = csum_bs[ends] - csum_bs[starts]
        lens = ends - starts

        # Flat byte stream for the whole block, then one multi-range
        # gather re-packs the (possibly non-tiling) segments contiguously
        # so the binary column builds zero-copy from an offsets buffer.
        vals = digits + 0x80
        vals[np.arange(len(gaps)), nbytes - 1] -= 0x80
        mask = np.arange(_VB_GROUPS)[None, :] < nbytes[:, None]
        flat = vals[mask].astype(np.uint8)
        elem_off = csum_nb  # byte offset of each element in `flat`
        out_total = int(seg_nbytes.sum())
        excl = np.concatenate(([0], np.cumsum(seg_nbytes)[:-1]))
        gather = (
            np.arange(out_total, dtype=np.int64)
            + np.repeat(elem_off[starts] - excl, seg_nbytes)
        )
        data = flat[gather]
        offsets = np.concatenate(([0], np.cumsum(seg_nbytes))).astype(np.int32)
        encoded = pa.Array.from_buffers(
            pa.binary(),
            len(starts),
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
        )

        keep = lens >= min_df
        tbl = pa.Table.from_arrays(
            [
                pa.array(tokens.astype(object), pa.string()),
                pa.array(lens, pa.int64()),
                pa.array(seg_nbytes, pa.int64()),
                pa.array(seg_bytesum, pa.int64()),
                pa.array(ids[starts], pa.int64()),
                pa.array(ids[ends - 1], pa.int64()),
                encoded,
            ],
            names=[
                "token",
                "df",
                "n_bytes",
                "byte_sum",
                "first_id",
                "last_id",
                "encoded",
            ],
        )
        return tbl.filter(pa.array(keep))

    return sorted_segment_apply(
        token_doc_pairs(ds, text_col, id_col),
        key_col="token",
        block_fn=kernel,
        within_cols=[id_col],
    )


def merge_posting_store(
    store_dir: str,
    new_ds,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
):
    """Incremental index maintenance: fold a NEW batch of documents into
    an existing :func:`write_posting_store` output, producing a merged
    store at ``out_dir`` — the daily-crawl indexing loop (build once,
    merge deltas) instead of a full rebuild.

    Shape: the old store reads back bucket-partitioned (one read task per
    bucket directory, already sorted); the new documents reduce to
    (token, doc_id, tf) pairs with the SAME stable bucket hash; a union +
    one (bucket, token, id) sort restores the store invariant. Same-key
    rows from both sides merge by SUMMING tf (a re-crawled doc's counts
    accumulate; exact re-ingests are the caller's dedup concern). The
    exchange carries only posting rows — O(old postings + delta
    postings), which at daily-delta scale is dominated by the EXISTING
    store; a compaction that only rewrites touched buckets is the
    documented next step (filter old-store read to the delta's bucket
    set — same code path, pruned read).

    Returns the bucket count written."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.normalize import stable_hash_mod

    def add_bucket(batch: pa.Table) -> pa.Table:
        toks = batch["token"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(stable_hash_mod(toks, num_buckets), pa.int32())
        )

    old = rd.read_parquet(store_dir).map_batches(
        lambda t: t.select(["token", id_col, "tf"]), batch_format="pyarrow"
    )
    new = token_doc_pairs(new_ds, text_col, id_col)
    merged = (
        old.union(new)
        .groupby(["token", id_col])
        .aggregate(Sum("tf", alias_name="tf"))
        .map_batches(add_bucket, batch_format="pyarrow")
    )
    merged.sort(["bucket", "token", id_col]).write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return num_buckets


def _vblen(x: np.ndarray) -> np.ndarray:
    """Byte length of the 7-bit varint encoding of each value (≥0)."""
    x = np.asarray(x, dtype=np.int64)
    return np.where(x < 128, 1, np.where(x < 16384, 2, 3)).astype(np.int64)


def _pair_lcp(flat: np.ndarray, offs: np.ndarray, prev_idx: np.ndarray,
              cur_idx: np.ndarray) -> np.ndarray:
    """Vectorized longest-common-prefix length (in bytes) for each
    (prev_idx[i], cur_idx[i]) string pair over a flat uint8 buffer with
    element offsets ``offs`` (len n+1). One flat gather + elementwise
    compare + ``minimum.reduceat`` first-mismatch — no per-pair Python."""
    if len(prev_idx) == 0:
        return np.zeros(0, dtype=np.int64)
    lens = offs[1:] - offs[:-1]
    L = np.minimum(lens[prev_idx], lens[cur_idx])  # compare window per pair
    total = int(L.sum())
    if total == 0:
        return np.zeros(len(prev_idx), dtype=np.int64)
    seg_starts = np.concatenate(([0], np.cumsum(L)[:-1]))
    j = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, L)
    a = flat[np.repeat(offs[prev_idx], L) + j]
    b = flat[np.repeat(offs[cur_idx], L) + j]
    mism = a != b
    # first mismatch position per segment (or L if none)
    pos = np.where(mism, j, np.int64(1 << 60))
    first = np.minimum.reduceat(pos, seg_starts)
    first = np.where(L == 0, 0, first)
    return np.minimum(first, L.astype(np.int64))


def front_code_urls(
    ds,
    url_col: str = "url",
    restart: int = 16,
):
    """Front coding of the globally sorted URL list — the classic
    compressed representation of a crawl frontier / URL dictionary
    (restart points every ``restart`` entries store the full string;
    every other entry stores varint(lcp with the previous entry) +
    varint(suffix length) + the suffix bytes).

    Exchange shape: one global sort of the (deduplicated) URL column →
    one blocks-sized partial pass collecting each sorted block's
    ``(first_url, count, last_url)`` → driver computes global offsets
    AND the previous-block-last-url map (both blocks-sized) → one
    encode pass per block, fully vectorized (flat-buffer gather LCP,
    ``minimum.reduceat`` first-mismatch, varint length arithmetic); the
    URL bytes never leave their block.

    Returns a Dataset with one row per sorted block: ``(first_url, n,
    raw_bytes, enc_bytes, prefix_sum)`` — integer stats that pin the
    encoding for the SQL oracle (lengths are UTF-8 bytes; equal to
    chars on ASCII URL corpora, which the oracle uses).
    """
    from ray.data.aggregate import Count

    deduped = (
        ds.select_columns([url_col])
        .groupby(url_col)
        .aggregate(Count(alias_name="_c"))
        .select_columns([url_col])
    )
    sorted_urls = deduped.sort(url_col).materialize()

    def probe(batch: pa.Table) -> pa.Table:
        names = ["first_url", "cnt", "last_url"]
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64()),
                 pa.array([], pa.string())],
                names=names,
            )
        return pa.Table.from_arrays(
            [
                pa.array([batch[url_col][0].as_py()], pa.string()),
                pa.array([batch.num_rows], pa.int64()),
                pa.array([batch[url_col][-1].as_py()], pa.string()),
            ],
            names=names,
        )

    parts = sorted_urls.map_batches(
        probe, batch_format="pyarrow", batch_size=None
    ).take_all()
    parts.sort(key=lambda r: r["first_url"])
    offsets: dict[str, int] = {}
    prev_last: dict[str, str | None] = {}
    running = 0
    last: str | None = None
    for r in parts:
        offsets[r["first_url"]] = running
        prev_last[r["first_url"]] = last
        running += r["cnt"]
        last = r["last_url"]
    import ray

    meta_ref = ray.put((offsets, prev_last, restart))

    def encode(batch: pa.Table) -> pa.Table:
        names = ["first_url", "n", "raw_bytes", "enc_bytes", "prefix_sum"]
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string())] + [pa.array([], pa.int64())] * 4,
                names=names,
            )
        offs_map, prevs, K = ray.get(meta_ref)
        first = batch[url_col][0].as_py()
        base = offs_map[first]
        prev_str = prevs[first]
        col = batch[url_col].combine_chunks().cast(pa.binary())
        if prev_str is not None:
            col = pa.concat_arrays(
                [pa.array([prev_str.encode()], pa.binary()), col]
            )
            shift = 1
        else:
            shift = 0
        buf = col.buffers()
        offs = np.frombuffer(buf[1], np.int32)[
            col.offset : col.offset + len(col) + 1
        ].astype(np.int64)
        flat = np.frombuffer(buf[2], np.uint8)
        n = batch.num_rows
        gidx = base + np.arange(n, dtype=np.int64)  # global sorted index
        is_restart = gidx % K == 0
        cur = np.arange(n, dtype=np.int64) + shift
        prev = cur - 1
        need = ~is_restart & (prev >= 0)
        lcp = np.zeros(n, dtype=np.int64)
        lcp[need] = _pair_lcp(flat, offs, prev[need], cur[need])
        lens = (offs[1:] - offs[:-1])[shift:]
        # a row whose predecessor lives in an earlier block and has no
        # broadcast entry can only be the global first row (prev None)
        lcp[~need] = 0
        suffix = lens - lcp
        enc = np.where(
            is_restart,
            _vblen(lens) + lens,
            _vblen(lcp) + _vblen(suffix) + suffix,
        )
        return pa.Table.from_arrays(
            [
                pa.array([first], pa.string()),
                pa.array([n], pa.int64()),
                pa.array([int(lens.sum())], pa.int64()),
                pa.array([int(enc.sum())], pa.int64()),
                pa.array([int(lcp.sum())], pa.int64()),
            ],
            names=names,
        )

    return sorted_urls.map_batches(encode, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Elias-Fano posting-list encoding.
# ---------------------------------------------------------------------------
#
# The quasi-succinct index representation (Vigna, WSDM 2013; Elias 1974):
# n strictly ascending ids below a universe u = last + 1 split at
# ``l = floor(log2(u / n))`` into an ``n*l``-bit LOW stream (each id's low
# ``l`` bits, LSB-first) and a HIGH stream of unary-coded bucket gaps —
# bit ``(id >> l) + i`` set for the i-th id — totalling
# ``n*l + (last >> l) + n`` bits ≈ within 0.5 bit/element of the
# information-theoretic minimum, while supporting O(1) access/skip (the
# reason EF, not varbyte, is the modern inverted-index layout).
#
# Scale shape: identical to :func:`compress_postings` — the one
# (token, doc_id) sort, then a segment-local fully vectorized encode:
# per-element bit positions are computed arithmetically and both bit
# streams are built with two ``np.bitwise_or.at`` scatters (the low
# stream loops over BIT INDEX, ≤ 64 vectorized passes, never over
# elements or groups). Output is vocabulary-sized.

_U64_ONE = np.uint64(1)


def _bit_length_i64(q: np.ndarray) -> np.ndarray:
    """Vectorized ``int.bit_length`` for int64 ``q >= 1`` (float log2
    candidate, then exact integer correction of the ±1 ulp edge)."""
    q = np.asarray(q, dtype=np.int64)
    bl = np.floor(np.log2(q.astype(np.float64))).astype(np.int64) + 1
    qu = q.astype(np.uint64)
    # candidate too high: 2^(bl-1) > q
    bl -= (_U64_ONE << np.minimum(bl - 1, 63).astype(np.uint64)) > qu
    # candidate too low: 2^bl <= q  (bl < 63 guards the shift)
    bl += ((bl < 63) & ((_U64_ONE << np.minimum(bl, 63).astype(np.uint64)) <= qu))
    return bl


def _ef_low_width(n: np.ndarray, last: np.ndarray) -> np.ndarray:
    """l = floor(log2(u/n)) with u = last+1, via bit_length(u // n) - 1
    (equal because no power of two lies in (floor(u/n), u/n])."""
    return _bit_length_i64((last + 1) // n) - 1


def ef_encode(ids: np.ndarray) -> tuple[bytes, bytes, int]:
    """Encode one strictly ascending list of non-negative int64 ids →
    ``(low_bytes, high_bytes, l)`` with the universe fixed at
    ``ids[-1] + 1`` (stored alongside as ``df``/``last_id`` columns)."""
    ids = np.asarray(ids, dtype=np.int64)
    if len(ids) == 0:
        return b"", b"", 0
    if ids[0] < 0 or (len(ids) > 1 and (np.diff(ids) <= 0).any()):
        raise ValueError("posting list must be strictly ascending and >= 0")
    n = len(ids)
    l = int(_ef_low_width(np.array([n]), ids[-1:])[0])
    lu = np.uint64(l)
    v = ids.astype(np.uint64)
    low = np.zeros((n * l + 7) // 8, dtype=np.uint8)
    pos0 = np.arange(n, dtype=np.int64) * l
    for b in range(l):
        p = pos0 + b
        bits = ((v >> np.uint64(b)) & _U64_ONE).astype(np.uint8)
        np.bitwise_or.at(low, p >> 3, bits << (p & 7).astype(np.uint8))
    hp = (v >> lu).astype(np.int64) + np.arange(n, dtype=np.int64)
    high = np.zeros((int(hp[-1]) + 1 + 7) // 8, dtype=np.uint8)
    np.bitwise_or.at(high, hp >> 3, np.uint8(1) << (hp & 7).astype(np.uint8))
    return low.tobytes(), high.tobytes(), l


def ef_decode(low: bytes, high: bytes, n: int, l: int) -> np.ndarray:
    """Exact inverse of :func:`ef_encode` given the stored ``n`` and
    ``l`` (numpy ``unpackbits``; per-list, verification/unit-test path)."""
    if n == 0:
        return np.array([], dtype=np.int64)
    hi_bits = np.unpackbits(np.frombuffer(high, np.uint8), bitorder="little")
    highs = np.flatnonzero(hi_bits)[:n] - np.arange(n, dtype=np.int64)
    lows = np.zeros(n, dtype=np.int64)
    if l:
        lo_bits = np.unpackbits(np.frombuffer(low, np.uint8), bitorder="little")
        pos0 = np.arange(n, dtype=np.int64) * l
        for b in range(l):
            lows |= lo_bits[pos0 + b].astype(np.int64) << b
    return (highs << l) | lows


def ef_postings(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
):
    """Per-token Elias-Fano-encoded posting lists: one row per token with
    ``df`` ≥ ``min_df`` carrying both encoded bit streams plus the
    parameters a reader needs (``low_width`` = l, ``df``, and the exact
    ``encoded_bits = df*l + (last_id >> l) + df``) and ``first_id`` /
    ``last_id``. Doc ids must be non-negative integers."""

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        tokens = batch["token"].to_numpy(zero_copy_only=False)[starts]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) and not np.issubdtype(ids.dtype, np.integer):
            raise TypeError("ef_postings requires integer doc ids")
        ids = ids.astype(np.int64, copy=False)
        if len(ids) and ids.min() < 0:
            raise ValueError("ef_postings requires non-negative doc ids")
        nseg = len(starts)
        n_seg = (ends - starts).astype(np.int64)
        last = ids[ends - 1]
        l_seg = _ef_low_width(n_seg, last)

        low_bytes = (n_seg * l_seg + 7) >> 3
        hi_bits = (last >> l_seg) + n_seg  # last set position + 1
        hi_bytes = (hi_bits + 7) >> 3
        lb_off = np.concatenate(([0], np.cumsum(low_bytes)))
        hb_off = np.concatenate(([0], np.cumsum(hi_bytes)))

        # element gather over the (possibly non-tiling) complete segments
        tot = int(n_seg.sum())
        excl = np.cumsum(n_seg) - n_seg
        pos_in_seg = np.arange(tot, dtype=np.int64) - np.repeat(excl, n_seg)
        v = ids[pos_in_seg + np.repeat(starts, n_seg)].astype(np.uint64)
        g = np.repeat(np.arange(nseg, dtype=np.int64), n_seg)
        l_e = l_seg[g].astype(np.uint64)

        low_buf = np.zeros(int(lb_off[-1]), dtype=np.uint8)
        low_v = v & ((_U64_ONE << l_e) - _U64_ONE)
        bit0 = lb_off[g] * 8 + pos_in_seg * l_seg[g]
        max_l = int(l_seg.max()) if nseg else 0
        for b in range(max_l):
            sel = l_seg[g] > b
            p = bit0[sel] + b
            bits = ((low_v[sel] >> np.uint64(b)) & _U64_ONE).astype(np.uint8)
            np.bitwise_or.at(low_buf, p >> 3, bits << (p & 7).astype(np.uint8))

        hi_buf = np.zeros(int(hb_off[-1]), dtype=np.uint8)
        p = hb_off[g] * 8 + (v >> l_e).astype(np.int64) + pos_in_seg
        np.bitwise_or.at(hi_buf, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8))

        def as_binary(buf: np.ndarray, offs: np.ndarray) -> pa.Array:
            return pa.Array.from_buffers(
                pa.binary(),
                nseg,
                [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
                 pa.py_buffer(buf.tobytes())],
            )

        keep = n_seg >= min_df
        tbl = pa.Table.from_arrays(
            [
                pa.array(tokens.astype(object), pa.string()),
                pa.array(n_seg, pa.int64()),
                pa.array(l_seg, pa.int64()),
                pa.array(n_seg * l_seg + hi_bits, pa.int64()),
                pa.array(ids[starts], pa.int64()),
                pa.array(last, pa.int64()),
                as_binary(low_buf, lb_off),
                as_binary(hi_buf, hb_off),
            ],
            names=[
                "token", "df", "low_width", "encoded_bits",
                "first_id", "last_id", "low", "high",
            ],
        )
        return tbl.filter(pa.array(keep))

    return sorted_segment_apply(
        token_doc_pairs(ds, text_col, id_col),
        key_col="token",
        block_fn=kernel,
        within_cols=[id_col],
    )
