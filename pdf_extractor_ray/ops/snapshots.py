"""Crawl-snapshot operators: latest-version-per-url and snapshot diffing.

A recrawl corpus holds many captures of the same url at different
``warc_ts``. Two operations dominate snapshot hygiene at 100 TB:

* ``latest_per_key`` — keep each url's newest capture WITHOUT shuffling
  payloads: only the (key, ts) pair rides the exchange (the same
  small-columns-through-the-shuffle regime as ``exact_dedup_large``,
  ops/dedup.py:70); winners come back as a broadcast (key, max_ts) set the
  full rows are semi-joined against. At winner-set sizes beyond broadcast
  reach, swap the set for the hash-partitioned semi-join (joins.py note) —
  the winning-(key,ts) table is one row per url, the strictly smaller side.

* ``snapshot_diff`` — classify urls across two snapshots as
  added / removed / changed / same. Each side is projected to
  (key, content-hash) inside ``map_batches`` (payloads never shuffle),
  tagged, unioned, and resolved per key from per-side partials.

Both shapes scale as O(distinct urls) exchange volume, never O(bytes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _key_ts(batch_keys, batch_ts) -> pa.Array:
    """Composite (key, ts) match token — ts rendered as fixed-width int."""
    return pa.array(
        [f"{k}\x00{t}" for k, t in zip(batch_keys, batch_ts)], pa.string()
    )


def latest_per_key(ds, key_col: str = "url", ts_col: str = "warc_ts"):
    """Keep each key's max-``ts_col`` row. Requires ts unique per key
    (capture timestamps are; assert cheaply via the winners count).

    Stage 1 shuffles ONLY (key, ts): per-batch partial max (combiner) →
    tiny ``groupby().max()``. Stage 2 semi-joins the full rows against the
    broadcast winner set — payload columns never leave their blocks.
    """
    import ray

    def partial_max(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": batch[key_col].to_pylist(),
                "t": batch[ts_col].cast(pa.int64()).to_numpy(),
            }
        )
        g = df.groupby("k", sort=False)["t"].max().reset_index()
        return pa.Table.from_arrays(
            [pa.array(g["k"], pa.string()), pa.array(g["t"], pa.int64())],
            names=["k", "t"],
        )

    winners = (
        ds.select_columns([key_col, ts_col])
        .map_batches(partial_max, batch_format="pyarrow")
        .groupby("k")
        .max("t")
    ).to_pandas()
    tokens = ray.put(
        pa.array(
            [f"{k}\x00{t}" for k, t in zip(winners["k"], winners["max(t)"])],
            pa.string(),
        )
    )

    def keep_winners(batch: pa.Table) -> pa.Table:
        tok = _key_ts(
            batch[key_col].to_pylist(),
            batch[ts_col].cast(pa.int64()).to_pylist(),
        )
        return batch.filter(pc.is_in(tok, value_set=ray.get(tokens)))

    return ds.map_batches(keep_winners, batch_format="pyarrow")


def _hash_side(ds, key_col: str, content_col: str, side: int):
    """Project one snapshot to (key, side, content sha1-prefix int64)."""

    def project(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        contents = batch[content_col].to_pylist()
        hashes = np.fromiter(
            (
                int.from_bytes(
                    hashlib.sha1(
                        c.encode() if isinstance(c, str) else bytes(c or b"")
                    ).digest()[:8],
                    "big",
                    signed=True,
                )
                for c in contents
            ),
            dtype=np.int64,
            count=len(contents),
        )
        return pa.Table.from_arrays(
            [
                pa.array(keys, pa.string()),
                pa.array(np.full(len(keys), side, dtype=np.int8)),
                pa.array(hashes),
            ],
            names=["k", "side", "h"],
        )

    return ds.map_batches(project, batch_format="pyarrow")


def snapshot_diff(old_ds, new_ds, key_col: str = "url", content_col: str = "text"):
    """→ Dataset of (key, status) with status ∈ added|removed|changed|same.

    Payloads reduce to 8-byte hashes inside ``map_batches``; the single
    exchange is a groupby over (key, side, hash) rows. Per-key resolution
    is vectorized over each group (one url appears at most once per side).
    """
    from ray.data.aggregate import Max, Min, Sum

    tagged = _hash_side(old_ds, key_col, content_col, 1).union(
        _hash_side(new_ds, key_col, content_col, 2)
    )
    # side codes 1|2 → sum 1 = old only, 2 = new only, 3 = both; for both,
    # same ⇔ min(h) == max(h). Zero per-group Python: one aggregate + a
    # vectorized case afterwards.
    agg = tagged.groupby("k").aggregate(Sum("side"), Min("h"), Max("h"))

    def classify(batch: pa.Table) -> pa.Table:
        s = batch["sum(side)"].to_numpy()
        same = pc.equal(batch["min(h)"], batch["max(h)"]).to_numpy(zero_copy_only=False)
        status = np.where(
            s == 1, "removed",
            np.where(s == 2, "added", np.where(same, "same", "changed")),
        )
        return pa.Table.from_arrays(
            [batch["k"], pa.array(status.tolist(), pa.string())],
            names=["url", "status"],
        )

    return agg.map_batches(classify, batch_format="pyarrow")


def _lev_bytes(a: bytes, b: bytes) -> int:
    """Byte-level Levenshtein via the two-row numpy DP (the char-level
    twin lives in functions/similarity.py:51). Byte semantics match
    DuckDB's ``levenshtein`` (which edits UTF-8 code units, e.g.
    'café'→'cafe' costs 2), so the SQL oracle replays this exactly."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    arr_b = np.frombuffer(b, dtype=np.uint8)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    curr = np.empty_like(prev)
    idx = np.arange(len(b) + 1, dtype=np.int64)
    for i, ch in enumerate(a, start=1):
        curr[0] = i
        cost = (arr_b != ch).astype(np.int64)
        np.minimum(prev[1:] + 1, prev[:-1] + cost, out=curr[1:])
        curr = np.minimum.accumulate(curr - idx) + idx
        prev, curr = curr, prev
    return int(prev[-1])


def snapshot_edit_distance(
    old_ds,
    new_ds,
    key_col: str = "url",
    content_col: str = "text",
    broadcast_cap: int = 2_000_000,
):
    """Per-key byte-level edit distance between two snapshots, computed
    ONLY for the changed minority → (key, edit_distance, bytes_old,
    bytes_new), one row per key present on both sides with differing
    content.

    Two phases, mirroring ``snapshot_diff``'s cost discipline:

    1. **Find the changed set without moving payloads** — each side
       reduces to (key, side, 8-byte hash) in ``map_batches``; one
       groupby-aggregate yields the keys with both sides present and
       hash mismatch. On a recrawl corpus this is the small minority.
    2. **Pair texts for changed keys only** — both sides' full rows
       semi-join against the changed-key table (sorted-lookup
       ``attach_lookup``; the unchanged majority's text never enters an
       exchange), then ONE (key, side) sort co-locates each pair and a
       per-segment kernel runs the two-row numpy byte DP.

    The pairwise DP is O(len_old·len_new) per changed key — cap content
    length upstream (the query truncates) when documents are unbounded.
    """
    from ray.data.aggregate import Max, Min, Sum

    from .segments import attach_lookup, sorted_segment_apply

    tagged_h = _hash_side(old_ds, key_col, content_col, 1).union(
        _hash_side(new_ds, key_col, content_col, 2)
    )
    agg = tagged_h.groupby("k").aggregate(Sum("side"), Min("h"), Max("h"))

    def changed_only(batch: pa.Table) -> pa.Table:
        s = batch["sum(side)"].to_numpy()
        diff = pc.not_equal(batch["min(h)"], batch["max(h)"]).to_numpy(
            zero_copy_only=False
        )
        keep = (s == 3) & diff
        return pa.Table.from_arrays(
            [batch["k"].filter(pa.array(keep))], names=[key_col]
        )

    # Materialize: the changed-key table is O(changed urls) small and is
    # otherwise re-executed by attach_lookup's schema probe and again by
    # the sort exchange (the same re-execution trap cdx_index hit).
    changed = agg.map_batches(changed_only, batch_format="pyarrow").materialize()

    def tag(ds, side: int):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.Table.from_arrays(
                [
                    batch[key_col].combine_chunks().cast(pa.string()),
                    pa.array(np.full(n, side, dtype=np.int8)),
                    pc.fill_null(batch[content_col], "").cast(pa.string()),
                ],
                names=[key_col, "side", content_col],
            )

        return ds.map_batches(f, batch_format="pyarrow")

    tagged = tag(old_ds, 1).union(tag(new_ds, 2))
    if changed.count() <= broadcast_cap:
        # The changed set is recrawl-delta-sized: broadcast it once and
        # semi-join with a vectorized is_in — no extra exchange. Above
        # the cap, the sorted-lookup semi-join does the same distributed.
        import ray

        ckeys = pa.concat_arrays(
            [
                c
                for b in changed.iter_batches(batch_format="pyarrow")
                for c in b.column(key_col).chunks
                if len(c)
            ]
        )
        cref = ray.put(ckeys)

        def keep_changed(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch[key_col], value_set=ray.get(cref))
            return batch.filter(mask)

        pairs = tagged.map_batches(keep_changed, batch_format="pyarrow")
    else:
        pairs = attach_lookup(
            tagged,
            changed,
            key_col=key_col,
            val_cols=[],
            carry_cols=["side", content_col],
        )
    # The per-pair DP below parallelizes across sorted blocks; spread the
    # changed minority over the cluster before the sort.
    import ray as _ray

    pairs = pairs.repartition(max(8, int(_ray.cluster_resources().get("CPU", 8))))

    out_names = [key_col, "edit_distance", "bytes_old", "bytes_new"]

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        keys, dists, b_old, b_new = [], [], [], []
        if len(starts):
            kcol = batch[key_col].to_pylist()
            texts = batch[content_col].to_pylist()
            for s, e in zip(starts, ends):
                if e - s != 2:  # defensive: changed ⇒ exactly one row/side
                    continue
                old_b = (texts[s] or "").encode()
                new_b = (texts[s + 1] or "").encode()
                keys.append(kcol[s])
                dists.append(_lev_bytes(old_b, new_b))
                b_old.append(len(old_b))
                b_new.append(len(new_b))
        return pa.Table.from_arrays(
            [
                pa.array(keys, pa.string()),
                pa.array(dists, pa.int64()),
                pa.array(b_old, pa.int64()),
                pa.array(b_new, pa.int64()),
            ],
            names=out_names,
        )

    return sorted_segment_apply(
        pairs, key_col=key_col, block_fn=kernel, within_cols=["side"]
    )


def change_rate(
    ds,
    now_us: int,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "text",
):
    """Per-url change-rate estimation over the capture history — the
    recrawl-scheduling statistic (Cho & Garcia-Molina, "Estimating
    frequency of change"): how often a page's content actually changed
    across its captures, and how stale it is now.

    Per url (captures ordered by ``ts_col``):

    * ``n_caps``     — number of captures,
    * ``n_changes``  — adjacent capture pairs with differing content,
    * ``span_us``    — last_ts - first_ts,
    * ``age_us``     — ``now_us`` - last_ts,
    * ``priority_milli`` — ``(n_changes * age_us * 1000) // span_us``
      (0 when span or changes are 0): the integer-exact staleness score
      a recrawl frontier ranks by — expected changes accumulated since
      the last capture, in thousandths.

    Shape: payloads reduce to 8-byte sha1-prefix hashes inside
    ``map_batches`` (content NEVER shuffles — the module's standing
    rule); the one exchange is the (url, ts, hash) sort feeding
    :func:`..segments.sorted_segment_apply`, whose kernel computes every
    per-url statistic vectorized across segments (adjacent-diff prefix
    sums + gathers at segment bounds). Result is O(distinct urls) rows.
    ``now_us`` is an explicit parameter — the engine bans wall-clock
    reads for byte-identity (SURVEY §7.3)."""
    from .segments import sorted_segment_apply

    def project(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        contents = batch[content_col].to_pylist()
        hashes = np.fromiter(
            (
                int.from_bytes(
                    hashlib.sha1(
                        c.encode() if isinstance(c, str) else bytes(c or b"")
                    ).digest()[:8],
                    "big",
                    signed=True,
                )
                for c in contents
            ),
            dtype=np.int64,
            count=len(contents),
        )
        ts = batch[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        return pa.Table.from_arrays(
            [pa.array(keys, pa.string()), ts.combine_chunks(), pa.array(hashes)],
            names=[key_col, "ts_us", "h"],
        )

    rows = ds.map_batches(project, batch_format="pyarrow")

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.string()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                ],
                names=[key_col, "n_caps", "n_changes", "span_us", "age_us",
                       "priority_milli"],
            )
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy()
        h = batch["h"].to_numpy()
        d = (h[1:] != h[:-1]).astype(np.int64)
        dc = np.concatenate(([0], np.cumsum(d)))
        n_caps = ends - starts
        n_changes = dc[ends - 1] - dc[starts]
        first_ts, last_ts = ts[starts], ts[ends - 1]
        span = last_ts - first_ts
        age = now_us - last_ts
        prio = np.zeros(len(starts), np.int64)
        ok = (span > 0) & (n_changes > 0)
        prio[ok] = (n_changes[ok] * age[ok] * 1000) // span[ok]
        return pa.Table.from_arrays(
            [
                pa.array(keys[starts], pa.string()),
                pa.array(n_caps, pa.int64()),
                pa.array(n_changes, pa.int64()),
                pa.array(span, pa.int64()),
                pa.array(age, pa.int64()),
                pa.array(prio, pa.int64()),
            ],
            names=[key_col, "n_caps", "n_changes", "span_us", "age_us",
                   "priority_milli"],
        )

    # Tie-break equal timestamps by content hash so the adjacent-diff count
    # is deterministic (duplicate (url, ts) captures have no defined order).
    return sorted_segment_apply(
        rows, key_col, kernel, within_cols=["ts_us", "h"]
    )


def revisit_savings(
    ds,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "text",
):
    """WARC revisit-record storage accounting: per url (captures
    ordered by timestamp), bytes actually stored when every capture
    whose payload digest equals the PREVIOUS capture's is written as a
    zero-payload ``revisit`` record — Common Crawl / IA's dedup
    convention — versus raw bytes. The savings census a crawl-storage
    planner reads.

    Shape follows :func:`change_rate`: payloads reduce in-block to
    8-byte sha1 prefixes plus byte lengths (content NEVER shuffles);
    ONE (url, ts, hash) sort feeds the sorted-segment kernel, which is
    vectorized across segments (adjacent-diff masks + ``add.reduceat``
    at segment bounds). Returns a Dataset ``(url, n_caps, total_bytes,
    stored_bytes, saved_bytes)`` — O(distinct urls) rows.
    """
    from .segments import sorted_segment_apply

    def project(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        contents = batch[content_col].to_pylist()
        raw = [
            c.encode() if isinstance(c, str) else bytes(c or b"")
            for c in contents
        ]
        hashes = np.fromiter(
            (
                int.from_bytes(hashlib.sha1(r).digest()[:8], "big",
                               signed=True)
                for r in raw
            ),
            dtype=np.int64,
            count=len(raw),
        )
        nbytes = np.fromiter((len(r) for r in raw), dtype=np.int64,
                             count=len(raw))
        ts = batch[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        return pa.Table.from_arrays(
            [pa.array(keys, pa.string()), ts.combine_chunks(),
             pa.array(hashes), pa.array(nbytes)],
            names=[key_col, "ts_us", "h", "nb"],
        )

    rows = ds.map_batches(project, batch_format="pyarrow")

    def kernel(batch: pa.Table, starts: np.ndarray,
               ends: np.ndarray) -> pa.Table:
        keys = np.asarray(batch[key_col].to_pylist(), dtype=object)
        h = batch["h"].to_numpy(zero_copy_only=False)
        nb = batch["nb"].to_numpy(zero_copy_only=False)
        if len(h) == 0 or len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string())]
                + [pa.array([], pa.int64())] * 4,
                names=[key_col, "n_caps", "total_bytes", "stored_bytes",
                       "saved_bytes"],
            )
        changed = np.empty(len(h), dtype=bool)
        changed[0] = True
        changed[1:] = h[1:] != h[:-1]
        changed[starts] = True  # first capture of each url stores
        stored = np.where(changed, nb, 0)
        # prefix-sum gathers: blocks may carry deferred fragment rows
        # past the last complete segment — reduceat would swallow them
        cs_nb = np.concatenate(([0], np.cumsum(nb)))
        cs_st = np.concatenate(([0], np.cumsum(stored)))
        tot = cs_nb[ends] - cs_nb[starts]
        st = cs_st[ends] - cs_st[starts]
        cnt = ends - starts
        return pa.Table.from_arrays(
            [pa.array(keys[starts].astype(object), pa.string()),
             pa.array(cnt.astype(np.int64)),
             pa.array(tot.astype(np.int64)),
             pa.array(st.astype(np.int64)),
             pa.array((tot - st).astype(np.int64))],
            names=[key_col, "n_caps", "total_bytes", "stored_bytes",
                   "saved_bytes"],
        )

    return sorted_segment_apply(
        rows, key_col=key_col, block_fn=kernel,
        within_cols=["ts_us", "h"],
    )
