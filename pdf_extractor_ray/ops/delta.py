"""Delta encoding between snapshot captures (recrawl storage compression).

A recrawl stores each url's new capture; most bytes repeat the previous
capture, so the storage-efficient unit is a DELTA: a sequence of
``COPY(offset, length)`` ops against the old bytes plus literal runs —
the rsync/xdelta family's greedy block-match core, from scratch:

* ``diff_bytes(old, new, block)`` — index ``old`` by non-overlapping
  ``block``-byte chunks (hash → first offset, deterministic), walk
  ``new``; on a chunk match extend it maximally in both byte directions
  available, emit COPY, else grow a literal run. Output is a canonical
  op list: deterministic for given inputs.
* ``apply_delta(old, ops)`` — exact reconstruction.

The Dataset operator pairs ONLY the changed minority (the hash-gated
pairing discipline of ``ops/snapshots.py::snapshot_edit_distance``), so
payload movement is recrawl-delta-sized. Verification is END TO END:
the query emits the RECONSTRUCTED text and the oracle byte-compares it
against the independently-computed new capture — the encode/decode
chain self-certifies nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def diff_bytes(old: bytes, new: bytes, block: int = 16) -> list:
    """→ list of ops: ``("c", offset, length)`` copies from ``old``,
    ``("l", bytes)`` literal runs."""
    if block <= 0:
        raise ValueError("diff_bytes: block must be positive")
    index: dict[bytes, int] = {}
    for off in range(0, len(old) - block + 1, block):
        index.setdefault(old[off : off + block], off)
    ops: list = []
    lit_start = 0
    i = 0
    n = len(new)
    while i + block <= n:
        off = index.get(new[i : i + block])
        if off is None:
            i += 1
            continue
        # extend the match forward past the block
        m = block
        while off + m < len(old) and i + m < n and old[off + m] == new[i + m]:
            m += 1
        # extend backward into the pending literal run
        back = 0
        while (
            off - back > 0
            and i - back > lit_start
            and old[off - back - 1] == new[i - back - 1]
        ):
            back += 1
        if i - back > lit_start:
            ops.append(("l", new[lit_start : i - back]))
        ops.append(("c", off - back, m + back))
        i += m
        lit_start = i
    if lit_start < n:
        ops.append(("l", new[lit_start:]))
    return ops


def apply_delta(old: bytes, ops: list) -> bytes:
    out = []
    for op in ops:
        if op[0] == "c":
            _, off, ln = op
            out.append(old[off : off + ln])
        else:
            out.append(op[1])
    return b"".join(out)


def delta_size(ops: list) -> int:
    """Encoded size under a simple frame: 9 bytes per COPY (tag +
    varless u32 offset/length), 1 + len per literal run."""
    total = 0
    for op in ops:
        total += 9 if op[0] == "c" else 1 + len(op[1])
    return total


def snapshot_delta(
    old_ds,
    new_ds,
    key_col: str = "url",
    content_col: str = "text",
    block: int = 16,
    broadcast_cap: int = 2_000_000,
):
    """Per changed key: delta-encode old→new and reconstruct — ``(key,
    reconstructed, bytes_new, delta_bytes, n_copy, n_literal)``. Pairing
    reuses the hash-gated changed-minority machinery (only changed keys'
    payloads move); the diff itself is per-pair CPU inside the segment
    kernel."""
    import pyarrow.compute as pc
    import ray

    from ray.data.aggregate import Max, Min, Sum

    from .segments import sorted_segment_apply
    from .snapshots import _hash_side

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

    changed = agg.map_batches(changed_only, batch_format="pyarrow").materialize()
    if changed.count() <= broadcast_cap:
        ckeys = pa.concat_arrays(
            [
                c
                for b in changed.iter_batches(batch_format="pyarrow")
                for c in b.column(key_col).chunks
                if len(c)
            ]
        )
        cref = ray.put(ckeys)

        def tag(ds, side: int):
            def f(batch: pa.Table) -> pa.Table:
                mask = pc.is_in(batch[key_col], value_set=ray.get(cref))
                kept = batch.filter(mask)
                n = kept.num_rows
                return pa.Table.from_arrays(
                    [
                        kept[key_col].combine_chunks().cast(pa.string()),
                        pa.array(np.full(n, side, dtype=np.int8)),
                        pc.fill_null(kept[content_col], "").cast(pa.string()),
                    ],
                    names=[key_col, "side", content_col],
                )

            return ds.map_batches(f, batch_format="pyarrow")

        pairs = tag(old_ds, 1).union(tag(new_ds, 2))
    else:
        # over-cap regime: the same sorted-lookup semi-join
        # snapshot_edit_distance uses — nothing changed-set-sized on the
        # driver; only changed keys' payloads survive into the pair sort.
        from .segments import attach_lookup

        def tag_all(ds, side: int):
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

        pairs = attach_lookup(
            tag_all(old_ds, 1).union(tag_all(new_ds, 2)),
            changed,
            key_col=key_col,
            val_cols=[],
            carry_cols=["side", content_col],
        )
    pairs = pairs.repartition(
        max(8, int(ray.cluster_resources().get("CPU", 8)))
    )

    names = [key_col, "reconstructed", "bytes_new", "delta_bytes",
             "n_copy", "n_literal"]

    def kernel(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        ks, recon, bn, db, nc, nl = [], [], [], [], [], []
        if len(starts):
            kcol = batch[key_col].to_pylist()
            texts = batch[content_col].to_pylist()
            for s, e in zip(starts, ends):
                if e - s != 2:
                    continue
                old_b = (texts[s] or "").encode()
                new_b = (texts[s + 1] or "").encode()
                ops = diff_bytes(old_b, new_b, block=block)
                out = apply_delta(old_b, ops)
                ks.append(kcol[s])
                recon.append(out.decode("utf-8", errors="replace"))
                bn.append(len(new_b))
                db.append(delta_size(ops))
                nc.append(sum(1 for o in ops if o[0] == "c"))
                nl.append(sum(1 for o in ops if o[0] == "l"))
        return pa.Table.from_arrays(
            [
                pa.array(ks, pa.string()),
                pa.array(recon, pa.string()),
                pa.array(bn, pa.int64()),
                pa.array(db, pa.int64()),
                pa.array(nc, pa.int64()),
                pa.array(nl, pa.int64()),
            ],
            names=names,
        )

    return sorted_segment_apply(
        pairs, key_col=key_col, block_fn=kernel, within_cols=["side"]
    )
