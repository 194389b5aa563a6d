"""Distributed cardinality sketches (HyperLogLog) with bit-exact oracles.

A 100 TB curation run constantly needs "how many distinct hosts / users /
keys" where exact distinct (``groupby`` on the key) is an all-to-all
shuffle of every key.  HyperLogLog answers it with **fixed** state:
``2^p`` one-byte registers, combined by element-wise max — associative,
commutative, and order-free, so it maps onto Ray Data as a per-block
``map_batches`` partial (vectorized ``np.maximum.at``) followed by one
tiny ``groupby("register").max()`` over at most ``blocks × 2^p``
pre-combined rows.  Nothing corpus-sized moves.

Determinism story: the hash is the same public-domain splitmix64 finalizer
used by :func:`..ops.text.hash_sample`, already reproduced bit-for-bit in
ANSI SQL (HUGEINT modular arithmetic) by the ``stratified_sample`` oracle
— so the *entire sketch* (every register value) is oracle-checkable, not
just the estimate.  The reference has no corpus operators (SURVEY.md
§2.7); this is net-new engine surface.

String keys: hash them to int64 first (e.g. the rolling-hash fingerprint
stage in :mod:`.text`) and sketch the fingerprint column — composition
keeps this kernel branch-free and fully vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import splitmix64_np

__all__ = ["hll_sketch", "hll_estimate", "hll_rho"]


def _bitlength(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (0 → 0) via six
    binary-search mask steps — NOT float log2, which rounds values within
    half an ulp of 2^k UP to k (e.g. log2(2^52-1) == 52.0 exactly)."""
    x = x.copy()
    bl = np.zeros(len(x), dtype=np.int32)
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= np.uint64(1) << np.uint64(shift)
        bl[m] += shift
        x[m] >>= np.uint64(shift)
    return bl + (x > 0)


def hll_rho(hv: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) for 64-bit hashes: register = top ``p`` bits, rho =
    1 + leading zeros of the remaining ``w = 64-p`` bits (in [1, w+1]),
    computed with exact integer bit arithmetic."""
    if not 4 <= p <= 18:
        raise ValueError("hll_rho: p must be in [4, 18]")
    w = 64 - p
    hv = np.asarray(hv, dtype=np.uint64)
    register = (hv >> np.uint64(w)).astype(np.int32)
    rest = hv & np.uint64((1 << w) - 1)
    rho = (w + 1 - _bitlength(rest)).astype(np.int32)
    return register, rho


def hll_sketch(ds, col: str, p: int = 12):
    """HyperLogLog register table for an integer key column: a Dataset of
    ``(register int32, max_rho int32)`` rows, one per occupied register
    (``<= 2^p`` rows total).  Partials are per-block dense max-combines;
    the only exchange is the final tiny groupby."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch[col]
        if arr.null_count:  # nulls are not keys (SQL COUNT DISTINCT semantics)
            arr = arr.drop_null()
        keys = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        hv = splitmix64_np(keys)
        reg, rho = hll_rho(hv, p)
        dense = np.zeros(m, dtype=np.int32)
        np.maximum.at(dense, reg, rho)
        occ = np.flatnonzero(dense)
        return pa.Table.from_arrays(
            [
                pa.array(occ.astype(np.int32), pa.int32()),
                pa.array(dense[occ], pa.int32()),
            ],
            names=["register", "rho"],
        )

    from ray.data.aggregate import Max

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("register")
        .aggregate(Max("rho"))
    )


def hll_estimate(registers: np.ndarray, p: int = 12) -> float:
    """Standard HLL estimate from a DENSE register array of size 2^p
    (zeros for unoccupied registers): alpha_m·m²/Σ2^(-M_j) with the usual
    small-range linear-counting correction (Flajolet et al. 2007)."""
    m = 1 << p
    registers = np.asarray(registers, dtype=np.float64)
    if len(registers) != m:
        raise ValueError(f"expected dense array of {m} registers")
    if p < 7:
        alpha = {4: 0.673, 5: 0.697, 6: 0.709}[p]
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers))
    zeros = int(np.sum(registers == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_sketch_grouped(ds, group_col: str, col: str, p: int = 12):
    """Per-GROUP HyperLogLog register tables: a Dataset of
    ``(group, register, max_rho)`` rows, ≤ ``groups × 2^p`` total — the
    mergeable approximate counterpart of
    :func:`..ops.segments.distinct_count_per_key` for when the value
    column is too hot to sort. Per-block partials keep one dense register
    array per group present in the block (bounded group cardinality —
    event types, languages, sources — same contract as ``word_topk``);
    the only exchange is the tiny ``groupby(group, register).max``.
    Same splitmix64 hash as :func:`hll_sketch`, so every register is
    bit-exactly SQL-checkable."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(
            pc.and_(pc.is_valid(batch[group_col]), pc.is_valid(batch[col]))
        )
        gtype = batch.schema.field(group_col).type
        g = batch[group_col].to_numpy(zero_copy_only=False)
        keys = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        hv = splitmix64_np(keys)
        reg, rho = hll_rho(hv, p)
        out_g, out_r, out_rho = [], [], []
        for gv in np.unique(g):  # bounded group cardinality
            mask = g == gv
            dense = np.zeros(m, dtype=np.int32)
            np.maximum.at(dense, reg[mask], rho[mask])
            occ = np.flatnonzero(dense)
            out_g.append(np.full(len(occ), gv, dtype=object))
            out_r.append(occ.astype(np.int32))
            out_rho.append(dense[occ])
        empty_o = np.array([], dtype=object)
        empty_i = np.array([], dtype=np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_g) if out_g else empty_o, gtype),
                pa.array(np.concatenate(out_r) if out_r else empty_i, pa.int32()),
                pa.array(np.concatenate(out_rho) if out_rho else empty_i, pa.int32()),
            ],
            names=[group_col, "register", "rho"],
        )

    from ray.data.aggregate import Max

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby([group_col, "register"])
        .aggregate(Max("rho"))
    )
