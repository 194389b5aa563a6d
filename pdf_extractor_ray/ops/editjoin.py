"""Exact edit-distance similarity join (Ed-Join family: Gravano et al.
VLDB 2001 count/prefix filtering; Xiao, Wang, Lin 2008) over a SHORT
string key column — full-recall typo-class matching for crawl-side
entity keys (page titles, product names, normalized URLs) where LSH
famously loses recall: one edit rewrites most shingles of a short
string, but changes at most ``q`` of its positional q-grams.

Guarantees (exact, not probabilistic):

- every pair with ``levenshtein(a, b) <= k`` is emitted with its exact
  distance; no pair with a larger distance appears (verification is a
  banded DP with cap ``k``).
- recall argument: pad each key with begin/end sentinels, take its
  occurrence-numbered q-gram multiset ``G(s)`` (``|G| = len+1`` grams
  at q=2, repeats disambiguated by occurrence index so multiset
  intersection is set intersection). One edit rewrites at most ``q``
  grams, so ``ed <= k ⟹ |G(a) ∩ G(b)| >= max(|G(a)|,|G(b)|) - k·q``
  (count filter), and by the prefix-filter principle the two
  ``k·q + 1``-element prefixes under ANY global total order must
  intersect — PROVIDED the required overlap is >= 1, i.e.
  ``max(len_a, len_b) >= k·q``. The order used is (global gram
  frequency asc, gram bytes), so the prefixes are each string's
  RAREST grams. Pairs where BOTH keys are shorter than ``k·q`` can
  share zero grams at ``ed <= k`` (e.g. "b" vs "c" at k=1, q=2);
  those keys additionally land in a dedicated short-key bucket
  compared all-pairs — sound because the short regime is bounded by
  the alphabet (len < k·q). Up to ``short_cap`` short keys that is
  ONE bucket; above it (round 5) the bucket splits into LENGTH BANDS:
  ``|ed| <= k ⟹ |len_a − len_b| <= k``, so emitting each short key
  into bands ``[len, min(len + k, k·q − 1)]`` co-locates every
  admissible short×short pair in band ``max(len_a, len_b)`` — recall
  unchanged (forced-cap equality test), per-band population replaces
  the single bucket's, and the residual quadratic (many same-length
  short keys) is the alphabet-bounded regime the module contract
  documents, not a corpus-sized one.
  A short×long pair needs no special casing: the short side emits
  ALL its grams (fewer than the prefix budget), which covers any
  prefix the principle requires of it.

Distributed shape (documented partitioning assumption: keys are SHORT
— titles/URLs, not documents):

1. one ``groupby(gram).sum`` over per-block pre-combined partials
   builds the gram-frequency vocabulary — bounded by
   ``alphabet^q × max_occurrence``, NOT corpus size; it is size-gated
   (``vocab_cap``) and broadcast once via ``ray.put``.
2. each key emits its ``k·q + 1`` rarest grams as ``(gram_rank, id,
   key)`` rows — ≤ ``(k·q+1)·n`` rows carrying the short key.
3. ONE sort groups gram buckets; the in-segment kernel emits
   length-filtered candidate pairs (bucket sizes are PREFIX-gram
   frequencies — the rarest grams in the corpus — the same skew
   argument as the LSH band buckets in ``ops/dedup.py``).
4. ``groupby(id_a, id_b)`` dedups candidates across buckets, then the
   banded-DP verify runs on the pair minority with the keys already
   in-row — no driver collection, no text broadcast anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PAD_L = "\x01"
_PAD_R = "\x02"


def lev_banded(a: str, b: str, cap: int) -> int:
    """Levenshtein with band cap: exact when ``<= cap``, else ``cap+1``.
    Common prefix/suffix are stripped first; the DP then only visits
    the ``2·cap + 1`` diagonal band (O(len·cap))."""
    i = 0
    n, m = len(a), len(b)
    while i < n and i < m and a[i] == b[i]:
        i += 1
    j = 0
    while j < n - i and j < m - i and a[n - 1 - j] == b[m - 1 - j]:
        j += 1
    a, b = a[i : n - j], b[i : m - j]
    n, m = len(a), len(b)
    if abs(n - m) > cap:
        return cap + 1
    if n == 0 or m == 0:
        return max(n, m)
    big = cap + 1
    prev = list(range(m + 1))
    for r in range(1, n + 1):
        cur = [big] * (m + 1)
        cur[0] = r
        best = big
        ca = a[r - 1]
        for c in range(max(1, r - cap), min(m, r + cap) + 1):
            cur[c] = min(
                (prev[c] + 1) if c >= r - cap else big,
                cur[c - 1] + 1,
                prev[c - 1] + (ca != b[c - 1]),
            )
            if cur[c] < best:
                best = cur[c]
        if best > cap:
            return big
        prev = cur
    return min(prev[m], big)


def _grams(key: str, q: int) -> list[str]:
    """Occurrence-numbered positional q-grams of the padded key: each
    gram string is ``gram + chr(occurrence_index)`` so repeats stay
    distinct and multiset overlap is plain set overlap."""
    s = _PAD_L + key + _PAD_R
    seen: dict[str, int] = {}
    out = []
    for i in range(len(s) - q + 1):
        g = s[i : i + q]
        occ = seen.get(g, 0)
        seen[g] = occ + 1
        out.append(g + chr(occ))
    return out


def edit_distance_join(
    ds,
    key_col: str,
    id_col: str = "doc_id",
    k: int = 2,
    q: int = 2,
    vocab_cap: int = 500_000,
    short_cap: int = 100_000,
):
    """All pairs ``(id_a < id_b)`` whose ``key_col`` strings are within
    Levenshtein distance ``k`` — exact distances, full recall (see
    module docstring for the filter-correctness argument and the
    distributed shape). Returns a Dataset ``(id_a, id_b, key_a, key_b,
    dist)``.

    Raises if the gram vocabulary exceeds ``vocab_cap`` — the
    short-key contract is the operator's partitioning assumption, and
    a silent driver blow-up is worse than a typed refusal. Above
    ``short_cap`` short keys the single short bucket swaps for the
    length-band regime (module docstring) instead of refusing —
    bit-identical output, forced-cap equality tested.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    from .segments import sorted_segment_apply

    proj = ds.select_columns([id_col, key_col])

    def gram_partials(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for key in batch[key_col].to_pylist():
            for g in _grams(str(key), q):
                counts[g] = counts.get(g, 0) + 1
        return pa.Table.from_arrays(
            [
                pa.array(list(counts.keys()), pa.string()),
                pa.array(list(counts.values()), pa.int64()),
            ],
            names=["gram", "n"],
        )

    vocab_ds = (
        proj.map_batches(gram_partials, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("n", alias_name="n"))
    )
    n_grams = vocab_ds.count()
    if n_grams > vocab_cap:
        raise RuntimeError(
            f"edit_distance_join: gram vocabulary {n_grams} exceeds "
            f"vocab_cap={vocab_cap} — keys must be short strings "
            "(titles/URLs), not documents"
        )
    vocab = vocab_ds.to_pandas()
    order = sorted(zip(vocab["n"].tolist(), vocab["gram"].tolist()))
    rank_ref = ray.put({g: r for r, (_, g) in enumerate(order)})
    prefix_len = k * q + 1

    short_len = k * q  # keys below this can miss all grams vs a short peer

    def short_partial(batch: pa.Table) -> pa.Table:
        n = sum(1 for s in batch[key_col].to_pylist() if len(str(s)) < short_len)
        return pa.Table.from_arrays([pa.array([n], pa.int64())], names=["n"])

    n_short = (
        proj.map_batches(short_partial, batch_format="pyarrow").sum("n") or 0
    )
    # Over short_cap the single short bucket splits into length bands
    # (band b holds keys with len in [b−k, b]; every short×short pair
    # within distance k shares band max(len_a, len_b)) — see the module
    # docstring's recall argument. Band ids encode as −(band + 1) to
    # stay clear of the gram ranks (>= 0).
    band_regime = n_short > short_cap

    def emit_prefix(batch: pa.Table) -> pa.Table:
        ranks = ray.get(rank_ref)
        ids = batch[id_col].to_pylist()
        keys = batch[key_col].to_pylist()
        b_rank, b_id, b_key = [], [], []
        for i, key in zip(ids, keys):
            key = str(key)
            gr = sorted(ranks[g] for g in _grams(key, q))[:prefix_len]
            if len(key) < short_len:
                if band_regime:
                    for band in range(
                        len(key), min(len(key) + k, short_len - 1) + 1
                    ):
                        gr.append(-(band + 1))
                else:
                    gr.append(-1)  # the single short-key bucket
            b_rank.extend(gr)
            b_id.extend([int(i)] * len(gr))
            b_key.extend([key] * len(gr))
        return pa.Table.from_arrays(
            [
                pa.array(b_rank, pa.int64()),
                pa.array(b_id, pa.int64()),
                pa.array(b_key, pa.string()),
            ],
            names=["bucket", "id", "key"],
        )

    rows = proj.map_batches(emit_prefix, batch_format="pyarrow")

    # Verification runs INSIDE the segment kernel: the keys are already
    # co-located in the bucket rows, so candidates dedup in-block and
    # verify before any exchange — the groupby then dedups only the
    # MATCHED minority across buckets. (Measured: the naive alternative
    # — a global groupby carrying candidate key strings with Max
    # aggregators — cost 30 s for 554k candidate rows at sf0.1; this
    # shape does the same work in under 2 s.)
    def pair_block(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        keys = np.asarray(batch["key"].to_pylist(), dtype=object)
        seen: set = set()
        ia, ib, ka, kb, dd = [], [], [], [], []
        for s, e in zip(starts, ends):
            for x in range(s, e):
                kx, lx = str(keys[x]), len(str(keys[x]))
                for y in range(x + 1, e):
                    ky = str(keys[y])
                    if abs(lx - len(ky)) > k:
                        continue
                    a_id, b_id = int(ids[x]), int(ids[y])
                    a_key, b_key = kx, ky
                    if a_id > b_id:
                        a_id, b_id = b_id, a_id
                        a_key, b_key = ky, kx
                    if (a_id, b_id) in seen:
                        continue
                    seen.add((a_id, b_id))
                    d = lev_banded(a_key, b_key, k)
                    if d > k:
                        continue
                    ia.append(a_id), ib.append(b_id)
                    ka.append(a_key), kb.append(b_key)
                    dd.append(d)
        return pa.Table.from_arrays(
            [
                pa.array(ia, pa.int64()),
                pa.array(ib, pa.int64()),
                pa.array(ka, pa.string()),
                pa.array(kb, pa.string()),
                pa.array(dd, pa.int64()),
            ],
            names=["id_a", "id_b", "key_a", "key_b", "dist"],
        )

    matched = sorted_segment_apply(
        rows, key_col="bucket", block_fn=pair_block, within_cols=["id"]
    )

    from ray.data.aggregate import Max, Min

    return (
        matched.groupby(["id_a", "id_b"])
        .aggregate(
            Min("dist", alias_name="dist"),
            Max("key_a", alias_name="key_a"),
            Max("key_b", alias_name="key_b"),
        )
        .map_batches(
            lambda t: t.rename_columns(
                ["id_a", "id_b", "dist", "key_a", "key_b"]
            ).select(["id_a", "id_b", "key_a", "key_b", "dist"]),
            batch_format="pyarrow",
        )
    )


def blocking_recall(
    ds,
    key_col: str,
    id_col: str = "doc_id",
    k: int = 1,
    window: int = 4,
):
    """Eval-harness operator: pair RECALL of Sorted-Neighborhood
    blocking (:func:`..ops.dedup.sorted_neighborhood_pairs`, window
    ``window``) against the FULL-recall Ed-Join ground truth
    (:func:`edit_distance_join` at the same ``k``) — the standard
    trade-off measurement entity-resolution pipelines publish before
    choosing a blocking strategy. Both operands are this engine's own
    audited operators; the pair sets are the matched minority and
    reduce to three integers.

    Returns a one-row pandas DataFrame ``(n_truth, n_found,
    recall_milli)`` (floor milli; SN precision is 1000 by construction
    — its kernel verifies distances).
    """
    import pandas as pd

    from .dedup import sorted_neighborhood_pairs

    truth = edit_distance_join(ds, key_col, id_col=id_col, k=k).to_pandas()
    sn = sorted_neighborhood_pairs(
        ds, key_col=key_col, id_col=id_col, window=window, max_dist=k
    ).to_pandas()
    t_pairs = {
        (min(a, b), max(a, b)) for a, b in zip(truth["id_a"], truth["id_b"])
    }
    sn_pairs = {
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(sn["id_a"], sn["id_b"])
    }
    n_truth = len(t_pairs)
    n_found = len(t_pairs & sn_pairs)
    return pd.DataFrame(
        {
            "n_truth": [n_truth],
            "n_found": [n_found],
            "recall_milli": [1000 * n_found // n_truth if n_truth else 1000],
        }
    )
