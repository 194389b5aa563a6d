"""Corpus-level deduplication operators.

All operators follow the same Ray-Data shape: a vectorized ``map_batches``
signature stage (hashing/sketching — embarrassingly parallel), then ONE
hash-keyed ``groupby`` where only the small signature columns are shuffled
(payloads never move), then per-group vectorized resolution. Determinism:
every winner choice is "minimum id", every hash is seeded/content-derived —
never Python's salted ``hash``.

Scale notes per operator are in the docstrings; the guide patterns
(shingle→minhash→band→bucket groupby; min-label propagation for connected
components) follow the standard MinHash-LSH construction (Broder 1997) and
the Ray Data groupby idiom.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# Fixed 64-bit universal-hash parameters for minhash permutations
# (deterministic across processes; seeded Philox keeps setup cheap).
_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.Philox(seed))
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def content_hash_batch(texts: list[str]) -> list[str]:
    """sha1 content hashes (hex) — the exact-dedup signature."""
    return [hashlib.sha1((t or "").encode()).hexdigest() for t in texts]


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: one surviving row (min id) per distinct text.

    hash-signature ``map_batches`` → ``groupby(content_hash)`` (shuffles the
    40-byte hash + ids, never the text... the text rides along here because
    the survivor row is the output; at 100 TB you'd shuffle (hash, id) only
    and semi-join winners back via a broadcast id set).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "content_hash",
            pa.array(content_hash_batch(batch[text_col].to_pylist()), pa.string()),
        )

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1)

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .map_groups(keep_first, batch_format="pandas")
    )


def exact_dedup_large(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup for corpora where text must never enter a shuffle.

    Two passes over cheap columns: (1) signature scan emits only
    ``(content_hash, id)`` (40 + 8 bytes/row) into the groupby; per group
    everything except the min id is a LOSER; (2) the loser-id set — sized
    by the duplicate count, not the corpus — is broadcast via ``ray.put``
    and the full dataset is anti-joined against it with a vectorized
    ``is_in``. The corpus text itself never moves. (At loser counts beyond
    broadcast reach, swap the set for the state-layer Bloom index — false
    positives would drop extra rows, so there the Bloom answers "certainly
    kept" and candidates get an exact recheck.)
    """
    import ray

    def signatures(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pa.array(content_hash_batch(batch[text_col].to_pylist()), pa.string()),
                batch[id_col],
            ],
            names=["content_hash", id_col],
        )

    def losers(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].sort_values()
        return pd.DataFrame({id_col: ids.iloc[1:]})

    # Loser ids stay in their NATIVE Arrow type (string doc ids / urls work
    # as well as ints — is_in needs no sort, no cast).
    loser_chunks = [
        chunk
        for batch in (
            ds.map_batches(signatures, batch_format="pyarrow")
            .groupby("content_hash")
            .map_groups(losers, batch_format="pandas")
            .iter_batches(batch_format="pyarrow")
        )
        for chunk in batch.column(id_col).chunks
        if len(chunk)
    ]
    if not loser_chunks:
        return ds
    loser_ref = ray.put(pa.concat_arrays(loser_chunks))

    def keep_winners(batch: pa.Table) -> pa.Table:
        value_set = ray.get(loser_ref)
        mask = pa.compute.invert(pa.compute.is_in(batch[id_col], value_set=value_set))
        return batch.filter(mask)

    return ds.map_batches(keep_winners, batch_format="pyarrow")


def _char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed k-char shingles as uint64 (vectorized via byte-view rolling
    windows)."""
    data = (text or "").lower().encode("utf-8", errors="ignore")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8)
    windows = np.lib.stride_tricks.sliding_window_view(arr, min(k, len(arr)))
    # FNV-1a over each window, vectorized across windows.
    h = np.full(len(windows), 0xCBF29CE484222325, dtype=np.uint64)
    for col in range(windows.shape[1]):
        h = (h ^ windows[:, col].astype(np.uint64)) * np.uint64(0x100000001B3)
    return np.unique(h)


def minhash_signature(text: str, n_perm: int, a: np.ndarray, b: np.ndarray, k: int = 5) -> np.ndarray:
    """n_perm minhash values of the text's shingle set (uint64)."""
    shingles = _char_shingles(text, k)
    if len(shingles) == 0:
        return np.zeros(n_perm, dtype=np.uint64)
    # (a*x + b) mod p for each permutation; min over shingles.
    vals = (a[:, None] * shingles[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def jaccard_ngrams(text1: str, text2: str, k: int = 5) -> float:
    """Exact n-gram (k-char shingle) Jaccard similarity — the verification
    kernel behind MinHash candidates, and the corpus-level generalization of
    the reference's word-set Jaccard quick check
    (reference: similarity_calculator.py:177-210)."""
    s1, s2 = _char_shingles(text1, k), _char_shingles(text2, k)
    if len(s1) == 0 and len(s2) == 0:
        return 1.0
    inter = len(np.intersect1d(s1, s2, assume_unique=True))
    union = len(s1) + len(s2) - inter
    return inter / union if union else 0.0


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    shingle_k: int = 5,
    seed: int = 42,
):
    """MinHash + LSH near-duplicate clustering.

    Stages: (1) ``map_batches``: signature per doc, exploded to one row per
    band ``(band_id, band_hash, doc_id)`` — only 24-byte rows enter the
    shuffle; (2) ``groupby(band_id, band_hash)``: bucket members become
    candidate pairs; (3) candidate pairs verified with exact n-gram Jaccard
    ≥ threshold (needs the texts: broadcast id→text for the candidate
    minority via ``ray.put``); (4) connected components by min-label
    propagation; (5) winner = min id per cluster.

    Returns a pandas DataFrame ``(doc_id, cluster_id, is_duplicate)`` for
    every input id. For 10^12 docs, step 3's broadcast becomes a hash join
    of the candidate-id set against the corpus — the candidate set is
    O(duplicates), orders of magnitude smaller than the corpus.
    """
    import ray

    rows_per_band = n_perm // bands
    a, b = _perm_params(n_perm, seed)

    def signatures(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_ids, band_ids, band_hashes = [], [], []
        for i, text in enumerate(texts):
            sig = minhash_signature(text, n_perm, a, b, shingle_k)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                digest = hashlib.sha1(chunk.tobytes()).hexdigest()[:16]
                out_ids.append(ids[i])
                band_ids.append(band)
                band_hashes.append(digest)
        return pa.Table.from_arrays(
            [
                pa.array(out_ids, pa.int64()),
                pa.array(band_ids, pa.int32()),
                pa.array(band_hashes, pa.string()),
            ],
            names=[id_col, "band_id", "band_hash"],
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group[id_col].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        # Pair every member with the bucket minimum — enough edges for
        # connected components without O(n²) pairs per bucket.
        lo = ids[0]
        return pd.DataFrame({"id_a": [lo] * (len(ids) - 1), "id_b": ids[1:]})

    pairs = (
        ds.map_batches(signatures, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    ).to_pandas()
    pairs = pairs.drop_duplicates()

    # Verify candidates with exact Jaccard (texts fetched via broadcast map).
    id_text = {}
    for batch in ds.select_columns([id_col, text_col]).iter_batches(batch_format="pyarrow"):
        id_text.update(zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()))
    ref = ray.put(id_text)
    lookup = ray.get(ref)
    verified = [
        (int(r.id_a), int(r.id_b))
        for r in pairs.itertuples()
        if jaccard_ngrams(lookup[int(r.id_a)], lookup[int(r.id_b)], shingle_k) >= threshold
    ]

    # Connected components: union-find over the (small) verified edge set.
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in verified:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)

    all_ids = sorted(id_text)
    clusters = {i: find(i) if i in parent else i for i in all_ids}
    return pd.DataFrame(
        {
            id_col: all_ids,
            "cluster_id": [clusters[i] for i in all_ids],
            "is_duplicate": [clusters[i] != i for i in all_ids],
        }
    )


def simhash64(text: str, seed: int = 42) -> int:
    """64-bit SimHash over word tokens (Charikar 2002): sum ±1 per bit of
    each token hash, take sign bits."""
    tokens = (text or "").lower().split()
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        digest = hashlib.blake2b(tok.encode(), digest_size=8, salt=seed.to_bytes(8, "little")).digest()
        bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    sign = (acc > 0).astype(np.uint8)
    return int(np.packbits(sign).view(">u8")[0])


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 42,
):
    """SimHash near-dup: signature ``map_batches`` → bucket by each of four
    16-bit bands (a ≤3-bit-different pair shares at least one exact band by
    pigeonhole) → verify Hamming distance within buckets. Returns pandas
    ``(doc_id, simhash, cluster_id, is_duplicate)``."""

    def signatures(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = [simhash64(t, seed) for t in batch[text_col].to_pylist()]
        out_ids, band_ids, band_vals, sig_col = [], [], [], []
        for i, sig in zip(ids, sigs):
            for band in range(4):
                out_ids.append(i)
                band_ids.append(band)
                band_vals.append((sig >> (band * 16)) & 0xFFFF)
                sig_col.append(sig)
        return pa.Table.from_arrays(
            [
                pa.array(out_ids, pa.int64()),
                pa.array(band_ids, pa.int32()),
                pa.array(band_vals, pa.int32()),
                pa.array(sig_col, pa.uint64()),
            ],
            names=[id_col, "band_id", "band_val", "simhash"],
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.sort_values(id_col)[[id_col, "simhash"]].values
        out_a, out_b = [], []
        for i in range(1, len(rows)):
            ham = bin(int(rows[0][1]) ^ int(rows[i][1])).count("1")
            if ham <= max_hamming:
                out_a.append(int(rows[0][0]))
                out_b.append(int(rows[i][0]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    sig_ds = ds.map_batches(signatures, batch_format="pyarrow")
    pairs = (
        sig_ds.groupby(["band_id", "band_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    sigs = (
        sig_ds.to_pandas()[[id_col, "simhash"]]
        .drop_duplicates()
        .sort_values(id_col)
        .reset_index(drop=True)
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.itertuples():
        ru, rv = find(int(r.id_a)), find(int(r.id_b))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    sigs["cluster_id"] = [find(int(i)) if int(i) in parent else int(i) for i in sigs[id_col]]
    sigs["is_duplicate"] = sigs["cluster_id"] != sigs[id_col]
    return sigs


def embedding_dedup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
):
    """Embedding-cosine near-dup: normalize vectors per batch, LSH-bucket by
    the sign pattern of 8 fixed random hyperplanes, verify cosine within
    buckets (exact pairwise matmul per bucket — buckets are small). Returns
    pandas ``(vec_id, cluster_id, is_duplicate)``."""
    def signatures(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vecs = vecs / norms
        local_planes = np.random.Generator(np.random.Philox(7)).normal(
            size=(vecs.shape[1], 8)
        )
        bucket = (vecs @ local_planes > 0).astype(np.uint8)
        bucket_id = np.packbits(bucket, axis=1)[:, 0]
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(bucket_id.astype(np.int32), pa.int32()),
                pa.array(list(vecs), pa.list_(pa.float64())),
            ],
            names=[id_col, "bucket", "nvec"],
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(id_col)
        ids = group[id_col].to_numpy()
        mat = np.array(group["nvec"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        sims = mat @ mat.T
        ia, ib = np.where(np.triu(sims, 1) >= threshold)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    pairs = (
        ds.map_batches(signatures, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    all_ids = sorted(
        i
        for batch in ds.select_columns([id_col]).iter_batches(batch_format="pyarrow")
        for i in batch[id_col].to_pylist()
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.itertuples():
        ru, rv = find(int(r.id_a)), find(int(r.id_b))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return pd.DataFrame(
        {
            id_col: all_ids,
            "cluster_id": [find(i) if i in parent else i for i in all_ids],
            "is_duplicate": [
                (find(i) if i in parent else i) != i for i in all_ids
            ],
        }
    )
