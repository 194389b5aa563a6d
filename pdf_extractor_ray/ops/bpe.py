"""Distributed byte-pair-encoding (BPE) subword training and encoding.

The classic trainer (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units", ACL — public paper) never
iterates the corpus: it iterates the WORD-TYPE frequency table. That is
the honest 100-TB decomposition used here:

1. ``word_frequencies`` — the only corpus-scale work: per-BLOCK vectorized
   word counts pre-combined before one vocabulary-sized ``groupby(word)``
   sum (same shape as :func:`..ops.text.word_topk`).
2. ``bpe_train`` — the merge loop runs on the driver over the word-TYPE
   table, which is vocabulary-bounded (≈10⁷ types for web text, per Heaps'
   law), never corpus-bounded, and is additionally gated by ``word_cap``:
   above the cap the trainer keeps the top ``word_cap`` types by count
   (exact once counts are global — low-frequency types can contribute at
   most ``cap_tail_cnt × len`` to any pair, and every standard BPE trainer
   applies a min-frequency floor anyway).
3. ``bpe_apply`` — encoding is a stateful ``map_batches`` stage: the merge
   ranks are compiled once per worker in ``__init__`` (model-in-init
   shape) with a per-worker word→tokens memo, so the per-batch cost is a
   dict lookup for every repeated word type.

``bpe_pair_counts`` exposes iteration zero of the trainer (adjacent
character-pair counts with the end-of-word marker) as a standalone,
SQL-checkable query — the exchange whose correctness the whole trainer
rests on.

No counterpart in the reference repo (the reference has no tokenizer);
this op belongs to the engine's training-data-pipeline surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# End-of-word marker: rides as one extra symbol per word type. chr(31)
# (ASCII unit separator) is outside every realistic token alphabet; even
# if a corpus contained it, both the op and the SQL oracle treat it as an
# ordinary character, so results stay well-defined.
MARKER = "\x1f"


def _word_count_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-block (word, cnt) partials: RE2 ``\\s+`` split → flatten →
    ``np.unique`` — the pre-combine that keeps row-level text out of the
    vocabulary exchange."""
    from .text import split_words

    texts = pc.fill_null(batch[text_col], "")
    w = split_words(texts).flatten().to_numpy(zero_copy_only=False)
    w = w[w != ""]
    if len(w):
        u, c = np.unique(w.astype(str), return_counts=True)
    else:
        u, c = np.array([], dtype=object), np.array([], np.int64)
    return pa.Table.from_arrays(
        [pa.array(u.astype(object), pa.string()), pa.array(c, pa.int64())],
        names=["word", "cnt"],
    )


def word_frequencies(ds, text_col: str = "text"):
    """Corpus word-type frequency table as a Dataset of ``(word, cnt)``."""
    from ray.data.aggregate import Sum

    return (
        ds.map_batches(
            lambda b: _word_count_partial(b, text_col),
            batch_format="pyarrow",
            batch_size=None,
        )
        .groupby("word")
        .aggregate(Sum("cnt"))
        .map_batches(
            lambda b: b.rename_columns(["word", "cnt"]), batch_format="pyarrow"
        )
    )


def _pair_count_partial(batch: pa.Table) -> pa.Table:
    """Vectorized adjacent-pair counts over a block of word TYPES.

    All words (+ marker) are concatenated into one UTF-32 code array;
    pairs are ``(codes[i], codes[i+1])`` masked at word boundaries, packed
    into one uint64 key, and weight-summed via ``np.add.at`` — zero
    per-character Python.
    """
    words = batch["word"].to_numpy(zero_copy_only=False)
    cnts = batch["cnt"].to_numpy()
    if len(words) == 0:
        return pa.Table.from_arrays(
            [
                pa.array([], pa.string()),
                pa.array([], pa.string()),
                pa.array([], pa.int64()),
            ],
            names=["left_sym", "right_sym", "cnt"],
        )
    joined = MARKER.join(words) + MARKER  # marker terminates every word
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lengths = np.fromiter((len(w) for w in words), np.int64, count=len(words)) + 1
    ends = np.cumsum(lengths) - 1  # marker positions
    left, right = codes[:-1].astype(np.uint64), codes[1:].astype(np.uint64)
    weights = np.repeat(cnts, lengths)[:-1]
    # A pair starting AT a marker crosses into the next word — drop it.
    valid = np.ones(len(left), dtype=bool)
    valid[ends[:-1]] = False
    keys = (left[valid] << np.uint64(32)) | right[valid]
    u, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros(len(u), dtype=np.int64)
    np.add.at(sums, inv, weights[valid])
    lc = (u >> np.uint64(32)).astype(np.uint32)
    rc = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return pa.Table.from_arrays(
        [
            pa.array(
                [c for c in lc.tobytes().decode("utf-32-le")], pa.string()
            ),
            pa.array(
                [c for c in rc.tobytes().decode("utf-32-le")], pa.string()
            ),
            pa.array(sums, pa.int64()),
        ],
        names=["left_sym", "right_sym", "cnt"],
    )


def bpe_pair_counts(ds, text_col: str = "text", k: int = 100) -> pd.DataFrame:
    """Iteration-0 BPE pair statistics: the ``k`` most frequent adjacent
    symbol pairs (characters + end-of-word marker) weighted by word-type
    frequency; tiebreak ``(left_sym, right_sym)`` ascending.

    The result space is alphabet² (a few thousand rows), so the final
    rank/limit is driver-side over the already-global aggregate.
    """
    from ray.data.aggregate import Sum

    totals = (
        word_frequencies(ds, text_col)
        .map_batches(_pair_count_partial, batch_format="pyarrow")
        .groupby(["left_sym", "right_sym"])
        .aggregate(Sum("cnt"))
    )
    df = totals.to_pandas().rename(columns={"sum(cnt)": "cnt"})
    df = df.sort_values(
        ["cnt", "left_sym", "right_sym"], ascending=[False, True, True]
    ).reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int32)
    df["cnt"] = df["cnt"].astype("int64")
    return df.head(k).reset_index(drop=True)


def _collect_word_freqs(wf, word_cap: int) -> tuple[list[str], np.ndarray, bool]:
    """Driver-side word-type collection, gated by ``word_cap``: per-block
    partial top-cap (exact — counts are global after the groupby) merged on
    the driver from ``blocks × cap`` rows. Returns (words, counts, capped)."""

    def topcap(batch: pa.Table) -> pa.Table:
        if len(batch) <= word_cap:
            return batch
        order = pc.sort_indices(
            batch,
            sort_keys=[("cnt", "descending"), ("word", "ascending")],
        )
        return batch.take(order[:word_cap])

    batches = list(
        wf.map_batches(topcap, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    if not batches:  # empty / all-whitespace corpus
        return [], np.array([], dtype=np.int64), False
    df = pa.concat_tables(batches).to_pandas()
    capped = len(df) > word_cap
    df = df.sort_values(["cnt", "word"], ascending=[False, True], kind="mergesort")
    df = df.head(word_cap)
    return df["word"].tolist(), df["cnt"].to_numpy(), capped


def bpe_train(
    ds,
    num_merges: int = 100,
    text_col: str = "text",
    word_cap: int = 1_000_000,
    min_count: int = 2,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges over the corpus; returns a DataFrame
    ``(rank, left, right, pair_count)`` in merge order.

    Selection is deterministic: highest pair count, tiebreak
    ``(left, right)`` ascending (codepoint order — the same collation the
    SQL oracle of :func:`bpe_pair_counts` uses). Training stops early when
    the best pair's count drops below ``min_count``. Pair counts are
    maintained incrementally: each merge re-scans only the word types that
    contain the merged pair.
    """
    words, cnts, capped = _collect_word_freqs(
        word_frequencies(ds, text_col), word_cap
    )
    if capped:
        import logging

        logging.getLogger(__name__).warning(
            "bpe_train: word types exceed word_cap=%d; training on the "
            "top types by count (standard min-frequency floor behavior)",
            word_cap,
        )
    syms: list[tuple[str, ...]] = [tuple(w) + (MARKER,) for w in words]

    from collections import Counter, defaultdict

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple, set] = defaultdict(set)
    for wi, s in enumerate(syms):
        c = int(cnts[wi])
        for p in zip(s, s[1:]):
            pair_counts[p] += c
            pair_words[p].add(wi)

    def merge_word(s: tuple, a: str, b: str, ab: str) -> tuple:
        out = []
        i = 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return tuple(out)

    merges = []
    for rank in range(1, num_merges + 1):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), best_cnt = best
        if best_cnt < min_count:
            break
        merges.append((rank, a, b, int(best_cnt)))
        ab = a + b
        for wi in list(pair_words[(a, b)]):
            old = syms[wi]
            c = int(cnts[wi])
            new = merge_word(old, a, b, ab)
            if new == old:
                continue
            for p in zip(old, old[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    # Drop BOTH structures: a stale pair_words set would
                    # otherwise hold dead word indices for the whole run
                    # (O(pairs × words) driver memory at word_cap scale).
                    del pair_counts[p]
                    pair_words.pop(p, None)
                else:
                    pair_words[p].discard(wi)
            for p in zip(new, new[1:]):
                pair_counts[p] += c
                pair_words[p].add(wi)
            syms[wi] = new
        pair_counts.pop((a, b), None)
        pair_words.pop((a, b), None)
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "pair_count"]
    ).astype({"rank": "int32", "pair_count": "int64"})


class BpeEncoder:
    """``map_batches`` stage applying trained merges: appends
    ``n_bpe_tokens`` (int32 subword count per document). Merge ranks are
    compiled once per worker; encoded word types are memoized per worker,
    so repeated types cost one dict hit."""

    def __init__(self, merges: pd.DataFrame, text_col: str = "text"):
        self.ranks = {
            (l, r): i for i, (l, r) in enumerate(zip(merges["left"], merges["right"]))
        }
        self.text_col = text_col
        self._memo: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        n = self._memo.get(word)
        if n is not None:
            return n
        s = list(word) + [MARKER]
        ranks = self.ranks
        while len(s) > 1:
            best_i, best_r = -1, None
            for i in range(len(s) - 1):
                r = ranks.get((s[i], s[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
        n = len(s)
        self._memo[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .text import split_words

        words_list = split_words(pc.fill_null(batch[self.text_col], ""))
        counts = []
        for row in words_list.to_pylist():
            counts.append(sum(self._encode_len(w) for w in row if w))
        return batch.append_column("n_bpe_tokens", pa.array(counts, pa.int32()))


def bpe_apply(ds, merges: pd.DataFrame, text_col: str = "text", concurrency=(1, 8)):
    """Encode the corpus with trained merges (actor pool; merges broadcast
    once per worker via the constructor). The pool autoscales from 1 so a
    small cluster (or a 2-CPU test session) never deadlocks waiting for a
    fixed pool it cannot schedule."""
    return ds.map_batches(
        BpeEncoder,
        batch_format="pyarrow",
        fn_constructor_kwargs={"merges": merges, "text_col": text_col},
        concurrency=concurrency,
    )
