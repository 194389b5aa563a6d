"""Sequence packing: tokenized documents → fixed-length training sequences.

The last mile of a pretraining data pipeline: deterministic tokenization
(hash vocabulary), an EOS separator after every document, and concatenated
token streams cut into ``seq_len`` chunks. Packing is SHARDED — documents
are grouped into fixed doc-id ranges and each shard packs independently
(sequences never cross a shard boundary), which is what makes the operator
embarrassingly parallel at corpus scale: no global prefix-sum, no driver
state, one ``groupby(shard)`` with vectorized in-group assembly. The
shard-end remainder is simply a shorter final sequence (standard practice
for sharded packing; no padding tokens are fabricated).

Token ids are FNV-1a of the lowercased token, folded into the vocab range
``[2, vocab_size)`` — ids 0/1 are reserved (PAD/EOS) — so the DuckDB
oracle can recompute every id with the same HUGEINT arithmetic used by the
embed_ann oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PAD_ID = 0
EOS_ID = 1

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1

_TOKEN_ID_CACHE: dict[tuple[str, int], int] = {}


def token_id(tok: str, vocab_size: int) -> int:
    """FNV-1a(token) folded to [2, vocab_size) (0=PAD, 1=EOS reserved)."""
    key = (tok, vocab_size)
    cached = _TOKEN_ID_CACHE.get(key)
    if cached is None:
        h = _FNV_OFFSET
        for b in tok.encode():
            h = ((h ^ b) * _FNV_PRIME) & _MASK64
        cached = h % (vocab_size - 2) + 2
        if len(_TOKEN_ID_CACHE) > 1_000_000:
            _TOKEN_ID_CACHE.clear()
        _TOKEN_ID_CACHE[key] = cached
    return cached


def tokenize_ids(text: str, vocab_size: int) -> list[int]:
    """Whitespace tokens → hash-vocab ids + trailing EOS."""
    ids = [token_id(t, vocab_size) for t in (text or "").lower().split()]
    ids.append(EOS_ID)
    return ids


def pack_tokens(
    ds,
    seq_len: int = 128,
    vocab_size: int = 32_768,
    shard_size: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Pack a document Dataset into training sequences.

    Returns a Dataset of rows ``(shard, seq_idx, pos, token_id)`` — the
    exploded form of ``(shard, seq_idx) → int32[<=seq_len]`` sequences
    (explode keeps the result exactly comparable across engines; a
    training loader would ``groupby(shard, seq_idx)`` and reassemble,
    or consume the list-typed variant below).

    Stages: one ``map_batches`` tags each doc with its shard
    (``doc_id // shard_size``); ``groupby(shard).map_groups`` orders the
    shard's docs by id, concatenates token ids (EOS after each doc), and
    cuts ``seq_len`` chunks — all vectorized numpy within the group.
    """

    def tag(batch: pa.Table) -> pa.Table:
        shard = pa.compute.divide(batch[id_col], pa.scalar(shard_size, pa.int64()))
        return batch.select([id_col, text_col]).append_column("shard", shard)

    def pack_shard(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(id_col)
        ids: list[int] = []
        for text in group[text_col]:
            ids.extend(tokenize_ids(text, vocab_size))
        arr = np.asarray(ids, dtype=np.int32)
        pos = np.arange(len(arr), dtype=np.int64)
        return pd.DataFrame(
            {
                "shard": np.full(len(arr), int(group["shard"].iloc[0]), dtype=np.int64),
                "seq_idx": pos // seq_len,
                "pos": pos % seq_len,
                "token_id": arr,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack_shard, batch_format="pandas")
    )


def pack_tokens_sequences(ds, **kwargs):
    """List-typed variant: rows ``(shard, seq_idx, token_ids: list<int32>)``
    — the shape a training loader consumes directly."""

    def to_lists(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("pos")
        return pd.DataFrame(
            {
                "shard": [int(group["shard"].iloc[0])],
                "seq_idx": [int(group["seq_idx"].iloc[0])],
                "token_ids": [group["token_id"].to_numpy().tolist()],
            }
        )

    return (
        pack_tokens(ds, **kwargs)
        .groupby(["shard", "seq_idx"])
        .map_groups(to_lists, batch_format="pandas")
    )
