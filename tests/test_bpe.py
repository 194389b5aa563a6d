"""BPE trainer/encoder: the merge loop and encoder are equivalence-tested
against a brute-force single-process reference (the merge loop is iterative
and not SQL-expressible; the iteration-0 exchange is oracle-checked by
query ``bpe_pair_counts``)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_extractor_ray.ops.bpe import (
    MARKER,
    BpeEncoder,
    bpe_pair_counts,
    bpe_train,
    word_frequencies,
)

CORPUS = [
    "the low lower lowest low",
    "new newer newest new new",
    "the newer the lower the wide widest",
    "low low low newer wide wide",
    "",  # empty doc
    None,  # null doc
    "the the the the",
]


def brute_force_bpe(texts, num_merges, min_count=2):
    """Reference trainer: Sennrich et al. (2016) algorithm, naive recount
    every iteration."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            wf[w] += 1
    vocab = {tuple(w) + (MARKER,): c for w, c in wf.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((rank, a, b, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = c
        vocab = new_vocab
    return merges, vocab


def brute_force_encode_len(word, merges):
    ranks = {(a, b): i for i, (_, a, b, _) in enumerate(merges)}
    s = list(word) + [MARKER]
    while len(s) > 1:
        cands = [
            (ranks[(s[i], s[i + 1])], i)
            for i in range(len(s) - 1)
            if (s[i], s[i + 1]) in ranks
        ]
        if not cands:
            break
        _, i = min(cands)
        s[i : i + 2] = [s[i] + s[i + 1]]
    return len(s)


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(CORPUS))), "text": CORPUS})
    ).repartition(5)


class TestBpeTrain:
    def test_merges_match_brute_force(self, corpus_ds):
        got = bpe_train(corpus_ds, num_merges=12, min_count=2)
        want, _ = brute_force_bpe(CORPUS, 12, min_count=2)
        assert list(map(tuple, got.itertuples(index=False))) == want

    def test_early_stop_below_min_count(self, corpus_ds):
        got = bpe_train(corpus_ds, num_merges=500, min_count=2)
        want, _ = brute_force_bpe(CORPUS, 500, min_count=2)
        assert len(got) == len(want) < 500

    def test_deterministic_across_layouts(self, ray_session):
        import ray.data as rd

        a = bpe_train(
            rd.from_arrow(pa.table({"text": CORPUS})).repartition(2), num_merges=8
        )
        b = bpe_train(
            rd.from_arrow(pa.table({"text": CORPUS})).repartition(7), num_merges=8
        )
        pd.testing.assert_frame_equal(a, b)

    def test_word_cap_trains_on_top_types(self, ray_session):
        """Over-cap regime: keep the top word_cap types by (cnt desc, word
        asc) — equal to brute force on the same truncated table."""
        import ray.data as rd
        from collections import Counter

        wf = Counter()
        for t in CORPUS:
            for w in (t or "").lower().split():
                wf[w] += 1
        top = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        truncated = [" ".join([w] * c) for w, c in top]
        got = bpe_train(
            rd.from_arrow(pa.table({"text": CORPUS})).repartition(5),
            num_merges=10,
            word_cap=4,
        )
        want, _ = brute_force_bpe(truncated, 10)
        assert list(map(tuple, got.itertuples(index=False))) == want


class TestBpeEncode:
    def test_apply_counts_match_brute_force(self, corpus_ds):
        merges_df = bpe_train(corpus_ds, num_merges=10)
        merges = list(map(tuple, merges_df.itertuples(index=False)))
        from pdf_extractor_ray.ops.bpe import bpe_apply

        out = bpe_apply(corpus_ds, merges_df, concurrency=2).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        for i, t in enumerate(CORPUS):
            want = sum(
                brute_force_encode_len(w, merges) for w in (t or "").lower().split()
            )
            assert out["n_bpe_tokens"][i] == want

    def test_no_merges_counts_symbols(self):
        enc = BpeEncoder(pd.DataFrame(columns=["left", "right"]))
        batch = pa.table({"text": ["ab c", None]})
        out = enc(batch)
        # "ab"→3 symbols (a, b, marker), "c"→2
        assert out["n_bpe_tokens"].to_pylist() == [5, 0]


class TestWordFrequencies:
    def test_matches_python_counts(self, corpus_ds):
        from collections import Counter

        wf = word_frequencies(corpus_ds).to_pandas()
        want = Counter()
        for t in CORPUS:
            for w in (t or "").lower().split():
                want[w] += 1
        got = dict(zip(wf["word"], wf["cnt"]))
        assert got == dict(want)

    def test_pair_counts_small(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"text": ["aa ab", "aa"]}))
        df = bpe_pair_counts(ds, k=10)
        got = {
            (r.left_sym, r.right_sym): r.cnt for r in df.itertuples(index=False)
        }
        # word types: aa (cnt 2) → (a,a)×2, (a,M)×2; ab (cnt 1) → (a,b), (b,M)
        assert got == {
            ("a", "a"): 2,
            ("a", MARKER): 2,
            ("a", "b"): 1,
            ("b", MARKER): 1,
        }
        assert df["rank"].tolist() == [1, 2, 3, 4]


class TestBpeInvariants:
    def test_encode_reproduces_training_segmentation(self, corpus_ds):
        """Greedy lowest-rank-first encoding reproduces the trainer's final
        segmentation for every training word (the standard BPE invariant)."""
        merges_df = bpe_train(corpus_ds, num_merges=20, min_count=2)
        merges = list(map(tuple, merges_df.itertuples(index=False)))
        _, vocab = brute_force_bpe(CORPUS, 20, min_count=2)
        enc = BpeEncoder(merges_df)
        for syms in vocab:
            word = "".join(syms).rstrip(MARKER)
            assert enc._encode_len(word) == len(syms), word

    def test_encode_never_longer_than_chars(self, corpus_ds):
        merges_df = bpe_train(corpus_ds, num_merges=20)
        enc = BpeEncoder(merges_df)
        for w in ["lowest", "unseen", "zzz", "a", "newerest"]:
            assert 1 <= enc._encode_len(w) <= len(w) + 1

    def test_unicode_words(self, ray_session):
        import ray.data as rd

        docs = ["héllo héllo wörld", "héllo wörld wörld", "héllo ✓ ✓"]
        ds = rd.from_arrow(pa.table({"text": docs}))
        got = bpe_train(ds, num_merges=6, min_count=2)
        want, _ = brute_force_bpe(docs, 6, min_count=2)
        assert list(map(tuple, got.itertuples(index=False))) == want
        df = bpe_pair_counts(ds, k=1000)
        # SQL-side parity for non-ASCII is proven by the oracle query; here
        # just assert the vectorized UTF-32 path counts multibyte pairs.
        got_pairs = {
            (r.left_sym, r.right_sym): r.cnt for r in df.itertuples(index=False)
        }
        assert got_pairs[("h", "é")] == 4  # héllo word type cnt
        assert got_pairs[("✓", MARKER)] == 2  # "✓" occurs twice in doc 2


def test_bpe_train_empty_corpus(ray_session):
    """Whitespace-only / empty corpora return an empty merges table, not an
    Arrow concat crash."""
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": ["   ", "\t", None]}))
    got = bpe_train(ds, num_merges=5)
    assert len(got) == 0
    assert list(got.columns) == ["rank", "left", "right", "pair_count"]
