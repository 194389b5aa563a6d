"""Text-analysis operators for training-data curation.

All are vectorized/stateful ``map_batches`` stages over a documents table
``(doc_id, text, lang, ...)``: language-ID (stopword-hit heuristic),
quality scoring (length/alnum/stopword ratios — the corpus generalization
of the reference's density detectors, reference: problem_detector.py:67-82,
213-228), token counting (whitespace + BPE-ish word/number/punct regex),
and rolling-hash document fingerprints.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Tiny deterministic stopword lists per language (marker words only — this
# is an n-gram/stopword heuristic, not a model).
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the a and of to in is it for on with as at by an be this that".split()),
    "de": frozenset("der die das und ist ein eine zu den von mit für auf im nicht".split()),
    "fr": frozenset("le la les et de des un une du est pour dans que sur pas".split()),
    "es": frozenset("el la los las y de un una es en para con por que no se".split()),
    "he": frozenset("של על עם את זה הוא היא אני לא כי גם או אם אבל".split()),
}

# BPE-ish pre-tokenizer: words (with leading space), numbers, punctuation
# runs — the standard GPT-2-style pre-split shape.
_BPE_RE = re.compile(r"[A-Za-zÀ-ÿ֐-׿]+|\d+|[^\sA-Za-zÀ-ÿ֐-׿\d]+")
_WORD_RE = re.compile(r"\S+")


class LangIdScorer:
    """Actor-pool callable: predict language by stopword-hit ratio argmax;
    falls back to script detection (Hebrew block) then 'und'."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = sorted(STOPWORDS)
        self.hebrew = re.compile(r"[֐-׿]")

    def predict_one(self, text: str) -> str:
        tokens = (text or "").lower().split()
        if not tokens:
            return "und"
        best_lang, best_hits = "und", 0
        for lang in self.langs:
            hits = sum(1 for t in tokens if t in STOPWORDS[lang])
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        if best_hits == 0:
            if self.hebrew.search(text):
                return "he"
            return "und"
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict_one(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("pred_lang", pa.array(preds, pa.string()))


def split_words(texts) -> pa.ListArray:
    """THE corpus tokenization (RE2 ``\\s+`` split over lowercased text),
    single-sourced: word_topk / tfidf / lm scoring, the BPE trainer and
    the inverted index all call this, and every SQL oracle mirrors it as
    ``regexp_extract_all(lower(text), '\\S+')``. Returns a list array that
    may contain empty strings at document edges — callers filter ``""``.
    Null texts must be filled upstream (``pc.fill_null(col, "")``)."""
    words_list = pc.split_pattern_regex(pc.utf8_lower(texts), pattern=r"\s+")
    if isinstance(words_list, pa.ChunkedArray):
        words_list = words_list.combine_chunks()
    return words_list


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality features per document: char count, token count, alnum count,
    alnum ratio, mean token length, stopword ratio (en)."""
    texts = batch[text_col].to_pylist()
    n_chars = np.empty(len(texts), dtype=np.int64)
    n_tokens = np.empty(len(texts), dtype=np.int64)
    n_alnum = np.empty(len(texts), dtype=np.int64)
    stop_ratio = np.empty(len(texts), dtype=np.float64)
    from ..functions.problems import count_alnum

    en_stop = STOPWORDS["en"]
    for i, raw in enumerate(texts):
        text = raw or ""
        toks = text.split()
        n_chars[i] = len(text)
        n_tokens[i] = len(toks)
        n_alnum[i] = count_alnum(text)
        stop_ratio[i] = (
            sum(1 for t in toks if t.lower() in en_stop) / len(toks) if toks else 0.0
        )
    alnum_ratio = np.where(n_chars > 0, n_alnum / np.maximum(n_chars, 1), 0.0)
    mean_tok_len = np.where(n_tokens > 0, n_alnum / np.maximum(n_tokens, 1), 0.0)
    return (
        batch.append_column("n_chars_q", pa.array(n_chars, pa.int64()))
        .append_column("n_tokens", pa.array(n_tokens, pa.int64()))
        .append_column("n_alnum", pa.array(n_alnum, pa.int64()))
        .append_column("alnum_ratio", pa.array(alnum_ratio, pa.float64()))
        .append_column("mean_token_len", pa.array(mean_tok_len, pa.float64()))
        .append_column("stopword_ratio", pa.array(stop_ratio, pa.float64()))
    )


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Token counts: whitespace tokens and BPE-ish pre-tokens."""
    texts = batch[text_col].to_pylist()
    ws = [len(_WORD_RE.findall(t or "")) for t in texts]
    bpe = [len(_BPE_RE.findall(t or "")) for t in texts]
    return batch.append_column(
        "ws_tokens", pa.array(ws, pa.int64())
    ).append_column("bpe_tokens", pa.array(bpe, pa.int64()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit polynomial rolling-hash fingerprint over the alnum-normalized
    text (deterministic, content-derived — usable as an exact-dup key that
    ignores formatting, like the reference's normalize-then-compare,
    reference: content_normalizer.py:14-28)."""
    texts = batch[text_col].to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    base = np.uint64(1099511628211)
    for i, raw in enumerate(texts):
        norm = "".join(ch.lower() for ch in (raw or "") if ch.isalnum())
        h = np.uint64(14695981039346656037)
        for ch in norm.encode():
            h = np.uint64((int(h) * int(base)) & 0xFFFFFFFFFFFFFFFF) ^ np.uint64(ch)
        out[i] = h
    # Signed view: uint64 values above int64-max trip Arrow/pandas
    # conversions downstream (e.g. Dataset.unique) — the bit pattern is
    # what matters, so expose it as int64.
    return batch.append_column("fingerprint", pa.array(out.view(np.int64), pa.int64()))


_LANGID_CACHE: dict[str, LangIdScorer] = {}


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stateless-task form of :class:`LangIdScorer` with per-worker warm
    state (same pattern as stages/extract.py)."""
    scorer = _LANGID_CACHE.get(text_col)
    if scorer is None:
        scorer = LangIdScorer(text_col)
        _LANGID_CACHE[text_col] = scorer
    return scorer(batch)


def lang_distribution(ds, text_col: str = "text"):
    """Predicted-language histogram via warm-task scoring + tiny groupby."""
    import functools

    from ray.data.aggregate import Count

    scored = ds.map_batches(
        functools.partial(langid_batch, text_col=text_col),
        batch_format="pyarrow",
    )
    return scored.groupby("pred_lang").aggregate(Count(alias_name="n_docs"))


# ---------------------------------------------------------------------------
# Benchmark decontamination (test-set n-gram overlap removal)
# ---------------------------------------------------------------------------

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def _fnv1a(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def word_ngram_hashes(text: str, n: int = 8) -> set[int]:
    """FNV-1a hashes of the lowercased word n-grams of ``text`` (the
    standard decontamination unit: a 64-bit hash per n-gram keeps the
    benchmark set broadcastable; collisions are 2^-64-rare and only ever
    drop an extra document, never keep a contaminated one)."""
    tokens = (text or "").lower().split()
    if len(tokens) < n:
        return set()
    return {
        _fnv1a(" ".join(tokens[i : i + n]).encode())
        for i in range(len(tokens) - n + 1)
    }


def _bloom_build(hashes, m_bits: int, k: int = 4) -> np.ndarray:
    """Bitmap Bloom filter over 64-bit gram hashes (double hashing:
    pos_i = (h + i*(h>>32)) mod m, m a power of two)."""
    bits = np.zeros(m_bits, dtype=bool)
    arr = np.fromiter(hashes, dtype=np.uint64)
    if len(arr) == 0:
        return bits
    h2 = arr >> np.uint64(32)
    mask = np.uint64(m_bits - 1)
    for i in range(k):
        bits[((arr + np.uint64(i) * h2) & mask).astype(np.int64)] = True
    return bits


def _bloom_any_hit(bits: np.ndarray, arr: np.ndarray, k: int = 4) -> bool:
    if len(arr) == 0:
        return False
    h2 = arr >> np.uint64(32)
    mask = np.uint64(len(bits) - 1)
    hit = np.ones(len(arr), dtype=bool)
    for i in range(k):
        hit &= bits[((arr + np.uint64(i) * h2) & mask).astype(np.int64)]
        if not hit.any():
            return False
    return bool(hit.any())


def decontaminate(ds, benchmark_texts: list[str], n: int = 8,
                  text_col: str = "text", bloom_bits: int | None = None):
    """Drop every document sharing ANY word ``n``-gram with the benchmark
    set — the train/test decontamination pass of an LLM data pipeline
    (the n-gram-overlap rule popularized by the GPT-3/PaLM dataset reports).

    The benchmark's n-gram hash set is built once on the driver (benchmarks
    are small — test sets, not corpora), ``ray.put`` ONCE, and every batch
    filters with a vectorized ``np.isin`` against it; the corpus streams
    through a single ``map_batches`` with no shuffle.

    ``bloom_bits`` (a power of two) switches the broadcast to a fixed-size
    Bloom BITMAP — the scale path for benchmark sets beyond exact-set
    broadcast reach. Bloom false positives only drop EXTRA documents,
    which is the safe direction for decontamination (never keeps a
    contaminated one); the dropped set is a superset of the exact mode's.
    """
    import ray

    bench: set[int] = set()
    for t in benchmark_texts:
        bench.update(word_ngram_hashes(t, n))
    if bloom_bits is not None:
        assert bloom_bits & (bloom_bits - 1) == 0, "bloom_bits must be a power of 2"
        ref = ray.put(_bloom_build(bench, bloom_bits))
    else:
        ref = ray.put(np.array(sorted(bench), dtype=np.uint64))

    def keep_clean(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        texts = batch[text_col].to_pylist()
        keep = []
        for t in texts:
            doc_grams = word_ngram_hashes(t, n)
            if not doc_grams:
                keep.append(True)
                continue
            arr = np.fromiter(doc_grams, dtype=np.uint64, count=len(doc_grams))
            if bloom_bits is not None:
                keep.append(not _bloom_any_hit(grams, arr))
            else:
                keep.append(not np.isin(arr, grams, assume_unique=True).any())
        return batch.filter(pa.array(keep))

    return ds.map_batches(keep_clean, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII scrubbing (redaction pass of a training-data pipeline)
# ---------------------------------------------------------------------------

# Simple leftmost-greedy patterns chosen for exact Python-re / RE2 parity
# (no backtracking-dependent constructs) so the SQL oracle can replicate
# the redaction byte-for-byte.
_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_LONG_ID_RE = re.compile(r"\b\d{9,}\b")


def scrub_pii(text: str) -> str:
    """Redact emails and long digit identifiers with typed placeholders —
    the standard pre-training scrub pass."""
    text = _EMAIL_RE.sub("<EMAIL>", text or "")
    return _LONG_ID_RE.sub("<ID>", text)


def scrub_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized-enough scrub stage (compiled module-level regexes; one C
    call per pattern per doc): ``text`` column replaced in place."""
    scrubbed = [scrub_pii(t) for t in batch[text_col].to_pylist()]
    idx = batch.schema.get_field_index(text_col)
    return batch.set_column(idx, text_col, pa.array(scrubbed, pa.string()))


# ---------------------------------------------------------------------------
# C4-style line cleaning (Raffel et al. 2020, §2.2)
# ---------------------------------------------------------------------------


def c4_clean_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """C4's published line/document cleaning rules (the subset that is
    deterministic and list-free — no external badword list):

    line level (a line is retained iff ALL hold):
      - ends in a terminal punctuation mark (``.`` ``!`` ``?`` ``\"``)
      - has at least 5 words (``\\S+`` runs)
      - does not contain ``javascript`` (case-insensitive)

    document level (``kept`` iff ALL hold):
      - at least 3 retained lines (C4's three-sentence floor)
      - does not contain ``lorem ipsum`` (case-insensitive)
      - does not contain ``{`` (code page heuristic)

    Emits ``total_lines`` / ``kept_lines`` (int64), ``kept`` (bool) and
    ``cleaned_text`` (retained lines joined with ``\\n`` when kept, else
    ``""``). Line predicates run as Arrow kernels over the FLAT line
    array of the whole batch (one regex pass per rule, no per-line
    Python); only the final per-doc join loops over documents.
    """
    texts = pc.fill_null(batch[text_col], "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lines_list = pc.split_pattern(texts, pattern="\n")
    if isinstance(lines_list, pa.ChunkedArray):
        lines_list = lines_list.combine_chunks()
    flat = lines_list.flatten()
    offsets = lines_list.offsets.to_numpy().astype(np.int64)

    ends_punct = pc.match_substring_regex(flat, '[.!?"]$')
    word_ok = pc.greater_equal(pc.count_substring_regex(flat, r"\S+"), 5)
    no_js = pc.invert(pc.match_substring(pc.utf8_lower(flat), "javascript"))
    keep = pc.and_(pc.and_(ends_punct, word_ok), no_js).to_numpy(
        zero_copy_only=False
    )

    cum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
    kept_counts = cum[offsets[1:]] - cum[offsets[:-1]]
    total_lines = np.diff(offsets)

    lower_docs = pc.utf8_lower(texts)
    clean_doc = pc.and_(
        pc.invert(pc.match_substring(lower_docs, "lorem ipsum")),
        pc.invert(pc.match_substring(texts, "{")),
    ).to_numpy(zero_copy_only=False)
    kept_flag = (kept_counts >= 3) & clean_doc

    flat_py = flat.to_pylist()
    cleaned = []
    for i in range(len(batch)):
        if not kept_flag[i]:
            cleaned.append("")
            continue
        lo, hi = offsets[i], offsets[i + 1]
        cleaned.append(
            "\n".join(flat_py[j] for j in range(lo, hi) if keep[j])
        )
    return (
        batch.append_column("total_lines", pa.array(total_lines, pa.int64()))
        .append_column("kept_lines", pa.array(kept_counts, pa.int64()))
        .append_column("kept", pa.array(kept_flag))
        .append_column("cleaned_text", pa.array(cleaned, pa.string()))
    )


# ---------------------------------------------------------------------------
# Gopher/MassiveText document-level quality rules (Rae et al. 2021, App. A)
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _seg_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment sums of a flat value array under list offsets."""
    cum = np.concatenate([[0], np.cumsum(values.astype(np.int64))])
    return cum[offsets[1:]] - cum[offsets[:-1]]


def gopher_rules_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher's published document-level quality rules, computed with
    exact INTEGER threshold comparisons (no float ratios — ``10·symbols ≤
    words`` instead of ``symbols/words ≤ 0.1``) so the pass flag is
    bit-identical across engines:

    - word count in [50, 100 000]
    - mean word length in [3, 10] chars (``3·n ≤ chars ≤ 10·n``)
    - symbol-to-word ratio ≤ 0.1 (symbols: ``#``, ``...``, ``…``)
    - ≤ 90% of lines start with a bullet (``•``, ``- ``, ``* ``)
    - ≤ 30% of lines end with an ellipsis (``...`` or ``…``)
    - ≥ 80% of words contain an ASCII letter
    - ≥ 2 distinct Gopher stop words present (the/be/to/of/and/that/
      have/with, lowercased exact token match)

    All word/line predicates are Arrow RE2 kernels over the batch's flat
    word/line arrays; per-document reductions are cumsum segment sums.
    Emits the raw counters plus ``passes`` (bool).
    """
    texts = pc.fill_null(batch[text_col], "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()

    words_list = pc.split_pattern_regex(texts, pattern=r"\s+")
    if isinstance(words_list, pa.ChunkedArray):
        words_list = words_list.combine_chunks()
    fw = words_list.flatten()
    wo = words_list.offsets.to_numpy().astype(np.int64)
    nonempty = pc.not_equal(fw, "").to_numpy(zero_copy_only=False)
    n_words = _seg_sum(nonempty, wo)
    word_chars = _seg_sum(
        pc.utf8_length(fw).to_numpy(zero_copy_only=False), wo
    )
    alpha = pc.match_substring_regex(fw, "[A-Za-z]").to_numpy(
        zero_copy_only=False
    )
    alpha_words = _seg_sum(nonempty & alpha, wo)
    lw = pc.utf8_lower(fw)
    stop_hits = np.zeros(len(batch), np.int64)
    for sw in _GOPHER_STOPWORDS:
        eq = pc.equal(lw, sw).to_numpy(zero_copy_only=False)
        stop_hits += (_seg_sum(eq, wo) > 0).astype(np.int64)

    n_symbols = (
        pc.count_substring(texts, "#").to_numpy(zero_copy_only=False)
        + pc.count_substring_regex(texts, r"\.\.\.").to_numpy(
            zero_copy_only=False
        )
        + pc.count_substring(texts, "…").to_numpy(zero_copy_only=False)
    ).astype(np.int64)

    lines_list = pc.split_pattern(texts, pattern="\n")
    if isinstance(lines_list, pa.ChunkedArray):
        lines_list = lines_list.combine_chunks()
    fl = lines_list.flatten()
    lo = lines_list.offsets.to_numpy().astype(np.int64)
    n_lines = np.diff(lo)
    bullet = pc.match_substring_regex(fl, r"^(•|- |\* )").to_numpy(
        zero_copy_only=False
    )
    bullet_lines = _seg_sum(bullet, lo)
    ell = pc.match_substring_regex(fl, r"(\.\.\.|…)$").to_numpy(
        zero_copy_only=False
    )
    ellipsis_lines = _seg_sum(ell, lo)

    passes = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (3 * n_words <= word_chars)
        & (word_chars <= 10 * n_words)
        & (10 * n_symbols <= n_words)
        & (10 * bullet_lines <= 9 * n_lines)
        & (10 * ellipsis_lines <= 3 * n_lines)
        & (5 * alpha_words >= 4 * n_words)
        & (stop_hits >= 2)
    )
    cols = {
        "n_words": n_words,
        "word_chars": word_chars,
        "n_symbols": n_symbols,
        "n_lines": n_lines,
        "bullet_lines": bullet_lines,
        "ellipsis_lines": ellipsis_lines,
        "alpha_words": alpha_words,
        "stop_hits": stop_hits,
    }
    out = batch
    for name, arr in cols.items():
        out = out.append_column(name, pa.array(arr, pa.int64()))
    return out.append_column("passes", pa.array(passes))


# ---------------------------------------------------------------------------
# Repetition quality (Gopher-style top-n-gram fraction)
# ---------------------------------------------------------------------------


def repetition_stats(text: str) -> tuple[int, int]:
    """(count of the most frequent word bigram, total bigram count) — the
    Gopher/MassiveText "top-2-gram fraction" repetition signal computed in
    exact integers (so the quality threshold compares integer products,
    never floats, across engines)."""
    tokens = (text or "").lower().split()
    if len(tokens) < 2:
        return 0, 0
    counts: dict[tuple[str, str], int] = {}
    best = 0
    for pair in zip(tokens, tokens[1:]):
        c = counts.get(pair, 0) + 1
        counts[pair] = c
        if c > best:
            best = c
    return best, len(tokens) - 1


def repetition_batch(batch: pa.Table, text_col: str = "text",
                     threshold_pct: int = 18) -> pa.Table:
    """Per-doc repetition columns: ``top_bigram_count``, ``n_bigrams``, and
    ``repetitive`` (top fraction > threshold_pct% — integer comparison
    ``count*100 > total*threshold``)."""
    tops, totals = [], []
    for t in batch[text_col].to_pylist():
        top, total = repetition_stats(t)
        tops.append(top)
        totals.append(total)
    flags = [
        (top * 100 > total * threshold_pct) if total else False
        for top, total in zip(tops, totals)
    ]
    return (
        batch.append_column("top_bigram_count", pa.array(tops, pa.int64()))
        .append_column("n_bigrams", pa.array(totals, pa.int64()))
        .append_column("repetitive", pa.array(flags))
    )


# ---------------------------------------------------------------------------
# Paragraph-level boilerplate dedup (CCNet/RefinedWeb-style)
# ---------------------------------------------------------------------------


def _para_hashes(text: str, sep: str = "\n\n") -> tuple[list[str], np.ndarray]:
    """Paragraphs and their 64-bit FNV-1a hashes (uint64, one per para)."""
    paras = (text or "").split(sep)
    hs = np.fromiter(
        (_fnv1a(p.encode("utf-8", "ignore")) for p in paras),
        dtype=np.uint64,
        count=len(paras),
    )
    return paras, hs


def paragraph_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n\n",
):
    """Cross-document paragraph (boilerplate) removal: a paragraph that
    occurs in ≥ ``min_docs`` DISTINCT documents is dropped from every
    document (nav bars, cookie banners, footers — the CCNet/RefinedWeb
    paragraph-dedup step).

    Scale shape: pass 1 emits per-doc-unique ``(phash, id)`` 16-byte rows;
    the distinct-document count per paragraph is EXACT via one sort on
    ``(phash, id)`` + vectorized segment counting (``ops.segments`` — no
    per-group Python, and cross-block duplicate rows cannot inflate the
    count the way a naive groupby-Count would). The common-paragraph hash
    set — sized by the repeated-boilerplate population, not the corpus —
    is broadcast once via ``ray.put``; the corpus then streams through one
    rebuild pass (``np.isin`` per doc). At boilerplate sets beyond
    broadcast reach, swap the set for the state-layer Bloom index (false
    positives would drop extra paragraphs — gate with an exact recheck,
    same direction as exact_dedup_large's note).
    """
    import ray

    from .segments import sorted_segment_apply

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        out_h: list[np.ndarray] = []
        take_idx: list[int] = []
        for i, t in enumerate(batch[text_col].to_pylist()):
            _, hs = _para_hashes(t, sep)
            hs = np.unique(hs)  # per-doc distinct
            out_h.append(hs)
            take_idx.extend([i] * len(hs))
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_h) if out_h else np.zeros(0, np.uint64)),
                ids.take(pa.array(take_idx, pa.int64())),
            ],
            names=["phash", id_col],
        )

    def common_block(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        # rows are per-doc-unique, so distinct-doc count per phash segment
        # is just the segment length.
        lens = ends - starts
        keep = lens >= min_docs
        hashes = batch["phash"].to_numpy()
        return pa.Table.from_arrays(
            [pa.array(hashes[starts[keep]])], names=["phash"]
        )

    common_chunks = [
        b["phash"].combine_chunks()
        for b in sorted_segment_apply(
            ds.map_batches(explode, batch_format="pyarrow"),
            key_col="phash",
            block_fn=common_block,
            within_cols=[id_col],
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    common = (
        np.unique(pa.concat_arrays(common_chunks).to_numpy())
        if common_chunks
        else np.zeros(0, np.uint64)
    )
    common_ref = ray.put(common)

    def rebuild(batch: pa.Table) -> pa.Table:
        bad = ray.get(common_ref)
        texts = []
        for t in batch[text_col].to_pylist():
            paras, hs = _para_hashes(t, sep)
            mask = ~np.isin(hs, bad)
            texts.append(sep.join(p for p, m in zip(paras, mask) if m))
        idx = batch.schema.get_field_index(text_col)
        return batch.set_column(idx, text_col, pa.array(texts, pa.string()))

    return ds.map_batches(rebuild, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Deterministic (stratified) hash sampling
# ---------------------------------------------------------------------------

_SM_C0 = np.uint64(0x9E3779B97F4A7C15)
_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)


def splitmix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants) —
    deterministic, seed-free, and expressible in ANSI SQL (HUGEINT modular
    arithmetic + xor/shift), so sampling decisions are oracle-checkable."""
    x = np.asarray(x, dtype=np.uint64) + _SM_C0
    x = (x ^ (x >> np.uint64(30))) * _SM_C1
    x = (x ^ (x >> np.uint64(27))) * _SM_C2
    return x ^ (x >> np.uint64(31))


def hash_sample(
    ds,
    rates: float | dict,
    id_col: str = "doc_id",
    key_col: str | None = None,
    salt: int = 0,
):
    """Deterministic stratified sampling, shuffle-free.

    A row is kept iff ``splitmix64(id + salt) < rate * 2^64`` where
    ``rate`` is either a global float or, with ``key_col``, looked up per
    stratum from the ``rates`` dict (``rates.get(key, rates[None])``).
    Per-row and streaming: no shuffle, no driver state, identical result
    at every parallelism level — the sampling analogue of the reference's
    seeded every-Nth validation sampling (validation_orchestrator.py), and
    the quota knob a training-data mixture pipeline needs (per-language /
    per-source rates). Dyadic rates (k/2^n) compare EXACTLY in both
    engines; the SQL oracle replicates the mix bit-for-bit.
    """
    if isinstance(rates, dict):
        thresholds = {
            k: int(v * (1 << 64)) for k, v in rates.items() if k is not None
        }
        default_thr = int(rates.get(None, 0.0) * (1 << 64))
    else:
        thresholds = {}
        default_thr = int(float(rates) * (1 << 64))

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        hv = splitmix64_np(ids + np.uint64(salt))
        if key_col is None:
            thr = np.uint64(min(default_thr, (1 << 64) - 1))
            mask = hv < thr
        else:
            keys = batch[key_col].to_pylist()
            thr = np.fromiter(
                (
                    min(thresholds.get(k, default_thr), (1 << 64) - 1)
                    for k in keys
                ),
                dtype=np.uint64,
                count=len(keys),
            )
            mask = hv < thr
        return batch.filter(pa.array(mask))

    return ds.map_batches(sample, batch_format="pyarrow")


def word_topk(ds, k: int = 10, text_col: str = "text", group_col: str = "lang"):
    """Exact corpus heavy hitters: the ``k`` most frequent words per group
    (tiebreak: word ascending), as a Dataset of
    ``(group, word, cnt, rank)`` rows.

    Words are the classic skewed shuffle key, so nothing row-level ever
    enters an exchange: per-BLOCK vectorized word counts (RE2 ``\\s+``
    split → flatten → ``np.unique`` over group⊕word pairs) pre-combine
    before one ``groupby(group, word)`` sum over vocabulary-sized rows;
    the final top-k is a per-block partial top-k (exact once counts are
    global) merged on the driver from ``blocks × groups × k`` rows.
    Assumes bounded group cardinality (languages, sources — document if
    used otherwise); vocabulary cardinality may be corpus-scale."""
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        # Null groups are excluded (SQL GROUP BY would keep a NULL group;
        # callers wanting that should fill first); null texts count as
        # empty documents.
        batch = batch.filter(pc.is_valid(batch[group_col]))
        texts = pc.fill_null(batch[text_col], "")
        words_list = split_words(texts)
        words = words_list.flatten()
        reps = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
        groups = np.repeat(
            np.asarray(
                [str(g) for g in batch[group_col].to_pylist()], dtype=object
            ),
            reps,
        )
        w = words.to_numpy(zero_copy_only=False)
        keep = w != ""
        w, groups = w[keep], groups[keep]
        out_g, out_w, out_c = [], [], []
        for gval in np.unique(groups.astype(str)):  # bounded cardinality
            u, c = np.unique(w[groups == gval].astype(str), return_counts=True)
            out_g.append(np.full(len(u), gval, dtype=object))
            out_w.append(u.astype(object))
            out_c.append(c)
        empty = np.array([], dtype=object)
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_g) if out_g else empty, pa.string()),
                pa.array(np.concatenate(out_w) if out_w else empty, pa.string()),
                pa.array(
                    np.concatenate(out_c) if out_c else np.array([], np.int64),
                    pa.int64(),
                ),
            ],
            names=[group_col, "word", "cnt"],
        )

    totals = (
        ds.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
        .groupby([group_col, "word"])
        .aggregate(Sum("cnt"))
    )

    def topk_partial(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch[group_col].to_pylist(), dtype=object)
        w = np.asarray(batch["word"].to_pylist(), dtype=object)
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        # Per group: order by (cnt desc, word asc), keep first k.
        order = np.lexsort((w, -c, g))
        gs = g[order]
        starts = np.r_[0, 1 + np.flatnonzero(gs[1:] != gs[:-1])]
        pos = np.arange(len(gs)) - np.repeat(starts, np.diff(np.r_[starts, len(gs)]))
        keep = order[pos < k]
        return pa.Table.from_arrays(
            [
                pa.array(g[keep].astype(str), pa.string()),
                pa.array(w[keep].astype(str), pa.string()),
                pa.array(c[keep], pa.int64()),
            ],
            names=[group_col, "word", "cnt"],
        )

    partials = totals.map_batches(
        topk_partial, batch_format="pyarrow", batch_size=None
    ).take_all()  # ≤ blocks × groups × k tiny rows

    best: dict[str, list[tuple[int, str]]] = {}
    for r in partials:
        best.setdefault(r[group_col], []).append((-r["cnt"], r["word"]))
    out_g, out_w, out_c, out_r = [], [], [], []
    for grp in sorted(best):
        for rank, (negc, word) in enumerate(sorted(set(best[grp]))[:k], 1):
            out_g.append(grp)
            out_w.append(word)
            out_c.append(-negc)
            out_r.append(rank)
    import pandas as pd

    return pd.DataFrame(
        {group_col: out_g, "word": out_w, "cnt": out_c, "rank": out_r}
    ).astype({"cnt": "int64", "rank": "int32"})


def tfidf_top_terms(
    ds,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int = 5_000_000,
):
    """Per-document most-distinctive terms, TF-IDF-shaped but INTEGER-
    exact so the SQL oracle matches bit-for-bit: for each (doc, term),
    ``score = tf * n_docs // df`` (tf = in-doc occurrences, df =
    distinct docs containing the term). Returns a Dataset of
    ``(id, term, score, rank)`` rows, top ``k`` per doc by
    (score desc, term asc).

    Shape: one pass emits per-block (term, distinct-doc-count) partials
    (pre-combined: a doc's terms are uniqued per doc before counting) →
    ``groupby(term)`` over vocabulary-sized rows; the df table is
    broadcast as a pair of SORTED numpy arrays (searchsorted lookup —
    arrays deserialize zero-copy-ish from the object store, unlike a
    dict which would re-unpickle per task) under ``df_cap`` (the
    vocabulary bound — real web vocabularies at 100 TB exceed it, where
    the regime switches to :func:`_tfidf_semijoin`: (doc, term, tf) rows
    attach df via the sorted-lookup join on term, the same key as the
    groupby, and top-k resolves in one per-doc rank sort — identical
    output, zero driver-side vocabulary). The under-cap scoring pass is
    per-row, shuffle-free.

    Tokenization is RE2 ``\\s+`` split on BOTH the engine and oracle
    sides (pyarrow uses RE2 too) — same contract as :func:`word_topk`;
    Python ``str.split`` would diverge on Unicode whitespace."""
    import ray
    from ray.data.aggregate import Sum

    def doc_tokens(batch: pa.Table) -> list[list[str]]:
        words_list = split_words(pc.fill_null(batch[text_col], ""))
        return [
            [w for w in doc if w] if doc else []
            for doc in words_list.to_pylist()
        ]

    def df_partial(batch: pa.Table) -> pa.Table:
        all_terms: dict[str, int] = {}
        for toks in doc_tokens(batch):
            for term in set(toks):
                all_terms[term] = all_terms.get(term, 0) + 1
        return pa.Table.from_arrays(
            [
                pa.array(list(all_terms.keys()), pa.string()),
                pa.array(list(all_terms.values()), pa.int64()),
            ],
            names=["term", "df"],
        )

    n_docs_i = int(ds.count())  # parquet inputs resolve this from metadata

    df_agg = (
        ds.map_batches(df_partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .aggregate(Sum("df"))
        .materialize()
    )
    n_terms = int(df_agg.count())
    if n_terms > df_cap:
        # Over-cap regime: NOTHING vocabulary-sized lands on the driver.
        # (doc, term, tf) rows attach df via the sorted-lookup join on
        # term (the SAME key as the df groupby), score per row, then one
        # (doc, score desc, term) rank sort picks top-k per doc — the
        # lm_bigram_score over-cap shape.
        return _tfidf_semijoin(ds, df_agg, k, id_col, n_docs_i, doc_tokens)
    df_tables = list(df_agg.iter_batches(batch_format="pyarrow"))
    terms_all, dfs_all = [], []
    for t in df_tables:
        terms_all.extend(t["term"].to_pylist())
        dfs_all.extend(t["sum(df)"].to_pylist())
    order = np.argsort(np.asarray(terms_all, dtype=object))
    terms_sorted = np.asarray(terms_all, dtype=object)[order]
    dfs_sorted = np.asarray(dfs_all, dtype=np.int64)[order]
    df_ref = ray.put((terms_sorted, dfs_sorted))

    def score(batch: pa.Table) -> pa.Table:
        vocab, dfs = ray.get(df_ref)
        ids, terms, scores, ranks = [], [], [], []
        id_arr = batch[id_col].to_pylist()
        for i, toks in zip(id_arr, doc_tokens(batch)):
            if not toks:
                continue
            tf: dict[str, int] = {}
            for tok in toks:
                tf[tok] = tf.get(tok, 0) + 1
            uterms = list(tf.keys())
            idx = np.searchsorted(vocab, np.asarray(uterms, dtype=object))
            scored = sorted(
                (-(tf[term] * n_docs_i // int(dfs[j])), term)
                for term, j in zip(uterms, idx)
            )[:k]
            for r, (negs, term) in enumerate(scored, 1):
                ids.append(i)
                terms.append(term)
                scores.append(-negs)
                ranks.append(r)
        return pa.Table.from_arrays(
            [
                pa.array(ids, batch[id_col].type),
                pa.array(terms, pa.string()),
                pa.array(scores, pa.int64()),
                pa.array(ranks, pa.int32()),
            ],
            names=[id_col, "term", "score", "rank"],
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _tfidf_semijoin(ds, df_agg, k, id_col, n_docs_i, doc_tokens):
    """The over-``df_cap`` TF-IDF regime: (doc, term, tf) rows join the
    (term, df) table with :func:`..segments.attach_lookup` (one sort on
    term, the groupby's own key), per-row integer scoring, and top-k per
    doc via :func:`..segments.rank_per_key` — identical output (values,
    ties, schema) to the broadcast path, zero driver-side vocabulary."""
    from .segments import attach_lookup, rank_per_key

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids: list = []
        terms: list[str] = []
        tfs: list[int] = []
        for i, toks in zip(batch[id_col].to_pylist(), doc_tokens(batch)):
            tf: dict[str, int] = {}
            for tok in toks:
                tf[tok] = tf.get(tok, 0) + 1
            ids.extend([i] * len(tf))
            terms.extend(tf.keys())
            tfs.extend(tf.values())
        return pa.Table.from_arrays(
            [
                pa.array(ids, id_type),
                pa.array(terms, pa.string()),
                pa.array(tfs, pa.int64()),
            ],
            names=[id_col, "term", "tf"],
        )

    df_tbl = df_agg.map_batches(
        lambda b: b.rename_columns(["term", "df"]), batch_format="pyarrow"
    )
    attached = attach_lookup(
        ds.map_batches(tf_rows, batch_format="pyarrow"),
        df_tbl,
        key_col="term",
        val_cols=["df"],
        carry_cols=[id_col, "tf"],
    )

    def score_rows(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = tf * n_docs_i // np.maximum(df, 1)
        return pa.Table.from_arrays(
            [batch[id_col], batch["term"], pa.array(score)],
            names=[id_col, "term", "score"],
        )

    ranked = rank_per_key(
        attached.map_batches(score_rows, batch_format="pyarrow"),
        key_col=id_col,
        within_cols=["score", "term"],
        carry_cols=["term", "score"],
        descending=[True, False],
    )

    def top_k(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.less_equal(batch["rank"], pa.scalar(k)))
        return pa.Table.from_arrays(
            [
                kept[id_col],
                kept["term"],
                kept["score"],
                kept["rank"].cast(pa.int32()),
            ],
            names=[id_col, "term", "score", "rank"],
        )

    return ranked.map_batches(top_k, batch_format="pyarrow")


def lm_bigram_score(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
    model_cap: int = 5_000_000,
):
    """CCNet-style LM quality scoring (Wenzek et al. 2020 score documents
    with a language-model; with no external model available, the LM here
    is a bigram MLE trained ON THE CORPUS ITSELF) — INTEGER-exact so the
    SQL oracle matches bit-for-bit.

    Model: ``C(w1,w2)`` = corpus count of the token bigram, ``C(w1,·)`` =
    count of bigrams with first token ``w1``. Document score =
    ``sum over consecutive token pairs of C(w1,w2) * scale // C(w1,·)``
    (higher = the document's word transitions are more typical of the
    corpus — the boilerplate/outlier signal CCNet buckets on). Returns a
    Dataset of ``(id, n_bigrams, lm_score)`` with one row per input doc
    (docs with <2 tokens score 0). Tokenization is the engine-wide RE2
    ``\\s+``-split contract (see :func:`tfidf_top_terms`).

    Shape: one pass emits per-block bigram-count partials →
    ``groupby(w1, w2)`` over model-sized rows (vocabulary², but web
    bigram tables are ~linear in corpus vocabulary). Under ``model_cap``
    rows the model broadcasts once (``ray.put``) and scoring is per-row
    and shuffle-free. Past the cap NOTHING model-sized lands on the
    driver: doc bigram rows join the count table via
    :func:`..segments.attach_lookup` on a LENGTH-PREFIXED binary pair
    key (collision-free encoding) and per-doc sums fold in one
    ``groupby(id)`` — the same exchange shape as the dedup verify
    semi-join (round 4)."""
    import ray
    from ray.data.aggregate import Sum

    def doc_tokens(batch: pa.Table) -> list[list[str]]:
        words_list = split_words(pc.fill_null(batch[text_col], ""))
        return [
            [w for w in doc if w] if doc else []
            for doc in words_list.to_pylist()
        ]

    def bigram_partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for toks in doc_tokens(batch):
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        return pa.Table.from_arrays(
            [
                pa.array([k[0] for k in counts], pa.string()),
                pa.array([k[1] for k in counts], pa.string()),
                pa.array(list(counts.values()), pa.int64()),
            ],
            names=["w1", "w2", "c"],
        )

    model = (
        ds.map_batches(bigram_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    n_model = model.count()

    if n_model <= model_cap:
        bc: dict[tuple[str, str], int] = {}
        uc: dict[str, int] = {}
        for t in model.iter_batches(batch_format="pyarrow"):
            for a, b, c in zip(
                t["w1"].to_pylist(), t["w2"].to_pylist(), t["c"].to_pylist()
            ):
                bc[(a, b)] = c
                uc[a] = uc.get(a, 0) + c
        mref = ray.put((bc, uc))

        def score(batch: pa.Table) -> pa.Table:
            bcm, ucm = ray.get(mref)
            ids = batch[id_col]
            nb, s = [], []
            for toks in doc_tokens(batch):
                total = 0
                for a, b in zip(toks, toks[1:]):
                    total += bcm[(a, b)] * scale // ucm[a]
                nb.append(max(0, len(toks) - 1))
                s.append(total)
            return pa.Table.from_arrays(
                [
                    ids.combine_chunks(),
                    pa.array(nb, pa.int64()),
                    pa.array(s, pa.int64()),
                ],
                names=[id_col, "n_bigrams", "lm_score"],
            )

        return ds.map_batches(score, batch_format="pyarrow")

    return _lm_score_semijoin(ds, model, doc_tokens, id_col, scale)


def _pair_key(a: str, b: str) -> bytes:
    """Collision-free binary encoding of a token pair (length-prefixed —
    a separator byte could legally appear inside a ``\\S+`` token)."""
    ab = a.encode()
    return len(ab).to_bytes(4, "big") + ab + b.encode()


def _lm_score_semijoin(ds, model, doc_tokens, id_col: str, scale: int):
    """Over-``model_cap`` regime of :func:`lm_bigram_score`: identical
    output, no driver-resident model. Doc bigram rows attach the bigram
    count (pair-key lookup) and the prefix count (w1 lookup); per-row
    integer partial scores fold in one ``groupby(id)``; zero-bigram docs
    ride as zero rows through the same exchange."""
    from ray.data.aggregate import Sum

    from .segments import attach_lookup

    def model_rows(t: pa.Table) -> pa.Table:
        keys = [
            _pair_key(a, b)
            for a, b in zip(t["w1"].to_pylist(), t["w2"].to_pylist())
        ]
        return pa.Table.from_arrays(
            [
                pa.array(keys, pa.large_binary()),
                t["c"].combine_chunks().cast(pa.int64()),
            ],
            names=["bkey", "c"],
        )

    def prefix_partial(t: pa.Table) -> pa.Table:
        u: dict[str, int] = {}
        for a, c in zip(t["w1"].to_pylist(), t["c"].to_pylist()):
            u[a] = u.get(a, 0) + c
        return pa.Table.from_arrays(
            [pa.array(list(u.keys()), pa.string()),
             pa.array(list(u.values()), pa.int64())],
            names=["w1", "u"],
        )

    prefix = (
        model.map_batches(prefix_partial, batch_format="pyarrow")
        .groupby("w1")
        .aggregate(Sum("u", alias_name="u"))
    )
    bmodel = model.map_batches(model_rows, batch_format="pyarrow")

    def bigram_rows(batch: pa.Table) -> pa.Table:
        # one row per (doc, DISTINCT bigram) with its in-doc multiplicity
        # — sum of multiplicities per doc IS n_bigrams, so the final
        # groupby recovers both outputs from the same rows.
        id_type = batch.schema.field(id_col).type
        ids, keys, w1s, mult = [], [], [], []
        for i, toks in zip(batch[id_col].to_pylist(), doc_tokens(batch)):
            pairs: dict[tuple[str, str], int] = {}
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
            for (a, b), m in pairs.items():
                ids.append(i)
                keys.append(_pair_key(a, b))
                w1s.append(a)
                mult.append(m)
        return pa.Table.from_arrays(
            [
                pa.array(ids, id_type),
                pa.array(keys, pa.large_binary()),
                pa.array(w1s, pa.string()),
                pa.array(mult, pa.int64()),
            ],
            names=[id_col, "bkey", "w1", "m"],
        )

    def zero_rows(batch: pa.Table) -> pa.Table:
        # token-poor docs have no bigram rows; ride zero partials through
        # the same exchange so every input doc appears in the output.
        id_type = batch.schema.field(id_col).type
        zid = [
            i
            for i, toks in zip(batch[id_col].to_pylist(), doc_tokens(batch))
            if len(toks) < 2
        ]
        z = pa.array([0] * len(zid), pa.int64())
        return pa.Table.from_arrays(
            [pa.array(zid, id_type), z, z], names=[id_col, "nb", "sp"]
        )

    j = attach_lookup(
        ds.map_batches(bigram_rows, batch_format="pyarrow"),
        bmodel,
        key_col="bkey",
        val_cols=["c"],
        carry_cols=[id_col, "w1", "m"],
    )
    j = attach_lookup(
        j,
        prefix,
        key_col="w1",
        val_cols=["u"],
        carry_cols=[id_col, "m", "c"],
    )

    def partial_scores(t: pa.Table) -> pa.Table:
        m = t["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        sp = m * (c * scale // u)
        return pa.Table.from_arrays(
            [
                t[id_col].combine_chunks(),
                pa.array(m),
                pa.array(sp.astype(np.int64)),
            ],
            names=[id_col, "nb", "sp"],
        )

    out = (
        j.map_batches(partial_scores, batch_format="pyarrow")
        .union(ds.map_batches(zero_rows, batch_format="pyarrow"))
        .groupby(id_col)
        .aggregate(
            Sum("nb", alias_name="n_bigrams"),
            Sum("sp", alias_name="lm_score"),
        )
    )
    return out.map_batches(
        lambda t: t.select([id_col, "n_bigrams", "lm_score"]),
        batch_format="pyarrow",
    )


def replicate_by_weight(
    ds,
    weights: dict,
    id_col: str = "doc_id",
    key_col: str = "source",
    salt: int = 0,
):
    """Deterministic data-mixture replication: row with stratum weight
    ``w`` is emitted ``floor(w)`` times, plus once more iff
    ``splitmix64(id + salt) < frac(w)·2^64`` — the standard "epochs per
    source" knob of a training-data mixing pipeline (a weight of 2.5
    means: two full epochs of that source plus a deterministic half).

    Shuffle-free, per-row, and layout-independent like
    :func:`hash_sample` (same hash, same threshold convention — dyadic
    fractional parts compare EXACTLY in both engines, so the SQL oracle
    replicates the mixture bit-for-bit). Output adds ``epoch``
    (0-based copy index); a weight of 0 drops the stratum.
    ``weights.get(key, weights[None])`` supplies the default (1.0 when
    no ``None`` entry is present).
    """
    default_w = float(weights.get(None, 1.0))

    def params(w: float) -> tuple[int, int]:
        base = int(np.floor(w))
        frac_thr = int((float(w) - base) * (1 << 64))
        return base, min(frac_thr, (1 << 64) - 1)

    table = {k: params(v) for k, v in weights.items() if k is not None}
    default_p = params(default_w)

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        hv = splitmix64_np(ids + np.uint64(salt))
        keys = batch[key_col].to_pylist()
        base = np.fromiter(
            (table.get(k, default_p)[0] for k in keys), np.int64, count=len(keys)
        )
        thr = np.fromiter(
            (table.get(k, default_p)[1] for k in keys), np.uint64, count=len(keys)
        )
        copies = base + (hv < thr)
        idx = np.repeat(np.arange(len(batch)), copies)
        offsets = np.concatenate(([0], np.cumsum(copies)))[:-1]
        epoch = np.arange(len(idx)) - np.repeat(offsets, copies)
        out = batch.take(pa.array(idx, pa.int64()))
        return out.append_column("epoch", pa.array(epoch, pa.int32()))

    return ds.map_batches(replicate, batch_format="pyarrow")


def ngram_topk(ds, n: int = 2, k: int = 20, text_col: str = "text"):
    """Exact corpus-global word n-gram heavy hitters: the ``k`` most
    frequent n-grams (tiebreak: n-gram asc) as a pandas frame of
    ``(ngram, cnt, rank)``.

    Same exchange shape as :func:`word_topk`: per-block vectorized n-gram
    counts (tokens from :func:`split_words`, n-grams formed by a sliding
    join that never crosses document boundaries) pre-combine before one
    ``groupby(ngram)`` sum over vocabulary-sized rows; the global top-k is
    per-block partial top-ks (exact once counts are global) merged on the
    driver from O(blocks × k) rows."""
    import pandas as pd
    from ray.data.aggregate import Sum

    if n < 2:
        raise ValueError("use word_topk for unigrams")

    def count_partial(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        words_list = split_words(texts)
        w = words_list.flatten().to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(reps)), reps)
        keep = w != ""
        w, doc = w[keep].astype(str), doc[keep]
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64())],
            names=["ngram", "cnt"],
        )
        if len(w) < n:
            return empty
        m = len(w) - n + 1
        valid = doc[:m] == doc[n - 1 :]  # all n tokens in the same doc
        grams = w[:m]
        for i in range(1, n):
            grams = np.char.add(np.char.add(grams, " "), w[i : m + i])
        grams = grams[valid]
        if not len(grams):
            return empty
        u, c = np.unique(grams, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(object), pa.string()), pa.array(c, pa.int64())],
            names=["ngram", "cnt"],
        )

    totals = (
        ds.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
        .groupby("ngram")
        .aggregate(Sum("cnt"))
    )

    def topk_partial(batch: pa.Table) -> pa.Table:
        gr = np.asarray(batch["ngram"].to_pylist(), dtype=object)
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        order = np.lexsort((gr, -c))[:k]
        return pa.Table.from_arrays(
            [
                pa.array(gr[order].astype(str), pa.string()),
                pa.array(c[order], pa.int64()),
            ],
            names=["ngram", "cnt"],
        )

    partials = totals.map_batches(
        topk_partial, batch_format="pyarrow", batch_size=None
    ).take_all()  # ≤ blocks × k tiny rows
    cand = sorted({(-r["cnt"], r["ngram"]) for r in partials})[:k]
    return pd.DataFrame(
        {
            "ngram": [g for _, g in cand],
            "cnt": [-negc for negc, _ in cand],
            "rank": list(range(1, len(cand) + 1)),
        }
    ).astype({"cnt": "int64", "rank": "int32"})


def kn_stats(ds, max_n: int = 3, text_col: str = "text"):
    """Kneser-Ney smoothing statistics per n-gram order 1..``max_n``:
    total tokens, distinct types, singleton count n1, doubleton count n2,
    and the absolute-discount fraction D = n1/(n1+2·n2) as INTEGER
    numerator/denominator (so the oracle compares exactly, no floats).

    One corpus pass emits every order's grams under a composite
    ``"{n}\\x00{gram}"`` key (per-block pre-combined), ONE vocabulary-sized
    ``groupby(key).sum`` exchange, then per-block stat partials reduce to
    ``max_n`` rows on the driver — O(blocks·max_n) rows, never the vocab."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        words_list = split_words(texts)
        w = words_list.flatten().to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(reps)), reps)
        keep = w != ""
        w, doc = w[keep].astype(str), doc[keep]
        all_keys = []
        for n in range(1, max_n + 1):
            if len(w) < n:
                break
            m = len(w) - n + 1
            valid = doc[:m] == doc[n - 1 :]
            grams = w[:m]
            for i in range(1, n):
                grams = np.char.add(np.char.add(grams, " "), w[i : m + i])
            prefixed = np.char.add(f"{n}\x1f", grams[valid])
            all_keys.append(prefixed)
        if not all_keys:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["key", "cnt"],
            )
        u, c = np.unique(np.concatenate(all_keys), return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(object), pa.string()), pa.array(c, pa.int64())],
            names=["key", "cnt"],
        )

    totals = (
        ds.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
        .groupby("key")
        .aggregate(Sum("cnt"))
    )

    def stat_partial(batch: pa.Table) -> pa.Table:
        keys = batch["key"].to_numpy(zero_copy_only=False)
        cnts = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        orders = np.fromiter(
            (int(k.split("\x1f", 1)[0]) for k in keys),
            dtype=np.int64, count=len(keys),
        )
        rows = {"n": [], "total": [], "distinct_ngrams": [], "n1": [], "n2": []}
        for n in np.unique(orders):
            sel = cnts[orders == n]
            rows["n"].append(int(n))
            rows["total"].append(int(sel.sum()))
            rows["distinct_ngrams"].append(int(len(sel)))
            rows["n1"].append(int((sel == 1).sum()))
            rows["n2"].append(int((sel == 2).sum()))
        return pa.Table.from_arrays(
            [pa.array(rows[c2], pa.int64()) for c2 in ("n", "total", "distinct_ngrams", "n1", "n2")],
            names=["n", "total", "distinct_ngrams", "n1", "n2"],
        )

    parts = totals.map_batches(
        stat_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    agg = parts.groupby("n", sort=True).sum().reset_index()
    agg["d_num"] = agg["n1"]
    agg["d_den"] = agg["n1"] + 2 * agg["n2"]
    return pd.DataFrame(agg).astype("int64")


def passage_chunks(ds, size: int = 8, stride: int = 6, text_col: str = "text",
                   id_col: str = "doc_id"):
    """RAG-style passage chunking: overlapping token windows per document
    (``size`` tokens per passage, ``stride`` tokens between passage
    starts — overlap = size − stride), emitted as
    ``(id, passage_idx, n_tokens, passage)`` rows.

    Per-row, shuffle-free: a flat_map-shaped ``map_batches`` whose output
    row count is ~tokens/stride per doc. Passage boundaries are
    token-exact and layout-independent; the final passage may be shorter
    (never empty), every token belongs to ≥1 passage, and empty documents
    produce no rows."""
    if stride < 1 or size < 1:
        raise ValueError("size and stride must be ≥ 1")

    def chunk(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        words_list = split_words(texts)
        ids_out, idx_out, n_out, text_out = [], [], [], []
        for rid, words in zip(batch[id_col].to_pylist(), words_list.to_pylist()):
            toks = [w for w in words if w]
            if not toks:
                continue  # empty docs produce no passages
            for k, start in enumerate(range(0, len(toks), stride)):
                window = toks[start : start + size]
                ids_out.append(rid)
                idx_out.append(k)
                n_out.append(len(window))
                text_out.append(" ".join(window))
                if start + size >= len(toks):
                    break
        return pa.Table.from_arrays(
            [
                pa.array(ids_out, pa.int64()),
                pa.array(idx_out, pa.int32()),
                pa.array(n_out, pa.int32()),
                pa.array(text_out, pa.string()),
            ],
            names=[id_col, "passage_idx", "n_tokens", "passage"],
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def weighted_sample(ds, weight_col: str, cap: int = 512, salt: int = 0,
                    id_col: str = "doc_id"):
    """Per-ROW weighted deterministic sampling: keep a row with
    probability ``min(weight, cap)/cap`` (cap a power of two), decided by
    ``splitmix64(id + salt) < min(weight, cap) · 2^(64 − log2(cap))``.

    The per-row threshold is an INTEGER multiple of a power of two, so
    the SQL oracle compares bit-for-bit (same trick as
    :func:`hash_sample`'s dyadic rates, lifted from per-stratum to
    per-row — the quality-weighted admission a curation pipeline runs).
    Shuffle-free, layout-independent, no driver state."""
    if cap & (cap - 1) or cap <= 0:
        raise ValueError("cap must be a power of two")
    shift = np.uint64(64 - (cap.bit_length() - 1))

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        w = np.minimum(np.maximum(w, 0), cap).astype(np.uint64)
        hv = splitmix64_np(ids + np.uint64(salt))
        # w == cap means probability 1; its threshold 2^64 would wrap in
        # uint64, so it is handled as an explicit always-keep term.
        keep = (w == cap) | (hv < (w << shift))
        return batch.filter(pa.array(keep))

    return ds.map_batches(sample, batch_format="pyarrow")


def oov_rate(ds, vocab_k: int = 20, text_col: str = "text",
             id_col: str = "doc_id"):
    """Out-of-vocabulary counts per document against the corpus-global
    top-``vocab_k`` word vocabulary: → ``(id, n_tokens, n_oov)`` rows
    (token-less docs emit nothing).

    Two-stage shape: the vocabulary exchange (per-block pre-combined
    counts → one groupby → exact driver-merged top-k of O(blocks·k)
    rows) broadcasts a k-word set; scoring is a second shuffle-free
    streaming pass. Integer outputs — the oracle is exact."""
    import ray
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        w = split_words(texts).flatten().to_numpy(zero_copy_only=False)
        w = w[w != ""]
        u, c = np.unique(w.astype(str), return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(object), pa.string()), pa.array(c, pa.int64())],
            names=["word", "cnt"],
        )

    totals = (
        ds.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
        .groupby("word")
        .aggregate(Sum("cnt"))
    )

    def topk_partial(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["word"].to_pylist(), dtype=object)
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, -c))[:vocab_k]
        return pa.Table.from_arrays(
            [pa.array(w[order].astype(str), pa.string()), pa.array(c[order], pa.int64())],
            names=["word", "cnt"],
        )

    parts = totals.map_batches(
        topk_partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    vocab = [w for _, w in sorted({(-r["cnt"], r["word"]) for r in parts})[:vocab_k]]
    vocab_ref = ray.put(frozenset(vocab))

    def score(batch: pa.Table) -> pa.Table:
        vset = ray.get(vocab_ref)
        texts = pc.fill_null(batch[text_col], "")
        words_list = split_words(texts)
        ids_out, tot_out, oov_out = [], [], []
        for rid, words in zip(batch[id_col].to_pylist(), words_list.to_pylist()):
            toks = [w for w in words if w]
            if not toks:
                continue
            ids_out.append(rid)
            tot_out.append(len(toks))
            oov_out.append(sum(1 for t in toks if t not in vset))
        return pa.Table.from_arrays(
            [
                pa.array(ids_out, pa.int64()),
                pa.array(tot_out, pa.int64()),
                pa.array(oov_out, pa.int64()),
            ],
            names=[id_col, "n_tokens", "n_oov"],
        )

    return ds.map_batches(score, batch_format="pyarrow")


def zipf_histogram(ds, text_col: str = "text"):
    """Vocabulary frequency-spectrum (Zipf curve material): bucket word
    types by floor(log2(count)) → ``(bucket, n_types, n_occurrences)``
    rows, exact integers.

    Shape: per-block pre-combined word counts → ONE vocabulary-sized
    groupby → per-block bucket partials → O(blocks × 64) driver rows.
    The spectrum drives vocabulary truncation and Heaps'-law capacity
    planning for tokenizer training."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        w = split_words(texts).flatten().to_numpy(zero_copy_only=False)
        w = w[w != ""]
        u, c = np.unique(w.astype(str), return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(object), pa.string()), pa.array(c, pa.int64())],
            names=["word", "cnt"],
        )

    totals = (
        ds.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
        .groupby("word")
        .aggregate(Sum("cnt"))
    )

    def bucket_partial(batch: pa.Table) -> pa.Table:
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        buckets = np.floor(np.log2(c)).astype(np.int64)
        u, idx = np.unique(buckets, return_inverse=True)
        n_types = np.bincount(idx)
        occ = np.bincount(idx, weights=c.astype(np.float64)).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(u), pa.array(n_types.astype(np.int64)), pa.array(occ)],
            names=["bucket", "n_types", "n_occurrences"],
        )

    parts = totals.map_batches(
        bucket_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    out = parts.groupby("bucket", sort=True).sum().reset_index()
    return pd.DataFrame(out).astype("int64")


# ---------------------------------------------------------------------------
# Unicode NFC normalization
# ---------------------------------------------------------------------------


def nfc_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Unicode NFC normalization of one Arrow batch: ``text_col`` is
    replaced by its canonical-composed form and a ``changed`` flag column
    is appended (true ⇔ the document needed normalization — the
    interesting minority in a real crawl, where mixed-form mojibake
    breaks exact dedup and tokenizer caches).

    NFC has no Arrow compute kernel; ``unicodedata.normalize`` is one C
    call per string and the stage is shuffle-free, so the corpus cost is
    the same per-document shape as the PII scrub above.  The ASCII fast
    path skips the normalize call entirely (NFC is the identity on
    ASCII), which is most of a web corpus after extraction.
    """
    import unicodedata

    texts = batch[text_col].to_pylist()
    out = []
    changed = []
    for t in texts:
        t = t or ""
        if t.isascii():
            out.append(t)
            changed.append(False)
            continue
        n = unicodedata.normalize("NFC", t)
        out.append(n)
        changed.append(n != t)
    idx = batch.schema.get_field_index(text_col)
    batch = batch.set_column(idx, text_col, pa.array(out, pa.string()))
    return batch.append_column("changed", pa.array(changed, pa.bool_()))


def nfc_normalize(ds, text_col: str = "text"):
    """Dataset-level NFC pass: → same columns with ``text_col``
    canonically composed plus a ``changed`` flag.  One ``map_batches``
    stage, zero exchanges (see :func:`nfc_batch`)."""
    return ds.map_batches(
        lambda b: nfc_batch(b, text_col=text_col), batch_format="pyarrow"
    )


def pmi_topk(
    ds,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    scale: int = 1_000_000,
    broadcast_cap: int = 2_000_000,
):
    """Top-``k`` word bigrams by pointwise mutual information — the classic
    phrase-detection signal (Mikolov et al. 2013 use the same ratio to join
    "new york" before word2vec training). PMI's monotone core is kept as an
    exact scaled integer (the engine's drop-the-log trick, ops/search.py):

        pmi_scaled = floor(scale * c(x,y) * N / (c(x) * c(y)))

    Exchange shape: the two vocabulary-sized count exchanges (bigram and
    unigram totals, both per-block pre-combined), then the unigram counts
    attach to the surviving bigram rows via two sorted-lookup joins
    (:func:`..segments.attach_lookup`) — only bigrams with
    ``c(x,y) >= min_count`` (the selective minority; hapax pairs dominate
    raw bigram vocabulary) carry through. Scoring multiplies three
    corpus-scale counts, so the kernel uses exact Python ints over the
    filtered vocabulary rows (never corpus rows); results ≤ scale·N fit
    int64. Global top-k = per-block partial top-k merged on the driver
    (exact once counts are global), tiebreak bigram asc.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .segments import attach_lookup

    def bigram_partial(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        words_list = split_words(texts)
        w = words_list.flatten().to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(reps)), reps)
        keep = w != ""
        w, doc = w[keep].astype(str), doc[keep]
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string()),
             pa.array([], pa.int64())],
            names=["x", "y", "cnt"],
        )
        if len(w) < 2:
            return empty
        m = len(w) - 1
        valid = doc[:m] == doc[1:]
        pairs = np.char.add(np.char.add(w[:m], " "), w[1:])[valid]
        if not len(pairs):
            return empty
        u, c = np.unique(pairs, return_counts=True)
        parts = np.char.partition(u.astype(str), " ")
        return pa.Table.from_arrays(
            [
                pa.array(parts[:, 0].astype(object), pa.string()),
                pa.array(parts[:, 2].astype(object), pa.string()),
                pa.array(c, pa.int64()),
            ],
            names=["x", "y", "cnt"],
        )

    def unigram_partial(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        w = split_words(texts).flatten()
        toks = w.to_numpy(zero_copy_only=False)
        toks = toks[toks != ""].astype(str)
        u, c = np.unique(toks, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(object), pa.string()), pa.array(c, pa.int64())],
            names=["tok", "cnt"],
        )

    uni = (
        ds.map_batches(unigram_partial, batch_format="pyarrow", batch_size=None)
        .groupby("tok")
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["tok", "c"]), batch_format="pyarrow"
        )
        .materialize()  # consumed three times (N + two lookups)
    )
    n_total = int(uni.sum("c"))

    bg = (
        ds.map_batches(bigram_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["x", "y"])
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["x", "y", "cxy"]),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["cxy"], min_count)),
            batch_format="pyarrow",
        )
    )

    # Dual regime for attaching unigram counts to bigram rows. The
    # unigram VOCABULARY (not the corpus) is the lookup side; under
    # ``broadcast_cap`` tokens it broadcasts once via ray.put and each
    # bigram block resolves both counts with two searchsorted gathers —
    # zero extra exchanges. Above the cap, two sorted-lookup joins
    # (attach_lookup) do the same work distributed.
    if uni.count() <= broadcast_cap:
        import ray

        vt = pa.concat_tables(list(uni.iter_batches(batch_format="pyarrow")))
        toks = vt["tok"].to_numpy(zero_copy_only=False).astype(str)
        cnts = vt["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(toks)
        uni_ref = ray.put((toks[order], cnts[order]))

        def score_bcast(batch: pa.Table) -> pa.Table:
            toks_s, cnts_s = ray.get(uni_ref)
            xs = np.asarray(batch["x"].to_pylist(), dtype=object).astype(str)
            ys = np.asarray(batch["y"].to_pylist(), dtype=object).astype(str)
            cxy = batch["cxy"].to_pylist()
            cx = cnts_s[np.searchsorted(toks_s, xs)]
            cy = cnts_s[np.searchsorted(toks_s, ys)]
            pmi = [
                (scale * int(a) * n_total) // (int(b) * int(d))
                for a, b, d in zip(cxy, cx, cy)
            ]
            return pa.Table.from_arrays(
                [
                    pa.array(
                        [f"{x} {y}" for x, y in zip(xs, ys)], pa.string()
                    ),
                    pa.array(np.asarray(cxy, dtype=np.int64)),
                    pa.array(np.asarray(pmi, dtype=np.int64)),
                ],
                names=["bigram", "cnt", "pmi_scaled"],
            )

        scored = bg.map_batches(score_bcast, batch_format="pyarrow")
        partials = (
            scored.map_batches(topk_partial_fn(k), batch_format="pyarrow",
                               batch_size=None)
            .take_all()
        )
        return _pmi_merge(partials, k)

    with_cx = attach_lookup(
        bg.map_batches(
            lambda t: t.rename_columns(["tok", "y", "cxy"]),
            batch_format="pyarrow",
        ),
        uni,
        key_col="tok",
        val_cols=["c"],
        carry_cols=["y", "cxy"],
    ).map_batches(
        lambda t: t.rename_columns(["x", "y", "cxy", "cx"]),
        batch_format="pyarrow",
    )
    scored_in = attach_lookup(
        with_cx.map_batches(
            lambda t: pa.Table.from_arrays(
                [t["y"], t["x"], t["cxy"], t["cx"]],
                names=["tok", "x", "cxy", "cx"],
            ),
            batch_format="pyarrow",
        ),
        uni,
        key_col="tok",
        val_cols=["c"],
        carry_cols=["x", "cxy", "cx"],
    )

    def score(batch: pa.Table) -> pa.Table:
        ys = batch["tok"].to_pylist()
        xs = batch["x"].to_pylist()
        cxy = batch["cxy"].to_pylist()
        cx = batch["cx"].to_pylist()
        cy = batch["c"].to_pylist()
        # exact big-int arithmetic over vocabulary rows (bounded by the
        # filtered bigram vocabulary, never the corpus)
        pmi = [
            (scale * int(a) * n_total) // (int(b) * int(d))
            for a, b, d in zip(cxy, cx, cy)
        ]
        return pa.Table.from_arrays(
            [
                pa.array(
                    [f"{x} {y}" for x, y in zip(xs, ys)], pa.string()
                ),
                pa.array(np.asarray(cxy, dtype=np.int64)),
                pa.array(np.asarray(pmi, dtype=np.int64)),
            ],
            names=["bigram", "cnt", "pmi_scaled"],
        )

    partials = (
        scored_in.map_batches(score, batch_format="pyarrow")
        .map_batches(topk_partial_fn(k), batch_format="pyarrow", batch_size=None)
        .take_all()
    )  # ≤ blocks × k tiny rows
    return _pmi_merge(partials, k)


def topk_partial_fn(k: int):
    """Per-block partial top-k of scored bigram rows (exact once counts
    are global); shared by both pmi_topk regimes."""

    def topk_partial(batch: pa.Table) -> pa.Table:
        gr = np.asarray(batch["bigram"].to_pylist(), dtype=object)
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        p = batch["pmi_scaled"].to_numpy(zero_copy_only=False)
        order = np.lexsort((gr, -p))[:k]
        return pa.Table.from_arrays(
            [
                pa.array(gr[order].astype(str), pa.string()),
                pa.array(c[order], pa.int64()),
                pa.array(p[order], pa.int64()),
            ],
            names=["bigram", "cnt", "pmi_scaled"],
        )

    return topk_partial


def _pmi_merge(partials: list, k: int):
    """Driver merge of ≤ blocks × k partial rows → ranked frame."""
    import pandas as pd

    cand = sorted(
        {(-r["pmi_scaled"], r["bigram"], r["cnt"]) for r in partials}
    )[:k]
    return pd.DataFrame(
        {
            "bigram": [g for _, g, _ in cand],
            "cnt": [c for _, _, c in cand],
            "pmi_scaled": [-negp for negp, _, _ in cand],
            "rank": list(range(1, len(cand) + 1)),
        }
    ).astype({"cnt": "int64", "pmi_scaled": "int64", "rank": "int32"})


def dataset_split(
    ds,
    cuts: list | None = None,
    last: str = "test",
    id_col: str = "doc_id",
    salt: int = 0,
):
    """Deterministic disjoint train/val/test assignment, shuffle-free.

    ``cuts`` is a list of ``(name, num, den)`` CUMULATIVE fraction cutoffs
    (defaults to train 4/5, val 9/10); a row lands in the first split whose
    exact integer threshold ``(num << 64) // den`` exceeds its
    ``splitmix64(id + salt)`` value, else in ``last``. Thresholds are exact
    rationals so the SQL oracle states the same integer constants; the
    assignment is per-row, streaming, and identical at every parallelism
    level — the split survives any re-run or re-shard (the property a
    training pipeline needs so val never leaks into train across runs).
    Adds a ``split`` column.
    """
    if cuts is None:
        cuts = [("train", 4, 5), ("val", 9, 10)]
    names = [c[0] for c in cuts] + [last]
    thr = np.array(
        [(c[1] << 64) // c[2] for c in cuts], dtype=np.uint64
    )
    if list(thr) != sorted(thr):
        raise ValueError("dataset_split: cuts must be cumulative increasing")
    names_arr = np.array(names, dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        hv = splitmix64_np(ids + np.uint64(salt))
        idx = np.searchsorted(thr, hv, side="right")
        return batch.append_column(
            "split", pa.array(names_arr[idx].astype(object), pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def lang_spans_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Per-document language segmentation: each line is scored by the
    corpus language heuristic (:class:`LangIdScorer`), consecutive lines
    with the same prediction merge into one SPAN → one row per span
    ``(id, span_start, span_end, lang, n_lines)`` (0-based inclusive line
    indices). Multilingual pages (boilerplate in one language, content in
    another) segment into monolingual stretches a mixture pipeline can
    route independently.

    Entirely within ``map_batches`` — each document's lines are in hand,
    so segmentation is a per-doc run-length pass with ZERO exchanges."""
    scorer = _LANGID_CACHE.get("__line__")
    if scorer is None:
        scorer = LangIdScorer("text")
        _LANGID_CACHE["__line__"] = scorer
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_id, out_s, out_e, out_l, out_n = [], [], [], [], []
    for i, t in zip(ids, texts):
        lines = (t or "").split("\n")
        preds = [scorer.predict_one(ln) for ln in lines]
        start = 0
        for j in range(1, len(preds) + 1):
            if j == len(preds) or preds[j] != preds[start]:
                out_id.append(i)
                out_s.append(start)
                out_e.append(j - 1)
                out_l.append(preds[start])
                out_n.append(j - start)
                start = j
    return pa.Table.from_arrays(
        [
            pa.array(out_id, batch.schema.field(id_col).type),
            pa.array(out_s, pa.int64()),
            pa.array(out_e, pa.int64()),
            pa.array(out_l, pa.string()),
            pa.array(out_n, pa.int64()),
        ],
        names=[id_col, "span_start", "span_end", "lang", "n_lines"],
    )


def redact_contaminated(
    ds,
    benchmark_texts: list[str],
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Span-level decontamination: instead of DROPPING documents sharing a
    word n-gram with the benchmark (:func:`decontaminate`), remove only
    the contaminated token spans — every token covered by a matching
    n-gram — and keep the rest of the document. The surgical variant for
    high-value documents where a single leaked test question shouldn't
    cost the whole page.

    Semantics (documented, SQL-replicable): tokens are the lowercased
    whitespace split; the redacted text is the SURVIVING tokens re-joined
    with single spaces. Same broadcast shape as ``decontaminate``: the
    benchmark gram-hash set ships once via ``ray.put``; the corpus
    streams through one shuffle-free ``map_batches``. Emits
    ``(id, redacted_text, n_tokens, n_redacted)``.
    """
    import ray

    bench: set[int] = set()
    for t in benchmark_texts:
        bench.update(word_ngram_hashes(t, n))
    ref = ray.put(np.array(sorted(bench), dtype=np.uint64))

    def redact(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_t, out_n, out_r = [], [], []
        for t in texts:
            tokens = (t or "").lower().split()
            m = len(tokens) - n + 1
            if m <= 0 or not len(grams):
                out_t.append(" ".join(tokens))
                out_n.append(len(tokens))
                out_r.append(0)
                continue
            gh = np.fromiter(
                (_fnv1a(" ".join(tokens[i : i + n]).encode()) for i in range(m)),
                dtype=np.uint64,
                count=m,
            )
            hit = np.isin(gh, grams)
            bad = np.zeros(len(tokens), dtype=bool)
            for i in np.flatnonzero(hit):
                bad[i : i + n] = True
            kept = [tok for tok, b in zip(tokens, bad) if not b]
            out_t.append(" ".join(kept))
            out_n.append(len(tokens))
            out_r.append(int(bad.sum()))
        return pa.Table.from_arrays(
            [
                pa.array(ids, batch.schema.field(id_col).type),
                pa.array(out_t, pa.string()),
                pa.array(out_n, pa.int64()),
                pa.array(out_r, pa.int64()),
            ],
            names=[id_col, "redacted_text", "n_tokens", "n_redacted"],
        )

    return ds.map_batches(redact, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Mojibake repair (UTF-8 bytes mis-decoded as cp1252)
# ---------------------------------------------------------------------------
#
# The dominant real-crawl encoding corruption: a page's UTF-8 bytes were
# decoded with Windows-1252 somewhere upstream, turning "é" into "Ã©" and
# "—" into "â€”". The repair is the inverse round-trip — re-encode with a
# WHATWG-style "sloppy" cp1252 (the five unmapped bytes 0x81 0x8D 0x8F
# 0x90 0x9D pass through as C1 controls, as browsers and ftfy treat
# them), then decode UTF-8 — accepted only when the full round-trip is
# clean AND strictly shortens the text (every multi-byte sequence
# collapses), so well-formed text is a fixed point. Up to 3 rounds
# handles double-encoded mojibake. Same public construction as ftfy's
# core heuristic (Speer, "ftfy: fixes text for you" — public code/paper);
# implementation from scratch.

# cp1252's 0x80–0x9F block (WHATWG windows-1252 index); the five holes
# stay as the identity (sloppy mapping).
_CP1252_DELTA = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8a: "Š", 0x8b: "‹", 0x8c: "Œ",
    0x8e: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
    0x9c: "œ", 0x9e: "ž", 0x9f: "Ÿ",
}
_SLOPPY_DECODE_TABLE = {b: ch for b, ch in _CP1252_DELTA.items()}
_SLOPPY_ENCODE_TABLE = {ord(ch): b for b, ch in _CP1252_DELTA.items()}


def sloppy_cp1252_decode(data: bytes) -> str:
    """Decode bytes as WHATWG windows-1252 (holes → C1 controls)."""
    return data.decode("latin-1").translate(_SLOPPY_DECODE_TABLE)


def _sloppy_cp1252_encode(s: str) -> bytes | None:
    """Inverse of :func:`sloppy_cp1252_decode`; None if any character is
    outside the (sloppy) cp1252 repertoire."""
    try:
        return s.translate(_SLOPPY_ENCODE_TABLE).encode("latin-1")
    except (UnicodeEncodeError, TypeError):
        return None


def fix_mojibake(text: str, max_rounds: int = 3) -> tuple[str, int]:
    """Repair UTF-8-as-cp1252 mojibake; returns (repaired, n_rounds).
    A round applies only when the sloppy-cp1252 → UTF-8 round-trip is
    clean and strictly shortens the text; clean text is a fixed point."""
    rounds = 0
    s = text or ""
    for _ in range(max_rounds):
        if s.isascii():
            break
        b = _sloppy_cp1252_encode(s)
        if b is None:
            break
        try:
            t = b.decode("utf-8")
        except UnicodeDecodeError:
            break
        if len(t) >= len(s):
            break
        s = t
        rounds += 1
    return s, rounds


def fix_mojibake_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Batch mojibake repair: ``text_col`` replaced by its repaired form
    plus a ``fixed`` flag. The ``isascii`` fast path skips the repair
    machinery for the overwhelming majority of rows (mojibake is a
    minority corruption); the stage is shuffle-free and per-row, the
    same corpus cost shape as the NFC pass above."""
    texts = batch[text_col].to_pylist()
    out, flags = [], []
    for t in texts:
        s, r = fix_mojibake(t or "")
        out.append(s)
        flags.append(r > 0)
    cols, names = [], []
    for name in batch.schema.names:
        if name == text_col:
            cols.append(pa.array(out, pa.string()))
        else:
            cols.append(batch[name].combine_chunks())
        names.append(name)
    cols.append(pa.array(flags, pa.bool_()))
    names.append("fixed")
    return pa.Table.from_arrays(cols, names=names)


# int64 safety guard for the drift score's cross products; tests shrink it
# to force the Python-int object path (scores stay exact either way, but a
# score past int64 raises at the Arrow boundary by design — callers at that
# scale keep the object path's exactness by pre-scaling counts).
_DRIFT_INT64_GUARD = 1 << 62


def term_drift(old_ds, new_ds, k: int = 25, text_col: str = "text",
               int64_guard: int = _DRIFT_INT64_GUARD):
    """Exact corpus term drift between two snapshots: the ``k`` tokens
    whose occurrence RATE moved most between the old and new corpus,
    ranked by the integer-exact cross-multiplied rate delta

        score = | c_old * N_new  -  c_new * N_old |

    (``N_side`` = total token occurrences of that side). This is the
    numerator of the two-proportion z / χ² statistic with the
    denominator dropped — dropping it keeps the score a BIGINT/HUGEINT
    expressible bit-for-bit in SQL (the engine's standing integer-exact
    trick, cf. BM25's rational IDF) while preserving the "absolute rate
    change weighted by corpus size" ordering that drift monitoring
    ranks by. Ties break token-ascending.

    Shape: per-block vectorized token counts pre-combine per side (the
    word_topk regime — nothing row-level enters an exchange), one
    ``groupby(token)`` sum over vocabulary-sized (token, c_old, c_new)
    rows; side totals ride as ``""`` sentinel rows (never a real token);
    scoring is one vectorized pass with a guarded int64 fast path
    (Python-int object fallback past 2^62 — the domain_gini pattern);
    final top-k is per-block partials merged from blocks × k rows."""
    from ray.data.aggregate import Sum

    def counts(side: int):
        def f(batch: pa.Table) -> pa.Table:
            texts = pc.fill_null(batch[text_col], "")
            words = split_words(texts).flatten()
            w = words.to_numpy(zero_copy_only=False)
            w = w[w != ""]
            u, c = (
                np.unique(w.astype(str), return_counts=True)
                if len(w)
                else (np.array([], object), np.array([], np.int64))
            )
            tok = np.concatenate([u.astype(object), np.array([""], object)])
            cnt = np.concatenate([c.astype(np.int64), [int(c.sum())]])
            zero = np.zeros(len(tok), np.int64)
            return pa.Table.from_arrays(
                [
                    pa.array(tok, pa.string()),
                    pa.array(cnt if side == 0 else zero, pa.int64()),
                    pa.array(cnt if side == 1 else zero, pa.int64()),
                ],
                names=["token", "c_old", "c_new"],
            )

        return f

    both = (
        old_ds.map_batches(counts(0), batch_format="pyarrow", batch_size=None)
        .union(
            new_ds.map_batches(
                counts(1), batch_format="pyarrow", batch_size=None
            )
        )
        .groupby("token")
        .aggregate(Sum("c_old"), Sum("c_new"))
        .materialize()
    )

    def sentinel_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["token"], ""))

    tot = pa.concat_tables(
        both.map_batches(
            sentinel_only, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    )  # exactly one sentinel row after the groupby
    n_old = int(tot["sum(c_old)"][0].as_py()) if tot.num_rows else 0
    n_new = int(tot["sum(c_new)"][0].as_py()) if tot.num_rows else 0

    def score_topk(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch["token"], ""))
        toks = np.asarray(batch["token"].to_pylist(), dtype=object)
        a = batch["sum(c_old)"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["sum(c_new)"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and (
            (int(a.max()) * n_new >= int64_guard)
            or (int(b.max()) * n_old >= int64_guard)
        ):
            score = np.array(
                [abs(int(x) * n_new - int(y) * n_old) for x, y in zip(a, b)],
                dtype=object,
            )
            order = sorted(
                range(len(score)), key=lambda i: (-score[i], toks[i])
            )[:k]
            order = np.asarray(order, np.int64)
            score_out = [int(score[i]) for i in order]
        else:
            score = np.abs(a * n_new - b * n_old)
            order = np.lexsort((toks, -score))[:k]
            score_out = score[order].tolist()
        return pa.Table.from_arrays(
            [
                pa.array(toks[order].astype(str), pa.string()),
                pa.array(a[order], pa.int64()),
                pa.array(b[order], pa.int64()),
                pa.array(score_out, pa.int64()),
            ],
            names=["token", "c_old", "c_new", "score"],
        )

    import pandas as pd

    partials = both.map_batches(
        score_topk, batch_format="pyarrow", batch_size=None
    ).take_all()  # ≤ blocks × k rows
    partials.sort(key=lambda r: (-r["score"], r["token"]))
    head = partials[:k]
    return pd.DataFrame(
        {
            "token": [r["token"] for r in head],
            "c_old": [r["c_old"] for r in head],
            "c_new": [r["c_new"] for r in head],
            "score": [r["score"] for r in head],
            "rank": list(range(1, len(head) + 1)),
        }
    ).astype({"c_old": "int64", "c_new": "int64", "score": "int64",
              "rank": "int32"})


def readability_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id",
                      threshold_milli: int = 30_000) -> pa.Table:
    """Flesch reading-ease readability per document, integer-exact.

    The classic quality-filter statistic (Flesch 1948; used by crawl
    curation stacks as a cheap fluency prior). Counts are RE2-vectorized:

    * ``n_words``  — runs of ASCII letters ``[A-Za-z]+``,
    * ``n_sents``  — runs of sentence terminators ``[.!?]+`` (min 1),
    * ``n_syll``   — vowel-group runs ``[aeiouy]+`` over the lowercased
      text (the standard syllable heuristic, documented approximation).

    The score is kept rational and emitted in CLAMPED milli-units so SQL
    reproduces it bit-for-bit (DuckDB ``//`` truncates toward zero, so
    the numerator is clamped non-negative BEFORE the division — a
    negative Flesch is "unreadable" anyway):

        flesch_milli = max(0, 206835*S*W - 1015*W^2 - 84600*Y*S) // (S*W)

    ``readable`` flags ``flesch_milli >= threshold_milli`` (default 30.0,
    the classic "difficult" boundary). ``n_words == 0`` scores 0. One
    stateless shuffle-free pass; no counterpart in the reference (its
    quality surface is the 14 problem detectors, SURVEY F6)."""
    texts = pc.fill_null(batch[text_col], "")
    w = pc.count_substring_regex(texts, "[A-Za-z]+").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    s = pc.count_substring_regex(texts, "[.!?]+").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    s = np.maximum(s, 1)
    y = pc.count_substring_regex(
        pc.utf8_lower(texts), "[aeiouy]+"
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    num = 206_835 * s * w - 1_015 * w * w - 84_600 * y * s
    den = s * w
    milli = np.zeros(len(w), np.int64)
    ok = den > 0
    milli[ok] = np.maximum(num[ok], 0) // den[ok]
    return pa.Table.from_arrays(
        [
            batch[id_col],
            pa.array(w, pa.int64()),
            pa.array(s, pa.int64()),
            pa.array(y, pa.int64()),
            pa.array(milli, pa.int64()),
            pa.array(milli >= threshold_milli),
        ],
        names=[id_col, "n_words", "n_sents", "n_syll", "flesch_milli",
               "readable"],
    )


_SCRIPTS = (
    ("arabic", r"\p{Arabic}"),
    ("cjk", r"\p{Han}"),
    ("cyrillic", r"\p{Cyrillic}"),
    ("latin", r"\p{Latin}"),
)


def script_mix_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Unicode script distribution per document — the script-mix census
    that complements langid (``langid_batch``) and homoglyph spoof
    detection (``ops/urls.py``): per-script character counts (RE2
    ``\\p{Script}`` classes, identical in the SQL oracle's RE2), the
    dominant script (max count, ties alphabetical), and an integer mixed
    flag: ``is_mixed`` when non-dominant script characters are >= 10% of
    all script characters (cross-multiplied, no floats). Zero-script
    documents report dominant ``none``. One stateless shuffle-free
    pass."""
    texts = pc.fill_null(batch[text_col], "")
    counts = {
        name: pc.count_substring_regex(texts, pat)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
        for name, pat in _SCRIPTS
    }
    names = [n for n, _ in _SCRIPTS]
    mat = np.stack([counts[n] for n in names])  # scripts × rows
    total = mat.sum(axis=0)
    # argmax with alphabetical tie-break: names are stacked sorted, and
    # np.argmax returns the FIRST maximal index.
    top = np.argmax(mat, axis=0)
    mx = mat[top, np.arange(mat.shape[1])]
    dominant = np.where(total > 0, np.asarray(names, object)[top], "none")
    mixed = (total - mx) * 10 >= total
    mixed &= total > 0
    cols = [batch[id_col]]
    names_out = [id_col]
    for n in names:
        cols.append(pa.array(counts[n], pa.int64()))
        names_out.append(f"n_{n}")
    cols.extend(
        [
            pa.array(total, pa.int64()),
            pa.array(dominant.astype(object), pa.string()),
            pa.array(mixed),
        ]
    )
    names_out.extend(["n_script_chars", "dominant_script", "is_mixed"])
    return pa.Table.from_arrays(cols, names=names_out)


def markup_density_batch(batch: pa.Table, html_col: str = "html",
                         id_col: str = "doc_id") -> pa.Table:
    """Markup-density features per page — the classic boilerplate prior
    (Boilerpipe/jusText gate their block classifiers on it): tag count,
    total character count, visible-text character count after one
    tag-strip pass, and the integer-exact visible-text fraction
    ``1000 * text_chars // html_chars``. All three kernels are RE2 /
    Arrow string ops (count, replace, length), mirrored 1:1 by the SQL
    oracle; one stateless shuffle-free pass. Binary payloads are decoded
    utf-8-replace in-block."""
    col = batch[html_col]
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        texts = pa.array(
            [
                (v or b"").decode("utf-8", errors="replace")
                for v in col.to_pylist()
            ],
            pa.string(),
        )
    else:
        texts = pc.fill_null(col, "")
    n_tags = pc.count_substring_regex(texts, r"<[^>]*>").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    html_chars = pc.utf8_length(texts).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    stripped = pc.replace_substring_regex(texts, r"<[^>]*>", "")
    text_chars = pc.utf8_length(stripped).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    ratio = np.zeros(len(n_tags), np.int64)
    ok = html_chars > 0
    ratio[ok] = 1000 * text_chars[ok] // html_chars[ok]
    return pa.Table.from_arrays(
        [
            batch[id_col],
            pa.array(n_tags, pa.int64()),
            pa.array(html_chars, pa.int64()),
            pa.array(text_chars, pa.int64()),
            pa.array(ratio, pa.int64()),
        ],
        names=[id_col, "n_tags", "html_chars", "text_chars",
               "text_ratio_milli"],
    )


_SOFT404_TITLE_RE = (
    r"(?i)<title[^>]*>[^<]*"
    r"(not found|does not exist|no longer available|error 404)"
)
_SOFT404_BODY_RE = (
    r"(?i)(could not be found|page you requested was not found"
    r"|no longer exists|page was not found)"
)


def soft404_batch(
    batch: pa.Table,
    status_col: str = "status",
    html_col: str = "html",
) -> pa.Table:
    """Soft-404 detection — the crawl-quality classic: servers that
    answer HTTP 200 for missing pages poison a corpus with boilerplate
    error pages that dedup can't catch (each URL's error page embeds its
    own URL). A page is flagged when its STATUS says 200 but its markup
    says "not found": ``reason`` 1 = error-title match, 2 = error-body
    phrase match (title wins), 0 = clean; ``soft404 = reason > 0``.
    Entirely vectorized Arrow regex kernels (two
    ``match_substring_regex`` passes), shuffle-free, stateless —
    append-column semantics preserve the input row order.
    """
    import pyarrow.compute as pc

    html = batch[html_col]
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        html = pc.cast(html, pa.string())
    html = pc.fill_null(html, "")
    status = batch[status_col].combine_chunks().cast(pa.int64())
    t_hit = pc.match_substring_regex(html, _SOFT404_TITLE_RE)
    b_hit = pc.match_substring_regex(html, _SOFT404_BODY_RE)
    ok200 = pc.equal(status, pa.scalar(200, pa.int64()))
    t = pc.and_(ok200, pc.fill_null(t_hit, False))
    b = pc.and_(ok200, pc.fill_null(b_hit, False))
    reason = pc.if_else(
        t, pa.scalar(1, pa.int64()),
        pc.if_else(b, pa.scalar(2, pa.int64()), pa.scalar(0, pa.int64())),
    )
    soft = pc.cast(pc.greater(reason, pa.scalar(0, pa.int64())), pa.int64())
    out = batch.append_column("soft404", soft)
    return out.append_column("reason", reason)


def char_entropy_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Per-document Shannon entropy over character (codepoint)
    frequencies — the standard compressibility proxy for crawl-quality
    filtering: machine-generated/repetitive pages sit far below, and
    base64/binary-as-text blobs far above, the natural-language band
    (~3.8–4.3 bits/char for English).

    Vectorized across the whole batch: all texts join into ONE
    utf-32 buffer decoded by numpy, a single lexsort over
    (doc, codepoint) yields per-(doc, char) run-length counts, and
    ``H = log2(n) − (Σ c·log2 c)/n`` evaluates with two scatter-adds —
    no per-row Python beyond the C-level join. Shuffle-free map stage.
    Returns ``(id_col, n_chars, entropy_micro)`` with the entropy in
    rounded micro-bits (int64), 0 for empty/null text — the same
    fixed-precision convention as the cosine ops (round 6).
    """
    ids = batch[id_col].combine_chunks()
    texts = batch[text_col].to_pylist()
    n_docs = len(texts)
    lens = np.array([len(t) if t else 0 for t in texts], dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return pa.Table.from_arrays(
            [ids, pa.array(lens), pa.array(np.zeros(n_docs, np.int64))],
            names=[id_col, "n_chars", "entropy_micro"],
        )
    joined = "".join(t for t in texts if t)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    order = np.lexsort((codes, doc_of))
    ds_, cs_ = doc_of[order], codes[order]
    # run boundaries of (doc, char)
    new_run = np.empty(total, dtype=bool)
    new_run[0] = True
    new_run[1:] = (ds_[1:] != ds_[:-1]) | (cs_[1:] != cs_[:-1])
    run_starts = np.flatnonzero(new_run)
    run_counts = np.diff(np.append(run_starts, total)).astype(np.float64)
    run_docs = ds_[run_starts]
    s = np.zeros(n_docs, np.float64)  # Σ c·log2(c) per doc
    np.add.at(s, run_docs, run_counts * np.log2(run_counts))
    with np.errstate(divide="ignore", invalid="ignore"):
        h = np.where(lens > 0, np.log2(np.maximum(lens, 1)) - s / np.maximum(lens, 1), 0.0)
    micro = np.round(h * 1e6).astype(np.int64)
    return pa.Table.from_arrays(
        [ids, pa.array(lens), pa.array(micro)],
        names=[id_col, "n_chars", "entropy_micro"],
    )


def grouped_split(
    ds,
    group_col: str,
    cuts: list | None = None,
    last: str = "test",
):
    """Leakage-controlled train/val/test assignment: every row of a
    GROUP (a registered domain, a source site, a dedup cluster) lands
    in the same split, so near-duplicate pages within a domain can
    never straddle train and validation — the contamination mode a
    per-row split (:func:`dataset_split`) cannot prevent.

    The split key is ``splitmix64(FNV-1a(group))`` against the same
    exact integer rational thresholds as :func:`dataset_split`; both
    hashes are SQL-replayable, per-row, streaming, and identical at
    every parallelism level. Adds a ``split`` column.
    """
    if cuts is None:
        cuts = [("train", 4, 5), ("val", 9, 10)]
    names = [c[0] for c in cuts] + [last]
    thr = np.array([(c[1] << 64) // c[2] for c in cuts], dtype=np.uint64)
    if list(thr) != sorted(thr):
        raise ValueError("grouped_split: cuts must be cumulative increasing")
    names_arr = np.array(names, dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch[group_col].to_pylist()
        fnv = np.array(
            [_fnv1a((k or "").encode("utf-8", errors="ignore"))
             for k in keys],
            dtype=np.uint64,
        )
        hv = splitmix64_np(fnv)
        idx = np.searchsorted(thr, hv, side="right")
        return batch.append_column(
            "split", pa.array(names_arr[idx].astype(object), pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def vocab_overlap(ds_a, ds_b, text_col: str = "text"):
    """Exact vocabulary overlap between two corpus partitions — the
    cheap drift/contamination screen run before expensive n-gram
    decontamination (a high token-level Jaccard between a new crawl
    slice and the training corpus flags near-identical sources).
    Tokenization is THE corpus tokenization (:func:`split_words`).

    Shape: per-block distinct-token partials tagged with a side bit,
    ONE ``groupby(token).max/min`` over (token, side) rows computes
    per-token membership (min side = 0 and max side = 1 ⟺ both), and
    O(blocks) integer partials reduce to one row. Nothing
    vocabulary-sized lands on the driver.

    Returns a one-row pandas DataFrame ``(n_a, n_b, n_both,
    jaccard_milli)`` with the Jaccard in floor milli-units.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    def tokens(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            col = batch[text_col]
            if pa.types.is_null(col.type):
                col = pa.nulls(len(col), pa.string())
            words = split_words(pc.fill_null(col, ""))
            flat = pc.list_flatten(words)
            u = np.unique(np.asarray(flat.to_pylist(), dtype=object))
            u = u[u != ""]
            return pa.Table.from_arrays(
                [
                    pa.array(u.astype(str), pa.string()),
                    pa.array(np.full(len(u), side, np.int64)),
                ],
                names=["token", "side"],
            )

        return fn

    both = ds_a.map_batches(tokens(0), batch_format="pyarrow").union(
        ds_b.map_batches(tokens(1), batch_format="pyarrow")
    )
    membership = (
        both.groupby("token")
        .aggregate(Min("side", alias_name="lo"), Max("side", alias_name="hi"))
        .map_batches(
            lambda t: t.rename_columns(["token", "lo", "hi"]),
            batch_format="pyarrow",
        )
    )

    def partial(batch: pa.Table) -> pa.Table:
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        in_a = lo == 0
        in_b = hi == 1
        return pa.Table.from_arrays(
            [
                pa.array([int(in_a.sum())], pa.int64()),
                pa.array([int(in_b.sum())], pa.int64()),
                pa.array([int((in_a & in_b).sum())], pa.int64()),
            ],
            names=["n_a", "n_b", "n_both"],
        )

    import pandas as pd

    parts = membership.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    n_a = int(parts["n_a"].sum())
    n_b = int(parts["n_b"].sum())
    n_both = int(parts["n_both"].sum())
    union = n_a + n_b - n_both
    return pd.DataFrame(
        {
            "n_a": [n_a],
            "n_b": [n_b],
            "n_both": [n_both],
            "jaccard_milli": [1000 * n_both // union if union else 0],
        }
    )


def hapax_stats(ds, group_col: str = "lang", text_col: str = "text"):
    """Per-group hapax-legomena census — the corpus-linguistics health
    signal (a natural-language slice shows ~40-60% hapax TYPES; spam
    and template farms collapse it, OCR noise inflates it). Counts are
    token OCCURRENCES under THE corpus tokenization
    (:func:`split_words`).

    Shape: per-block (group, token, n) partials pre-combine before ONE
    ``groupby(group, token).sum`` (vocabulary-pair cardinality), then
    one :func:`..ops.segments.sorted_segment_apply` reduces each
    group's type/token/hapax counts with prefix-sum gathers.

    Returns a Dataset ``(group, n_types, n_tokens, n_hapax,
    hapax_milli)`` with the hapax TYPE share in floor milli-units.
    """
    from ray.data.aggregate import Sum

    from .segments import sorted_segment_apply

    def partials(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if pa.types.is_null(col.type):
            col = pa.nulls(len(col), pa.string())
        words = split_words(pc.fill_null(col, ""))
        groups = np.asarray(batch[group_col].to_pylist(), dtype=object).astype(str)
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = np.asarray(pc.list_flatten(words).to_pylist(), dtype=object)
        rep = np.repeat(groups, lens)
        keep = flat != ""
        comp = np.char.add(np.char.add(rep[keep].astype(str), "\x1f"),
                           flat[keep].astype(str))
        uniq, inv = np.unique(comp, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        parts = np.char.partition(uniq.astype(str), "\x1f")
        return pa.Table.from_arrays(
            [
                pa.array(parts[:, 0].astype(object), pa.string()),
                pa.array(parts[:, 2].astype(object), pa.string()),
                pa.array(cnt, pa.int64()),
            ],
            names=["grp", "token", "n"],
        )

    pairs = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["grp", "token"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.rename_columns(["grp", "token", "n"]),
            batch_format="pyarrow",
        )
    )

    def census(batch: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        names = ["group", "n_types", "n_tokens", "n_hapax", "hapax_milli"]
        if len(starts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string())] + [pa.array([], pa.int64())] * 4,
                names=names,
            )
        grp = batch["grp"].combine_chunks()
        n = batch["n"].to_numpy(zero_copy_only=False)
        cs = np.concatenate([[0], np.cumsum(n)])
        one = (n == 1).astype(np.int64)
        cs1 = np.concatenate([[0], np.cumsum(one)])
        types = (ends - starts).astype(np.int64)
        toks = cs[ends] - cs[starts]
        hapax = cs1[ends] - cs1[starts]
        return pa.Table.from_arrays(
            [
                grp.take(pa.array(starts)),
                pa.array(types, pa.int64()),
                pa.array(toks, pa.int64()),
                pa.array(hapax, pa.int64()),
                pa.array(1000 * hapax // types, pa.int64()),
            ],
            names=names,
        )

    return sorted_segment_apply(
        pairs, key_col="grp", block_fn=census, within_cols=["token"]
    )
