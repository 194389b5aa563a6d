"""Similarity scoring between an extraction and its reference text.

Semantics mirrored from the reference's SimilarityCalculator
(reference: src/services/validation/similarity_calculator.py:32-244):
number-frequency cosine (default, format-agnostic for financial content),
Levenshtein over alnum-normalized text, and a Jaccard word-set quick check
used for early exit. The Levenshtein kernel is a from-scratch numpy DP
(no external C library in this environment).
"""

from __future__ import annotations

from collections import Counter
import math

import numpy as np

from .normalize import extract_numbers, normalize_for_comparison


def number_frequency(numbers: list[str]) -> dict[str, int]:
    """Frequency map of normalized number strings
    (reference: similarity_calculator.py:32-42)."""
    return dict(Counter(numbers))


def cosine_similarity_freq(freq1: dict[str, int], freq2: dict[str, int]) -> float:
    """Cosine similarity between two frequency maps; both-empty→1.0,
    one-empty→0.0, clamped to [0,1] (reference: similarity_calculator.py:44-85)."""
    if not freq1 and not freq2:
        return 1.0
    if not freq1 or not freq2:
        return 0.0
    keys = set(freq1) | set(freq2)
    dot = sum(freq1.get(k, 0) * freq2.get(k, 0) for k in keys)
    mag1 = math.sqrt(sum(v * v for v in freq1.values()))
    mag2 = math.sqrt(sum(v * v for v in freq2.values()))
    if mag1 == 0 or mag2 == 0:
        return 0.0
    return max(0.0, min(1.0, dot / (mag1 * mag2)))


def similarity_number_frequency(content1: str, content2: str) -> float:
    """Similarity of the number distributions of two texts
    (reference: similarity_calculator.py:87-122)."""
    freq1 = number_frequency(extract_numbers(content1))
    freq2 = number_frequency(extract_numbers(content2))
    return cosine_similarity_freq(freq1, freq2)


def levenshtein_distance(s1: str, s2: str) -> int:
    """Edit distance via a two-row numpy DP (O(len1*len2) time, O(len2) space)."""
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    a2 = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(s2) + 1, dtype=np.int64)
    curr = np.empty_like(prev)
    idx = np.arange(len(s2) + 1, dtype=np.int64)
    for i, ch in enumerate(s1, start=1):
        curr[0] = i
        cost = (a2 != ord(ch)).astype(np.int64)
        np.minimum(prev[1:] + 1, prev[:-1] + cost, out=curr[1:])
        # Resolve the left-neighbor dependency (curr[j] = min(curr[j],
        # curr[j-1]+1)) with a prefix-min scan of (curr[j] - j).
        curr = np.minimum.accumulate(curr - idx) + idx
        prev, curr = curr, prev
    return int(prev[-1])


def similarity_levenshtein(content1: str, content2: str) -> float:
    """``1 - dist/max_len`` over alnum-normalized text; empty-vs-empty→1.0,
    one-empty→0.0 (reference: similarity_calculator.py:124-175)."""
    if not content1 and not content2:
        return 1.0
    if not content1 or not content2:
        return 0.0
    norm1 = normalize_for_comparison(content1)
    norm2 = normalize_for_comparison(content2)
    if not norm1 and not norm2:
        return 1.0
    if not norm1 or not norm2:
        return 0.0
    distance = levenshtein_distance(norm1, norm2)
    max_length = max(len(norm1), len(norm2))
    return max(0.0, min(1.0, 1.0 - distance / max_length))


def quick_jaccard(content1: str, content2: str) -> float:
    """Jaccard word-set similarity used as an early-exit pre-check; returns
    0.0 when lengths differ >5% (reference: similarity_calculator.py:177-210)."""
    len1, len2 = len(content1), len(content2)
    if len1 == 0 or len2 == 0:
        return 0.0
    if abs(len1 - len2) / max(len1, len2) > 0.05:
        return 0.0
    words1, words2 = set(content1.split()), set(content2.split())
    if not words1 or not words2:
        return 0.0
    union = len(words1 | words2)
    return len(words1 & words2) / union if union else 0.0


def calculate_similarity(
    content1: str, content2: str, method: str = "number_frequency"
) -> float:
    """Dispatcher with Jaccard early exit at >0.95
    (reference: similarity_calculator.py:212-244)."""
    quick = quick_jaccard(content1, content2)
    if quick > 0.95:
        return quick
    if method == "levenshtein":
        return similarity_levenshtein(content1, content2)
    return similarity_number_frequency(content1, content2)
