"""Corpus-scale operations beyond the reference's per-document scope.

The reference processes one document per request and has no corpus-level
operators (SURVEY.md §2.7); a 100 TB training-data pipeline needs them.
Modules:

- ``dedup``      exact hash dedup, MinHash+LSH, SimHash, n-gram Jaccard,
                 embedding-cosine near-dup
- ``ann``        brute-force cosine top-k + LSH-bucketed variant
- ``text``       language-ID, quality scoring, token counting, fingerprints
- ``multimodal`` binary-column decode/feature plumbing (decode kernels
                 stubbed — no image/audio libs in this container)
"""
