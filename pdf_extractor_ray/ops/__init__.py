"""Corpus-scale operations beyond the reference's per-document scope.

The reference processes one document per request and has no corpus-level
operators (SURVEY.md §2.7); a 100 TB training-data pipeline needs them.
Modules:

- ``dedup``      exact hash dedup (grouped + (hash,id)-shuffle variants),
                 MinHash+LSH, SimHash, embedding-cosine near-dup —
                 dataset-native with size-gated connected components
- ``ann``        brute-force cosine top-k + IVF (full-probe exact mode)
- ``text``       language-ID, quality scoring, token counting,
                 fingerprints, benchmark decontamination (exact + Bloom),
                 PII scrubbing, Gopher-style repetition quality
- ``pack``       sharded fixed-length sequence packing for pretraining
- ``joins``      as-of join, broadcast semi/anti join
- ``windows``    tumbling/sliding event-time windows
- ``embed``      hashed-ngram embedding actor stage (gaussian/identity)
- ``multimodal`` image/audio/video columns with REAL from-scratch codecs
                 (PNG, BMP, JPEG, GIF, TIFF, VP8L WebP, PCM WAV, IMA
                 ADPCM, G.711 mu/A-law, FLAC, Y4M/AVI) + resize stages;
                 MP3/lossy-VP8/DCT-video declared stubs
- ``quantiles``  exact distributed order statistics (iterative histogram
                 refinement — counting passes, zero data shuffles)
- ``sketch``     HyperLogLog cardinality (fixed 2^p registers, per-block
                 max partials, bit-exact SQL oracle)
- ``segments``   ordered per-key aggregation over sorted blocks
- ``substr``     ExactSubstr-style duplicated-window detection
                 (rolling-hash windows, Lee et al. 2022)
- ``urls``       URL canonicalization (RFC-3986 normalization, tracking
                 params, registered-domain heuristic)
"""
