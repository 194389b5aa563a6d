"""Pure, deterministic operator functions.

Every function here is side-effect-free and seed/wall-clock-free so that the
same inputs produce byte-identical outputs at any parallelism level. These are
the semantic core re-expressed from the reference (see per-module docstrings
for reference citations); Ray Data stages in ``..stages`` call them inside
``map_batches`` / ``map_groups`` UDFs.
"""
