"""Engine configuration.

Mirrors the semantics-bearing constants of the reference's pydantic-settings
config (reference: src/core/config.py:36-113) as a plain frozen dataclass that
is cheap to pickle into UDF closures / actor constructors (no globals, no env
reads inside workers).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Default-enabled problem detectors (reference: src/core/config.py:100-113 —
# seven of the fourteen registered detectors are enabled by default).
DEFAULT_PROBLEMS_ENABLED: tuple[str, ...] = (
    "empty_tables",
    "low_content_density",
    "missing_numbers",
    "inconsistent_columns",
    "repeated_characters",
    "garbled_text",
    "header_only_tables",
)

ALL_PROBLEMS: tuple[str, ...] = DEFAULT_PROBLEMS_ENABLED + (
    "very_short_pages",
    "missing_keywords",
    "malformed_structure",
    "duplicate_content",
    "repetitive_numbers",
    "unknown_characters",
    "markdown_images",
)


@dataclass(frozen=True)
class EngineConfig:
    # --- splitting / skew (reference: src/core/config.py:36, pdf_processor.py:29-68)
    max_pages_per_chunk: int = 15          # MAX_PAGES_PER_CHUNK
    split_threshold_bytes: int = 256_000   # payloads above this go through flat_map chunking
    max_outlines: int = 4                  # top-level outline cap (pdf_processor.py:56-59)

    # --- validation (reference: src/core/config.py:89-113)
    validation_sample_rate: int = 5        # validate every Nth page (VALIDATION_SAMPLE_RATE)
    validation_similarity_threshold: float = 0.95
    validation_similarity_method: str = "number_frequency"  # | "levenshtein"
    validation_skip_sample_if_clean: bool = True
    problems_enabled: tuple[str, ...] = DEFAULT_PROBLEMS_ENABLED
    validation_enabled: bool = True

    # --- encrypted-PDF credentials (standard security handler; user or
    # owner password — functions/pdf_codec.py Algorithms 4/5/7 + R6).
    # ``pdf_password`` applies corpus-wide; ``pdf_password_col`` names a
    # sidecar string column carrying a per-document password (the shape a
    # real protected corpus arrives in). The column is consumed by the
    # extract stage and never flows downstream.
    pdf_password: str = ""
    pdf_password_col: str | None = None

    # --- HTML block scoring (our engine; Boilerpipe/trafilatura-style thresholds)
    min_block_text_len: int = 8            # blocks shorter than this are dropped unless table
    max_link_density: float = 0.35         # blocks with more linked text than this are boilerplate

    # --- partitioning / output
    num_partitions: int = 64               # partition_id = stable_hash(url) % num_partitions

    # --- Ray stage sizing (single-node defaults; scale with cluster)
    html_batch_size: int = 512             # ~8 MB/batch at the 16 KB/page corpus mix
    pdf_batch_size: int = 64               # binary payload rows: small batches
    pdf_pool_size: int = 4                 # actor pool size for the warm PDF parser stage
    # Extractor actor pool (min, max): autoscales with the cluster; leave
    # headroom so read/write stages are never starved.
    extract_concurrency: tuple[int, int] = (1, 24)

    extra: dict = field(default_factory=dict, compare=False)


DEFAULT_CONFIG = EngineConfig()
