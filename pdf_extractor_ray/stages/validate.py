"""Validation stage: problem detection, similarity, repair.

Per-document re-expression of the reference's per-page cross-validation
(reference: src/services/validation/validation_orchestrator.py:156-421 and
the substitution policy in src/services/mistral_client.py:237-251):

- run the enabled problem detectors over the extracted markdown
- if problems were detected → substitute the provided reference ``text``
  column (the engine's "alternative extraction"), similarity = 0.0,
  passed = False, source = "provided"
- else, for the deterministic validation sample → compute similarity
  against ``text``; below-threshold pages are kept but flagged
  (reference keeps originals on low similarity, replacing only
  problem pages)
- unsampled clean rows skip similarity entirely (null score)

Sampling is the reference's every-Nth-page rule with the ``random.randint``
offset replaced by a stable url hash so reruns at any parallelism are
byte-identical (reference: validation_orchestrator.py:156-180 uses a random
offset; determinism is a hard requirement here, SURVEY.md §7.3).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from ..functions.problems import has_any_problem
from ..functions.similarity import calculate_similarity

VALIDATE_COLUMNS = ("problems", "has_problem", "similarity", "passed", "source")


def should_validate(url: str, sample_rate: int) -> bool:
    """Deterministic sampling: validate every ``sample_rate``-th document by
    stable url hash (replaces reference's random offset for reproducibility)."""
    if sample_rate <= 1:
        return True
    return zlib.crc32(url.encode()) % sample_rate == 0


def validate_batch(batch: pa.Table, config: EngineConfig | None = None) -> pa.Table:
    """Stateless ``map_batches`` UDF adding validation columns and applying
    the repair policy to ``extracted_text``."""
    config = config or EngineConfig()
    enabled = config.problems_enabled
    urls = batch["url"].to_pylist()
    extracted = batch["extracted_text"].to_pylist()
    provided = batch["text"].to_pylist()

    out_text: list[str] = []
    problems_col: list[list[str]] = []
    has_problem_col = np.zeros(len(urls), dtype=bool)
    similarity_col: list[float | None] = []
    passed_col: list[bool] = []
    source_col: list[str] = []

    for i, url in enumerate(urls):
        content = extracted[i] or ""
        alternative = provided[i] or ""
        if not config.validation_enabled:
            out_text.append(content)
            problems_col.append([])
            similarity_col.append(None)
            passed_col.append(True)
            source_col.append("extracted")
            continue
        has_problem, detected = has_any_problem(content, enabled)
        problems_col.append(detected)
        has_problem_col[i] = has_problem
        if has_problem and alternative:
            # Problem pages are replaced by the alternative extraction
            # (reference: mistral_client.py:237-244).
            out_text.append(alternative)
            similarity_col.append(0.0)
            passed_col.append(False)
            source_col.append("provided")
        elif should_validate(url, config.validation_sample_rate) and not (
            config.validation_skip_sample_if_clean and not alternative
        ):
            score = calculate_similarity(
                content, alternative, config.validation_similarity_method
            )
            ok = score >= config.validation_similarity_threshold
            # Low similarity: keep original, flag as warning
            # (reference: mistral_client.py:246-251).
            out_text.append(content)
            similarity_col.append(score)
            passed_col.append(ok)
            source_col.append("extracted")
        else:
            out_text.append(content)
            similarity_col.append(None)
            passed_col.append(True)
            source_col.append("extracted")

    out = batch.drop_columns(["extracted_text"])
    return (
        out.append_column("extracted_text", pa.array(out_text, pa.string()))
        .append_column("problems", pa.array(problems_col, pa.list_(pa.string())))
        .append_column("has_problem", pa.array(has_problem_col))
        .append_column("similarity", pa.array(similarity_col, pa.float64()))
        .append_column("passed", pa.array(passed_col, pa.bool_()))
        .append_column("source", pa.array(source_col, pa.string()))
    )
