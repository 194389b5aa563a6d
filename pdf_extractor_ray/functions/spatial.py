"""Spatial join (structure × OCR words) and source-preference table merge.

Re-expressions of the reference's two table-fusion scripts:
- bbox-overlap word→cell mapping
  (reference: scripts/merge_structure_ocr.py:32-47, 203-265)
- per-page Camelot-wins/Azure-fallback merge
  (reference: scripts/merge_camelot_azure.py:108-148)

Both sides of each join are small and co-located per document (they come
out of the same row's extraction), so at corpus scale these run inside a
per-document UDF — the general form is a co-group on ``(url, page)`` via
``groupby(url).map_groups`` (Ray Data's join idiom), never a global
shuffle join.

The word→cell assignment is vectorized: one numpy broadcast of (n_cells ×
n_words) intersection areas per table instead of the reference's
nested-Python-loop scan.
"""

from __future__ import annotations

import numpy as np


def bbox_overlap(bbox1, bbox2) -> float:
    """Intersection area of two (x1, y1, x2, y2) boxes
    (reference: merge_structure_ocr.py:32-47)."""
    x1 = max(bbox1[0], bbox2[0])
    y1 = max(bbox1[1], bbox2[1])
    x2 = min(bbox1[2], bbox2[2])
    y2 = min(bbox1[3], bbox2[3])
    if x1 < x2 and y1 < y2:
        return (x2 - x1) * (y2 - y1)
    return 0.0


def map_words_to_cells(
    cell_bboxes: list[tuple], words: list[dict], min_overlap_ratio: float = 0.5
) -> list[dict]:
    """Assign OCR words to table cells by spatial overlap.

    A word belongs to a cell when intersection_area / word_area >
    ``min_overlap_ratio`` (reference: merge_structure_ocr.py:229-248). A
    cell's text is its words joined by spaces in reading order (x within y).
    Returns one dict per cell: ``{text, word_count}``.

    Vectorized: intersection areas for all (cell, word) pairs in one numpy
    broadcast.
    """
    if not cell_bboxes:
        return []
    if not words:
        return [{"text": "", "word_count": 0} for _ in cell_bboxes]

    cells = np.asarray(cell_bboxes, dtype=np.float64)  # (C, 4)
    wboxes = np.asarray([w["bbox"] for w in words], dtype=np.float64)  # (W, 4)

    ix1 = np.maximum(cells[:, None, 0], wboxes[None, :, 0])
    iy1 = np.maximum(cells[:, None, 1], wboxes[None, :, 1])
    ix2 = np.minimum(cells[:, None, 2], wboxes[None, :, 2])
    iy2 = np.minimum(cells[:, None, 3], wboxes[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    word_area = (wboxes[:, 2] - wboxes[:, 0]) * (wboxes[:, 3] - wboxes[:, 1])
    ratio = np.where(word_area[None, :] > 0, inter / np.maximum(word_area[None, :], 1e-12), 0.0)
    member = ratio > min_overlap_ratio  # (C, W)

    # Reading order inside a cell: top-to-bottom then left-to-right.
    order = np.lexsort((wboxes[:, 0], wboxes[:, 1]))
    out = []
    for c in range(len(cells)):
        idxs = [i for i in order if member[c, i]]
        out.append(
            {
                "text": " ".join(words[i]["text"] for i in idxs),
                "word_count": len(idxs),
            }
        )
    return out


def merge_table_sources(
    preferred_tables: list[dict], fallback_tables: list[dict]
) -> list[dict]:
    """Per-page source preference: if the preferred extractor found tables
    on a page use ALL of them, else fall back to the other source's tables
    for that page; pages processed in sorted order
    (reference: merge_camelot_azure.py:108-148). Each table dict needs a
    ``page`` key; the winner gets ``used_source`` stamped."""
    by_page_preferred: dict[int, list[dict]] = {}
    for table in preferred_tables:
        by_page_preferred.setdefault(table["page"], []).append(table)
    by_page_fallback: dict[int, list[dict]] = {}
    for table in fallback_tables:
        by_page_fallback.setdefault(table["page"], []).append(table)

    merged: list[dict] = []
    for page in sorted(set(by_page_preferred) | set(by_page_fallback)):
        if page in by_page_preferred:
            for table in by_page_preferred[page]:
                merged.append({**table, "used_source": "preferred"})
        else:
            for table in by_page_fallback[page]:
                merged.append({**table, "used_source": "fallback"})
    return merged
