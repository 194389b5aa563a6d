"""Text-block rasterizer — the public-knowledge analogue of the
reference's vision-validation path (``src/services/openai_client.py:60-105``
renders a PDF page to a PNG for an external vision model; this engine has
no external models, so the rasterizer renders extracted text into a
bitmap with a DETERMINISTIC glyph formula and derives layout-fidelity
metrics from the rendered pixels — closing SURVEY §2's M6 gap with an
exact oracle instead of a model call).

Rendering model: a monospace grid of 8×8 cells, ``width // 8`` columns,
rows growing as needed. Codepoint ``cp`` inks the first ``cp % 32 + 8``
positions of its cell in row-major order (a bar glyph — distinct
codepoints get distinct ink masses, whitespace renders blank), value 255
on 0. The per-character ink count is a closed form over the codepoint, so
a SQL oracle can recompute every metric the stage reads off the real
bitmap.

Ray shape: a stateless vectorized ``map_batches`` stage (the bitmap work
is numpy; no model to load, so no actor pool needed); the bitmap can be
PNG-encoded with the engine's own encoder (:func:`..multimodal.encode_png`)
for sink parity with the reference's page snapshots.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CELL = 8
_WHITESPACE = {0x20, 0x09, 0x0A, 0x0D}


def _glyph_ink(cp: int) -> int:
    """Ink pixel count of codepoint ``cp``'s 8×8 bar glyph (0 for
    whitespace) — the closed form the SQL oracle replays."""
    if cp in _WHITESPACE:
        return 0
    return cp % 32 + 8


def render_text_bitmap(
    text: str, width: int = 256, max_chars: int = 256
) -> np.ndarray:
    """Render ``text`` (first ``max_chars`` codepoints) into an (H, W)
    uint8 bitmap on the monospace grid described in the module docstring.
    Returns a (0, width) array for empty text."""
    cps = np.frombuffer(
        text[:max_chars].encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    cols = width // _CELL
    n = len(cps)
    if n == 0:
        return np.zeros((0, width), dtype=np.uint8)
    rows = (n + cols - 1) // cols
    # Vectorized: each glyph is a 64-slot cell, first ink(cp) slots set.
    ink = np.where(
        np.isin(cps, list(_WHITESPACE)), 0, cps % 32 + 8
    )
    cells = (np.arange(_CELL * _CELL)[None, :] < ink[:, None]).astype(np.uint8) * 255
    grid = np.zeros((rows * cols, _CELL * _CELL), dtype=np.uint8)
    grid[:n] = cells
    # (rows*cols, 64) -> (rows, cols, 8, 8) -> (rows*8, cols*8)
    return (
        grid.reshape(rows, cols, _CELL, _CELL)
        .transpose(0, 2, 1, 3)
        .reshape(rows * _CELL, cols * _CELL)
    )


def rasterize_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 256,
    max_chars: int = 256,
) -> pa.Table:
    """Per-row rasterization: render each document's bitmap and read the
    layout metrics OFF THE PIXELS (not the text) — ``ink_pixels`` counts
    nonzero bitmap entries, ``rows_occupied`` counts 8-row bands with any
    ink. Empty texts emit no row (nothing was rendered)."""
    ids, n_rendered, ink_pixels, rows_occ = [], [], [], []
    for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        t = (t or "")[:max_chars]
        if not t:
            continue
        bmp = render_text_bitmap(t, width=width, max_chars=max_chars)
        ids.append(i)
        n_rendered.append(len(t))
        ink_pixels.append(int((bmp != 0).sum()))
        band = bmp.reshape(-1, _CELL, bmp.shape[1])
        rows_occ.append(int((band != 0).any(axis=(1, 2)).sum()))
    return pa.Table.from_arrays(
        [
            pa.array(ids, batch.schema.field(id_col).type),
            pa.array(n_rendered, pa.int64()),
            pa.array(ink_pixels, pa.int64()),
            pa.array(rows_occ, pa.int64()),
        ],
        names=[id_col, "n_rendered", "ink_pixels", "rows_occupied"],
    )


def rasterize_pages(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 256,
    max_chars: int = 256,
):
    """Dataset stage: one vectorized ``map_batches`` — no exchange, no
    state; scales as a pure map."""
    import functools

    fn = functools.partial(
        rasterize_batch,
        text_col=text_col,
        id_col=id_col,
        width=width,
        max_chars=max_chars,
    )
    return ds.map_batches(fn, batch_format="pyarrow")
