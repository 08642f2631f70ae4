"""Deterministic 5x7 bitmap font for the mock-OCR raster contract.

Every glyph is a 7x5 binary pattern with a fully-set border ring and a 5x3
interior whose 15 bits encode ``glyph_index + GLYPH_VALUE_OFFSET``.

Properties the decoder relies on:
  * the border ring guarantees no blank row/column inside a glyph cell, so
    blank columns appear only at glyph/word gaps and blank rows only at
    line/para/block gaps;
  * every glyph is one connected component;
  * interior values are < 2**6, while a 180°-rotated interior bit pattern of
    any such value has its high bits set (>= 2**9), so a flipped page can
    never decode to valid glyphs — orientation detection by decode
    validation is unambiguous.
"""

from __future__ import annotations

import numpy as np

from tesseract_recognize_spark.constants import (
    ALPHABET,
    GLYPH_H,
    GLYPH_VALUE_OFFSET,
    GLYPH_W,
    INTERIOR_BITS,
    N_GLYPHS,
    RTL_ALPHABET,
    RTL_START,
    UNK_INDEX,
)

__all__ = [
    "glyph_bitmap",
    "FONT",
    "CHAR_TO_INDEX",
    "decode_cell",
    "render_word_bitmap",
]


def glyph_bitmap(index: int) -> np.ndarray:
    """Return the 7x5 uint8 bitmap of glyph ``index`` (0..N_GLYPHS-1)."""
    if not 0 <= index < N_GLYPHS:
        raise ValueError(f"glyph index out of range: {index}")
    bm = np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    # border ring
    bm[0, :] = 1
    bm[-1, :] = 1
    bm[:, 0] = 1
    bm[:, -1] = 1
    # interior: rows 1..5 x cols 1..3, row-major bit layout
    value = index + GLYPH_VALUE_OFFSET
    for bit in range(INTERIOR_BITS):
        if (value >> bit) & 1:
            bm[1 + bit // 3, 1 + bit % 3] = 1
    return bm


FONT: dict[int, np.ndarray] = {i: glyph_bitmap(i) for i in range(N_GLYPHS)}
CHAR_TO_INDEX: dict[str, int] = {
    **{c: i for i, c in enumerate(ALPHABET)},
    **{c: RTL_START + i for i, c in enumerate(RTL_ALPHABET)},
}
INDEX_TO_CHAR: dict[int, str] = {i: c for c, i in CHAR_TO_INDEX.items()}


def decode_cell(cell: np.ndarray) -> int | None:
    """Decode one 7x5 binary cell to a glyph index, or None if invalid.

    A cell is valid iff its border ring is fully set and the interior bits
    decode to a value in the font's range. This is an exact pattern match —
    the decoder never guesses.
    """
    if cell.shape != (GLYPH_H, GLYPH_W):
        return None
    if not (
        cell[0, :].all()
        and cell[-1, :].all()
        and cell[:, 0].all()
        and cell[:, -1].all()
    ):
        return None
    value = 0
    for bit in range(INTERIOR_BITS):
        if cell[1 + bit // 3, 1 + bit % 3]:
            value |= 1 << bit
    index = value - GLYPH_VALUE_OFFSET
    if 0 <= index < N_GLYPHS:
        return index
    return None


# interior bit j lives at (1 + j//3, 1 + j%3): a row-major flatten of the
# 5x3 interior yields exactly bit order 0..14
_BIT_WEIGHTS = np.array([1 << j for j in range(INTERIOR_BITS)], dtype=np.int64)


def decode_cells(band: np.ndarray, xs: list[int]) -> np.ndarray:
    """Vectorized decode of the 7x5 cells of one line band starting at
    columns ``xs``. Returns int array of glyph indices with -1 for invalid
    cells — semantics identical to decode_cell, ~10x faster."""
    cells = np.stack([band[:, x : x + GLYPH_W] for x in xs]).astype(bool)
    border_ok = (
        cells[:, 0, :].all(axis=1)
        & cells[:, -1, :].all(axis=1)
        & cells[:, :, 0].all(axis=1)
        & cells[:, :, -1].all(axis=1)
    )
    interior = cells[:, 1:-1, 1:-1].reshape(len(xs), INTERIOR_BITS)
    values = interior.astype(np.int64) @ _BIT_WEIGHTS
    idx = values - GLYPH_VALUE_OFFSET
    idx[~border_ok | (idx < 0) | (idx >= N_GLYPHS)] = -1
    return idx


def word_glyph_indices(text: str, unk: bool) -> list[int]:
    """Glyph index sequence for a word; unknown-coords words are rendered
    with a leading UNK marker glyph (the marker is stripped from the decoded
    text and makes the decoder report a full-page bbox, which the coords
    sentinel rule then turns into '0,0 0,0' — the reference's unlocatable
    word case, tesseract-recognize.cc:160-161, 816-858)."""
    idxs = [CHAR_TO_INDEX[c] for c in text]
    return [UNK_INDEX, *idxs] if unk else idxs


def word_width(n_glyphs: int) -> int:
    """Rendered pixel width of a word of n glyphs (pitch 6, last col kept)."""
    return n_glyphs * (GLYPH_W + 1) - 1


def render_word_bitmap(glyphs: list[int]) -> np.ndarray:
    """Render a word as a 7 x word_width(n) bitmap."""
    out = np.zeros((GLYPH_H, word_width(len(glyphs))), dtype=np.uint8)
    x = 0
    for g in glyphs:
        out[:, x : x + GLYPH_W] = FONT[g]
        x += GLYPH_W + 1
    return out
