"""Font contract: distinctness, exact decode, orientation unambiguity."""

import numpy as np

from tesseract_recognize_spark.constants import (
    GLYPH_VALUE_OFFSET,
    INTERIOR_BITS,
    N_GLYPHS,
)
from tesseract_recognize_spark.fixtures.fonts import (
    FONT,
    decode_cell,
    glyph_bitmap,
    render_word_bitmap,
    word_glyph_indices,
)


def test_glyphs_distinct_and_roundtrip():
    seen = set()
    for i in range(N_GLYPHS):
        bm = glyph_bitmap(i)
        key = bm.tobytes()
        assert key not in seen
        seen.add(key)
        assert decode_cell(bm) == i


def test_border_ring_fully_set():
    for bm in FONT.values():
        assert bm[0, :].all() and bm[-1, :].all()
        assert bm[:, 0].all() and bm[:, -1].all()


def test_no_blank_column_inside_glyph():
    for bm in FONT.values():
        assert bm.any(axis=0).all()


def test_180_rotation_never_decodes():
    """The interior-bit offset guarantees a flipped glyph is invalid —
    the basis of unambiguous orientation detection."""
    for i in range(N_GLYPHS):
        flipped = np.rot90(glyph_bitmap(i), 2)
        assert decode_cell(flipped) is None


def test_90_rotation_never_decodes():
    for i in range(N_GLYPHS):
        rot = np.rot90(glyph_bitmap(i))
        assert decode_cell(rot) is None  # wrong shape


def test_interior_value_range():
    assert GLYPH_VALUE_OFFSET + N_GLYPHS - 1 < 2**6
    assert INTERIOR_BITS == 15


def test_word_bitmap_shape():
    glyphs = word_glyph_indices("abc", unk=False)
    bm = render_word_bitmap(glyphs)
    assert bm.shape == (7, 3 * 6 - 1)
    glyphs_unk = word_glyph_indices("abc", unk=True)
    assert len(glyphs_unk) == 4
