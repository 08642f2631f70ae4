"""Emission semantics: trim, ID scheme, gating, post-pass reference impls.

All pure-Python (no Spark) — these pin the single-threaded semantics the
distributed pipeline must reproduce."""

import pytest

from tesseract_recognize_spark.config import ExtractConfig
from tesseract_recognize_spark.fixtures.raster import Block, Layout, Word
from tesseract_recognize_spark.functions.emission import emit_page_rows
from tesseract_recognize_spark.oracle.oracle import (
    expected_spans,
    page_struct_from_layout,
    trim,
)
from tesseract_recognize_spark.oracle.reference_ops import (
    p1_apply_orientation,
    p3_fill_word_coords,
    t1_filter,
    t3_coords,
)


# --- trim (T9, tesseract-recognize.cc:205-212) ---------------------------

@pytest.mark.parametrize(
    "raw,want",
    [
        ("  hello  ", "hello"),
        ("\t\n a  b \n\t", "a  b"),          # internal runs preserved
        ("", ""),
        ("   \t  ", ""),                       # whitespace-only → empty
        ("no-ws", "no-ws"),
        (" \n x", "x"),
    ],
)
def test_trim_reference_semantics(raw, want):
    assert trim(raw) == want


# --- layout helpers -------------------------------------------------------

def _mk_layout(k=0, blocks=None):
    if blocks is None:
        blocks = [
            Block(
                block_type=1,
                paras=[
                    [[Word("ab", False), Word("c", False)]],
                    [[Word("de", False)], [Word("fg", False)]],
                ],
            )
        ]
    return Layout(orientation_k=k, blocks=blocks)


def _emit(layout, cfg, page_num=1, n_pages=1):
    return emit_page_rows(page_struct_from_layout(layout), cfg, page_num, n_pages)


# --- ID scheme (tesseract-recognize.cc:657-670, 709-727) ------------------

def test_id_scheme_single_page():
    rows = _emit(_mk_layout(), ExtractConfig())
    regions = [r for r in rows if r["level"] == "region"]
    lines = [r for r in rows if r["level"] == "line"]
    assert [r["region_id"] for r in regions] == ["b1"]
    assert [r["line_id"] for r in lines] == ["b1_p1_l1", "b1_p2_l1", "b1_p2_l2"]


def test_id_scheme_multipage_prefix():
    rows = _emit(_mk_layout(), ExtractConfig(), page_num=3, n_pages=4)
    assert [r["region_id"] for r in rows if r["level"] == "region"] == ["pg3_b1"]
    assert [r["line_id"] for r in rows if r["level"] == "line"][0] == "pg3_b1_p1_l1"


def test_id_scheme_crop_prefix():
    rows = _emit(_mk_layout(), ExtractConfig(crop_id="r7"))
    assert [r["region_id"] for r in rows if r["level"] == "region"] == ["r7_b1"]


def test_nontext_blocks_skip_counter():
    blocks = [
        Block(block_type=1, paras=[[[Word("aa", False)]]]),
        Block(block_type=11, nontext_width=50),
        Block(block_type=1, paras=[[[Word("bb", False)]]]),
    ]
    rows = _emit(_mk_layout(blocks=blocks), ExtractConfig())
    kept = t1_filter(rows)
    # the non-text block emitted a droppable row but didn't bump the counter
    assert [r["region_id"] for r in rows if r["level"] == "region"] == [
        "b1", None, "b2"
    ]
    assert [r["region_id"] for r in kept if r["level"] == "region"] == ["b1", "b2"]
    assert [r["sub_order"] for r in kept] == list(range(len(kept)))


# --- level / text gating (tesseract-recognize.cc:632,678,733,752,763) -----

def test_layout_level_gating():
    for level, want_levels in [
        ("region", {"region"}),
        ("line", {"region", "line"}),
        ("word", {"region", "line", "word"}),
        ("glyph", {"region", "line", "word", "glyph"}),
    ]:
        cfg = ExtractConfig(layout_level=level, text_levels=(level,))
        rows = _emit(_mk_layout(), cfg)
        assert {r["level"] for r in rows} == want_levels


def test_text_level_gating():
    cfg = ExtractConfig(layout_level="word", text_levels=("line",))
    rows = _emit(_mk_layout(), cfg)
    for r in rows:
        if r["level"] == "line":
            assert r["text"] != "" and r["conf"] is not None
        else:
            assert r["text"] == "" and r["conf"] is None


def test_only_layout_suppresses_text():
    cfg = ExtractConfig(layout_level="word", text_levels=("line", "word"),
                        only_layout=True)
    rows = _emit(_mk_layout(), cfg)
    assert all(r["text"] == "" for r in rows)
    assert all(r["conf"] is None for r in rows)


def test_region_text_is_block_text():
    cfg = ExtractConfig(layout_level="region", text_levels=("region",))
    rows = _emit(_mk_layout(), cfg)
    assert rows[0]["text"] == "ab c\n\nde\nfg"


def test_glyph_rows_text():
    cfg = ExtractConfig(layout_level="glyph",
                        text_levels=("line", "word", "glyph"))
    rows = _emit(_mk_layout(), cfg)
    glyphs = [r for r in rows if r["level"] == "glyph"]
    assert "".join(g["text"] for g in glyphs) == "abcdefg"
    assert [g["glyph_idx"] for g in glyphs] == [0, 1, 0, 0, 1, 0, 1]


# --- order / oracle end-to-end --------------------------------------------

def test_expected_spans_interleaves_by_offset():
    spans = [
        {"kind": "text", "text": " a ", "media_ref": "", "offset": 2},
        {"kind": "text", "text": "b", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "media://x/0#s", "offset": 1},
    ]
    rows = expected_spans("d", spans)
    assert rows[0]["text"] == "b" and rows[0]["order"] == 0
    assert rows[-1]["text"] == "a"
    assert [r["order"] for r in rows] == list(range(len(rows)))
    media = [r for r in rows if r["kind"] == "media"]
    assert all(r["media_ref"] == "media://x/0#s" for r in media)


def test_unk_word_gets_sentinel_then_filled():
    blocks = [Block(block_type=1, paras=[[[
        Word("aa", False), Word("xx", True), Word("bb", False)
    ]]])]
    cfg = ExtractConfig()
    rows = t1_filter(_emit(_mk_layout(blocks=blocks), cfg))
    t3_coords(rows)
    words = [r for r in rows if r["level"] == "word"]
    assert len(words[1]["coords"]) == 2          # sentinel before fill
    p1_apply_orientation(rows)
    p3_fill_word_coords(rows)
    # both-neighbor quad: [pre[1], fol[0], fol[3], pre[2]]
    pre, mid, fol = words
    assert mid["coords"] == [
        pre["coords"][1], fol["coords"][0], fol["coords"][3], pre["coords"][2]
    ]
    assert mid["coords_filled"] is True
