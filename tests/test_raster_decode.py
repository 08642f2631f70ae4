"""Renderer ↔ decoder roundtrip: the mock-OCR inverse property.

The decoder sees only pixels; the layout parameters it must recover come
from an independent derivation (fixtures/raster.py). Property-style over a
seeded ref corpus (FIXTURES.md §3)."""

import numpy as np
import pytest

from tesseract_recognize_spark.fixtures.raster import (
    layout_from_ref,
    layout_geometry,
    render_raster,
)
from tesseract_recognize_spark.operators.ocr_core import DecodeError, decode_raster

REFS = [f"media://t-{i:04d}/0#{i * 13:05x}" for i in range(120)]


@pytest.mark.parametrize("ref", REFS[:40])
def test_roundtrip_exact(ref):
    layout = layout_from_ref(ref)
    geo = layout_geometry(layout)
    page = decode_raster(render_raster(ref))
    assert page["orientation_k"] == layout.orientation_k
    assert (page["page_w"], page["page_h"]) == (geo["page_w"], geo["page_h"])
    assert len(page["blocks"]) == len(geo["blocks"])
    for db, gb in zip(page["blocks"], geo["blocks"]):
        blk = gb["block"]
        if not blk.is_text:
            assert db["block_type"] == blk.block_type
            assert db["bbox"] == gb["rect"]
            continue
        assert db["bbox"] == gb["bbox"]
        for dp, gp in zip(db["paras"], gb["paras"]):
            assert len(dp) == len(gp)
            for dl, gl in zip(dp, gp):
                assert dl["bbox"] == gl["bbox"]
                texts = [w["text"] for w in dl["words"]]
                assert texts == [w["word"].text for w in gl["words"]]
                unks = [w["unk"] for w in dl["words"]]
                assert unks == [w["word"].unk for w in gl["words"]]


def test_roundtrip_bulk():
    for ref in REFS:
        layout = layout_from_ref(ref)
        page = decode_raster(render_raster(ref))
        assert page["orientation_k"] == layout.orientation_k
        got = [
            w["text"]
            for b in page["blocks"]
            if b["paras"]
            for p in b["paras"]
            for ln in p
            for w in ln["words"]
        ]
        want = [
            w.text
            for b in layout.blocks
            if b.is_text
            for p in b.paras
            for ln in p
            for w in ln
        ]
        assert got == want


def test_all_orientations_covered():
    ks = {layout_from_ref(r).orientation_k for r in REFS}
    assert ks == {0, 1, 2, 3}


def test_invalid_raster_raises():
    with pytest.raises(DecodeError):
        decode_raster(np.ones((13, 13), dtype=np.uint8))


def test_empty_raster_raises():
    with pytest.raises(DecodeError):
        decode_raster(np.zeros((50, 50), dtype=np.uint8))
