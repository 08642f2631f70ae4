"""Mock-OCR decoder: binary raster → page structure, by image processing only.

This is the engine's stand-in for Tesseract's AnalyseLayout + Recognize
(reference tesseract-recognize.cc:592-599): it sees only pixels and recovers

  orientation (OSD)        — decode-validation over the 4 rotations
  block segmentation       — projection-profile XY-cut on blank-row gaps
  paragraph / line split   — gap-height classification (3/6/12 px)
  word / glyph split       — blank-column gaps (1 px glyph, 4 px word)
  recognition              — exact 5x7 glyph pattern match

It never sees the layout parameters; the fixtures' renderer and the oracle
derive those independently, which is what makes the end-to-end equality test
meaningful.
"""

from __future__ import annotations

import numpy as np

from tesseract_recognize_spark.constants import (
    BLOCK_GAP,
    GLYPH_H,
    GLYPH_W,
    LINE_GAP,
    PARA_GAP,
    RTL_START,
    UNK_INDEX,
)
from tesseract_recognize_spark.fixtures.fonts import INDEX_TO_CHAR, decode_cells
from tesseract_recognize_spark.fixtures.raster import NONTEXT_H_BASE

__all__ = ["decode_raster", "DecodeError"]


class DecodeError(Exception):
    """Raster does not conform to the mock-OCR contract in any orientation."""


def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    """Inclusive (start, end) runs of True values in a 1-D mask."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate(([idx[0]], idx[breaks + 1]))
    ends = np.concatenate((idx[breaks], [idx[-1]]))
    return list(zip(starts.tolist(), ends.tolist()))


def _decode_line(img: np.ndarray, y0: int, y1: int) -> dict | None:
    """Decode one 7px-high text line: words, glyphs, bboxes. None = invalid."""
    band = img[y0 : y1 + 1]
    col_runs = _runs(band.any(axis=0))
    if not col_runs:
        return None
    # group glyph cells (width exactly 5, gaps of 1 inside a word, 4 between)
    cells: list[list[tuple[int, int]]] = [[]]  # words → list of cell x-ranges
    prev_end = None
    for cx0, cx1 in col_runs:
        if cx1 - cx0 + 1 != GLYPH_W:
            return None
        if prev_end is not None:
            gap = cx0 - prev_end - 1
            if gap == 4:
                cells.append([])
            elif gap != 1:
                return None
        cells[-1].append((cx0, cx1))
        prev_end = cx1
    all_idx = decode_cells(band, [cx0 for cx0, _ in col_runs])
    if (all_idx < 0).any():
        return None
    words = []
    pos = 0
    for word_cells in cells:
        glyphs = all_idx[pos : pos + len(word_cells)]
        pos += len(word_cells)
        unk = glyphs[0] == UNK_INDEX
        body = glyphs[1:] if unk else glyphs
        if (body == UNK_INDEX).any():  # marker is only valid word-initial
            return None
        text_cells = word_cells[1:] if unk else word_cells
        words.append(
            {
                "text": "".join(INDEX_TO_CHAR[g] for g in body.tolist()),
                "unk": bool(unk),
                "bbox": (word_cells[0][0], y0, word_cells[-1][1], y1),
                "glyph_bboxes": [(cx0, y0, cx1, y1) for cx0, cx1 in text_cells],
            }
        )
    # script detection → reading direction (the mock analog of Tesseract's
    # writing_direction feeding the reference's per-region readingDirection,
    # tesseract-recognize.cc:682-706): RTL-script glyphs mean the words were
    # laid out right-to-left, so READING order reverses the positional order
    rtl = bool((all_idx >= RTL_START).any())
    if rtl:
        words.reverse()
    return {
        "bbox": (col_runs[0][0], y0, col_runs[-1][1], y1),
        "words": words,
        "rtl": rtl,
    }


def _try_decode(img: np.ndarray) -> dict | None:
    """Attempt a full-page decode of an upright candidate; None = reject."""
    page_h, page_w = img.shape
    row_runs = _runs(img.any(axis=1))
    if not row_runs:
        return None
    items: list[dict] = []  # {"kind": "line"|"nontext", ...}
    prev_end = None
    for ry0, ry1 in row_runs:
        gap = None if prev_end is None else ry0 - prev_end - 1
        if gap is not None and gap not in (LINE_GAP, PARA_GAP, BLOCK_GAP):
            return None
        h = ry1 - ry0 + 1
        if h == GLYPH_H:
            line = _decode_line(img, ry0, ry1)
            if line is None:
                return None
            items.append({"kind": "line", "gap": gap, "line": line})
        elif NONTEXT_H_BASE <= h < NONTEXT_H_BASE + 6:
            band = img[ry0 : ry1 + 1]
            crs = _runs(band.any(axis=0))
            if len(crs) != 1:
                return None
            cx0, cx1 = crs[0]
            if not band[:, cx0 : cx1 + 1].all():
                return None
            if gap is not None and gap != BLOCK_GAP:
                return None
            items.append(
                {
                    "kind": "nontext",
                    "gap": gap,
                    "block_type": 9 + (h - NONTEXT_H_BASE),
                    "rect": (cx0, ry0, cx1, ry1),
                }
            )
        else:
            return None
        prev_end = ry1
    # a non-text item must also be followed by a block gap
    for i, it in enumerate(items[:-1]):
        if it["kind"] == "nontext" and items[i + 1]["gap"] != BLOCK_GAP:
            return None

    # assemble blocks → paragraphs → lines from the gap classification
    blocks: list[dict] = []
    for it in items:
        gap = it["gap"]
        new_block = gap is None or gap == BLOCK_GAP or it["kind"] == "nontext"
        if it["kind"] == "nontext":
            blocks.append(
                {"block_type": it["block_type"], "bbox": it["rect"], "paras": None}
            )
            continue
        if new_block or blocks[-1]["paras"] is None:
            blocks.append({"block_type": 1, "bbox": None, "paras": [[]]})
        elif gap == PARA_GAP:
            blocks[-1]["paras"].append([])
        blocks[-1]["paras"][-1].append(it["line"])
    for blk in blocks:
        if blk["paras"] is not None:
            lines = [ln for para in blk["paras"] for ln in para]
            blk["bbox"] = (
                min(ln["bbox"][0] for ln in lines),
                lines[0]["bbox"][1],
                max(ln["bbox"][2] for ln in lines),
                lines[-1]["bbox"][3],
            )
            # region reading direction = its lines' script direction
            blk["rtl"] = any(ln["rtl"] for ln in lines)
    # require at least one decoded glyph for orientation unambiguity
    if not any(b["paras"] for b in blocks):
        return None
    return {"page_w": page_w, "page_h": page_h, "blocks": blocks}


def decode_raster(raster: np.ndarray) -> dict:
    """Decode a raster, detecting orientation by decode validation.

    Tries the 4 derotations in order k=0..3 and returns the first fully
    valid decode — the mock analog of Tesseract OSD
    (tesseract-recognize.cc:601-617). The font's interior-bit encoding makes
    a wrong orientation fail glyph validation (see fixtures/fonts.py).

    Returns ``{"orientation_k", "page_w", "page_h", "blocks": [...]}`` with
    all geometry in the upright frame.
    """
    for k in range(4):
        upright = np.rot90(raster, -k) if k else raster
        page = _try_decode(np.ascontiguousarray(upright))
        if page is not None:
            page["orientation_k"] = k
            return page
    raise DecodeError("unrecognized raster: no orientation yields a valid decode")
