"""Deterministic media_ref → layout → raster contract.

``layout_from_ref`` derives a page layout (blocks → paragraphs → lines →
words, orientation, non-text blocks) as a pure function of the media_ref
string (sha256-seeded), and ``render_raster`` renders it into a binary
page image. The engine's decoder (operators/ocr_core.py) must recover the
layout from the pixels alone — it never sees these parameters.

This plays the role of the reference's raster inputs + Tesseract layout
analysis ground truth (tesseract-recognize.cc:513-531 image source,
:592-599 AnalyseLayout/Recognize): deterministic, so the pure-Python oracle
can compute expected spans independently while the Spark pipeline recovers
them through actual image processing.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

from tesseract_recognize_spark.constants import (
    ALPHABET,
    BLOCK_GAP,
    GLYPH_H,
    LINE_GAP,
    MARGIN,
    NONTEXT_H_BASE,
    PARA_GAP,
    RTL_ALPHABET,
    WORD_GAP,
)
from tesseract_recognize_spark.fixtures.fonts import (
    render_word_bitmap,
    word_glyph_indices,
    word_width,
)

__all__ = [
    "HashStream",
    "Word",
    "Block",
    "Layout",
    "layout_from_ref",
    "layout_geometry",
    "render_upright",
    "render_raster",
]

# NONTEXT_H_BASE (solid-rectangle height encoding for non-text block types)
# lives in constants.py with the rest of the raster contract and is
# re-exported here for the decoder's existing import path.


class HashStream:
    """Deterministic byte stream: sha256(seed || counter) blocks.

    Platform-independent replacement for random.Random so layouts are
    identical across any Python/numpy version (bit-exactness requirement).
    """

    def __init__(self, seed: str) -> None:
        self._seed = seed.encode("utf-8")
        self._counter = 0
        self._buf = b""

    def _refill(self) -> None:
        h = hashlib.sha256(self._seed + b"|" + str(self._counter).encode())
        self._counter += 1
        self._buf += h.digest()

    def u(self, n: int) -> int:
        """Uniform-ish int in [0, n) from the next 4 bytes (n <= 2**16)."""
        if n <= 0:
            raise ValueError("n must be positive")
        while len(self._buf) < 4:
            self._refill()
        raw = int.from_bytes(self._buf[:4], "big")
        self._buf = self._buf[4:]
        return raw % n


@dataclass
class Word:
    text: str       # decoded text (marker glyph excluded)
    unk: bool       # True → rendered with UNK marker; coords become sentinel


@dataclass
class Block:
    block_type: int                 # 1 = flowing text; 9..14 = non-text
    paras: list[list[list[Word]]] = field(default_factory=list)
    nontext_width: int = 0          # solid-rect width for non-text blocks
    rtl: bool = False               # RTL script block: word order mirrored

    @property
    def is_text(self) -> bool:
        return self.block_type <= 8


@dataclass
class Layout:
    orientation_k: int              # CCW 90° rotations applied to the raster
    blocks: list[Block]


def layout_from_ref(media_ref: str) -> Layout:
    """Pure function media_ref → Layout (the generator side of the contract)."""
    h = HashStream("layout:" + media_ref)
    r = h.u(10)
    orientation_k = 0 if r < 7 else r - 6  # 70% upright, 10% each rotation
    n_blocks = 1 + h.u(4)
    blocks: list[Block] = []
    for b in range(n_blocks):
        # First block is always text (guarantees orientation is detectable
        # and the page yields at least one glyph line).
        if b > 0 and h.u(100) < 15:
            btype = 9 + h.u(6)
            blocks.append(Block(block_type=btype, nontext_width=40 + h.u(160)))
            continue
        # ~10% of text blocks use the RTL script (words drawn from
        # RTL_ALPHABET, word order mirrored on the line) — exercises the
        # per-region readingDirection derivation (T4)
        rtl = h.u(10) == 0
        script = RTL_ALPHABET if rtl else ALPHABET
        paras: list[list[list[Word]]] = []
        for _ in range(1 + h.u(3)):
            lines: list[list[Word]] = []
            for _ in range(1 + h.u(5)):
                words: list[Word] = []
                for _ in range(1 + h.u(8)):
                    wlen = 1 + h.u(7)
                    text = "".join(script[h.u(len(script))] for _ in range(wlen))
                    words.append(Word(text=text, unk=h.u(100) < 8))
                lines.append(words)
            paras.append(lines)
        blocks.append(Block(block_type=1, paras=paras, rtl=rtl))
    return Layout(orientation_k=orientation_k, blocks=blocks)


def layout_geometry(layout: Layout) -> dict:
    """Compute exact upright-frame geometry for a layout.

    Returns ``{"page_w", "page_h", "blocks": [...]}`` where each text block
    carries paras → lines → word boxes, all bboxes inclusive
    ``(x0, y0, x1, y1)``. Shared by the renderer and the oracle so rendered
    pixels and expected coordinates can never diverge.
    """
    y = MARGIN
    max_x1 = 0
    blocks_geo: list[dict] = []
    for bi, block in enumerate(layout.blocks):
        if bi > 0:
            y += BLOCK_GAP
        if not block.is_text:
            rect = (MARGIN, y, MARGIN + block.nontext_width - 1,
                    y + NONTEXT_H_BASE + (block.block_type - 9) - 1)
            blocks_geo.append({"block": block, "rect": rect})
            max_x1 = max(max_x1, rect[2])
            y = rect[3] + 1
            continue
        paras_geo: list[list[dict]] = []
        for pi, para in enumerate(block.paras):
            if pi > 0:
                y += PARA_GAP
            lines_geo: list[dict] = []
            for li, line in enumerate(para):
                if li > 0:
                    y += LINE_GAP
                x = MARGIN
                words_geo: list[dict] = []
                for word in line:
                    glyphs = word_glyph_indices(word.text, word.unk)
                    w = word_width(len(glyphs))
                    words_geo.append(
                        {
                            "word": word,
                            "glyphs": glyphs,
                            "bbox": (x, y, x + w - 1, y + GLYPH_H - 1),
                        }
                    )
                    x += w + WORD_GAP
                content_w = x - WORD_GAP - MARGIN
                if block.rtl:
                    # mirror word POSITIONS within the line: reading-order
                    # word 0 sits rightmost (words_geo stays reading order)
                    for wg in words_geo:
                        x0, y0_, x1, y1_ = wg["bbox"]
                        nx0 = MARGIN + content_w - (x1 - MARGIN) - 1
                        wg["bbox"] = (nx0, y0_, nx0 + (x1 - x0), y1_)
                lx1 = max(wg["bbox"][2] for wg in words_geo)
                lines_geo.append(
                    {
                        "words": words_geo,
                        "bbox": (MARGIN, y, lx1, y + GLYPH_H - 1),
                    }
                )
                max_x1 = max(max_x1, lx1)
                y += GLYPH_H
            paras_geo.append(lines_geo)
        bbox = (
            MARGIN,
            paras_geo[0][0]["bbox"][1],
            max(l["bbox"][2] for p in paras_geo for l in p),
            paras_geo[-1][-1]["bbox"][3],
        )
        blocks_geo.append({"block": block, "paras": paras_geo, "bbox": bbox})
    page_h = y + MARGIN
    page_w = max_x1 + 1 + MARGIN
    return {"page_w": page_w, "page_h": page_h, "blocks": blocks_geo}


def render_upright(layout: Layout, geo: dict | None = None) -> np.ndarray:
    """Render the upright binary page image (uint8 0/1)."""
    geo = geo or layout_geometry(layout)
    img = np.zeros((geo["page_h"], geo["page_w"]), dtype=np.uint8)
    for bg in geo["blocks"]:
        if not bg["block"].is_text:
            x0, y0, x1, y1 = bg["rect"]
            img[y0 : y1 + 1, x0 : x1 + 1] = 1
            continue
        for para_geo in bg["paras"]:
            for line_geo in para_geo:
                for wg in line_geo["words"]:
                    x0, y0, x1, y1 = wg["bbox"]
                    img[y0 : y1 + 1, x0 : x1 + 1] = render_word_bitmap(wg["glyphs"])
    return img


def render_raster(media_ref: str) -> np.ndarray:
    """media_ref → oriented binary raster (what the engine's decoder sees)."""
    layout = layout_from_ref(media_ref)
    upright = render_upright(layout)
    return np.rot90(upright, layout.orientation_k) if layout.orientation_k else upright
