"""--density analog: a k*300-dpi run recognizes identical content with all
geometry in the k*-scaled frame (reference tesseract-recognize.cc:45,542)."""

from __future__ import annotations

import pytest

from tesseract_recognize_spark.config import ExtractConfig
from tesseract_recognize_spark.fixtures.generator import (
    gen_documents,
    write_documents_parquet,
)
from tesseract_recognize_spark.plans.pipeline import extract

pytestmark = pytest.mark.spark


def test_density_validation():
    with pytest.raises(ValueError, match="density"):
        ExtractConfig(density=150)
    with pytest.raises(ValueError, match="density"):
        ExtractConfig(density=301)
    ExtractConfig(density=600)  # ok


def test_density_scales_geometry_only(spark, tmp_path):
    docs = gen_documents(12, seed=9)
    p = str(tmp_path / "docs.parquet")
    write_documents_parquet(docs, p)
    ddf = spark.read.parquet(p)

    base = extract(ddf, ExtractConfig(media_partitions=2)).collect()
    scaled = extract(
        ddf, ExtractConfig(media_partitions=2, density=600)
    ).collect()
    assert len(base) == len(scaled)

    k = {(r["doc_id"], r["order"]): r for r in base}
    for s in scaled:
        b = k[(s["doc_id"], s["order"])]
        # content + structure identical
        for c in ("kind", "text", "media_ref", "level", "region_id",
                  "line_id", "conf", "orientation_k", "reading_direction"):
            assert s[c] == b[c], c
        # page dims double exactly
        for c in ("page_w", "page_h"):
            assert s[c] == (None if b[c] is None else b[c] * 2), c
        # inclusive pixel geometry: a primitive coordinate p at canonical
        # dpi maps into {2p, 2p+1} at 2x density (min edge -> 2p, max edge
        # -> 2p+1); geometry DERIVED from several primitives (baseline
        # clips, polystripe corners, rotated frames) accumulates one pixel
        # per composed inclusive edge — drift stays within a few pixels of
        # exact 2x, and never shrinks below 2x-1
        for c in ("b1x", "b1y", "b2x", "b2y", "poly_height", "poly_offset"):
            if b[c] is not None:
                assert 2 * b[c] - 1 - 1e-9 <= s[c] <= 2 * b[c] + 4 + 1e-9, c
        if b["coords"] is not None:
            # every polygon point p maps near {2p, 2p+1} (which depends on
            # whether it references a min or a max pixel edge; polystripe
            # points compose two edges, widening the band slightly)
            bx = [pt["x"] for pt in b["coords"]]
            by = [pt["y"] for pt in b["coords"]]
            sx = [pt["x"] for pt in s["coords"]]
            sy = [pt["y"] for pt in s["coords"]]
            for got, base_v in zip(sx + sy, bx + by):
                assert 2 * base_v - 1 <= got <= 2 * base_v + 4
