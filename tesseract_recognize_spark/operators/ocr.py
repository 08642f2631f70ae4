"""Mock-OCR expansion stage: media span rows → structured span rows.

The single custom "UDTF" of the engine (SURVEY.md §2.3): an Arrow-batched
``mapInArrow`` that resolves each media_ref to a raster, decodes it by
image processing (operators/ocr_core.py) and emits the reference's
iterator-walk rows (functions/emission.py). This is the analog of the
reference's per-request subprocess (tesseract_recognize_api.py:188-198) —
but crossed once per Arrow batch instead of once per document.

mapInArrow (not mapInPandas): output RecordBatches are assembled straight
from Python column lists via ``pa.array`` — no pandas DataFrame is ever
materialized on either side of the boundary. The round-2 profile put the
pandas↔arrow conversion at ~1.5 of 5.3 ms/page; cutting it both lowers
absolute cost AND memory-bandwidth pressure, the term that inflated
per-core CPU at 32 resident workers (BENCH/BASELINE.md analysis).

No shuffle happens here: each media span is an independent work item, so
the stage is embarrassingly parallel; skew is handled upstream by
repartitioning on (doc_id, offset) so a media-heavy document's spans spread
across tasks (the north-star's "salting of skewed media-heavy partitions").

Failures are quarantined per the task-retry discipline (SURVEY.md §4): a
raster that violates the contract yields one level='error' row
(sub_order=-1, dropped by the T1 filter) instead of failing the partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

from tesseract_recognize_spark.config import ExtractConfig
from tesseract_recognize_spark.functions.emission import emit_page_rows
from tesseract_recognize_spark.operators.ocr_core import DecodeError, decode_raster
from tesseract_recognize_spark.schemas import MEDIA_ROWS_SCHEMA
from tesseract_recognize_spark.sources.media import resolve_media

__all__ = ["ocr_expand"]

_OUT_COLS = [f.name for f in MEDIA_ROWS_SCHEMA.fields]
# columns produced by emit_page_rows; the 4 carried-through base columns
# (doc_id / offset / media_ref / error) are filled by repetition instead of
# per-row dict merges
_BASE_COLS = ("doc_id", "offset", "media_ref", "error")
_EMIT_COLS = [c for c in _OUT_COLS if c not in _BASE_COLS]

def _scale_page(page: dict, k: int) -> dict:
    """density analog (reference --density, tesseract-recognize.cc:45,542):
    re-express the decoded upright-frame geometry at a k*300-dpi render.
    A pixel [x0..x1] (inclusive) at the canonical dpi covers
    [k*x0 .. k*x1 + k-1] in the k*-scaled render; scaling the page dict
    BEFORE emission keeps every downstream computation (rotation to raster
    frame, baseline clip, polystripe, T3/P1/P2/P3) frame-coherent."""

    def box(b):
        if b is None:
            return None
        x0, y0, x1, y1 = b
        return (k * x0, k * y0, k * x1 + k - 1, k * y1 + k - 1)

    out = dict(page)
    out["page_w"] = page["page_w"] * k
    out["page_h"] = page["page_h"] * k
    blocks = []
    for blk in page["blocks"]:
        nb = dict(blk, bbox=box(blk["bbox"]))
        if blk.get("paras"):
            nb["paras"] = [
                [
                    dict(
                        line,
                        bbox=box(line["bbox"]),
                        words=[
                            dict(
                                w,
                                bbox=box(w["bbox"]),
                                glyph_bboxes=[
                                    box(g) for g in w["glyph_bboxes"]
                                ],
                            )
                            for w in line["words"]
                        ],
                    )
                    for line in para
                ]
                for para in blk["paras"]
            ]
        blocks.append(nb)
    out["blocks"] = blocks
    return out


def _expand_columns(
    cols: dict[str, list], cfg: ExtractConfig, resolver, save_crops_dir=None
) -> dict[str, list]:
    """Column lists in → column lists out (one output element per emitted
    span row). Pure Python — shared by the Arrow stage and unit tests."""
    crop_mode = "crop_id" in cols
    k_density = cfg.density // 300
    out: list[dict] = []
    doc_col: list = []
    off_col: list = []
    ref_col: list = []
    err_col: list = []
    for i in range(len(cols["doc_id"])):
        doc_id = cols["doc_id"][i]
        offset = int(cols["offset"][i])
        media_ref = cols["media_ref"][i]
        err = None
        try:
            raster = resolver(media_ref)
            crop = None
            if crop_mode:
                cx0, cy0 = int(cols["crop_x0"][i]), int(cols["crop_y0"][i])
                cx1, cy1 = int(cols["crop_x1"][i]), int(cols["crop_y1"][i])
                full_h, full_w = raster.shape
                # the reference's page.crop(): cut the sub-raster, remember
                # its offset (tesseract-recognize.cc:438-441)
                raster = raster[cy0 : cy1 + 1, cx0 : cx1 + 1]
                crop = {
                    "crop_id": cols["crop_id"][i],
                    "x": cx0,
                    "y": cy0,
                    "seq": int(cols["crop_seq"][i]),
                }
                if save_crops_dir:
                    # K3 debug sink (reference --save-crops,
                    # tesseract-recognize.cc:551-555): executor-local .npy
                    # dumps of the cut rasters — dev-only, like the original
                    import os

                    import numpy as np

                    os.makedirs(save_crops_dir, exist_ok=True)
                    safe = str(doc_id).replace("/", "_")
                    np.save(
                        os.path.join(
                            save_crops_dir,
                            f"crop_{safe}_{offset}_{crop['crop_id']}.npy",
                        ),
                        raster,
                    )
            page = decode_raster(raster)
            if k_density > 1:
                page = _scale_page(page, k_density)
            rows = emit_page_rows(
                page, cfg, int(cols["media_idx"][i]),
                int(cols["n_media"][i]), crop=crop,
            )
            if crop is not None:
                for row in rows:
                    # Page dims stay the PAGE's (coords are page-frame after
                    # the offset add-back), not the crop's
                    row["page_w"], row["page_h"] = full_w, full_h
        except DecodeError as exc:  # quarantine, don't fail the task
            err = str(exc)
            rows = [
                dict(
                    sub_order=-1, level="error", text="", full_page=False
                )
            ]
        out.extend(rows)
        n = len(rows)
        doc_col += [doc_id] * n
        off_col += [offset] * n
        ref_col += [media_ref] * n
        err_col += [err] * n
    data = {c: [r.get(c) for r in out] for c in _EMIT_COLS}
    data["doc_id"] = doc_col
    data["offset"] = off_col
    data["media_ref"] = ref_col
    data["error"] = err_col
    return data


def ocr_expand(
    media_spans: DataFrame,
    cfg: ExtractConfig,
    resolver=None,
    save_crops_dir: str | None = None,
) -> DataFrame:
    """media span rows (doc_id, offset, media_ref, media_idx, n_media) →
    structured rows per MEDIA_ROWS_SCHEMA (raster-frame geometry).

    ``resolver`` (media_ref → raster ndarray) is captured in the UDF
    closure so it ships to the Python workers via cloudpickle — a
    driver-side registry would NOT propagate (workers import modules
    fresh). Defaults to sources/media.resolve_media.
    """
    resolver = resolver or resolve_media
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(MEDIA_ROWS_SCHEMA)
    in_cols = [
        "doc_id", "offset", "media_ref", "media_idx", "n_media",
        "crop_id", "crop_x0", "crop_y0", "crop_x1", "crop_y1", "crop_seq",
    ]

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = set(batch.schema.names)
            cols = {
                c: batch.column(c).to_pylist()
                for c in in_cols
                if c in names
            }
            data = _expand_columns(cols, cfg, resolver, save_crops_dir)
            arrays = [
                pa.array(data[f.name], type=f.type) for f in arrow_schema
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return media_spans.mapInArrow(fn, schema=MEDIA_ROWS_SCHEMA)
