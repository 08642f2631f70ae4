"""Mock-OCR expansion stage: media span rows → structured span rows.

The single custom "UDTF" of the engine (SURVEY.md §2.3): an Arrow-batched
``mapInPandas`` that resolves each media_ref to a raster, decodes it by
image processing (operators/ocr_core.py) and emits the reference's
iterator-walk rows (functions/emission.py). This is the analog of the
reference's per-request subprocess (tesseract_recognize_api.py:188-198) —
but crossed once per Arrow batch instead of once per document.

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

import pandas as pd

from pyspark.sql import DataFrame

from tesseract_recognize_spark.config import ExtractConfig
from tesseract_recognize_spark.functions.emission import emit_page_rows
from tesseract_recognize_spark.operators.ocr_core import DecodeError, decode_raster
from tesseract_recognize_spark.schemas import MEDIA_ROWS_SCHEMA
from tesseract_recognize_spark.sources.media import resolve_media

__all__ = ["ocr_expand"]

_OUT_COLS = [f.name for f in MEDIA_ROWS_SCHEMA.fields]


def _expand_batch(
    pdf: pd.DataFrame, cfg: ExtractConfig, resolver, save_crops_dir=None
) -> pd.DataFrame:
    crop_mode = "crop_id" in pdf.columns
    out: list[dict] = []
    for i, (doc_id, offset, media_ref, media_idx, n_media) in enumerate(zip(
        pdf["doc_id"], pdf["offset"], pdf["media_ref"],
        pdf["media_idx"], pdf["n_media"],
    )):
        base = dict(
            doc_id=doc_id,
            offset=int(offset),
            media_ref=media_ref,
            error=None,
        )
        try:
            raster = resolver(media_ref)
            crop = None
            if crop_mode:
                r = pdf.iloc[i]
                cx0, cy0 = int(r["crop_x0"]), int(r["crop_y0"])
                cx1, cy1 = int(r["crop_x1"]), int(r["crop_y1"])
                full_h, full_w = raster.shape
                # the reference's page.crop(): cut the sub-raster, remember
                # its offset (tesseract-recognize.cc:438-441)
                raster = raster[cy0 : cy1 + 1, cx0 : cx1 + 1]
                crop = {
                    "crop_id": r["crop_id"],
                    "x": cx0,
                    "y": cy0,
                    "seq": int(r["crop_seq"]),
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
                            f"crop_{safe}_{int(offset)}_{r['crop_id']}.npy",
                        ),
                        raster,
                    )
            page = decode_raster(raster)
            rows = emit_page_rows(
                page, cfg, int(media_idx), int(n_media), crop=crop
            )
            if crop is not None:
                for row in rows:
                    # Page dims stay the PAGE's (coords are page-frame after
                    # the offset add-back), not the crop's
                    row["page_w"], row["page_h"] = full_w, full_h
        except DecodeError as exc:  # quarantine, don't fail the task
            out.append(
                dict(
                    base,
                    sub_order=-1,
                    level="error",
                    block_type=None,
                    region_id=None,
                    line_id=None,
                    word_idx=None,
                    glyph_idx=None,
                    text="",
                    conf=None,
                    x0=None, y0=None, x1=None, y1=None,
                    full_page=False,
                    b1x=None, b1y=None, b2x=None, b2y=None,
                    baseline_clipped=None,
                    poly_height=None, poly_offset=None,
                    page_w=None, page_h=None,
                    orientation_k=None, osd_angle=None,
                    reading_direction=None, textline_order=None,
                    deskew=None,
                    error=str(exc),
                )
            )
            continue
        for r in rows:
            out.append(dict(base, **r))
    # dict-of-lists construction: pd.DataFrame(list-of-dicts) does per-cell
    # type inference and is ~2x slower on this hot path
    data = {c: [r.get(c) for r in out] for c in _OUT_COLS}
    return pd.DataFrame(data, columns=_OUT_COLS)


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

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _expand_batch(pdf, cfg, resolver, save_crops_dir)

    return media_spans.mapInPandas(fn, schema=MEDIA_ROWS_SCHEMA)
