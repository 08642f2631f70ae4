"""The end-to-end extraction plan (SURVEY.md §3.4).

    documents ──explode (native, no shuffle)──┬── text branch: native trim
                                              └── media branch:
                                                    repartition(doc_id, offset)   ← skew salting
                                                    mapInArrow mock-OCR           ← the one UDF
                                                    T1 filter (native)
                                                    T3 corners (native)
               union ── repartition(doc_id) ── P1 ── P2 ── P3 ── order window ── sink

Shuffle accounting (the 100-TB argument): exactly two exchanges —
(1) the salting repartition that spreads media-heavy documents across tasks
BEFORE the expensive OCR stage, and (2) one hash exchange on doc_id that
serves ALL downstream window operators (P2 partitions by (doc_id, offset),
P3 by (doc_id, offset, line_id), order by (doc_id) — hash(doc_id) clusters
all of them, so Catalyst inserts sorts but no further exchanges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tesseract_recognize_spark.config import DEFAULT_CONFIG, ExtractConfig
from tesseract_recognize_spark.operators.explode import (
    explode_spans,
    parse_pages_set,
)
from tesseract_recognize_spark.operators.normalize import (
    normalize_text_spans,
    trim_text,
)
from tesseract_recognize_spark.operators.ocr import ocr_expand
from tesseract_recognize_spark.operators.postpass import (
    build_coords_array,
    p1_apply_orientation,
    p2_dominant_baselines,
    p3_fill_word_coords,
    t1_block_filter,
    t3_coords,
)
from tesseract_recognize_spark.schemas import FINAL_COLUMNS

__all__ = ["extract", "extract_crops", "canonical_projection"]


def extract(
    docs_df: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    ordered: bool = False,
    resolver=None,
    pages: str | frozenset[int] | None = None,
    media_overrides: DataFrame | None = None,
) -> DataFrame:
    """documents(doc_id, spans) → final span rows (FINAL_COLUMNS).

    ``ordered=True`` adds a global orderBy(doc_id, order) — only for small
    result inspection; the sink path keeps documents clustered and sorted
    within partitions instead (no global exchange).

    ``pages`` selects media spans by 0-based ordinal ("0-2,5" spec or a
    set) — the reference's file.pdf[0-2,5] page-set selection. The filter
    is applied to the spans array before the explode, so skipped pages
    never reach the decode stage (skip-before-decode,
    tesseract-recognize.cc:470-471,497-498) and surviving pages renumber.

    ``media_overrides`` (doc_id, offset, new_media_ref) re-points selected
    media spans to a different raster before decode — the reference's
    ``--image`` override (tesseract-recognize.cc:414-420; its companion
    guard against OSD on documents that already carry orientation state,
    cc:423-426, is structural here: the input schema carries no orientation
    state, so double-rotation cannot occur). The join broadcasts when the
    override set is small.
    """
    if isinstance(pages, str):
        pages = parse_pages_set(pages)
    spans = explode_spans(docs_df, pages=pages)

    text_rows = normalize_text_spans(spans)

    media_in = spans.filter(F.col("kind") == "media").select(
        "doc_id", "offset", "media_ref", "media_idx", "n_media"
    )
    if media_overrides is not None:
        # (doc_id, offset) must map to ONE override — the reference refuses
        # ambiguous --image usage (tesseract-recognize.cc:414-418). A
        # deterministic max-aggregate enforces the invariant without an
        # eager count action; duplicate rows with identical refs collapse
        # harmlessly, conflicting refs resolve deterministically.
        media_overrides = media_overrides.groupBy("doc_id", "offset").agg(
            F.max("new_media_ref").alias("new_media_ref")
        )
        media_in = media_in.join(
            media_overrides, ["doc_id", "offset"], "left"
        ).select(
            "doc_id", "offset",
            F.coalesce("new_media_ref", "media_ref").alias("media_ref"),
            "media_idx", "n_media",
        )
    if cfg.media_partitions:
        # salting: (doc_id, offset) hash spreads one media-heavy document
        # across many tasks before the expensive stage
        media_in = media_in.repartition(
            cfg.media_partitions, "doc_id", "offset"
        )
    media_rows = ocr_expand(media_in, cfg, resolver=resolver)
    media_rows = t1_block_filter(media_rows)
    media_rows = t3_coords(media_rows)
    # slim the shuffled row: the raster-frame ints and quarantine column are
    # consumed by T1/T3 above — dropping them here keeps them out of the
    # doc_id exchange and every window buffer downstream
    media_rows = media_rows.drop("x0", "y0", "x1", "y1", "full_page", "error")
    media_rows = media_rows.withColumn("kind", F.lit("media")).withColumn(
        "text", trim_text(F.col("text"))  # T9 applies at every level
    )

    # align the light text branch to the media schema
    media_cols = media_rows.columns
    text_full = text_rows.withColumn("kind", F.lit("text"))
    for c in media_cols:
        if c not in text_full.columns:
            text_full = text_full.withColumn(
                c, F.lit(None).cast(media_rows.schema[c].dataType)
            )
    all_rows = text_full.select(media_cols).unionByName(media_rows)

    # one exchange serves every window below (hash(doc_id) clusters
    # (doc_id), (doc_id, offset) and (doc_id, offset, line_id) alike)
    all_rows = all_rows.repartition("doc_id")
    all_rows = p1_apply_orientation(all_rows)
    # P3 before P2 — deliberately swapped vs the reference's P2→P3 order:
    # the two commute exactly (the 90°/180° rotation is a pointwise
    # isometry applied uniformly to every coords list, and the filler's
    # corner picks / unit-vector extrusions are equivariant under it),
    # and this order lets P2's unordered page window reuse P3's sort
    # ((doc_id, offset) is a prefix of P3's sort key) — one less full
    # sort of the span rows. The oracle applies the reference order;
    # the e2e parity tests pin the equivalence.
    all_rows = p3_fill_word_coords(all_rows)
    all_rows = p2_dominant_baselines(all_rows)
    all_rows = build_coords_array(all_rows)

    # (offset, line_sub, sub_order) orders identically to
    # (offset, sub_order) — line_sub is monotone in sub_order within a
    # page — but matches P3's sort exactly, so NO additional sort here
    order_w = Window.partitionBy("doc_id").orderBy(
        "offset", "line_sub", "sub_order"
    )
    out = all_rows.withColumn(
        "order", (F.row_number().over(order_w) - 1).cast("int")
    ).select(*FINAL_COLUMNS)
    if ordered:
        out = out.orderBy("doc_id", "order")
    return out


def extract_crops(
    docs_df: DataFrame,
    crops_df: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    ordered: bool = False,
    resolver=None,
    save_crops_dir: str | None = None,
) -> DataFrame:
    """Region-crop recognition mode: recognize INSIDE selected sub-regions
    of media pages (the reference's xpath-on-existing-TextRegions workflow,
    tesseract-recognize.cc:428-451).

    ``crops_df``: (doc_id, offset, crop_id, crop_x0, crop_y0, crop_x1,
    crop_y1) — one row per selected region, coordinates in the page's
    raster frame (the realistic source is a previous extraction's region
    coords). Per reference semantics: each crop's raster is cut and decoded
    independently, emitted region ids are "{crop_id}_b{n}" (no region rows
    — recognition writes into the existing regions), and the crop offset is
    added back to every coordinate (cc:438-441,663-666,677).

    Requires ``cfg.psm == "auto"``: the reference refuses OSD when the
    document already carries orientation state (cc:423-426); crops are cut
    in the stored raster frame, so the P1/P2 derotation passes must not run.

    Scale shape: the crops side joins the media spans on (doc_id, offset) —
    an equi-join that AQE broadcasts when the selection is small; the
    expensive decode runs AFTER the join, on crop work items only.
    """
    if cfg.psm != "auto":
        raise ValueError(
            "extract_crops requires psm='auto' (no OSD on pre-cropped "
            "regions — reference tesseract-recognize.cc:423-426)"
        )
    spans = explode_spans(docs_df)
    media_in = spans.filter(F.col("kind") == "media").select(
        "doc_id", "offset", "media_ref", "media_idx", "n_media"
    )
    # deterministic within-page crop order (drives the seq component of
    # sub_order, hence the final span order)
    seq_w = Window.partitionBy("doc_id", "offset").orderBy("crop_id")
    crops = crops_df.withColumn(
        "crop_seq", (F.row_number().over(seq_w) - 1).cast("int")
    )
    media_in = media_in.join(crops, ["doc_id", "offset"])
    if cfg.media_partitions:
        media_in = media_in.repartition(
            cfg.media_partitions, "doc_id", "offset", "crop_seq"
        )
    rows = ocr_expand(
        media_in, cfg, resolver=resolver, save_crops_dir=save_crops_dir
    )
    rows = t1_block_filter(rows)
    rows = t3_coords(rows)
    rows = rows.drop("x0", "y0", "x1", "y1", "full_page", "error")
    rows = rows.withColumn("kind", F.lit("media")).withColumn(
        "text", trim_text(F.col("text"))
    )
    rows = rows.repartition("doc_id")
    rows = p3_fill_word_coords(rows)
    rows = build_coords_array(rows)
    order_w = Window.partitionBy("doc_id").orderBy(
        "offset", "line_sub", "sub_order"
    )
    out = rows.withColumn(
        "order", (F.row_number().over(order_w) - 1).cast("int")
    ).select(*FINAL_COLUMNS)
    if ordered:
        out = out.orderBy("doc_id", "order")
    return out


def canonical_projection(spans_df: DataFrame) -> DataFrame:
    """The equality-invariant projection (kind, text, media_ref, order)."""
    return spans_df.select("doc_id", "order", "kind", "text", "media_ref")
