"""Incremental tail profiler: attribute the post-OCR cost (exchange, P3,
P2, order window, coords assembly) step by step at a given core count."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window, functions as F

from tesseract_recognize_spark.config import ExtractConfig
from tesseract_recognize_spark.operators.explode import explode_spans
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
from tesseract_recognize_spark.session import build_session


def bestof(df, n=4):
    walls = []
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 2))
    return min(walls), walls


def main() -> None:
    cores = int(sys.argv[1])
    path = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = build_session(
        app_name=f"tail-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    docs = spark.read.parquet(path)
    docs.count()
    cfg = ExtractConfig(media_partitions=cores * 4)

    spans = explode_spans(docs)
    text_rows = normalize_text_spans(spans)
    media_in = spans.filter(F.col("kind") == "media").select(
        "doc_id", "offset", "media_ref", "media_idx", "n_media"
    ).repartition(cfg.media_partitions, "doc_id", "offset")
    media_rows = t3_coords(t1_block_filter(ocr_expand(media_in, cfg))).drop(
        "x0", "y0", "x1", "y1", "full_page", "error"
    )
    media_rows = media_rows.withColumn("kind", F.lit("media")).withColumn(
        "text", trim_text(F.col("text"))
    )
    media_cols = media_rows.columns
    text_full = text_rows.withColumn("kind", F.lit("text"))
    for c in media_cols:
        if c not in text_full.columns:
            text_full = text_full.withColumn(
                c, F.lit(None).cast(media_rows.schema[c].dataType)
            )
    union = text_full.select(media_cols).unionByName(media_rows)

    exch = union.repartition("doc_id")
    p1 = p1_apply_orientation(exch)
    p3 = p3_fill_word_coords(p1)
    p2 = p2_dominant_baselines(p3)
    arr = build_coords_array(p2)
    order_w = Window.partitionBy("doc_id").orderBy(
        "offset", "line_sub", "sub_order"
    )
    ordered = arr.withColumn(
        "order", (F.row_number().over(order_w) - 1).cast("int")
    ).select(*FINAL_COLUMNS)

    out = {"cores": cores}
    for name, df in [
        ("A_ocr_union", union),
        ("B_exchange", exch),
        ("C_p3", p3),
        ("D_p2", p2),
        ("E_coords_arr", arr),
        ("F_order_final", ordered),
    ]:
        best, walls = bestof(df, n)
        out[name] = {"best": best, "all": walls}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
