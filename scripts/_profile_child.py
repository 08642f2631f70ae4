"""Stage-decomposition profiler: times (a) the OCR sub-plan alone and
(b) the full extraction plan, at a given core count, best-of-N each.
The (b)-(a) delta isolates the union/exchange/window/sink tail that the
scaling bench identified as the non-scaling term."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from tesseract_recognize_spark.config import ExtractConfig
from tesseract_recognize_spark.operators.normalize import trim_text
from tesseract_recognize_spark.operators.ocr import ocr_expand
from tesseract_recognize_spark.operators.postpass import (
    t1_block_filter,
    t3_coords,
)
from tesseract_recognize_spark.operators.explode import explode_spans
from tesseract_recognize_spark.plans.pipeline import extract
from tesseract_recognize_spark.session import build_session


def bestof(df, n=5):
    walls = []
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 2))
    return min(walls), walls


def main() -> None:
    cores = int(sys.argv[1])
    path = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = build_session(
        app_name=f"profile-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    docs = spark.read.parquet(path)
    docs.count()
    cfg = ExtractConfig(media_partitions=cores * 4)

    spans = explode_spans(docs)
    media_in = spans.filter(F.col("kind") == "media").select(
        "doc_id", "offset", "media_ref", "media_idx", "n_media"
    ).repartition(cfg.media_partitions, "doc_id", "offset")
    ocr_only = t3_coords(t1_block_filter(ocr_expand(media_in, cfg))).drop(
        "x0", "y0", "x1", "y1", "full_page", "error"
    ).withColumn("text", trim_text(F.col("text")))

    scan_only = spans  # explode both branches' shared work
    full = extract(docs, cfg)

    out = {}
    for name, df in [("scan_explode", scan_only), ("ocr_only", ocr_only),
                     ("full", full)]:
        best, walls = bestof(df, n)
        out[name] = {"best": best, "all": walls}
    out["cores"] = cores
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
