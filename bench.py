"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ..., "docs_per_sec": ...}

The headline is the end-to-end extraction (explode → native normalize →
Arrow mock-OCR → native post-passes → order), measured as docs/sec, plus
the training-data operator suite (dedup family, ANN, text stats).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from tesseract_recognize_spark.session import build_session  # noqa: E402

BENCH_QUERIES = [
    "extract_full",
    "extract_region_crops",
    "page_set_select",
    "trim_normalize",
    "span_explode_order",
    "word_fill_window",
    "dominant_orientation",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "multimodal_image_features",
    "langid",
    "quality_score",
    "token_counts",
    "doc_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = build_session(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    queries = E.queries()
    timings: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # warm the JVM codegen cache AND the Python worker pool (spawning
    # cpus× workers + imports costs ~15s once) so per-query times measure
    # steady-state throughput, not cold start
    queries["trim_normalize"](spark, sf_dir).count()
    queries["extract_full"](spark, sf_dir).limit(64).count()
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs / timings["extract_full"], 2)
    print(
        json.dumps(
            {
                "metric": "extraction+ops wall time (headline: extract_full docs/sec)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "n_docs": n_docs,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
