"""Child process for scaling_bench.py: run the extraction job at a given
core count in a fresh JVM and report job wall time (excluding session
startup and plan compilation warm-up)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from tesseract_recognize_spark.config import ExtractConfig
from tesseract_recognize_spark.plans.pipeline import extract
from tesseract_recognize_spark.session import build_session


def main() -> None:
    cores = int(sys.argv[1])
    input_path = sys.argv[2]
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    # per-core multipliers — the SAME formula at both parallelism levels,
    # so the comparison stays a pure core-count scaling measurement
    media_factor = int(os.environ.get("SPARK_GRAFT_MEDIA_FACTOR", "4"))
    shuffle_factor = int(os.environ.get("SPARK_GRAFT_SHUFFLE_FACTOR", "1"))
    arrow_rows = int(os.environ.get("SPARK_GRAFT_ARROW_ROWS", "256"))
    spark = build_session(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * shuffle_factor,
        arrow_batch_rows=arrow_rows,
    )
    docs = spark.read.parquet(input_path)
    n_docs = docs.count()  # warms the JVM + parquet footer cache
    cfg = ExtractConfig(media_partitions=cores * media_factor)
    # run the full job several times and report the best: JVM C2
    # compilation of the generated stage code completes asynchronously
    # over the first runs (first-run wall is 2-4x steady state), so a
    # single warm-up is not enough for a stable steady-state measurement
    out = extract(docs, cfg)
    walls = []
    for _ in range(n_runs):
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 2))
    med = sorted(walls)[len(walls) // 2]
    print(json.dumps({
        "cores": cores, "docs": n_docs,
        "wall_sec": min(walls), "median_sec": med, "all_runs_sec": walls,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
