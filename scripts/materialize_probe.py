"""Measure the materialize_projection deployment knob on a driver query.

VERDICT r5 next-round #5: the checkpoint_table materialization shape
(caching.py) was pytest-gated only — give the 10^12-row deployment knob
a MEASURED cost on a real driver query at sf1. Runs ann_lsh_topk's
operator (lsh_topk, the same parameters as the declared query) in both
materialization modes with a noop sink, checks the two modes return
identical rows, and appends one ledger row per mode to
BENCH/query_ledger.jsonl.

    python scripts/materialize_probe.py [sf_dir] [passes]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from tesseract_recognize_spark.session import build_session  # noqa: E402
from tesseract_recognize_spark.sources.testdata import load_table  # noqa: E402
from tesseract_recognize_spark.operators.similarity import lsh_topk  # noqa: E402

LEDGER = "BENCH/query_ledger.jsonl"


def loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session()
    rows_by_mode = {}
    for mode in ("persist", "checkpoint_table"):
        times = []
        for p in range(passes):
            scratch = (
                tempfile.mkdtemp(prefix="mp_probe_") + "/t"
                if mode == "checkpoint_table"
                else None
            )
            emb = load_table(spark, sf_dir, "embeddings")
            spark.sparkContext.setJobDescription(
                f"materialize_probe {mode} pass {p}"
            )
            t0 = time.time()
            out = lsh_topk(
                emb, dim=64, k=5, bits=8, n_queries=50,
                materialize=mode, scratch_dir=scratch,
            )
            out.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            if p == 0:
                rows_by_mode[mode] = sorted(
                    tuple(r) for r in out.collect()
                )
            spark.sparkContext.setJobDescription(None)
            if scratch:
                shutil.rmtree(scratch.rsplit("/", 1)[0], ignore_errors=True)
        rec = {
            "ts": time.time(),
            "probe": "materialize_modes",
            "query": "ann_lsh_topk",
            "sf_dir": sf_dir,
            "mode": mode,
            "passes": times,
            "min": min(times),
            "loadavg": loadavg1(),
        }
        with open(LEDGER, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
    same = rows_by_mode["persist"] == rows_by_mode["checkpoint_table"]
    print(f"modes identical: {same} ({len(rows_by_mode['persist'])} rows)")
    spark.stop()
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
