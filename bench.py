"""Benchmark harness: ALL driver queries at $SPARK_GRAFT_SF_DIR, ledgered.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": <sum of per-query minima, sec>, "unit": "sec",
   "queries": {<name>: min sec over passes}, "queries_median": {...},
   "passes": N, "sf": ..., "docs_per_sec": ...}

The host shows bursty phantom load (identical runs vary 2-4x — see
BENCH/BASELINE.md), so a single-sample bench cannot distinguish a
regression from weather. Every query therefore runs N passes
(SPARK_GRAFT_BENCH_PASSES, default 5) with a soft loadavg gate at pass
boundaries, and the headline per-query figure is the MINIMUM across
passes — the standard noisy-shared-host estimator, same discipline as
scripts/_scaling_accumulate.py. The full per-pass ledger is appended to
BENCH/query_ledger.jsonl for round-over-round adjudication.

The headline is the end-to-end extraction (explode → native normalize →
Arrow mock-OCR → native post-passes → order), measured as docs/sec, plus
the training-data operator suite (dedup family, ANN, text stats,
multimodal decode).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from tesseract_recognize_spark.session import build_session  # noqa: E402

# every driver query — new operators' costs are tracked round-over-round
BENCH_QUERIES = [
    "extract_full",
    "extract_region_crops",
    "page_set_select",
    "trim_normalize",
    "span_explode_order",
    "block_filter",
    "word_fill_window",
    "dominant_orientation",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_components",
    "dedup_components_star",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_lsh_mt_topk",
    "ann_ivf_topk",
    "multimodal_image_features",
    "multimodal_codec_matrix",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    "media_reconcile",
    "events_window_rollup",
    "sample_stratified",
    "sample_per_group_topn",
    "events_sessionize",
    "events_sessionize_salted",
    "events_asof_join",
    "events_asof_join_narrow",
    "events_range_counts",
    "langid",
    "quality_score",
    "token_counts",
    "tfidf_top_terms",
    "quality_quantiles",
    "doc_fingerprint",
]

LEDGER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH", "query_ledger.jsonl"
)


def loadavg1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return 0.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5"))
    gate_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "48"))
    gate_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "60"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = build_session(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    queries = E.queries()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # warm the JVM codegen cache AND the Python worker pool (spawning
    # cpus× workers + imports costs ~15s once) so per-query times measure
    # steady-state throughput, not cold start
    queries["trim_normalize"](spark, sf_dir).count()
    queries["extract_full"](spark, sf_dir).limit(64).count()
    all_passes: list[dict[str, float]] = []
    pass_loads: list[float] = []
    for p in range(passes):
        # soft gate: external load storms decay on a ~1-min constant;
        # wait briefly for one to pass, never stall the round
        waited = 0.0
        while loadavg1() > gate_load and waited < gate_wait:
            time.sleep(10)
            waited += 10
        pass_loads.append(round(loadavg1(), 1))
        timings: dict[str, float] = {}
        for name in BENCH_QUERIES:
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        all_passes.append(timings)
        # operators that persist intermediates (dedup_ngram_jaccard) own
        # no session-lifetime cache; drop their blocks between passes
        spark.catalog.clearCache()
        print(f"pass {p}: {round(sum(timings.values()), 1)}s "
              f"(load {pass_loads[-1]})", file=sys.stderr, flush=True)
    minima = {
        q: min(t[q] for t in all_passes) for q in BENCH_QUERIES
    }
    medians = {
        q: sorted(t[q] for t in all_passes)[len(all_passes) // 2]
        for q in BENCH_QUERIES
    }
    total = round(sum(minima.values()), 3)
    docs_per_sec = round(n_docs / minima["extract_full"], 2)
    try:
        os.makedirs(os.path.dirname(LEDGER), exist_ok=True)
        with open(LEDGER, "a") as f:
            for p, timings in enumerate(all_passes):
                f.write(json.dumps({
                    "ts": time.time(), "sf": sf, "cpus": cpus, "pass": p,
                    "loadavg_at_start": pass_loads[p], "queries": timings,
                }) + "\n")
    except OSError:
        pass  # read-only checkout must not break the bench
    print(
        json.dumps(
            {
                "metric": (
                    "extraction+ops wall time, min over "
                    f"{passes} passes (headline: extract_full docs/sec)"
                ),
                "value": total,
                "unit": "sec",
                "queries": minima,
                "queries_median": medians,
                "passes": passes,
                "pass_loadavg": pass_loads,
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
