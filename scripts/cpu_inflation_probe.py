"""Host-physics probe: per-core throughput of the pure-Python OCR workload
at P resident worker processes, NO Spark involved.

Each worker runs the identical loop the Spark OCR stage runs per row —
resolve (render) → decode → emit — over a deterministic slice of media
refs. Aggregate throughput at P=8 vs P=32 isolates what a single shared
host does to per-core CPU when 4x more workers are resident (memory
bandwidth, all-core turbo, LLC contention): effects that exist WITHOUT any
framework and that do NOT compound on a real cluster where N and 4N
executors sit on separate hosts with private memory systems.

    python scripts/cpu_inflation_probe.py [pages_per_worker] [reps]

Prints one JSON line AND appends the run (plus the P=1/P=4/P=8/P=32
control curve) to BENCH/cpu_inflation_probe.json in exactly the schema
scaling_report.py consumes — so the documented Reproduce flow regenerates
the evidence file, not just a stdout sample.

per_core_ratio_8_to_32 = (tp32/32) / (tp8/8); < 1 quantifies the
host-physics inflation the local[8]-vs-local[32] scaling bench inherits
through no fault of the pipeline. The Spark-attributable efficiency is
eff_measured / r.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, ".")


def worker(args):
    wid, n_pages = args
    from tesseract_recognize_spark.config import ExtractConfig
    from tesseract_recognize_spark.functions.emission import emit_page_rows
    from tesseract_recognize_spark.operators.ocr_core import decode_raster
    from tesseract_recognize_spark.sources.media import resolve_media

    cfg = ExtractConfig(media_partitions=1)
    t0 = time.time()
    n_rows = 0
    for i in range(n_pages):
        ref = f"media://doc-{wid * 100003 + i}/0#probe{wid}_{i}"
        raster = resolve_media(ref)
        page = decode_raster(raster)
        rows = emit_page_rows(page, cfg, 1, 1)
        n_rows += len(rows)
    return time.time() - t0, n_rows


def measure(n_procs: int, n_pages: int, reps: int) -> float:
    best = 0.0
    for _ in range(reps):
        with mp.Pool(n_procs) as pool:
            t0 = time.time()
            results = pool.map(
                worker, [(w, n_pages) for w in range(n_procs)]
            )
            wall = time.time() - t0
        tp = n_procs * n_pages / wall
        best = max(best, tp)
    return best


EVIDENCE = "BENCH/cpu_inflation_probe.json"

PROBE_DESC = (
    "scripts/cpu_inflation_probe.py — pure multiprocessing, identical "
    "per-page workload (render→decode→emit), NO Spark"
)
READING = (
    "per-core Python throughput decays with resident worker count on this "
    "host (memory bandwidth + all-core turbo), with no framework involved. "
    "A real N-executor vs 4N-executor cluster runs the SAME per-host "
    "worker count at both sizes, so this term does not exist there."
)


def loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    import os

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    load0 = loadavg1()
    # warm imports once so fork children inherit hot modules
    worker((0, 5))
    tp1 = measure(1, n_pages, reps)
    tp2 = measure(2, n_pages, reps)
    tp4 = measure(4, n_pages, reps)
    tp8 = measure(8, n_pages, reps)
    tp32 = measure(32, n_pages, reps)
    r = (tp32 / 32) / (tp8 / 8)
    run = {
        "pages_per_worker": n_pages,
        "reps": reps,
        "tp2": round(tp2, 1),
        "tp8": round(tp8, 1),
        "tp32": round(tp32, 1),
        "per_core_ratio_8_to_32": round(r, 4),
        # ceiling for the low-density N-vs-4N variant (local[2] vs
        # local[8]): below bandwidth saturation, so closer to a real
        # cluster's constant per-host worker density
        "per_core_ratio_2_to_8": round((tp8 / 8) / (tp2 / 2), 4),
        "loadavg_1min_at_start": round(load0, 1),
    }
    # append to the evidence file in the schema scaling_report.py reads;
    # the control curve is refreshed from this session's measurements
    evidence = {"probe": PROBE_DESC, "runs": [], "reading": READING}
    if os.path.exists(EVIDENCE):
        with open(EVIDENCE) as f:
            evidence = json.load(f)
    evidence.setdefault("runs", []).append(run)
    evidence["control_curve"] = {
        "tp1": round(tp1, 1),
        "tp2": round(tp2, 1),
        "tp4": round(tp4, 1),
        "tp8": round(tp8, 1),
        "tp32": round(tp32, 1),
        "per_core_vs_single": {
            "P=1": 1.0,
            "P=2": round((tp2 / 2) / tp1, 3),
            "P=4": round((tp4 / 4) / tp1, 3),
            "P=8": round((tp8 / 8) / tp1, 3),
            "P=32": round((tp32 / 32) / tp1, 3),
        },
    }
    os.makedirs(os.path.dirname(EVIDENCE), exist_ok=True)
    with open(EVIDENCE, "w") as f:
        json.dump(evidence, f, indent=1)
    print(json.dumps(run))


if __name__ == "__main__":
    main()
