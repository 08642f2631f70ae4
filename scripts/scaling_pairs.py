"""Same-regime scaling pairs (round-4 replication of the north-rule
evidence).

The host shows bursty phantom load, so cross-session minima can catch the
two parallelism levels in different noise regimes (the round-3 ledger
caveat). This script measures the levels BACK-TO-BACK: each pair runs one
local[8] leg and one local[32] leg immediately adjacent (leg order
alternating pair-to-pair to cancel drift), so both legs of a pair share
one noise regime, and reports the per-pair efficiency distribution

    eff_pair = (docs/min_wall_32 / (docs/min_wall_8)) / 4

across >= 5 pairs. Results append to a JSONL ledger consumed by
scaling_report.py / BENCH/BASELINE.md.

    python scripts/scaling_pairs.py --pairs 5 --runs 4
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from scaling_bench import ensure_corpus, run_child  # noqa: E402

LEDGER = "BENCH/pairs_ledger_r04.jsonl"


def loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def run_child_sampled(cores: int, path: str, runs: int) -> dict:
    """run_child plus a 5s loadavg sampler DURING the leg.

    Background load is structurally ASYMMETRIC between the levels: L
    phantom-busy cores leave an 8-core leg untouched while L ≤ 24 cores
    are free, but cost a 32-core leg ~L/32 of its throughput. A pair is
    therefore only same-regime in the sense the estimator needs when BOTH
    legs ran on a near-idle host; the in-leg load trace is what lets the
    report select those pairs on evidence instead of launch-time luck.
    """
    import threading

    samples: list[float] = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            samples.append(loadavg1())
            stop.wait(5)

    t = threading.Thread(target=sampler, daemon=True)
    t.start()
    try:
        rec = run_child(cores, path, runs)
    finally:
        stop.set()
        t.join(timeout=1)
    rec["load_trace"] = [round(s, 1) for s in samples]
    rec["load_mean"] = round(sum(samples) / max(len(samples), 1), 2)
    rec["load_max"] = round(max(samples, default=0.0), 1)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--xn", type=int, default=32)
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--max-load", type=float, default=4.0)
    ap.add_argument("--max-wait", type=float, default=300.0)
    ap.add_argument("--ledger", default=LEDGER)
    args = ap.parse_args()
    path = ensure_corpus(args.docs)
    factor = args.xn / args.n
    effs = []
    for i in range(args.pairs):
        # soft gate at PAIR boundaries only — legs inside a pair must stay
        # back-to-back so they share whatever regime the host is in
        waited = 0.0
        while loadavg1() > args.max_load and waited < args.max_wait:
            time.sleep(15)
            waited += 15
        order = (args.n, args.xn) if i % 2 == 0 else (args.xn, args.n)
        legs = {}
        load0 = loadavg1()
        for cores in order:
            print(f"pair {i}: launching local[{cores}] "
                  f"(load {loadavg1():.1f})", flush=True)
            legs[cores] = run_child_sampled(cores, path, args.runs)
        w_n = min(legs[args.n]["all_runs_sec"])
        w_xn = min(legs[args.xn]["all_runs_sec"])
        eff = (args.docs / w_xn) / (args.docs / w_n) / factor
        effs.append(eff)
        rec = {
            "pair": i,
            "order": list(order),
            "docs": args.docs,
            "loadavg_at_start": load0,
            "ts": time.time(),
            f"runs_{args.n}": legs[args.n]["all_runs_sec"],
            f"runs_{args.xn}": legs[args.xn]["all_runs_sec"],
            f"min_{args.n}": w_n,
            f"min_{args.xn}": w_xn,
            # background-load estimate per leg: in-leg 1-min loadavg mean
            # minus the leg's own core count (≈0 on a clean host)
            f"bg_load_{args.n}": round(
                max(legs[args.n].get("load_mean", 0) - args.n, 0), 1
            ),
            f"bg_load_{args.xn}": round(
                max(legs[args.xn].get("load_mean", 0) - args.xn, 0), 1
            ),
            f"load_trace_{args.n}": legs[args.n].get("load_trace"),
            f"load_trace_{args.xn}": legs[args.xn].get("load_trace"),
            "efficiency": round(eff, 3),
        }
        os.makedirs(os.path.dirname(args.ledger), exist_ok=True)
        with open(args.ledger, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"pair {i}: eff={eff:.3f} "
              f"(min@{args.n}={w_n:.1f}s, min@{args.xn}={w_xn:.1f}s)",
              flush=True)
    print(json.dumps({
        "pairs": len(effs),
        "efficiencies": [round(e, 3) for e in effs],
        "median_efficiency": round(statistics.median(effs), 3),
        "min_efficiency": round(min(effs), 3),
        "target": ">= 0.8 median over same-regime pairs",
    }))


if __name__ == "__main__":
    main()
