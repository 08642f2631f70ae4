"""A/B the straggler-tail knobs at one core count.

BENCH/BASELINE.md attributes the main framework-side scaling term to
last-wave straggler tails on the short wide-parallelism stages. The two
knobs are media partitions (salting fan-out before the Arrow OCR stage)
and shuffle partitions (the doc_id exchange feeding the window stage);
this script grids them at a fixed core count, fresh JVM per cell, min
over n runs — so the pick is measured, not guessed.

    python scripts/tail_tune.py --cores 32 --runs 5
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from scaling_bench import ensure_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--media-factors", default="4,8,16")
    ap.add_argument("--shuffle-factors", default="1,2,4")
    args = ap.parse_args()
    path = ensure_corpus(args.docs)
    results = []
    for mf in [int(x) for x in args.media_factors.split(",")]:
        for sf in [int(x) for x in args.shuffle_factors.split(",")]:
            env = dict(os.environ)
            env["SPARK_GRAFT_MEDIA_FACTOR"] = str(mf)
            env["SPARK_GRAFT_SHUFFLE_FACTOR"] = str(sf)
            env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
            out = subprocess.run(
                [sys.executable, "scripts/_scaling_child.py",
                 str(args.cores), path, str(args.runs)],
                capture_output=True, text=True, env=env,
            )
            if out.returncode != 0:
                print(f"mf={mf} sf={sf}: FAILED", out.stderr[-200:],
                      flush=True)
                continue
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            rec.update(media_factor=mf, shuffle_factor=sf)
            results.append(rec)
            print(f"mf={mf} sf={sf}: min={rec['wall_sec']} "
                  f"runs={rec['all_runs_sec']}", flush=True)
    results.sort(key=lambda r: r["wall_sec"])
    print(json.dumps({"best": results[0] if results else None,
                      "all": results}))


if __name__ == "__main__":
    main()
