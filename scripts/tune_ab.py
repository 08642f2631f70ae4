"""Interleaved same-session A/B of partition-factor configs.

The tail_tune grid compares configs across separate sessions, which the
host's storm noise can dominate. This script alternates SINGLE runs of
two configs inside ONE session (shuffle partitions is a runtime conf;
media partitions is a job parameter), so both configs sample the same
noise windows and min-over-runs is a fair comparison.

    python scripts/tune_ab.py --cores 32 --cycles 6 \
        --a 4,1 --b 8,2
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from scaling_bench import ensure_corpus  # noqa: E402

from tesseract_recognize_spark.config import ExtractConfig
from tesseract_recognize_spark.plans.pipeline import extract
from tesseract_recognize_spark.session import build_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--cycles", type=int, default=6)
    ap.add_argument("--a", default="4,1")  # media_factor,shuffle_factor
    ap.add_argument("--b", default="8,2")
    args = ap.parse_args()
    cfgs = {}
    for name in ("a", "b"):
        mf, sf = (int(x) for x in getattr(args, name).split(","))
        cfgs[name] = (mf, sf)
    path = ensure_corpus(args.docs)
    spark = build_session(
        app_name="tune-ab",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    docs = spark.read.parquet(path)
    docs.count()
    plans = {}
    for name, (mf, sf) in cfgs.items():
        spark.conf.set("spark.sql.shuffle.partitions", str(args.cores * sf))
        plans[name] = extract(
            docs, ExtractConfig(media_partitions=args.cores * mf)
        )
    # warm both plans past C2
    for name in cfgs:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(args.cores * cfgs[name][1]),
        )
        plans[name].write.format("noop").mode("overwrite").save()
        plans[name].write.format("noop").mode("overwrite").save()
    walls: dict[str, list[float]] = {n: [] for n in cfgs}
    for i in range(args.cycles):
        for name in ("a", "b") if i % 2 == 0 else ("b", "a"):
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(args.cores * cfgs[name][1]),
            )
            t0 = time.time()
            plans[name].write.format("noop").mode("overwrite").save()
            w = round(time.time() - t0, 2)
            walls[name].append(w)
            print(f"cycle {i} {name}{cfgs[name]}: {w}s", flush=True)
    print(json.dumps({
        "docs": args.docs, "cores": args.cores,
        **{
            f"{n}_mf{cfgs[n][0]}_sf{cfgs[n][1]}": {
                "runs": walls[n], "min": min(walls[n]),
            }
            for n in cfgs
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
