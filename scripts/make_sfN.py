"""Deterministic sfN synthesis for scale-step benching (round-4 ask #6).

The driver ships parquet at sf{0.001,0.01,0.1} only; super-linear
operator behavior (LSH candidate growth, components rounds, window
buffers) needs a 10× scale step. This script upsamples sf0.1 → sfN by
replication with key shifts, WITHOUT creating cross-replica duplicate
relations that would distort the dedup/ANN workloads:

  * documents — doc_id += 5000·r; for r > 0 the text passes through a
    per-replica vowel/consonant rotation (str.translate), so replicas of
    one doc are NOT near-duplicates of each other (shingle overlap
    collapses), while the within-replica duplicate salt structure is
    preserved exactly (identical texts stay identical under the same
    translation). Every replica keeps the sf0.1 length/lang/source mix.
  * embeddings — vec_id += 2000·r; each replica's vectors are multiplied
    by a seeded ±1 sign pattern per dimension (RandomState(r)), which
    preserves norms (cosine structure WITHIN a replica is congruent)
    but decorrelates replicas.
  * events — event_id += 100000·r, user_id += (max_user+1)·r: growth by
    MORE USERS at the same per-user density — the realistic direction
    for a behavioral log — so sessions per user stay comparable and the
    sessionize/asof windows see 10× groups, not 10×-deep groups.
  * lineitem — l_orderkey += (max+1)·r, other columns verbatim.

Usage:  python scripts/make_sfN.py [N] [out_dir]
        (default N=10 → "sf1", out /tmp/spark_graft_sf1)
Then:   SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

_LOWER = "abcdefghijklmnopqrstuvwxyz"


def _rotation(r: int) -> dict[int, int]:
    """Per-replica deterministic character substitution (letters rotate
    by 7·r within case class; digits rotate by r). Identity for r=0."""
    if r == 0:
        return {}
    k = (7 * r) % 26
    table = {}
    for s in (_LOWER, _LOWER.upper()):
        for i, ch in enumerate(s):
            table[ord(ch)] = ord(s[(i + k) % 26])
    for i in range(10):
        table[ord(str(i))] = ord(str((i + r) % 10))
    return table


def scale(n_reps: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    parts = []
    for r in range(n_reps):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + 5000 * r
        if r:
            rot = _rotation(r)
            d["text"] = d["text"].map(lambda s: s.translate(rot))
        parts.append(d)
    import pandas as pd

    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                             preserve_index=False),
        f"{out_dir}/documents.parquet",
    )
    print(f"documents: {5000 * n_reps}", flush=True)

    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    dim = len(emb["embedding"].iloc[0])
    parts = []
    for r in range(n_reps):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + 2000 * r
        if r:
            signs = np.where(
                np.random.RandomState(r).rand(dim) < 0.5, -1.0, 1.0
            ).astype("float32")
            e["embedding"] = e["embedding"].map(
                lambda v: (np.asarray(v, dtype="float32") * signs).tolist()
            )
        parts.append(e)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                             preserve_index=False),
        f"{out_dir}/embeddings.parquet",
    )
    print(f"embeddings: {2000 * n_reps}", flush=True)

    ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    u_span = int(ev["user_id"].max()) + 1
    parts = []
    for r in range(n_reps):
        x = ev.copy()
        x["event_id"] = x["event_id"] + 100000 * r
        x["user_id"] = x["user_id"] + u_span * r
        parts.append(x)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                             preserve_index=False),
        f"{out_dir}/events.parquet",
    )
    print(f"events: {100000 * n_reps}", flush=True)

    li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
    o_span = int(li["l_orderkey"].max()) + 1
    parts = []
    for r in range(n_reps):
        x = li.copy()
        x["l_orderkey"] = x["l_orderkey"] + o_span * r
        parts.append(x)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                             preserve_index=False),
        f"{out_dir}/lineitem.parquet",
    )
    print(f"lineitem: {600000 * n_reps}", flush=True)

    # small dims copied verbatim — queries only group/join through them
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        src = f"{SRC}/{t}.parquet"
        if os.path.exists(src):
            pq.write_table(pq.read_table(src), f"{out_dir}/{t}.parquet")
    print(f"done → {out_dir}", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    scale(n, out)
