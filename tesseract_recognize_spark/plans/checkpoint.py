"""Checkpointed extraction runner: partition-group commits + resume.

North-rule mandate: "resumable from checkpoint with per-partition lineage +
metrics". Documents are assigned to ``n_groups`` deterministic hash buckets
(xxhash64 of doc_id — partition-count independent); each group runs the
extraction plan and commits atomically through the TableIO seam (one
Iceberg snapshot / one parquet dir + manifest line per group). Resume skips
committed groups — the anti-join of pending work against lineage.

The group is the CHECKPOINT granularity, not the parallelism: inside a
group the full distributed plan runs. At 10^12 docs you'd size n_groups so
one group ≈ an hour of cluster work; locally tests use 4-8.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, functions as F

from tesseract_recognize_spark.config import DEFAULT_CONFIG, ExtractConfig
from tesseract_recognize_spark.plans.pipeline import extract
from tesseract_recognize_spark.sources.tableio import LineageEntry

__all__ = ["run_checkpointed", "group_col"]


def group_col(n_groups: int):
    """Deterministic doc_id → group bucket (stable across partitionings)."""
    return F.pmod(F.xxhash64("doc_id"), F.lit(n_groups)).cast("int")


def run_checkpointed(
    docs_df: DataFrame,
    table_io,
    n_groups: int = 8,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    run_id: str | None = None,
    resolver=None,
    fail_after_group: int | None = None,
) -> list[LineageEntry]:
    """Run extraction group-by-group with commit-per-group; resume by
    skipping groups already in the lineage. ``fail_after_group`` simulates
    a mid-run crash (kill/resume tests)."""
    run_id = run_id or uuid.uuid4().hex[:12]
    done = table_io.committed_groups()
    entries: list[LineageEntry] = []
    staged = docs_df.withColumn("_grp", group_col(n_groups))
    for g in range(n_groups):
        if g in done:
            continue
        t0 = time.time()
        group_docs = staged.filter(F.col("_grp") == g).drop("_grp")
        out = extract(group_docs, cfg, resolver=resolver)
        # physically identical to (doc_id, order) — but keyed on the
        # columns the order window just sorted by, so SortExec recognizes
        # the existing ordering and the sink sort is a no-op
        out = out.sortWithinPartitions(
            "doc_id", "offset", "line_sub", "sub_order"
        )
        entries.append(table_io.commit_group(out, g, run_id, t0))
        if fail_after_group is not None and g >= fail_after_group:
            raise RuntimeError(f"simulated crash after group {g}")
    return entries
