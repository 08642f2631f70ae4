"""Incremental extraction via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.3: no streaming operators),
but a trillion-document corpus arrives continuously — this wraps the SAME
batch plan in a Structured Streaming file source with foreachBatch, giving
exactly-once incremental extraction with the engine's usual checkpoint
story (the streaming checkpoint tracks consumed input files; each
micro-batch runs the full distributed extract plan and writes its own
batch-keyed partition directory, so replays after a crash are idempotent).

foreachBatch (rather than a pure streaming DAG) is deliberate: the order-
assignment window and the P2/P3 post-pass windows are per-document total
orders, not watermark-windowed aggregations — per micro-batch semantics is
exactly the contract (a document's spans live in one input file).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from tesseract_recognize_spark.config import DEFAULT_CONFIG, ExtractConfig
from tesseract_recognize_spark.plans.pipeline import extract
from tesseract_recognize_spark.schemas import DOCUMENTS_SCHEMA

__all__ = ["stream_extract"]


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    resolver=None,
    available_now: bool = True,
):
    """Start (or resume) incremental extraction over a growing directory of
    documents parquet files. Returns the StreamingQuery.

    ``available_now=True`` processes everything currently available and
    stops — the batch-catchup trigger; pass False for a continuous
    micro-batch stream."""
    src = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        # foreachBatch is at-least-once; writing each micro-batch to a
        # deterministic batch_id-keyed subdirectory with overwrite makes the
        # replay idempotent — the checkpoint-commit/write race can only
        # rewrite the same directory, never duplicate rows. Readers get the
        # union via parquet partition discovery on `batch=`.
        out = extract(batch_df, cfg, resolver=resolver)
        out.sortWithinPartitions(
            "doc_id", "offset", "line_sub", "sub_order"
        ).write.mode("overwrite").parquet(f"{output_dir}/batch={batch_id}")

    writer = (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
