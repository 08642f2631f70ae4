"""Structured Streaming incremental extraction: exactly-once over a
growing input directory, resuming from the streaming checkpoint."""

import os

import pytest

from tesseract_recognize_spark.config import ExtractConfig
from tesseract_recognize_spark.fixtures.generator import (
    gen_documents,
    write_documents_parquet,
)
from tesseract_recognize_spark.streaming.stream import stream_extract

pytestmark = pytest.mark.spark

CFG = ExtractConfig(media_partitions=2)


def test_incremental_extraction_exactly_once(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")
    os.makedirs(in_dir)
    docs = gen_documents(10, seed=21)

    write_documents_parquet(docs[:6], f"{in_dir}/batch0.parquet")
    q = stream_extract(spark, in_dir, out_dir, cp_dir, CFG)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir)
    assert got1.select("doc_id").distinct().count() == 6

    # new files arrive; resume from checkpoint → only the delta processes
    write_documents_parquet(docs[6:], f"{in_dir}/batch1.parquet")
    q = stream_extract(spark, in_dir, out_dir, cp_dir, CFG)
    q.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.select("doc_id").distinct().count() == 10
    # exactly-once: no doc duplicated across restarts
    per_doc = got2.groupBy("doc_id", "order").count().filter("count > 1")
    assert per_doc.count() == 0


def test_stateful_dedup_across_batches_and_restarts(spark, tmp_path):
    """applyInPandasWithState keeps one boolean per content hash in the
    checkpointed state store: duplicates are dropped within a batch,
    across batches, AND across stream restarts."""
    import pandas as pd

    from tesseract_recognize_spark.streaming.stateful import stream_dedup

    in_dir = str(tmp_path / "sin")
    out_dir = str(tmp_path / "sout")
    cp_dir = str(tmp_path / "scp")
    os.makedirs(in_dir)
    docs = gen_documents(8, seed=33)
    # duplicate doc 0's spans under new ids: d0b (same batch run),
    # d0c (later run) — both must be dropped; d0 is the keeper
    dup_b = dict(docs[0], doc_id="zz-dup-b")
    dup_c = dict(docs[0], doc_id="zz-dup-c")

    write_documents_parquet(docs[:4] + [dup_b], f"{in_dir}/b0.parquet")
    q = stream_dedup(spark, in_dir, out_dir, cp_dir)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir).toPandas()
    assert len(got1) == 4  # 4 distinct hashes; dup_b collapsed
    row0 = got1[got1.batch_dup_count == 2]
    assert len(row0) == 1 and row0.iloc[0]["keep_doc_id"] == docs[0]["doc_id"]

    # restart with new files: the old hash must STILL be known (state
    # store survives via the checkpoint), so only genuinely new docs emit
    write_documents_parquet(docs[4:] + [dup_c], f"{in_dir}/b1.parquet")
    q = stream_dedup(spark, in_dir, out_dir, cp_dir)
    q.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 8  # 4 + 4 new; dup_c dropped by OLD state
    assert got2.filter("keep_doc_id like 'zz-dup%'").count() == 0
    assert (
        got2.select("content_hash").distinct().count() == got2.count()
    )
    pd  # noqa: B018  (imported for clarity of the pandas dependency)
