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
