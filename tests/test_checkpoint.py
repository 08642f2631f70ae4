"""Checkpoint/resume: kill mid-run, resume, result equals a single run."""

import pytest

from tesseract_recognize_spark.config import ExtractConfig
from tesseract_recognize_spark.fixtures.generator import (
    gen_documents,
    write_documents_parquet,
)
from tesseract_recognize_spark.plans.checkpoint import run_checkpointed
from tesseract_recognize_spark.sources.tableio import ParquetTableIO

pytestmark = pytest.mark.spark

CFG = ExtractConfig(media_partitions=2)


def _canon(df):
    return sorted(
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in df.collect()
    )


def test_kill_resume_equals_single_run(spark, tmp_path):
    docs = gen_documents(16, seed=11)
    p = str(tmp_path / "docs.parquet")
    write_documents_parquet(docs, p)
    ddf = spark.read.parquet(p)

    # reference: uninterrupted run
    io_ref = ParquetTableIO(str(tmp_path / "out_ref"))
    entries = run_checkpointed(ddf, io_ref, n_groups=4, cfg=CFG)
    assert [e.group for e in entries] == [0, 1, 2, 3]
    assert all(e.status == "committed" for e in entries)

    # crashed run: dies after committing group 1
    io_cp = ParquetTableIO(str(tmp_path / "out_cp"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_checkpointed(ddf, io_cp, n_groups=4, cfg=CFG, fail_after_group=1)
    assert sorted(io_cp.committed_groups()) == [0, 1]

    # resume: only the pending groups run; lineage fills in
    resumed = run_checkpointed(ddf, io_cp, n_groups=4, cfg=CFG)
    assert [e.group for e in resumed] == [2, 3]
    assert _canon(io_cp.read_all(spark)) == _canon(io_ref.read_all(spark))


def test_lineage_metrics_populated(spark, tmp_path):
    docs = gen_documents(8, seed=3)
    p = str(tmp_path / "docs.parquet")
    write_documents_parquet(docs, p)
    io = ParquetTableIO(str(tmp_path / "out"))
    entries = run_checkpointed(
        spark.read.parquet(p), io, n_groups=2, cfg=CFG
    )
    assert sum(e.doc_count for e in entries) == 8
    assert all(e.span_count > 0 and e.wall_ms >= 0 for e in entries)
    assert len({e.run_id for e in entries}) == 1
