"""Shared fixtures: one SparkSession per test run, deterministic corpora."""

from __future__ import annotations

import pytest

from tesseract_recognize_spark.fixtures.generator import (
    gen_documents,
    write_documents_parquet,
)


@pytest.fixture(scope="session")
def spark():
    from tesseract_recognize_spark.session import build_session

    s = build_session(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fx_small_docs():
    return gen_documents(40, seed=42)


@pytest.fixture(scope="session")
def fx_small_path(fx_small_docs, tmp_path_factory):
    p = tmp_path_factory.mktemp("fx") / "documents.parquet"
    write_documents_parquet(fx_small_docs, str(p))
    return str(p)
