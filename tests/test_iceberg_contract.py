"""IcebergTableIO contract test against a faked catalog surface.

No Iceberg runtime jar ships in this sandbox, so the catalog surface the
class touches — ``catalog.tableExists``, the v2 ``writeTo(...).create() /
.overwritePartitions() / .append()`` writer, ``read.table`` — is replaced
by an in-memory catalog that implements Iceberg's documented dynamic
partition-overwrite semantics (replace exactly the partitions present in
the incoming data, REPLACE PARTITIONS semantics of `overwritePartitions`).
The DataFrames flowing through are REAL Spark DataFrames, so the class's
own logic (partition column injection, snapshot-scan lineage counts,
first-run create vs append, replay idempotency) executes for real.
"""

from __future__ import annotations

import time

import pytest

from pyspark.sql import DataFrame
from pyspark.sql.classic.dataframe import DataFrame as ClassicDataFrame

from tesseract_recognize_spark.sources.tableio import (
    IcebergTableIO,
    get_table_io,
    ParquetTableIO,
)

pytestmark = pytest.mark.spark


class FakeCatalog:
    """tables: name -> {"rows": list[Row-as-dict], "partition": col | None}"""

    def __init__(self):
        self.tables = {}
        self.snapshots = {}  # name -> count of commits (snapshot history)

    def exists(self, name):
        return name in self.tables


class FakeWriter:
    def __init__(self, cat: FakeCatalog, df: DataFrame, name: str):
        self.cat, self.df, self.name = cat, df, name
        self._partition = None

    def partitionedBy(self, col):
        self._partition = "_group"
        return self

    def _rows(self):
        return [r.asDict() for r in self.df.collect()]

    def _bump(self):
        self.cat.snapshots[self.name] = self.cat.snapshots.get(self.name, 0) + 1

    def create(self):
        if self.cat.exists(self.name):
            raise ValueError(f"table {self.name} already exists")
        self.cat.tables[self.name] = {
            "rows": self._rows(),
            "partition": self._partition,
        }
        self._bump()

    def append(self):
        self.cat.tables[self.name]["rows"].extend(self._rows())
        self._bump()

    def overwritePartitions(self):
        # Iceberg dynamic overwrite: replace exactly the partitions that
        # appear in the incoming data, leave every other partition alone
        tbl = self.cat.tables[self.name]
        part = tbl["partition"]
        assert part is not None, "overwritePartitions on unpartitioned table"
        new = self._rows()
        incoming = {r[part] for r in new}
        tbl["rows"] = [r for r in tbl["rows"] if r[part] not in incoming] + new
        self._bump()


@pytest.fixture()
def fake_catalog(spark, monkeypatch):
    cat = FakeCatalog()

    def fake_writeTo(self, name):
        return FakeWriter(cat, self, name)

    def fake_table(self, name):
        tbl = cat.tables[name]
        if not tbl["rows"]:
            raise ValueError("empty fake table")
        return spark.createDataFrame(tbl["rows"])

    monkeypatch.setattr(ClassicDataFrame, "writeTo", fake_writeTo)
    monkeypatch.setattr(
        type(spark.catalog), "tableExists",
        lambda self, name: cat.exists(name),
    )
    monkeypatch.setattr(type(spark.read), "table", fake_table)
    return cat


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id string, text string")


def test_first_run_creates_then_overwrites(spark, fake_catalog):
    io = IcebergTableIO("cat.db.out")
    assert io.committed_groups() == {}  # first run: no lineage table yet

    e0 = io.commit_group(_df(spark, [("d1", "a"), ("d1", "b")]), 0, "r1", time.time())
    assert (e0.group, e0.doc_count, e0.span_count, e0.status) == (0, 1, 2, "committed")
    e1 = io.commit_group(_df(spark, [("d2", "c")]), 1, "r1", time.time())
    assert (e1.doc_count, e1.span_count) == (1, 1)

    got = io.committed_groups()
    assert sorted(got) == [0, 1]
    assert got[0].span_count == 2

    allrows = sorted(
        (r["doc_id"], r["text"]) for r in io.read_all(spark).collect()
    )
    assert allrows == [("d1", "a"), ("d1", "b"), ("d2", "c")]
    assert "_group" not in io.read_all(spark).columns


def test_replay_is_idempotent(spark, fake_catalog):
    """Crash between data commit and lineage commit → the group re-runs;
    the dynamic partition overwrite must not duplicate its rows, and other
    groups' partitions must be untouched."""
    io = IcebergTableIO("cat.db.out2")
    io.commit_group(_df(spark, [("d1", "a")]), 0, "r1", time.time())
    io.commit_group(_df(spark, [("d2", "b"), ("d2", "c")]), 1, "r1", time.time())

    # replay group 1 (as a resume after a crash mid-lineage would)
    e = io.commit_group(_df(spark, [("d2", "b"), ("d2", "c")]), 1, "r2", time.time())
    assert e.span_count == 2  # counted from the committed snapshot, not 4

    rows = sorted((r["doc_id"], r["text"]) for r in io.read_all(spark).collect())
    assert rows == [("d1", "a"), ("d2", "b"), ("d2", "c")]

    # duplicate lineage entries for the group collapse (last wins per dict)
    got = io.committed_groups()
    assert sorted(got) == [0, 1]
    assert got[1].run_id == "r2"


def test_snapshot_per_commit(spark, fake_catalog):
    """Each group commit is exactly one snapshot on the data table —
    the per-group lineage/rollback unit the north rule asks for."""
    io = IcebergTableIO("cat.db.out3")
    io.commit_group(_df(spark, [("d1", "a")]), 0, "r1", time.time())
    io.commit_group(_df(spark, [("d2", "b")]), 1, "r1", time.time())
    io.commit_group(_df(spark, [("d2", "z")]), 1, "r2", time.time())  # replay
    assert fake_catalog.snapshots["cat.db.out3"] == 3
    # lineage table: one create + two appends
    assert fake_catalog.snapshots["cat.db.out3_lineage"] == 3


def test_routing():
    assert isinstance(get_table_io("cat.db.tbl"), IcebergTableIO)
    # two-part identifier = Iceberg table under the session default
    # catalog (round-3 advisor: must not silently become a parquet dir
    # literally named 'db.table')
    assert isinstance(get_table_io("db.tbl"), IcebergTableIO)
    assert isinstance(get_table_io("out.parquet"), ParquetTableIO)
    assert isinstance(get_table_io("results.db"), ParquetTableIO)
    assert isinstance(get_table_io("events.jsonl"), ParquetTableIO)
    assert isinstance(get_table_io("/abs/path/out"), ParquetTableIO)
    assert isinstance(get_table_io("plain_dir"), ParquetTableIO)
    assert isinstance(get_table_io("a/b.tbl"), ParquetTableIO)


def test_routing_explicit_prefixes_beat_heuristic():
    # escape hatches (round-4 advisor: the extension list is inherently
    # incomplete) — explicit spellings always win
    io = get_table_io("iceberg:run.v2")
    assert isinstance(io, IcebergTableIO) and io.table == "run.v2"
    io = get_table_io("file:out.data")
    assert isinstance(io, ParquetTableIO)
    assert isinstance(get_table_io("./out.data"), ParquetTableIO)
    assert isinstance(get_table_io("./run.v2"), ParquetTableIO)
    # undecorated dotted non-extension name still routes to Iceberg
    # (documented heuristic) — the hatches above are the way out
    assert isinstance(get_table_io("run.v2"), IcebergTableIO)
