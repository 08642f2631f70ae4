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


def test_watermarked_window_rollup_drops_late_events(spark, tmp_path):
    """Append-mode watermarked windowed agg: a window emits once after
    the watermark passes its end, and events older than the checkpointed
    watermark are dropped (bounded state — the late-data contract)."""
    from datetime import datetime as DT

    from tesseract_recognize_spark.streaming.windowed import (
        stream_event_rollup,
    )

    in_dir = str(tmp_path / "ein")
    out_dir = str(tmp_path / "eout")
    cp_dir = str(tmp_path / "ecp")
    os.makedirs(in_dir)

    def write(name, rows):
        # flat single-file parquet (like write_documents_parquet): the
        # file-stream source lists files, not Spark output directories
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "event_id": pd.array(
                        range(len(rows)), dtype="int64"
                    ),
                    "ts": pd.to_datetime([r[0] for r in rows]),
                    "user_id": pd.array(
                        [1] * len(rows), dtype="int64"
                    ),
                    "event_type": [r[1] for r in rows],
                    "value": [float(r[2]) for r in rows],
                    "props": ["{}"] * len(rows),
                }
            ),
            preserve_index=False,
        )
        # Spark's vectorized reader needs µs timestamps, not pandas' ns
        ts_us = pa.schema(
            [
                f if f.name != "ts" else pa.field("ts", pa.timestamp("us"))
                for f in tbl.schema
            ]
        )
        pq.write_table(tbl.cast(ts_us), f"{in_dir}/{name}.parquet")

    t = lambda m: DT(2024, 1, 1, 10, m)  # noqa: E731

    # run 1: two early windows + one event far ahead that advances the
    # watermark (10:21 - 10min = 10:11) past both early window ends
    write("f0", [(t(0), "a", 1.0), (t(2), "a", 2.0),
                 (t(7), "b", 3.0), (t(21), "a", 4.0)])
    stream_event_rollup(spark, in_dir, out_dir, cp_dir).awaitTermination(120)

    # run 2: a LATE event (10:03 < checkpointed watermark 10:11 → must
    # be dropped, its finalized window must NOT change) + live events
    write("f1", [(t(3), "a", 99.0), (t(22), "b", 5.0), (t(40), "a", 6.0)])
    stream_event_rollup(spark, in_dir, out_dir, cp_dir).awaitTermination(120)

    # run 3: advance the watermark (11:00 → 10:50 next batch; batch
    # start watermark 10:30 closes the 10:20-10:25 window)
    write("f2", [(DT(2024, 1, 1, 11, 0), "b", 7.0)])
    stream_event_rollup(spark, in_dir, out_dir, cp_dir).awaitTermination(120)

    got = {
        (r["window_start"].minute, r["event_type"]): r
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (0, "a") in got and got[(0, "a")]["n_events"] == 2  # late drop
    assert got[(0, "a")]["sum_value"] == 3.0  # 99.0 never counted
    assert (5, "b") in got and got[(5, "b")]["n_events"] == 1
    assert (20, "a") in got and (20, "b") in got  # closed by run 3
    # run 3's no-data final microbatch advances the watermark to
    # 11:00−10min = 10:50, closing the 10:40 window too
    assert (40, "a") in got and got[(40, "a")]["n_events"] == 1
    # the 11:00 event's own window (ends 11:05 > watermark) stays open:
    # no 'b' row in hour 11 (every emitted row is still in hour 10)
    assert all(r["window_start"].hour == 10 for r in got.values())


def _write_events(path, rows, id_start=0):
    """Flat single-file events parquet: (ts, user_id, value) rows with
    µs timestamps (Spark's vectorized reader rejects pandas' ns)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(
        pd.DataFrame(
            {
                "event_id": pd.array(
                    range(id_start, id_start + len(rows)), dtype="int64"
                ),
                "ts": pd.to_datetime([r[0] for r in rows]),
                "user_id": pd.array([r[1] for r in rows], dtype="int64"),
                "event_type": ["x"] * len(rows),
                "value": [float(r[2]) for r in rows],
                "props": ["{}"] * len(rows),
            }
        ),
        preserve_index=False,
    )
    ts_us = pa.schema(
        [
            f if f.name != "ts" else pa.field("ts", pa.timestamp("us"))
            for f in tbl.schema
        ]
    )
    pq.write_table(tbl.cast(ts_us), path)


def test_stream_sessionize_merges_and_finalizes(spark, tmp_path):
    """session_window streaming sessions: events within the gap merge
    into one session, a session emits once after the watermark passes
    its end, and late events are dropped without corrupting finalized
    sessions."""
    from datetime import datetime as DT

    from tesseract_recognize_spark.streaming.windowed import (
        stream_sessionize,
    )

    in_dir = str(tmp_path / "sin")
    out_dir = str(tmp_path / "sout")
    cp_dir = str(tmp_path / "scp")
    os.makedirs(in_dir)
    t = lambda h, m: DT(2024, 1, 1, h, m)  # noqa: E731

    # run 1: u1 session of two events (10 min apart < 30-min gap), u2
    # singleton; u9 @12:00 advances the watermark (11:50) past both
    # session ends (10:40 / 10:35) so both finalize
    _write_events(
        f"{in_dir}/f0.parquet",
        [(t(10, 0), 1, 1.0), (t(10, 10), 1, 2.0),
         (t(10, 5), 2, 5.0), (t(12, 0), 9, 1.0)],
    )
    stream_sessionize(spark, in_dir, out_dir, cp_dir).awaitTermination(120)

    # run 2: a late event (10:20 < watermark) must vanish — u1's
    # finalized session stays n=2; u9 @13:30 closes u9's 12:00 session
    _write_events(
        f"{in_dir}/f1.parquet",
        [(t(10, 20), 1, 99.0), (t(13, 30), 9, 1.0)],
        id_start=100,
    )
    stream_sessionize(spark, in_dir, out_dir, cp_dir).awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"].hour, r["session_start"].minute): r
        for r in spark.read.parquet(out_dir).collect()
    }
    u1 = got[(1, 10, 0)]
    assert u1["n_events"] == 2 and u1["sum_value_cents"] == 300
    # session end = last event + gap
    assert (u1["session_end"].hour, u1["session_end"].minute) == (10, 40)
    assert got[(2, 10, 5)]["n_events"] == 1
    assert got[(9, 12, 0)]["n_events"] == 1  # closed by run 2
    # the late 99.0 event never landed anywhere: 300 + 500 + 100 cents
    assert sum(r["sum_value_cents"] for r in got.values()) == 900
    # u9's 13:30 session is still open (watermark 13:20 < end 14:00)
    assert (9, 13, 30) not in got
