"""Semantics pins for the temporal operators (operators/temporal.py):
gap sessionization boundaries, as-of tie discipline, range-join edge
inclusivity. Tiny hand-built inputs — every expected value derived by
hand, independent of the DuckDB gate."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F, types as T

from tesseract_recognize_spark.operators.temporal import (
    asof_join,
    range_join_counts,
    sessionize,
)

MIN_US = 60_000_000
BASE_US = 1_704_067_200 * 1_000_000  # 2024-01-01T00:00:00 in epoch µs

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _events(spark, rows):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=base + timedelta(minutes=m),
                user_id=u,
                value=v,
            )
            for i, (u, m, v) in enumerate(rows)
        ],
        EV_SCHEMA,
    )


def test_sessionize_gap_boundaries(spark):
    # user 1: gaps of 10, exactly-60 (NOT a new session: > only), 61
    # (new session) minutes; user 2: single event
    ev = _events(
        spark,
        [(1, 0, 1.0), (1, 10, 2.0), (1, 70, 3.0), (1, 131, 4.0), (2, 5, 9.5)],
    )
    got = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(ev, gap_minutes=60).collect()
    }
    assert len(got) == 3
    s1 = got[(1, 1)]
    assert s1["n_events"] == 3  # 0, 10, 70 — the 60-min gap stays inside
    assert s1["session_start_us"] == BASE_US
    assert s1["session_end_us"] == BASE_US + 70 * MIN_US
    assert s1["sum_value_cents"] == 600
    s2 = got[(1, 2)]
    assert s2["n_events"] == 1
    assert s2["session_start_us"] == BASE_US + 131 * MIN_US
    assert got[(2, 1)]["sum_value_cents"] == 950


def test_asof_join_tie_and_no_prior(spark):
    ev = _events(
        spark,
        [
            (1, 5, 10.0),   # 0: purchase @5
            (1, 5, 20.0),   # 1: purchase @5 (dup ts — larger id wins)
            (1, 5, 0.0),    # 2: click @5  — equal ts matches (<=)
            (1, 3, 0.0),    # 3: click @3  — before any purchase → NULL
            (1, 9, 30.0),   # 4: purchase @9
            (1, 8, 0.0),    # 5: click @8  — latest prior is id 1 (@5)
            (2, 1, 0.0),    # 6: click, user 2 — never matches user 1
        ],
    )
    us = ev.select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " ts)"
        ).alias("ts_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    clicks = us.join(
        ev.filter(F.col("value") == 0.0).select("event_id"), "event_id"
    ).select("user_id", "event_id", "ts_us")
    purchases = us.join(
        ev.filter(F.col("value") > 0.0).select("event_id"), "event_id"
    ).select("user_id", "event_id", "ts_us", "value_cents")
    got = {
        r["event_id"]: r
        for r in asof_join(
            clicks, purchases, on="user_id", right_payload=("value_cents",)
        ).collect()
    }
    assert got[2]["asof_event_id"] == 1  # equal-ts match, larger id wins
    assert got[2]["asof_value_cents"] == 2000
    assert got[3]["asof_event_id"] is None  # nothing at or before @3
    assert got[5]["asof_event_id"] == 1  # @8: purchase @9 is in the future
    assert got[6]["asof_event_id"] is None  # user isolation
    assert len(got) == 4  # every left row survives exactly once


def test_range_join_counts_edges(spark):
    # anchors @minute 100; probes at 89 (out), 90 (exactly tol — in),
    # 100 (in), 110 (in), 111 (out); tolerance 10 min
    anchors = _events(spark, [(1, 100, 0.0)]).select(
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " ts)"
        ).alias("ts_us"),
    )
    probes = _events(
        spark,
        [(9, m, 0.0) for m in (89, 90, 100, 110, 111)],
    ).select(
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " ts)"
        ).alias("ts_us"),
    )
    got = range_join_counts(
        anchors, probes, tolerance_minutes=10
    ).collect()
    assert len(got) == 1
    assert got[0]["n_within"] == 3  # 90, 100, 110; both edges inclusive
    # anchor with zero matches still emits a row (left join + coalesce)
    far = _events(spark, [(5, 500, 0.0)]).select(
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " ts)"
        ).alias("ts_us"),
    )
    got2 = range_join_counts(far, probes, tolerance_minutes=10).collect()
    assert got2[0]["n_within"] == 0


def test_asof_join_rejoin_payloads_identical(spark):
    """The wide-payload scale path (narrow union/window core + payload
    rejoin) must produce the IDENTICAL rows and columns as the default
    path — including no-prior NULLs, equal-ts ties, and user isolation."""
    ev = _events(
        spark,
        [
            (1, 5, 10.0),
            (1, 5, 20.0),
            (1, 5, 0.0),
            (1, 3, 0.0),
            (1, 9, 30.0),
            (1, 8, 0.0),
            (2, 1, 0.0),
            (2, 2, 40.0),
            (2, 7, 0.0),
        ],
    )
    us = ev.select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " ts)"
        ).alias("ts_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
        # a wide-ish payload column that must NOT ride the window sort
        F.concat(F.lit("payload_"), F.col("event_id")).alias("blob"),
    )
    clicks = us.filter(F.col("value_cents") == 0).select(
        "user_id", "event_id", "ts_us", "blob"
    )
    purchases = us.filter(F.col("value_cents") > 0).select(
        "user_id", "event_id", "ts_us", "value_cents"
    )
    wide = asof_join(
        clicks, purchases, on="user_id", right_payload=("value_cents",)
    )
    narrow = asof_join(
        clicks,
        purchases,
        on="user_id",
        right_payload=("value_cents",),
        rejoin_payloads=True,
        left_id="event_id",
    )
    assert narrow.columns == wide.columns
    key = lambda r: r["event_id"]  # noqa: E731
    assert sorted(narrow.collect(), key=key) == sorted(
        wide.collect(), key=key
    )


def test_asof_join_rejoin_payloads_per_key_right_ids(spark):
    """right_id only has to be unique WITHIN a key (the default path's
    tie-break contract): the payload rejoin keys on (key, id), so the
    same right_id under two users must not cross-match or duplicate."""
    left = spark.createDataFrame(
        [(1, 101, 50), (2, 102, 50)], "user_id long, click_id long, ts_us long"
    )
    # right_id=7 appears under BOTH users, with different payloads
    right = spark.createDataFrame(
        [(1, 7, 10, 111), (2, 7, 20, 222)],
        "user_id long, event_id long, ts_us long, cents long",
    )
    got = asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts_us",
        right_payload=("cents",),
        rejoin_payloads=True,
        left_id="click_id",
    ).collect()
    assert len(got) == 2
    by_user = {r["user_id"]: r for r in got}
    assert by_user[1]["asof_cents"] == 111
    assert by_user[2]["asof_cents"] == 222


def test_asof_join_rejoin_payloads_needs_left_id(spark):
    ev = _events(spark, [(1, 5, 10.0)])
    us = ev.select(
        "user_id", "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " ts)"
        ).alias("ts_us"),
    )
    with pytest.raises(ValueError, match="left_id"):
        asof_join(us, us, on="user_id", rejoin_payloads=True)
