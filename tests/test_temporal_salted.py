"""Skew-path pin for sessionize(salt_chunk_minutes=...): the two-level
(salt by derived time-chunk → sub-sessions → per-user merge) plan must
produce IDENTICAL rows to the unsalted single-window plan, including on
a corpus where one power user owns half of all events and sessions
straddle chunk boundaries."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row, types as T

from tesseract_recognize_spark.operators.temporal import sessionize

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _skewed_events(spark, n=2000, seed=13):
    """One hot user owns 50% of events (dense, mostly gap-less activity —
    the straggler shape); 20 cold users share the rest. Timestamps span
    ~12 days so day-sized chunks cut many sessions mid-flight."""
    rng = random.Random(seed)
    base = datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            u = 0  # the power user
            m = rng.randrange(0, 12 * 24 * 60)
        else:
            u = 1 + rng.randrange(20)
            m = rng.randrange(0, 12 * 24 * 60)
        rows.append(
            Row(
                event_id=i,
                ts=base + timedelta(minutes=m),
                user_id=u,
                value=round(rng.uniform(0, 50), 2),
            )
        )
    return spark.createDataFrame(rows, EV_SCHEMA)


def _canon(df):
    return sorted(
        (
            r["user_id"],
            r["session_seq"],
            r["session_start_us"],
            r["session_end_us"],
            r["n_events"],
            r["sum_value_cents"],
        )
        for r in df.collect()
    )


@pytest.mark.parametrize("chunk_minutes", [1440, 360, 97])
def test_salted_equals_unsalted_on_power_user_corpus(spark, chunk_minutes):
    """Chunk sizes above, equal to, and (deliberately) below the gap —
    correctness must not depend on the chunk/gap ratio, only efficiency
    does."""
    ev = _skewed_events(spark)
    plain = _canon(sessionize(ev, gap_minutes=360))
    salted = _canon(
        sessionize(ev, gap_minutes=360, salt_chunk_minutes=chunk_minutes)
    )
    assert salted == plain


def test_salted_merges_session_straddling_chunk_boundary(spark):
    """Two events 1 minute apart on either side of a chunk boundary are
    ONE session (the oversplit must fuse back); two events with a
    true > gap distance across the boundary stay separate."""
    base = datetime(2024, 1, 1)
    rows = [
        # chunk = 60 min; boundary at minute 60
        Row(event_id=0, ts=base + timedelta(minutes=59), user_id=1, value=1.0),
        Row(event_id=1, ts=base + timedelta(minutes=61), user_id=1, value=1.0),
        # same shape for user 2 but 200 min apart: separate sessions
        Row(event_id=2, ts=base + timedelta(minutes=59), user_id=2, value=1.0),
        Row(event_id=3, ts=base + timedelta(minutes=259), user_id=2, value=1.0),
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        (r["user_id"], r["session_seq"]): r["n_events"]
        for r in sessionize(
            ev, gap_minutes=30, salt_chunk_minutes=60
        ).collect()
    }
    assert got == {(1, 1): 2, (2, 1): 1, (2, 2): 1}
