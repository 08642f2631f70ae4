"""Determinism pins for the sampling operators (operators/sampling.py):
the sample must be a pure function of the data — identical under any
partitioning — and the top-n path must compile to WindowGroupLimit."""

from __future__ import annotations

from pyspark.sql import Row

from tesseract_recognize_spark.operators.sampling import (
    per_stratum_topn,
    stratified_sample,
)


def _df(spark, n=400):
    return spark.createDataFrame(
        [Row(k=i, stratum=["a", "b", "c", "d"][i % 4]) for i in range(n)],
        "k: bigint, stratum: string",
    )


def test_stratified_sample_partitioning_independent(spark):
    df = _df(spark)
    fr = {"a": 1.0, "b": 0.5, "c": 0.1, "d": 0.0}
    got1 = {
        r["k"]
        for r in stratified_sample(
            df.repartition(1), "stratum", fr, "k"
        ).collect()
    }
    got7 = {
        r["k"]
        for r in stratified_sample(
            df.repartition(7), "stratum", fr, "k"
        ).collect()
    }
    assert got1 == got7
    # fraction 1.0 keeps everything, 0.0 keeps nothing
    kept_by = {}
    for r in stratified_sample(df, "stratum", fr, "k").collect():
        kept_by[r["stratum"]] = kept_by.get(r["stratum"], 0) + 1
    assert kept_by["a"] == 100
    assert "d" not in kept_by
    # Bernoulli strata land near their expectation (100 trials each)
    assert 30 <= kept_by["b"] <= 70
    assert 1 <= kept_by["c"] <= 25
    # a different salt selects a different (same-sized-ish) population
    other = {
        r["k"]
        for r in stratified_sample(df, "stratum", fr, "k", salt="s1").collect()
    }
    assert other != got1


def test_per_stratum_topn_exact_and_stable(spark):
    df = _df(spark)
    got1 = sorted(
        r["k"] for r in per_stratum_topn(df.repartition(1), "stratum", 10, "k").collect()
    )
    got7 = sorted(
        r["k"] for r in per_stratum_topn(df.repartition(7), "stratum", 10, "k").collect()
    )
    assert got1 == got7 and len(got1) == 40  # 10 per stratum, exact
    # small stratum: min(n, size) rows, not padded
    tiny = _df(spark, 6)  # strata a,b: 2 rows; c,d: 1
    assert per_stratum_topn(tiny, "stratum", 10, "k").count() == 6


def test_per_stratum_topn_plan_is_window_group_limit(spark):
    plan = (
        per_stratum_topn(_df(spark), "stratum", 5, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
