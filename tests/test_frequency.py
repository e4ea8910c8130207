"""Distributed Misra-Gries heavy hitters (operators/frequency.py):
exactness of the final output under adversarial partitioning, the
strict-threshold boundary, and the broadcast-semi plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantik_spark.operators.frequency import heavy_hitters


def _exact(spark, df, key, m):
    n = df.count()
    return {
        (r["k"], r["n"])
        for r in df.groupBy(F.col(key).alias("k"))
        .agg(F.count("*").alias("n"))
        .where(F.col("n") * m > F.lit(n))
        .collect()
    }


def test_matches_exact_groupby_any_partitioning(spark):
    # zipf-ish: key i appears 1000//i times, i in 1..200
    rows = [(f"k{i}",) for i in range(1, 201) for _ in range(1000 // i)]
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, ["k"]).repartition(parts)
        got = {(r["k"], r["n"]) for r in heavy_hitters(df, "k", m=20).collect()}
        assert got == _exact(spark, df, "k", 20), parts


def test_strict_threshold_boundary(spark):
    # 10 keys x 10 rows each, N=100, m=10: count*m == N exactly — the
    # strict > excludes ALL of them
    rows = [(f"k{i}",) for i in range(10) for _ in range(10)]
    df = spark.createDataFrame(rows, ["k"])
    assert heavy_hitters(df, "k", m=10).collect() == []
    # m=11: count*11 = 110 > 100 — all ten qualify
    assert len(heavy_hitters(df, "k", m=11).collect()) == 10


def test_many_distinct_keys_candidates_stay_small(spark):
    # 5000 singletons + 2 heavy keys: the heavy pair must survive the
    # m=50 candidate stage in every partitioning
    rows = [(f"s{i}",) for i in range(5000)] + [("hot1",)] * 400 + [("hot2",)] * 300
    df = spark.createDataFrame(rows, ["k"]).repartition(16)
    got = {r["k"]: r for r in heavy_hitters(df, "k", m=50).collect()}
    assert set(got) == {"hot1", "hot2"}
    assert got["hot1"]["n"] == 400 and got["hot2"]["n"] == 300
    assert got["hot1"]["frac"] == round(400 / 5700, 6)


def test_plan_broadcasts_candidates(spark):
    rows = [("a",)] * 50 + [("b",)] * 5
    df = spark.createDataFrame(rows, ["k"])
    plan = (
        heavy_hitters(df, "k", m=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_null_keys_excluded_consistently(spark):
    # nulls are excluded from candidates AND from N: 60 nulls must not
    # dilute the fractions of the non-null keys
    rows = [("a",)] * 30 + [("b",)] * 10 + [(None,)] * 60
    df = spark.createDataFrame(rows, "k string")
    got = {r["k"]: r for r in heavy_hitters(df, "k", m=3).collect()}
    # non-null N = 40: a (30*3=90 > 40) passes, b (10*3=30 < 40) fails
    assert set(got) == {"a"}
    assert got["a"]["n"] == 30 and got["a"]["frac"] == 0.75
