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


def test_count_min_never_underestimates(spark):
    """CM point estimates over every distinct key: estimate >= exact,
    and exact for keys whose cells hold no colliding mass (guaranteed
    when width >> distinct keys)."""
    from semantik_spark.operators.frequency import count_min_report

    rows = [("a",)] * 50 + [("b",)] * 20 + [(f"z{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, ["k"])
    out = {r["k"]: r for r in
           count_min_report(df, "k", depth=4, width=1024, top=100).collect()}
    assert len(out) == 32
    for r in out.values():
        assert r["overestimate"] >= 0
        assert r["cm_estimate"] >= r["n_exact"]
    assert out["a"]["n_exact"] == 50 and out["b"]["n_exact"] == 20
    # width 1024 vs 32 keys: with 4 independent rows a persistent
    # collision on ALL rows for a given key is (32/1024)^4-unlikely;
    # the heavy keys must come out exact
    assert out["a"]["overestimate"] == 0
    assert out["b"]["overestimate"] == 0


def test_count_min_tiny_width_overestimates_but_bounded(spark):
    """Force collisions (width=4): estimates still >= exact and
    <= exact + N (trivial bound), nulls excluded."""
    from semantik_spark.operators.frequency import (
        count_min_cells, count_min_estimate, count_min_report,
    )
    from pyspark.sql import functions as F

    rows = [(k,) for k in "aabbbbccccddddddeeee"] + [(None,)] * 5
    df = spark.createDataFrame(rows, ["k"])
    out = {r["k"]: r for r in
           count_min_report(df, "k", depth=2, width=4, top=10).collect()}
    n = 20
    for r in out.values():
        assert 0 <= r["overestimate"] <= n - r["n_exact"]
    # cells state is bounded by depth*width and sums to depth*N
    cells = count_min_cells(df, "k", depth=2, width=4)
    assert cells.count() <= 8
    assert cells.agg(F.sum("n")).collect()[0][0] == 2 * n
    # probing a never-seen key returns colliding mass only (>= 0)
    probe = spark.createDataFrame([("ghost",)], ["k"])
    est = count_min_estimate(cells, probe, "k", depth=2, width=4).collect()[0]
    assert est["cm_estimate"] >= 0


def test_count_min_cells_merge_by_addition(spark):
    """Cell-wise addition of two halves' sketches == one-shot sketch
    (the PODS'12 mergeability the streaming state relies on)."""
    from pyspark.sql import functions as F

    from semantik_spark.operators.frequency import count_min_cells

    rows = [(f"k{i % 7}",) for i in range(100)]
    df = spark.createDataFrame(rows, ["k"]).withColumn(
        "half", F.monotonically_increasing_id() % 2
    )
    whole = {(r["row"], r["bucket"]): r["n"] for r in
             count_min_cells(df, "k", depth=3, width=16).collect()}
    merged: dict = {}
    for h in (0, 1):
        part = count_min_cells(df.where(F.col("half") == h), "k",
                               depth=3, width=16)
        for r in part.collect():
            key = (r["row"], r["bucket"])
            merged[key] = merged.get(key, 0) + r["n"]
    assert merged == whole
