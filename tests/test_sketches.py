"""KMV distinct sketch (operators/sketches.py) — exactness below k,
estimator accuracy above k, and the algebraic-merge property the
two-phase plan relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantik_spark.operators.sketches import kmv_distinct


def test_kmv_exact_below_k(spark):
    rows = [("a", i % 10) for i in range(100)] + [("b", i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["g"]: r for r in kmv_distinct(df, "g", "v", k=64).collect()}
    assert out["a"]["n_exact"] == 10 and out["a"]["kmv_estimate"] == 10.0
    assert out["b"]["n_exact"] == 3 and out["b"]["kmv_estimate"] == 3.0
    assert out["a"]["rel_error"] == 0.0


def test_kmv_estimate_above_k(spark):
    # 5000 distinct values, k=64: KMV stderr ~ 1/sqrt(k-2) ~ 12.7%;
    # assert a loose 3-sigma band so the test is deterministic-stable
    df = spark.range(5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    r = kmv_distinct(df, "g", "v", k=64).collect()[0]
    assert r["n_exact"] == 5000
    assert r["n_sketch"] == 64
    assert abs(r["kmv_estimate"] - 5000) / 5000 < 0.4
    assert r["rel_error"] == round(abs(r["kmv_estimate"] - 5000) / 5000, 6)


def test_kmv_duplicates_do_not_inflate(spark):
    # every value appears 50x — the estimate must see only distincts
    rows = [("g", i) for i in range(200) for _ in range(50)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = kmv_distinct(df, "g", "v", k=256).collect()[0]
    assert r["n_exact"] == 200
    assert r["kmv_estimate"] == 200.0  # below k → exact


def test_kmv_salt_count_invariance(spark):
    # the merged k-smallest set is independent of how phase 1 salts —
    # the property that makes the sketch mergeable across partitions
    df = spark.range(3000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    a = kmv_distinct(df, "g", "v", k=32, n_salts=1).collect()[0]
    b = kmv_distinct(df, "g", "v", k=32, n_salts=64).collect()[0]
    assert a["kmv_estimate"] == b["kmv_estimate"]
    assert a["n_exact"] == b["n_exact"]
