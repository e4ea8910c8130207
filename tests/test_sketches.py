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


# --- DDSketch quantiles ----------------------------------------------------

from semantik_spark.operators.sketches import (  # noqa: E402
    ddsketch_buckets,
    ddsketch_params,
    ddsketch_quantiles,
)


def _vals(spark, values, g="g"):
    return spark.createDataFrame([(g, float(v)) for v in values], ["g", "v"])


def test_ddsketch_relative_error_bound(spark):
    # 1..1000: every estimate must be within alpha of the true
    # lower-quantile value — the sketch's defining guarantee
    import math

    alpha = 0.01
    vals = list(range(1, 1001))
    out = {r["q"]: r for r in ddsketch_quantiles(
        _vals(spark, vals), "g", "v", alpha=alpha,
        quantiles=(0.25, 0.5, 0.9, 0.99)).collect()}
    for q, row in out.items():
        true = vals[max(1, math.ceil(q * len(vals))) - 1]
        assert abs(row["estimate"] - true) / true <= alpha + 1e-9, (q, row, true)
        assert row["n"] == 1000


def test_ddsketch_merge_equals_rebuild(spark):
    # merge(sketch(A), sketch(B)) == sketch(A ∪ B): bucket counts add
    a = [1.5 * i for i in range(1, 400)]
    b = [0.02 * i for i in range(1, 300)]
    sa = ddsketch_buckets(_vals(spark, a), "g", "v", alpha=0.02)
    sb = ddsketch_buckets(_vals(spark, b), "g", "v", alpha=0.02)
    merged = (
        sa.unionByName(sb).groupBy("g", "bucket")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    rebuilt = ddsketch_buckets(_vals(spark, a + b), "g", "v", alpha=0.02)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rebuilt.collect()))
    # and quantiles extracted from the merged sketch match the rebuild
    qm = ddsketch_quantiles(None, "g", "v", alpha=0.02, buckets=merged).collect()
    qr = ddsketch_quantiles(_vals(spark, a + b), "g", "v", alpha=0.02).collect()
    assert sorted(map(tuple, qm)) == sorted(map(tuple, qr))


def test_ddsketch_nonpositive_reserved_bucket(spark):
    rows = [("g", -1.0), ("g", 0.0), ("g", 5.0), ("g", 7.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    b = ddsketch_buckets(df, "g", "v", alpha=0.02)
    assert b.where(F.col("bucket") == -(2**31)).collect()[0]["n"] == 2
    # quantiles are computed over positive values only
    out = ddsketch_quantiles(df, "g", "v", alpha=0.02, quantiles=(0.5,)).collect()
    assert out[0]["n"] == 2


def test_ddsketch_params_stable():
    gamma, inv_lg, coeff = ddsketch_params(0.02)
    assert abs(gamma - 1.02 / 0.98) < 1e-15
    assert abs(coeff * (gamma + 1.0) - 2.0) < 1e-15


def test_winsorized_stats_clamps_tails(spark):
    from semantik_spark.operators.sketches import winsorized_stats

    # 1..100 plus two absurd outliers: the winsorized mean must sit
    # near the bulk mean while the raw mean is dragged far right
    vals = list(range(1, 101)) + [100000.0, 500000.0]
    df = spark.createDataFrame([("g", float(v)) for v in vals], ["g", "v"])
    r = winsorized_stats(df, "g", "v", alpha=0.02, lo_q=0.05, hi_q=0.95).collect()[0]
    assert r["n"] == 102
    assert r["n_hi"] >= 2  # both outliers clamped (plus tail of bulk)
    assert r["winsorized_mean"] < 120
    assert r["raw_mean"] > 5000
    assert r["n_lo"] >= 0
