"""spread() contract tests (r13 optimization round).

spread() unlocks N-way compute for kernels whose broadcast fan-out
would otherwise fuse into a single-task scan stage (guide §2.5); its
contract has two halves the optimizations rely on:

  1. scale-adaptivity — it is a provable NO-OP once the input already
     carries >= defaultParallelism partitions (so at production scale
     it never adds a corpus-wide shuffle);
  2. value-neutrality — every kernel it was applied to computes
     per-row/exact-aggregate values whose results cannot depend on row
     placement, so any repartitioning yields identical rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from semantik_spark.functions.parallel import spread


def test_spread_raises_single_partition_to_default(spark):
    df = spark.range(100).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread(df, "id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # same rows, key-partitioned
    assert sorted(r["id"] for r in out.collect()) == list(range(100))


def test_spread_noop_at_production_partition_counts(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 4)
    out = spread(df, "id")
    # no-op: the SAME plan object comes back, no exchange added
    assert out is df


def test_knn_kernels_placement_free(spark):
    """knn_bruteforce (the template for every spread site in
    similarity.py) returns identical rows for a 1-partition and an
    N-partition copy of the same corpus — the value-neutrality the
    spread() calls rely on."""
    from semantik_spark.operators.similarity import knn_bruteforce

    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.sin(F.col("id") * (i + 1)).cast("double")
                  for i in range(8)]).alias("embedding"),
    )
    qs = spark.range(3).select(
        F.col("id").alias("query_id"),
        F.array(*[F.cos(F.col("id") * (i + 1)).cast("double")
                  for i in range(8)]).alias("query_vec"),
    )
    one = knn_bruteforce(emb.coalesce(1), qs, k=5).collect()
    many = knn_bruteforce(emb.repartition(16, "vec_id"), qs, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(((r["query_id"], r["rank"], r["vec_id"]) for r in one)) == \
        sorted(((r["query_id"], r["rank"], r["vec_id"]) for r in many))


def test_poisson_bootstrap_placement_free(spark):
    """The replicate aggregates are exact bigint×DECIMAL sums: the CI
    is identical however the input is partitioned (the property that
    made the 74s→4.5s spread legal)."""
    from semantik_spark.operators.stattests import poisson_bootstrap_mean

    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 101).cast("double").alias("v"),
    )
    a = poisson_bootstrap_mean(df.coalesce(1), "v", "k",
                               replicates=20).collect()[0]
    b = poisson_bootstrap_mean(df.repartition(16, "k"), "v", "k",
                               replicates=20).collect()[0]
    assert a.asDict() == b.asDict()
