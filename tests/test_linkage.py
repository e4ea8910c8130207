"""Record linkage (operators/linkage.py): blocking recall, scoring
boundary, and k-anonymity audit semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantik_spark.operators.linkage import (blocked_linkage, digit_sum,
                                              link_score)


def test_digit_sum_transposition_invariant(spark):
    df = spark.createDataFrame(
        [("Customer#000000123",), ("Customer#000000132",), ("nodigits",)],
        ["s"])
    vals = [r["d"] for r in df.select(digit_sum("s").alias("d")).collect()]
    assert vals == [6, 6, 0]


def test_linkage_recovers_every_dirty_record(spark):
    """Recall: the transposed copy of every source must link back to
    it (digit-sum blocking is transposition-invariant; name dist <= 2
    + value within 1 clears the threshold)."""
    rows = [(i % 5, i, f"person{i:04d}", float(i) + 0.25) for i in range(60)]
    clean = spark.createDataFrame(rows, ["blk", "rec_id", "name", "value"])
    n = F.length("name")
    dirty = clean.select(
        "blk", (F.col("rec_id") + 1000).alias("rec_id"),
        F.concat(F.substring(F.col("name"), F.lit(1), n - 2),
                 F.substr(F.col("name"), n, F.lit(1)),
                 F.substr(F.col("name"), n - 1, F.lit(1))).alias("name"),
        F.floor("value").cast("double").alias("value"),
    ).withColumn("dsum", digit_sum("name"))
    cleanb = clean.withColumn("dsum", digit_sum("name"))
    out = blocked_linkage(cleanb, dirty, ["blk", "dsum"]).collect()
    linked = {(r["id_left"], r["id_right"]) for r in out}
    for i in range(60):
        assert (i, i + 1000) in linked
    # every accepted pair clears the threshold with a close name
    assert all(r["score_milli"] >= 3000 and r["name_dist"] <= 2 for r in out)


def test_k_anonymity_report_min_and_flags(spark):
    from semantik_spark.operators.pii import k_anonymity_report

    rows = ([("a", 1)] * 10) + ([("a", 2)] * 3) + ([("b", 1)] * 7)
    df = spark.createDataFrame(rows, ["q1", "q2"])
    out = {(r["q1"], r["q2"]): r for r in
           k_anonymity_report(df, ["q1", "q2"], k=5).collect()}
    assert out[("a", 1)]["class_size"] == 10 and not out[("a", 1)]["at_risk"]
    assert out[("a", 2)]["class_size"] == 3 and out[("a", 2)]["at_risk"]
    assert all(r["k_anonymity"] == 3 for r in out.values())
