"""Mergeable sketch operators — approximate distinct counting.

The reference has no sketching at all (its cardinalities come from
exact Postgres/Qdrant counts); at 100 TB an exact COUNT(DISTINCT) per
group is a full shuffle of every distinct value, so an engine at that
scale needs a bounded-state estimator. This module implements KMV
(k-minimum-values, Bar-Yossef et al. 2002, the estimator family behind
Theta sketches): keep the k smallest *distinct* hash values per group;
if fewer than k values exist the count is exact, otherwise
``(k-1) / u_k`` where ``u_k`` is the k-th smallest hash mapped into
(0, 1].

Why KMV and not HyperLogLog here: KMV is exactly reproducible from
plain SQL in any engine (the oracle replays it in DuckDB bit-for-bit
via the same md5-based ``hash60``), while HLL's register layout is
implementation-defined — determinism is what makes the sketch
testable. The estimator is mergeable the same way HLL is: the union of
per-partition k-smallest sets, re-truncated to k, IS the global
k-smallest set, which is what the two-phase plan below exploits.

Scale shape (100 TB): exactly two aggregation exchanges (asserted in
tests/test_plans.py). Phase 1 groups by (group, salt) where the salt
is derived from the value hash, so each reducer holds one salt's
distinct-hash set — a whale group's state divides by ``n_salts``
(size it to the executor heap); every aggregation is map-side
combinable, no windows, no global sort. A strictly constant-memory
phase 1 (truncate-to-k inside the accumulator) drops into the same
merge algebra via applyInPandas if a deployment needs it; the
expression form keeps the whole sketch JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantik_spark.functions.hashing import hash60

# hash60 yields 60-bit ints; +1 keeps u strictly positive so the
# (k-1)/u_k division is always defined
_HASH_SPACE = float(2**60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    n_salts: int = 32,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col`` with the
    exact reference count alongside.

    Returns (group, n_exact, n_sketch, kmv_estimate, rel_error):
    ``n_exact`` the exact distinct-hash count (= distinct values up to
    60-bit hash collisions, i.e. exact for any realistic cardinality —
    computable here because the salt is a function of the hash, so the
    per-salt distinct-hash sets are disjoint and their sizes sum),
    ``n_sketch`` = min(k, distinct hashes), ``kmv_estimate`` the KMV
    estimate, ``rel_error`` its relative error vs exact — the operator
    doubles as its own quality report.
    """
    h = hash60(F.col("val"))
    base = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("val")
    ).select(
        "g",
        ((h + F.lit(1)) / F.lit(_HASH_SPACE)).alias("u"),
        F.pmod(h, F.lit(n_salts)).alias("salt"),
    )
    # phase 1: per (group, salt) — the salt's distinct hashes, sorted;
    # same hash ⇒ same salt, so the sets are disjoint across salts and
    # |set| sums to the group's exact distinct-hash count
    partial = (
        base.groupBy("g", "salt")
        .agg(F.array_sort(F.collect_set("u")).alias("aus"))
        .select(
            "g",
            F.slice("aus", 1, k).alias("us"),
            F.size("aus").cast("long").alias("nd"),
        )
    )
    # phase 2: algebraic merge — k smallest of the union of per-salt
    # k-smallest sets is the global k-smallest set
    merged = partial.groupBy("g").agg(
        F.slice(F.array_sort(F.array_distinct(F.flatten(F.collect_list("us")))), 1, k).alias("us"),
        F.sum("nd").cast("bigint").alias("n_exact"),
    )
    n_sketch = F.size("us")
    u_k = F.array_max("us")  # the k-th smallest kept hash
    est = F.when(n_sketch < k, n_sketch.cast("double")).otherwise(
        F.lit(float(k - 1)) / u_k
    )
    return merged.select(
        F.col("g").alias(group_col),
        "n_exact",
        n_sketch.cast("int").alias("n_sketch"),
        F.round(est, 6).alias("kmv_estimate"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_error"),
    )


def kmv_set_ops(df: DataFrame, group_col: str, value_col: str,
                k: int = 64) -> DataFrame:
    """Theta-sketch-style set algebra between every pair of groups:
    approximate |A|, |B|, |A∪B| from KMV sketches and |A∩B| by
    inclusion-exclusion — the classic 'distinct users shared by two
    event types' question answered from bounded state.

    group_a, group_b (a < b), est_a, est_b, est_union, est_intersect,
    jaccard_est (all 6 dp; est_intersect clamped at 0).

    Union is where KMV shines: the k smallest of (sketch_A ∪ sketch_B)
    IS the sketch of A∪B — merge is re-truncation, no rescan. The whole
    operator therefore runs on |groups|·k sketch rows after ONE
    distinct-hash aggregation of the input; the pairwise stage is a
    |groups|² self-join of k-length arrays (trivial — group count is
    small by construction; for thousands of groups you'd bucket the
    pair space).
    """
    h = hash60(F.col("val"))
    hashes = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("val"))
        .select("g", ((h + F.lit(1)) / F.lit(_HASH_SPACE)).alias("u"))
        .distinct()
    )
    sk = hashes.groupBy("g").agg(
        F.slice(F.array_sort(F.collect_set("u")), 1, k).alias("us")
    )

    def _est(us):
        n = F.size(us)
        return F.when(n < k, n.cast("double")).otherwise(
            F.lit(float(k - 1)) / F.array_max(us)
        )

    a = sk.select(F.col("g").alias("group_a"), F.col("us").alias("us_a"))
    b = sk.select(F.col("g").alias("group_b"), F.col("us").alias("us_b"))
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("us_a", "us_b"))), 1, k
    )
    est_a = _est(F.col("us_a"))
    est_b = _est(F.col("us_b"))
    est_u = _est(merged)
    est_i = F.greatest(est_a + est_b - est_u, F.lit(0.0))
    return pairs.select(
        "group_a", "group_b",
        F.round(est_a, 6).alias("est_a"),
        F.round(est_b, 6).alias("est_b"),
        F.round(est_u, 6).alias("est_union"),
        F.round(est_i, 6).alias("est_intersect"),
        F.round(est_i / est_u, 6).alias("jaccard_est"),
    )
