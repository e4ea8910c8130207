"""Adaptive parallelism for compute-heavy kernels over small scans.

A parquet table written as one file with one row group scans as ONE
task no matter how many cores the session has — and every narrow
operation downstream (explode, per-position hashing, parser kernels)
stays in that single task until the first exchange. For kernels whose
cost is dominated by per-row compute rather than bytes (CDC anchor
hashing, text parsing, per-character scans), that serializes the whole
operator on one core while the other N-1 idle.

``spread(df)`` hash-repartitions such an input up to the session's
default parallelism — but ONLY when the current plan has fewer
partitions than that, so at production scale (where the scan already
carries >= cores partitions) it is a provable no-op and never adds a
corpus-wide shuffle. The exchange it does add locally moves the small
input once (KB-MB) to unlock an N-way compute stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff its
    physical plan currently has fewer partitions. ``key_cols``: hash-
    partition on these columns (deterministic row placement under
    retries); without keys, round-robin (Spark's sort-before-repartition
    keeps that deterministic too).

    PRECONDITION (ADVICE r13): ``df`` must be a raw scan or a narrow
    select/filter over one — the partition probe accesses ``df.rdd``,
    and under AQE that materializes any shuffle/broadcast query stages
    in the plan at operator-CONSTRUCTION time (jobs run before the real
    action, and their work is redone by it). Callers holding a derived
    frame (cached, joined, aggregated) must not route it through
    spread(); they either spread the upstream scan instead or accept
    the input's parallelism (see pq_codebooks(spread_input=False))."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *key_cols)
    return df.repartition(target)
