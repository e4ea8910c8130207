"""Time-series operators the reference lacks: as-of join and
range-windowed aggregates over event streams.

The reference has no temporal joins (SURVEY.md §2.3 "Absent in
reference" — no theta/range/as-of joins exist anywhere in
jbmiller10/semantik); these are the engine's native additions for
event/log analytics. Both are single-shuffle plans designed for the
100 TB case:

- ``asof_join`` uses the union-then-window formulation: tag both
  sides, union, then one window over (keys, time) carries the right
  side's last non-null attributes forward onto left rows. Exactly one
  shuffle on the join keys, no range explosion — contrast the naive
  ``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + max-filter, which is a
  quadratic theta-join that Spark executes as BroadcastNestedLoop or a
  full sort-merge-with-dup-explosion at scale.
- ``preceding_range_window`` is a plain ``Window.rangeBetween`` over a
  microsecond epoch column — Spark evaluates it with one sort per
  partition, never a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_cols: list[str],
) -> DataFrame:
    """Backward as-of join: each left row picks up ``right_cols`` from
    the latest right row with ``right.ts_col <= left.ts_col`` and equal
    ``keys`` (inclusive at equal timestamps, matching DuckDB's
    ``ASOF LEFT JOIN ... ON l.ts >= r.ts``). Left rows with no prior
    right row keep nulls.

    Contract: ``right`` must be unique per (keys, ts_col) — pre-reduce
    it (e.g. groupBy(keys, ts).agg(max(...))) so the match is
    deterministic; ``right_cols`` must not collide with left column
    names; right rows with null ``right_cols`` values are treated as
    gaps (last *non-null* wins).
    """
    # fail fast on contract violations that would otherwise produce
    # silently-wrong joins (left values feeding the carry-forward)
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {sorted(overlap)}")
    missing = [c for c in (*keys, ts_col) if c not in left.columns] \
        + [c for c in (*keys, ts_col, *right_cols) if c not in right.columns]
    if missing:
        raise ValueError(f"asof_join: missing required columns: {missing}")
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(*keys, ts_col, *right_cols).withColumn("__side", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)
    # right rows (__side=0) sort before left rows at the same timestamp,
    # which is what makes the match inclusive at ts equality
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        u = u.withColumn(f"__asof_{c}", F.last(F.col(c), ignorenulls=True).over(w))
    out = u.where(F.col("__side") == 1).drop("__side", *right_cols)
    for c in right_cols:
        out = out.withColumnRenamed(f"__asof_{c}", c)
    return out


def preceding_range_window(keys: list[str], us_col: str, preceding_us: int) -> WindowSpec:
    """RANGE window over a microsecond epoch column: current row plus
    everything in the trailing ``preceding_us`` microseconds (peers at
    the current timestamp included, per standard RANGE frame
    semantics)."""
    return (
        Window.partitionBy(*keys)
        .orderBy(F.col(us_col).cast("long"))
        .rangeBetween(-preceding_us, 0)
    )
