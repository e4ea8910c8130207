"""Event-time window operators over the events table.

The reference has no true stream processing (SURVEY §2.12) — its
incremental sync is periodic batch. These operators are the *new*
streaming-capable surface: each works identically on a batch DataFrame
and on a readStream DataFrame (same plan), and `incremental.py` wires the
streaming forms with watermarks.

Batch forms are pure SQL (oracle-checkable via time_bucket in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, minutes: int = 5,
                    ts_col: str = "ts", key_col: str = "event_type") -> DataFrame:
    """Tumbling event-time windows: window_start, key, n, sum_value."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), f"{minutes} minutes").alias("w"), F.col(key_col)
        )
        .agg(F.count("*").cast("bigint").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "n", "sum_value")
    )


def sliding_counts(events: DataFrame, length_minutes: int = 10, slide_minutes: int = 5,
                   ts_col: str = "ts", key_col: str = "event_type") -> DataFrame:
    """Sliding windows (length, slide): window_start, key, n."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), f"{length_minutes} minutes", f"{slide_minutes} minutes").alias("w"),
            F.col(key_col),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.col("w.start").alias("window_start"), key_col, "n")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30,
               ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Gap-based sessionization (batch form): user_id, session_id
    (0-based per user), session_start, session_end, n_events.

    lag(ts) per user → new-session flag on gap > threshold → running sum
    = session id. The streaming twin is session_window(ts, gap) in
    incremental.py; batch form is lag+cumsum so the DuckDB oracle can
    replay it exactly.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap = F.lit(gap_minutes * 60)
    with_flag = events.withColumn(
        "_new",
        F.when(
            F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double") > gap, 1
        ).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return (
        with_flag.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )
