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

    lag(ts) per user → new-session flag on gap >= threshold → running
    sum = session id. The streaming twin is session_window(ts, gap) in
    incremental.py; batch form is lag+cumsum so the DuckDB oracle can
    replay it exactly. The boundary is >= (not >): session_window gives
    each event a HALF-OPEN [ts, ts+gap) window, so two events exactly
    gap apart do NOT merge there — the batch form must split them too
    or batch and streaming session counts diverge on exact-gap data.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap = F.lit(gap_minutes * 60)
    with_flag = events.withColumn(
        "_new",
        F.when(
            F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double") >= gap, 1
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


def late_data_audit(events: DataFrame, batch_size: int = 10000,
                    window_minutes: int = 5, delays_s: tuple = (60, 300),
                    id_col: str = "event_id", ts_col: str = "ts") -> DataFrame:
    """Watermark-sizing audit: per event-time window, how many events
    WOULD a d-delayed watermark have dropped?

    Frontier semantics mirror Structured Streaming exactly: the
    watermark advances at BATCH boundaries — an event in arrival batch
    k is compared against max(event time) over batches < k (never its
    own batch; Spark updates the watermark AFTER a batch completes).
    Arrival order here is ``id_col`` ascending bucketed into
    ``batch_size`` batches — the deterministic arrival proxy that makes
    the audit batch-replayable; a deployment substitutes its real
    ingestion sequence/offset column.

    Output per tumbling event-time window: n_events, n_late_<d>s for
    each delay (events a d-second watermark drops), max_lateness_s.
    Use it to pick the smallest delay whose drop count is acceptable —
    the question every withWatermark() call hardcodes an answer to.

    Scale: one map pass to batch-tag, one map-side-combined per-batch
    max (|batches| rows), a running max over that TINY table (the only
    ordered window — |batches| rows, not events), broadcast join back,
    one windowed aggregation. No corpus-scale sort.
    """
    us = F.unix_micros(F.col(ts_col))
    ev = events.select(
        F.floor(F.col(id_col) / batch_size).cast("bigint").alias("batch"),
        us.alias("ts_us"),
    )
    per_batch = ev.groupBy("batch").agg(F.max("ts_us").alias("bmax"))
    wb = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, -1)
    frontier = per_batch.select(
        "batch", F.max("bmax").over(wb).alias("frontier_us")
    )
    window_us = window_minutes * 60 * 1_000_000
    j = ev.join(F.broadcast(frontier), "batch").select(
        (F.floor(F.col("ts_us") / window_us) * window_us).alias("bucket_us"),
        "ts_us", "frontier_us",
    )
    late_cols = [
        F.sum(
            F.when(F.col("ts_us")
                   < F.col("frontier_us") - F.lit(d * 1_000_000), 1)
            .otherwise(0)
        ).cast("bigint").alias(f"n_late_{d}s")
        for d in delays_s
    ]
    return (
        j.groupBy("bucket_us")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            *late_cols,
            # batch 0 has no frontier (NULL): coalesce before greatest
            # so both engines clamp identically
            F.round(
                F.max(F.greatest(
                    F.coalesce(F.col("frontier_us") - F.col("ts_us"),
                               F.lit(-1)),
                    F.lit(0),
                )).cast("double") / 1e6, 6,
            ).alias("max_lateness_s"),
        )
    )
