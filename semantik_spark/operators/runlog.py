"""Operation run-log, failure accounting (A8), dead-letter table (P5),
and consecutive-failure halt (P9).

Reference parity:
  Operation rows    models.py:738-786 — INDEX/APPEND/REINDEX/... with
                    status + config JSON
  PipelineFailure   models.py:475-529 — per-file failure rows with
                    error_type/message, retry_count
  counters          executor.py:188-200 — files processed/succeeded/
                    failed/skipped
  halt              failure_tracker.py + executor.py:215-224 — stop
                    after N consecutive failures
  retry categories  models.py:373-375 — transient vs permanent

Spark-first: the run log and dead-letter are append-only parquet tables;
counters are one groupBy; the halt check is a driver-side decision
between jobs (Spark has no mid-job halt — the unit of retry is the
failed subset re-run from the dead-letter table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATUS_VALUES = ("succeeded", "failed", "skipped")

TRANSIENT_ERRORS = ("timeout", "connection", "throttled", "oom")


def status_counts(results: DataFrame, status_col: str = "status") -> DataFrame:
    """A8: files_processed/succeeded/failed/skipped in one aggregate."""
    return results.agg(
        F.count("*").cast("bigint").alias("files_processed"),
        *[
            F.coalesce(F.sum((F.col(status_col) == s).cast("bigint")), F.lit(0))
            .alias(f"files_{s}")
            for s in STATUS_VALUES
        ],
    )


def dead_letter(results: DataFrame, status_col: str = "status") -> DataFrame:
    """P5 dead-letter rows: the failed subset with error category
    (transient errors are retryable; permanent are not)."""
    failed = results.where(F.col(status_col) == "failed")
    err = F.lower(F.coalesce(F.col("error_message"), F.lit("")))
    cat = F.lit("permanent")
    for marker in TRANSIENT_ERRORS:
        cat = F.when(err.contains(marker), F.lit("transient")).otherwise(cat)
    return failed.withColumn("error_category", cat).withColumn(
        "retryable", F.col("error_category") == "transient"
    )


def retry_candidates(dead: DataFrame, max_retries: int = 3,
                     retry_col: str = "retry_count") -> DataFrame:
    """The subset of the dead-letter table worth re-running: transient
    and under the retry cap (models.py:373-375 semantics)."""
    return dead.where(
        F.col("retryable") & (F.coalesce(F.col(retry_col), F.lit(0)) < max_retries)
    )


def should_halt(results: DataFrame, max_consecutive: int = 5,
                order_col: str = "processed_at", status_col: str = "status") -> bool:
    """P9 halt: True when the last ``max_consecutive`` processed items
    all failed (failure_tracker.py behavior, checked between batches —
    a driver-side decision, not a per-task one)."""
    last = (
        results.orderBy(F.desc(order_col))
        .select(status_col)
        .limit(max_consecutive)
        .collect()
    )
    return len(last) == max_consecutive and all(r[0] == "failed" for r in last)


def append_run_log(spark: SparkSession, path: str, run_id: str, op_type: str,
                   status: str, config: dict | None = None,
                   counters: dict | None = None) -> None:
    """Operation audit row (models.py:738-786) — append-only parquet."""
    row = {
        "run_id": run_id,
        "op_type": op_type,
        "status": status,
        "config_json": __import__("json").dumps(config or {}),
        "counters_json": __import__("json").dumps(counters or {}),
    }
    df = spark.createDataFrame([row]).withColumn("logged_at", F.current_timestamp())
    df.coalesce(1).write.mode("append").parquet(path)
