"""Run-log / failure accounting (A8, P5, P9)."""

from __future__ import annotations

from datetime import datetime

import pytest

from semantik_spark.operators.runlog import (
    append_run_log,
    dead_letter,
    retry_candidates,
    should_halt,
    status_counts,
)


@pytest.fixture()
def results(spark):
    rows = [
        ("f1", "succeeded", None, 0, datetime(2026, 1, 1, 10, 0)),
        ("f2", "failed", "connection reset by peer", 1, datetime(2026, 1, 1, 10, 1)),
        ("f3", "skipped", None, 0, datetime(2026, 1, 1, 10, 2)),
        ("f4", "failed", "invalid utf-8 sequence", 0, datetime(2026, 1, 1, 10, 3)),
        ("f5", "failed", "request timeout", 5, datetime(2026, 1, 1, 10, 4)),
    ]
    return spark.createDataFrame(
        rows, "uri string, status string, error_message string, retry_count int, processed_at timestamp"
    )


def test_status_counts(results):
    r = status_counts(results).collect()[0]
    assert r["files_processed"] == 5
    assert r["files_succeeded"] == 1
    assert r["files_failed"] == 3
    assert r["files_skipped"] == 1


def test_dead_letter_categories(results):
    dead = {r["uri"]: r for r in dead_letter(results).collect()}
    assert set(dead) == {"f2", "f4", "f5"}
    assert dead["f2"]["error_category"] == "transient" and dead["f2"]["retryable"]
    assert dead["f4"]["error_category"] == "permanent" and not dead["f4"]["retryable"]
    assert dead["f5"]["error_category"] == "transient"


def test_retry_candidates_cap(results):
    cands = {r["uri"] for r in retry_candidates(dead_letter(results), max_retries=3).collect()}
    assert cands == {"f2"}  # f4 permanent, f5 over the cap


def test_should_halt(spark, results):
    assert not should_halt(results, max_consecutive=3)
    tail_failures = spark.createDataFrame(
        [(f"g{i}", "failed", "x", 0, datetime(2026, 1, 1, 11, i)) for i in range(5)],
        "uri string, status string, error_message string, retry_count int, processed_at timestamp",
    )
    assert should_halt(tail_failures, max_consecutive=5)
    assert not should_halt(tail_failures.limit(3), max_consecutive=5)


def test_append_run_log(spark, tmp_path, results):
    path = str(tmp_path / "runlog")
    counters = status_counts(results).collect()[0].asDict()
    append_run_log(spark, path, "run-1", "INDEX", "completed", {"sf": 0.001}, counters)
    append_run_log(spark, path, "run-2", "APPEND", "failed")
    log = spark.read.parquet(path)
    assert log.count() == 2
    assert {r["op_type"] for r in log.collect()} == {"INDEX", "APPEND"}
