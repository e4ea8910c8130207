"""applyInPandasWithState operators: state across micro-batches and
across stream restarts (checkpointed)."""

from __future__ import annotations

import json
import os

import pytest

from semantik_spark.streaming.stateful import running_source_stats, session_tracker

SCHEMA = "doc_id bigint, source string, n_chars bigint, content_hash string"


@pytest.fixture(autouse=True)
def few_partitions(spark):
    """State-store streams spin up one task per shuffle partition per
    micro-batch — 4 is plenty for 3-row fixtures and ~4× faster."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _write_batch(root: str, name: str, rows: list[dict]) -> None:
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_stream(spark, root: str, checkpoint: str, sink: list):
    """foreachBatch sink (memory sink can't recover from a checkpoint,
    foreachBatch can — this test is ABOUT restart recovery)."""
    stream = spark.readStream.schema(SCHEMA).json(root)
    q = (
        running_source_stats(stream)
        .writeStream.foreachBatch(lambda df, _id: sink.extend(df.collect()))
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_running_stats_accumulate_across_restarts(spark, tmp_path):
    root, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    _write_batch(root, "b1.json", [
        {"doc_id": 1, "source": "s1", "n_chars": 100, "content_hash": "h1"},
        {"doc_id": 2, "source": "s1", "n_chars": 50, "content_hash": "h2"},
        {"doc_id": 3, "source": "s2", "n_chars": 10, "content_hash": "h3"},
    ])
    rows1: list = []
    _run_stream(spark, root, ckpt, rows1)
    out = {r["source"]: r for r in rows1}
    assert out["s1"]["n_docs"] == 2 and out["s1"]["total_bytes"] == 150
    assert out["s2"]["n_docs"] == 1

    # second run with NEW file, SAME checkpoint → state carries over
    _write_batch(root, "b2.json", [
        {"doc_id": 4, "source": "s1", "n_chars": 25, "content_hash": "h4"},
    ])
    rows2: list = []
    _run_stream(spark, root, ckpt, rows2)
    out2 = {r["source"]: r for r in rows2}
    assert out2["s1"]["n_docs"] == 3
    assert out2["s1"]["total_bytes"] == 175
    assert out2["s1"]["last_hash"] == "h4"


def _run_sessions(spark, root: str, ckpt: str, sink: list):
    stream = (
        spark.readStream.schema("user_id bigint, ts string").json(root)
        .selectExpr("user_id", "cast(ts as timestamp) as ts")
    )
    q = (
        session_tracker(stream, gap_minutes=30)
        .writeStream.foreachBatch(lambda df, _id: sink.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_session_tracker_closes_on_gap_and_timeout(spark, tmp_path):
    root, ckpt = str(tmp_path / "ev"), str(tmp_path / "ckpt2")
    # two sessions for user 1 separated by > 30 min inside ONE batch:
    # the second event chain forces the first session to close and emit
    _write_batch(root, "e1.json", [
        {"user_id": 1, "ts": "2026-01-01T10:00:00"},
        {"user_id": 1, "ts": "2026-01-01T10:10:00"},
        {"user_id": 1, "ts": "2026-01-01T12:00:00"},
    ])
    rows1: list = []
    _run_sessions(spark, root, ckpt, rows1)
    assert len(rows1) == 1  # the 12:00 session stays open in state
    r = rows1[0]
    assert r["n_events"] == 2
    assert r["session_end_us"] - r["session_start_us"] == 10 * 60 * 1_000_000

    # a later event for ANOTHER user advances the watermark past the
    # open session's gap deadline (12:30) → emit-on-timeout fires
    _write_batch(root, "e2.json", [
        {"user_id": 2, "ts": "2026-01-01T13:30:00"},
    ])
    rows2: list = []
    _run_sessions(spark, root, ckpt, rows2)
    timed_out = [r for r in rows2 if r["user_id"] == 1]
    assert len(timed_out) == 1
    assert timed_out[0]["n_events"] == 1
    assert timed_out[0]["session_start_us"] == timed_out[0]["session_end_us"]


def test_fold_running_stats_last_hash_is_chunk_order_invariant():
    """r13 formula review: "last hash" must be the hash at the MAXIMUM
    doc_id across ALL Arrow chunks of the group, not the last chunk's
    maximum — chunk boundaries are Arrow-batch-size dependent, so a
    per-chunk overwrite made the emitted hash depend on how the group
    happened to be chunked."""
    import pandas as pd

    from semantik_spark.streaming.stateful import _fold_running_stats

    a = pd.DataFrame({"doc_id": [5, 9], "n_chars": [10, 20],
                      "content_hash": ["h5", "h9"]})
    b = pd.DataFrame({"doc_id": [7, 2], "n_chars": [30, 40],
                      "content_hash": ["h7", "h2"]})
    for chunks in ([a, b], [b, a]):
        n, tot, last = _fold_running_stats(
            iter(chunks), "n_chars", "content_hash", (0, 0, None))
        assert (n, tot, last) == (4, 100, "h9"), chunks
    # an empty batch keeps the prior state's hash
    n, tot, last = _fold_running_stats(
        iter([]), "n_chars", "content_hash", (3, 7, "prev"))
    assert (n, tot, last) == (3, 7, "prev")
