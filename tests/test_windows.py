"""Event-time windows: tumbling/sliding buckets, gap sessionization."""

from __future__ import annotations

from datetime import datetime

from semantik_spark.streaming.windows import sessionize, sliding_counts, tumbling_counts


def _events(spark):
    rows = [
        # (event_id, user_id, event_type, ts, value)
        (1, "u1", "click", datetime(2026, 1, 1, 10, 0, 0), 1.0),
        (2, "u1", "click", datetime(2026, 1, 1, 10, 3, 0), 2.0),
        (3, "u1", "view", datetime(2026, 1, 1, 10, 7, 0), 3.0),
        (4, "u2", "click", datetime(2026, 1, 1, 10, 0, 30), 4.0),
        # u1 gap > 30 min → new session
        (5, "u1", "click", datetime(2026, 1, 1, 11, 0, 0), 5.0),
    ]
    return spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts", "value"])


def test_tumbling_counts(spark):
    out = {(r["window_start"].hour, r["window_start"].minute, r["event_type"]):
           (r["n"], r["sum_value"])
           for r in tumbling_counts(_events(spark), minutes=5).collect()}
    assert out[(10, 0, "click")] == (3, 7.0)   # events 1,2 (u1) + 4 (u2)
    assert out[(10, 5, "view")] == (1, 3.0)
    assert out[(11, 0, "click")] == (1, 5.0)


def test_sliding_counts_overlap(spark):
    rows = sliding_counts(_events(spark), length_minutes=10, slide_minutes=5).collect()
    # event at 10:07 belongs to windows starting 10:00 and 10:05
    views = [r for r in rows if r["event_type"] == "view"]
    assert len(views) == 2


def test_sessionize_gap(spark):
    out = sessionize(_events(spark), gap_minutes=30).collect()
    u1 = sorted([r for r in out if r["user_id"] == "u1"], key=lambda r: r["session_id"])
    assert len(u1) == 2
    assert u1[0]["n_events"] == 3
    assert u1[1]["n_events"] == 1
    u2 = [r for r in out if r["user_id"] == "u2"]
    assert len(u2) == 1 and u2[0]["n_events"] == 1


def test_late_data_audit_batch_boundary_frontier(spark):
    """Hand-built arrival sequence: the frontier advances at batch
    boundaries only (an event is never late vs its OWN batch's max),
    and the delay knobs cut exactly at frontier - d."""
    from pyspark.sql import functions as F

    from semantik_spark.streaming.windows import late_data_audit

    base = 1_700_000_000  # seconds
    rows = [
        # batch 0 (ids 0-9): frontier NULL -> nothing late
        (0, base + 0), (1, base + 1000),
        # batch 1 (ids 10-19): frontier = base+1000
        (10, base + 2000),           # ahead of frontier: on time
        (11, base + 1000 - 30),      # 30s behind: late at d=0 only... (not counted: delays 60/300)
        (12, base + 1000 - 120),     # 120s behind: late at 60s, not 300s
        (13, base + 1000 - 400),     # 400s behind: late at both
        # batch 2 (ids 20+): frontier = base+2000
        (20, base + 2000 - 400),     # 400s behind newer frontier
    ]
    ev = spark.createDataFrame(
        [(i, ts * 1_000_000) for i, ts in rows], "event_id bigint, us bigint"
    ).select("event_id", F.timestamp_micros("us").alias("ts"))
    out = late_data_audit(ev, batch_size=10, window_minutes=5,
                          delays_s=(60, 300))
    agg = out.agg(F.sum("n_events"), F.sum("n_late_60s"),
                  F.sum("n_late_300s"), F.max("max_lateness_s")).collect()[0]
    assert agg[0] == 7
    assert agg[1] == 3   # ids 12, 13, 20
    assert agg[2] == 2   # ids 13, 20
    assert agg[3] == 400.0
