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
