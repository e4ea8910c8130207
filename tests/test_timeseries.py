"""As-of join and range-window operators (operators/timeseries.py).

These are engine-native temporal operators the reference lacks
(SURVEY.md §2.3 lists theta/range/as-of joins as absent); semantics are
pinned here with hand-built fixtures: backward inclusive match, null
for left rows with no prior right row, deterministic under timestamp
collisions after pre-reduction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from semantik_spark.operators.timeseries import asof_join, preceding_range_window


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", 100, 1),
            ("A", 250, 2),
            ("A", 300, 3),   # equal-ts quote must match (inclusive)
            ("B", 50, 4),    # no prior quote -> nulls
            ("B", 500, 5),
        ],
        ["sym", "us", "trade_id"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", 90, 10.0),
            ("A", 200, 11.0),
            ("A", 300, 12.0),
            ("B", 400, 20.0),
        ],
        ["sym", "us", "px"],
    )
    return trades, quotes


def test_asof_backward_inclusive(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, keys=["sym"], ts_col="us", right_cols=["px"])
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == {1: 10.0, 2: 11.0, 3: 12.0, 4: None, 5: 20.0}


def test_asof_keeps_all_left_rows_and_columns(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, keys=["sym"], ts_col="us", right_cols=["px"])
    assert out.count() == trades.count()
    assert set(out.columns) == {"sym", "us", "trade_id", "px"}


def test_asof_deterministic_after_right_reduction(spark):
    """Duplicate right timestamps reduced to max-value rows give a
    deterministic match (the documented caller contract)."""
    left = spark.createDataFrame([("A", 100, 1)], ["k", "us", "lid"])
    right_raw = spark.createDataFrame(
        [("A", 100, 5), ("A", 100, 9), ("A", 40, 1)], ["k", "us", "v"]
    )
    right = right_raw.groupBy("k", "us").agg(F.max("v").alias("v"))
    out = asof_join(left, right, keys=["k"], ts_col="us", right_cols=["v"])
    assert out.collect()[0]["v"] == 9


def test_preceding_range_window_counts(spark):
    ev = spark.createDataFrame(
        [("u", 0), ("u", 5), ("u", 10), ("u", 100), ("v", 7)],
        ["user", "us"],
    )
    w = preceding_range_window(["user"], "us", 10)
    got = {
        (r["user"], r["us"]): r["n"]
        for r in ev.select("user", "us", F.count("*").over(w).alias("n")).collect()
    }
    # frame = [us-10, us] inclusive, per user
    assert got == {("u", 0): 1, ("u", 5): 2, ("u", 10): 3, ("u", 100): 1, ("v", 7): 1}


def test_preceding_range_window_includes_ts_peers(spark):
    ev = spark.createDataFrame([("u", 5), ("u", 5), ("u", 5)], ["user", "us"])
    w = preceding_range_window(["user"], "us", 1)
    ns = [r["n"] for r in ev.select(F.count("*").over(w).alias("n")).collect()]
    assert ns == [3, 3, 3]  # RANGE frames include all peers at the boundary
