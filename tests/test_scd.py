"""SCD2 versioned-dimension operators (operators/scd.py): the
merge ≡ full-rebuild invariant, run collapsing, and as-of snapshots."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from semantik_spark.operators import scd

D = dt.date


@pytest.fixture(scope="module")
def update_log(spark):
    # key, attr, ts, seq — crafted hazards:
    #  k=1: run collapse (A,A,B,B,A) -> 3 versions
    #  k=2: batch opens with the SAME value as history's last (suppress)
    #  k=3: two updates share a timestamp (seq breaks the tie)
    #  k=4: single update, never changes (one open version)
    rows = [
        (1, "A", D(2020, 1, 1), 10), (1, "A", D(2020, 2, 1), 11),
        (1, "B", D(2020, 3, 1), 12), (1, "B", D(2020, 4, 1), 13),
        (1, "A", D(2021, 2, 1), 14),
        (2, "X", D(2020, 5, 1), 20), (2, "Y", D(2020, 6, 1), 21),
        (2, "Y", D(2021, 1, 5), 22), (2, "Z", D(2021, 3, 1), 23),
        (3, "P", D(2020, 7, 1), 30), (3, "Q", D(2020, 7, 1), 31),
        (3, "Q", D(2021, 4, 1), 32),
        (4, "S", D(2020, 9, 9), 40),
    ]
    return spark.createDataFrame(rows, ["k", "attr", "ts", "seq"])


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("k", "version").collect()]


def test_history_collapses_runs(update_log):
    hist = scd.scd2_history(update_log, "k", ["attr"], "ts", "seq")
    k1 = [(r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
          for r in hist.where("k = 1").orderBy("version").collect()]
    assert k1 == [
        ("A", D(2020, 1, 1), D(2020, 3, 1), 1, False),
        ("B", D(2020, 3, 1), D(2021, 2, 1), 2, False),
        ("A", D(2021, 2, 1), None, 3, True),
    ]
    # same-timestamp updates resolved by seq: P then Q, Q's repeat folded
    k3 = [(r.attr, r.version) for r in
          hist.where("k = 3").orderBy("version").collect()]
    assert k3 == [("P", 1), ("Q", 2)]
    # exactly one current row per key
    cur = hist.where("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_merge_equals_full_rebuild(update_log):
    cutoff = F.lit("2021-01-01").cast("date")
    hist = scd.scd2_history(update_log.where(F.col("ts") < cutoff),
                            "k", ["attr"], "ts", "seq")
    merged = scd.scd2_merge(hist, update_log.where(F.col("ts") >= cutoff),
                            "k", ["attr"], "ts", "seq")
    rebuilt = scd.scd2_history(update_log, "k", ["attr"], "ts", "seq")
    assert _sorted_rows(merged) == _sorted_rows(rebuilt)
    # the cross-boundary suppression actually happened: k=2's batch
    # opener (Y at 2021-01-05) equals history's last value -> no version
    assert merged.where("k = 2").count() == 3


def test_merge_is_idempotent_on_empty_batch(update_log, spark):
    hist = scd.scd2_history(update_log, "k", ["attr"], "ts", "seq")
    empty = update_log.where(F.lit(False))
    again = scd.scd2_merge(hist, empty, "k", ["attr"], "ts", "seq")
    assert _sorted_rows(again) == _sorted_rows(hist)


def test_as_of_snapshot(update_log):
    hist = scd.scd2_history(update_log, "k", ["attr"], "ts", "seq")
    snap = scd.scd2_as_of(hist, D(2020, 8, 1))
    got = {r.k: r.attr for r in snap.collect()}
    assert got == {1: "B", 2: "Y", 3: "Q"}  # k=4 not yet born
    late = scd.scd2_as_of(hist, D(2022, 1, 1))
    assert {r.k: r.attr for r in late.collect()} == \
        {1: "A", 2: "Z", 3: "Q", 4: "S"}
