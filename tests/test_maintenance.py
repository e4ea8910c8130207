"""Maintenance ops: GC anti-joins (P7), stale marking, blue/green (P6)."""

from __future__ import annotations

import os

import pytest

from semantik_spark.operators.maintenance import (
    BlueGreenIndex,
    gc_index,
    mark_stale,
    orphaned_points,
)


@pytest.fixture()
def index(spark):
    return spark.createDataFrame(
        [("c1", 1), ("c2", 1), ("c3", 2), ("c4", 99)], ["chunk_id", "doc_id"]
    )


@pytest.fixture()
def documents(spark):
    return spark.createDataFrame([(1,), (2,), (3,)], ["doc_id"])


def test_orphaned_points(index, documents):
    orphans = orphaned_points(index, documents).collect()
    assert [r["chunk_id"] for r in orphans] == ["c4"]


def test_gc_keeps_live(index, documents):
    kept = {r["chunk_id"] for r in gc_index(index, documents).collect()}
    assert kept == {"c1", "c2", "c3"}


def test_mark_stale(spark):
    catalog = spark.createDataFrame([("u1",), ("u2",), ("u3",)], ["uri"])
    enumeration = spark.createDataFrame([("u1",), ("u3",)], ["uri"])
    out = {r["uri"]: r["is_stale"] for r in mark_stale(catalog, enumeration).collect()}
    assert out == {"u1": False, "u2": True, "u3": False}


def test_blue_green_swap_and_validate(spark, tmp_path):
    bg = BlueGreenIndex(str(tmp_path / "idx"))
    v1 = spark.createDataFrame([(i, f"v1-{i}") for i in range(5)], ["doc_id", "content"])
    assert bg.staging_color() == "blue"
    bg.write_staging(v1)
    info = bg.validate_staging(spark, min_rows=1, expect_columns=("doc_id", "content"))
    assert info["rows"] == 5
    bg.swap()
    assert bg.read_live(spark).count() == 5

    # rebuild into green while blue serves
    v2 = spark.createDataFrame([(i, f"v2-{i}") for i in range(7)], ["doc_id", "content"])
    assert bg.staging_color() == "green"
    bg.write_staging(v2)
    assert bg.read_live(spark).count() == 5  # still v1 until swap
    bg.validate_staging(spark, min_rows=6)
    bg.swap()
    live = bg.read_live(spark)
    assert live.count() == 7
    assert live.where("content like 'v2-%'").count() == 7
    bg.cleanup_old()
    assert not os.path.exists(str(tmp_path / "idx" / "blue"))


def test_blue_green_validation_blocks_bad_build(spark, tmp_path):
    bg = BlueGreenIndex(str(tmp_path / "idx2"))
    empty = spark.createDataFrame([], "doc_id int, content string")
    bg.write_staging(empty)
    with pytest.raises(ValueError, match="rows"):
        bg.validate_staging(spark, min_rows=1)
    good = spark.createDataFrame([(1, "x")], ["doc_id", "content"])
    bg.write_staging(good)
    with pytest.raises(ValueError, match="missing columns"):
        bg.validate_staging(spark, expect_columns=("doc_id", "embedding"))
