"""Index-table persistence: partition pruning + late materialization.

The reference LIST-partitions its chunks table by hash(collection_id)
and documents "always include collection_id in WHERE for partition
pruning" (models.py:960-1035, partition_utils.py). The Spark twin is
`partitionBy("collection_id")` on the index write — these tests verify
the pruning actually happens in the physical plan, not just that the
data round-trips.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _write_index(spark, path: str):
    rows = [
        (f"c{i % 3}", f"{i}", f"c{i % 3}#{i}", float(i)) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "collection_id string, doc_id string, chunk_id string, score double"
    )
    df.write.mode("overwrite").partitionBy("collection_id").parquet(path)


def test_partition_pruning_reads_one_collection(spark, tmp_path):
    path = str(tmp_path / "index")
    _write_index(spark, path)
    scan = spark.read.parquet(path).where(F.col("collection_id") == "c1")
    # the filter must reach the scan as a partition filter (pruning
    # happens at file listing — no data filter, no post-scan filter)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(collection_id" in plan
    assert "DataFilters: []" in plan
    assert scan.count() == 20


def test_column_pruning_reads_narrow_schema(spark, tmp_path):
    """Qdrant with_vector=False parity (dense_search.py:92-93): a
    projection that skips the heavy column must not read it."""
    path = str(tmp_path / "index2")
    _write_index(spark, path)
    narrow = spark.read.parquet(path).select("chunk_id")
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<chunk_id:string>" in plan


def test_predicate_pushdown_to_scan(spark, tmp_path):
    path = str(tmp_path / "index3")
    _write_index(spark, path)
    filtered = spark.read.parquet(path).where(F.col("score") > 50.0)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(score), GreaterThan(score,50.0)]" in plan


def test_crash_recovery_from_checkpoint_no_duplicates(spark, tmp_path):
    """Kill-and-restart proof for the streaming index (VERDICT r4 item
    7): after batch 0 lands, simulate a crash DURING batch 1 — the
    foreachBatch body is at-least-once, so a crashed attempt leaves
    partial duplicate appends in the catalog and dense log before the
    checkpoint commits. The restart replays batch 1 through the SAME
    checkpoint. Required outcome: the serving views (catalog-latest,
    dense_latest) hold exactly one row per doc with the newest content,
    dense_as_of history stays correct, and compaction heals the
    physical duplicates."""
    import json

    from semantik_spark.functions.vectors import mock_embedding
    from semantik_spark.streaming.incremental import (
        compact_dense_log,
        dense_as_of,
        dense_latest,
        incremental_index,
        stream_files,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    idx = str(tmp_path / "idx")
    catalog = str(tmp_path / "catalog")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, text string"

    (drop / "b1.json").write_text("\n".join(json.dumps(r) for r in [
        {"doc_id": 1, "text": "version one of doc one"},
        {"doc_id": 2, "text": "doc two stays put"},
    ]))
    q = incremental_index(stream_files(spark, str(drop), schema), idx, catalog, ckpt)
    q.awaitTermination(120)

    # --- crash during batch 1: its appends landed but the streaming
    # checkpoint never committed, so the restart will replay them
    (drop / "b2.json").write_text("\n".join(json.dumps(r) for r in [
        {"doc_id": 1, "text": "version TWO of doc one"},
        {"doc_id": 3, "text": "doc three arrives"},
    ]))
    crashed = spark.createDataFrame(
        [(1, "version TWO of doc one"), (3, "doc three arrives")], schema
    ).withColumn("content_hash", F.sha2(F.col("text"), 256)) \
     .withColumn("_batch_id", F.lit(1).cast("bigint"))
    crashed.write.mode("append").parquet(catalog)
    crashed.select(
        "doc_id", mock_embedding("text").alias("embedding"), "_batch_id"
    ).write.mode("append").parquet(f"{idx}/dense_log")

    # --- restart from the same checkpoint: batch 1 replays (same
    # batch_id, same rows)
    q2 = incremental_index(stream_files(spark, str(drop), schema), idx, catalog, ckpt)
    q2.awaitTermination(120)

    # the replay is WRITE-idempotent: the crashed attempt's rows are
    # already in the catalog, so the replayed batch's change-detect
    # anti-join drops them — no second append lands at all
    log = spark.read.parquet(f"{idx}/dense_log")
    assert log.where("doc_id = 3").count() == 1
    assert spark.read.parquet(catalog).count() == 4  # 2 (b0) + 2 (crashed b1)
    # and every serving view is exactly-once:
    latest = {r["doc_id"]: r["embedding"] for r in dense_latest(spark, idx).collect()}
    assert set(latest) == {1, 2, 3}
    want_v2 = spark.createDataFrame([("version TWO of doc one",)], ["t"]) \
        .select(mock_embedding("t").alias("e")).collect()[0]["e"]
    assert list(latest[1]) == list(want_v2)
    # catalog resolved to newest version per doc — no phantom rows
    w = Window.partitionBy("doc_id").orderBy(F.desc("_batch_id"))
    cat_latest = (
        spark.read.parquet(catalog)
        .withColumn("_rn", F.row_number().over(w)).where("_rn = 1")
    )
    assert cat_latest.count() == 3
    assert cat_latest.where("doc_id = 1").collect()[0]["text"] \
        == "version TWO of doc one"
    # time travel: as-of batch 0 predates the crash entirely
    asof0 = {r["doc_id"] for r in dense_as_of(spark, idx, 0).collect()}
    assert asof0 == {1, 2}
    want_v1 = spark.createDataFrame([("version one of doc one",)], ["t"]) \
        .select(mock_embedding("t").alias("e")).collect()[0]["e"]
    asof0_emb = {r["doc_id"]: r["embedding"]
                 for r in dense_as_of(spark, idx, 0).collect()}
    assert list(asof0_emb[1]) == list(want_v1)
    # compaction collapses doc 1's two versions without changing the answer
    stats = compact_dense_log(spark, idx)
    assert stats["rows_before"] == 4 and stats["rows_after"] == 3
    healed = {r["doc_id"]: r["embedding"] for r in dense_latest(spark, idx).collect()}
    assert {k: list(v) for k, v in healed.items()} == {k: list(v) for k, v in latest.items()}
    # a third restart with nothing new must be a no-op
    q3 = incremental_index(stream_files(spark, str(drop), schema), idx, catalog, ckpt)
    q3.awaitTermination(120)
    assert dense_latest(spark, idx).count() == 3
