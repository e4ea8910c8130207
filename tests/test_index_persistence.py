"""Index-table persistence: partition pruning + late materialization.

The reference LIST-partitions its chunks table by hash(collection_id)
and documents "always include collection_id in WHERE for partition
pruning" (models.py:960-1035, partition_utils.py). The Spark twin is
`partitionBy("collection_id")` on the index write — these tests verify
the pruning actually happens in the physical plan, not just that the
data round-trips.
"""

from __future__ import annotations

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
