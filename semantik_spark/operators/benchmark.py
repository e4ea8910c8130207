"""Benchmark dataset → collection doc-ref resolution (J6).

Reference semantics (packages/webui/services/benchmark_dataset_service.py
:49-117 resolve_single_doc_ref, :781-787 _compute_mapping_status;
models.py:1451-1482 BenchmarkDatasetMapping):

  A relevance judgment carries a doc_ref with any of five identifier
  fields; resolution uses the HIGHEST-PRIORITY PRESENT field only (no
  fall-through on lookup failure):
    1. document_id — must exist in the collection
    2. uri         — exact match on Document.uri
    3. content_hash — only if unique within the collection ("ambiguous"
                      when several documents share the hash)
    4. path        — treated as a URI-like identifier
    5. file_name   — only if unique within the collection
  Mapping rollup: resolved when every ref resolves, partial when some
  do, pending when none do.

Spark shape: the catalog pre-aggregates into per-identifier lookup
tables (uri→doc, hash→(count, sole doc), file_name→(count, sole doc));
refs left-join each lookup on its own key and a priority CASE picks the
outcome — five shuffle equi-joins on well-distributed identifier keys,
no fall-through re-probing, so at 100 TB each judgment row is touched
once per identifier class and the rollup is one groupBy(mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_doc_refs(refs: DataFrame, catalog: DataFrame) -> DataFrame:
    """Per-ref resolution: all ``refs`` columns + resolved_doc_id,
    failure_reason (exactly one of the two is non-null).

    ``refs``: ref_id plus nullable document_id, uri, content_hash,
    path, file_name. ``catalog``: doc_id, uri, content_hash, file_name.
    """
    by_id = catalog.select(F.col("doc_id").alias("_id_hit")).distinct()
    by_uri = catalog.groupBy(F.col("uri").alias("_uri_key")).agg(
        F.min("doc_id").alias("_uri_hit")
    )
    by_hash = catalog.groupBy(F.col("content_hash").alias("_hash_key")).agg(
        F.count("*").alias("_hash_cnt"), F.min("doc_id").alias("_hash_hit")
    )
    by_name = catalog.groupBy(F.col("file_name").alias("_name_key")).agg(
        F.count("*").alias("_name_cnt"), F.min("doc_id").alias("_name_hit")
    )
    j = (
        refs
        .join(by_id, refs["document_id"] == by_id["_id_hit"], "left")
        .join(by_uri, refs["uri"] == F.col("_uri_key"), "left")
        .join(by_hash, refs["content_hash"] == F.col("_hash_key"), "left")
        .join(by_uri.select(F.col("_uri_key").alias("_path_key"),
                            F.col("_uri_hit").alias("_path_hit")),
              refs["path"] == F.col("_path_key"), "left")
        .join(by_name, refs["file_name"] == F.col("_name_key"), "left")
        .drop("_uri_key", "_hash_key", "_path_key", "_name_key")
    )
    resolved = (
        F.when(F.col("document_id").isNotNull(), F.col("_id_hit"))
        .when(F.col("uri").isNotNull(), F.col("_uri_hit"))
        .when(F.col("content_hash").isNotNull(),
              F.when(F.col("_hash_cnt") == 1, F.col("_hash_hit")))
        .when(F.col("path").isNotNull(), F.col("_path_hit"))
        .when(F.col("file_name").isNotNull(),
              F.when(F.col("_name_cnt") == 1, F.col("_name_hit")))
    )
    reason = (
        F.when(resolved.isNotNull(), F.lit(None).cast("string"))
        # "ambiguous" only when the hash IS the priority field actually
        # used: resolution has NO fall-through, so a ref whose
        # document_id/uri was present-but-unmatched failed as
        # not_found on THAT field — a lower-priority ambiguous hash
        # was never consulted (resolve_single_doc_ref:49-117)
        .when(F.col("content_hash").isNotNull()
              & F.col("document_id").isNull() & F.col("uri").isNull()
              & (F.col("_hash_cnt") > 1), "ambiguous")
        .when(F.col("file_name").isNotNull() & F.col("document_id").isNull()
              & F.col("uri").isNull() & F.col("content_hash").isNull()
              & F.col("path").isNull() & (F.col("_name_cnt") > 1), "ambiguous")
        .when(
            F.col("document_id").isNotNull() | F.col("uri").isNotNull()
            | F.col("content_hash").isNotNull() | F.col("path").isNotNull()
            | F.col("file_name").isNotNull(),
            "not_found",
        )
        .otherwise("no_identifiers")
    )
    return j.withColumn("resolved_doc_id", resolved) \
            .withColumn("failure_reason", reason) \
            .drop("_id_hit", "_uri_hit", "_hash_cnt", "_hash_hit",
                  "_path_hit", "_name_cnt", "_name_hit")


def mapping_status(resolved_refs: DataFrame,
                   mapping_cols: list[str] | None = None) -> DataFrame:
    """Per-mapping rollup: total_count, mapped_count, n_ambiguous,
    n_not_found, mapping_status ∈ pending|partial|resolved
    (_compute_mapping_status:781-787)."""
    keys = mapping_cols or ["dataset_id", "collection_id"]
    agg = resolved_refs.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("total_count"),
        F.sum(F.col("resolved_doc_id").isNotNull().cast("int"))
         .cast("bigint").alias("mapped_count"),
        F.sum(F.when(F.col("failure_reason") == "ambiguous", 1).otherwise(0))
         .cast("bigint").alias("n_ambiguous"),
        F.sum(F.when(F.col("failure_reason") == "not_found", 1).otherwise(0))
         .cast("bigint").alias("n_not_found"),
    )
    return agg.withColumn(
        "mapping_status",
        F.when(F.col("mapped_count") == F.col("total_count"), "resolved")
        .when(F.col("mapped_count") > 0, "partial")
        .otherwise("pending"),
    )
