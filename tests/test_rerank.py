"""Rerank path (M4/W3), hydration (J2), multi-collection merge (J7),
content sniffers (F7)."""

from __future__ import annotations

import pytest

from semantik_spark.operators.rerank import (
    candidate_k,
    hydrate,
    multi_collection_search,
    rerank,
    search_with_rerank,
)
from semantik_spark.operators.search import mock_dense_search
from semantik_spark.operators.sniff import sniff_columns
from pyspark.sql import functions as F


def test_candidate_k_clamp():
    # qwen3_search_config.py:91-105 — clamp(k*5, 20, 200)
    assert candidate_k(1) == 20
    assert candidate_k(10) == 50
    assert candidate_k(100) == 200


def test_hydrate_joins_payload(spark, docs):
    hits = spark.createDataFrame([("q1", 1), ("q1", 4)], ["query_id", "doc_id"])
    out = {r["doc_id"]: r["text"] for r in hydrate(hits, docs).collect()}
    assert out[1].startswith("the quick brown fox")
    assert out[4].startswith("spark dataframes")


def test_rerank_prefers_token_overlap(spark, docs):
    queries = spark.createDataFrame(
        [("q1", "spark shuffle partitions")], ["query_id", "query_text"]
    )
    candidates = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 4, 2), ("q1", 5, 3)], ["query_id", "doc_id", "rank"]
    )
    rows = rerank(candidates, queries, docs, k=3).collect()
    ordered = sorted(rows, key=lambda r: r["rank"])
    assert ordered[0]["doc_id"] == 4  # all three query tokens hit doc 4
    assert ordered[0]["rerank_score"] > ordered[1]["rerank_score"]


def test_search_with_rerank_end_to_end(spark, docs):
    queries = spark.createDataFrame(
        [("q1", "quick brown fox")], ["query_id", "query_text"]
    )
    rows = search_with_rerank(docs, queries, k=3).collect()
    assert len(rows) == 3
    assert sorted(r["rank"] for r in rows) == [1, 2, 3]
    top = min(rows, key=lambda r: r["rank"])
    assert top["doc_id"] in (1, 2, 3)  # fox docs outrank the rest


def test_multi_collection_global_topk(spark, docs):
    colls = {"a": docs.where(F.col("doc_id") <= 3), "b": docs.where(F.col("doc_id") > 3)}
    queries = spark.createDataFrame([("q1", "brown fox")], ["query_id", "query_text"])
    rows = multi_collection_search(
        colls, queries, k=4,
        search_fn=lambda d, q, kk: mock_dense_search(d, q, k=kk),
    ).collect()
    assert len(rows) == 4
    assert {r["collection_id"] for r in rows} == {"a", "b"}
    ranks = sorted(r["merged_rank"] for r in rows)
    assert ranks == [1, 2, 3, 4]
    # globally sorted by score desc
    by_rank = sorted(rows, key=lambda r: r["merged_rank"])
    scores = [r["score"] for r in by_rank]
    assert scores == sorted(scores, reverse=True)


def test_sniffers(spark):
    df = spark.createDataFrame(
        [
            (1, '{"key": [1, 2, 3]}'),
            (2, "<?xml version=\"1.0\"?><a><b>x</b></a>"),
            (3, "col1,col2\n1,2\n3,4"),
            (4, "name: test\nvalue: 42\nitems: yes"),
            (5, "#!/bin/sh\nls -la"),
            (6, "def main():\n    import os\n    class Foo: pass"),
            (7, "An ordinary paragraph of English text, nothing special."),
            (8, '{"broken": json'),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["detected_format"] for r in sniff_columns(df).collect()}
    assert out[1] == "json"
    assert out[2] == "xml"
    assert out[3] == "csv"
    assert out[4] == "yaml"
    assert out[5] == "code"
    assert out[6] == "code"
    assert out[7] == "text"
    assert out[8] != "json"  # malformed JSON must not sniff as json
