"""HyDE query expansion (M5): generator injection + branch split."""

from __future__ import annotations

from semantik_spark.operators.hyde import (
    deterministic_generate, expand_queries, hyde_hybrid_search,
)


def _queries(spark):
    return spark.createDataFrame(
        [("q1", "fox"), ("q2", "databases")], ["query_id", "query_text"]
    )


def test_expand_adds_passage(spark):
    out = {r.query_id: r for r in expand_queries(_queries(spark)).collect()}
    assert out["q1"].dense_query_text == deterministic_generate("fox")
    assert "fox" in out["q1"].dense_query_text
    assert out["q1"].query_text == "fox"  # original preserved for sparse


def test_custom_generator_injected(spark):
    out = expand_queries(_queries(spark), generator=lambda q: f"LLM[{q}]").collect()
    assert {r.dense_query_text for r in out} == {"LLM[fox]", "LLM[databases]"}


def test_hybrid_split_uses_original_for_sparse(spark, docs):
    # sparse branch must match on the ORIGINAL term: with a generator
    # that emits garbage for the dense side, BM25 still ranks doc 4
    # ('databases' appears only in doc 5) for q2
    res = hyde_hybrid_search(
        docs, _queries(spark), k=5, generator=lambda q: "zzz qqq unrelated"
    ).collect()
    q2 = [r for r in res if r.query_id == "q2"]
    assert any(r.doc_id == 5 and r.sparse_rank == 1 for r in q2)
    # dense branch saw only garbage → no doc should carry a dense_rank
    # from matching the real query terms; scores still well-formed
    assert all(r.score > 0 for r in res)


def test_deterministic_generator_is_pure():
    assert deterministic_generate("x") == deterministic_generate("x")
    assert "'" not in deterministic_generate("anything")  # oracle-safe
