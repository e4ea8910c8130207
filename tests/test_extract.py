"""Extractors (M8): TF-IDF keywords + regex entities."""

from __future__ import annotations

from semantik_spark.operators.extract import entities, keywords


def test_keywords_rank_distinctive_terms(spark, docs):
    kw = keywords(docs, top_k=3).collect()
    by_doc = {}
    for r in kw:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 5's distinctive vocabulary should surface, stopwords never
    top5 = {r.keyword for r in by_doc[5]}
    assert top5 & {"databases", "storage", "engines", "completely", "content"}
    assert all(r.kw_rank <= 3 for r in kw)
    for rows in by_doc.values():
        ranks = sorted(r.kw_rank for r in rows)
        assert ranks == list(range(1, len(ranks) + 1))


def test_keywords_idf_zero_excluded(spark):
    # a term present in EVERY doc has idf ~ ln(1 + (n-df+.5)/(df+.5));
    # with df=n idf stays > 0 under the +1 smoothing, so instead verify
    # scores are positive and shared terms rank below distinctive ones
    df = spark.createDataFrame(
        [(1, "common alpha"), (2, "common beta"), (3, "common gamma")],
        ["doc_id", "text"],
    )
    kw = keywords(df, top_k=2).collect()
    for r in kw:
        if r.kw_rank == 1:
            assert r.keyword != "common"
        assert r.tfidf > 0


def test_entities_classes(spark):
    df = spark.createDataFrame([
        (1, "Contact Jane Doe at jane.doe@corp.example or https://corp.example/x "
            "by 2026-08-13; budget 1250.50 approved twice 1250.50"),
        (2, "no entities here lowercase only"),
    ], ["doc_id", "text"])
    rows = entities(df).collect()
    found = {(r.entity_type, r.entity): r.n_mentions for r in rows if r.doc_id == 1}
    assert found[("email", "jane.doe@corp.example")] == 1
    # greedy multi-word match swallows the leading capitalized verb
    assert found[("proper_name", "Contact Jane Doe")] == 1
    assert found[("date_iso", "2026-08-13")] == 1
    assert found[("number", "1250.50")] == 2
    assert any(t == "url" for t, _ in found)
    assert not [r for r in rows if r.doc_id == 2]


def test_textrank_sentences_centrality(spark):
    """The hub sentence sharing vocabulary with every other sentence
    ranks first; sids key the ORIGINAL segment positions; isolated
    sentences survive on base mass but rank last."""
    from semantik_spark.operators.extract import textrank_sentences

    text = ("solar panels power grids. solar panels need inverters. "
            "power grids need storage. cooking pasta tonight.")
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = textrank_sentences(docs, top_k=4, iterations=8).collect()
    assert [r["sent_rank"] for r in rows] == [1, 2, 3, 4]
    # sentence 0 shares tokens with both 1 and 2 -> most central
    assert rows[0]["sid"] == 0
    assert rows[0]["sentence"].startswith("solar panels power")
    # the isolated cooking sentence is last
    assert rows[3]["sentence"] == "cooking pasta tonight"
    assert rows[0]["score"] > rows[3]["score"]


def test_textrank_degenerate_inputs(spark):
    """Single-token sentence pairs (ln1+ln1 = 0 denominator) and
    empty co-occurrence graphs must not abort the job / crash the
    driver."""
    from semantik_spark.operators.extract import (
        textrank_keywords,
        textrank_sentences,
    )

    doc = spark.createDataFrame(
        [(1, "Spark. Spark. Engines process data quickly and engines "
             "process data.")], ["doc_id", "text"])
    rows = textrank_sentences(doc).collect()
    assert len(rows) > 0                        # survives the 0-denom pair

    tiny = spark.createDataFrame([(1, "spark"), (2, "data")],
                                 ["doc_id", "text"])
    assert textrank_keywords(tiny).count() == 0
