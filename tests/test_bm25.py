"""BM25 math parity — hand-computed values for the reference formulas
(bm25_sparse_indexer.py: idf :593-617, doc weight :619-670, query
encode :414-464, tokenizer :516-543, k1=1.5 b=0.75 :54-55)."""

from __future__ import annotations

import math

import pytest

from semantik_spark.config import BM25_B, BM25_K1
from semantik_spark.operators import bm25


@pytest.fixture(scope="module")
def corpus(spark):
    # After stopword removal ("the", "over", "a" are stopwords):
    #   d1: quick brown fox jumps lazy dog            (len 6)
    #   d2: quick brown fox                           (len 3)
    #   d3: databases storage engines                 (len 3)
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a quick brown fox"),
            (3, "databases storage engines"),
        ],
        ["doc_id", "text"],
    )


def test_tokenizer_stopwords_and_minlen(spark):
    df = spark.createDataFrame([(1, "The cat-dog sat on a mat I x7")], ["doc_id", "text"])
    toks = bm25.tokenize(df).collect()[0]["tokens"]
    # "the","on","a" stopped; "i" below min length 2; hyphenated kept whole
    assert toks == ["cat-dog", "sat", "mat", "x7"]


def test_corpus_stats(corpus):
    row = bm25.corpus_stats(bm25.tokenize(corpus)).collect()[0]
    assert row["n_docs"] == 3
    assert row["avgdl"] == pytest.approx((6 + 3 + 3) / 3)


def test_idf_formula(corpus):
    tok = bm25.tokenize(corpus)
    idf = {r["term"]: r["idf"] for r in bm25.term_stats(tok).collect()}
    # df(quick)=2, N=3 → ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    assert idf["quick"] == pytest.approx(math.log((3 - 2 + 0.5) / (2 + 0.5) + 1))
    # df(jumps)=1 → ln((3-1+0.5)/(1+0.5)+1) = ln(8/3)
    assert idf["jumps"] == pytest.approx(math.log((3 - 1 + 0.5) / (1 + 0.5) + 1))


def test_doc_weight_formula(corpus):
    tok = bm25.tokenize(corpus)
    stats = bm25.corpus_stats(tok)
    terms = bm25.term_stats(tok)
    post = bm25.postings(tok, terms, stats)
    w = {(r["doc_id"], r["term"]): r["weight"] for r in post.collect()}
    avgdl = 4.0
    idf_jumps = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1)
    # d1 len 6, tf(jumps)=1
    expect = idf_jumps * (1 * (BM25_K1 + 1)) / (1 + BM25_K1 * (1 - BM25_B + BM25_B * 6 / avgdl))
    assert w[(1, "jumps")] == pytest.approx(expect)


def test_query_weight_is_tf_times_idf(spark, corpus):
    tok = bm25.tokenize(corpus)
    terms = bm25.term_stats(tok)
    q = spark.createDataFrame([("q1", "quick quick unknownterm")], ["query_id", "query_text"])
    enc = {r["term"]: r["q_weight"] for r in bm25.encode_queries(q, terms).collect()}
    idf_quick = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    assert enc["quick"] == pytest.approx(2 * idf_quick)
    assert "unknownterm" not in enc  # unknown terms skipped (:444-452)


def test_search_ranks_matching_doc_first(spark, corpus):
    q = spark.createDataFrame([("q1", "databases storage")], ["query_id", "query_text"])
    rows = bm25.search(corpus, q, k=5).collect()
    assert rows[0]["doc_id"] == 3 and rows[0]["rank"] == 1
    assert all(r["query_id"] == "q1" for r in rows)


def test_sparse_vector_ordering(corpus):
    tok = bm25.tokenize(corpus)
    post = bm25.postings(tok, bm25.term_stats(tok), bm25.corpus_stats(tok))
    sv = bm25.sparse_vectors(post).collect()
    for r in sv:
        assert r["sparse_indices"] == sorted(r["sparse_indices"])  # :664-670
        assert len(r["sparse_indices"]) == len(r["sparse_values"])


def test_more_like_this_excludes_self_and_ranks_duplicates_first(spark):
    from pyspark.sql import functions as F
    from semantik_spark.operators.bm25 import more_like_this

    docs = spark.createDataFrame(
        [
            (0, "spark shuffle join executor memory"),
            (1, "spark shuffle join executor memory"),   # near-dup of seed
            (2, "spark shuffle different topic words"),
            (3, "fruit apple banana melon orchard"),
        ],
        ["doc_id", "text"],
    )
    out = more_like_this(docs, F.col("doc_id") == 0, k=3).collect()
    assert all(r["doc_id"] != 0 for r in out)          # self excluded
    by_rank = {r["rank"]: r["doc_id"] for r in out}
    assert by_rank[1] == 1                             # duplicate wins
    # doc 3 shares no terms with the seed -> absent entirely
    assert 3 not in {r["doc_id"] for r in out}


def test_more_like_this_top_terms_pruning(spark):
    from pyspark.sql import functions as F
    """With top_terms=1 only the seed's strongest term drives matching:
    neighbors sharing just weaker terms drop out."""
    from semantik_spark.operators.bm25 import more_like_this

    docs = spark.createDataFrame(
        [
            # 'zebra' is rare (high idf, tf 2 in seed) => seed's top term;
            # 'common' appears everywhere => weak
            (0, "zebra zebra common"),
            (1, "zebra common common"),
            (2, "common filler words"),
            (3, "unrelated text entirely"),
        ],
        ["doc_id", "text"],
    )
    full = more_like_this(docs, F.col("doc_id") == 0, k=5)
    pruned = more_like_this(docs, F.col("doc_id") == 0, k=5, top_terms=1)
    assert {r["doc_id"] for r in full.collect()} == {1, 2}
    assert {r["doc_id"] for r in pruned.collect()} == {1}


def test_stats_merge_equals_recompute(spark, docs):
    """The mergeable-state contract (r7, VERDICT item 7): corpus_state
    and term_state of half A merged with half B's tokenized batch equal
    the states computed over A ∪ B — and the DERIVED term table
    (term_ids, idf) is row-identical to a full term_stats recompute, so
    an APPEND-path sync never has to rescan the corpus."""
    from semantik_spark.operators import bm25

    half_a = docs.where("doc_id <= 3")
    half_b = docs.where("doc_id > 3")
    tok_a, tok_b = bm25.tokenize(half_a), bm25.tokenize(half_b)
    tok_all = bm25.tokenize(docs)

    merged_c = bm25.merge_corpus_state(bm25.corpus_state(tok_a), tok_b)
    assert merged_c.collect() == bm25.corpus_state(tok_all).collect()

    merged_t = bm25.merge_term_state(bm25.term_state(tok_a), tok_b)
    key = lambda rows: sorted((r["term"], r["df"]) for r in rows)  # noqa: E731
    assert key(merged_t.collect()) == key(bm25.term_state(tok_all).collect())

    # the derived full table: ids + idf from merged state == recompute
    derived = bm25.term_stats_from_state(
        merged_t, bm25.stats_from_state(merged_c))
    recomputed = bm25.term_stats(tok_all)
    norm = lambda df: sorted(  # noqa: E731
        (r["term"], r["term_id"], r["df"], round(r["idf"], 10))
        for r in df.collect())
    assert norm(derived) == norm(recomputed)


def test_merge_sparse_append_terms_exact(spark, tmp_path, docs):
    """serving.merge_sparse_append after build_sparse: the terms table
    (everything query encoding reads) equals a full rebuild over the
    union; postings cover every doc; a doc UPDATE routed through
    incremental_index's merge mode falls back to the exact rebuild."""
    from semantik_spark.operators import bm25, serving

    idx = str(tmp_path / "idx")
    serving.build_sparse(docs.where("doc_id <= 3"), idx)
    serving.merge_sparse_append(docs.where("doc_id > 3"), idx)
    merged_terms = spark.read.parquet(f"{idx}/terms")
    idx_full = str(tmp_path / "full")
    serving.build_sparse(docs, idx_full)
    full_terms = spark.read.parquet(f"{idx_full}/terms")
    norm = lambda df: sorted(  # noqa: E731
        (r["term"], r["term_id"], r["df"], round(r["idf"], 10))
        for r in df.collect())
    assert norm(merged_terms) == norm(full_terms)
    post_docs = {r["doc_id"] for r in
                 spark.read.parquet(f"{idx}/postings").select("doc_id")
                 .distinct().collect()}
    assert post_docs == {r["doc_id"] for r in docs.collect()}


def test_pruned_postings_caps_per_term_and_keeps_highest_impact(spark):
    """Static pruning keeps exactly the top-`keep` postings per term by
    weight (doc_id tiebreak); rare terms below the cap are untouched."""
    docs = spark.createDataFrame(
        # "shared" appears in every doc with varying tf; "rare" in one
        [(i, "shared " * i + ("rare unique" if i == 1 else "filler"))
         for i in range(1, 6)],
        ["doc_id", "text"],
    )
    tok = bm25.tokenize(docs)
    stats, terms = bm25.corpus_stats(tok), bm25.term_stats(tok)
    post = bm25.postings(tok, terms, stats)
    pruned = bm25.pruned_postings(post, keep=2)

    per_term = {
        r["term"]: r["n"]
        for r in pruned.groupBy("term").count().withColumnRenamed("count", "n").collect()
    }
    assert all(n <= 2 for n in per_term.values())
    assert per_term["rare"] == 1  # below cap: untouched
    # the survivors for "shared" are the two highest-weight postings
    full = sorted(
        ((r["weight"], -r["doc_id"]) for r in post.where("term = 'shared'").collect()),
        reverse=True,
    )
    kept = {(-d) for _, d in full[:2]}
    got = {r["doc_id"] for r in pruned.where("term = 'shared'").collect()}
    assert got == kept


def test_pruned_search_matches_full_when_keep_exceeds_corpus(spark, corpus):
    """With keep >= corpus size, pruning is a no-op: pruned_search and
    search return identical rankings and scores."""
    queries = spark.createDataFrame(
        [(1, "quick fox"), (2, "storage engines")], ["query_id", "query_text"]
    )
    norm = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
        for r in df.collect())
    assert norm(bm25.pruned_search(corpus, queries, k=3, keep=100)) == \
        norm(bm25.search(corpus, queries, k=3))


def test_rocchio_expansion_fixes_vocabulary_mismatch(spark):
    """The PRF contract: a query that only says 'automobile' must pull
    in the co-occurring 'vehicle' docs AFTER expansion. Corpus: feedback
    docs pair 'automobile' with 'vehicle'; a second group says only
    'vehicle'. Pass-1 cannot rank the vehicle-only docs (zero term
    overlap); pass-2 must."""
    from semantik_spark.operators import bm25

    docs = spark.createDataFrame(
        [(i, "automobile vehicle engine road") for i in range(1, 6)]
        + [(i, "vehicle engine highway") for i in range(10, 15)]
        + [(i, f"cooking recipe flour sugar butter item{i}") for i in range(20, 30)],
        ["doc_id", "text"])
    q = spark.createDataFrame([("q1", "automobile")],
                              ["query_id", "query_text"])
    plain = {r["doc_id"] for r in bm25.search(docs, q, k=20).collect()}
    assert plain == set(range(1, 6))  # only literal-term matches
    rows = bm25.rocchio_search(docs, q, k=20, fb_docs=5, fb_terms=4).collect()
    got = {r["doc_id"] for r in rows}
    assert set(range(10, 15)) <= got, got  # vehicle-only docs recovered
    # original matches still rank on top (they carry both signals)
    top5 = {r["doc_id"] for r in rows if r["rank"] <= 5}
    assert top5 == set(range(1, 6))
    # cooking docs stay out
    assert not (set(range(20, 30)) & got)


def test_lm_dirichlet_ranking_properties(spark):
    """QL-Dirichlet sanity: higher tf ranks higher at equal length; at
    equal tf the SHORTER doc wins (length prior); rarer terms matter
    more than common ones (collection-frequency weighting)."""
    from semantik_spark.operators import bm25

    docs = spark.createDataFrame(
        [
            (1, "quantum quantum quantum filler filler filler"),
            (2, "quantum filler filler filler filler filler"),
            (3, "quantum filler filler filler filler filler filler filler "
                "filler filler filler filler"),
            (4, "filler filler filler filler filler filler"),
            # docs that make 'filler' very common in the collection
            (5, "filler filler filler filler"),
            (6, "filler filler filler filler"),
        ],
        ["doc_id", "text"])
    q = spark.createDataFrame([("q1", "quantum")], ["query_id", "query_text"])
    rows = bm25.lm_dirichlet_search(docs, q, k=10, mu=10.0).collect()
    ranks = {r["doc_id"]: r["rank"] for r in rows}
    assert 4 not in ranks and 5 not in ranks  # zero-overlap excluded
    assert ranks[1] == 1          # tf wins
    assert ranks[2] < ranks[3]    # shorter doc wins at equal tf
    # rare-vs-common: a query term that is collection-rare scores
    # higher than an equally-frequent common term in the same doc
    q2 = spark.createDataFrame([("qr", "quantum"), ("qc", "filler")],
                               ["query_id", "query_text"])
    rows2 = bm25.lm_dirichlet_search(docs, q2, k=1, mu=10.0).collect()
    top = {r["query_id"]: r["score"] for r in rows2}
    assert top["qr"] > top["qc"]


def test_stats_from_fully_retracted_state_and_oov_qlen(spark):
    """A fully-retracted corpus state (GDPR: everything erased) yields
    NULL avgdl instead of an ANSI abort; and an out-of-vocabulary
    query term must not inflate the Dirichlet length prior."""
    from semantik_spark.operators.bm25 import (
        corpus_state,
        lm_dirichlet_search,
        retract_corpus_state,
        stats_from_state,
        tokenize,
    )

    docs = spark.createDataFrame(
        [(1, "spark engine data processing"),
         (2, "spark data " + "engine " * 40)], ["doc_id", "text"])
    tok = tokenize(docs)
    empty_state = retract_corpus_state(corpus_state(tok), tok)
    r = stats_from_state(empty_state).collect()[0]
    assert r["n_docs"] == 0 and r["avgdl"] is None

    q_in = spark.createDataFrame([("q", "engine")],
                                 ["query_id", "query_text"])
    q_oov = spark.createDataFrame([("q", "engine qzxqzx")],
                                  ["query_id", "query_text"])
    s_in = {r["doc_id"]: r["score"]
            for r in lm_dirichlet_search(docs, q_in, k=5).collect()}
    s_oov = {r["doc_id"]: r["score"]
             for r in lm_dirichlet_search(docs, q_oov, k=5).collect()}
    assert s_in == s_oov   # OOV term contributes nothing, incl. qlen
