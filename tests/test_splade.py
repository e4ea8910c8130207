"""SPLADE test-mode encoder (M2) — contract + algebra tests.

Mirrors the reference's sparse-indexer contract tests
(shared/plugins/testing/contracts.py): sorted indices, deterministic
encode, expansion behavior, dot-product retrieval.
"""

import math

from pyspark.sql import functions as F

from semantik_spark.operators import splade


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_encode_deterministic_and_max_pooled(spark):
    docs = _docs(spark, [(1, "alpha beta alpha"), (2, "alpha beta alpha")])
    enc = splade.encode(docs).collect()
    by_doc = {}
    for r in enc:
        by_doc.setdefault(r.doc_id, {})[r.vocab_id] = r.weight
    # identical text -> identical activation map
    assert by_doc[1] == by_doc[2]
    # alpha tf=2 -> ln(3); beta tf=1 -> ln(2); plus 2 expansion ids at half
    weights = sorted(by_doc[1].values())
    expected = sorted([math.log(3), math.log(2), 0.5 * math.log(3), 0.5 * math.log(2)])
    assert all(abs(a - b) < 1e-9 for a, b in zip(weights, expected))


def test_vocab_ids_in_range(spark):
    docs = _docs(spark, [(1, "alpha beta gamma delta epsilon")])
    rows = splade.encode(docs).collect()
    assert all(0 <= r.vocab_id < splade.VOCAB_SIZE for r in rows)


def test_doc_vectors_sorted_indices(spark):
    docs = _docs(spark, [(1, "query engine join sort merge filter window")])
    row = splade.doc_vectors(docs).collect()[0]
    assert list(row.indices) == sorted(row.indices)
    assert len(row.indices) == len(row.values)
    # 7 surface + 7 expansion ids (no collisions expected in 30522 space)
    assert len(row.indices) == 14


def test_search_exact_term_match_ranks_first(spark):
    docs = _docs(spark, [
        (1, "merge join strategies for distributed sort"),
        (2, "cooking pasta with tomato sauce"),
        (3, "merge merge merge join join"),
    ])
    q = spark.createDataFrame([("q1", "merge join")], ["query_id", "query_text"])
    res = splade.search(docs, q, k=3).collect()
    assert [r.doc_id for r in sorted(res, key=lambda r: r.rank)][0] == 3
    # doc 2 shares no terms (and no expansion ids) -> absent
    assert all(r.doc_id != 2 for r in res)


def test_expansion_matches_related_doc(spark):
    # A doc and a query sharing ZERO surface terms still score when the
    # query term's expansion id collides with... itself only; so instead
    # verify the expansion id contributes: doc containing the term scores
    # higher than ln(1+tf) alone would from surface match (surface + exp
    # both match -> 1.25x the surface-only product).
    docs = _docs(spark, [(1, "zebra")])
    q = spark.createDataFrame([("q1", "zebra")], ["query_id", "query_text"])
    score = splade.search(docs, q, k=1).collect()[0].score
    surface = math.log(2) * math.log(2)
    assert abs(score - round(1.25 * surface, 6)) < 1e-6


def test_vocab_file_roundtrip_and_unk(spark, tmp_path):
    from pyspark.sql import functions as F

    from semantik_spark.operators import splade

    docs = spark.createDataFrame(
        [(1, "spark engine shuffles data"), (2, "spark engine broadcast join"),
         (3, "zebra quixotic")],
        "doc_id bigint, text string")
    path = str(tmp_path / "vocab.txt")
    n = splade.build_vocab_file(docs.where(F.col("doc_id") <= 2), path, size=64)
    lines = open(path).read().splitlines()
    assert len(lines) == 64
    assert lines[:5] == list(splade.SPECIAL_TOKENS)
    # df-ranked: terms in both docs come first (df=2), ties term-asc
    assert lines[5] == "engine" and lines[6] == "spark"
    assert lines[5 + n] == "[unused0]"

    vocab = splade.load_vocab(spark, path)
    enc = splade.encode_with_vocab(docs, vocab).collect()
    by = {(r["doc_id"], r["vocab_id"]): r["weight"] for r in enc}
    # "spark" id = line 6
    assert (1, 6) in by
    # doc 3's terms are OOV -> both collapse to [UNK]=1, max-pooled to one row
    d3 = [r for r in enc if r["doc_id"] == 3]
    assert [r["vocab_id"] for r in d3] == [splade.UNK_ID]
