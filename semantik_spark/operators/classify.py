"""Distributed multinomial naive-Bayes document classifier.

The quality/domain-classifier stage of a large-scale training-data
pipeline (a fastText-style label scorer: CCNet, GPT-3 and LLaMA data
prep all filter web text with a linear classifier over token counts).
The reference has no trainable classifier — its curation is rule-based
(shared/text_processing chain) — so this is an engine-native addition
in the same family as the text-analysis scores.

Training is two aggregations and scoring is one join + one
aggregation, all expressible in pure DataFrame ops:

  token-label counts   groupBy(label, term).count        — one shuffle
  class/vocab totals   tiny aggregates over the above
  model grid           vocab × labels, Laplace-smoothed   — |V|·|L| rows
  scoring              test tokens ⋈ grid on term, then
                       groupBy(doc, label).sum            — one shuffle

Float portability: every per-token log-likelihood and every class
prior is rounded to 6 dp and cast to DECIMAL(12,6) BEFORE summation,
so the per-document score is an EXACT decimal sum — order-independent
and bit-identical in Spark and DuckDB — and the argmax cannot flip on
float summation order. (Same exact-decimal-moments trick as the
z-score anomaly scan.)

At 100 TB: the model grid is |V|·|L| rows (millions at web vocab —
still a broadcast candidate at |L|≈5; fall back to a sort-merge join
on ``term`` when it isn't). Skewed terms don't skew the shuffle: the
grid join key is ``term`` and hot terms are exactly the ones Laplace
smoothing makes uninformative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semantik_spark.functions.text import bm25_tokens

_DEC = "decimal(12,6)"


def naive_bayes_model(train: DataFrame, label_col: str = "lang",
                      id_col: str = "doc_id", text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """Train a multinomial NB model with add-one (Laplace) smoothing.

    Returns ``(model, priors)``:
      model  — (label, term, loglik): ln((cnt+1)/(n_tok_label+|V|)),
               rounded 6 dp, DECIMAL(12,6); the full vocab × label grid
               so unseen (term, label) pairs carry the smoothed floor.
      priors — (label, prior): ln(n_docs_label / n_docs), same encoding.
    """
    base = train.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("label"),
        bm25_tokens(text_col).alias("toks"),
    )
    tok = base.select("label", F.explode("toks").alias("term"))
    tok_counts = tok.groupBy("label", "term").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    label_tokens = tok_counts.groupBy("label").agg(F.sum("cnt").alias("n_tok"))
    vocab = tok_counts.select("term").distinct()
    vsize = vocab.agg(F.count("*").cast("bigint").alias("v"))
    class_docs = base.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    total = class_docs.agg(F.sum("n_docs").alias("n_total"))
    grid = vocab.crossJoin(F.broadcast(class_docs.select("label")))
    model = (
        grid.join(tok_counts, ["label", "term"], "left")
        .join(F.broadcast(label_tokens), "label")
        .crossJoin(F.broadcast(vsize))
        .select(
            "label", "term",
            F.round(
                F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1)
                      / (F.col("n_tok") + F.col("v"))),
                6,
            ).cast(_DEC).alias("loglik"),
        )
    )
    priors = class_docs.crossJoin(F.broadcast(total)).select(
        "label",
        F.round(F.log(F.col("n_docs") / F.col("n_total")), 6).cast(_DEC).alias("prior"),
    )
    return model, priors


def naive_bayes_classify(train: DataFrame, test: DataFrame,
                         label_col: str = "lang", id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Score every test document against the trained model and emit
    (doc_id, label, predicted, score, correct).

    Semantics pinned for the oracle:
      - token frequencies count (multinomial NB, duplicates preserved);
      - out-of-vocabulary test tokens are dropped (inner join on term);
      - test docs with zero in-vocabulary tokens are absent from the
        output (no prior-only prediction);
      - argmax tie-break: higher exact-decimal score first, then label
        ascending.
    ``score`` is the winning label's exact decimal log-posterior cast
    to double and rounded to 4 dp; ``correct`` is 1/0.
    """
    model, priors = naive_bayes_model(train, label_col, id_col, text_col)
    truth = test.select(F.col(id_col).alias("doc_id"), F.col(label_col).alias("label"))
    test_tf = (
        test.select(F.col(id_col).alias("doc_id"), F.explode(bm25_tokens(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    scores = (
        test_tf.join(model.withColumnRenamed("label", "cand"), "term")
        .groupBy("doc_id", "cand")
        .agg(F.sum(F.col("tf") * F.col("loglik")).alias("ll"))
        .join(F.broadcast(priors.withColumnRenamed("label", "cand")), "cand")
        .withColumn("score_dec", F.col("prior") + F.col("ll"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_dec"), F.asc("cand"))
    best = scores.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        best.join(truth, "doc_id")
        .select(
            "doc_id", "label",
            F.col("cand").alias("predicted"),
            F.round(F.col("score_dec").cast("double"), 4).alias("score"),
            (F.col("cand") == F.col("label")).cast("int").alias("correct"),
        )
    )
