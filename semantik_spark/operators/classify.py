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
        # LEFT join + 0 fill: a label whose training docs tokenize to
        # NOTHING (all stopwords / sub-2-char tokens) has no
        # label_tokens row; an inner join would delete its whole vocab
        # grid and make the class unpredictable, when its Laplace
        # log-likelihood ln(1/(0+|V|)) is perfectly well-defined
        .join(F.broadcast(label_tokens), "label", "left")
        .na.fill({"n_tok": 0})
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
            # decimal round before the cast (half-point-exact both
            # engines — the collocations_llr knife-edge)
            F.round(F.col("score_dec"), 4).cast("double").alias("score"),
            (F.col("cand") == F.col("label")).cast("int").alias("correct"),
        )
    )


def logreg_hashed_scores(docs: DataFrame, label: F.Column,
                         buckets: int = 32, iters: int = 3, lr: float = 0.5,
                         id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distributed binary logistic regression over hashed bag-of-words
    features — the trainable half of the fastText-style quality/domain
    filter (the NB classifier above is the generative twin; GPT-3/LLaMA
    data prep both score web text with exactly this model family).

    Full-batch gradient descent, ``iters`` steps from w=0:

      features   token counts hashed into ``buckets`` (hash60, the
                 portable md5 hash) — x_db integer counts
      margin_d   exact DECIMAL sum of w_b·x_db + bias (w quantized to
                 6 dp every step, so the sum is order-independent)
      p_d        round(sigmoid(margin), 6)
      gradient   Σ_d (p_d − y_d)·x_db — again an exact decimal sum
      update     w ← round(w − lr·grad/N, 6)

    The 6 dp quantization at every step is what makes three iterations
    of a transcendental-function training loop replayable bit-for-bit
    by the DuckDB oracle (same trick as ivf_refine's rounded means and
    the NB decimal log-likelihoods).

    Scale shape: per iteration, ONE doc-keyed aggregation for margins
    (map-side combinable) and ONE bucket-keyed aggregation for the
    gradient (``buckets``+1 keys — tiny), with the weight vector
    traveling as a broadcast ``buckets``-row table, never as plan
    literals. The driver holds only the (buckets+1)-float weight
    vector — model state is corpus-independent, exactly the k-means
    codebook pattern. Returns (doc_id, y, margin, prob) for every doc
    under the FINAL weights.
    """
    from decimal import Decimal

    from semantik_spark.functions.hashing import hash60

    spark = docs.sparkSession
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: F.length(t) > 0)
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(toks).alias("tok"))
    feats = (
        base.select("doc_id",
                    F.pmod(hash60(F.concat(F.lit("lr:"), F.col("tok"))),
                           F.lit(buckets)).cast("int").alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    from semantik_spark.functions.caching import cache
    # zero-token docs keep margin = bias: labels come from the full
    # docs frame, not from the exploded feature rows
    ydf = cache(docs.select(F.col(id_col).alias("doc_id"),
                            label.cast("int").alias("y")))
    # sentinel bucket -1 with x=1 for EVERY labeled doc: its per-bucket
    # "gradient" Σ(p−y)·1 IS the bias gradient, so each iteration runs
    # ONE aggregation+collect instead of two (the bias sum used to
    # recompute the whole margin pipeline a second time per step).
    # margins() is unaffected: its weights join is INNER on buckets
    # 0..buckets-1, so sentinel rows never reach the dot product.
    feats = cache(feats.unionByName(
        ydf.select("doc_id", F.lit(-1).cast("int").alias("bucket"),
                   F.lit(1).cast("bigint").alias("x"))))
    n_docs = ydf.count()

    from semantik_spark.functions.quant import round_half_away

    w = {b: Decimal("0") for b in range(buckets)}
    bias = Decimal("0")
    # half-AWAY quantization (functions.quant): the oracle replays the
    # weight update with SQL round() (half-away); Python's half-even
    # round() diverges on an exact half-point tie, and an iterative
    # trainer amplifies any one-step divergence
    q6 = lambda v: Decimal(str(round_half_away(float(v), 6)))

    def weights_df():
        return spark.createDataFrame(
            [(b, w[b]) for b in range(buckets)],
            f"bucket int, w {_DEC}",
        )

    def margins():
        # exact decimal dot product + bias; docs with no tokens keep
        # margin = bias via the left join
        dot = (
            feats.join(F.broadcast(weights_df()), "bucket")
            .groupBy("doc_id")
            .agg(F.sum(F.col("w") * F.col("x")).cast("decimal(24,6)").alias("dot"))
        )
        return (
            ydf.join(dot, "doc_id", "left")
            .select(
                "doc_id", "y",
                (F.coalesce(F.col("dot"), F.lit(0).cast("decimal(24,6)"))
                 + F.lit(bias).cast(_DEC)).cast("decimal(24,6)").alias("margin"),
            )
            .withColumn(
                "p",
                F.round(F.lit(1.0) / (F.lit(1.0)
                        + F.exp(-F.col("margin").cast("double"))), 6)
                .cast(_DEC),
            )
        )

    # zero docs: skip training entirely (the weight update divides by
    # n_docs — a driver ZeroDivisionError otherwise) and fall through
    # to margins(), which is empty for an empty input
    for _ in range(iters if n_docs > 0 else 0):
        m = margins()
        # one aggregation serves every bucket gradient AND the bias
        # gradient (sentinel bucket -1, x=1 per doc: Σ(p−y)·1 ≡ Σ(p−y),
        # exact decimal arithmetic either way)
        gb = (
            feats.join(m.select("doc_id", "y", "p"), "doc_id")
            .groupBy("bucket")
            .agg(F.sum((F.col("p") - F.col("y")) * F.col("x"))
                 .cast("decimal(24,6)").alias("g"))
            .collect()
        )
        grads = {int(r["bucket"]): r["g"] for r in gb}
        gbias = grads.pop(-1, Decimal("0"))
        for b in range(buckets):
            g = grads.get(b, Decimal("0")) or Decimal("0")
            w[b] = q6(float(w[b]) - lr * float(g) / n_docs)
        bias = q6(float(bias) - lr * float(gbias or 0) / n_docs)

    return margins().select(
        "doc_id", "y",
        F.col("margin").cast("double").alias("margin"),
        F.col("p").cast("double").alias("prob"),
    )
