"""IR evaluation metrics as window/aggregate expressions.

Formula parity with shared/benchmarks/metrics.py:
  collapse chunks→docs first-hit  :12-41
  P@k = |relevant ∩ top-k| / k    :44-72   (missing slots count against)
  R@k = |relevant ∩ top-k| / |relevant|  :75-103
  MRR = 1 / rank of first relevant        :106-134
  DCG discount log2(i+2), nDCG = DCG/IDCG :137-199
  AP = mean of precision@hit over |relevant|  :202-240
  binary relevance = grade > 0            :276

Input contract: ``retrieved`` = (query_id, doc_id, rank) with rank
1-based dense per query; ``qrels`` = (query_id, doc_id, grade 0-3).
All pure SQL — the whole benchmark harness (§3.3) is one query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semantik_spark.functions.caching import checkpoint

# cached frames from the most recent evaluate() call, released on the
# next call (see evaluate docstring)
_live_caches: list[DataFrame] = []


def collapse_chunks(retrieved_chunks: DataFrame) -> DataFrame:
    """First-hit chunk→doc collapse (metrics.py:12-41): keep each doc's
    best-ranked chunk, then re-rank densely per query."""
    w_first = Window.partitionBy("query_id", "doc_id").orderBy("rank")
    w_rerank = Window.partitionBy("query_id").orderBy("rank")
    return (
        retrieved_chunks.withColumn("_fh", F.row_number().over(w_first))
        .where(F.col("_fh") == 1)
        .withColumn("rank", F.row_number().over(w_rerank))
        .drop("_fh")
    )


def _unpivot(df: DataFrame, cols: list[str], k_expr) -> DataFrame:
    """(query_id, metric, k, value) rows from metric columns via ONE
    explode — N selectExpr+union branches would re-execute the whole
    upstream N times (measured 2× wall on the bench ir_metrics)."""
    pairs = F.array(*[
        F.struct(F.lit(c).alias("metric"), F.col(c).cast("double").alias("value"))
        for c in cols
    ])
    return df.select(
        "query_id", k_expr.alias("k"), F.explode(pairs).alias("m")
    ).select("query_id", F.col("m.metric").alias("metric"), "k", F.col("m.value").alias("value"))


def evaluate(retrieved: DataFrame, qrels: DataFrame, k_values: tuple[int, ...] = (5, 10)) -> DataFrame:
    """Per-query metric table: query_id, metric, k (NULL for mrr/ap),
    value — mirroring BenchmarkRunMetric (models.py:1669-1689).

    ``j`` and ``qrels`` feed every per-k branch plus mrr/ap — persist
    both so the retrieval pipeline runs once, not once per metric.
    Each call releases the previous call's cached frames (repeated
    evaluations in one session would otherwise accumulate cached blocks
    for the session's lifetime); a prior result materialized after a
    newer evaluate() call simply recomputes."""
    while _live_caches:
        _live_caches.pop().unpersist()
    # metrics manages its own release cycle (_live_caches, released at
    # the next evaluate() call) instead of the session-wide cache()
    # registry — keep it self-contained
    qrels = qrels.persist()
    _live_caches.append(qrels)
    j = (
        retrieved.join(qrels, ["query_id", "doc_id"], "left")
        .withColumn("grade", F.coalesce(F.col("grade"), F.lit(0)))
        .withColumn("rel", (F.col("grade") > 0).cast("int"))
        .persist()
    )
    _live_caches.append(j)
    n_rel = qrels.where(F.col("grade") > 0).groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_relevant")
    )

    per_k = []
    for k in k_values:
        topk = j.where(F.col("rank") <= k)
        # ideal DCG from the full qrels, not just retrieved (metrics.py:193-196)
        w_ideal = Window.partitionBy("query_id").orderBy(F.desc("grade"), F.asc("doc_id"))
        ideal = (
            qrels.withColumn("irank", F.row_number().over(w_ideal))
            .where((F.col("irank") <= k) & (F.col("grade") > 0))
            .groupBy("query_id")
            .agg(F.sum(F.col("grade") / F.log2(F.col("irank") + 1)).alias("idcg"))
        )
        base = (
            topk.groupBy("query_id")
            .agg(
                (F.sum("rel") / F.lit(k)).alias("precision"),
                F.sum("rel").alias("hits"),
                F.sum(
                    F.when(F.col("grade") > 0, F.col("grade") / F.log2(F.col("rank") + 1)).otherwise(0.0)
                ).alias("dcg"),
            )
            .join(n_rel, "query_id", "left")
            .join(ideal, "query_id", "left")
            .select(
                "query_id",
                F.lit(k).alias("k"),
                F.col("precision"),
                F.when(F.col("n_relevant") > 0, F.col("hits") / F.col("n_relevant"))
                .otherwise(0.0).alias("recall"),
                F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
                .otherwise(0.0).alias("ndcg"),
            )
        )
        per_k.append(_unpivot(base, ["precision", "recall", "ndcg"], F.lit(k)))

    w_cum = (
        Window.partitionBy("query_id").orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unk = (
        j.withColumn("cum_hits", F.sum("rel").over(w_cum))
        .groupBy("query_id")
        .agg(
            F.max(F.when(F.col("rel") == 1, 1.0 / F.col("rank"))).alias("mrr_raw"),
            F.sum(
                F.when(F.col("rel") == 1, F.col("cum_hits") / F.col("rank"))
            ).alias("ap_num"),
        )
        .join(n_rel, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("mrr_raw", F.lit(0.0)).alias("mrr"),
            F.when(
                F.col("n_relevant") > 0, F.coalesce(F.col("ap_num"), F.lit(0.0)) / F.col("n_relevant")
            ).otherwise(0.0).alias("ap"),
        )
    )
    per_q = per_k[0]
    for p in per_k[1:]:
        per_q = per_q.unionByName(p)
    return per_q.unionByName(
        _unpivot(unk, ["mrr", "ap"], F.lit(None).cast("int"))
    )


def aggregate_metrics(per_query: DataFrame) -> DataFrame:
    """Run-level means per (metric, k) — evaluator.py:271-307."""
    return per_query.groupBy("metric", "k").agg(F.avg("value").alias("value"))


def hard_negatives(retrieved: DataFrame, qrels: DataFrame,
                   n: int = 5, min_grade: int = 1) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-n retrieved documents whose relevance grade is below
    ``min_grade`` — the standard
    construction for training dense retrievers / cross-encoders
    (retrieved-but-not-relevant beats random negatives; Karpukhin et
    al. 2020). The reference evaluates retrieval quality against
    qrels (shared/benchmarks/evaluator.py:49-117); this reuses the
    same two inputs to EMIT training data instead of metrics.

    query_id, doc_id, rank, neg_rank — ``rank`` is the retrieval rank,
    ``neg_rank`` renumbers the survivors 1..n per query.

    Shape: one left-anti hash join on (query_id, doc_id) — qrels'
    positive slice broadcasts (it is per-query-tiny) — then a per-query
    window on the already-small retrieved set. No extra shuffle beyond
    what retrieval already did.
    """
    pos = qrels.where(F.col("grade") >= min_grade).select("query_id", "doc_id")
    neg = retrieved.join(F.broadcast(pos), ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy("rank")
    return (
        neg.withColumn("neg_rank", F.row_number().over(w).cast("int"))
        .where(F.col("neg_rank") <= n)
        .select("query_id", "doc_id", F.col("rank").cast("int").alias("rank"), "neg_rank")
    )


def rank_correlation_tau(docs: DataFrame, queries: DataFrame, k: int = 20,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Kendall tau-b between the BM25 and dense rankings of each
    query's hybrid candidate set — the branch-agreement diagnostic for
    hybrid search: tau near 1 means the dense model mostly re-ranks
    what BM25 already found (fusion adds little), tau near 0 means the
    branches disagree and RRF is doing real work.

      tau_b = (C − D) / √((T − t_x)(T − t_y)),   T = n(n−1)/2

    over the candidate union (ltr_features' table: rank 0 = outside
    that branch's top-k, a legitimate tie class). C/D/t are exact
    integer pair counts from a per-query self-join — candidates are
    2k per query, so the pair stage is k²-bounded per query, never
    corpus-bounded.

    Output: one row per query — query_id, n_candidates, concordant,
    discordant, tau_b (6 dp, NULL when a branch is fully tied via
    try-division).
    """
    from semantik_spark.operators.search import ltr_features

    # feats is consumed THREE times (both sides of the pair self-join +
    # the per-query candidate count) — localCheckpoint materializes the
    # whole ltr_features pipeline once and truncates its ~240-Exchange
    # plan subtree to a leaf, instead of planning and running the
    # corpus-side search three times. The table is query-bounded
    # (|queries|·2k rows), so the checkpoint is tiny at any corpus size.
    feats = checkpoint(ltr_features(docs, queries, k=k, id_col=id_col,
                                    text_col=text_col)
                       .select("query_id", "doc_id", "bm25_rank", "dense_rank"))
    a, b = feats.alias("a"), feats.alias("b")
    pairs = (
        a.join(b, (F.col("a.query_id") == F.col("b.query_id"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.query_id").alias("query_id"),
            (F.col("a.bm25_rank") - F.col("b.bm25_rank")).alias("dx"),
            (F.col("a.dense_rank") - F.col("b.dense_rank")).alias("dy"),
        )
    )
    sgn = lambda c: F.when(c > 0, 1).when(c < 0, -1).otherwise(0)  # noqa: E731
    agg = pairs.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("t_pairs"),
        F.sum(F.when(sgn(F.col("dx")) * sgn(F.col("dy")) == 1, 1)
              .otherwise(0)).cast("bigint").alias("concordant"),
        F.sum(F.when(sgn(F.col("dx")) * sgn(F.col("dy")) == -1, 1)
              .otherwise(0)).cast("bigint").alias("discordant"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0)).cast("bigint")
        .alias("tx"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0)).cast("bigint")
        .alias("ty"),
    )
    n = feats.groupBy("query_id").agg(
        F.count("*").cast("int").alias("n_candidates"))
    tau = F.try_divide(
        (F.col("concordant") - F.col("discordant")).cast("double"),
        F.sqrt((F.col("t_pairs") - F.col("tx")).cast("double")
               * (F.col("t_pairs") - F.col("ty")).cast("double")))
    return (
        agg.join(n, "query_id")
        .select("query_id", "n_candidates", "concordant", "discordant",
                F.round(tau, 6).alias("tau_b"))
    )


def cohens_kappa(pred: DataFrame, label_col: str = "label",
                 pred_col: str = "predicted") -> DataFrame:
    """Cohen's kappa (Cohen 1960) over a (label, predicted) table —
    chance-corrected agreement, the accuracy number that survives
    class imbalance (predicting the majority class everywhere can
    score 90% accuracy but kappa ≈ 0):

      κ = (p_o − p_e) / (1 − p_e),
      p_e = Σ_c (row_c/N)·(col_c/N)

    Exactness: p_o and p_e are rationals of exact counts; p_e's
    per-class products round at 9 dp into DECIMAL before the sum; the
    terminal division is one double (NULL when p_e = 1, the
    single-class degeneracy, via try-division).

    Output (1 row): n, n_agree, accuracy (6 dp), expected_accuracy
    (6 dp), kappa (6 dp).

    Scale: one pass for the confusion diagonal + two class margins
    (all map-side combinable); everything after is class-bounded.
    """
    base = (
        # NULL labels/predictions excluded BEFORE counting (the
        # chi_square_independence NULL discipline): a NULL-keyed row
        # lands in n and the margins but its class never equi-joins
        # into p_e and (y == p) is NULL — it would silently count as
        # disagreement while its chance-agreement mass vanishes
        pred.where(F.col(label_col).isNotNull()
                   & F.col(pred_col).isNotNull())
        .select(F.col(label_col).cast("string").alias("y"),
                F.col(pred_col).cast("string").alias("p"))
    )
    tot = base.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("y") == F.col("p")).cast("int")).cast("bigint")
        .alias("n_agree"),
    )
    rows = base.groupBy("y").agg(F.count("*").cast("bigint").alias("r"))
    cols = base.groupBy("p").agg(F.count("*").cast("bigint").alias("c"))
    pe = (
        rows.join(cols, rows.y == cols.p)
        .crossJoin(F.broadcast(tot))
        .select(F.round((F.col("r").cast("double") / F.col("n"))
                        * (F.col("c").cast("double") / F.col("n")), 9)
                .cast("decimal(20,9)").alias("e9"))
        .agg(F.sum("e9").cast("decimal(28,9)").alias("pe"))
    )
    po = F.col("n_agree").cast("double") / F.col("n")
    ped = F.col("pe").cast("double")
    return tot.crossJoin(F.broadcast(pe)).select(
        "n", "n_agree",
        F.round(po, 6).alias("accuracy"),
        F.round(ped, 6).alias("expected_accuracy"),
        F.round(F.try_divide(po - ped, F.lit(1.0) - ped), 6).alias("kappa"),
    )


def roc_auc_exact(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC by the rank-sum identity (Hanley & McNeil 1982:
    AUC = U/(n₁·n₀), with ties counted half) — the threshold-free
    separation metric computed WITHOUT materializing the curve: one
    value-level count table and a cumulative window, the Mann-Whitney
    machinery pointed at classifier evaluation.

    Doubled-rank arithmetic keeps tie midpoints integer (the
    stattests.mann_whitney_u recipe), so AUC is an exact rational
    n-digit division — no trapezoid accumulation, no float order
    anywhere. Also reports the Hanley-McNeil standard error.

    Output (1 row): n_pos, n_neg, auc (6 dp), se (6 dp).

    Scale: one scan → value-level groupBy (map-side combined) →
    cumulative window over the SCORE-CARDINALITY-bounded table
    (quantize continuous scores). No per-threshold pass, no sort of
    the raw rows.
    """
    y = F.col(label_col).cast("int")
    vl = (
        # NULL scores/labels excluded: a NULL score row would take a
        # different window position in Spark (NULLS FIRST) vs DuckDB
        # (NULLS LAST), and a NULL label silently drops from np but
        # not nn — filter both, oracle carries the matching predicate
        df.where(F.col(score_col).isNotNull()
                 & F.col(label_col).isNotNull())
        .groupBy(F.col(score_col).alias("v"))
        .agg(F.sum(y).cast("bigint").alias("np"),
             F.sum(1 - y).cast("bigint").alias("nn"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    t = F.col("np") + F.col("nn")
    ranked = vl.select(
        "np", "nn", t.alias("t"),
        F.coalesce(F.sum(F.col("np") + F.col("nn")).over(w),
                   F.lit(0)).cast("bigint").alias("c"),
    )
    # DECIMAL(38,0) widening BEFORE the doubled-rank product and the
    # n_pos·n_neg denominators — np·2c ~ n² wraps BIGINT at 100 TB row
    # counts (the stattests.mann_whitney_u guard, same identity)
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = ranked.agg(
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum("nn").cast("bigint").alias("n_neg"),
        F.sum(d38("np") * (2 * d38("c") + d38("t") + 1))
        .cast("decimal(38,0)").alias("rp2"),
    )
    u = (F.col("rp2").cast("double") / 2
         - (d38("n_pos") * (d38("n_pos") + 1)).cast("double") / 2)
    auc = F.try_divide(u, (d38("n_pos") * d38("n_neg")).cast("double"))
    q1 = F.col("auc") / (2.0 - F.col("auc"))
    q2 = 2.0 * F.col("auc") * F.col("auc") / (1.0 + F.col("auc"))
    a2 = F.col("auc") * F.col("auc")
    se = F.sqrt(
        (F.col("auc") * (1.0 - F.col("auc"))
         + (F.col("n_pos") - 1).cast("double") * (q1 - a2)
         + (F.col("n_neg") - 1).cast("double") * (q2 - a2))
        / (d38("n_pos") * d38("n_neg")).cast("double"))
    return (
        agg.withColumn("auc", auc)
        .select("n_pos", "n_neg",
                F.round("auc", 6).alias("auc"),
                F.round(se, 6).alias("se"))
    )
