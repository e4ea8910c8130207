"""Index build / serve split — the deployed shape of the search path.

The reference separates indexing (celery pipeline writing Qdrant
collections, vecpipe worker) from serving (search service querying the
persisted index, vecpipe/search/service.py:73-408). The in-one-run
search operators (bm25.search, search.hybrid_search) rebuild the index
per query — right for correctness oracles, wrong for latency claims.
This module materializes the index once as parquet tables and serves
queries against the persisted artifacts:

  build_index   — tokenize → corpus/term stats → postings → dense
                  embeddings, written as parquet (one pass over the
                  corpus; the tokenized intermediate is shared).
  bm25_serve    — encode queries against persisted terms, broadcast
                  into the persisted postings scan, one shuffle (the
                  per-(query,doc) sum), window top-k.
  dense_serve   — embed queries, broadcast against the persisted
                  embedding table, zero shuffles before top-k.
  hybrid_serve  — RRF fusion of the two serve branches.

Scale notes (100 TB): the persisted postings table is partitionable by
collection and bucketable by term; the dense table by collection /
centroid_id (see similarity.knn_ivf). Serving then prunes partitions at
the scan — queries never touch the tokenizer or the stats build. This
mirrors BASELINE.md's service latencies, which likewise exclude
indexing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantik_spark.functions.vectors import mock_embedding
from semantik_spark.operators import bm25, search
from semantik_spark.plans.predicates import compile_predicate


def build_sparse(docs: DataFrame, path: str,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
    """Materialize the sparse half of the index (terms/ + postings/)
    from the current corpus. Split out because BM25 idf/avgdl are
    corpus-global: an exact refresh after document changes must rerun
    this whole pass, while the dense half can stay append-only (see
    streaming.incremental.incremental_index)."""
    tok = bm25.tokenize(docs, id_col=id_col, text_col=text_col).persist()
    stats = bm25.corpus_stats(tok)
    terms = bm25.term_stats(tok, stats)
    post = bm25.postings(tok, terms, stats)
    terms.write.mode("overwrite").parquet(f"{path}/terms")
    post.write.mode("overwrite").parquet(f"{path}/postings")
    tok.unpersist()


def build_index(docs: DataFrame, path: str,
                id_col: str = "doc_id", text_col: str = "text",
                payload_cols: tuple[str, ...] = ()) -> None:
    """Materialize the search index under ``path``: terms/, postings/,
    dense/ parquet tables. ``payload_cols`` are carried into the dense
    table so payload-filtered serving (dense_serve_filtered) can push
    its predicate into the parquet scan instead of joining the catalog
    per query — the reference's Qdrant payload-index trade
    (models.py:419-472 payload, dense_search.py:88-98 filters)."""
    build_sparse(docs, path, id_col=id_col, text_col=text_col)
    docs.select(
        F.col(id_col).alias("doc_id"), mock_embedding(text_col).alias("embedding"),
        *payload_cols,
    ).write.mode("overwrite").parquet(f"{path}/dense")


def bm25_serve(spark: SparkSession, path: str, queries: DataFrame,
               k: int = 10) -> DataFrame:
    """BM25 top-k against the persisted index: query_id, doc_id, score,
    rank. Only the (tiny) query encoding touches the terms table; the
    postings scan is the one big input and the per-(query,doc) sum the
    one shuffle."""
    terms = spark.read.parquet(f"{path}/terms")
    post = spark.read.parquet(f"{path}/postings")
    enc = bm25.encode_queries(queries, terms)
    scored = bm25.score(post, enc)
    return search._topk(scored, k)


def dense_serve(spark: SparkSession, path: str, queries: DataFrame,
                k: int = 10, query_id_col: str = "query_id",
                query_text_col: str = "query_text") -> DataFrame:
    """Dense top-k against the persisted embedding table."""
    index = spark.read.parquet(f"{path}/dense")
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        mock_embedding(query_text_col).alias("query_vec"),
    )
    return search.dense_search(index, q, k)


def dense_serve_filtered(spark: SparkSession, path: str, queries: DataFrame,
                         predicate: dict | None = None, k: int = 10,
                         query_id_col: str = "query_id",
                         query_text_col: str = "query_text") -> DataFrame:
    """Payload-filtered dense top-k (F2 ∘ W2): the predicate compiles
    to a Column (plans/predicates.py) applied to the index scan BEFORE
    scoring, so equality/range terms on payload columns reach the
    parquet reader as PushedFilters (plan-asserted) — candidate ranking
    then runs on the filtered subset only, never post-filtering a
    top-k (which under-fills k, the classic filtered-ANN bug)."""
    index = spark.read.parquet(f"{path}/dense").where(compile_predicate(predicate))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        mock_embedding(query_text_col).alias("query_vec"),
    )
    return search.dense_search(index, q, k)


def hybrid_serve(spark: SparkSession, path: str, queries: DataFrame,
                 k: int = 10, search_k: int | None = None) -> DataFrame:
    """Hybrid RRF against the persisted index — the deployed composed
    query path (service.py:73-408 minus the per-request model calls).

    SINGLE-EXCHANGE fusion (r6 latency work): instead of ranking each
    branch in its own sort-shuffle and FULL-OUTER-joining the two
    ranked lists (3 exchanges of scored rows), both branches' raw
    scores union with a branch tag, ONE window ranks per (query,
    branch), and the join becomes a groupBy pivot over the ≤
    2·|queries|·search_k surviving rows. Row-identical to
    rrf_fuse(dense_ranked, sparse_ranked): a (query, doc) group holds
    exactly the branches that scored it, so the max(when(branch=…))
    pivot reproduces the outer join's NULL pattern, and ranks/ties
    order identically (score DESC, doc_id ASC)."""
    if search_k is None:
        search_k = max(k * 2, 20)
    from pyspark.sql import Window

    from semantik_spark.operators import bm25

    index = spark.read.parquet(f"{path}/dense")
    qd = queries.select(
        F.col("query_id").alias("query_id"),
        mock_embedding("query_text").alias("query_vec"),
    )
    from semantik_spark.functions.vectors import cosine

    dscored = index.crossJoin(F.broadcast(qd)).select(
        "query_id", "doc_id", cosine("embedding", "query_vec").alias("score")
    )
    terms = spark.read.parquet(f"{path}/terms")
    post = spark.read.parquet(f"{path}/postings")
    sscored = bm25.score(post, bm25.encode_queries(queries, terms))
    u = dscored.select(F.lit(0).alias("branch"), "query_id", "doc_id", "score") \
        .unionByName(sscored.select(F.lit(1).alias("branch"),
                                    "query_id", "doc_id", "score"))
    wb = Window.partitionBy("query_id", "branch").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    ranked = u.withColumn("rank", F.row_number().over(wb)) \
        .where(F.col("rank") <= search_k)
    fused = (
        ranked.groupBy("query_id", "doc_id")
        .agg(
            F.max(F.when(F.col("branch") == 0, F.col("rank"))).alias("dense_rank"),
            F.max(F.when(F.col("branch") == 0, F.col("score"))).alias("dense_score"),
            F.max(F.when(F.col("branch") == 1, F.col("rank"))).alias("sparse_rank"),
            F.max(F.when(F.col("branch") == 1, F.col("score"))).alias("sparse_score"),
        )
        .withColumn(
            "score",
            F.coalesce(1.0 / (F.lit(search.RRF_K) + F.col("dense_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(search.RRF_K) + F.col("sparse_rank")), F.lit(0.0)),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wq))
        .where((F.col("rank") <= k) & F.col("doc_id").isNotNull())
        .select("query_id", "doc_id", "score", "rank",
                "dense_rank", "sparse_rank", "dense_score", "sparse_score")
    )


def build_dense_ivf(docs: DataFrame, path: str, n_centroids: int = 16,
                    refine_iters: int = 1,
                    id_col: str = "doc_id", text_col: str = "text",
                    payload_cols: tuple[str, ...] = ()) -> None:
    """Materialize the ANN-serving shape of the dense index: embeddings
    written ``partitionBy(centroid_id)`` (one directory per IVF cell)
    plus the codebook as a tiny parquet table. A probe then reads only
    its cells from disk — real partition pruning, not a post-scan
    filter — which is the 100 TB difference between scanning
    nprobe/n_centroids of the corpus and scanning all of it."""
    from semantik_spark.operators.similarity import (
        _codebook_df, _nearest_centroids, ivf_centroids, ivf_refine,
    )

    emb = docs.select(F.col(id_col).alias("doc_id"),
                      mock_embedding(text_col).cast("array<double>").alias("embedding"),
                      *payload_cols)
    cent_rows = ivf_centroids(emb, n_centroids, "doc_id", "embedding")
    if refine_iters:
        cent_rows = ivf_refine(emb, cent_rows, iters=refine_iters,
                               id_col="doc_id", vec_col="embedding")
    spark = docs.sparkSession
    codebook = F.broadcast(_codebook_df(spark, cent_rows))
    assigned = emb.crossJoin(codebook).withColumn(
        "centroid_id", -F.array_max(_nearest_centroids("embedding"))["negcid"]
    ).drop("cents")
    assigned.write.mode("overwrite").partitionBy("centroid_id") \
        .parquet(f"{path}/dense_ivf")
    spark.createDataFrame(
        [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in cent_rows],
        "cid bigint, cv array<double>",
    ).write.mode("overwrite").parquet(f"{path}/codebook")


def _mock_embedding_py(text: str) -> list[float]:
    """Driver-side twin of functions.vectors.mock_embedding — the SAME
    IEEE-double operation sequence (exact int→double, division by 2^32,
    sequential-fold L2 norm), so the values are bit-identical to the
    Column expression and driver-planned probes agree with
    executor-scored cosines."""
    import hashlib
    import math

    hexs = hashlib.sha256(text.encode("utf-8")).hexdigest()
    vals = [int(hexs[i * 8:(i + 1) * 8], 16) / 4294967296.0 * 2.0 - 1.0
            for i in range(8)]
    acc = 0.0
    for x in vals:
        acc += x * x
    n = math.sqrt(acc)
    return [x / n for x in vals]


def _cosine_py(a: list[float], b: list[float]) -> float:
    """Driver-side twin of functions.vectors.cosine (sequential folds,
    same association order)."""
    import math

    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    nn = math.sqrt(na) * math.sqrt(nb)
    return dot / nn if nn > 0 else 0.0


def dense_serve_ivf(spark: SparkSession, path: str, queries: DataFrame,
                    k: int = 10, nprobe: int = 4, predicate: dict | None = None,
                    query_id_col: str = "query_id",
                    query_text_col: str = "query_text") -> DataFrame:
    """Dense top-k against the partitioned IVF index.

    Probe planning happens ON THE DRIVER: the query batch (tiny by
    definition — this is the serve path) and the codebook (n_centroids
    × dim floats) are both driver-scale, so query embeddings and
    nearest-cell selection are computed in Python with bit-identical
    twins of the Column expressions, and the probes table is created as
    literals. That makes the whole serve ONE Spark job — previously a
    codebook-scoring job and a distinct-cells collect ran before the
    real query (2.3s → 0.9s at sf0.1).

    The probed-cell isin predicate is static, so Catalyst turns it into
    PartitionFilters on the centroid_id directory layout (asserted in
    tests/test_plans.py) — at 100 TB a probe reads nprobe/n_centroids
    of the index FROM DISK."""
    from semantik_spark.functions.vectors import cosine

    cent_rows = sorted(
        ((int(r["cid"]), [float(x) for x in r["cv"]])
         for r in spark.read.parquet(f"{path}/codebook").collect()),
        key=lambda t: t[0],
    )
    probe_rows = []
    for r in queries.select(F.col(query_id_col).alias("query_id"),
                            F.col(query_text_col).alias("query_text")).collect():
        qv = _mock_embedding_py(str(r["query_text"]))
        ranked = sorted(((_cosine_py(qv, cv), -cid) for cid, cv in cent_rows),
                        reverse=True)[:nprobe]
        probe_rows += [(r["query_id"], qv, -negcid) for _, negcid in ranked]
    probes = spark.createDataFrame(
        probe_rows, "query_id string, qv array<double>, centroid_id bigint"
    )
    probed_cells = sorted({cid for _, _, cid in probe_rows})
    # filtered ANN (F2 ∘ probe pruning): partition pruning on
    # centroid_id AND payload PushedFilters compose on the same scan,
    # pre-ranking — k fills from eligible docs inside probed cells only
    index = spark.read.parquet(f"{path}/dense_ivf").where(
        F.col("centroid_id").isin(probed_cells)
    ).where(compile_predicate(predicate))
    scored = index.join(F.broadcast(probes), "centroid_id").select(
        "query_id", "doc_id", cosine("embedding", "qv").alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
