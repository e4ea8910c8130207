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
from semantik_spark.functions.caching import cache, checkpoint
from semantik_spark.functions.parallel import concurrently, spread


def build_sparse(docs: DataFrame, path: str,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
    """Materialize the sparse half of the index (terms/ + postings/)
    from the current corpus. Split out because BM25 idf/avgdl are
    corpus-global: an exact refresh after document changes must rerun
    this whole pass, while the dense half can stay append-only (see
    streaming.incremental.incremental_index)."""
    # spread before tokenize (r14, VERDICT r13 item 4): the regex
    # tokenize + the postings tf explode otherwise fuse into ONE task
    # over the one-file scan — the single-task stage the whole sparse
    # build inherits. Tokens/tf are per-row and exact-integer, idf is
    # per-term from integer df — placement-free; no-op at production
    # partition counts (functions/parallel.py).
    tok = cache(bm25.tokenize(spread(docs, id_col), id_col=id_col,
                              text_col=text_col))
    # derive the SERVING tables from the mergeable state instead of
    # aggregating tok twice: term_state (the vocab explode+groupBy —
    # the one corpus-sized aggregation here) used to run once inside
    # term_stats and AGAIN for the state write below; corpus_state ∘
    # stats_from_state is corpus_stats bit-for-bit (exact integer sums,
    # one double division — the retraction path already pins
    # state-derived == recomputed)
    cstate = bm25.corpus_state(tok)
    tstate = cache(bm25.term_state(tok))
    stats = bm25.stats_from_state(cstate)
    terms = bm25.term_stats_from_state(tstate, stats)
    post = bm25.postings(tok, terms, stats)

    # reset the mergeable stats state so a later APPEND-path
    # merge_sparse_append continues from this exact rebuild — via the
    # atomic whole-directory swap, never two in-place overwrites
    def _write_state(tmp: str) -> None:
        concurrently(
            lambda: cstate.write.mode("overwrite").parquet(f"{tmp}/corpus"),
            lambda: tstate.write.mode("overwrite").parquet(f"{tmp}/terms"),
        )

    # terms/, postings/ and the state swap are four independent writes
    # over the shared cached tok/tstate (different paths, nothing reads
    # what another writes, and a full rebuild has no inter-artifact
    # crash-ordering contract — only the state swap itself must publish
    # corpus+terms together, which the directory rename guarantees
    # regardless of internal write order) — overlap them (guide §2.6;
    # this path's jobs move KB-MB, its wall is per-job fixed cost).
    # the persisted postings drop term_id: appended batches are scored
    # under a GROWN vocabulary whose rank-based ids shift, so a stored
    # id column would mix id spaces across append generations — the
    # terms table is the single id authority; join on the term string
    concurrently(
        lambda: terms.write.mode("overwrite").parquet(f"{path}/terms"),
        lambda: post.drop("term_id").write.mode("overwrite")
                    .parquet(f"{path}/postings"),
        lambda: _bm25_state_swap(path, _write_state),
    )
    tok.unpersist()


def _bm25_state_read(spark: SparkSession, path: str, sub: str):
    """Read {path}/bm25_state/{sub} with the __old crash-window
    fallback. Returns None ONLY when neither location exists (a
    genuinely first batch); a read failure on an EXISTING state
    propagates — the previous bare except treated any transient read
    error as first-batch and silently reset the corpus-global BM25
    stats to the latest delta batch."""
    import os

    base = os.path.join(path, "bm25_state", sub)
    old = os.path.join(path, "bm25_state__old", sub)
    if os.path.exists(base):
        try:
            return spark.read.parquet(base)
        except Exception:
            if os.path.exists(old):
                return spark.read.parquet(old)
            raise
    if os.path.exists(old):
        return spark.read.parquet(old)
    return None


def _bm25_state_swap(path: str, write_fn, batch_id: int | None = None) -> None:
    """Atomically publish a new bm25_state: ``write_fn(staging_dir)``
    writes corpus/ and terms/ into the staging dir, then the rename
    pair swaps the WHOLE directory in — a crash can no longer leave
    n_docs including a batch whose df is missing (the old in-place
    overwrites had exactly that window). ``batch_id`` writes the
    ``_last_batch`` replay marker into the staging dir so it publishes
    atomically with the state; non-streaming writers (exact rebuild,
    GDPR delete) preserve the stream's existing watermark instead."""
    import os
    import shutil

    base = os.path.join(path, "bm25_state")
    tmp = base + "__tmp"
    old = base + "__old"
    shutil.rmtree(tmp, ignore_errors=True)
    write_fn(tmp)
    marker = os.path.join(base, "_last_batch")
    if batch_id is not None:
        with open(os.path.join(tmp, "_last_batch"), "w") as fh:
            fh.write(str(int(batch_id)))
    elif os.path.exists(marker):
        shutil.copy(marker, os.path.join(tmp, "_last_batch"))
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(base):
        os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old, ignore_errors=True)


def _bm25_last_batch(path: str) -> int | None:
    """The bm25_state ``_last_batch`` replay marker (with the __old
    crash-window fallback): Structured Streaming replays a crashed
    batch under the SAME batch_id, so ``batch_id <= marker`` means the
    state already merged this batch — merging again would double-add
    n_docs/sum_dl/df."""
    import os

    for base in (os.path.join(path, "bm25_state"),
                 os.path.join(path, "bm25_state__old")):
        f = os.path.join(base, "_last_batch")
        if os.path.exists(f):
            with open(f) as fh:
                return int(fh.read().strip())
    return None


def merge_sparse_append(delta_docs: DataFrame, path: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        batch_id: int | None = None) -> None:
    """APPEND-path sparse maintenance (VERDICT r6 item 7; reference
    incremental-sync semantics bm25_sparse_indexer.py:545-591): instead
    of re-scanning the corpus, delta-merge the MERGEABLE stats state —

      {path}/bm25_state/corpus  (n_docs, sum_dl)   one row
      {path}/bm25_state/terms   (term, df)         vocab-sized

    — with the new batch (bm25.merge_corpus_state/merge_term_state),
    re-derive the terms table from the merged state (vocab-sized work:
    idf + deterministic term ids, never a corpus scan), overwrite
    {path}/terms, and APPEND the batch's postings computed against the
    refreshed stats.

    Exactness contract: terms/ (df, N, avgdl, idf — everything query
    encoding reads) equals a full recompute over the union after every
    merge (test-pinned: merge == recompute). Previously-written
    postings keep the weights of THEIR index time — avgdl/idf drift
    makes old doc weights slightly stale until the next full
    build_sparse, exactly the trade the reference's periodic re-sync
    makes (incremental_index docstring). Only valid for NEW doc ids;
    updates must route through the exact rebuild.
    """
    spark = delta_docs.sparkSession
    if batch_id is not None:
        last = _bm25_last_batch(path)
        if last is not None and batch_id <= last:
            return  # checkpoint replay of an already-merged batch
    tok = cache(bm25.tokenize(delta_docs, id_col=id_col, text_col=text_col))
    old_c = _bm25_state_read(spark, path, "corpus")
    old_t = _bm25_state_read(spark, path, "terms")
    if old_c is not None and old_t is not None:
        new_c = bm25.merge_corpus_state(old_c, tok)
        new_t = bm25.merge_term_state(old_t, tok)
    else:  # genuinely first batch: neither state location exists
        new_c = bm25.corpus_state(tok)
        new_t = bm25.term_state(tok)
    # localCheckpoint before the swap: the merged plans read the very
    # files being replaced; cutting lineage materializes them first.
    # The two merges are independent aggregations over the shared
    # cached tok — overlap their materialization (§2.6).
    merged_c, merged_t = new_c, new_t
    new_c, new_t = concurrently(
        lambda: checkpoint(merged_c), lambda: checkpoint(merged_t))

    def _write_state(tmp: str) -> None:
        concurrently(
            lambda: new_c.write.mode("overwrite").parquet(f"{tmp}/corpus"),
            lambda: new_t.write.mode("overwrite").parquet(f"{tmp}/terms"),
        )

    # postings + terms are written BEFORE the state swap: the swap
    # publishes the _last_batch replay marker, so it must be the SINGLE
    # COMMIT POINT. The old order (swap, then terms/postings) had a
    # crash window where the marker fenced the replay (batch_id <=
    # marker → no-op) while the batch's postings were never written —
    # n_docs/df counted docs that were permanently unsearchable on the
    # sparse path. Every pre-swap write is idempotent under replay:
    # the merged state is recomputed deterministically from the same
    # (old state, delta) inputs, terms is a plain overwrite, and the
    # postings append goes through _replace_batch_postings (leftover
    # files from a crashed attempt are removed before the re-append).
    stats = bm25.stats_from_state(new_c)
    terms = checkpoint(bm25.term_stats_from_state(new_t, stats))
    # term_id dropped from the persisted rows (see build_sparse): the
    # grown vocabulary re-ranks ids, so a stored id column would mix
    # id spaces between this batch and earlier generations
    post = bm25.postings(tok, terms, stats).drop("term_id")

    def _write_postings() -> None:
        if batch_id is None:
            # non-streaming caller: no replay semantics, plain append
            post.write.mode("append").parquet(f"{path}/postings")
        else:
            _replace_batch_postings(post, path, batch_id)

    # postings + terms are both idempotent pre-swap writes to disjoint
    # paths (terms reads only the checkpointed state) — overlap them
    # (§2.6); the state swap stays strictly AFTER both, outside the
    # pool, because it publishes the _last_batch marker and must remain
    # the single commit point (see the ordering comment above).
    concurrently(
        _write_postings,
        lambda: terms.write.mode("overwrite").parquet(f"{path}/terms"),
    )
    _bm25_state_swap(path, _write_state, batch_id=batch_id)
    tok.unpersist()


def _replace_batch_postings(post: DataFrame, path: str, batch_id: int) -> None:
    """Idempotent, replay-safe postings append for one streaming batch:
    stage the batch's part files, remove any files a crashed earlier
    attempt left for the SAME batch (batch-prefixed names make them
    identifiable), then move the staged files in. Re-running a batch
    converges to exactly one copy of its rows, which is what lets the
    _last_batch marker swap act as the single commit point. Local-FS
    rename semantics; an object-store deployment would write to a
    per-batch key prefix and commit via a manifest instead."""
    import glob
    import os
    import shutil

    staging = f"{path}/postings__batch_{int(batch_id)}_staging"
    shutil.rmtree(staging, ignore_errors=True)
    post.write.mode("overwrite").parquet(staging)
    dest = f"{path}/postings"
    os.makedirs(dest, exist_ok=True)
    prefix = f"batch{int(batch_id)}-"
    for leftover in glob.glob(os.path.join(dest, prefix + "*")):
        os.remove(leftover)
    for f in sorted(glob.glob(os.path.join(staging, "*.parquet"))):
        os.rename(f, os.path.join(dest, prefix + os.path.basename(f)))
    shutil.rmtree(staging, ignore_errors=True)


def merge_dense_append(delta_docs: DataFrame, path: str,
                       id_col: str = "doc_id", text_col: str = "text",
                       payload_cols: tuple[str, ...] = ()) -> None:
    """APPEND-path dense maintenance — the flat ``{path}/dense`` table
    is append-only for NEW doc ids (embeddings are per-doc, no corpus
    statistics to drift, unlike the sparse side), so the delta batch
    just writes its rows; deletes route through delete_from_index's
    anti-join rewrite. Together with merge_sparse_append this is the
    full incremental sync step for the flat-index layout (the IVF
    layout's equivalent is ivf_append). Only valid for NEW ids —
    updates must route through the exact rebuild, same contract as the
    sparse append."""
    delta_docs.select(
        F.col(id_col).alias("doc_id"),
        mock_embedding(text_col).alias("embedding"),
        *payload_cols,
    ).write.mode("append").parquet(f"{path}/dense")


def build_index(docs: DataFrame, path: str,
                id_col: str = "doc_id", text_col: str = "text",
                payload_cols: tuple[str, ...] = ()) -> None:
    """Materialize the search index under ``path``: terms/, postings/,
    dense/ parquet tables. ``payload_cols`` are carried into the dense
    table so payload-filtered serving (dense_serve_filtered) can push
    its predicate into the parquet scan instead of joining the catalog
    per query — the reference's Qdrant payload-index trade
    (models.py:419-472 payload, dense_search.py:88-98 filters)."""
    # the sparse build and the dense write are independent passes over
    # ``docs`` writing disjoint artifact dirs — overlap them (§2.6)
    concurrently(
        lambda: build_sparse(docs, path, id_col=id_col, text_col=text_col),
        lambda: docs.select(
            F.col(id_col).alias("doc_id"),
            mock_embedding(text_col).alias("embedding"),
            *payload_cols,
        ).write.mode("overwrite").parquet(f"{path}/dense"),
    )


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
    return _rrf_union_fuse(dscored, sscored, k, search_k)


def _rrf_union_fuse(dscored: DataFrame, sscored: DataFrame,
                    k: int, search_k: int) -> DataFrame:
    """Single-exchange RRF fusion of two raw score tables (see
    hybrid_serve docstring): union with a branch tag, one window per
    (query, branch), groupBy pivot — row-identical to ranking each
    branch and full-outer-joining, at 3 exchanges fewer."""
    from pyspark.sql import Window

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
                    payload_cols: tuple[str, ...] = (),
                    train_sample_mod: int | None = None) -> None:
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
    # train_sample_mod: codebook trains on the deterministic hash
    # sample (similarity.train_sample) — the 100 TB practice; the FULL
    # corpus is still assigned and written below under the frozen result
    cent_rows = ivf_centroids(emb, n_centroids, "doc_id", "embedding",
                              train_sample_mod=train_sample_mod)
    if refine_iters:
        cent_rows = ivf_refine(emb, cent_rows, iters=refine_iters,
                               id_col="doc_id", vec_col="embedding",
                               train_sample_mod=train_sample_mod)
    spark = docs.sparkSession
    codebook = F.broadcast(_codebook_df(spark, cent_rows))
    # NO spread before the partitionBy write (r14, measured): a spread
    # multiplies the per-cell file count by the partition count (the
    # guide §6 small-files trap measured on write_ivfpq_index) and the
    # embed+assign map is not compute-bound locally
    assigned = emb.crossJoin(codebook).withColumn(
        "centroid_id", -F.array_max(_nearest_centroids("embedding"))["negcid"]
    ).drop("cents")
    # the cell-partitioned table and the tiny codebook sidecar are
    # independent writes — overlap them (§2.6)
    concurrently(
        lambda: assigned.write.mode("overwrite").partitionBy("centroid_id")
                        .parquet(f"{path}/dense_ivf"),
        lambda: spark.createDataFrame(
            [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in cent_rows],
            "cid bigint, cv array<double>",
        ).write.mode("overwrite").parquet(f"{path}/codebook"),
    )


def ivf_append(spark: SparkSession, path: str, new_docs: DataFrame,
               id_col: str = "doc_id", text_col: str = "text",
               payload_cols: tuple[str, ...] = ()) -> None:
    """Add vectors to a persisted IVF index WITHOUT retraining — the
    FAISS train-vs-add split (IndexIVF.add assigns against the frozen
    quantizer; reference continuous sync models.py:291-294 needs
    exactly this so a delta batch never re-reads the corpus): load the
    sidecar codebook, assign the new docs' embeddings with the SAME
    argmax expression build_dense_ivf used, and dynamic-partition
    APPEND into the existing centroid_id directories.

    Serving needs no change: dense_serve_ivf probes the same cells and
    partition pruning keeps working because appends land under the
    cells' directories. Equality contract (test-pinned): an appended
    index serves bit-identically to a one-shot build over base ∪ delta
    with the same frozen codebook. Cell balance degrades as the data
    distribution drifts from the training sample — the standard IVF
    operational trade; retrain on a cadence (blue/green swap,
    maintenance.bluegreen) to re-level.

    Scale: delta-sized work only — one broadcast-codebook map over the
    new rows + an append write; no shuffle of existing index data.
    """
    from semantik_spark.operators.similarity import (
        _codebook_df, _nearest_centroids,
    )

    cent_rows = [
        (int(r["cid"]), list(r["cv"]))
        for r in spark.read.parquet(f"{path}/codebook").collect()
    ]
    codebook = F.broadcast(_codebook_df(spark, [
        {"cid": cid, "cv": cv} for cid, cv in sorted(cent_rows)
    ]))
    emb = new_docs.select(
        F.col(id_col).alias("doc_id"),
        mock_embedding(text_col).cast("array<double>").alias("embedding"),
        *payload_cols,
    )
    assigned = emb.crossJoin(codebook).withColumn(
        "centroid_id", -F.array_max(_nearest_centroids("embedding"))["negcid"]
    ).drop("cents")
    assigned.write.mode("append").partitionBy("centroid_id") \
        .parquet(f"{path}/dense_ivf")


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


#: driver-side codebook cache keyed by (dir, mtime) — a serving process
#: holds the n_centroids x dim floats in memory; re-reading the parquet
#: per request paid a full Spark job (~0.2-0.4 s locally) for data that
#: only changes on retrain (overwrite recreates the dir, so the mtime
#: key invalidates exactly then; ivf_append never touches the codebook)
_CODEBOOK_CACHE: dict[str, tuple[float, list]] = {}


def _load_codebook(spark: SparkSession, path: str) -> list:
    import os

    d = f"{path}/codebook"
    try:
        mtime = os.path.getmtime(d)
    except OSError:
        mtime = -1.0
    hit = _CODEBOOK_CACHE.get(d)
    if hit is not None and hit[0] == mtime:
        return hit[1]
    rows = sorted(
        ((int(r["cid"]), [float(x) for x in r["cv"]])
         for r in spark.read.parquet(d).collect()),
        key=lambda t: t[0],
    )
    _CODEBOOK_CACHE[d] = (mtime, rows)
    return rows


def _plan_text_probes(spark: SparkSession, queries: DataFrame,
                      cent_rows: list, nprobe: int,
                      query_id_col: str = "query_id",
                      query_text_col: str = "query_text"):
    """Driver-side probe planning shared by dense_serve_ivf and
    hybrid_serve_approx: embed each query with the bit-identical
    Python twin, rank codebook cells, and build the probes table as
    literals — ONE Spark job per serve. The query-id column keeps the
    CALLER'S type (derived from the queries schema, the ivfpq_serve
    recipe) — a hardcoded string type rejected integer-keyed query
    batches on these two paths only. Returns (probes_df, probed_cells)."""
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    probe_rows = []
    for r in queries.select(F.col(query_id_col).alias("query_id"),
                            F.col(query_text_col).alias("query_text")).collect():
        qv = _mock_embedding_py(str(r["query_text"]))
        ranked = sorted(((_cosine_py(qv, cv), -cid) for cid, cv in cent_rows),
                        reverse=True)[:nprobe]
        probe_rows += [(r["query_id"], qv, -negcid) for _, negcid in ranked]
    probes = spark.createDataFrame(
        probe_rows,
        f"query_id {qid_type}, qv array<double>, centroid_id bigint")
    return probes, sorted({cid for _, _, cid in probe_rows})


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

    cent_rows = _load_codebook(spark, path)
    probes, probed_cells = _plan_text_probes(
        spark, queries, cent_rows, nprobe, query_id_col, query_text_col)
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


def write_ivfpq_index(corpus: DataFrame, path: str, dim: int = 64,
                      n_centroids: int = 16, m: int = 8,
                      pq_centroids: int = 16, refine_iters: int = 1,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      train_sample_mod: int | None = None) -> None:
    """Persist the IVFADC serving layout (VERDICT r6 item 5 — the
    FAISS IndexIVFPQ on-disk shape, reference two-phase fetch
    vecpipe/search/dense_search.py):

      {path}/ivfpq_codes     (vec_id, codes ARRAY<INT>) partitioned by
                             centroid_id — m positional PQ codes per
                             vector, the ADC-scannable index (m bytes'
                             worth of information per vector; stored as
                             parquet INT32 which dictionary+RLE encodes
                             to ~1 byte at pq_centroids ≤ 256)
      {path}/ivfpq_full      (vec_id, v) full-precision vectors for the
                             exact rescore (late materialization)
      {path}/ivfpq_codebook  coarse (cid, cv)
      {path}/ivfpq_pq        (s, pos, cid, cv) — per-subspace centroid
                             sub-vectors, position == cid rank

    Training and encoding reuse the exact knn_ivfpq kernels
    (similarity.ivf_centroids/ivf_refine/pq_codebooks and the same
    argmin tie-breaks), so ivfpq_serve over this layout returns
    bit-identical rows to the in-one-run similarity.knn_ivfpq —
    equality is test-pinned (tests/test_serving.py).

    100 TB shape: both codebooks are corpus-size-independent; encode is
    one broadcast-codebook map over the scan; the codes table is the
    only per-vector state the ADC scan touches (dim/8 of the raw
    bytes at m=8,dim=64 float64), partition-pruned to probed cells.
    """
    from semantik_spark.functions.caching import cache
    from semantik_spark.operators.similarity import (
        _codebook_df, _l2, _pq_codebook_df, ivf_centroids, ivf_refine,
        pq_codebooks,
    )
    from semantik_spark.functions.vectors import cosine

    d = dim // m
    spark = corpus.sparkSession
    # train_sample_mod: both codebooks (coarse + PQ) train on the
    # deterministic hash sample; the full corpus is encoded below under
    # the frozen result (similarity.train_sample docstring)
    cent_rows = ivf_centroids(corpus, n_centroids, id_col, vec_col,
                              train_sample_mod=train_sample_mod)
    if refine_iters:
        cent_rows = ivf_refine(corpus, cent_rows, iters=refine_iters,
                               id_col=id_col, vec_col=vec_col,
                               train_sample_mod=train_sample_mod)
    codebook = F.broadcast(_codebook_df(spark, cent_rows))
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    # NO spread of the encode/write path (r14, measured): spreading it
    # wrote ~500 small files into ivfpq_codes (32 partitions ×
    # partitionBy(cell) — the guide §6 small-files trap) and
    # knn_ivfpq_serve regressed 8.4 → 20.9 s median. At production
    # partition counts the repartition is a no-op anyway; the training
    # sums' scale safety is the order-margin audit's proof.
    # coarse assign + residual in one pass — same expression as
    # similarity.knn_ivfpq so the stored cell is the one it would pick
    best = F.array_max(F.transform(
        F.col("cents"),
        lambda ct: F.struct(
            cosine(F.col("v"), ct["cv"]).alias("cos"),
            (-ct["cid"]).alias("negcid"),
            ct["cv"].alias("cv"),
        ),
    ))
    assigned = c.crossJoin(codebook).select(
        "vec_id", "v",
        (-best["negcid"]).alias("centroid_id"),
        F.zip_with("v", best["cv"], lambda a, b: a - b).alias("residual"),
    )
    assigned = cache(assigned)
    book = pq_codebooks(assigned, dim=dim, m=m, n_centroids=pq_centroids,
                        refine_iters=refine_iters,
                        id_col="vec_id", vec_col="residual",
                        train_sample_mod=train_sample_mod)
    cb = F.broadcast(_pq_codebook_df(spark, book, m))

    # positional code per subspace: the codebook lists are cid-ordered,
    # so argmin over (dist, position) == knn_ivfpq's (dist, cid)
    def code_at(s: int) -> F.Column:
        cands = F.element_at(F.col("cents"), s + 1)
        return F.array_min(F.transform(
            cands,
            lambda ct, i: F.struct(
                _l2(F.slice(F.col("residual"), s * d + 1, d), ct["cv"]).alias("dist"),
                i.alias("pos"),
            ),
        ))["pos"].cast("int")

    codes = assigned.crossJoin(cb).select(
        "vec_id", "centroid_id",
        F.array(*[code_at(s) for s in range(m)]).alias("codes"),
    )
    by_s: dict[int, list] = {}
    for b in book:
        by_s.setdefault(int(b["s"]), []).append((int(b["cid"]), b["cv"]))
    pq_rows = []
    for s, lst in sorted(by_s.items()):
        for pos, (cid, cv) in enumerate(sorted(lst, key=lambda t: t[0])):
            pq_rows.append((s, pos, cid, [float(x) for x in cv]))
    # the four artifacts are independent (codes reads the cached
    # assignment, full the raw scan, both codebooks are driver-local) —
    # overlap the writes (guide §2.6): the full-precision write
    # back-fills the codes write's encode tail
    concurrently(
        lambda: codes.write.mode("overwrite").partitionBy("centroid_id")
                     .parquet(f"{path}/ivfpq_codes"),
        lambda: c.select("vec_id", "v").write.mode("overwrite")
                 .parquet(f"{path}/ivfpq_full"),
        lambda: spark.createDataFrame(
            [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in cent_rows],
            "cid bigint, cv array<double>",
        ).write.mode("overwrite").parquet(f"{path}/ivfpq_codebook"),
        lambda: spark.createDataFrame(
            pq_rows, "s int, pos int, cid bigint, cv array<double>"
        ).write.mode("overwrite").parquet(f"{path}/ivfpq_pq"),
    )


def ivfpq_serve(spark: SparkSession, path: str, queries: DataFrame,
                k: int = 5, nprobe: int = 4, rescore_k: int = 20,
                query_id_col: str = "query_id",
                query_vec_col: str = "query_vec") -> DataFrame:
    """Serve top-k from the persisted IVFADC layout — the reference's
    two-phase fetch (vecpipe/search/dense_search.py: candidate scan,
    then full-precision hydrate):

      phase 1  probe planning ON THE DRIVER (query batch + coarse
               codebook are driver-scale): nprobe cells per query by
               the bit-exact cosine twin; the probed-cell isin is a
               STATIC predicate, so the codes scan partition-prunes to
               nprobe/n_centroids of the index (PartitionFilters —
               asserted in tests/test_plans.py). ADC scores
               cos(qv, ccv + recon(codes)) against the broadcast PQ
               codebook; top rescore_k ids per query are collected
               (bounded: nq × rescore_k rows).
      phase 2  exact rescore: the candidate ids become an isin
               pushdown on the full-precision table — parquet
               row-group min/max skipping, reading only the survivors'
               neighborhoods, never the corpus.

    Row-identical to similarity.knn_ivfpq at equal parameters
    (test-pinned)."""
    from semantik_spark.functions.vectors import cosine
    from pyspark.sql import Window

    cent_rows = sorted(
        ((int(r["cid"]), [float(x) for x in r["cv"]])
         for r in spark.read.parquet(f"{path}/ivfpq_codebook").collect()),
        key=lambda t: t[0],
    )
    pq = spark.read.parquet(f"{path}/ivfpq_pq").collect()
    m = 1 + max(int(r["s"]) for r in pq)
    by_s: list[list] = [[] for _ in range(m)]
    for r in pq:
        by_s[int(r["s"])].append((int(r["pos"]), int(r["cid"]),
                                  [float(x) for x in r["cv"]]))
    for lst in by_s:
        lst.sort(key=lambda t: t[0])
    cents_data = [[(cid, cv) for _, cid, cv in lst] for lst in by_s]

    q_rows = queries.select(F.col(query_id_col).alias("query_id"),
                            F.col(query_vec_col).alias("qv")).collect()
    probe_rows = []
    for r in q_rows:
        qv = [float(x) for x in r["qv"]]
        ranked = sorted(((_cosine_py(qv, cv), -cid) for cid, cv in cent_rows),
                        reverse=True)[:nprobe]
        cvs = dict(cent_rows)
        probe_rows += [(r["query_id"], qv, -negcid, cvs[-negcid])
                       for _, negcid in ranked]
    probes = spark.createDataFrame(
        probe_rows,
        f"query_id {queries.schema[query_id_col].dataType.simpleString()}, "
        "qv array<double>, centroid_id bigint, ccv array<double>",
    )
    probed_cells = sorted({cid for _, _, cid, _ in probe_rows})

    # phase 1: ADC over probed cells only (partition pruning on the
    # directory layout); recon travels as DATA via the one-row
    # broadcast codebook (literal inlining blows codegen at real sizes)
    pq_cb = F.broadcast(spark.createDataFrame(
        [(cents_data,)], "cents array<array<struct<cid:bigint,cv:array<double>>>>"
    ))
    index = spark.read.parquet(f"{path}/ivfpq_codes").where(
        F.col("centroid_id").isin(probed_cells)
    )
    recon = F.flatten(F.array(*[
        F.element_at(F.element_at(F.col("cents"), s + 1),
                     F.element_at(F.col("codes"), s + 1) + 1)["cv"]
        for s in range(m)
    ]))
    approx = (
        index.crossJoin(pq_cb)
        .join(F.broadcast(probes), "centroid_id")
        .select("query_id", "vec_id",
                cosine(F.zip_with("ccv", recon, lambda a, b: a + b),
                       F.col("qv")).alias("acos"))
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("acos"), F.asc("vec_id"))
    cand_rows = (
        approx.withColumn("arank", F.row_number().over(w1))
        .where(F.col("arank") <= rescore_k)
        .select("query_id", "vec_id")
        .collect()
    )

    # phase 2: exact rescore with the candidate ids PUSHED into the
    # full-precision scan (row-group skipping), qv rejoined broadcast
    cand_ids = sorted({int(r["vec_id"]) for r in cand_rows})
    cand = spark.createDataFrame(
        [(r["query_id"], int(r["vec_id"])) for r in cand_rows],
        f"query_id {queries.schema[query_id_col].dataType.simpleString()}, "
        "vec_id bigint",
    )
    qdf = spark.createDataFrame(
        [(r["query_id"], [float(x) for x in r["qv"]]) for r in q_rows],
        f"query_id {queries.schema[query_id_col].dataType.simpleString()}, "
        "qv array<double>",
    )
    full = spark.read.parquet(f"{path}/ivfpq_full").where(
        F.col("vec_id").isin(cand_ids)
    )
    exact = (
        F.broadcast(cand).join(full, "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", "vec_id", cosine("v", "qv").alias("cos"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return exact.withColumn("rank", F.row_number().over(w2)).where(F.col("rank") <= k)


def build_sparse_pruned(spark: SparkSession, path: str, keep: int = 64) -> None:
    """Derive the statically pruned postings table (bm25.pruned_postings,
    Carmel et al. 2001) from the already-persisted postings — one window
    on term at index-build time, written beside the exact table so the
    serve path can choose exact or approximate per request."""
    post = spark.read.parquet(f"{path}/postings")
    bm25.pruned_postings(post, keep=keep).write.mode("overwrite") \
        .parquet(f"{path}/postings_pruned")


def hybrid_serve_approx(spark: SparkSession, path: str, queries: DataFrame,
                        k: int = 10, search_k: int | None = None,
                        nprobe: int = 4) -> DataFrame:
    """The APPROXIMATE hybrid serve: IVF-probed dense branch (reads
    nprobe/n_centroids of the dense index via partition pruning,
    driver-planned probes) RRF-fused with the impact-pruned sparse
    branch (per-term postings capped at index time) — both branches'
    scan cost bounded independently of corpus/term size, the same
    single-exchange fusion as hybrid_serve.

    Recall trade is the product of the branch trades (IVF nprobe sweep
    + pruning keep); with nprobe = n_centroids and keep >= corpus the
    result equals hybrid_serve exactly (test-pinned). Requires
    build_dense_ivf and build_sparse_pruned artifacts beside the exact
    index."""
    if search_k is None:
        search_k = max(k * 2, 20)
    from semantik_spark.functions.vectors import cosine

    cent_rows = _load_codebook(spark, path)
    probes, probed_cells = _plan_text_probes(spark, queries, cent_rows, nprobe)
    index = spark.read.parquet(f"{path}/dense_ivf").where(
        F.col("centroid_id").isin(probed_cells)
    )
    dscored = index.join(F.broadcast(probes), "centroid_id").select(
        "query_id", "doc_id", cosine("embedding", "qv").alias("score")
    )
    terms = spark.read.parquet(f"{path}/terms")
    post = spark.read.parquet(f"{path}/postings_pruned")
    sscored = bm25.score(post, bm25.encode_queries(queries, terms))
    return _rrf_union_fuse(dscored, sscored, k, search_k)


def delete_from_index(spark: SparkSession, path: str, deleted_docs: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text") -> None:
    """GDPR-grade deletion propagated through EVERY index artifact —
    the right-to-erasure path a lakehouse search index needs (reference
    deletes collections/documents through its DB cascade; here the
    cascade is explicit because the artifacts are separate tables):

      dense/ postings/  rows for the ids removed (anti-join rewrite)
      dense_ivf/ postings_pruned/ ivfpq_codes/ ivfpq_full/ dense_log/
                        same rewrite for every OPTIONAL artifact that
                        exists under the root (partitioned layouts
                        keep their partitioning) — the approximate and
                        streaming serve paths must stop returning the
                        erased doc too
      terms/            rebuilt EXACTLY from the retracted mergeable
                        state — df decremented per deleted doc, terms
                        hitting df=0 leave the vocabulary, n_docs/avgdl
                        shrink (test-pinned: equals a recompute over
                        the remaining corpus)
      tombstones/       (doc_id) append-only audit of what was erased
                        — ids only, no content (the content is the
                        thing being erased)

    ``deleted_docs`` carries (id, text) — the catalog rows being
    purged: exact df retraction needs the deleted docs' term sets, and
    a deletion request always has the catalog row in hand. The cascade
    is IDEMPOTENT: ids are first restricted to docs actually present
    and not already tombstoned, so a retried deletion job (the normal
    case for an erasure pipeline) cannot double-decrement the
    mergeable state. Remaining
    postings keep their index-time weights until the next full
    build_sparse — the same measured staleness trade as the append
    path (merge_sparse_append docstring).

    Scale: delete-batch-sized tokenize + vocab-sized state merge + two
    anti-join rewrites of the artifact tables. The rewrites are the
    unavoidable cost of physical erasure (a filter view would retain
    the bytes); at 100 TB they run partition-restricted if the tables
    are partitioned by id range.
    """
    import os

    ids = deleted_docs.select(F.col(id_col).alias("_del_id")).distinct()
    # IDEMPOTENCE GUARD: the state retraction is only valid for docs
    # present exactly once (bm25.retract_* contract) — a retried
    # deletion job or a request naming never-indexed ids would
    # double-decrement n_docs/df and silently corrupt idf/avgdl. Live
    # ids = present in the index AND not already tombstoned.
    # presence authority = the UNION of doc ids across postings, dense,
    # and the streaming dense log (whichever exist). Postings alone is
    # not enough: a doc whose text yields zero BM25 tokens (NULL/empty
    # text, all sub-length tokens) has NO postings rows while still
    # being servable from dense/dense_log and counted in corpus n_docs
    # (tokenize keeps it with an empty token array) — postings-only
    # presence silently filtered its deletion request out, so physical
    # erasure failed for exactly the failed-extraction docs most likely
    # to be purged. Zero-token docs retract cleanly (n_docs−1, sum_dl−0).
    live_parts = []
    for live_sub in ("postings", "dense", "dense_log"):
        lp = f"{path}/{live_sub}"
        if os.path.exists(lp):
            live_parts.append(spark.read.parquet(lp)
                              .select(F.col("doc_id").alias("_del_id")))
    if not live_parts:  # no artifact exists: same failure as before
        live_parts.append(spark.read.parquet(f"{path}/dense")
                          .select(F.col("doc_id").alias("_del_id")))
    live = live_parts[0]
    for lp_df in live_parts[1:]:
        live = live.unionByName(lp_df)
    ids = ids.join(live.distinct(), "_del_id", "left_semi")
    if os.path.exists(f"{path}/tombstones"):
        tombs = spark.read.parquet(f"{path}/tombstones") \
            .select(F.col("doc_id").alias("_del_id"))
        ids = ids.join(tombs, "_del_id", "left_anti")
    ids = checkpoint(ids)
    live_deleted = deleted_docs.join(
        ids, deleted_docs[id_col] == F.col("_del_id"), "left_semi")
    tok = cache(bm25.tokenize(live_deleted, id_col=id_col, text_col=text_col))
    # the two retractions are independent aggregations over the shared
    # cached tok — overlap their materialization (guide §2.6)
    new_c, new_t = concurrently(
        lambda: checkpoint(bm25.retract_corpus_state(
            _bm25_state_read(spark, path, "corpus"), tok)),
        lambda: checkpoint(bm25.retract_term_state(
            _bm25_state_read(spark, path, "terms"), tok)),
    )

    def _write_state(tmp: str) -> None:
        concurrently(
            lambda: new_c.write.mode("overwrite").parquet(f"{tmp}/corpus"),
            lambda: new_t.write.mode("overwrite").parquet(f"{tmp}/terms"),
        )

    def _rebuild_terms() -> None:
        # reads only the CHECKPOINTED retracted state, never the files
        # the swap replaces — independent of the swap and the rewrites
        terms = checkpoint(bm25.term_stats_from_state(
            new_t, bm25.stats_from_state(new_c)))
        terms.write.mode("overwrite").parquet(f"{path}/terms")

    # the cascade reaches EVERY artifact that exists under the index
    # root — the flat tables, the partitioned ANN layouts, the pruned
    # postings, and the streaming dense log — not just dense/postings:
    # an erased doc must stop being servable from the approximate and
    # streaming paths too, or physical erasure silently fails there
    artifacts = (
        ("postings", None), ("dense", None),
        ("dense_ivf", "centroid_id"), ("postings_pruned", None),
        ("ivfpq_codes", "centroid_id"), ("ivfpq_full", None),
        ("dense_log", None),
    )

    def _rewrite(sub: str, part: str | None):
        def run() -> None:
            p = f"{path}/{sub}"
            tbl = spark.read.parquet(p)
            key = "doc_id" if "doc_id" in tbl.columns else "vec_id"
            # checkpoint materializes the anti-join BEFORE the write
            # overwrites the very files it reads (self-overwrite)
            kept = checkpoint(tbl.join(
                ids, F.col(key) == F.col("_del_id"), "left_anti"
            ))
            w = kept.write.mode("overwrite")
            if part is not None and part in kept.columns:
                w = w.partitionBy(part)
            w.parquet(p)
        return run

    # state swap, terms rebuild and the per-artifact rewrites are
    # mutually independent (disjoint paths; every input they share —
    # ids, new_c, new_t — is already checkpointed), so overlap them
    # (§2.6). The tombstones append stays strictly LAST, outside the
    # pool: it is the idempotence fence — a retried cascade filters ids
    # through the tombstones, so they may only record docs whose
    # rewrites all completed.
    concurrently(
        lambda: _bm25_state_swap(path, _write_state),
        _rebuild_terms,
        *[_rewrite(sub, part) for sub, part in artifacts
          if os.path.exists(f"{path}/{sub}")],
    )
    ids.select(F.col("_del_id").alias("doc_id")).write.mode("append") \
        .parquet(f"{path}/tombstones")
    tok.unpersist()
