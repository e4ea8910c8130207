"""Build/serve split: serving against the persisted index must return
exactly what the build-and-query-in-one-run operators return."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantik_spark.operators import bm25, search, serving

QUERIES = [("q1", "stream merge"), ("q2", "filter token")]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(120).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("token stream merge filter scan doc "), F.col("id"),
            F.lit(" with shared vocabulary terms"),
        ).alias("text"),
    )


@pytest.fixture(scope="module")
def index_path(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("serve") / "index")
    serving.build_index(corpus, path)
    return path


def _rows(df, cols=("query_id", "doc_id", "rank")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_bm25_serve_matches_inline_search(spark, corpus, index_path):
    qdf = spark.createDataFrame(QUERIES, ["query_id", "query_text"])
    inline = bm25.search(corpus, qdf, k=10)
    served = serving.bm25_serve(spark, index_path, qdf, k=10)
    assert _rows(served) == _rows(inline)


def test_dense_serve_matches_inline_search(spark, corpus, index_path):
    qdf = spark.createDataFrame(QUERIES, ["query_id", "query_text"])
    inline = search.mock_dense_search(corpus, qdf, k=10)
    served = serving.dense_serve(spark, index_path, qdf, k=10)
    assert _rows(served) == _rows(inline)


def test_hybrid_serve_matches_inline_search(spark, corpus, index_path):
    qdf = spark.createDataFrame(QUERIES, ["query_id", "query_text"])
    inline = search.hybrid_search(corpus, qdf, k=10, search_k=20)
    served = serving.hybrid_serve(spark, index_path, qdf, k=10, search_k=20)
    assert _rows(served) == _rows(inline)


def test_serve_reads_prune_columns(spark, index_path):
    """The dense serve scan must read only (doc_id, embedding) — column
    pruning reaching the parquet scan is what makes late
    materialization real at 100 TB."""
    qdf = spark.createDataFrame(QUERIES, ["query_id", "query_text"])
    plan = serving.dense_serve(spark, index_path, qdf, k=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # broadcast query side


def test_dense_serve_ivf_full_probe_equals_exact(spark, tmp_path):
    """nprobe == n_centroids → every cell read → identical to the
    exact dense_serve ranking."""
    from semantik_spark.operators.serving import (
        build_dense_ivf, build_index, dense_serve, dense_serve_ivf,
    )

    docs = spark.createDataFrame(
        [(i, f"document about topic {i % 7} item {i}") for i in range(80)],
        ["doc_id", "text"])
    qdf = spark.createDataFrame(
        [("q1", "topic 3 item"), ("q2", "document about")],
        ["query_id", "query_text"])
    idx = str(tmp_path / "idx")
    build_index(docs, idx)
    build_dense_ivf(docs, idx, n_centroids=8)
    exact = sorted((r["query_id"], r["rank"], r["doc_id"])
                   for r in dense_serve(spark, idx, qdf, k=5).collect())
    ivf = sorted((r["query_id"], r["rank"], r["doc_id"])
                 for r in dense_serve_ivf(spark, idx, qdf, k=5, nprobe=8).collect())
    assert ivf == exact

    # partial probe: a subset with TRUE cosine scores (never invented)
    escore = {(r["query_id"], r["doc_id"]): r["score"]
              for r in dense_serve(spark, idx, qdf, k=80).collect()}
    part = dense_serve_ivf(spark, idx, qdf, k=5, nprobe=2).collect()
    assert 0 < len(part) <= 10
    for r in part:
        assert abs(escore[(r["query_id"], r["doc_id"])] - r["score"]) < 1e-9


def test_dense_serve_filtered_pushes_predicate(spark, tmp_path):
    """Payload-filtered dense serving: the predicate must reach the
    parquet scan as a pushed filter (pre-ranking), and ranking must run
    on the filtered subset so k is filled from eligible docs only."""
    from semantik_spark.operators.serving import build_index, dense_serve_filtered

    docs = spark.range(60).selectExpr(
        "id as doc_id",
        "concat('alpha beta doc ', id) as text",
        "case when id % 3 = 0 then 'en' else 'de' end as lang",
    )
    idx = str(tmp_path / "idx")
    build_index(docs, idx, payload_cols=("lang",))
    qs = spark.createDataFrame([("q1", "alpha beta")], ["query_id", "query_text"])
    hits = dense_serve_filtered(spark, idx, qs, predicate={"lang": "en"}, k=5)
    rows = hits.collect()
    assert len(rows) == 5
    assert all(r["doc_id"] % 3 == 0 for r in rows)  # only eligible docs ranked
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_dense_serve_ivf_filtered_composes_pruning(spark, tmp_path):
    """Filtered IVF serving: partition pruning on probed cells AND the
    payload predicate pushdown must compose on one scan."""
    from semantik_spark.operators.serving import build_dense_ivf, dense_serve_ivf

    docs = spark.range(60).selectExpr(
        "id as doc_id",
        "concat('alpha beta doc ', id) as text",
        "case when id % 3 = 0 then 'en' else 'de' end as lang",
    )
    idx = str(tmp_path / "ivf")
    build_dense_ivf(docs, idx, n_centroids=4, payload_cols=("lang",))
    qs = spark.createDataFrame([("q1", "alpha beta")], ["query_id", "query_text"])
    hits = dense_serve_ivf(spark, idx, qs, k=3, nprobe=2, predicate={"lang": "en"})
    rows = hits.collect()
    assert 1 <= len(rows) <= 3
    assert all(r["doc_id"] % 3 == 0 for r in rows)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "PartitionFilters: [centroid_id" in plan


def test_ivfpq_serve_equals_in_one_run_operator(spark, tmp_path):
    """The persisted IVFADC layout serves bit-identical rows to
    similarity.knn_ivfpq at equal parameters — training, encode
    tie-breaks, probe ranking, ADC reconstruction and rescore all
    replay through the on-disk (codes + codebooks + full) tables."""
    import random

    from semantik_spark.operators import serving, similarity

    rnd = random.Random(7)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(64)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    corpus = emb.where("vec_id >= 6")
    queries = emb.where("vec_id < 6").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    ref = similarity.knn_ivfpq(corpus, queries, k=5, dim=64, n_centroids=8,
                               nprobe=3, m=8, pq_centroids=8, rescore_k=15)
    idx = str(tmp_path / "ivfpq")
    serving.write_ivfpq_index(corpus, idx, dim=64, n_centroids=8, m=8,
                              pq_centroids=8, refine_iters=1)
    got = serving.ivfpq_serve(spark, idx, queries, k=5, nprobe=3, rescore_k=15)
    norm = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["vec_id"], round(r["cos"], 10), r["rank"])
        for r in df.collect())
    assert norm(ref) == norm(got)


def test_ivf_append_equals_one_shot_frozen_codebook_build(spark, tmp_path):
    """FAISS train-vs-add: appending a delta to a base-trained index
    (a) lands every delta vector in the cell the FROZEN codebook
    assigns, (b) serves bit-identically to an index holding the same
    rows written in one shot under the same codebook, and (c) keeps
    cell-directory partition pruning intact (appends go under existing
    centroid_id dirs)."""
    import os

    from pyspark.sql import functions as F

    from semantik_spark.operators.serving import (
        build_dense_ivf, dense_serve_ivf, ivf_append,
    )
    from semantik_spark.operators.similarity import (
        _codebook_df, _nearest_centroids,
    )
    from semantik_spark.functions.vectors import mock_embedding

    docs = spark.createDataFrame(
        [(i, f"document about topic {i % 7} item {i}") for i in range(80)],
        ["doc_id", "text"])
    base, delta = docs.where("doc_id % 4 != 0"), docs.where("doc_id % 4 = 0")
    idx = str(tmp_path / "idx")
    build_dense_ivf(base, idx, n_centroids=8)
    pre_dirs = {d for d in os.listdir(f"{idx}/dense_ivf")
                if d.startswith("centroid_id=")}
    ivf_append(spark, idx, delta)

    # (a) frozen-codebook assignment agreement
    cents = [{"cid": int(r["cid"]), "cv": list(r["cv"])}
             for r in spark.read.parquet(f"{idx}/codebook").collect()]
    cb = F.broadcast(_codebook_df(spark, sorted(cents, key=lambda r: r["cid"])))
    expect_cells = {
        r["doc_id"]: r["cell"]
        for r in docs.select("doc_id", mock_embedding("text").cast("array<double>").alias("embedding"))
        .crossJoin(cb)
        .select("doc_id", (-F.array_max(_nearest_centroids("embedding"))["negcid"]).alias("cell"))
        .collect()
    }
    stored = spark.read.parquet(f"{idx}/dense_ivf").select("doc_id", "centroid_id").collect()
    assert len(stored) == 80  # base + delta, no dup, no loss
    for r in stored:
        assert expect_cells[r["doc_id"]] == r["centroid_id"]

    # (b) serve equality vs one-shot write of the same assigned rows
    ref = str(tmp_path / "ref")
    os.makedirs(ref)
    spark.read.parquet(f"{idx}/dense_ivf") \
        .withColumn("centroid_id", F.col("centroid_id").cast("bigint")) \
        .write.partitionBy("centroid_id").parquet(f"{ref}/dense_ivf")
    spark.read.parquet(f"{idx}/codebook").write.parquet(f"{ref}/codebook")
    qdf = spark.createDataFrame(
        [("q1", "topic 3 item"), ("q2", "document about")],
        ["query_id", "query_text"])
    norm = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect())
    assert norm(dense_serve_ivf(spark, idx, qdf, k=5, nprobe=3)) == \
        norm(dense_serve_ivf(spark, ref, qdf, k=5, nprobe=3))

    # (c) appends created no out-of-codebook directories
    post_dirs = {d for d in os.listdir(f"{idx}/dense_ivf")
                 if d.startswith("centroid_id=")}
    valid = {f"centroid_id={c['cid']}" for c in cents}
    assert pre_dirs <= post_dirs <= valid


def test_hybrid_serve_approx_full_width_equals_exact(spark, tmp_path):
    """With nprobe = n_centroids and keep >= corpus, the approximate
    hybrid path degrades to the exact one — identical fused rankings;
    with narrow settings it still returns plausible fused rows with
    true branch scores."""
    from semantik_spark.operators.serving import (
        build_dense_ivf, build_index, build_sparse_pruned, hybrid_serve,
        hybrid_serve_approx,
    )

    docs = spark.createDataFrame(
        [(i, f"document about topic {i % 7} item {i}") for i in range(80)],
        ["doc_id", "text"])
    qdf = spark.createDataFrame(
        [("q1", "topic 3 item"), ("q2", "document about")],
        ["query_id", "query_text"])
    idx = str(tmp_path / "idx")
    build_index(docs, idx)
    build_dense_ivf(docs, idx, n_centroids=8)
    build_sparse_pruned(spark, idx, keep=10_000)
    norm = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect())
    assert norm(hybrid_serve_approx(spark, idx, qdf, k=5, nprobe=8)) == \
        norm(hybrid_serve(spark, idx, qdf, k=5))

    build_sparse_pruned(spark, idx, keep=8)
    part = hybrid_serve_approx(spark, idx, qdf, k=5, nprobe=2).collect()
    assert 0 < len(part) <= 10
    assert all(r["score"] > 0 for r in part)


def test_delete_from_index_propagates_everywhere_and_terms_stay_exact(spark, tmp_path):
    """Erasure cascade: deleted ids vanish from dense/ and postings/,
    land in tombstones/, and the retracted terms table EQUALS a fresh
    build over the remaining corpus (df decrement, zero-df terms gone,
    avgdl shrunk) — the abelian-group property of the mergeable
    state."""
    from semantik_spark.operators.serving import build_index, delete_from_index

    docs = spark.createDataFrame(
        [(i, f"shared words plus unique{i} token{i % 3}") for i in range(20)]
        + [(99, "onlyhere solitary vocabulary")],
        ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    build_index(docs, idx)
    gone = docs.where("doc_id >= 15")  # includes 99: kills 'onlyhere' etc.
    delete_from_index(spark, idx, gone)

    gone_ids = {r["doc_id"] for r in gone.collect()}
    for sub in ("dense", "postings"):
        left = {r["doc_id"] for r in spark.read.parquet(f"{idx}/{sub}")
                .select("doc_id").distinct().collect()}
        assert left.isdisjoint(gone_ids), sub
        assert left == {i for i in range(15)}
    tombs = {r["doc_id"] for r in spark.read.parquet(f"{idx}/tombstones").collect()}
    assert tombs == gone_ids

    ref = str(tmp_path / "ref")
    build_index(docs.where("doc_id < 15"), ref)
    norm = lambda p: sorted(  # noqa: E731
        (r["term"], r["term_id"], r["df"], round(r["idf"], 10))
        for r in spark.read.parquet(f"{p}/terms").collect())
    assert norm(idx) == norm(ref)
    assert not any(t == "onlyhere" for t, *_ in norm(idx))


def test_multi_delta_append_delete_replay_equals_rebuild_each_step(spark, tmp_path):
    """The production sync loop at APPEND scale (VERDICT r7 item 9):
    3 appends with a GDPR delete interleaved, and after EVERY step the
    merged terms table equals a from-scratch build over the corpus as
    of that step — not just at the end, so a single-step cancellation
    bug can't hide inside a lucky final state."""
    from semantik_spark.operators.serving import (
        build_index, delete_from_index, merge_sparse_append,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha shared{i % 4} beta unique{i} gamma token{i % 7}")
         for i in range(40)],
        ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    slices = [docs.where(f"doc_id % 4 = {i}") for i in range(4)]

    def terms_of(path):
        return sorted(
            (r["term"], r["term_id"], r["df"], round(r["idf"], 10))
            for r in spark.read.parquet(f"{path}/terms").collect())

    def assert_equals_rebuild(step, live_pred):
        ref = str(tmp_path / f"ref{step}")
        build_index(docs.where(live_pred), ref)
        assert terms_of(idx) == terms_of(ref), f"step {step}: {live_pred}"

    build_index(slices[0], idx)
    assert_equals_rebuild(0, "doc_id % 4 = 0")
    merge_sparse_append(slices[1], idx)
    assert_equals_rebuild(1, "doc_id % 4 < 2")
    # GDPR: erase indexed doc_id % 5 = 2; suppression list holds after
    delete_from_index(
        spark, idx, docs.where("doc_id % 4 < 2 AND doc_id % 5 = 2"))
    assert_equals_rebuild(2, "doc_id % 4 < 2 AND doc_id % 5 <> 2")
    merge_sparse_append(slices[2].where("doc_id % 5 <> 2"), idx)
    assert_equals_rebuild(3, "doc_id % 4 < 3 AND doc_id % 5 <> 2")
    merge_sparse_append(slices[3].where("doc_id % 5 <> 2"), idx)
    assert_equals_rebuild(4, "doc_id % 5 <> 2")


def test_merge_dense_append_then_delete_equals_rebuild(spark, tmp_path):
    """Dense side of the composed sync loop (VERDICT r8 item 6):
    build + dense append + cascade delete + dense append must leave
    dense/ row-identical to a from-scratch build over the survivors
    (embeddings are per-doc, so set equality IS state equality)."""
    from semantik_spark.operators.serving import (
        build_index, delete_from_index, merge_dense_append,
        merge_sparse_append,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha shared{i % 4} beta unique{i}") for i in range(30)],
        ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    slices = [docs.where(f"doc_id % 3 = {i}") for i in range(3)]
    build_index(slices[0], idx)
    merge_sparse_append(slices[1], idx)
    merge_dense_append(slices[1], idx)
    delete_from_index(
        spark, idx, docs.where("doc_id % 3 < 2 AND doc_id % 7 = 3"))
    last = slices[2].where("doc_id % 7 <> 3")
    merge_sparse_append(last, idx)
    merge_dense_append(last, idx)
    ref = str(tmp_path / "ref")
    build_index(docs.where("doc_id % 7 <> 3"), ref)

    def dense_of(path):
        return sorted(
            (r["doc_id"], tuple(round(x, 10) for x in r["embedding"]))
            for r in spark.read.parquet(f"{path}/dense").collect())

    assert dense_of(idx) == dense_of(ref)


def test_driver_side_twins_are_bit_identical_to_columns(spark):
    """The probe-planning contract dense_serve_ivf/ivfpq_serve stand
    on: _mock_embedding_py and _cosine_py must produce BIT-identical
    doubles to the mock_embedding / cosine Column expressions — a
    single ULP of drift and the driver picks different probe cells
    than the executors would score. Pinned over a diverse string
    sample (unicode, whitespace, long, numeric) with exact ==, no
    tolerance."""
    from pyspark.sql import functions as F

    from semantik_spark.functions.vectors import cosine, mock_embedding
    from semantik_spark.operators.serving import (
        _cosine_py,
        _mock_embedding_py,
    )

    texts = (["", " ", "a", "hello world", "Hello, World!", "émigré café",
              "日本語のテキスト", "x" * 5000, "123.456e-7", "\ttab\nnewline",
              "the quick brown fox jumps over the lazy dog"]
             + [f"doc-{i}-{i * 31 % 97}" for i in range(50)])
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "text"])
    rows = (df.select("i", "text",
                      mock_embedding("text").alias("v"))
            .withColumn("c", cosine("v", F.reverse("v")))
            .collect())
    assert len(rows) == len(texts)
    for r in rows:
        pv = _mock_embedding_py(r["text"])
        assert list(r["v"]) == pv, (r["text"], r["v"], pv)  # exact ==
        assert r["c"] == _cosine_py(pv, list(reversed(pv))), r["text"]


def test_delete_cascade_reaches_every_artifact_and_is_idempotent(spark, tmp_path):
    """GDPR erasure must remove the doc from the approximate layouts
    (dense_ivf, postings_pruned, ivfpq_full) too, and a RETRIED delete
    (the normal erasure-pipeline case) must be a no-op instead of
    double-decrementing the mergeable state."""
    from semantik_spark.operators.serving import (
        build_dense_ivf,
        build_index,
        build_sparse_pruned,
        delete_from_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha shared{i % 4} beta unique{i}") for i in range(30)],
        ["doc_id", "text"])
    idx = str(tmp_path / "gidx")
    build_index(docs, idx)
    build_dense_ivf(docs, idx, n_centroids=4)
    build_sparse_pruned(spark, idx, keep=8)

    gone = docs.where("doc_id % 3 = 0")
    delete_from_index(spark, idx, gone)
    gone_ids = {r["doc_id"] for r in gone.collect()}
    for sub in ("dense", "postings", "dense_ivf", "postings_pruned"):
        left = {r["doc_id"] for r in spark.read.parquet(f"{idx}/{sub}")
                .select("doc_id").distinct().collect()}
        assert left.isdisjoint(gone_ids), sub

    # dense_ivf keeps its partition layout (pruning still works)
    import os
    assert any(d.startswith("centroid_id=")
               for d in os.listdir(f"{idx}/dense_ivf"))

    # retry: same request again — state must be unchanged
    before = spark.read.parquet(f"{idx}/bm25_state/corpus").collect()
    delete_from_index(spark, idx, gone)
    after = spark.read.parquet(f"{idx}/bm25_state/corpus").collect()
    assert before == after
    ref = str(tmp_path / "gref")
    build_index(docs.where("doc_id % 3 <> 0"), ref)
    t = lambda p: sorted(  # noqa: E731
        (r["term"], r["df"]) for r in spark.read.parquet(f"{p}/terms").collect())
    assert t(idx) == t(ref)


def test_ivf_serve_accepts_integer_query_ids(spark, tmp_path):
    """The driver-planned probes table keeps the caller's query-id
    type; a hardcoded string schema rejected integer-keyed batches on
    the IVF paths only."""
    from semantik_spark.operators.serving import build_dense_ivf, dense_serve_ivf

    docs = spark.createDataFrame(
        [(i, f"alpha beta unique{i}") for i in range(20)], ["doc_id", "text"])
    idx = str(tmp_path / "iidx")
    build_dense_ivf(docs, idx, n_centroids=4)
    q = spark.createDataFrame([(7, "alpha unique3")],
                              ["query_id", "query_text"])
    rows = dense_serve_ivf(spark, idx, q, k=3).collect()
    assert rows and all(r["query_id"] == 7 for r in rows)


def test_merge_sparse_append_replay_after_crash_before_swap(spark, tmp_path):
    """Replay safety of the append path's commit ordering (ADVICE r10):
    postings/terms are written BEFORE the _last_batch marker swap, so a
    crash between them leaves the marker old and the streaming replay
    re-runs the whole merge — which must CONVERGE: exactly one copy of
    the batch's postings rows (batch-prefixed files from the crashed
    attempt are removed) and a terms table equal to a full rebuild.
    The old order (swap first) made the replay a fenced no-op with the
    batch's postings permanently missing."""
    from semantik_spark.operators import serving

    docs = spark.createDataFrame(
        [(i, f"alpha shared{i % 3} beta unique{i}") for i in range(12)],
        ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    serving.build_sparse(docs.where("doc_id < 8"), idx)
    delta = docs.where("doc_id >= 8")

    # crash AT the swap: postings + terms already written, marker not
    real_swap = serving._bm25_state_swap
    def exploding_swap(*a, **kw):
        raise RuntimeError("simulated crash before marker swap")
    serving._bm25_state_swap = exploding_swap
    try:
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="simulated crash"):
            serving.merge_sparse_append(delta, idx, batch_id=7)
    finally:
        serving._bm25_state_swap = real_swap
    assert serving._bm25_last_batch(idx) is None  # marker never advanced

    # the streaming replay re-runs the SAME batch — must converge
    serving.merge_sparse_append(delta, idx, batch_id=7)
    assert serving._bm25_last_batch(idx) == 7

    post = spark.read.parquet(f"{idx}/postings")
    dup = (post.groupBy("doc_id", "term").count().where("count > 1").count())
    assert dup == 0, "replay duplicated the batch's postings rows"
    assert {r["doc_id"] for r in post.select("doc_id").distinct().collect()} \
        == {str(i) if isinstance(i, str) else i for i in range(12)}

    ref = str(tmp_path / "ref")
    serving.build_sparse(docs, ref)
    norm = lambda p: sorted(  # noqa: E731
        (r["term"], r["term_id"], r["df"], round(r["idf"], 10))
        for r in spark.read.parquet(f"{p}/terms").collect())
    assert norm(idx) == norm(ref)

    # a second replay of the already-committed batch is a fenced no-op
    serving.merge_sparse_append(delta, idx, batch_id=7)
    assert spark.read.parquet(f"{idx}/postings").count() == post.count()


def test_delete_from_index_erases_zero_token_docs(spark, tmp_path):
    """Erasure presence authority (ADVICE r10): a doc whose text yields
    ZERO BM25 tokens (stopword-only) has no postings rows but is still
    servable from dense/ and counted in n_docs — its deletion request
    must not be silently filtered out by a postings-only live-id set.
    After the cascade: dense row gone, tombstone written, terms/state
    equal a rebuild over the survivors (n_docs retracted)."""
    from semantik_spark.operators.serving import build_index, delete_from_index

    docs = spark.createDataFrame(
        [(1, "alpha unique1 beta"), (2, "gamma unique2 delta"),
         (3, "the of and to a in is it")],   # all stopwords: 0 tokens
        ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    build_index(docs, idx)
    post_ids = {r["doc_id"] for r in spark.read.parquet(f"{idx}/postings")
                .select("doc_id").distinct().collect()}
    assert 3 not in post_ids, "fixture regression: doc 3 must be token-free"

    delete_from_index(spark, idx, docs.where("doc_id = 3"))

    dense_ids = {r["doc_id"] for r in spark.read.parquet(f"{idx}/dense")
                 .select("doc_id").distinct().collect()}
    assert 3 not in dense_ids, "zero-token doc still servable from dense/"
    tombs = {r["doc_id"] for r in
             spark.read.parquet(f"{idx}/tombstones").collect()}
    assert tombs == {3}

    ref = str(tmp_path / "ref")
    build_index(docs.where("doc_id <> 3"), ref)
    norm = lambda p: sorted(  # noqa: E731
        (r["term"], r["term_id"], r["df"], round(r["idf"], 10))
        for r in spark.read.parquet(f"{p}/terms").collect())
    assert norm(idx) == norm(ref)
    n_docs = spark.read.parquet(f"{idx}/bm25_state/corpus") \
        .collect()[0]["n_docs"]
    assert n_docs == 2, "n_docs not retracted for the zero-token doc"


def test_replace_batch_postings_converges_after_partial_move(spark, tmp_path):
    """A crash MID-move leaves some batch-prefixed files in postings/;
    the replay must remove them before re-moving, converging to exactly
    one copy of the batch's rows (idempotence of the per-batch append,
    the other half of the merge_sparse_append crash-window fix)."""
    import glob
    import os

    from semantik_spark.operators import serving

    idx = str(tmp_path / "idx")
    os.makedirs(f"{idx}/postings")
    post = spark.createDataFrame(
        [(i, f"t{i % 3}", 1, 0.5) for i in range(30)],
        "doc_id long, term string, tf long, weight double").repartition(4)

    serving._replace_batch_postings(post, idx, batch_id=3)
    files = glob.glob(f"{idx}/postings/batch3-*")
    assert files, "no batch-prefixed files landed"
    # simulate the crashed attempt: delete one moved file (as if the
    # crash happened before it moved) — rows are now partial
    os.remove(files[0])
    partial = spark.read.parquet(f"{idx}/postings").count()
    assert partial < 30

    # replay: leftovers removed, full set re-moved, exactly one copy
    serving._replace_batch_postings(post, idx, batch_id=3)
    again = spark.read.parquet(f"{idx}/postings")
    assert again.count() == 30
    assert again.groupBy("doc_id", "term").count().where("count > 1").count() == 0
