"""Maintenance ops: GC anti-joins (P7), stale marking, blue/green (P6)."""

from __future__ import annotations

import os

import pytest

from semantik_spark.operators.maintenance import (
    BlueGreenIndex,
    gc_index,
    mark_stale,
    orphaned_points,
)


@pytest.fixture()
def index(spark):
    return spark.createDataFrame(
        [("c1", 1), ("c2", 1), ("c3", 2), ("c4", 99)], ["chunk_id", "doc_id"]
    )


@pytest.fixture()
def documents(spark):
    return spark.createDataFrame([(1,), (2,), (3,)], ["doc_id"])


def test_orphaned_points(index, documents):
    orphans = orphaned_points(index, documents).collect()
    assert [r["chunk_id"] for r in orphans] == ["c4"]


def test_gc_keeps_live(index, documents):
    kept = {r["chunk_id"] for r in gc_index(index, documents).collect()}
    assert kept == {"c1", "c2", "c3"}


def test_mark_stale(spark):
    catalog = spark.createDataFrame([("u1",), ("u2",), ("u3",)], ["uri"])
    enumeration = spark.createDataFrame([("u1",), ("u3",)], ["uri"])
    out = {r["uri"]: r["is_stale"] for r in mark_stale(catalog, enumeration).collect()}
    assert out == {"u1": False, "u2": True, "u3": False}


def test_blue_green_swap_and_validate(spark, tmp_path):
    bg = BlueGreenIndex(str(tmp_path / "idx"))
    v1 = spark.createDataFrame([(i, f"v1-{i}") for i in range(5)], ["doc_id", "content"])
    assert bg.staging_color() == "blue"
    bg.write_staging(v1)
    info = bg.validate_staging(spark, min_rows=1, expect_columns=("doc_id", "content"))
    assert info["rows"] == 5
    bg.swap()
    assert bg.read_live(spark).count() == 5

    # rebuild into green while blue serves
    v2 = spark.createDataFrame([(i, f"v2-{i}") for i in range(7)], ["doc_id", "content"])
    assert bg.staging_color() == "green"
    bg.write_staging(v2)
    assert bg.read_live(spark).count() == 5  # still v1 until swap
    bg.validate_staging(spark, min_rows=6)
    bg.swap()
    live = bg.read_live(spark)
    assert live.count() == 7
    assert live.where("content like 'v2-%'").count() == 7
    bg.cleanup_old()
    assert not os.path.exists(str(tmp_path / "idx" / "blue"))


def test_blue_green_validation_blocks_bad_build(spark, tmp_path):
    bg = BlueGreenIndex(str(tmp_path / "idx2"))
    empty = spark.createDataFrame([], "doc_id int, content string")
    bg.write_staging(empty)
    with pytest.raises(ValueError, match="rows"):
        bg.validate_staging(spark, min_rows=1)
    good = spark.createDataFrame([(1, "x")], ["doc_id", "content"])
    bg.write_staging(good)
    with pytest.raises(ValueError, match="missing columns"):
        bg.validate_staging(spark, expect_columns=("doc_id", "embedding"))


def test_drift_triggered_bluegreen_ivf_retrain(spark, tmp_path):
    """The composed codebook-retrain OPS loop (VERDICT r9 item 4 names
    blue/green reindex as the retrain path — reference
    webui/tasks/reindex.py:275-304): drift detection decides WHEN,
    BlueGreenIndex decides HOW the fresh index goes live. Pins the two
    claims the in-place drift test cannot: (1) the staging rebuild
    never disturbs the live index — a reader mid-rebuild sees the
    stale results bit-for-bit; (2) the atomic swap is the moment
    recall recovers, and the old color is gone after cleanup.

    Index artifact per color = the assigned vector table written
    partitionBy(centroid_id) via write_staging, plus the codebook
    parquet under ``<color>/_codebook`` — the underscore prefix keeps
    it invisible to the table read (Spark skips _-prefixed dirs), so
    validate_staging/read_live see only vector rows while the sidecar
    rides the same atomic symlink flip.
    """
    import os as _os

    from pyspark.sql import functions as F

    from semantik_spark.operators import similarity
    from semantik_spark.operators.similarity import (
        _codebook_df,
        _nearest_centroids,
    )

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("embedding")))
    corpus = emb.where(F.col("vec_id") >= 10)
    base = corpus.where(F.col("vec_id") % 5 != 0)
    drifted = corpus.where(F.col("vec_id") % 5 == 0).select(
        "vec_id", F.transform("embedding", lambda x: F.abs(x)).alias("embedding"))
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: F.abs(x)).alias("query_vec"))

    def assign(df, cent_rows):
        cb = F.broadcast(_codebook_df(spark, cent_rows))
        return df.select(F.col("vec_id"), F.col("embedding").alias("v")) \
            .crossJoin(cb).withColumn(
                "centroid_id",
                -F.array_max(_nearest_centroids("v"))["negcid"]).drop("cents")

    def write_color(bg, df, cent_rows):
        staging = bg.write_staging(assign(df, cent_rows),
                                   partition_by=("centroid_id",))
        bg.validate_staging(spark, min_rows=1,
                            expect_columns=("vec_id", "v", "centroid_id"))
        spark.createDataFrame(
            [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in cent_rows],
            "cid bigint, cv array<double>",
        ).write.mode("overwrite").parquet(_os.path.join(staging, "_codebook"))
        return staging

    def serve_live(bg, k=5, nprobe=4):
        live = _os.path.realpath(bg.live_path)
        cb = sorted(spark.read.parquet(_os.path.join(live, "_codebook"))
                    .collect(), key=lambda r: r["cid"])
        vecs = bg.read_live(spark).select(
            "vec_id", F.col("v").alias("embedding"))
        return similarity.knn_ivf(vecs, queries, k=k, nprobe=nprobe,
                                  cent_rows=cb)

    bg = BlueGreenIndex(str(tmp_path / "ivf"))
    stale = similarity.ivf_refine(
        base, similarity.ivf_centroids(base, 16), iters=1)
    write_color(bg, base, stale)
    bg.swap()

    # the append lands; the detector fires on the BATCH histogram
    combined = base.unionByName(drifted)
    psi = similarity.ivf_assignment_drift(base, drifted, stale).head()
    assert psi["retrain_needed"]

    # mid-rebuild isolation: live rows while green is being rebuilt
    # must equal live rows before the rebuild started
    before = sorted((r["query_id"], r["rank"], r["vec_id"])
                    for r in serve_live(bg).collect())
    fresh = similarity.ivf_refine(
        combined, similarity.ivf_centroids(combined, 16), iters=1)
    write_color(bg, combined, fresh)          # staging write, no swap yet
    during = sorted((r["query_id"], r["rank"], r["vec_id"])
                    for r in serve_live(bg).collect())
    assert during == before                   # reader never sees the rebuild

    # recall before/after the flip, against the post-append truth
    from semantik_spark.functions.caching import cache
    exact = cache(similarity.knn_bruteforce(combined, queries, k=5))
    live_with_append = bg.read_live(spark).select(
        "vec_id", F.col("v").alias("embedding")).unionByName(drifted)
    cb_stale = sorted(spark.read.parquet(
        _os.path.join(_os.path.realpath(bg.live_path), "_codebook"))
        .collect(), key=lambda r: r["cid"])
    r_stale = similarity.recall_at_k(
        exact, similarity.knn_ivf(live_with_append, queries, k=5, nprobe=4,
                                  cent_rows=cb_stale), "stale").head()
    bg.swap()                                 # the atomic flip
    r_fresh = similarity.recall_at_k(exact, serve_live(bg), "fresh").head()
    assert r_stale["recall"] < 1.0
    assert r_fresh["recall"] == 1.0

    bg.cleanup_old()
    colors = {c for c in ("blue", "green")
              if _os.path.exists(str(tmp_path / "ivf" / c))}
    assert colors == {bg._color_of(bg.live_path)}
