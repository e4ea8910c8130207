"""Prove the IVF/PQ Lloyd means are summation-order-free for this data.

The r14 optimization spreads the training-assignment stages of
ivf_refine / pq_codebooks / cluster_profile across the session's cores
(guide §2.5 — they previously fused into ONE task over the one-file
scan). That changes the accumulation order of the raw DOUBLE sums
behind each 6 dp-rounded Lloyd mean, which is only value-safe if no
achievable order can flip the rounded digit. This tool CHECKS that
property for the actual deterministic test data:

  for a sum of n doubles with Σ|x_i| = sa, any summation order (any
  sequential or tree reduction) computes within (n-1)·u·sa of the
  exact sum (u = 2^-53) — so if the computed mean sits further than a
  conservative multiple of that bound from the nearest 0.5·10^-6
  rounding boundary, EVERY order (any partitioning, any core count,
  any shuffle fetch order, and the DuckDB oracle's own order) rounds
  to the same value.

Run over every IVF-family query at every SF (training executes at
query-build time via the driver collect) with SPARK_GRAFT_ORDER_AUDIT=1
so ivf_refine/pq_codebooks append (margin, bound) per (cell, dim) to
similarity._ORDER_AUDIT; cluster_profile's avg_cos is replicated here
explicitly (it aggregates lazily, so the operator cannot self-audit).

Usage:
    python tools/order_margin_audit.py [sf_dir ...]
Writes a per-SF summary to stdout; commit it as
plans/r14/order_margin_audit.txt. The PASS criterion (min ratio
margin/bound > 10) is asserted — a knife-edge mean fails loudly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_ORDER_AUDIT"] = "1"

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from semantik_spark.operators import similarity  # noqa: E402
from semantik_spark.session import get_spark  # noqa: E402

# every declared query whose build runs ivf_refine and/or pq_codebooks
AUDIT_QUERIES = [
    "knn_ivf", "knn_ivf_append", "knn_ivf_sample_sweep",
    "ivf_codebook_drift", "ivf_retrain_recall",
    "knn_pq", "knn_ivfpq", "knn_ivfpq_serve",
    "doc_clusters", "doc_outliers", "semdedup",
]


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))


def audit_cluster_profile_avg(spark, sf_dir) -> list[dict]:
    """Replicate cluster_profile's avg_cos (DOUBLE mean rounded 6 dp)
    with Σ|cos| so its margins are measured like the training sums."""
    from semantik_spark.functions.parallel import spread
    from semantik_spark.operators.similarity import (
        _codebook_df, _nearest_centroids, ivf_centroids, ivf_refine,
        order_margin,
    )

    corpus = _emb(spark, sf_dir).where("vec_id >= 10")
    cent_rows = ivf_refine(corpus, ivf_centroids(corpus, 16), iters=1)
    codebook = F.broadcast(_codebook_df(spark, cent_rows))
    c = spread(corpus.select(F.col("vec_id"),
                             F.col("embedding").alias("v")), "vec_id")
    best = F.array_max(_nearest_centroids("v"))
    assigned = c.crossJoin(codebook).select(
        (-best["negcid"]).alias("centroid_id"), best["cos"].alias("cos"))
    rows = assigned.groupBy("centroid_id").agg(
        F.sum("cos").alias("s"), F.count("*").alias("n"),
        F.sum(F.abs(F.col("cos"))).alias("sa")).collect()
    out = []
    for r in rows:
        margin, bound = order_margin(float(r["s"]), int(r["n"]),
                                     float(r["sa"]), 6)
        out.append({"kind": "cluster_profile_avg_cos",
                    "cell": int(r["centroid_id"]), "dim": -1,
                    "n": int(r["n"]), "margin": margin, "bound": bound})
    return out


def main() -> None:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                           "/root/testdata/sf0.1"]
    spark = get_spark("order_margin_audit")
    qs = entrymod.queries()
    worst_overall = None
    for sf_dir in sfs:
        print(f"\n=== {sf_dir} ===")
        for name in AUDIT_QUERIES:
            similarity._ORDER_AUDIT.clear()
            spark.sparkContext.setJobDescription(f"order_audit {name}")
            qs[name](spark, sf_dir)  # training runs at build time
            entries = list(similarity._ORDER_AUDIT)
            _report(name, entries)
            worst_overall = _worst(worst_overall, entries, name, sf_dir)

        # bench-only build paths not behind a declared query
        import shutil
        import tempfile

        from semantik_spark.operators import serving
        similarity._ORDER_AUDIT.clear()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        tdir = tempfile.mkdtemp(prefix="order_audit_idx_")
        try:
            serving.build_dense_ivf(docs, tdir, n_centroids=16)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
        entries = list(similarity._ORDER_AUDIT)
        _report("bench:build_dense_ivf", entries)
        worst_overall = _worst(worst_overall, entries,
                               "bench:build_dense_ivf", sf_dir)

        entries = audit_cluster_profile_avg(spark, sf_dir)
        _report("doc_clusters:avg_cos", entries)
        worst_overall = _worst(worst_overall, entries,
                               "doc_clusters:avg_cos", sf_dir)

        from semantik_spark.functions.caching import release_all
        release_all()
        spark.catalog.clearCache()

    print("\n=== OVERALL ===")
    if worst_overall is None:
        print("NO ENTRIES — audit did not fire")
        sys.exit(2)
    e, name, sf_dir = worst_overall
    ratio = e["margin"] / e["bound"] if e["bound"] > 0 else float("inf")
    print(f"worst margin/bound ratio: {ratio:.3e}  "
          f"({name} @ {sf_dir}, kind={e['kind']} cell={e['cell']} "
          f"dim={e['dim']} n={e['n']} margin={e['margin']:.3e} "
          f"bound={e['bound']:.3e})")
    if ratio > 10:
        print("PASS: every Lloyd/profile mean is ORDER-FREE at 6 dp for "
              "this data — any partitioning rounds identically.")
    else:
        print("FAIL: a mean sits within 10x of the any-order error bound "
              "of a rounding boundary — do NOT spread this aggregation.")
        sys.exit(1)


def _report(name: str, entries: list[dict]) -> None:
    if not entries:
        print(f"{name:28s}  (no double-sum training aggregations fired)")
        return
    worst = min(entries, key=lambda e: e["margin"] / e["bound"])
    ratio = worst["margin"] / worst["bound"]
    print(f"{name:28s}  means={len(entries):5d}  min(margin/bound)="
          f"{ratio:.3e}  worst: kind={worst['kind']} cell={worst['cell']} "
          f"dim={worst['dim']} n={worst['n']} margin={worst['margin']:.3e} "
          f"bound={worst['bound']:.3e}")


def _worst(cur, entries, name, sf_dir):
    if not entries:
        return cur
    w = min(entries, key=lambda e: e["margin"] / e["bound"])
    if cur is None or (w["margin"] / w["bound"]) < \
            (cur[0]["margin"] / cur[0]["bound"]):
        return (w, name, sf_dir)
    return cur


if __name__ == "__main__":
    main()
