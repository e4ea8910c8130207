"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query numbers are full-action wall times (plan + execute + count),
cache dropped between queries. BASELINE.md comparable: amortized
per-query search latency = hybrid_rrf wall / 4 queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from semantik_spark.session import get_spark

BENCH_QUERIES = [
    "pricing_summary",
    "join_revenue",
    "events_tumbling",
    "user_sessions",
    "events_asof",
    "events_range_window",
    "bm25_postings",
    "bm25_search",
    "dense_mock_search",
    "hybrid_rrf",
    "ir_metrics",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "knn_quantized",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_sentences",
    "text_quality",
    "pii_redact",
    "lm_quality",
    "chunk_character",
    "ingest_index",
    "rerank_search",
    "multi_collection_dense",
    "sniff_formats",
    "gc_orphans",
    "pca_projection",
]


def _bench_serving(spark, sf_dir: str, results: dict[str, float]) -> None:
    """Build-vs-serve split (SURVEY §6 deployed shape): index build is
    measured once; the serve queries run against the persisted parquet
    index, which is what BASELINE.md's service latencies describe.
    Amortized per-query serve latency = wall / len(SEARCH_QUERIES)."""
    import shutil
    import tempfile

    from semantik_spark.operators import serving
    from semantik_spark.oracles import SEARCH_QUERIES

    idx_dir = tempfile.mkdtemp(prefix="bench_index_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        qdf = spark.createDataFrame(SEARCH_QUERIES, ["query_id", "query_text"])
        t0 = time.time()
        serving.build_index(docs, idx_dir)
        results["index_build"] = round(time.time() - t0, 3)
        print(f"# index_build: {results['index_build']:.3f}s", file=sys.stderr)
        serves = [
            ("bm25_serve", lambda: serving.bm25_serve(spark, idx_dir, qdf, k=10)),
            ("dense_serve", lambda: serving.dense_serve(spark, idx_dir, qdf, k=10)),
            ("hybrid_serve", lambda: serving.hybrid_serve(spark, idx_dir, qdf, k=10, search_k=20)),
        ]
        for name, fn in serves:
            t0 = time.time()
            n = fn().count()
            dt = time.time() - t0
            results[name] = round(dt, 3)
            per_q = dt / len(SEARCH_QUERIES)
            print(f"# {name}: {dt:.3f}s ({n} rows, {per_q * 1000:.0f} ms/query)",
                  file=sys.stderr)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm the JVM/parquet-footer caches with one tiny action so the
    # first measured query doesn't pay session startup
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    results: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        results[name] = round(dt, 3)
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    _bench_serving(spark, sf_dir, results)

    total = round(sum(results.values()), 3)
    print(json.dumps({
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
