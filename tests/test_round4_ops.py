"""Round-4 additions: column profiler, gaps-and-islands, Zipf fit,
length bucketing, hard-negative mining, kNN-graph PageRank."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from semantik_spark.operators.graph import knn_graph_edges, pagerank
from semantik_spark.operators.metrics import hard_negatives
from semantik_spark.operators.profiling import profile_columns
from semantik_spark.operators.textanalysis import zipf_fit
from semantik_spark.operators.timeseries import state_islands
from semantik_spark.operators.training import length_bins


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (3, 30.0)], ["a", "b"]
    )
    prof = {r["column_name"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert prof["a"]["n_rows"] == 4
    assert prof["a"]["n_nulls"] == 0
    assert prof["a"]["n_distinct"] == 3
    assert prof["a"]["min_val"] == 1.0 and prof["a"]["max_val"] == 3.0
    assert prof["b"]["n_nulls"] == 1
    assert prof["b"]["n_distinct"] == 2
    assert prof["b"]["avg_val"] == 23.333333  # (10+30+30)/3 rounded 6dp


def test_profile_columns_approx_mode(spark):
    df = spark.range(1000).select(F.col("id").alias("a"))
    row = profile_columns(df, ["a"], exact=False).collect()[0]
    # HLL++ within its documented default error on 1000 distincts
    assert abs(row["n_distinct"] - 1000) < 60


def test_state_islands(spark):
    rows = [
        # user 1: A A B A  -> islands (A,2) (B,1) (A,1)
        (1, 1, "A", "2024-01-01 00:00:00"),
        (2, 1, "A", "2024-01-01 00:01:00"),
        (3, 1, "B", "2024-01-01 00:02:00"),
        (4, 1, "A", "2024-01-01 00:03:00"),
        # user 2: single event
        (5, 2, "C", "2024-01-01 00:00:30"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = state_islands(ev).orderBy("user_id", "island").collect()
    assert [(r["user_id"], r["island"], r["event_type"], r["n_events"]) for r in out] == [
        (1, 1, "A", 2), (1, 2, "B", 1), (1, 3, "A", 1), (2, 1, "C", 1),
    ]
    first = out[0]
    assert first["end_us"] - first["start_us"] == 60_000_000


def test_zipf_fit_exact_power_law(spark):
    # freq = 60 / rank exactly (60, 30, 20, 15, 12) -> slope -1, r2 1
    docs = spark.createDataFrame(
        [(r, " ".join(f"w{r}" for _ in range(60 // r))) for r in (1, 2, 3, 4, 5)],
        ["doc_id", "text"],
    )
    out = zipf_fit(docs, top_n=5).collect()[0]
    assert out["n_terms"] == 5
    assert abs(out["slope"] + 1.0) < 1e-6
    assert abs(out["r2"] - 1.0) < 1e-6


def test_length_bins_partition_and_waste(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * i)) for i in range(1, 9)], ["doc_id", "text"]
    )
    out = {r["bin"]: r for r in length_bins(docs, n_bins=4).collect()}
    assert len(out) == 4 and sum(r["n_docs"] for r in out.values()) == 8
    # bin 1 holds lengths 1,2 -> waste = 2*2 - 3 = 1
    assert out[1]["min_tokens"] == 1 and out[1]["max_tokens"] == 2
    assert out[1]["pad_waste"] == 1


def test_hard_negatives(spark):
    retrieved = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3), ("q2", 20, 1)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [("q1", 10, 3), ("q1", 12, 1), ("q2", 99, 2)],
        ["query_id", "doc_id", "grade"],
    )
    out = hard_negatives(retrieved, qrels, n=5, min_grade=2).collect()
    got = {(r["query_id"], r["doc_id"]): r["neg_rank"] for r in out}
    # doc 10 is a positive; 11 (unjudged) and 12 (grade 1 < 2) are negatives
    assert got == {("q1", 11): 1, ("q1", 12): 2, ("q2", 20): 1}


def test_pagerank_star_graph(spark):
    # star: every leaf points at hub 0; hub points at leaf 1
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)] + [(0, 1)], ["src", "dst"]
    )
    out = {r["id"]: r["pr"] for r in pagerank(edges, iterations=20).collect()}
    # hub accumulates the leaves' mass, leaf 1 gets the hub's, others decay
    assert out[0] > out[1] > out[2]
    assert abs(out[2] - out[3]) < 1e-9 and abs(out[3] - out[4]) < 1e-9
    # scaled by |V|: the floor for a no-inlink node is (1-d) = 0.15
    assert abs(out[2] - 0.15) < 1e-6


def test_pagerank_mass_conservation_on_cycle(spark):
    # directed 3-cycle: uniform stationary distribution, pr*n == 1.0 each
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], ["src", "dst"])
    out = [r["pr"] for r in pagerank(edges, iterations=8).collect()]
    assert all(abs(p - 1.0) < 1e-9 for p in out)


def test_knn_graph_edges_excludes_self_and_is_k_regular(spark):
    import random

    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(12)],
        ["vec_id", "embedding"],
    )
    edges = knn_graph_edges(emb, k=3).collect()
    assert len(edges) == 12 * 3
    assert all(r["src"] != r["dst"] for r in edges)


def test_triangle_counts_k4(spark):
    from semantik_spark.operators.graph import triangle_counts

    # complete graph K4: C(4,3)=4 triangles, each node participates in 3
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b], ["src", "dst"]
    )
    out = {r["id"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_session_associations_lift(spark):
    from semantik_spark.operators.timeseries import session_associations

    rows = []
    eid = 0
    # 4 users, one session each: A+B always together, C alone in 2 baskets
    for u in (1, 2, 3, 4):
        for et in (["A", "B"] if u <= 2 else ["C"]):
            rows.append((eid, u, et, f"2024-01-01 00:0{u}:00"))
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = session_associations(ev, min_pair=1).collect()
    assert len(out) == 1
    r = out[0]
    # N=4 baskets, n_A=n_B=2, n_pair=2 -> lift = 2*4/(2*2) = 2
    assert (r["item_a"], r["item_b"], r["n_pair"]) == ("A", "B", 2)
    assert r["lift"] == 2.0 and r["support"] == 0.5


def test_ewm_smooth_formula(spark):
    from semantik_spark.operators.timeseries import ewm_smooth

    ev = spark.createDataFrame(
        [(i, 1, "A", f"2024-01-01 00:0{i}:00", float(v))
         for i, v in enumerate([10.0, 20.0, 30.0])],
        ["event_id", "user_id", "event_type", "ts", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r["ewma"] for r in ewm_smooth(ev, alpha=0.5, window=4).collect()}
    assert out[0] == 10.0  # single observation
    # row 1: (0.5*20 + 0.25*10)/(0.75)
    assert abs(out[1] - (0.5 * 20 + 0.25 * 10) / 0.75) < 1e-6
    # row 2: (0.5*30 + 0.25*20 + 0.125*10)/(0.875)
    assert abs(out[2] - (0.5 * 30 + 0.25 * 20 + 0.125 * 10) / 0.875) < 1e-6


def test_kmv_set_ops_exact_small(spark):
    from semantik_spark.operators.sketches import kmv_set_ops

    rows = [("A", i) for i in range(10)] + [("B", i) for i in range(5, 15)]
    df = spark.createDataFrame(rows, ["g", "uid"])
    r = kmv_set_ops(df, "g", "uid", k=64).collect()[0]
    # below k everything is exact: |A|=|B|=10, |A∪B|=15, |A∩B|=5
    assert (r["est_a"], r["est_b"], r["est_union"], r["est_intersect"]) == (10.0, 10.0, 15.0, 5.0)
    assert abs(r["jaccard_est"] - 5.0 / 15.0) < 1e-5


def test_merge_counters_equals_recompute(spark):
    from semantik_spark.streaming.incremental import daily_counters, merge_counters

    ev = spark.createDataFrame(
        [(i, 1 + i % 3, "A" if i % 2 else "B",
          f"2024-01-{1 + i % 4:02d} 00:00:{i:02d}", float(i) * 1.5)
         for i in range(40)],
        ["event_id", "user_id", "event_type", "ts", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    state = daily_counters(ev.where(F.dayofmonth("ts") <= 2))
    delta = daily_counters(ev.where(F.dayofmonth("ts") > 2))
    merged = merge_counters(state, delta).orderBy("event_type", "day").collect()
    full = daily_counters(ev).orderBy("event_type", "day").collect()
    assert [(r["event_type"], r["day"], r["n"], r["sum_value"]) for r in merged] == \
           [(r["event_type"], r["day"], r["n"], r["sum_value"]) for r in full]


def test_merge_counters_disjoint_keys(spark):
    from semantik_spark.streaming.incremental import merge_counters

    state = spark.createDataFrame(
        [("A", "2024-01-01", 5)], ["event_type", "day", "n"]
    ).withColumn("sum_value", F.lit(10).cast("decimal(38,8)"))
    delta = spark.createDataFrame(
        [("B", "2024-01-02", 2)], ["event_type", "day", "n"]
    ).withColumn("sum_value", F.lit(7).cast("decimal(38,8)"))
    out = {(r["event_type"], r["day"]): (r["n"], float(r["sum_value"]))
           for r in merge_counters(state, delta).collect()}
    assert out == {("A", "2024-01-01"): (5, 10.0), ("B", "2024-01-02"): (2, 7.0)}


def test_fuzzy_pairs_blocking_and_distance(spark):
    from semantik_spark.operators.dedup import fuzzy_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # dist 3 in head
            (3, "the quick brown mouse sits under a table"),     # same block, far head
            (4, "completely different opening line here"),       # different block
        ],
        ["doc_id", "text"],
    )
    out = {(r["doc_a"], r["doc_b"]): r["dist"] for r in fuzzy_pairs(docs).collect()}
    assert (1, 2) in out and out[(1, 2)] <= 5
    assert (1, 4) not in out  # blocked away
    assert (1, 3) not in out  # same block but head distance > 5


def test_events_twap_weighting(spark):
    # type A: value 10 held 100s, value 30 held 300s (capped at 600) -> twap 25
    rows = [
        (0, 1, "A", "2024-01-01 00:00:00", 10.0),
        (1, 1, "A", "2024-01-01 00:01:40", 30.0),
        (2, 1, "A", "2024-01-01 00:06:40", 99.0),  # last: no interval, drops
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from pyspark.sql import Window as W
    win = W.partitionBy("event_type").orderBy("ts", "event_id")
    lead_us = F.lead(F.unix_micros("ts")).over(win)
    gapped = ev.withColumn(
        "w_us",
        F.when(lead_us.isNotNull(),
               F.least(lead_us - F.unix_micros("ts"), F.lit(600_000_000))),
    ).where(F.col("w_us").isNotNull())
    num = F.sum(F.col("value").cast("decimal(18,6)") * F.col("w_us"))
    den = F.sum("w_us")
    r = gapped.groupBy("event_type").agg(
        (num.cast("double") / den.cast("double")).alias("twap")
    ).collect()[0]
    assert abs(r["twap"] - (10 * 100 + 30 * 300) / 400) < 1e-9


def test_jaccard_prefix_matches_allpairs(spark, docs):
    """Prefix filtering is recall-EXACT: results must equal the
    any-shared-shingle exact join at the same threshold."""
    from semantik_spark.operators.dedup import jaccard_prefix_pairs, ngram_jaccard_pairs

    t = 0.5
    pref = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_prefix_pairs(docs, n=3, threshold=t).collect()}
    full = {(r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
            for r in ngram_jaccard_pairs(docs, n=3, threshold=t).collect()}
    assert pref == full and len(pref) >= 1  # exact dup pair (1,2) present


def test_purchase_attribution_shares(spark):
    import __spark_entry__ as em

    rows = [
        (0, 1, "view", "2024-01-01 00:00:00", 0.0),
        (1, 1, "purchase", "2024-01-01 00:01:00", 5.0),   # last-touch: view
        (2, 2, "purchase", "2024-01-01 00:00:00", 5.0),   # opens session: direct
    ]
    # drive the wrapper's logic through a temp parquet dir
    import tempfile, shutil, os
    d = tempfile.mkdtemp()
    try:
        ev = spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts", "value"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {r["touch"]: (r["n_purchases"], r["share"])
               for r in em.q_purchase_attribution(spark, d).collect()}
        assert out == {"view": (1, 0.5), "direct": (1, 0.5)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_weighted_sample_proportionality(spark):
    from semantik_spark.operators.training import weighted_sample

    # 900 light rows (w=1) vs 100 heavy rows (w=100): heavy mass is
    # ~92% of the total, so a 50-draw WOR sample should be dominated
    # by heavy rows (deterministic given the hash keys)
    docs = spark.createDataFrame(
        [(i, 1 if i < 900 else 100) for i in range(1000)], ["doc_id", "n_chars"]
    )
    out = weighted_sample(docs, k=50).collect()
    assert len(out) == 50
    heavy = sum(1 for r in out if r["weight"] == 100)
    assert heavy >= 35
    # ranks are dense 1..50
    assert sorted(r["rank"] for r in out) == list(range(1, 51))


def test_weighted_sample_excludes_nonpositive(spark):
    from semantik_spark.operators.training import weighted_sample

    docs = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10)], ["doc_id", "n_chars"]
    )
    out = weighted_sample(docs, k=10).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_label_propagation_separates_bridged_cliques(spark):
    """Two 4-cliques joined by ONE bridge edge: connected components
    would merge them into a single cluster; neighborhood-majority LPA
    must keep two communities (the bridge is outvoted 3-to-1)."""
    from semantik_spark.operators.graph import label_propagation

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.id: r.community for r in label_propagation(e, iterations=4).collect()}
    left = {out[i] for i in (1, 2, 3, 4)}
    right = {out[i] for i in (10, 11, 12, 13)}
    assert left == {1}, left     # min-label tie rule pulls cliques to 1
    assert right == {10}, right
    assert left != right


def test_label_propagation_deterministic_across_runs(spark):
    from semantik_spark.operators.graph import label_propagation

    edges = [(i, (i + 1) % 9) for i in range(9)] + [(0, 4), (2, 6)]
    e = spark.createDataFrame(edges, ["src", "dst"]).repartition(7)
    a = sorted(map(tuple, label_propagation(e, iterations=3).collect()))
    b = sorted(map(tuple, label_propagation(e.repartition(3), iterations=3).collect()))
    assert a == b
