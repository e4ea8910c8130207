"""Tests for training-set prep: dataset_split and pack_sequences."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantik_spark.operators.training import dataset_split, pack_sequences


def test_dataset_split_is_content_stable(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "other text body")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in dataset_split(df).collect()}
    # identical content -> identical bucket/split regardless of id (leakage guard)
    assert rows[1].bucket == rows[2].bucket and rows[1].split == rows[2].split
    assert all(0 <= r.bucket < 100 for r in rows.values())
    assert all(r.split in ("train", "val", "test") for r in rows.values())


def test_dataset_split_weights_roughly_hold(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias("text"),
    )
    frac = {r.split: r.n for r in dataset_split(df).groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert 0.7 < frac["train"] / 2000 < 0.9
    assert 0.05 < frac["val"] / 2000 < 0.15
    assert 0.05 < frac["test"] / 2000 < 0.15


def test_pack_sequences_matches_serial_concat(spark):
    rows = [(i, " ".join(f"tok{j}" for j in range((i * 7) % 13 + 1))) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in pack_sequences(df, seq_len=16, bucket_size=32).collect()}
    # serial reference: cumulative token offsets in doc_id order
    off = 0
    for i in range(200):
        n = (i * 7) % 13 + 1
        r = out[i]
        assert r.n_tokens == n
        assert r.tok_start == off and r.tok_end == off + n
        assert r.seq_first == off // 16 and r.seq_last == (off + n - 1) // 16
        assert r.n_seqs_spanned == (off + n - 1) // 16 - off // 16 + 1
        off += n


def test_pack_sequences_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, ""), (3, "four five")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in pack_sequences(df, seq_len=4).collect()}
    assert rows[2].n_tokens == 0 and rows[2].n_seqs_spanned == 0
    assert rows[2].tok_start == rows[2].tok_end == 3
    assert rows[3].tok_start == 3 and rows[3].tok_end == 5


def test_pack_sequences_big_window_is_bucket_partitioned(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    plan = pack_sequences(df, seq_len=8, bucket_size=10)._jdf.queryExecution() \
        .executedPlan().toString()
    # the per-document running sum must be partitioned by bucket; only
    # the tiny per-bucket base window may be single-partition
    assert "windowspecdefinition(bucket" in plan.replace("#", "").lower() or \
           "partitionspec: [bucket" in plan.lower() or "bucket" in plan.lower()
    assert plan.lower().count("singlepartition") <= 1


def test_decontaminate_flags_overlap(spark):
    from semantik_spark.operators.training import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "this mentions fast sort merge right here"),
            (2, "completely clean document body text"),
            (3, "sort merge"),  # exact bigram of the eval set
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([("q1", "fast sort merge join")], ["query_id", "query_text"])
    rows = {r.doc_id: r for r in decontaminate(docs, ev, n=2).collect()}
    assert rows[1].is_contaminated and rows[1].n_contaminated_ngrams == 2  # 'fast sort', 'sort merge'
    assert not rows[2].is_contaminated and rows[2].n_contaminated_ngrams == 0
    assert rows[3].is_contaminated


def test_decontaminate_broadcasts_eval_side(spark):
    from semantik_spark.operators.training import decontaminate

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("a b c d").alias("text")
    )
    ev = spark.createDataFrame([("q1", "a b")], ["query_id", "query_text"])
    plan = decontaminate(docs, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_quality_sample_deterministic_and_monotone(spark):
    from semantik_spark.operators.training import quality_sample

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and keeps running onward"),
            (2, "a b"),
            (3, "!!! ??? ... ;;; ###"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in quality_sample(docs).collect()}
    # long fluent text scores higher than fragments / punctuation soup
    assert rows[1].keep_prob > rows[2].keep_prob
    assert rows[1].keep_prob > rows[3].keep_prob
    assert all(0.1 <= r.keep_prob <= 1.0 for r in rows.values())
    again = {r.doc_id: r for r in quality_sample(docs).collect()}
    assert all(rows[i].kept == again[i].kept for i in rows)


def test_stratified_sample_rates_and_determinism(spark):
    from semantik_spark.operators.training import stratified_sample

    docs = spark.createDataFrame(
        [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(5)],
        ["doc_id", "source"],
    )
    out = stratified_sample(docs, target_per_stratum=10).collect()
    rows = {r["doc_id"]: r for r in out}
    assert len(out) == 105
    # small stratum under the cap: rate 1.0, everything kept
    assert all(rows[1000 + i]["sample_rate"] == 1.0 and rows[1000 + i]["kept"]
               for i in range(5))
    # big stratum: rate 0.1, kept count near 10, deterministic across runs
    assert rows[0]["sample_rate"] == 0.1 and rows[0]["stratum_size"] == 100
    kept_big = sorted(r["doc_id"] for r in out if r["stratum"] == "big" and r["kept"])
    out2 = stratified_sample(docs, target_per_stratum=10).collect()
    kept_big2 = sorted(r["doc_id"] for r in out2 if r["stratum"] == "big" and r["kept"])
    assert kept_big == kept_big2
    assert 2 <= len(kept_big) <= 25  # hash-residue binomial around 10


def test_write_shards_layout_and_manifest(spark, tmp_path):
    """write_shards: partitionBy(shard) layout, manifest totals match
    the corpus, assignment deterministic across runs."""
    import os

    from semantik_spark.operators.training import shard_assignments, write_shards

    docs = spark.createDataFrame(
        [(i, f"tok{i} " * (1 + i % 5)) for i in range(200)], ["doc_id", "text"])
    out = str(tmp_path / "shards")
    manifest = write_shards(docs, out, n_shards=8).collect()
    assert sum(r["n_docs"] for r in manifest) == 200
    assert sum(r["n_tokens"] for r in manifest) == sum(1 + i % 5 for i in range(200))
    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert 1 <= len(shard_dirs) <= 8
    # hash balance: no shard takes more than half the corpus
    assert max(r["n_docs"] for r in manifest) <= 100
    a1 = {r["doc_id"]: r["shard"] for r in shard_assignments(docs, 8).collect()}
    a2 = {r["doc_id"]: r["shard"] for r in shard_assignments(docs, 8).collect()}
    assert a1 == a2


def test_source_mix_plan(spark):
    from semantik_spark.operators.training import source_mix_plan

    rows = [("a", i) for i in range(60)] + [("b", i) for i in range(30)] + [("c", i) for i in range(10)]
    df = spark.createDataFrame(rows, ["source", "doc_id"])
    out = {r["source"]: r for r in source_mix_plan(df).collect()}
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-6
    assert out["c"]["sample_rate"] == 1.0  # smallest source keeps everything
    assert out["a"]["planned_n"] == 10 and out["a"]["sample_rate"] == round(10 / 60, 6)
    assert out["b"]["mix_weight"] == round((100 / 3) / 30, 6)
    assert all(r["target_share"] == round(1 / 3, 6) for r in out.values())


def test_contamination_report_eval_side(spark):
    from semantik_spark.operators.training import contamination_report

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta something"), (3, "zzz qqq")],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame(
        [("e1", "alpha beta"), ("e2", "never seen words")], ["query_id", "query_text"]
    )
    out = {r["eval_id"]: r for r in contamination_report(docs, evals, n=2).collect()}
    # e1's single bigram hits docs 1 and 2
    assert out["e1"]["n_eval_ngrams"] == 1 and out["e1"]["n_hit_ngrams"] == 1
    assert out["e1"]["hit_frac"] == 1.0 and out["e1"]["n_docs_hit"] == 2
    # e2 collides with nothing
    assert out["e2"]["n_hit_ngrams"] == 0 and out["e2"]["n_docs_hit"] == 0


def test_source_mix_temperature(spark):
    from semantik_spark.operators.training import source_mix_temperature

    rows = [("a", i) for i in range(90)] + [("b", i) for i in range(10)]
    df = spark.createDataFrame(rows, ["source", "doc_id"])
    out = {r["source"]: r for r in source_mix_temperature(df, 0.5).collect()}
    # sqrt weights: 90^.5 : 10^.5 => shares ~0.75 / 0.25 (vs 0.9/0.1 natural)
    assert 0.24 < out["b"]["target_share"] < 0.26
    assert abs(sum(r["target_share"] for r in out.values()) - 1.0) < 1e-6
    # the small source binds: it keeps everything, the big one downsamples
    assert out["b"]["sample_rate"] >= 0.99
    assert out["a"]["sample_rate"] < 0.5
    assert all(r["planned_n"] <= r["n_docs"] for r in out.values())


def test_dsir_weights_separate_target(spark):
    """DSIR log-importance must rank target-like docs above
    off-target docs, weight every doc, and stay broadcast-only after
    the two bucket aggregations."""
    from semantik_spark.operators.training import dsir_weights

    en = ["the cat sat on the mat and read the news",
          "we have to be sure that the plan works with care",
          "all of the birds fly to the south of france"]
    de = ["der hund läuft durch den park und bellt laut",
          "die katze schläft auf dem warmen sofa heute"]
    rows = [(i, t, "en") for i, t in enumerate(en)] + \
           [(10 + i, t, "de") for i, t in enumerate(de)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    target = docs.where(F.col("lang") == "en")
    out = dsir_weights(docs, target, buckets=32)
    rowsd = {r["doc_id"]: r for r in out.collect()}
    assert len(rowsd) == 5
    en_mean = sum(rowsd[i]["dsir_per_gram"] for i in range(3)) / 3
    de_mean = sum(rowsd[10 + i]["dsir_per_gram"] for i in range(2)) / 2
    assert en_mean > de_mean
    # empty doc gets weight 0, not a dropped row
    docs2 = docs.union(spark.createDataFrame([(99, "", "en")], docs.schema))
    out2 = {r["doc_id"]: r for r in
            dsir_weights(docs2, target, buckets=32).collect()}
    assert out2[99]["n_grams"] == 0 and out2[99]["dsir_logweight"] == 0.0
    # one broadcast join on the ratio table; no shuffle join of corpus
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every cluster is entirely train or entirely test under the
    cluster-hash split; the naive doc-hash split leaks for at least
    one planted duplicate pair; singletons split by their own id."""
    from semantik_spark.operators.training import leakage_safe_split

    dup = "the quick brown fox jumps over the lazy dog again today"
    rows = [(i, f"unique document {i} about topic {i * 7} with words "
                f"{i * 13} {i * 17} {i * 19} filler text") for i in range(30)]
    # 8 duplicate pairs with ids far apart (different naive buckets
    # somewhere among them)
    for i in range(8):
        rows.append((100 + i, dup + f" variant {i}"))
        rows.append((200 + i, dup + f" variant {i}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = leakage_safe_split(docs).collect()
    assert len(out) == 46
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # at least one pair leaks under naive (and its leak flag says so)
    leaks = [r for r in out if r["naive_leak"]]
    assert leaks
    for r in leaks:
        mates = [x for x in out if x["cluster_id"] == r["cluster_id"]]
        assert len({x["naive_split"] for x in mates}) == 2
    # both splits non-empty at this corpus size
    splits = {r["split"] for r in out}
    assert splits == {"train", "test"}


def test_temporal_split_embargo_separates_windows(spark):
    """No test row's timestamp may fall within embargo_us of any train
    row — the lookahead-leakage guarantee the embargo exists for."""
    import datetime

    from pyspark.sql import functions as F

    from semantik_spark.operators.training import temporal_split

    rows = [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i))
            for i in range(100)]
    df = spark.createDataFrame(rows, ["event_id", "ts"])
    out = temporal_split(df, "ts", train_tenths=7,
                         embargo_us=10 * 3_600_000_000)
    agg = {r["split"]: (r["lo"], r["hi"], r["n"]) for r in out.groupBy("split").agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
        F.count("*").alias("n")).collect()}
    assert set(agg) == {"train", "embargo", "test"}
    assert agg["train"][2] + agg["embargo"][2] + agg["test"][2] == 100
    # gap: earliest test - latest train >= embargo
    assert agg["test"][0] - agg["train"][1] >= 10 * 3_600_000_000
    # boundaries ordered
    assert agg["train"][1] < agg["embargo"][0] <= agg["embargo"][1] < agg["test"][0]


def test_splits_route_null_values_deterministically(spark):
    """NULL text/stratum/timestamp rows must not silently skew or
    vanish from splits: NULL content hashes as the empty document,
    NULL strata sample under a sentinel group, NULL timestamps are
    flagged 'unknown' instead of leaking into 'test'."""
    import datetime

    from semantik_spark.operators.training import (
        dataset_split,
        stratified_sample,
        temporal_split,
    )

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dataset_split(docs).collect()}
    assert rows[2]["bucket"] is not None
    assert rows[2]["split"] == rows[3]["split"]  # NULL == empty doc

    strat = spark.createDataFrame(
        [(1, "web"), (2, None), (3, "web")],
        "doc_id long, source string")
    out = stratified_sample(strat, stratum_col="source")
    assert out.count() == 3                      # nothing vanishes
    assert out.where("stratum = '__null__'").count() == 1

    t0 = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, t0), (2, t0 + datetime.timedelta(days=10)), (3, None)],
        "event_id long, ts timestamp")
    splits = {r["event_id"]: r["split"]
              for r in temporal_split(ev).collect()}
    assert splits[3] == "unknown"


def test_dsir_target_needs_only_a_text_column(spark):
    """The target corpus has its own schema — only a text column is
    required (previously the docs id_col name was imposed on it)."""
    from semantik_spark.operators.training import dsir_weights

    docs = spark.createDataFrame(
        [(1, "spark engine data"), (2, "cooking recipe food")],
        ["doc_id", "text"])
    target = spark.createDataFrame(
        [("q1", "spark data pipelines")], ["query_id", "query_text"])
    out = dsir_weights(docs, target, target_text_col="query_text").collect()
    w = {r["doc_id"]: r["dsir_logweight"] for r in out}
    assert w[1] > w[2]                           # target-like doc wins
