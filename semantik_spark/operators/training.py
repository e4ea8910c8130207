"""Training-set preparation operators: deterministic dataset splits and
concat-and-chunk sequence packing.

These are the two ops that sit between a curated corpus and an LLM
training run:

* ``dataset_split`` — reproducible train/val/test assignment by content
  hash, so the split is stable across re-runs and machines (no RNG, no
  sampling state).
* ``pack_sequences`` — the standard pretraining prep: documents are
  laid out on one global token axis in a deterministic order and cut
  into fixed-length sequences; each document row reports its token span
  and the sequence ids it lands in.

Scale note (pack_sequences): the naive layout is a global
``Window.orderBy`` cumulative sum — a single-partition sort, the exact
serialization point the BM25 term_id fix removed. Instead the global
prefix sum is two-level: per-bucket token totals (tiny aggregate) are
turned into bucket base offsets and broadcast back, and the within-
bucket running sum is a window partitioned by bucket — every partition
works in parallel, no global sort. With doc_id-range buckets the
layout is identical to the serial concat order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semantik_spark.functions.caching import cache
from semantik_spark.functions.hashing import hash60
from semantik_spark.functions.parallel import spread
from semantik_spark.functions.text import raw_tokens


def dataset_split(docs: DataFrame, weights: tuple[int, int, int] = (80, 10, 10),
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc_id, bucket (0-99), split — stable hash split on the CONTENT
    hash (not the id), so re-ingesting the same document under a new id
    cannot move it across the train/test boundary (leakage guard).

    Pure per-row expressions; no shuffle.
    """
    train, val, _ = weights
    # NULL content hashes as the EMPTY document (coalesce): hash60 of
    # NULL is NULL, which would fall through both when() branches and
    # silently concentrate every failed-extraction row in 'test'
    bucket = (hash60(F.coalesce(F.col(text_col), F.lit("")))
              % 100).cast("int")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        bucket.alias("bucket"),
        F.when(bucket < train, "train")
        .when(bucket < train + val, "val")
        .otherwise("test").alias("split"),
    )


def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   id_col: str = "doc_id", text_col: str = "text",
                   bucket_size: int = 1024) -> DataFrame:
    """Concat-and-chunk packing: documents ordered by doc_id form one
    token stream; sequences are the ``seq_len``-sized slices of it.

    Returns one row per document: doc_id, n_tokens, tok_start, tok_end
    (global token offsets), seq_first, seq_last (sequence ids the doc
    spans — a doc crossing a boundary appears in both, which is what
    concat-and-chunk training does), n_seqs_spanned.

    The global prefix sum is two-level (see module docstring):
    ``doc_id // bucket_size`` buckets give per-bucket totals, their
    running total (tiny window over ~n_docs/bucket_size rows) is
    broadcast back as each bucket's base offset, and the intra-bucket
    cumsum runs partitioned by bucket.
    """
    toks = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.size(raw_tokens(text_col)).cast("bigint").alias("n_tokens"),
    ).withColumn("bucket", (F.col("doc_id") / bucket_size).cast("bigint"))

    per_bucket = toks.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_toks"))
    # running offset over buckets: the window is over n_docs/bucket_size
    # rows only — driver-scale, not corpus-scale
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bases = per_bucket.select(
        "bucket", F.coalesce(F.sum("bucket_toks").over(wb), F.lit(0)).alias("base")
    )
    wi = Window.partitionBy("bucket").orderBy("doc_id") \
               .rowsBetween(Window.unboundedPreceding, -1)
    out = (
        toks.join(F.broadcast(bases), "bucket")
        .withColumn("tok_start", F.col("base") + F.coalesce(F.sum("n_tokens").over(wi), F.lit(0)))
        .withColumn("tok_end", F.col("tok_start") + F.col("n_tokens"))
    )
    return out.select(
        "doc_id", "n_tokens", "tok_start", "tok_end",
        F.floor(F.col("tok_start") / seq_len).cast("bigint").alias("seq_first"),
        F.floor((F.col("tok_end") - 1) / seq_len).cast("bigint").alias("seq_last"),
    ).withColumn(
        "n_seqs_spanned",
        F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(
            F.col("seq_last") - F.col("seq_first") + 1
        ).cast("int"),
    )


def decontaminate(docs: DataFrame, eval_set: DataFrame, n: int = 2,
                  id_col: str = "doc_id", text_col: str = "text",
                  eval_text_col: str = "query_text") -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    n-word shingle with the evaluation set (the train-test overlap
    scrub every LLM data pipeline runs before training; GPT-3 appendix
    C / PaLM-style n-gram collision rule).

    Returns doc_id, n_contaminated_ngrams (distinct overlapping
    shingles), is_contaminated.

    Scale: the eval side is tiny by definition — its distinct shingle
    set broadcasts; the corpus side is explode + broadcast-hash
    semi-join + one groupBy(doc_id). No corpus-vs-corpus anything.
    """
    from semantik_spark.functions.text import word_shingles

    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )
    eval_sh = eval_set.select(
        F.explode(word_shingles(eval_text_col, n)).alias("shingle")
    ).distinct()
    hits = (
        doc_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("n_contaminated_ngrams"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated_ngrams", F.lit(0)).cast("int").alias("n_contaminated_ngrams"),
        )
        .withColumn("is_contaminated", F.col("n_contaminated_ngrams") > 0)
    )


def quality_sample(docs: DataFrame, floor_prob: float = 0.1,
                   id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality-weighted importance sampling (RefinedWeb/FineWeb-style):
    each document is kept with probability floor_prob + (1-floor_prob)
    * quality_score — but deterministically, by comparing a content-hash
    residue against the integer-scaled probability instead of drawing
    randoms. Re-runs and engines agree bit-for-bit: the score is
    rounded to 6 dp first and the comparison is integer vs integer
    (floor(p*1e6) vs hash60 % 1e6), so no float-boundary flips.

    Returns doc_id, quality_score, keep_prob, kept.

    Scale: map-only — the quality features and the hash are per-row
    expressions; sampling 100 TB needs no coordination at all.
    """
    from semantik_spark.operators.textanalysis import quality_features

    q = quality_features(docs, id_col=id_col, text_col=text_col)
    qs = F.round(F.col("quality_score"), 6)
    p = F.round(F.lit(floor_prob) + (1.0 - floor_prob) * qs, 6)
    residue = hash60(F.concat(F.col("doc_id").cast("string"), F.lit("#sample"))) % 1000000
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(q, "doc_id")
        .select(
            "doc_id", qs.alias("quality_score"), p.alias("keep_prob"),
            (residue < F.floor(p * 1e6).cast("bigint")).alias("kept"),
        )
    )


def stratified_sample(docs: DataFrame, stratum_col: str = "source",
                      target_per_stratum: int = 50,
                      id_col: str = "doc_id", salt: str = "strat") -> DataFrame:
    """Balanced per-stratum cap sampling — the "even out the training
    mix across sources/languages" op every large-corpus pipeline runs:
    each stratum is downsampled to ~``target_per_stratum`` docs with
    rate min(1, target/n_s), so dominant sources stop swamping the mix.

    Deterministic like quality_sample: the keep decision compares a
    content-hash residue against the integer-scaled rounded rate
    (floor(rate*1e6) vs hash60 % 1e6) — re-runs and engines agree
    bit-for-bit, no RNG.

    Returns doc_id, stratum, stratum_size, sample_rate, kept.

    Scale: stratum sizes come from a groupBy count (map-side combined,
    |strata| rows) broadcast back onto the scan — NOT a window over the
    stratum, which would shuffle the full corpus by a skewed key. The
    kept-decision itself is map-only.
    """
    # NULL strata coalesce to a sentinel BEFORE the groupBy: groupBy
    # treats NULLs as one group but the equi-join back never matches
    # NULL keys, so NULL-stratum rows would silently vanish (neither
    # kept nor rejected) from the sampled mix
    stratum = F.coalesce(F.col(stratum_col).cast("string"),
                         F.lit("__null__"))
    sizes = (
        docs.groupBy(stratum.alias("stratum"))
        .agg(F.count("*").cast("bigint").alias("stratum_size"))
    )
    rate = F.round(
        F.least(F.lit(1.0), F.lit(float(target_per_stratum)) / F.col("stratum_size")), 6
    )
    residue = hash60(F.concat(F.col(id_col).cast("string"), F.lit(f"#{salt}"))) % 1000000
    return (
        docs.select(F.col(id_col).alias("doc_id"), stratum.alias("stratum"))
        .join(F.broadcast(sizes), "stratum")
        .select(
            "doc_id", "stratum", "stratum_size",
            rate.alias("sample_rate"),
            (residue < F.floor(rate * 1e6).cast("bigint")).alias("kept"),
        )
    )


def shard_assignments(docs: DataFrame, n_shards: int = 16,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic hash sharding for training-corpus output: shard =
    hash60(doc_id) % n_shards (balanced in expectation, stable across
    runs/engines), with per-doc token counts carried for manifesting.
    Returns doc_id, shard, n_tokens."""
    from semantik_spark.functions.text import whitespace_tokens

    return docs.select(
        F.col(id_col).alias("doc_id"),
        (hash60(F.concat(F.col(id_col).cast("string"), F.lit("#shard")))
         % n_shards).cast("int").alias("shard"),
        F.size(whitespace_tokens(text_col)).cast("bigint").alias("n_tokens"),
    )


def write_shards(docs: DataFrame, out_dir: str, n_shards: int = 16,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Write the curated corpus as ``n_shards`` hash-assigned parquet
    shards (partitionBy(shard) — one directory per shard, the layout
    data-loader fleets expect) and return the manifest: shard, n_docs,
    n_tokens. At 100 TB this is the terminal one-shuffle write of the
    pipeline; hash assignment avoids the global sort a size-balanced
    bin-packing would need while staying balanced in expectation."""
    assign = shard_assignments(docs, n_shards, id_col, text_col)
    out = docs.join(assign.select("doc_id", "shard", "n_tokens"),
                    docs[id_col] == assign["doc_id"]).drop(assign["doc_id"])
    out.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    spark = docs.sparkSession
    return (
        spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("n_tokens").cast("bigint").alias("n_tokens"))
        .orderBy("shard")
    )


def source_mix_plan(docs: DataFrame, source_col: str = "source",
                    token_col: str | None = None) -> DataFrame:
    """Domain-mixing planner: given the corpus's per-source composition,
    compute the sampling rate each source needs to hit a UNIFORM target
    mix (the degenerate but fully deterministic case of the weighted
    domain mixes used for LLM pretraining data — the planner's algebra
    is identical for any externally supplied weight vector).

    Per source: its current document share, the uniform target share,
    the mix weight target/current, and the down-sampling plan that
    realizes the target without up-sampling — the largest achievable
    uniform mix keeps min_source_count docs from every source, so
    planned_n = min over sources of n_docs and sample_rate =
    planned_n / n_docs (1.0 for the smallest source, <1 for the rest).

    Shape: one groupBy(source) over the corpus (map-side combined),
    then a broadcast of the tiny per-source table against its own
    1-row global aggregate — the 100 TB cost is the single scan.
    """
    weight_col = F.count("*") if token_col is None else F.sum(token_col)
    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        weight_col.cast("bigint").alias("n_docs")
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("n_sources"),
        F.min("n_docs").cast("bigint").alias("planned_n"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(F.col("n_docs") / F.col("n_total"), 6).alias("share"),
        F.round(F.lit(1.0) / F.col("n_sources"), 6).alias("target_share"),
        F.round((F.col("n_total") / F.col("n_sources")) / F.col("n_docs"), 6).alias("mix_weight"),
        F.col("planned_n"),
        F.round(F.col("planned_n") / F.col("n_docs"), 6).alias("sample_rate"),
    )


def contamination_report(docs: DataFrame, eval_set: DataFrame, n: int = 2,
                         id_col: str = "doc_id", text_col: str = "text",
                         eval_id_col: str = "query_id",
                         eval_text_col: str = "query_text") -> DataFrame:
    """The eval-side view of decontaminate: per evaluation item, how
    much of the training corpus collides with it — the report you act
    on when deciding whether to drop an eval item (vs decontaminate's
    per-train-doc view for dropping documents).

    Returns eval_id, n_eval_ngrams, n_hit_ngrams (eval shingles found
    anywhere in the corpus), hit_frac, n_docs_hit (distinct corpus docs
    sharing >= 1 shingle).

    Scale: identical shape to decontaminate reversed — the eval shingle
    set is still the broadcast side; the corpus explode is the scan;
    the two aggregates are map-side combined. n_docs_hit intentionally
    counts from the JOINED stream (corpus-side weight), never a
    corpus-wide distinct.
    """
    from semantik_spark.functions.text import word_shingles

    eval_sh = eval_set.select(
        F.col(eval_id_col).alias("eval_id"),
        F.explode(word_shingles(eval_text_col, n)).alias("shingle"),
    ).distinct()
    totals = eval_sh.groupBy("eval_id").agg(
        F.count("*").cast("int").alias("n_eval_ngrams")
    )
    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    ).distinct()
    hits = (
        doc_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("eval_id")
        .agg(
            F.count_distinct("shingle").cast("int").alias("n_hit_ngrams"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs_hit"),
        )
    )
    return (
        totals.join(hits, "eval_id", "left")
        .select(
            "eval_id",
            "n_eval_ngrams",
            F.coalesce("n_hit_ngrams", F.lit(0)).cast("int").alias("n_hit_ngrams"),
            F.round(F.coalesce("n_hit_ngrams", F.lit(0)) / F.col("n_eval_ngrams"), 6).alias("hit_frac"),
            F.coalesce("n_docs_hit", F.lit(0)).cast("bigint").alias("n_docs_hit"),
        )
    )


def source_mix_temperature(docs: DataFrame, temperature: float = 0.5,
                           source_col: str = "source") -> DataFrame:
    """Temperature-weighted domain mixing: target share of source i is
    n_i^tau / sum_j n_j^tau — tau=1 keeps the natural mix, tau=0 is the
    uniform mix of source_mix_plan, and intermediate tau (0.5 here, the
    multilingual-LM convention) up-weights small sources without
    flattening completely. The down-sampling realization picks the
    largest feasible total: scale = min_i(n_i / target_share_i), so the
    binding source keeps 100% and every planned_n_i = round(scale *
    target_share_i) <= n_i.

    Same shape as source_mix_plan: one groupBy(source) + a broadcast of
    the tiny per-source table's own aggregate.
    """
    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    w = F.pow(F.col("n_docs").cast("double"), F.lit(float(temperature)))
    weighted = per.withColumn("w", w)
    tot = weighted.agg(F.sum("w").alias("w_total"))
    shared = weighted.crossJoin(F.broadcast(tot)).withColumn(
        "target_share", F.col("w") / F.col("w_total")
    )
    scale = shared.agg(
        F.min(F.col("n_docs") / F.col("target_share")).alias("scale")
    )
    return shared.crossJoin(F.broadcast(scale)).select(
        "source", "n_docs",
        F.round("target_share", 6).alias("target_share"),
        F.floor(F.col("scale") * F.col("target_share")).cast("bigint").alias("planned_n"),
        F.round(F.floor(F.col("scale") * F.col("target_share")) / F.col("n_docs"), 6).alias("sample_rate"),
    )


def length_bins(docs: DataFrame, n_bins: int = 16, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Equi-depth length bucketing for batch packing: documents sorted
    by token count split into n_bins ntile buckets; per bucket the
    token-count extent and the padding waste a pad-to-bucket-max
    batcher would incur (the quantity length-bucketed batching
    minimizes vs naive global padding).

    bin, n_docs, min_tokens, max_tokens, sum_tokens, pad_waste —
    pad_waste = n_docs * max_tokens - sum_tokens.

    ntile is a global-order window (single-partition sort of (tokens,
    doc_id) pairs — 16 bytes/doc, so ~1.6 TB of SORT at 100 B docs:
    replace with approx percentile cut points + range join at that
    scale). Ties order by doc_id so both engines cut identically.
    """
    from semantik_spark.functions.text import whitespace_tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(whitespace_tokens(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = Window.orderBy("n_tokens", "doc_id")
    binned = toks.withColumn("bin", F.ntile(n_bins).over(w).cast("bigint"))
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("sum_tokens"),
        # count x max widens to DECIMAL(38,0) before multiplying (the
        # count-product overflow class fixed repo-wide)
        (F.count("*").cast("decimal(38,0)")
         * F.max("n_tokens").cast("decimal(38,0)")
         - F.sum("n_tokens").cast("decimal(38,0)"))
        .cast("bigint").alias("pad_waste"),
    )


def weighted_sample(docs: DataFrame, k: int = 50, id_col: str = "doc_id",
                    weight_col: str = "n_chars") -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    2006): each row gets key = ln(u)/w with u a deterministic
    hash-uniform in (0,1]; the k largest keys ARE a weight-proportional
    sample — so 'sample k docs proportional to length/quality' becomes
    a plain distributed top-k (TakeOrdered), no RNG, no rejection loop,
    reproducible across engines and runs.

    doc_id, weight, rank. ln(u)/w is the monotone log form of the
    textbook u^(1/w) key — same ordering, no underflow at tiny u/huge
    w. Zero/negative weights are excluded (undefined sampling mass).
    """
    from semantik_spark.functions.hashing import hash60

    u = (hash60(F.col(id_col).cast("string")) + F.lit(1)) / F.lit(float(2**60))
    keyed = (
        docs.where(F.col(weight_col) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(weight_col).cast("bigint").alias("weight"),
            (F.log(u) / F.col(weight_col)).alias("_key"),
        )
    )
    w = Window.orderBy(F.desc("_key"), F.asc("doc_id"))
    return (
        keyed.orderBy(F.desc("_key"), F.asc("doc_id")).limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("doc_id", "weight", "rank")
    )


def dsir_weights(docs: DataFrame, target: DataFrame, buckets: int = 64,
                 id_col: str = "doc_id", text_col: str = "text",
                 target_text_col: str | None = None) -> DataFrame:
    """DSIR data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw document by how target-like its hashed n-gram
    profile is, so a pre-training pipeline can resample toward a
    high-quality target corpus without training a classifier.

      features   unigrams + bigrams of the whitespace tokens, hashed
                 into ``buckets`` counts (the paper's hashed n-gram
                 feature space) via the portable hash60
      models     add-one-smoothed bucket distributions p_target / p_raw
                 (raw = the scored corpus itself)
      weight     log importance = Σ_grams log(p_t[b]/p_r[b]) — computed
                 as exact DECIMAL(12,6) sums of 6dp-rounded per-bucket
                 log ratios, so the score is order-independent and
                 engine-portable (same trick as the NB classifier)

    Shuffle profile at 100 TB: one map-side-combined aggregation per
    distribution (``buckets`` distinct keys — tiny), one broadcast of
    the ``buckets``-row log-ratio table, one doc_id-keyed aggregation
    for the per-doc sums. Nothing scales with corpus size except the
    two linear scans.

    Output: doc_id, n_grams, dsir_logweight (sum), dsir_per_gram
    (weight/n_grams, 6 dp) — resample by weight or threshold the
    per-gram normalization for length-invariant selection.
    """
    def gram_col(txt: str):
        toks = F.filter(
            F.split(F.lower(F.col(txt)), r"\s+"), lambda t: F.length(t) > 0
        )
        uni = F.transform(toks, lambda t: F.concat(F.lit("u:"), t))
        sz = F.size(toks)
        width = F.greatest(sz - 1, F.lit(0))
        bi = F.transform(
            F.arrays_zip(F.slice(toks, 1, width), F.slice(toks, 2, width)),
            lambda p: F.concat(F.lit("b:"), p["0"], F.lit(" "), p["1"]),
        )
        return F.concat(uni, bi)

    # spread() before the gram explode (the single-file scan otherwise
    # runs the per-gram md5 hashing in ONE task — guide §2.5), and
    # cache the narrow (doc_id, bucket) table: it feeds BOTH the raw
    # bucket distribution and the per-doc weight sums, which otherwise
    # re-ran the whole explode+hash corpus pass each (guide §5).
    raw_feats = cache(
        spread(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
            "doc_id",
        )
        .select("doc_id", F.explode(gram_col(text_col)).alias("g"))
        .select("doc_id", F.pmod(hash60("g"), F.lit(buckets)).alias("bucket"))
    )
    # the target's id is never used, so its schema needs ONLY a text
    # column (decontaminate's eval_text_col pattern) — previously the
    # docs id_col name was imposed on the target frame too
    t_txt = target_text_col or text_col
    t_counts = (
        target.select(F.explode(gram_col(t_txt)).alias("g"))
        .select(F.pmod(hash60("g"), F.lit(buckets)).alias("bucket"))
        .groupBy("bucket").agg(F.count("*").cast("bigint").alias("tc"))
    )
    r_counts = raw_feats.groupBy("bucket").agg(F.count("*").cast("bigint").alias("rc"))
    all_buckets = docs.sparkSession.range(buckets).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    ratio = (
        all_buckets.join(t_counts, "bucket", "left")
        .join(r_counts, "bucket", "left")
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("rc"), F.lit(0)) + 1)
                )
                + F.log(
                    (F.sum(F.coalesce(F.col("rc"), F.lit(0))).over(Window.partitionBy())
                     + F.lit(buckets)).cast("double")
                    / (F.sum(F.coalesce(F.col("tc"), F.lit(0))).over(Window.partitionBy())
                       + F.lit(buckets))
                ),
                6,
            ).cast("decimal(12,6)").alias("logratio"),
        )
    )
    per_doc = (
        raw_feats.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum("logratio").alias("w"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("w").cast("double"), F.lit(0.0)).alias("dsir_logweight"),
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("w").cast("double") / F.col("n_grams"), 6),
            ).otherwise(0.0).alias("dsir_per_gram"),
        )
    )


def leakage_safe_split(docs: DataFrame, test_buckets: int = 2,
                       n_buckets: int = 10, num_hashes: int = 16,
                       bands: int = 4, n: int = 3, threshold: float = 0.5,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Train/test split that CANNOT leak near-duplicates across the
    boundary: split assignment hashes the near-dup CLUSTER id, not the
    doc id, so every member of a duplicate cluster lands in the same
    split (the eval-contamination failure mode of naive per-doc
    splitting — a test doc whose near-copy sits in train scores as
    memorization, not generalization).

      clusters   MinHash-LSH pairs -> connected components
                 (dedup.duplicate_clusters); singletons are their own
                 cluster
      split      'test' iff hash60('split:' || cluster_id) mod
                 n_buckets < test_buckets, else 'train' — deterministic,
                 engine-portable, ~test_buckets/n_buckets test fraction
      naive_*    the same hash on doc_id, plus naive_leak = does this
                 doc's cluster STRADDLE splits under the naive rule —
                 the audit column that quantifies what cluster-hashing
                 fixed

    Output: doc_id, cluster_id, split, naive_split, naive_leak.

    Scale: the cluster pass is the banded LSH + CC machinery (see
    those entries); everything after is a hash expression and one
    window over cluster_id (near-dup clusters are tiny, skew-free).
    """
    from semantik_spark.functions.hashing import hash60
    from semantik_spark.operators.dedup import duplicate_clusters

    clusters = duplicate_clusters(docs, num_hashes, bands, n, threshold,
                                  id_col, text_col)
    base = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(clusters.select("doc_id", "cluster_id"), "doc_id", "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")))
    )

    def bucket(col: str) -> F.Column:
        return F.pmod(
            hash60(F.concat(F.lit("split:"), F.col(col).cast("string"))),
            F.lit(n_buckets),
        )

    tagged = base.select(
        "doc_id", "cluster_id",
        F.when(bucket("cluster_id") < test_buckets, F.lit("test"))
        .otherwise(F.lit("train")).alias("split"),
        F.when(bucket("doc_id") < test_buckets, F.lit("test"))
        .otherwise(F.lit("train")).alias("naive_split"),
    )
    w = Window.partitionBy("cluster_id")
    return tagged.withColumn(
        "naive_leak",
        F.min("naive_split").over(w) != F.max("naive_split").over(w),
    )


def calibrate_scores(scored: DataFrame, source_col: str = "source",
                     score_col: str = "quality_score",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-source quantile (rank) normalization of a quality score —
    the calibration step multi-source curation needs: raw heuristic
    scores are NOT comparable across sources (a webcrawl's median
    differs from a books corpus's), so thresholding the raw score
    over- or under-prunes per source. Mapping each doc to its
    within-source percentile puts every source on the same [0, 1]
    scale; a global keep-top-X% cut then removes the same fraction of
    every source (quantile normalization, the rank variant).

    Scores round to 6 dp before ranking and ties break by doc id, so
    the percentile is engine-portable. Returns (doc_id, source,
    score_col, calibrated).

    Scale: one window per source partition — sources are the natural
    partition key of a multi-source corpus, each window runs where its
    source's rows already live after one shuffle on source.
    """
    w = Window.partitionBy(source_col).orderBy(F.asc("_s"), F.asc(id_col))
    return (
        scored.withColumn("_s", F.round(F.col(score_col), 6))
        .select(
            id_col, source_col,
            F.col("_s").alias(score_col),
            F.round(F.percent_rank().over(w), 6).alias("calibrated"),
        )
    )


def temporal_split(df: DataFrame, ts_col: str = "ts",
                   train_tenths: int = 8,
                   embargo_us: int = 7 * 86_400_000_000) -> DataFrame:
    """Time-ordered train/test split with an EMBARGO gap — the
    backtesting-safe split (purged split, López de Prado 2018 §7):
    hash/cluster splits (dataset_split / leakage_safe_split) prevent
    CONTENT leakage, but a model evaluated on events contemporaneous
    with its training window still leaks through time — any feature
    with lookahead (rolling means, labels realized later) straddles
    the boundary. The embargo discards a gap after the cutoff so no
    test row's lookback window reaches training data.

    Cutoff = min_ts + train_tenths/10 of the [min, max] span, embargo
    = [cutoff, cutoff+embargo_us) — all exact integer-microsecond
    arithmetic from a 1-row min/max broadcast (a timestamp QUANTILE
    would interpolate in floating point and flake cross-engine; a
    span fraction is exact), so the row assignment is deterministic:
      train   ts <  cutoff
      embargo cutoff <= ts < cutoff + embargo_us   (discarded)
      test    ts >= cutoff + embargo_us

    Returns the input plus ``split`` (train/embargo/test) — map-only
    after the broadcast, composing with any downstream aggregation.
    """
    us = F.unix_micros(F.col(ts_col))
    span = df.agg(
        F.min(us).alias("_t0"), F.max(us).alias("_t1"))
    cutoff = F.col("_t0") + F.expr(
        f"((_t1 - _t0) * {int(train_tenths)}) div 10")
    return (
        df.crossJoin(F.broadcast(span))
        .withColumn(
            "split",
            # NULL timestamps fail BOTH when() predicates and would
            # silently land in 'test', violating the purged-split
            # guarantee for rows whose time is unknown — flag them
            F.when(us.isNull(), F.lit("unknown"))
            .when(us < cutoff, F.lit("train"))
            .when(us < cutoff + F.lit(embargo_us), F.lit("embargo"))
            .otherwise(F.lit("test")),
        )
        .drop("_t0", "_t1")
    )
