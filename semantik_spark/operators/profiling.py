"""Dataset profiling — per-column statistics in one scan.

The reference surfaces corpus-level stats (chunk counters, collection
counters — ``shared/database/repositories/collection_repository.py``
counter updates) but has no generic column profiler; a 100 TB ingest
pipeline needs one to catch schema drift, null storms, and cardinality
blow-ups before they poison a training run.

Shape: ONE aggregate pass over the fact table computes every measure
for every profiled column as a single wide row (map-side partial
aggregation, no shuffle of the raw data — only the one-row exchange of
the partial aggregates), then an in-row ``stack`` unpivot turns it
into one output row per column. Nothing touches the driver.

Scale note: ``count(DISTINCT x)`` over several columns expands the
input (one Expand row per distinct-column per input row — a 5× blow-up
when profiling 5 columns). That is exact-by-construction, which the
DuckDB oracle needs; at 100 TB swap ``exact=False`` to use
``approx_count_distinct`` (HyperLogLog++, no Expand, mergeable) — the
profile's consumers tolerate ±2% cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str],
                    exact: bool = True) -> DataFrame:
    """column_name, n_rows, n_nulls, n_distinct, min_val, max_val,
    avg_val — numeric-column profile, one row per profiled column.

    min/max/avg are cast to double so every profiled column shares one
    output schema; avg is rounded to 6 dp for engine portability.
    """
    # NOT spread() (r13 optimization pass): avg_val is a DOUBLE mean,
    # and a repartition changes its accumulation order — measured at
    # sf0.01, one column's 6-dp avg moved by 1e-6 against the oracle.
    # The parallelism win (2.5s → 2.1s local) is not worth an
    # order-dependent float aggregate; the exact-integer operators
    # (CDC, span dedup) keep their spread.
    total = F.count(F.lit(1))
    aggs = [total.alias("__n_rows")]
    for c in columns:
        col = F.col(c)
        aggs.append((total - F.count(col)).alias(f"__nulls_{c}"))
        if exact:
            aggs.append(F.countDistinct(col).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"__nd_{c}"))
        aggs.append(F.min(col).cast("double").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("double").alias(f"__max_{c}"))
        aggs.append(F.round(F.avg(col.cast("double")), 6).alias(f"__avg_{c}"))
    wide = df.agg(*aggs)

    stack_args = []
    for c in columns:
        stack_args.append(f"'{c}', __nulls_{c}, __nd_{c}, __min_{c}, __max_{c}, __avg_{c}")
    stacked = wide.selectExpr(
        "__n_rows as n_rows",
        f"stack({len(columns)}, "
        + ", ".join(stack_args)
        + ") as (column_name, n_nulls, n_distinct, min_val, max_val, avg_val)",
    )
    return stacked.select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_val", "max_val", "avg_val",
    )


def corpus_drift_psi(ref: DataFrame, cur: DataFrame, buckets: int = 32,
                     text_col: str = "text") -> DataFrame:
    """Population Stability Index between two corpus snapshots over a
    hashed-token distribution — the drift monitor a continuously-fed
    training pipeline runs between yesterday's corpus and today's
    (PSI is the standard model-monitoring drift score: <0.1 stable,
    0.1-0.25 moderate shift, >0.25 investigate).

      bins       token occurrences hashed into ``buckets`` (hash60 —
                 portable), add-one smoothed so empty bins are defined
      p/q        bin fraction in cur/ref (exact counts, double division)
      psi_term   round((p_cur - p_ref) * ln(p_cur / p_ref), 6) per bin
                 — each term >= 0, quantized BEFORE the sum
      psi_total  exact DECIMAL sum of the rounded terms (order-
                 independent, engine-portable; same discipline as the
                 NB/logreg decimal sums)

    Output: one row per bucket (bucket, n_ref, n_cur, psi_term,
    psi_total — total repeated per row for single-pass consumption).

    Scale: two corpus-linear token scans, each collapsing map-side into
    ``buckets`` counters; everything after is arithmetic on a
    ``buckets``-row frame (the global window is over those rows only).
    """
    from semantik_spark.functions.hashing import hash60

    def counts(df: DataFrame, name: str) -> DataFrame:
        toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                        lambda t: F.length(t) > 0)
        return (
            df.select(F.explode(toks).alias("tok"))
            .select(F.pmod(hash60(F.concat(F.lit("psi:"), F.col("tok"))),
                           F.lit(buckets)).cast("int").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias(name))
        )

    spark = ref.sparkSession
    allb = spark.range(buckets).select(F.col("id").cast("int").alias("bucket"))
    j = (
        allb.join(counts(ref, "_nr"), "bucket", "left")
        .join(counts(cur, "_nc"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("_nr"), F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce(F.col("_nc"), F.lit(0)).cast("bigint").alias("n_cur"),
        )
    )
    w = Window.partitionBy()
    smoothed = j.select(
        "bucket", "n_ref", "n_cur",
        ((F.col("n_ref") + 1).cast("double")
         / (F.sum("n_ref").over(w) + F.lit(buckets)).cast("double")).alias("_q"),
        ((F.col("n_cur") + 1).cast("double")
         / (F.sum("n_cur").over(w) + F.lit(buckets)).cast("double")).alias("_p"),
    )
    termed = smoothed.select(
        "bucket", "n_ref", "n_cur",
        F.round((F.col("_p") - F.col("_q")) * F.log(F.col("_p") / F.col("_q")), 6)
        .cast("decimal(12,6)").alias("psi_term"),
    )
    return termed.select(
        "bucket", "n_ref", "n_cur",
        F.col("psi_term").cast("double").alias("psi_term"),
        F.sum("psi_term").over(w).cast("double").alias("psi_total"),
    )


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit audit (Benford 1938; the standard
    forensic screen for fabricated or truncated monetary data): the
    leading significant digit of naturally-occurring multi-magnitude
    amounts follows P(d) = log10(1 + 1/d); a large chi-square against
    that law flags synthetic, capped, or hand-entered figures.

    Only strictly-positive values in [1e-18, 1e32) participate
    (zero/negative amounts have no leading significant digit; the
    bounds are the two scan scales' ranges, documented below). Every
    digit comes from an exact fixed-point decimal-string scan — no
    float log10/pow, whose ULP disagreements between engines would
    flip digits at powers of ten, and no floor()→BIGINT, which
    overflows past ~9.2e18. Values ≥ 1 scan at DECIMAL(38,6) (range
    bound 1e32); values in (0,1) take their first SIGNIFICANT digit
    (0.042 → 4) at DECIMAL(38,18), so positives below 1e-18 round to
    zero and are excluded. Output: one row per
    digit 1-9 — n, observed_pct, expected_pct, chi2_term =
    (n - Np)²/(Np), and chi2_total repeated per row (rounded-term
    DECIMAL sum, the corpus_drift_psi discipline; df = 8 → 15.51 at
    α=0.05).

    Scale: one scan collapsing map-side into 9 counters; everything
    after is arithmetic on a 9-row frame.
    """
    v = F.col(value_col)
    digit = F.when(
        v >= 1,
        # >= 1: the same exact fixed-point decimal-string scan as the
        # sub-1 branch, at integer-friendly scale — NOT floor()->BIGINT,
        # which overflows at ~9.2e18 (ANSI error / legacy NULL) while
        # DuckDB raises: the very count-product class this module's
        # guards exist for. DECIMAL(38,6) admits values to 1e32 (the
        # audit's documented upper bound); the 6-dp half-up render
        # defines the knife-edge deterministically on both engines
        # (9.9999996 renders "10.000000" -> digit 1)
        F.nullif(
            F.regexp_extract(v.cast("decimal(38,6)").cast("string"),
                             "[1-9]", 0),
            F.lit("")).cast("int"),
    ).otherwise(
        # (0,1): fixed-point decimal render (never scientific
        # notation), first non-zero digit char
        F.nullif(
            F.regexp_extract(v.cast("decimal(38,18)").cast("string"),
                             "[1-9]", 0),
            F.lit("")).cast("int")
    )
    counts = (
        df.where((v > 0) & (v < F.lit(1e32)))
        .select(digit.alias("digit"))
        .where(F.col("digit").isNotNull())
        .groupBy("digit").agg(F.count("*").cast("bigint").alias("n"))
    )
    spark = df.sparkSession
    alld = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    full = alld.join(counts, "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).cast("bigint").alias("n"))
    w = Window.partitionBy()
    expected = F.log10(F.lit(1.0) + 1.0 / F.col("digit"))
    withp = full.select(
        "digit", "n",
        F.sum("n").over(w).alias("_N"),
        expected.alias("_p"),
    )
    termed = withp.select(
        "digit", "n",
        F.round(F.col("n") / F.col("_N"), 6).alias("observed_pct"),
        F.round("_p", 6).alias("expected_pct"),
        F.round(
            F.pow(F.col("n") - F.col("_N") * F.col("_p"), 2)
            / (F.col("_N") * F.col("_p")), 6
        ).cast("decimal(18,6)").alias("chi2_term"),
    )
    return termed.select(
        "digit", "n", "observed_pct", "expected_pct",
        F.col("chi2_term").cast("double").alias("chi2_term"),
        F.sum("chi2_term").over(w).cast("double").alias("chi2_total"),
    )


def corpus_drift_jsd(ref: DataFrame, cur: DataFrame, top_k: int = 20,
                     text_col: str = "text") -> DataFrame:
    """Jensen-Shannon divergence between two corpus snapshots over the
    RAW token distribution, with per-term drift attribution — the
    companion to corpus_drift_psi: PSI watches hashed buckets (cheap,
    anonymous), JSD names the tokens that moved. Bounded in [0, ln 2],
    symmetric, defined even where one side has zero mass (no smoothing
    needed — 0·ln 0 = 0 by continuity).

      contrib(t) = ½ p ln(p/m) + ½ q ln(q/m),  m = (p+q)/2
      jsd_total  = Σ_t contrib(t)

    p, q are exact count ratios; contributions round to 9 dp and sum
    as DECIMAL over the vocabulary (order-independent), total at 6 dp.
    Output: the ``top_k`` terms by contribution (DESC, term ASC ties)
    with n_ref, n_cur, contrib (9 dp as double), and the repeated
    jsd_total — the "what changed" report, not just the score.

    Scale: two corpus-linear token scans collapsing map-side into
    vocab-bounded count tables; one full-outer merge on term (vocab-
    scale shuffle); top-k is TakeOrdered. Nothing after the scans
    exceeds vocabulary size.
    """
    def counts(df: DataFrame, out: str) -> DataFrame:
        toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                        lambda t: F.length(t) > 0)
        return (
            df.select(F.explode(toks).alias("term"))
            .groupBy("term")
            .agg(F.count("*").cast("bigint").alias(out))
        )

    merged = (
        counts(ref, "n_ref").join(counts(cur, "n_cur"), "term", "full_outer")
        .na.fill({"n_ref": 0, "n_cur": 0})
    )
    tot = merged.agg(F.sum("n_ref").cast("bigint").alias("tr"),
                     F.sum("n_cur").cast("bigint").alias("tc"))
    base = merged.crossJoin(F.broadcast(tot))
    p = F.col("n_ref").cast("double") / F.col("tr")
    q = F.col("n_cur").cast("double") / F.col("tc")
    m = (p + q) / 2
    contrib = (
        F.when(F.col("n_ref") > 0, F.lit(0.5) * p * F.log(p / m))
        .otherwise(F.lit(0.0))
        + F.when(F.col("n_cur") > 0, F.lit(0.5) * q * F.log(q / m))
        .otherwise(F.lit(0.0))
    )
    scored = base.select(
        "term", "n_ref", "n_cur",
        F.round(contrib, 9).cast("decimal(20,9)").alias("c9"))
    # decimal round before the cast (half-point-exact on both engines)
    total = scored.agg(
        F.round(F.sum("c9"), 6).cast("double").alias("jsd_total"))
    return (
        scored.orderBy(F.desc("c9"), F.asc("term")).limit(top_k)
        .crossJoin(F.broadcast(total))
        .select("term", "n_ref", "n_cur",
                F.col("c9").cast("double").alias("contrib"), "jsd_total")
    )


def market_concentration_hhi(lineitem: DataFrame, supplier: DataFrame,
                             nation: DataFrame) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per nation —
    the antitrust/market-structure summary (DoJ bands: < 1500
    unconcentrated, 1500–2500 moderate, > 2500 concentrated on the
    ×10000 scale): HHI = 10000 · Σ_s share_s², share over supplier
    revenue (l_extendedprice·(1−l_discount), the TPC-H revenue form).

    Output: one row per nation — n_name, n_suppliers, total_revenue
    (2 dp), top_share (6 dp), hhi (6 dp).

    Determinism: per-supplier revenue aggregates in DECIMAL (exact);
    shares are decimal/decimal → double divisions; share² terms round
    at 9 dp and sum as DECIMAL per nation.

    Scale: one lineitem scan with map-side combine on suppkey (the
    natural key, no skew — suppliers are many) → broadcast joins to
    supplier/nation dims → nation-level groupBy over the
    SUPPLIER-bounded table. Nothing after the scan is corpus-sized.
    """
    # widen to DECIMAL BEFORE the multiply/sum (the pricing_summary
    # discipline, r12 review): sum(double)::DECIMAL was a knife-edge —
    # engine-specific double accumulation order could flip the 2-dp
    # cast at an exact half-cent; the decimal sum is exact and
    # order-independent on both engines
    rev = (
        lineitem.groupBy("l_suppkey")
        .agg(F.sum((F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1).cast("decimal(8,2)")
                       - F.col("l_discount").cast("decimal(8,2)")))
                   .cast("decimal(30,4)"))
             .cast("decimal(18,2)").alias("srev"))
    )
    base = (
        rev.join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
                 rev.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    ntot = base.groupBy("n_name").agg(
        F.sum("srev").cast("decimal(18,2)").alias("trev"),
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.max("srev").alias("maxrev"),
    )
    share2 = (
        base.join(ntot.select("n_name", "trev"), "n_name")
        .select("n_name",
                F.round((F.col("srev").cast("double")
                         / F.col("trev").cast("double"))
                        * (F.col("srev").cast("double")
                           / F.col("trev").cast("double")), 9)
                .cast("decimal(20,9)").alias("s2"))
        .groupBy("n_name")
        .agg(F.sum("s2").cast("decimal(28,9)").alias("ss"))
    )
    return (
        ntot.join(share2, "n_name")
        .select(
            "n_name", "n_suppliers",
            F.round(F.col("trev").cast("double"), 2).alias("total_revenue"),
            F.round(F.col("maxrev").cast("double")
                    / F.col("trev").cast("double"), 6).alias("top_share"),
            F.round(F.lit(10000.0) * F.col("ss").cast("double"), 6)
            .alias("hhi"),
        )
    )


def referential_integrity(pairs: list) -> DataFrame:
    """Foreign-key orphan audit across a star/snowflake schema — the
    load-time data-quality gate (every warehouse runs one before
    letting a batch promote): for each (child_df, fk_col, child_name,
    parent_df, pk_col, parent_name) relation, count child rows whose
    key has no parent.

    NULL fks count separately (a null key is a different defect than a
    dangling one). Output: one row per relation — relation (child.fk
    -> parent.pk), n_child, n_null_fk, n_orphans, orphan_pct (6 dp).

    Scale: each relation is one aggregate over a LEFT SEMI check —
    expressed as child-minus-matched via a left join on the parent's
    DISTINCT key (dimension-sized, broadcastable); relations union at
    the end. Nothing quadratic; fact tables scanned once per relation
    (at 100 TB, co-group the relations sharing a child in one pass).
    """
    outs = []
    for child, fk, cname, parent, pk, pname in pairs:
        pkeys = parent.select(F.col(pk).alias("__pk")).distinct()
        j = child.select(F.col(fk).alias("__fk")).join(
            pkeys, F.col("__fk") == F.col("__pk"), "left")
        outs.append(j.agg(
            F.lit(f"{cname}.{fk} -> {pname}.{pk}").alias("relation"),
            F.count("*").cast("bigint").alias("n_child"),
            F.sum(F.col("__fk").isNull().cast("int")).cast("bigint")
            .alias("n_null_fk"),
            F.sum((F.col("__fk").isNotNull() & F.col("__pk").isNull())
                  .cast("int")).cast("bigint").alias("n_orphans"),
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "relation", "n_child", "n_null_fk", "n_orphans",
        F.round(F.col("n_orphans").cast("double") / F.col("n_child"), 6)
        .alias("orphan_pct"),
    )
