"""Distribution-comparison hypothesis tests — the statistical QA layer
a large-scale data pipeline runs before/after every transformation
(did the re-scrape shift the quality-score distribution? is conversion
independent of cohort?). All statistics reduce to exact integer counts
over a VALUE-LEVEL table (one row per distinct metric value), so the
heavy input scan is a single map-side-combined groupBy and everything
after is bounded by the metric's cardinality — quantize continuous
metrics (e.g. to cents) to keep that table small at 100 TB.

Determinism discipline (the repo-wide oracle contract): counts stay
BIGINT, rank sums use doubled-rank integers (so tie midpoints never
leave the integers), transcendental terms (exp in the KS tail) round
to 9 dp and accumulate as DECIMAL before the terminal 6-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semantik_spark.functions.parallel import spread

# Truncation depth of the Kolmogorov asymptotic series
# Q(λ) = 2 Σ_{j≥1} (-1)^{j-1} exp(-2 j² λ²): at j = 40 the dropped tail
# is < exp(-3200 λ²) — below 1e-9 for any λ the two-sided test can
# produce (λ ≥ 0.1), so the fixed unroll is exact at the 6-dp output.
_KS_TERMS = 40


def _value_level(df: DataFrame, group_col: str, value_col: str,
                 a, b) -> DataFrame:
    """One row per distinct value with per-group counts (n_a, n_b).

    NULL metric values are excluded HERE (not assumed away): a NULL
    would become a value-level row whose window position differs
    between engines (Spark ORDER BY sorts NULLS FIRST, DuckDB NULLS
    LAST), silently corrupting both the statistic and the cross-engine
    hash contract. The oracle twins carry the matching
    ``IS NOT NULL`` predicate.
    """
    g = F.col(group_col)
    return (
        df.where(g.isin([a, b]) & F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(F.when(g == a, 1).otherwise(0)).cast("bigint").alias("na"),
            F.sum(F.when(g == b, 1).otherwise(0)).cast("bigint").alias("nb"),
        )
    )


def ks_test_2samp(df: DataFrame, group_col: str, value_col: str,
                  group_a, group_b) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: D = sup_x |F_a(x) − F_b(x)|
    over the pooled empirical CDFs, with the asymptotic two-sided
    p-value Q(λ), λ = (√n_e + 0.12 + 0.11/√n_e)·D (Numerical Recipes
    §14.3; n_e = n_a·n_b/(n_a+n_b)) — the distribution-shift gate run
    between pipeline stages.

    D is EXACT: the sup is attained at a sample point, so scanning the
    value-level table's cumulative counts finds it with pure integer
    arithmetic (|c_a·n_b − c_b·n_a| / (n_a·n_b), maximized over the
    integer numerator). The p-value series terms round to 9 dp and sum
    as DECIMAL (fixed ascending order) so both engines agree bitwise.

    Output (1 row): group_a, group_b, n_a, n_b, ks_d (6 dp),
    p_value (6 dp).

    Scale: one input scan → value-level groupBy (map-side combined);
    the cumulative window runs over the metric-cardinality-bounded
    table (quantize continuous metrics). Nothing downstream sees the
    raw rows.
    """
    vl = _value_level(df, group_col, value_col, group_a, group_b)
    return ks_from_value_counts(vl, group_a, group_b)


def ks_from_value_counts(vl: DataFrame, group_a, group_b) -> DataFrame:
    """ks_test_2samp's statistic from an ALREADY-AGGREGATED value-level
    count table (v, na, nb) — the mergeable serve path
    (chi_square_from_counts' pattern): counts are a commutative
    monoid, so per-shard/per-epoch partial tables compose exactly via
    groupBy(v).sum before this fold. Feed DDSketch bucket indices as
    ``v`` for the constant-size incremental variant
    (stat_tests_from_sketch pins its accuracy against the exact
    test). Ordering of ``v`` must be the value order (bucket indices
    are monotone in the value, so they qualify)."""
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vl.select(
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
    )
    tot = vl.agg(F.sum("na").cast("bigint").alias("n_a"),
                 F.sum("nb").cast("bigint").alias("n_b"))
    # sup |ca/n_a - cb/n_b| = max |ca*n_b - cb*n_a| / (n_a*n_b): the
    # numerator is exact so the argmax never depends on doubles. The
    # operands widen to DECIMAL(38,0) BEFORE the product (the
    # assortativity overflow lesson, graph.py): at 100 TB row counts
    # ca*n_b can exceed the 9.2e18 BIGINT ceiling, where Spark wraps
    # silently while DuckDB errors — DECIMAL keeps both exact.
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    dmax = (
        cum.crossJoin(F.broadcast(tot))
        .select(F.abs(d38("ca") * d38("n_b")
                      - d38("cb") * d38("n_a")).alias("num"),
                "n_a", "n_b")
        .groupBy("n_a", "n_b")
        .agg(F.max("num").cast("decimal(38,0)").alias("num"))
    )
    d = F.col("num").cast("double") / (d38("n_a") * d38("n_b")).cast("double")
    ne = (d38("n_a") * d38("n_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    # lambda from the UNROUNDED exact rational D: ks_d is reported at
    # 6 dp, but sqrt(n_e) multiplies any report-rounding error back up
    # (5e-7 · sqrt(n_e) ≈ 0.02 at n_e ~ 2e9 — material p shift near
    # the decision region, and both engines would agree on the wrong
    # value, so the parity gate can't catch it)
    lam = (F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne)) * d
    return (
        dmax.select(
            F.lit(str(group_a)).alias("group_a"),
            F.lit(str(group_b)).alias("group_b"),
            "n_a", "n_b",
            F.round(d, 6).alias("ks_d"),
            lam.alias("lam"),
        )
        .withColumn("p_value", _ks_p_from_lam())
        .drop("lam")
    )


def _ks_p_from_lam() -> "F.Column":
    """Kolmogorov asymptotic p-value from the ``lam`` column: 40-term
    alternating series with 9-dp DECIMAL term rounds (engine-exact
    fold) and the small-lambda truncation guard — below lam = 0.1 the
    terms don't decay inside the unroll (at lam = 0 the partial sums
    oscillate 2,0,2,0 — p must be 1). ONE definition shared by
    ks_from_value_counts and ks_family_bh, so every knife-edge fix to
    the series lands in both paths at once."""
    term = lambda j: (  # noqa: E731
        F.round(F.exp(F.lit(-2.0 * j * j) * F.col("lam") * F.col("lam")), 9)
        .cast("decimal(20,9)") * F.lit(2 * (1 if j % 2 == 1 else -1))
    )
    series = term(1)
    for j in range(2, _KS_TERMS + 1):
        series = series + term(j)
    return (
        F.when(F.col("lam") < 0.1, F.lit(1.0))
        .otherwise(
            F.round(F.least(F.lit(1.0),
                            F.greatest(F.lit(0.0), series.cast("double"))),
                    6))
    )


def mann_whitney_u(df: DataFrame, group_col: str, value_col: str,
                   group_a, group_b) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test with tie correction —
    the nonparametric location test for "did values shift between
    cohorts" when distributions are skewed (ledger amounts, dwell
    times) and the t-test's normality assumption is garbage.

    Average ranks for ties stay EXACT via doubled ranks: a tie run of
    length t starting after c pooled items has average rank
    (2c + t + 1)/2, so Σ n_a·avgrank doubles to the integer
    Σ n_a·(2c + t + 1). U_a = R_a − n_a(n_a+1)/2; z uses the
    tie-corrected variance σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1)))
    (no continuity correction — documented, both engines identical).

    Output (1 row): group_a, group_b, n_a, n_b, u_a, u_b, z (6 dp).

    Scale: identical shape to ks_test_2samp — one scan, one bounded
    cumulative window; every moment is integer until the terminal z.
    """
    vl = _value_level(df, group_col, value_col, group_a, group_b)
    return mwu_from_value_counts(vl, group_a, group_b)


def mwu_from_value_counts(vl: DataFrame, group_a, group_b) -> DataFrame:
    """mann_whitney_u's statistic from an ALREADY-AGGREGATED
    value-level count table (v, na, nb) — the mergeable serve path,
    same monoid contract as ks_from_value_counts. Bucketed input
    (DDSketch indices as ``v``) coarsens ties within a bucket; the
    tie-corrected variance absorbs that, and stat_tests_from_sketch
    pins the residual z error against the exact test."""
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    t = F.col("na") + F.col("nb")
    ranked = vl.select(
        "na", "nb", t.alias("t"),
        F.coalesce(F.sum(F.col("na") + F.col("nb")).over(w),
                   F.lit(0)).cast("bigint").alias("c"),
    )
    # per-term products and the tie cubes widen to DECIMAL(38,0) BEFORE
    # multiplying (same 100 TB BIGINT-wrap hazard as ks_test_2samp:
    # na·2c ~ n² and t³ both blow past 9.2e18 long before the counts do)
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = ranked.agg(
        F.sum("na").cast("bigint").alias("n_a"),
        F.sum("nb").cast("bigint").alias("n_b"),
        F.sum(d38("na") * (2 * d38("c") + d38("t") + 1))
        .cast("decimal(38,0)").alias("ra2"),
        F.sum(d38("t") * d38("t") * d38("t") - d38("t"))
        .cast("decimal(38,0)").alias("ties"),
    )
    n = F.col("n_a") + F.col("n_b")
    nanb = (d38("n_a") * d38("n_b")).cast("double")
    u_a = (F.col("ra2").cast("double") / 2
           - (d38("n_a") * (d38("n_a") + 1)).cast("double") / 2)
    return (
        agg.select(
            F.lit(str(group_a)).alias("group_a"),
            F.lit(str(group_b)).alias("group_b"),
            "n_a", "n_b",
            u_a.alias("u_a"),
            (nanb - u_a).alias("u_b"),
            (
                (u_a - nanb / 2)
                / F.sqrt(
                    nanb / 12.0
                    * ((n + 1).cast("double")
                       - F.col("ties").cast("double")
                       / (n.cast("decimal(38,0)")
                          * (n - 1).cast("decimal(38,0)")).cast("double"))
                )
            ).alias("z"),
        )
        .select("group_a", "group_b", "n_a", "n_b",
                F.round("u_a", 1).alias("u_a"), F.round("u_b", 1).alias("u_b"),
                F.round("z", 6).alias("z"))
    )


def chi_square_independence(df: DataFrame, row_col: str,
                            col_col: str) -> DataFrame:
    """Pearson chi-square test of independence over a two-way
    contingency table (row factor × column factor) — the categorical
    drift gate: is event mix independent of weekday, is label mix
    independent of source shard.

    Observed counts are exact; expected_{ij} = rowtot_i·coltot_j / N is
    a rational from exact integers; per-cell contributions
    (o−e)²/e round to 9 dp and sum as DECIMAL into chi2_total so the
    verdict is engine-exact. Cells with zero observed but positive
    margin mass still contribute (dense cross of observed margins).

    Output: one row per margin cell — row_val, col_val, observed,
    expected (6 dp), contrib (6 dp), plus the repeated chi2_total
    (6 dp) and dof = (r−1)(c−1).

    NULL categories are excluded BEFORE counting: a NULL-keyed cell
    would carry margin mass but never match the equi-join back to its
    observed count (NULL != NULL), so its observed mass silently
    vanishes while its full expected mass still lands in chi2_total —
    guaranteed false rejection — and count_distinct-based dof would
    exclude the category the grid includes. (The _value_level NULL
    discipline, applied to both factors.)

    Scale: one scan → groupBy(row,col) with map-side combine; the
    margin cross is category²-bounded. No window over the input.
    """
    obs = (
        df.where(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
        .groupBy(F.col(row_col).cast("string").alias("row_val"),
                 F.col(col_col).cast("string").alias("col_val"))
        .agg(F.count("*").cast("bigint").alias("observed"))
    )
    return chi_square_from_counts(obs)


def chi_square_from_counts(obs: DataFrame) -> DataFrame:
    """chi_square_independence's verdict from an ALREADY-AGGREGATED
    contingency table (row_val, col_val, observed) — the serve path for
    mergeable streaming/incremental count state (counts are a
    commutative monoid, so pre-aggregated partials compose exactly)."""
    rt = obs.groupBy("row_val").agg(F.sum("observed").cast("bigint").alias("rt"))
    ct = obs.groupBy("col_val").agg(F.sum("observed").cast("bigint").alias("ct"))
    tot = obs.agg(F.sum("observed").cast("bigint").alias("n"),
                  F.count_distinct("row_val").cast("int").alias("nr"),
                  F.count_distinct("col_val").cast("int").alias("nc"))
    dense = (
        rt.crossJoin(ct)
        .join(obs, ["row_val", "col_val"], "left")
        .na.fill({"observed": 0})
        .crossJoin(F.broadcast(tot))
    )
    # margin product widens to DECIMAL(38,0) BEFORE multiplying (the
    # ks_test_2samp 100 TB guard): rt·ct ~ 1e23 at N ~ 1e12 blows the
    # BIGINT ceiling long before the counts do
    e = (F.col("rt").cast("decimal(38,0)")
         * F.col("ct").cast("decimal(38,0)")).cast("double") / F.col("n")
    contrib = F.round(
        (F.col("observed") - e) * (F.col("observed") - e) / e, 9
    ).cast("decimal(20,9)")
    cells = dense.select(
        "row_val", "col_val", "observed",
        F.round(e, 6).alias("expected"),
        contrib.alias("c9"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("int").alias("dof"),
    )
    w = Window.partitionBy(F.lit(1))
    # round in DECIMAL, then cast: the 9-dp contribution sum can land
    # exactly on a 6-dp half-point, where a double-typed round
    # diverges between engines (the collocations_llr knife-edge)
    return (
        cells.withColumn(
            "chi2_total",
            F.round(F.sum("c9").over(w), 6).cast("double"))
        .select("row_val", "col_val", "observed", "expected",
                F.round(F.col("c9"), 6).cast("double").alias("contrib"),
                "chi2_total", "dof")
        # deterministic row order: per-cell output otherwise inherits
        # the physical plan's order, which differs between e.g. a
        # unioned input and a plain scan (the r10 flaky-test lesson)
        .orderBy("row_val", "col_val")
    )


def hill_tail_index(df: DataFrame, value_col: str,
                    ks: tuple = (50, 100, 200, 500)) -> DataFrame:
    """Hill estimator of the power-law tail index (Hill 1975) at a
    sweep of order statistics — the heavy-tail diagnostic for ledger
    amounts, degree distributions, and token frequencies:

      H(k) = (1/k) Σ_{i≤k} ln(X_(i) / X_(k+1)),   alpha(k) = 1/H(k)

    with X_(1) ≥ X_(2) ≥ … the upper order statistics. A stable
    alpha across k (the flat region of the Hill plot) is the tail
    exponent; alpha ≤ 2 means infinite variance — winsorize before
    averaging anything.

    Output: one row per k — k, x_threshold (= X_(k+1)), hill (6 dp),
    alpha (6 dp). Values must be > 0 (filtered).

    Determinism: per-term logs round at 9 dp and sum as DECIMAL.

    Scale: TakeOrdered(max k + 1) collapses the corpus map-side — the
    only full-data pass; the sweep is arithmetic on a ≤ max k + 1 row
    table (rank window over the bounded survivor set only).
    """
    kmax = max(ks)
    top = (
        df.where(F.col(value_col) > 0)
        .select(F.col(value_col).cast("double").alias("v"))
        .orderBy(F.desc("v")).limit(kmax + 1)
    )
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("v"))))
    kdf = ranked.sparkSession.createDataFrame(
        [(int(k),) for k in ks], "k int")
    thr = (
        ranked.join(F.broadcast(kdf), F.col("rnk") == F.col("k") + 1)
        .select("k", F.col("v").alias("x_threshold"))
    )
    terms = (
        ranked.crossJoin(F.broadcast(kdf.select("k")))
        .where(F.col("rnk") <= F.col("k"))
        .join(F.broadcast(thr), "k")
        .groupBy("k", "x_threshold")
        .agg(F.sum(F.round(F.log(F.col("v") / F.col("x_threshold")), 9)
                   .cast("decimal(20,9)")).cast("decimal(28,9)").alias("sl"))
    )
    h = F.col("sl").cast("double") / F.col("k")
    return terms.select(
        "k", F.round("x_threshold", 6).alias("x_threshold"),
        F.round(h, 6).alias("hill"),
        F.round(F.lit(1.0) / h, 6).alias("alpha"),
    ).orderBy("k")


def cuped_adjust(events: DataFrame, split_ts: str,
                 user_col: str = "user_id", ts_col: str = "ts",
                 value_col: str = "value", arms: int = 2) -> DataFrame:
    """CUPED variance reduction for A/B metrics (Deng, Xu, Kohavi &
    Walker 2013): adjust each user's post-period metric y by their
    PRE-period covariate x,

      θ = cov(x, y) / var(x)   (pooled across arms),
      ŷ = y − θ·(x − x̄),        var(ŷ) = var(y) − θ²·var(x)

    — the standard experiment-sensitivity trick: pre-period behavior
    explains individual variance that has nothing to do with the
    treatment, so removing it shrinks confidence intervals for free.
    Arms are assigned deterministically (user_id mod ``arms``).

    All adjusted-group statistics come from CLOSED FORMS over per-arm
    moment sums (mean ŷ_g = ȳ_g − θ(x̄_g − x̄); var ŷ_g = var y_g −
    2θ·cov_g + θ²·var x_g), so no per-user float accumulation exists:
    per-user pre/post sums quantize to DECIMAL(18,6) (the trend_ols
    recipe), moments sum exactly, and only the terminal divisions are
    doubles.

    Output: one row per arm — arm, n_users, mean_y, mean_y_cuped,
    var_y, var_y_cuped, var_reduction_pct, theta (all 6 dp).

    Scale: one event scan → per-user pre/post sums (one groupBy on
    user, map-side combined) → per-arm moment aggregation (arms rows)
    → arithmetic. Nothing after the user rollup exceeds `arms` rows.
    """
    ts = F.col(ts_col)
    split = F.lit(split_ts).cast("timestamp")
    v = F.round(F.col(value_col), 6).cast("decimal(18,6)")
    per_user = (
        events.groupBy(F.col(user_col).alias("u"))
        .agg(
            # per-user sums stay in DECIMAL(18,6): the later x·y
            # products must fit (38,12) EXACTLY in both engines —
            # (28,6)² would overflow DuckDB's 38-digit cap
            F.sum(F.when(ts < split, v).otherwise(F.lit(0))
                  ).cast("decimal(18,6)").alias("x"),
            F.sum(F.when(ts >= split, v).otherwise(F.lit(0))
                  ).cast("decimal(18,6)").alias("y"),
        )
        # pmod, not %: Spark's % follows the dividend's sign, so
        # negative user ids (64-bit hashed ids) would mint negative
        # arm labels and fragment `arms` cohorts into up to 2·arms−1
        .select(F.pmod(F.col("u"), F.lit(arms)).cast("int").alias("arm"),
                "x", "y")
    )
    d12 = "decimal(38,12)"
    mom = per_user.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,6)").alias("sx"),
        F.sum("y").cast("decimal(38,6)").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d12)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d12)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(d12)).alias("sxy"),
    )
    pooled = mom.agg(
        F.sum("n").cast("bigint").alias("pn"),
        F.sum("sx").cast("decimal(38,6)").alias("psx"),
        F.sum("sy").cast("decimal(38,6)").alias("psy"),
        F.sum("sxx").cast(d12).alias("psxx"),
        F.sum("sxy").cast(d12).alias("psxy"),
    )
    pn = F.col("pn").cast("double")
    theta = (
        (pn * F.col("psxy").cast("double")
         - F.col("psx").cast("double") * F.col("psy").cast("double"))
        / (pn * F.col("psxx").cast("double")
           - F.col("psx").cast("double") * F.col("psx").cast("double"))
    )
    g = mom.crossJoin(F.broadcast(
        pooled.select(theta.alias("theta"),
                      (F.col("psx").cast("double") / pn).alias("xbar"))))
    n = F.col("n").cast("double")
    my = F.col("sy").cast("double") / n
    mx = F.col("sx").cast("double") / n
    var_y = F.col("syy").cast("double") / n - my * my
    var_x = F.col("sxx").cast("double") / n - mx * mx
    cov = F.col("sxy").cast("double") / n - mx * my
    var_c = var_y - 2 * F.col("theta") * cov \
        + F.col("theta") * F.col("theta") * var_x
    return g.select(
        "arm", F.col("n").alias("n_users"),
        F.round(my, 6).alias("mean_y"),
        F.round(my - F.col("theta") * (mx - F.col("xbar")), 6)
        .alias("mean_y_cuped"),
        F.round(var_y, 6).alias("var_y"),
        F.round(var_c, 6).alias("var_y_cuped"),
        F.round(F.when(var_y > 0, 100.0 * (var_y - var_c) / var_y), 6)
        .alias("var_reduction_pct"),
        F.round(F.col("theta"), 6).alias("theta"),
    ).orderBy("arm")


# P(Poisson(1) <= k) for k = 0..8, rounded to 9 dp — the inverse-CDF
# thresholds both engines share as literals. P(k > 8) < 1e-6, so the
# CASE chain caps the weight at 9 (bias < 1e-6 resamples per million).
_POIS1_CDF9 = (0.367879441, 0.735758882, 0.919698603, 0.981011843,
               0.996340153, 0.999405815, 0.999916758, 0.999989891,
               0.999998874)


def poisson_bootstrap_mean(df: DataFrame, value_col: str, key_col: str,
                           replicates: int = 200,
                           alpha_pct: int = 5) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean (Chamandy et
    al. 2012, "Estimating Uncertainty for Massive Data Streams") — the
    bootstrap that actually distributes: instead of drawing n rows
    with replacement (which needs global coordination), each row
    enters replicate b with weight w ~ Poisson(1), independent across
    rows and replicates, so every replicate is one weighted aggregate
    and the whole thing is a map-side-combinable explode.

    Weights are DERANDOMIZED: w = InversePoissonCDF(u) with
    u = hash60(key, b)/2^60 against the shared 9-dp threshold ladder
    (_POIS1_CDF9) — both engines draw identical weights, so the CI is
    oracle-checkable, and any rerun reproduces it (the weighted_sample
    / Efraimidis-Spirakis discipline).

    Output (1 row): n_rows, mean_full (6 dp), ci_lo, ci_hi (the
    alpha/2 and 1-alpha/2 replicate-mean percentiles by explicit
    index = floor(q*(B-1)) over the sorted replicate means, 6 dp),
    n_replicates.

    Scale: one explode × B (the replicate table broadcast), one
    groupBy(replicate) with map-side combine over DECIMAL sums, then
    percentile arithmetic on B rows. No global sort of data, no
    coordination — the reason this bootstrap runs at stream scale.
    """
    from semantik_spark.functions.hashing import hash60

    spark = df.sparkSession
    reps = spark.createDataFrame([(b,) for b in range(replicates)], "b int")
    u = hash60(F.concat_ws(":", F.lit("boot"), F.col(key_col).cast("string"),
                           F.col("b").cast("string"))).cast("double") \
        / F.lit(float(2 ** 60))
    w = F.lit(len(_POIS1_CDF9))
    for k in range(len(_POIS1_CDF9) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_CDF9[k]), F.lit(k)).otherwise(w)
    v = F.round(F.col(value_col), 6).cast("decimal(18,6)")
    # spread() before the ×B broadcast fan-out: the single-file scan
    # stage otherwise fuses with the crossJoin + weight ladder, so ONE
    # task computes |rows|×B md5 draws (measured 74 s at sf0.1 on 32
    # cores — guide §2.5 input skew). Repartition-safe: the replicate
    # aggregates are exact bigint×DECIMAL sums, order never matters.
    base = spread(df.select(F.col(key_col), v.alias("v")), key_col) \
        .crossJoin(F.broadcast(reps))
    repmeans = (
        base.select("b", w.cast("bigint").alias("w"), "v")
        .groupBy("b")
        .agg((F.sum(F.col("w") * F.col("v")).cast("double")
              / F.sum("w")).alias("m"))
    )
    wr = Window.orderBy("m")
    ranked = repmeans.select(
        "m", (F.row_number().over(wr) - 1).alias("r"))
    lo_i = int((alpha_pct / 100 / 2) * (replicates - 1))
    hi_i = int((1 - alpha_pct / 100 / 2) * (replicates - 1))
    ci = ranked.agg(
        F.max(F.when(F.col("r") == lo_i, F.col("m"))).alias("lo"),
        F.max(F.when(F.col("r") == hi_i, F.col("m"))).alias("hi"),
        F.count("*").cast("int").alias("n_replicates"),
    )
    full = df.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        (F.sum(v).cast("double") / F.count("*")).alias("mean_full"),
    )
    return full.crossJoin(F.broadcast(ci)).select(
        "n_rows", F.round("mean_full", 6).alias("mean_full"),
        F.round("lo", 6).alias("ci_lo"), F.round("hi", 6).alias("ci_hi"),
        "n_replicates",
    )


def eb_shrunk_rates(df: DataFrame, item_col: str, success_col: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-item binomial rates (Robbins
    1956; the beta-binomial method-of-moments recipe Efron & Morris
    popularized): fit Beta(α, β) to the observed per-item rates, then
    report each item's posterior mean

      eb_rate = (s + α) / (n + α + β),
      α+β = m(1−m)/v − 1,  α = m·(α+β)

    — the fix for "a 1/1 item outranks a 980/1000 item" that every
    rate leaderboard needs. ``success_col`` is a 0/1 integer column.

    Determinism: per-item rates are exact rationals rounded at 9 dp
    into DECIMAL; m and v come from DECIMAL moment sums (population
    variance); only the terminal divisions are doubles. Degenerate
    corpora (zero rate variance, or v ≥ m(1−m) ⇒ non-positive
    concentration) fall back to the raw rate with NULL α/β.

    Output: one row per item — item, n, s, raw_rate, eb_rate (6 dp),
    plus repeated alpha, beta (6 dp; NULL on fallback).

    Scale: one scan → per-item (n, s) groupBy (map-side combined) →
    1-row broadcast moments → map-only posterior arithmetic on the
    item-bounded table.
    """
    per = df.groupBy(F.col(item_col).alias("item")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col(success_col).cast("bigint")).cast("bigint").alias("s"),
    )
    p9 = F.round(F.col("s").cast("double") / F.col("n"), 9) \
        .cast("decimal(15,9)")
    base = per.select("item", "n", "s", p9.alias("p"))
    mom = base.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("p").cast("decimal(28,9)").alias("sp"),
        F.sum(F.col("p") * F.col("p")).cast("decimal(38,18)").alias("spp"),
    )
    k = F.col("k").cast("double")
    m = F.col("sp").cast("double") / k
    v = F.col("spp").cast("double") / k - m * m
    conc = F.when((v > 0) & (m > 0) & (m < 1),
                  m * (1.0 - m) / v - 1.0)
    params = mom.select(
        F.when(conc > 0, m * conc).alias("alpha"),
        F.when(conc > 0, (1.0 - m) * conc).alias("beta"),
    )
    j = base.crossJoin(F.broadcast(params))
    eb = F.when(
        F.col("alpha").isNotNull(),
        (F.col("s") + F.col("alpha"))
        / (F.col("n") + F.col("alpha") + F.col("beta")),
    ).otherwise(F.col("p").cast("double"))
    return j.select(
        "item", "n", "s",
        F.round(F.col("p").cast("double"), 6).alias("raw_rate"),
        F.round(eb, 6).alias("eb_rate"),
        F.round("alpha", 6).alias("alpha"),
        F.round("beta", 6).alias("beta"),
    )


def ks_family_bh(df: DataFrame, group_col: str, value_col: str,
                 alpha_milli: int = 50) -> DataFrame:
    """One-vs-rest KS tests for EVERY group with Benjamini-Hochberg
    FDR control (Benjamini & Hochberg 1995) — the multiple-testing
    discipline a drift monitor needs: screening K segments at p < .05
    each yields K·.05 false alarms; BH caps the FALSE DISCOVERY RATE
    instead,

      q_(i) = min_{j ≥ i} p_(j)·m/j,  reject where q ≤ α.

    Each group's sample is compared against the pooled rest (same D
    and asymptotic p as ks_test_2samp, computed for all groups in ONE
    dense pass — no per-group jobs). α = ``alpha_milli``/1000.

    Output: one row per group — group_val, n_group, n_rest, ks_d,
    p_value, bh_rank, q_value (6 dp), significant.

    Scale: one scan → (value, group) counts → dense value×group grid
    (alphabet-bounded multiplier) → per-group cumulative windows over
    the value-level table; BH runs on the alphabet-row result.
    """
    vl = (
        # NULL metric values excluded for the same engine-ordering
        # reason as _value_level (oracle carries the matching filter)
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"),
                 F.col(group_col).cast("string").alias("g"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    vals = vl.groupBy("v").agg(F.sum("c").cast("bigint").alias("tot"))
    groups = vl.select("g").distinct()
    grid = (
        vals.crossJoin(groups)
        .join(vl, ["v", "g"], "left")
        .na.fill({"c": 0})
    )
    w = Window.partitionBy("g").orderBy("v") \
        .rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "g",
        F.sum("c").over(w).alias("ca"),
        (F.sum("tot").over(w) - F.sum("c").over(w)).alias("cb"),
    )
    tots = grid.groupBy("g").agg(
        F.sum("c").cast("bigint").alias("n_a"),
        F.sum(F.col("tot") - F.col("c")).cast("bigint").alias("n_b"),
    )
    # DECIMAL(38,0) widening before the cross products — the ks_test_2samp
    # 100 TB BIGINT-wrap guard, applied to the one-vs-rest grid too
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    dmax = (
        cum.join(tots, "g")
        .groupBy("g", "n_a", "n_b")
        .agg(F.max(F.abs(d38("ca") * d38("n_b")
                         - d38("cb") * d38("n_a")))
             .cast("decimal(38,0)").alias("num"))
    )
    d = F.col("num").cast("double") / (d38("n_a") * d38("n_b")).cast("double")
    ne = (d38("n_a") * d38("n_b")).cast("double") \
        / (F.col("n_a") + F.col("n_b"))
    base = dmax.select(
        F.col("g").alias("group_val"), "n_a", "n_b",
        F.round(d, 6).alias("ks_d"),
        # unrounded-D lambda, same rationale as ks_from_value_counts
        ((F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne)) * d)
        .alias("lam"),
    )
    withp = base.withColumn("p_value", _ks_p_from_lam()).drop("lam")
    m = withp.agg(F.count("*").cast("bigint").alias("m"))
    wr = Window.orderBy("p_value", "group_val")
    ranked = withp.crossJoin(F.broadcast(m)).withColumn(
        "bh_rank", F.row_number().over(wr))
    wrev = Window.orderBy(F.desc("bh_rank")) \
        .rowsBetween(Window.unboundedPreceding, 0)
    alpha = F.lit(alpha_milli).cast("double") / 1000.0
    return ranked.select(
        "group_val", F.col("n_a").alias("n_group"),
        F.col("n_b").alias("n_rest"), "ks_d", "p_value",
        F.col("bh_rank").cast("int").alias("bh_rank"),
        F.round(F.least(F.lit(1.0), F.min(
            F.col("p_value") * F.col("m") / F.col("bh_rank")).over(wrev)),
            6).alias("q_value"),
    ).withColumn("significant", F.col("q_value") <= alpha)


def simpson_slope_audit(df: DataFrame, x_col: str, y_col: str,
                        stratum_col: str) -> DataFrame:
    """Simpson's-paradox audit for a regression relationship: the
    pooled slope of y on x next to every stratum's slope — the
    aggregation trap detector (pooled "discount raises quantity" can
    invert inside every brand when the mix is confounded; Simpson
    1951, Bickel et al. 1975's Berkeley case). A stratum whose slope
    SIGN disagrees with the pooled sign gets flagged.

    Uses the regr_* aggregates (zipf_fit discipline — identical
    definitions both engines); the pooled row rides along with
    stratum = '__pooled__'.

    Output: one row per stratum + the pooled row — stratum, n_obs,
    slope (6 dp), r2 (6 dp), pooled_slope (6 dp, repeated),
    sign_flip (NULL slopes never flag).

    Scale: one scan aggregated twice (per-stratum + pooled — both
    map-side combinable; at 100 TB compute both from one pass via
    grouping sets); output is strata-bounded.
    """
    per = df.groupBy(F.col(stratum_col).cast("string").alias("stratum")).agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.round(F.expr(f"regr_slope({y_col}, {x_col})"), 6).alias("slope"),
        F.round(F.expr(f"regr_r2({y_col}, {x_col})"), 6).alias("r2"),
    )
    pooled = df.agg(
        F.lit("__pooled__").alias("stratum"),
        F.count("*").cast("bigint").alias("n_obs"),
        F.round(F.expr(f"regr_slope({y_col}, {x_col})"), 6).alias("slope"),
        F.round(F.expr(f"regr_r2({y_col}, {x_col})"), 6).alias("r2"),
    )
    ps = pooled.select(F.col("slope").alias("pooled_slope"))
    return (
        per.unionByName(pooled)
        .crossJoin(F.broadcast(ps))
        .select(
            "stratum", "n_obs", "slope", "r2", "pooled_slope",
            (F.col("slope").isNotNull()
             & F.col("pooled_slope").isNotNull()
             & (F.signum("slope") * F.signum("pooled_slope") < 0))
            .alias("sign_flip"),
        )
    )


def mutual_information(df: DataFrame, row_col: str,
                       col_col: str) -> DataFrame:
    """Mutual information and uncertainty coefficients over a two-way
    contingency table — the effect-size companion to the chi-square
    test (chi² says WHETHER two factors associate; I(X;Y) says HOW
    MUCH, in nats, and Theil's U says what fraction of each factor's
    entropy the other explains — asymmetric, unlike Cramér's V):

      I(X;Y) = Σ_ij p_ij ln(p_ij / (p_i·p_j))
      U(X|Y) = I/H(X),  U(Y|X) = I/H(Y)

    All probabilities are exact count ratios; per-cell contributions
    and entropy terms round at 9 dp into DECIMAL so the totals are
    engine-exact; zero cells contribute 0 by continuity.

    Output: one row per observed cell — row_val, col_val, n,
    mi_term (9 dp as double), plus repeated mi_total, h_row, h_col,
    u_row_given_col, u_col_given_row (6 dp; U via try-division,
    NULL when a factor is constant).

    Scale: the chi_square_independence shape — one scan, category²
    margins, everything after the groupBy is alphabet-bounded.
    """
    obs = (
        # NULL categories excluded (chi_square_independence's NULL
        # discipline): the inner joins back to the margins drop
        # NULL-keyed cells from I while the entropy margins keep them,
        # making U = I/H inconsistent
        df.where(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
        .groupBy(F.col(row_col).cast("string").alias("row_val"),
                 F.col(col_col).cast("string").alias("col_val"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    rt = obs.groupBy("row_val").agg(F.sum("n").cast("bigint").alias("rt"))
    ct = obs.groupBy("col_val").agg(F.sum("n").cast("bigint").alias("ct"))
    tot = obs.agg(F.sum("n").cast("bigint").alias("nn"))
    base = (
        obs.join(rt, "row_val").join(ct, "col_val")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("n").cast("double") / F.col("nn")
    pi = F.col("rt").cast("double") / F.col("nn")
    pj = F.col("ct").cast("double") / F.col("nn")
    term = F.round(p * F.log(p / (pi * pj)), 9).cast("decimal(20,9)")
    cells = base.select("row_val", "col_val", "n", term.alias("t9"))
    mi = cells.agg(F.sum("t9").cast("decimal(28,9)").alias("smi"))

    def entropy(margin: DataFrame, cnt: str) -> DataFrame:
        pm = F.col(cnt).cast("double") / F.col("nn")
        return (
            margin.crossJoin(F.broadcast(tot))
            .select(F.round(-pm * F.log(pm), 9).cast("decimal(20,9)")
                    .alias("e9"))
            .agg(F.sum("e9").cast("decimal(28,9)").alias("h"))
        )
    hr = entropy(rt, "rt").select(F.col("h").alias("h_row"))
    hc = entropy(ct, "ct").select(F.col("h").alias("h_col"))
    stats = (
        mi.crossJoin(F.broadcast(hr)).crossJoin(F.broadcast(hc))
        .select(
            F.round(F.col("smi").cast("double"), 6).alias("mi_total"),
            F.round(F.col("h_row").cast("double"), 6).alias("h_row"),
            F.round(F.col("h_col").cast("double"), 6).alias("h_col"),
            F.round(F.try_divide(F.col("smi").cast("double"),
                                 F.col("h_row").cast("double")), 6)
            .alias("u_row_given_col"),
            F.round(F.try_divide(F.col("smi").cast("double"),
                                 F.col("h_col").cast("double")), 6)
            .alias("u_col_given_row"),
        )
    )
    return (
        cells.select("row_val", "col_val", "n",
                     F.col("t9").cast("double").alias("mi_term"))
        .crossJoin(F.broadcast(stats))
        # deterministic row order (chi_square_independence discipline)
        .orderBy("row_val", "col_val")
    )


def brown_forsythe(df: DataFrame, group_col: str,
                   value_col: str) -> DataFrame:
    """Brown-Forsythe test for equality of variances (Brown & Forsythe
    1974 — Levene's test with the MEDIAN center, the robust form):
    one-way ANOVA F over z = |x − median_g| across all groups — the
    heteroscedasticity gate run before any pooled-variance t/F test,
    median-centered so heavy tails don't trigger it spuriously.

    Group medians come from per-group value-level cumulative counts
    (explicit two-middle, the theil_sen recipe — no raw-row sort);
    z quantizes at 6 dp into DECIMAL, every moment is a DECIMAL sum,
    and F's numerator/denominator assemble from closed forms over
    group moments — no per-row float accumulation anywhere.

    Output: one row per group — group_val, n, median (6 dp),
    mean_absdev (6 dp), plus repeated f_stat (6 dp), df1, df2
    (try-division: NULL F when a single group or zero within-group
    spread).

    Scale: one scan → per-(group, value) counts (map-side combined) →
    per-group cumulative window over the value-level table → one
    z-moment groupBy. Alphabet × value-cardinality bounded after the
    scan.
    """
    vl = (
        # NULL metric values excluded (the _value_level discipline): a
        # NULL row would inflate n AND occupy the first cumulative
        # positions (Spark NULLS FIRST), shifting — or NULLing — the
        # group median and corrupting every moment downstream
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).cast("string").alias("g"),
                 F.col(value_col).alias("v"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    return bf_from_value_counts(vl)


def bf_from_value_counts(vl: DataFrame) -> DataFrame:
    """brown_forsythe's verdict from an ALREADY-AGGREGATED per-(group,
    value) count table (g, v, c) — the mergeable serve path
    (chi_square_from_counts / ks_from_value_counts pattern): counts
    are a commutative monoid, so per-shard/per-epoch partials compose
    exactly via groupBy(g, v).sum before this fold. Feed DDSketch
    bucket REPRESENTATIVE VALUES (2·gamma^i/(gamma+1)) as ``v`` for
    the constant-size incremental variant — unlike KS/MWU, the BF
    moments need value MAGNITUDES, not just value order, so bucket
    indices alone do not qualify (stat_bf_from_sketch pins the
    resulting accuracy against the exact test)."""
    w = Window.partitionBy("g").orderBy("v") \
        .rowsBetween(Window.unboundedPreceding, 0)
    cum = vl.select("g", "v", "c", F.sum("c").over(w).alias("cc"),
                    F.sum("c").over(Window.partitionBy("g")).alias("n"))
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    med = (
        cum.where((F.col("cc") - F.col("c") < lo) & (F.col("cc") >= lo)
                  | ((F.col("cc") - F.col("c") < hi) & (F.col("cc") >= hi)))
        .groupBy("g")
        .agg(((F.max(F.when((F.col("cc") - F.col("c") < lo)
                            & (F.col("cc") >= lo), F.col("v")))
               + F.max(F.when((F.col("cc") - F.col("c") < hi)
                              & (F.col("cc") >= hi), F.col("v")))) / 2)
             .alias("med"))
    )
    z = (
        vl.join(med, "g")
        .select("g", "c",
                F.round(F.abs(F.col("v") - F.col("med")), 6)
                .cast("decimal(18,6)").alias("z"), "med")
    )
    # operand widths: z stays at its full (18,6) quantization for the
    # first moment ((18,6)×(12,0) = (31,6), inside the 38-digit cap);
    # the square is computed exactly at (37,12) then re-rounded to
    # (25,6) BEFORE the count product so (25,6)×(12,0) = (38,6) fits.
    # This raises the silent-overflow ceiling on |v − median| from the
    # old (12,6) cast's 1e6 — where a big deviation became NULL and
    # simply VANISHED from the spread moments, passing data the gate
    # should fail — to ~3e9 (documented bound), at the cost of the
    # second moment carrying 6 fractional digits instead of 12 (both
    # engines apply the same half-up re-round, so the fold stays
    # engine-exact; the F statistic assembles in doubles anyway)
    zc = F.col("z")
    cw = F.col("c").cast("decimal(12,0)")
    gm = z.groupBy("g", "med").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(zc * cw).cast("decimal(28,6)").alias("sz"),
        F.sum((zc * zc).cast("decimal(25,6)") * cw)
        .cast("decimal(38,6)").alias("szz"),
    )
    tot = gm.agg(F.sum("n").cast("bigint").alias("nn"),
                 F.sum("sz").cast("decimal(38,6)").alias("tsz"),
                 F.count("*").cast("int").alias("k"))
    j = gm.crossJoin(F.broadcast(tot))
    zbar_g = F.col("sz").cast("double") / F.col("n")
    zbar = F.col("tsz").cast("double") / F.col("nn")
    between = F.round(F.col("n") * (zbar_g - zbar) * (zbar_g - zbar), 9) \
        .cast("decimal(28,9)")
    within = F.round(F.col("szz").cast("double")
                     - F.col("n") * zbar_g * zbar_g, 9).cast("decimal(28,9)")
    per = j.select("g", "n", "med", zbar_g.alias("mad"),
                   between.alias("b9"), within.alias("w9"),
                   "nn", "k")
    agg = per.groupBy("nn", "k").agg(
        F.sum("b9").cast("decimal(38,9)").alias("sb"),
        F.sum("w9").cast("decimal(38,9)").alias("sw"),
    )
    f = F.try_divide(
        F.col("sb").cast("double") / (F.col("k") - 1).cast("double"),
        F.col("sw").cast("double") / (F.col("nn") - F.col("k")).cast("double"))
    stats = agg.select(
        F.round(f, 6).alias("f_stat"),
        (F.col("k") - 1).cast("int").alias("df1"),
        (F.col("nn") - F.col("k")).cast("int").alias("df2"),
    )
    return (
        per.select(F.col("g").alias("group_val"), "n",
                   F.round(F.col("med").cast("double"), 6).alias("median"),
                   F.round("mad", 6).alias("mean_absdev"))
        .crossJoin(F.broadcast(stats))
    )
