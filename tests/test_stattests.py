"""Hypothesis-test operators: hand-computed closed forms on tiny
inline frames (the oracle twin covers the full-corpus path)."""

import math

import pytest


def test_ks_disjoint_and_overlap(spark):
    from semantik_spark.operators.stattests import ks_test_2samp

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0),
         ("b", 4.0), ("b", 5.0), ("b", 6.0)], ["g", "v"])
    r = ks_test_2samp(df, "g", "v", "a", "b").collect()[0]
    assert r["ks_d"] == 1.0 and r["n_a"] == 3 and r["n_b"] == 3
    # fully separated samples: p must be small
    assert r["p_value"] < 0.2

    df2 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)], ["g", "v"])
    r2 = ks_test_2samp(df2, "g", "v", "a", "b").collect()[0]
    # CDF gaps: at 1 -> .5, at 2 -> .5, at 3 -> 0
    assert r2["ks_d"] == 0.5


def test_mann_whitney_exact_and_ties(spark):
    from semantik_spark.operators.stattests import mann_whitney_u

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)], ["g", "v"])
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert r["u_a"] == 0.0 and r["u_b"] == 4.0
    assert r["z"] == round(-2 / math.sqrt(4 / 12 * 5), 6)

    # tie run: a=[1,1], b=[1,2] -> avg rank of the 1-run is 2,
    # R_a = 4, U_a = 4 - 3 = 1
    df2 = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)], ["g", "v"])
    r2 = mann_whitney_u(df2, "g", "v", "a", "b").collect()[0]
    assert r2["u_a"] == 1.0 and r2["u_b"] == 3.0


def test_chi_square_independent_and_dependent(spark):
    from semantik_spark.operators.stattests import chi_square_independence

    # perfectly independent 2x2 (all margins equal)
    rows = ([("x", "l")] * 5 + [("x", "r")] * 5
            + [("y", "l")] * 5 + [("y", "r")] * 5)
    df = spark.createDataFrame(rows, ["r", "c"])
    out = chi_square_independence(df, "r", "c").collect()
    assert all(o["chi2_total"] == 0.0 and o["dof"] == 1 for o in out)
    assert all(o["expected"] == 5.0 and o["observed"] == 5 for o in out)

    # fully dependent 2x2: chi2 = N
    rows2 = [("x", "l")] * 4 + [("y", "r")] * 6
    out2 = chi_square_independence(
        spark.createDataFrame(rows2, ["r", "c"]), "r", "c").collect()
    assert out2[0]["chi2_total"] == pytest.approx(10.0)
    # zero-observed margin cells materialize
    assert {(o["row_val"], o["col_val"]) for o in out2} == {
        ("x", "l"), ("x", "r"), ("y", "l"), ("y", "r")}


def test_hill_tail_closed_form(spark):
    """Powers of two: H(4) = (4+3+2+1)ln2/4 = 2.5 ln2 with X_(5)=1 as
    threshold; non-positive values are excluded before ranking."""
    import math

    from semantik_spark.operators.stattests import hill_tail_index

    df = spark.createDataFrame(
        [(16.0,), (8.0,), (4.0,), (2.0,), (1.0,), (0.0,), (-3.0,)], ["v"])
    r = hill_tail_index(df, "v", ks=(4,)).collect()[0]
    assert r["k"] == 4 and r["x_threshold"] == 1.0
    h = sum(round(math.log(x), 9) for x in (16, 8, 4, 2)) / 4
    assert r["hill"] == round(h, 6)
    assert r["alpha"] == round(1 / h, 6)


def test_cuped_variance_reduction(spark):
    """Perfectly-correlated pre/post users: theta = 1, adjusted
    variance collapses to 0 and arm means shift by their covariate
    imbalance; n splits by user_id % 2."""
    import datetime

    from semantik_spark.operators.stattests import cuped_adjust

    pre = datetime.datetime(2024, 1, 1)
    post = datetime.datetime(2024, 2, 1)
    rows = []
    # users 0..3: post metric == pre metric (y = x), arms alternate
    for u, v in [(0, 10.0), (1, 20.0), (2, 30.0), (3, 40.0)]:
        rows += [(u, pre, v), (u, post, v)]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {r["arm"]: r
           for r in cuped_adjust(ev, "2024-01-15 00:00:00").collect()}
    assert out[0]["theta"] == 1.0
    assert out[0]["n_users"] == 2 and out[1]["n_users"] == 2
    # var(y) per arm = var({10,30}) = 100; adjusted -> 0
    assert out[0]["var_y"] == 100.0 and out[0]["var_y_cuped"] == 0.0
    assert out[0]["var_reduction_pct"] == 100.0
    # adjusted means equalize to the pooled mean (y==x everywhere)
    assert out[0]["mean_y_cuped"] == out[1]["mean_y_cuped"] == 25.0


def test_poisson_bootstrap_ci_brackets_mean(spark):
    """Derandomized weights are reproducible (two runs identical), the
    CI brackets the full-sample mean for a well-behaved sample, and
    replicate count survives."""
    from semantik_spark.operators.stattests import poisson_bootstrap_mean

    df = spark.createDataFrame(
        [(i, float(100 + (i % 7))) for i in range(400)], ["k", "v"])
    r1 = poisson_bootstrap_mean(df, "v", "k", replicates=50).collect()[0]
    r2 = poisson_bootstrap_mean(df, "v", "k", replicates=50).collect()[0]
    assert r1 == r2  # derandomized
    assert r1["n_replicates"] == 50 and r1["n_rows"] == 400
    assert r1["ci_lo"] <= r1["mean_full"] <= r1["ci_hi"]
    assert r1["ci_hi"] - r1["ci_lo"] < 2.0  # tight for sd~2, n=400


def test_eb_shrinkage_pulls_thin_items(spark):
    """A 1-of-1 item shrinks far toward the prior mean while a
    500-of-1000 item barely moves; the degenerate equal-rates corpus
    falls back to raw rates with NULL params."""
    from semantik_spark.operators.stattests import eb_shrunk_rates

    rows = []
    rows += [(1, 1)]                      # item 1: 1/1
    rows += [(2, 1)] * 500 + [(2, 0)] * 500   # item 2: 500/1000
    rows += [(3, 0)] * 50                 # item 3: 0/50
    rows += [(4, 1)] * 5 + [(4, 0)] * 5   # item 4: 5/10
    df = spark.createDataFrame(rows, ["item", "y"])
    out = {r["item"]: r for r in eb_shrunk_rates(df, "item", "y").collect()}
    assert out[1]["raw_rate"] == 1.0 and out[1]["eb_rate"] < 0.8
    assert abs(out[2]["eb_rate"] - 0.5) < 0.02
    assert out[3]["eb_rate"] > 0.0  # zero-rate item pulled up
    # shrinkage magnitude ordering: thin moves more than thick
    assert abs(out[1]["eb_rate"] - 1.0) > abs(out[4]["eb_rate"] - 0.5)

    same = spark.createDataFrame([(1, 1), (1, 0), (2, 1), (2, 0)],
                                 ["item", "y"])
    out2 = eb_shrunk_rates(same, "item", "y").collect()
    assert all(r["alpha"] is None and r["eb_rate"] == r["raw_rate"]
               for r in out2)


def test_ks_family_bh_monotone_q(spark):
    """BH q-values are the reverse running min of p*m/rank (monotone
    nondecreasing in rank), the shifted group is flagged, identical
    groups are not."""
    from semantik_spark.operators.stattests import ks_family_bh

    rows = ([("a", float(v)) for v in range(100)]
            + [("b", float(v)) for v in range(100)]
            + [("c", float(v + 500)) for v in range(100)])  # shifted
    df = spark.createDataFrame(rows, ["g", "v"])
    out = sorted(ks_family_bh(df, "g", "v").collect(),
                 key=lambda r: r["bh_rank"])
    qs = [r["q_value"] for r in out]
    assert qs == sorted(qs)  # monotone in rank
    by = {r["group_val"]: r for r in out}
    # one shifted group contaminates every one-vs-rest contrast: all 3
    # flag, with c the extreme (fully separated)
    assert by["c"]["significant"] and by["c"]["ks_d"] == 1.0
    assert by["a"]["significant"] and by["a"]["ks_d"] == 0.5
    assert by["a"]["n_group"] == 100 and by["a"]["n_rest"] == 200

    # identically-distributed groups: nothing survives BH
    rows2 = [(g, float(v)) for g in "ab" for v in range(100)]
    out2 = ks_family_bh(
        spark.createDataFrame(rows2, ["g", "v"]), "g", "v").collect()
    assert all(not r["significant"] and r["q_value"] == 1.0 for r in out2)


def test_simpson_audit_detects_reversal(spark):
    """The classic construction: within each stratum y falls with x,
    but strata with larger x also have larger y, so the pooled slope
    is positive — every stratum flags sign_flip, the pooled row never
    flags itself."""
    from semantik_spark.operators.stattests import simpson_slope_audit

    rows = []
    # stratum A around x~1 (high y), slope -1 inside
    for x, y in [(0.8, 10.2), (1.0, 10.0), (1.2, 9.8)]:
        rows.append(("A", x, y))
    # stratum B around x~5 (much higher y), slope -1 inside
    for x, y in [(4.8, 20.2), (5.0, 20.0), (5.2, 19.8)]:
        rows.append(("B", x, y))
    df = spark.createDataFrame(rows, ["s", "x", "y"])
    out = {r["stratum"]: r
           for r in simpson_slope_audit(df, "x", "y", "s").collect()}
    assert out["A"]["slope"] == -1.0 and out["B"]["slope"] == -1.0
    assert out["__pooled__"]["slope"] > 0
    assert out["A"]["sign_flip"] and out["B"]["sign_flip"]
    assert not out["__pooled__"]["sign_flip"]


def test_mutual_information_closed_forms(spark):
    """Independent factors -> MI 0; a deterministic bijection -> MI =
    H(X) = H(Y) and both Theil U = 1."""
    import math

    from semantik_spark.operators.stattests import mutual_information

    indep = ([("x", "l")] * 4 + [("x", "r")] * 4
             + [("y", "l")] * 4 + [("y", "r")] * 4)
    r = mutual_information(
        spark.createDataFrame(indep, ["a", "b"]), "a", "b").collect()[0]
    assert r["mi_total"] == 0.0 and r["h_row"] == round(math.log(2), 6)

    bij = [("x", "l")] * 3 + [("y", "r")] * 3
    r2 = mutual_information(
        spark.createDataFrame(bij, ["a", "b"]), "a", "b").collect()[0]
    assert r2["mi_total"] == round(math.log(2), 6)
    assert r2["u_row_given_col"] == 1.0 and r2["u_col_given_row"] == 1.0


def test_brown_forsythe_equal_and_unequal_spread(spark):
    """Equal absolute-deviation profiles -> F = 0 regardless of level
    shift; a wide group drives F up; medians via the two-middle rule."""
    from semantik_spark.operators.stattests import brown_forsythe

    same = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0),
         ("b", 10.0), ("b", 11.0), ("b", 12.0)], ["g", "v"])
    rows = {r["group_val"]: r for r in brown_forsythe(same, "g", "v").collect()}
    assert rows["a"]["median"] == 2.0 and rows["b"]["median"] == 11.0
    assert rows["a"]["f_stat"] == 0.0
    assert rows["a"]["mean_absdev"] == rows["b"]["mean_absdev"]
    assert rows["a"]["df1"] == 1 and rows["a"]["df2"] == 4

    het = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0),
         ("b", 10.0), ("b", 30.0), ("b", 50.0)], ["g", "v"])
    r2 = brown_forsythe(het, "g", "v").collect()[0]
    # hand fold: between=240.666667 (df1=1), within=267.333333 (df2=4)
    assert r2["f_stat"] == 3.600998


def test_value_level_tests_ignore_null_values(spark):
    """NULL metric values are excluded from the value-level table —
    they would otherwise take engine-dependent window positions
    (Spark NULLS FIRST vs DuckDB NULLS LAST) and corrupt D/U."""
    from semantik_spark.operators.stattests import (ks_test_2samp,
                                                    mann_whitney_u)

    base = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    with_nulls = base + [("a", None), ("b", None)]
    clean = spark.createDataFrame(base, ["g", "v"])
    dirty = spark.createDataFrame(with_nulls, ["g", "v"])
    for fn in (ks_test_2samp, mann_whitney_u):
        r_clean = fn(clean, "g", "v", "a", "b").collect()[0]
        r_dirty = fn(dirty, "g", "v", "a", "b").collect()[0]
        assert r_clean == r_dirty, fn.__name__


def test_roc_auc_ignores_null_scores_and_labels(spark):
    from semantik_spark.operators.metrics import roc_auc_exact

    base = [(0.9, 1), (0.8, 1), (0.3, 0), (0.1, 0)]
    clean = spark.createDataFrame(base, ["v", "y"])
    dirty = spark.createDataFrame(
        base + [(None, 1), (0.5, None)], ["v", "y"])
    assert (roc_auc_exact(clean, "v", "y").collect()
            == roc_auc_exact(dirty, "v", "y").collect())
    assert roc_auc_exact(clean, "v", "y").collect()[0]["auc"] == 1.0


def test_from_counts_state_is_mergeable(spark):
    """The from-counts serve contract: per-shard value-level partials
    merged by groupBy(v).sum produce the EXACT same KS and
    Mann-Whitney output as the one-shot fold — counts are a
    commutative monoid, so the tests run incrementally at 100 TB."""
    from pyspark.sql import functions as F

    from semantik_spark.operators.stattests import (
        _value_level, ks_from_value_counts, ks_test_2samp,
        mann_whitney_u, mwu_from_value_counts)

    rows = [(i % 3, "a" if i % 3 else "b", float(i % 17) + (i % 5) * 0.5)
            for i in range(300)]
    df = spark.createDataFrame(rows, ["shard", "g", "v"])
    shards = [df.where(F.col("shard") == s) for s in range(3)]
    merged = None
    for s in shards:
        part = _value_level(s, "g", "v", "a", "b")
        merged = part if merged is None else merged.unionByName(part)
    merged = merged.groupBy("v").agg(
        F.sum("na").cast("bigint").alias("na"),
        F.sum("nb").cast("bigint").alias("nb"))

    assert (ks_from_value_counts(merged, "a", "b").collect()
            == ks_test_2samp(df, "g", "v", "a", "b").collect())
    assert (mwu_from_value_counts(merged, "a", "b").collect()
            == mann_whitney_u(df, "g", "v", "a", "b").collect())


def test_chi_square_and_mi_exclude_null_categories(spark):
    """NULL-keyed cells can't survive the margin equi-joins (NULL !=
    NULL), so keeping them would strand observed mass while the full
    expected mass still lands in the statistic: NULL categories must
    be excluded before counting, identically in chi-square and MI."""
    from semantik_spark.operators.stattests import (
        chi_square_independence,
        mutual_information,
    )

    clean = spark.createDataFrame(
        [("a", "x")] * 5 + [("a", "y")] * 3 + [("b", "x")] * 2
        + [("b", "y")] * 6, ["r", "c"])
    noisy = clean.unionByName(spark.createDataFrame(
        [(None, "x")] * 4 + [("a", None)] * 3 + [(None, None)] * 2,
        "r string, c string"))

    assert (chi_square_independence(noisy, "r", "c").collect()
            == chi_square_independence(clean, "r", "c").collect())
    assert (mutual_information(noisy, "r", "c").collect()
            == mutual_information(clean, "r", "c").collect())


def test_brown_forsythe_null_values_and_large_deviations(spark):
    """NULL metric rows must not shift the group median (Spark sorts
    NULLS FIRST in the cumulative window), and a deviation past the
    old DECIMAL(12,6) cast's 1e6 ceiling must CONTRIBUTE to the spread
    moments instead of silently becoming NULL and vanishing."""
    from semantik_spark.operators.stattests import brown_forsythe

    clean = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
         ("g2", 10.0), ("g2", 20.0), ("g2", 30.0)], ["g", "v"])
    noisy = clean.unionByName(spark.createDataFrame(
        [("g1", None), ("g1", None)], "g string, v double"))
    assert (brown_forsythe(noisy, "g", "v").collect()
            == brown_forsythe(clean, "g", "v").collect())

    big = spark.createDataFrame(
        [("h", 0.0), ("h", 1.0e6), ("h", 4.0e6),
         ("i", 1.0), ("i", 2.0), ("i", 4.0)], ["g", "v"])
    rows = {r["group_val"]: r for r in brown_forsythe(big, "g", "v").collect()}
    # h's deviations are 1e6, 0, 3e6 — two past the old 1e6 ceiling,
    # where they became NULL and vanished from the moments
    assert abs(rows["h"]["mean_absdev"] - 4.0e6 / 3) < 1.0
    assert rows["h"]["f_stat"] is not None


def test_cuped_negative_user_ids_fold_into_nonnegative_arms(spark):
    """Hashed 64-bit user ids go negative; arm = pmod(u, arms) must
    produce exactly `arms` non-negative labels, with -3 and 1 landing
    in the same arm for arms=2."""
    import datetime

    from semantik_spark.operators.stattests import cuped_adjust

    t0 = datetime.datetime(2024, 1, 10)
    t1 = datetime.datetime(2024, 1, 20)
    rows = [(u, t, float(abs(u) + i))
            for i, (u, t) in enumerate(
                [(-3, t0), (-3, t1), (1, t0), (1, t1),
                 (-2, t0), (-2, t1), (4, t0), (4, t1)])]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = cuped_adjust(ev, split_ts="2024-01-16 00:00:00", arms=2).collect()
    assert sorted(r["arm"] for r in out) == [0, 1]


def test_sketch_stat_error_bounds_hold_at_sf01(spark):
    """VERDICT r10 item 5: the exact-vs-sketch error bounds are pinned
    AT sf0.1 — the scale the bench suite actually runs — not just the
    sf0.01 measurement the docstrings cite. Measured at sf0.1:
    |ks_d err| = 0.000673, |mwu_z err| = 0.000285, BF F rel err
    0.0037; pins carry ~5-10x headroom under the contract tolerances
    so only a real accuracy regression trips."""
    import __spark_entry__ as e

    qs = e.queries()
    sf = "/root/testdata/sf0.1"
    rows = {r["test"]: r for r in qs["stat_tests_from_sketch"](spark, sf).collect()}
    assert rows["ks_d"]["within_tol"] and rows["mwu_z"]["within_tol"]
    assert rows["ks_d"]["abs_err"] <= 0.005, rows["ks_d"]["abs_err"]
    assert rows["mwu_z"]["abs_err"] <= 0.01, rows["mwu_z"]["abs_err"]

    bf = qs["stat_bf_from_sketch"](spark, sf).collect()
    assert bf and all(r["within_tol"] for r in bf), [
        (r["test"], r["abs_err"]) for r in bf if not r["within_tol"]]
    f_row = next(r for r in bf if r["test"] == "bf_f_stat")
    assert f_row["abs_err"] <= 0.02 * abs(f_row["exact_stat"]), f_row


def test_round_half_away_matches_sql_semantics(spark):
    """functions.quant.round_half_away ties go AWAY from zero on both
    signs — the SQL round() convention both engines share — unlike
    Python's half-even round(); driver-local quantized algorithms
    (ivf_refine means, logreg weight updates) depend on this to stay
    replayable by their SQL oracle twins."""
    from semantik_spark.functions.quant import round_half_away

    assert round_half_away(0.0000005, 6) == 0.000001
    assert round_half_away(-0.0000005, 6) == -0.000001
    assert round_half_away(2.5, 0) == 3.0
    assert round_half_away(-2.5, 0) == -3.0
    assert round(2.5) == 2  # the Python builtin disagrees: half-even
    # agreement with Spark's F.round on the same literals
    from pyspark.sql import functions as F
    row = spark.range(1).select(
        F.round(F.lit(2.5), 0).alias("a"),
        F.round(F.lit(-2.5), 0).alias("b")).collect()[0]
    assert row["a"] == 3.0 and row["b"] == -3.0


def test_round_half_away_agrees_with_spark_round_broadly(spark):
    """Batch agreement check between the driver-side quant helper and
    Spark's F.round over adversarial half-point patterns and a
    deterministic pseudo-random spread in the magnitude range the
    quantized driver algorithms actually see (centroid means, logreg
    weights: |x| <= ~1e6) — one Spark job, vectorized compare."""
    import struct

    from pyspark.sql import functions as F

    from semantik_spark.functions.quant import round_half_away

    vals = []
    # half-point knife-edges on both signs at several scales
    for mag in (0.0000005, 0.0000015, 0.1234565, 2.5, 123.4567895):
        vals += [mag, -mag]
    # deterministic pseudo-random doubles from a hash ladder
    seed = 0x9E3779B97F4A7C15
    x = seed
    for _ in range(2000):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        frac = (x >> 11) / float(1 << 53)          # [0, 1)
        mag = (frac - 0.5) * 2e6                   # [-1e6, 1e6)
        vals.append(mag)
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select("v", F.round("v", 6).alias("r")).collect()
    bad = [(r["v"], r["r"], round_half_away(r["v"], 6))
           for r in rows
           if struct.pack("d", r["r"]) != struct.pack(
               "d", round_half_away(r["v"], 6))]
    assert bad == [], f"{len(bad)} disagreements, first: {bad[:3]}"
