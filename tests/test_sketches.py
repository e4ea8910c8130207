"""KMV distinct sketch (operators/sketches.py) — exactness below k,
estimator accuracy above k, and the algebraic-merge property the
two-phase plan relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantik_spark.operators.sketches import kmv_distinct


def test_kmv_exact_below_k(spark):
    rows = [("a", i % 10) for i in range(100)] + [("b", i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["g"]: r for r in kmv_distinct(df, "g", "v", k=64).collect()}
    assert out["a"]["n_exact"] == 10 and out["a"]["kmv_estimate"] == 10.0
    assert out["b"]["n_exact"] == 3 and out["b"]["kmv_estimate"] == 3.0
    assert out["a"]["rel_error"] == 0.0


def test_kmv_estimate_above_k(spark):
    # 5000 distinct values, k=64: KMV stderr ~ 1/sqrt(k-2) ~ 12.7%;
    # assert a loose 3-sigma band so the test is deterministic-stable
    df = spark.range(5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    r = kmv_distinct(df, "g", "v", k=64).collect()[0]
    assert r["n_exact"] == 5000
    assert r["n_sketch"] == 64
    assert abs(r["kmv_estimate"] - 5000) / 5000 < 0.4
    assert r["rel_error"] == round(abs(r["kmv_estimate"] - 5000) / 5000, 6)


def test_kmv_duplicates_do_not_inflate(spark):
    # every value appears 50x — the estimate must see only distincts
    rows = [("g", i) for i in range(200) for _ in range(50)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = kmv_distinct(df, "g", "v", k=256).collect()[0]
    assert r["n_exact"] == 200
    assert r["kmv_estimate"] == 200.0  # below k → exact


def test_kmv_salt_count_invariance(spark):
    # the merged k-smallest set is independent of how phase 1 salts —
    # the property that makes the sketch mergeable across partitions
    df = spark.range(3000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    a = kmv_distinct(df, "g", "v", k=32, n_salts=1).collect()[0]
    b = kmv_distinct(df, "g", "v", k=32, n_salts=64).collect()[0]
    assert a["kmv_estimate"] == b["kmv_estimate"]
    assert a["n_exact"] == b["n_exact"]


# --- DDSketch quantiles ----------------------------------------------------

from semantik_spark.operators.sketches import (  # noqa: E402
    ddsketch_buckets,
    ddsketch_params,
    ddsketch_quantiles,
)


def _vals(spark, values, g="g"):
    return spark.createDataFrame([(g, float(v)) for v in values], ["g", "v"])


def test_ddsketch_relative_error_bound(spark):
    # 1..1000: every estimate must be within alpha of the true
    # lower-quantile value — the sketch's defining guarantee
    import math

    alpha = 0.01
    vals = list(range(1, 1001))
    out = {r["q"]: r for r in ddsketch_quantiles(
        _vals(spark, vals), "g", "v", alpha=alpha,
        quantiles=(0.25, 0.5, 0.9, 0.99)).collect()}
    for q, row in out.items():
        true = vals[max(1, math.ceil(q * len(vals))) - 1]
        assert abs(row["estimate"] - true) / true <= alpha + 1e-9, (q, row, true)
        assert row["n"] == 1000


def test_ddsketch_merge_equals_rebuild(spark):
    # merge(sketch(A), sketch(B)) == sketch(A ∪ B): bucket counts add
    a = [1.5 * i for i in range(1, 400)]
    b = [0.02 * i for i in range(1, 300)]
    sa = ddsketch_buckets(_vals(spark, a), "g", "v", alpha=0.02)
    sb = ddsketch_buckets(_vals(spark, b), "g", "v", alpha=0.02)
    merged = (
        sa.unionByName(sb).groupBy("g", "bucket")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    rebuilt = ddsketch_buckets(_vals(spark, a + b), "g", "v", alpha=0.02)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rebuilt.collect()))
    # and quantiles extracted from the merged sketch match the rebuild
    qm = ddsketch_quantiles(None, "g", "v", alpha=0.02, buckets=merged).collect()
    qr = ddsketch_quantiles(_vals(spark, a + b), "g", "v", alpha=0.02).collect()
    assert sorted(map(tuple, qm)) == sorted(map(tuple, qr))


def test_ddsketch_nonpositive_reserved_bucket(spark):
    rows = [("g", -1.0), ("g", 0.0), ("g", 5.0), ("g", 7.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    b = ddsketch_buckets(df, "g", "v", alpha=0.02)
    assert b.where(F.col("bucket") == -(2**31)).collect()[0]["n"] == 2
    # quantiles are computed over positive values only
    out = ddsketch_quantiles(df, "g", "v", alpha=0.02, quantiles=(0.5,)).collect()
    assert out[0]["n"] == 2


def test_ddsketch_params_stable():
    gamma, inv_lg, coeff = ddsketch_params(0.02)
    assert abs(gamma - 1.02 / 0.98) < 1e-15
    assert abs(coeff * (gamma + 1.0) - 2.0) < 1e-15


def test_winsorized_stats_clamps_tails(spark):
    from semantik_spark.operators.sketches import winsorized_stats

    # 1..100 plus two absurd outliers: the winsorized mean must sit
    # near the bulk mean while the raw mean is dragged far right
    vals = list(range(1, 101)) + [100000.0, 500000.0]
    df = spark.createDataFrame([("g", float(v)) for v in vals], ["g", "v"])
    r = winsorized_stats(df, "g", "v", alpha=0.02, lo_q=0.05, hi_q=0.95).collect()[0]
    assert r["n"] == 102
    assert r["n_hi"] >= 2  # both outliers clamped (plus tail of bulk)
    assert r["winsorized_mean"] < 120
    assert r["raw_mean"] > 5000
    assert r["n_lo"] >= 0


def test_ddsketch_collapse_bounds_state_and_keeps_upper_quantiles(spark):
    """The bounded variant: a value range spanning 24 decades blows the
    bucket count far past the cap; after collapse every group holds
    <= cap positive buckets, and quantiles at/above the collapsed mass
    are IDENTICAL to the unbounded sketch (their buckets untouched)."""
    from semantik_spark.operators.sketches import (
        ddsketch_buckets, ddsketch_collapse, ddsketch_quantiles,
    )

    rows = [("a", 10.0 ** (i % 24 - 12) * (1 + (i % 7) / 10)) for i in range(500)]
    rows += [("a", -1.0)] * 3  # reserved bucket must survive untouched
    df = spark.createDataFrame(rows, ["g", "v"])
    full = ddsketch_buckets(df, "g", "v", alpha=0.02)
    n_full = full.where("bucket != %d" % -(2**31)).count()
    cap = 40
    assert n_full > cap  # the scenario actually stresses the cap
    bounded = ddsketch_collapse(full, cap)
    pos = bounded.where("bucket != %d" % -(2**31))
    assert pos.count() <= cap
    # reserved bucket count preserved
    assert bounded.where("bucket = %d" % -(2**31)).collect()[0]["n"] == 3
    # total mass preserved
    assert (full.agg(F.sum("n")).collect()[0][0]
            == bounded.agg(F.sum("n")).collect()[0][0])
    # quantiles above the collapsed mass identical to the unbounded
    # sketch (cap=40 of ~168 equal-mass buckets retains the top ~24%,
    # so q=0.9/0.99 are untouched); q=0.5 sits INSIDE the collapsed
    # tail and must answer with the lowest retained bucket — a bounded
    # OVERestimate, never an underestimate
    qf = {(r["g"], r["q"]): r["estimate"] for r in ddsketch_quantiles(
        None, "g", "v", alpha=0.02, quantiles=(0.5, 0.9, 0.99), buckets=full).collect()}
    qb = {(r["g"], r["q"]): r["estimate"] for r in ddsketch_quantiles(
        None, "g", "v", alpha=0.02, quantiles=(0.5, 0.9, 0.99), buckets=bounded).collect()}
    for q in (0.9, 0.99):
        assert qb[("a", q)] == qf[("a", q)], q
    assert qb[("a", 0.5)] >= qf[("a", 0.5)]
    lowest_kept = pos.agg(F.min("bucket")).collect()[0][0]
    from semantik_spark.operators.sketches import ddsketch_params
    gamma, _, coeff = ddsketch_params(0.02)
    assert qb[("a", 0.5)] == round(coeff * gamma ** lowest_kept, 6)


def test_ddsketch_collapse_mergeable(spark):
    """merge(collapse(A), collapse(B)) re-collapsed equals
    collapse(sketch(A ∪ B)) — the bounded sketch keeps the merge
    algebra (collapse commutes with count-addition up to the final
    re-collapse, since collapsing only ever moves mass UP to the same
    group-wise cutoffs)."""
    from semantik_spark.operators.sketches import ddsketch_buckets, ddsketch_collapse

    rows_a = [("g", 10.0 ** (i % 20 - 10)) for i in range(300)]
    rows_b = [("g", 10.0 ** (i % 16 - 4) * 3.0) for i in range(300)]
    cap = 24
    a = spark.createDataFrame(rows_a, ["g", "v"])
    b = spark.createDataFrame(rows_b, ["g", "v"])
    ca = ddsketch_collapse(ddsketch_buckets(a, "g", "v", 0.02), cap)
    cb = ddsketch_collapse(ddsketch_buckets(b, "g", "v", 0.02), cap)
    merged = ddsketch_collapse(
        ca.unionByName(cb).groupBy("g", "bucket")
        .agg(F.sum("n").cast("bigint").alias("n")),
        cap,
    )
    direct = ddsketch_collapse(
        ddsketch_buckets(a.unionByName(b), "g", "v", 0.02), cap
    )
    got = {(r["g"], r["bucket"]): r["n"] for r in merged.collect()}
    want = {(r["g"], r["bucket"]): r["n"] for r in direct.collect()}
    # same bound, same total mass, and identical buckets at/above the
    # final cutoff (the collapsed tails may differ by at most the
    # intermediate cutoff choice — the paper's bounded-error window)
    assert len(got) <= cap and len(want) <= cap
    assert sum(got.values()) == sum(want.values())
    cut = max(min(k[1] for k in got), min(k[1] for k in want))
    assert {k: v for k, v in got.items() if k[1] > cut} == \
           {k: v for k, v in want.items() if k[1] > cut}


# --- HyperLogLog -------------------------------------------------------------

def test_hll_merge_equals_batch(spark):
    # ANY shard split merges (register-wise max) to the batch sketch
    # bit-for-bit — the lattice property the 100 TB union story needs
    from semantik_spark.operators.sketches import (
        hll_estimate, hll_merge_registers, hll_registers)

    df = spark.range(4000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v"))
    a = hll_registers(df.where(F.col("v") % 2 == 0), "g", "v")
    b = hll_registers(df.where(F.col("v") % 2 == 1), "g", "v")
    merged = {(r["g"], r["j"]): r["mj"]
              for r in hll_merge_registers(a, b).collect()}
    batch = {(r["g"], r["j"]): r["mj"]
             for r in hll_registers(df, "g", "v").collect()}
    assert merged == batch


def test_hll_estimate_accuracy_and_exact(spark):
    # 8000 distincts, m=256: stderr ~ 1.04/sqrt(m) ~ 6.5%; assert a
    # loose deterministic band + the exact column is truly exact
    from semantik_spark.operators.sketches import hll_distinct

    df = spark.range(8000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    r = hll_distinct(df, "g", "v", p=8).collect()[0]
    assert r["n_exact"] == 8000
    est = r["estimate_milli"] / 1000.0
    assert abs(est - 8000) / 8000 < 0.25
    assert r["rel_error"] == round(abs(est - 8000) / 8000, 6)


def test_hll_linear_counting_small_range(spark):
    # far below 2.5m with empty registers -> the ln branch; near-exact
    from semantik_spark.operators.sketches import hll_distinct

    df = spark.range(20).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    r = hll_distinct(df, "g", "v", p=8).collect()[0]
    assert r["v_zero"] > 0
    assert abs(r["estimate_milli"] / 1000.0 - 20) < 2.0


def test_hll_duplicates_do_not_move_registers(spark):
    from semantik_spark.operators.sketches import hll_registers

    once = spark.range(500).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    many = once.unionByName(once).unionByName(once)
    a = {(r["g"], r["j"]): r["mj"] for r in hll_registers(once, "g", "v").collect()}
    b = {(r["g"], r["j"]): r["mj"] for r in hll_registers(many, "g", "v").collect()}
    assert a == b


def test_hll_nulls_excluded(spark):
    df = spark.createDataFrame([("a", None), ("a", 3)], "g string, v bigint")
    from semantik_spark.operators.sketches import hll_distinct
    r = hll_distinct(df, "g", "v").collect()[0]
    assert r["n_exact"] == 1 and r["v_zero"] == 255


def test_hll_packed_equals_row_form(spark):
    # the serving layout: one array<tinyint> row per group must yield
    # the SAME moments and estimate as the (g, j, mj) row form
    from semantik_spark.operators.sketches import (
        hll_estimate, hll_estimate_packed, hll_pack, hll_registers)

    df = spark.range(6000).select(
        (F.col("id") % 4).cast("string").alias("g"), F.col("id").alias("v"))
    regs = hll_registers(df, "g", "v", p=8)
    row_form = {r["g"]: (r["v_zero"], r["sum_scaled"], r["estimate_milli"])
                for r in hll_estimate(regs, p=8).collect()}
    packed = hll_pack(regs, p=8)
    rows = packed.collect()
    assert all(len(r["regs"]) == 256 for r in rows)
    got = {r["g"]: (r["v_zero"], r["sum_scaled"], r["estimate_milli"])
           for r in hll_estimate_packed(packed, p=8).collect()}
    assert got == row_form and len(got) == 4


def test_hll_packed_merge_lattice(spark):
    # shard -> pack -> zip_with-max merge == pack(batch); disjoint
    # groups on one side merge against the all-zero sketch
    from semantik_spark.operators.sketches import (
        hll_merge_packed, hll_pack, hll_registers)

    df = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v"))
    a = hll_pack(hll_registers(df.where(F.col("v") % 2 == 0), "g", "v"))
    b = hll_pack(hll_registers(df.where(F.col("v") % 2 == 1), "g", "v"))
    merged = {r["g"]: list(r["regs"])
              for r in hll_merge_packed(a, b).collect()}
    batch = {r["g"]: list(r["regs"])
             for r in hll_pack(hll_registers(df, "g", "v")).collect()}
    assert merged == batch
    # one-sided group: present only in shard a -> merges against the
    # all-zero sketch, i.e. passes through unchanged
    onlya = spark.createDataFrame([("zz", 7)], "g string, v bigint")
    am = hll_pack(hll_registers(onlya, "g", "v"))
    want_zz = {r["g"]: list(r["regs"]) for r in am.collect()}["zz"]
    out = {r["g"]: list(r["regs"])
           for r in hll_merge_packed(am, b).collect()}
    assert out["zz"] == want_zz and sum(1 for x in out["zz"] if x > 0) == 1


def test_kmv_and_winsorized_degenerate_groups(spark):
    """All-NULL groups produce empty sketches (n_exact = 0): rel_error
    and jaccard must be NULL, not ANSI aborts; and a group with no
    positive mass must keep its rows (raw mean, no clamping) instead
    of vanishing through the winsorized cutpoint join."""
    from semantik_spark.operators.sketches import (
        kmv_distinct,
        kmv_set_ops,
        winsorized_stats,
    )

    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", "v1"), ("b", "v2")],
        "g string, val string")
    rows = {r["g"]: r for r in kmv_distinct(df, "g", "val").collect()}
    assert rows["a"]["n_exact"] == 0 and rows["a"]["rel_error"] is None
    assert rows["b"]["rel_error"] is not None
    pair = kmv_set_ops(df.where("g = 'a'").unionByName(
        spark.createDataFrame([("c", None)], "g string, val string")),
        "g", "val").collect()[0]
    assert pair["jaccard_est"] is None

    w = spark.createDataFrame(
        [("zero", 0.0)] * 4 + [("pos", float(i)) for i in range(1, 60)],
        "g string, v double")
    out = {r["g"]: r for r in winsorized_stats(w, "g", "v").collect()}
    assert "zero" in out                       # group not dropped
    assert out["zero"]["winsorized_mean"] == 0.0
    assert out["zero"]["n_lo"] == 0 and out["zero"]["n_hi"] == 0
