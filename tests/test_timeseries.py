"""As-of join and range-window operators (operators/timeseries.py).

These are engine-native temporal operators the reference lacks
(SURVEY.md §2.3 lists theta/range/as-of joins as absent); semantics are
pinned here with hand-built fixtures: backward inclusive match, null
for left rows with no prior right row, deterministic under timestamp
collisions after pre-reduction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from semantik_spark.operators.timeseries import asof_join, preceding_range_window


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", 100, 1),
            ("A", 250, 2),
            ("A", 300, 3),   # equal-ts quote must match (inclusive)
            ("B", 50, 4),    # no prior quote -> nulls
            ("B", 500, 5),
        ],
        ["sym", "us", "trade_id"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", 90, 10.0),
            ("A", 200, 11.0),
            ("A", 300, 12.0),
            ("B", 400, 20.0),
        ],
        ["sym", "us", "px"],
    )
    return trades, quotes


def test_asof_backward_inclusive(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, keys=["sym"], ts_col="us", right_cols=["px"])
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == {1: 10.0, 2: 11.0, 3: 12.0, 4: None, 5: 20.0}


def test_asof_keeps_all_left_rows_and_columns(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, keys=["sym"], ts_col="us", right_cols=["px"])
    assert out.count() == trades.count()
    assert set(out.columns) == {"sym", "us", "trade_id", "px"}


def test_asof_deterministic_after_right_reduction(spark):
    """Duplicate right timestamps reduced to max-value rows give a
    deterministic match (the documented caller contract)."""
    left = spark.createDataFrame([("A", 100, 1)], ["k", "us", "lid"])
    right_raw = spark.createDataFrame(
        [("A", 100, 5), ("A", 100, 9), ("A", 40, 1)], ["k", "us", "v"]
    )
    right = right_raw.groupBy("k", "us").agg(F.max("v").alias("v"))
    out = asof_join(left, right, keys=["k"], ts_col="us", right_cols=["v"])
    assert out.collect()[0]["v"] == 9


def test_preceding_range_window_counts(spark):
    ev = spark.createDataFrame(
        [("u", 0), ("u", 5), ("u", 10), ("u", 100), ("v", 7)],
        ["user", "us"],
    )
    w = preceding_range_window(["user"], "us", 10)
    got = {
        (r["user"], r["us"]): r["n"]
        for r in ev.select("user", "us", F.count("*").over(w).alias("n")).collect()
    }
    # frame = [us-10, us] inclusive, per user
    assert got == {("u", 0): 1, ("u", 5): 2, ("u", 10): 3, ("u", 100): 1, ("v", 7): 1}


def test_preceding_range_window_includes_ts_peers(spark):
    ev = spark.createDataFrame([("u", 5), ("u", 5), ("u", 5)], ["user", "us"])
    w = preceding_range_window(["user"], "us", 1)
    ns = [r["n"] for r in ev.select(F.count("*").over(w).alias("n")).collect()]
    assert ns == [3, 3, 3]  # RANGE frames include all peers at the boundary


def _funnel_events(spark):
    # u1 completes view->click->purchase in order; u2 clicks BEFORE its
    # first view (out-of-order steps must not count); u3 views only;
    # u4 has click at the exact view timestamp (strict > excludes it).
    rows = [
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        (2, "click", 50), (2, "view", 100), (2, "purchase", 150),
        (3, "view", 100),
        (4, "view", 100), (4, "click", 100),
    ]
    return spark.createDataFrame(rows, ["user_id", "event_type", "us"]).select(
        "user_id", "event_type", F.timestamp_micros("us").alias("ts")
    )


def test_funnel_strict_ordering(spark):
    from semantik_spark.operators.timeseries import funnel

    out = funnel(_funnel_events(spark), ["view", "click", "purchase"])
    got = {r["step"]: (r["n_users"], r["conversion"]) for r in out.collect()}
    # u2's click precedes its view and u4's click ties the view ts, so
    # only u1 advances past step 0
    assert got == {"view": (4, 1.0), "click": (1, 0.25), "purchase": (1, 0.25)}


def test_funnel_uses_earliest_chain(spark):
    from semantik_spark.operators.timeseries import funnel

    # user re-views after clicking: the EARLIEST view anchors the chain,
    # so the later click still counts
    rows = [(1, "view", 100), (1, "view", 900), (1, "click", 500)]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "us"]).select(
        "user_id", "event_type", F.timestamp_micros("us").alias("ts")
    )
    out = funnel(ev, ["view", "click"])
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"view": 1, "click": 1}


def test_retention_cohorts(spark):
    from semantik_spark.operators.timeseries import retention_cohorts

    day = 86_400_000_000
    rows = [
        (1, 0), (1, day), (1, 3 * day),        # cohort d0: active offsets 0,1,3
        (2, 0), (2, day),                      # cohort d0: offsets 0,1
        (3, day), (3, 2 * day),                # cohort d1: offsets 0,1
        (4, 10 * day),                         # beyond max_offset from no one; own cohort
    ]
    ev = spark.createDataFrame(rows, ["user_id", "us"]).select(
        "user_id", F.timestamp_micros("us").alias("ts")
    )
    out = retention_cohorts(ev, max_offset=7)
    got = {(r["cohort_day"], r["day_offset"]): (r["n_active"], r["n_cohort"], r["retention"])
           for r in out.collect()}
    assert got[("1970-01-01", 0)] == (2, 2, 1.0)
    assert got[("1970-01-01", 1)] == (2, 2, 1.0)
    assert got[("1970-01-01", 3)] == (1, 2, 0.5)
    assert got[("1970-01-02", 0)] == (1, 1, 1.0)
    assert got[("1970-01-02", 1)] == (1, 1, 1.0)
    assert got[("1970-01-11", 0)] == (1, 1, 1.0)
    assert ("1970-01-01", 2) not in got


def test_props_stats_null_safe(spark):
    from semantik_spark.operators.timeseries import props_stats

    ev = spark.createDataFrame(
        [("a", '{"k": 5}'), ("a", '{"k": 7}'), ("a", '{"x": 1}'),
         ("b", None), ("b", '{"k": 2}')],
        ["event_type", "props"],
    )
    out = props_stats(ev, "$.k")
    got = {r["event_type"]: (r["n_with_k"], r["min_k"], r["max_k"], r["sum_k"], r["avg_k"])
           for r in out.collect()}
    assert got["a"] == (2, 5, 7, 12, 6.0)
    assert got["b"] == (1, 2, 2, 2, 2.0)


def test_rolling_stats_rows_frame(spark):
    import datetime

    from semantik_spark.operators.timeseries import rolling_stats

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, 1, t0 + datetime.timedelta(seconds=i), float(v))
        for i, v in enumerate([10.0, 20.0, 60.0, 2.0])
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = {r["event_id"]: r for r in rolling_stats(df, n_rows=3).collect()}
    assert out[0]["roll_avg"] == 10.0 and out[0]["roll_n"] == 1
    assert out[1]["roll_avg"] == 15.0 and out[1]["roll_n"] == 2
    assert out[2]["roll_avg"] == 30.0 and out[2]["roll_n"] == 3
    assert out[3]["roll_avg"] == round((20 + 60 + 2) / 3, 6)  # frame slides
    assert out[3]["roll_min"] == 2.0 and out[3]["roll_max"] == 60.0


def test_funnel_latency_earliest_valid_chain(spark):
    import datetime

    from semantik_spark.operators.timeseries import funnel_latency

    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, u, et, s):
        return (eid, u, et, t0 + datetime.timedelta(seconds=s))

    rows = [
        # user 1 converts: view@0 -> click@10 -> purchase@30 => 30s
        ev(1, 1, "view", 0), ev(2, 1, "click", 10), ev(3, 1, "purchase", 30),
        # user 2: purchase BEFORE click -> not a valid chain
        ev(4, 2, "view", 0), ev(5, 2, "purchase", 5), ev(6, 2, "click", 10),
        # user 3 converts: 60s end to end (second view ignored; first anchors)
        ev(7, 3, "view", 0), ev(8, 3, "view", 40), ev(9, 3, "click", 50),
        ev(10, 3, "purchase", 60),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts"])
    r = funnel_latency(df, ["view", "click", "purchase"]).collect()[0]
    assert r["n_converted"] == 2
    assert r["p50_s"] == 45.0  # interpolated between 30 and 60
    assert r["max_s"] == 60.0


def test_session_paths_orders_and_caps(spark):
    import datetime

    from semantik_spark.operators.timeseries import session_paths

    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, u, et, minutes):
        return (eid, u, et, t0 + datetime.timedelta(minutes=minutes))

    rows = [
        # user 1 session 1: view>click ; session 2 (90-min gap): view
        ev(1, 1, "view", 0), ev(2, 1, "click", 5), ev(3, 1, "view", 95),
        # user 2: one view>click session
        ev(4, 2, "view", 0), ev(5, 2, "click", 2),
        # user 3: 10 events, path truncated to max_len=3
        *[ev(10 + i, 3, f"e{i}", i) for i in range(10)],
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts"])
    out = session_paths(df, gap_minutes=30, max_len=3, top_k=10).collect()
    by = {r["path"]: r["n_sessions"] for r in out}
    assert by["view>click"] == 2
    assert by["view"] == 1
    assert by["e0>e1>e2"] == 1  # capped at 3 steps
    assert out[0]["path"] == "view>click"  # most frequent first


class TestCusum:
    def test_level_shift_alarms_and_prefix_identity(self, spark):
        import datetime as dt

        from semantik_spark.operators.timeseries import cusum_changepoints

        # 40 obs at level 0, then 20 at level 10: an upward shift the
        # S+ chart must flag; no downward alarm. Plus a flat key that
        # must never alarm (sd=0 -> h_band=0... keep sd>0 via jitter).
        base = dt.datetime(2021, 1, 1)
        rows = []
        for i in range(60):
            v = 0.0 if i < 40 else 10.0
            v += 0.5 if i % 2 else -0.5  # symmetric jitter, keeps sd sane
            rows.append((i, base + dt.timedelta(minutes=i), 1, "shift", v, None))
        for i in range(30):
            rows.append((100 + i, base + dt.timedelta(minutes=i), 1, "calm",
                         float(i % 2), None))
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")
        out = {r.event_type: r for r in cusum_changepoints(ev).collect()}
        shift = out["shift"]
        # the reference level is the GLOBAL mean (~3.3), so a step
        # change drifts BOTH charts: S- accumulates over the long
        # below-mean prefix, S+ fires once the high segment starts —
        # the positive alarm localizes the shift (minute >= 40), the
        # negative alarm precedes it
        assert shift.n_pos_alarm > 0 and shift.n_neg_alarm > 0
        assert shift.first_pos_us >= int(
            (base + dt.timedelta(minutes=40)).timestamp() * 1_000_000)
        assert shift.first_neg_us < shift.first_pos_us
        assert shift.max_s_pos > 0
        calm = out["calm"]
        assert calm.n_pos_alarm == 0 and calm.n_neg_alarm == 0

    def test_replays_recursive_definition(self, spark):
        import datetime as dt

        from semantik_spark.operators.timeseries import cusum_changepoints

        # pin the closed-form prefix-sum identity against a literal
        # Python replay of Page's recursion on the same numbers
        vals = [1.0, 3.0, -2.0, 8.0, 9.0, 7.5, -1.0, 0.0, 12.0, 11.0]
        base = dt.datetime(2021, 6, 1)
        ev = spark.createDataFrame(
            [(i, base + dt.timedelta(seconds=i), 1, "k", v, None)
             for i, v in enumerate(vals)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
        row = cusum_changepoints(ev, k_slack=0.5, h_threshold=1.0).collect()[0]

        mu = round(sum(vals) / len(vals), 6)
        n = len(vals)
        var = sum((v - mu) ** 2 for v in vals) / (n - 1)
        sd = round(var ** 0.5, 6)
        thr_pos, thr_neg = round(mu + 0.5 * sd, 6), round(mu - 0.5 * sd, 6)
        h = round(1.0 * sd, 6)
        sp = sn = 0.0
        n_pos = n_neg = 0
        max_sp = max_sn = 0.0
        for v in vals:
            sp = max(0.0, sp + (v - thr_pos))
            sn = max(0.0, sn + (thr_neg - v))
            n_pos += sp > h
            n_neg += sn > h
            max_sp, max_sn = max(max_sp, sp), max(max_sn, sn)
        assert row.n_pos_alarm == n_pos and row.n_neg_alarm == n_neg
        assert abs(row.max_s_pos - max_sp) < 1e-6
        assert abs(row.max_s_neg - max_sn) < 1e-6


def test_trend_ols_matches_numpy_fit(spark):
    import datetime as dt

    import numpy as np

    from semantik_spark.operators.timeseries import trend_ols

    base = dt.datetime(2022, 3, 1)
    rng = [(i * 3600, 2.5 + 0.125 * (i * 3600) / 86400.0 + (1 if i % 2 else -1) * 0.3)
           for i in range(50)]
    rows = [(i, base + dt.timedelta(seconds=s), 1, "up", v, None)
            for i, (s, v) in enumerate(rng)]
    rows += [(1000 + i, base + dt.timedelta(seconds=i * 60), 1, "flat", 7.0, None)
             for i in range(20)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r.event_type: r for r in trend_ols(ev).collect()}

    xs = np.array([s for s, _ in rng], dtype=float)
    ys = np.array([v for _, v in rng], dtype=float)
    slope, intercept = np.polyfit(xs, ys, 1)
    up = out["up"]
    assert abs(up.slope_per_day - slope * 86400.0) < 1e-4
    assert abs(up.intercept - intercept) < 1e-4
    r = np.corrcoef(xs, ys)[0, 1]
    assert abs(up.r2 - r * r) < 1e-6
    # constant series: var_y == 0 -> r2 NULL, slope 0
    flat = out["flat"]
    assert flat.slope_per_day == 0.0 and flat.r2 is None


def test_interval_overlap_join_equals_theta_join(spark):
    """Bucket blocking is recall-exact: candidates via covered-bucket
    equi-join + verify == the raw range predicate join, including
    intervals that span multiple buckets and pairs that share several."""
    from pyspark.sql import functions as F

    from semantik_spark.operators.timeseries import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 25), (3, 30, 31), (4, 19, 21)],
        ["lid", "l_start_us", "l_end_us"],
    )
    right = spark.createDataFrame(
        [(10, 8, 9), (20, 24, 40), (30, 100, 110)],
        ["rid", "r_start_us", "r_end_us"],
    )
    got = sorted(
        (r["lid"], r["rid"], r["overlap_us"])
        for r in interval_overlap_join(left, right, bucket_us=10).collect()
    )
    naive = sorted(
        (r["lid"], r["rid"], r["overlap_us"])
        for r in left.crossJoin(right)
        .where((F.col("l_start_us") <= F.col("r_end_us"))
               & (F.col("r_start_us") <= F.col("l_end_us")))
        .withColumn(
            "overlap_us",
            F.least("l_end_us", "r_end_us") - F.greatest("l_start_us", "r_start_us"),
        ).collect()
    )
    assert got == naive and len(got) > 0


def test_interval_overlap_two_level_equals_one_level(spark):
    """long_factor routes intervals spanning > C fine buckets to a
    coarse second level instead of K-fold replication; output must be
    IDENTICAL to the one-level join (pigeonhole recall preserved
    across every level pairing: short×short at fine, short×long and
    long×long at coarse)."""
    from pyspark.sql import functions as F

    from semantik_spark.operators.timeseries import interval_overlap_join

    # mix: points, short spans, one 30-bucket monster, aligned edges
    left = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 25), (3, 30, 31), (4, 19, 21),
         (5, 0, 299), (6, 100, 105), (7, 250, 260)],
        ["lid", "l_start_us", "l_end_us"],
    )
    right = spark.createDataFrame(
        [(10, 8, 9), (20, 24, 40), (30, 100, 110), (40, 0, 500),
         (50, 290, 295), (60, 600, 700)],
        ["rid", "r_start_us", "r_end_us"],
    )

    def key(df):
        return sorted((r["lid"], r["rid"], r["overlap_us"])
                      for r in df.collect())

    one = key(interval_overlap_join(left, right, bucket_us=10))
    naive = sorted(
        (r["lid"], r["rid"], r["overlap_us"])
        for r in left.crossJoin(right)
        .where((F.col("l_start_us") <= F.col("r_end_us"))
               & (F.col("r_start_us") <= F.col("l_end_us")))
        .withColumn(
            "overlap_us",
            F.least("l_end_us", "r_end_us") - F.greatest("l_start_us", "r_start_us"),
        ).collect()
    )
    assert one == naive and len(one) > 0
    for c in (2, 3, 8):
        two = key(interval_overlap_join(
            left, right, bucket_us=10, long_factor=c))
        assert two == one, f"long_factor={c} diverged"


def test_acf_constant_series_and_alternating(spark):
    """A perfectly alternating daily series has ACF(1) ~ -1 and
    ACF(2) ~ +1 — the sign structure the estimator must reproduce."""
    import datetime

    from semantik_spark.operators.timeseries import acf_daily

    rows = []
    eid = 0
    for d in range(20):
        n = 10 if d % 2 == 0 else 2
        for _ in range(n):
            rows.append((eid, datetime.datetime(2024, 1, 1 + d), 1, "a", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"])
    out = {r["lag"]: r["acf"] for r in acf_daily(ev, lags=(1, 2)).collect()}
    assert out[1] < -0.8
    assert out[2] > 0.7


def test_kaplan_meier_censoring_correct(spark):
    """KM with censoring: 4 users — two convert in hour 1, one in hour
    2, one never (censored at the boundary). S(1) = 1 - 2/4 = 0.5,
    S(2) = 0.5 * (1 - 1/2) = 0.25; the censored user holds a risk
    row at t=36 without dropping survival."""
    import datetime as dt

    from semantik_spark.operators.timeseries import kaplan_meier_conversion

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, hours, typ):
        return (u, t0 + dt.timedelta(hours=hours), typ)

    events = spark.createDataFrame(
        [ev(1, 0, "view"), ev(1, 1.5, "purchase"),
         ev(2, 0, "view"), ev(2, 1.9, "purchase"),
         ev(3, 0, "view"), ev(3, 2.5, "purchase"),
         ev(4, 0, "view"), ev(4, 100, "view")],  # never converts
        ["user_id", "ts", "event_type"])
    rows = {r["t"]: r for r in
            kaplan_meier_conversion(events, window_hours=36).collect()}
    assert rows[1]["n_risk"] == 4 and rows[1]["n_events"] == 2
    assert rows[1]["survival"] == 0.5
    assert rows[2]["n_risk"] == 2 and rows[2]["n_events"] == 1
    assert rows[2]["survival"] == 0.25
    assert rows[36]["n_censored"] == 1 and rows[36]["n_events"] == 0
    assert rows[36]["survival"] == 0.25  # censoring never drops S


def test_kaplan_meier_all_convert_hits_zero(spark):
    """When the last remaining users all convert, survival pins to
    exactly 0.0 (no ln(0) path)."""
    import datetime as dt

    from semantik_spark.operators.timeseries import kaplan_meier_conversion

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, t0, "view"), (1, t0 + dt.timedelta(hours=1), "purchase"),
         (2, t0, "view"), (2, t0 + dt.timedelta(hours=1), "purchase")],
        ["user_id", "ts", "event_type"])
    rows = kaplan_meier_conversion(events, window_hours=36).collect()
    assert len(rows) == 1 and rows[0]["survival"] == 0.0


def test_theil_sen_outlier_immune(spark):
    """One corrupted day (1000 vs the clean 10/day line) leaves the
    pairwise-slope median at exactly 10 and the median residual at 10 —
    the robustness OLS lacks; n_pairs = C(5,2)."""
    import datetime

    from semantik_spark.operators.timeseries import theil_sen_daily

    rows = [(datetime.date(2024, 1, 1 + i), float(v))
            for i, v in enumerate([10, 20, 30, 40, 1000])]
    df = spark.createDataFrame(rows, ["o_orderdate", "o_totalprice"])
    r = theil_sen_daily(df).collect()[0]
    assert r["n_days"] == 5 and r["n_pairs"] == 10
    assert r["slope_per_day"] == 10.0
    assert r["intercept"] == 10.0


def test_logrank_identical_and_separated(spark):
    """Identical conversion patterns across arms -> O-E sums to 0 and
    chi2 ~ 0; a degenerate single-arm cohort yields NULL chi2 (no
    DIVIDE_BY_ZERO abort)."""
    import datetime

    from semantik_spark.operators.timeseries import logrank_conversion

    t0 = datetime.datetime(2024, 1, 1)

    def ev(u, hours, typ):
        return (u, t0 + datetime.timedelta(hours=hours), typ)

    # arms identical: users 0/1 convert at 2h, users 2/3 at 5h
    rows = []
    for u, h in [(0, 2), (1, 2), (2, 5), (3, 5)]:
        rows += [ev(u, 0, "view"), ev(u, h, "purchase")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    r = logrank_conversion(df, window_hours=36, arms=2).collect()[0]
    assert r["n_users_0"] == 2 and r["n_users_1"] == 2
    assert r["observed_0"] == 2
    assert r["chi2"] == 0.0 and r["expected_0"] == 2.0

    # all users in arm 0 (even ids): variance terms vanish -> NULL
    rows2 = []
    for u, h in [(0, 2), (2, 5)]:
        rows2 += [ev(u, 0, "view"), ev(u, h, "purchase")]
    df2 = spark.createDataFrame(rows2, ["user_id", "ts", "event_type"])
    r2 = logrank_conversion(df2, window_hours=36, arms=2).collect()[0]
    assert r2["n_users_1"] == 0 and r2["chi2"] is None


def test_price_elasticity_recovers_exponent(spark):
    """Synthetic constant-elasticity demand qty = price^-2 recovers
    slope -2 with r2 = 1; unit price derives from extendedprice/qty;
    thin brands drop below min_obs."""
    from semantik_spark.operators.timeseries import price_elasticity

    rows = []
    for i, price in enumerate([1.0, 2.0, 4.0, 8.0]):
        qty = price ** -2
        rows.append((i, 1, qty, price * qty))  # extendedprice = p*q
    rows.append((9, 2, 1.0, 1.0))  # thin brand
    li = spark.createDataFrame(
        rows, ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"])
    part = spark.createDataFrame(
        [(1, "Brand#A"), (2, "Brand#B")], ["p_partkey", "p_brand"])
    out = price_elasticity(li, part, min_obs=3).collect()
    assert len(out) == 1 and out[0]["p_brand"] == "Brand#A"
    assert out[0]["elasticity"] == -2.0 and out[0]["r2"] == 1.0


def test_forecast_backtest_mase_one_for_linear(spark):
    """A linear series has constant seasonal-naive error (= slope *
    season) in both train and holdout, so MASE is exactly 1; rows
    cover only holdout days with a valid lag."""
    import datetime

    from semantik_spark.operators.timeseries import forecast_backtest_snaive

    rows = [(datetime.date(2024, 1, 1) + datetime.timedelta(days=i),
             float(10 * i + 100)) for i in range(21)]
    df = spark.createDataFrame(rows, ["o_orderdate", "o_totalprice"])
    out = forecast_backtest_snaive(df, season=7, holdout=7).collect()
    assert len(out) == 7
    assert all(r["abs_err"] == 70.0 for r in out)
    assert out[0]["mase_denom"] == 70.0 and out[0]["mase"] == 1.0
    assert all(r["forecast"] == r["actual"] - 70.0 for r in out)


def test_markov_stationary_two_state(spark):
    """Two-state chain a->b always, b->a always: stationary = (.5,.5);
    an absorbing state (no outgoing rows) keeps accumulating mass via
    the dangling self-loop."""
    import datetime

    from semantik_spark.operators.timeseries import markov_stationary

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, u, typ):
        return (i, u, t0 + datetime.timedelta(minutes=i), typ)

    # user 1: a b a b a -> transitions a->b x2, b->a x2
    rows = [ev(i, 1, t) for i, t in enumerate(["a", "b", "a", "b", "a"])]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = {r["state"]: r for r in markov_stationary(df, iterations=30).collect()}
    assert out["a"]["pi"] == 0.5 and out["b"]["pi"] == 0.5
    assert out["a"]["n_out"] == 2

    # a -> b, b absorbing: all mass drains to b
    rows2 = [ev(i, 1, t) for i, t in enumerate(["a", "b"])]
    df2 = spark.createDataFrame(rows2, ["event_id", "user_id", "ts", "event_type"])
    out2 = {r["state"]: r for r in markov_stationary(df2, iterations=30).collect()}
    assert out2["b"]["pi"] == 1.0 and out2["a"]["pi"] == 0.0
    assert out2["b"]["n_out"] == 0


def test_markov_attribution_removal_effect(spark):
    """A channel on EVERY converting path carries full removal effect;
    a channel only on dead-end paths carries none; shares normalize
    to 1."""
    import datetime

    from semantik_spark.operators.timeseries import markov_attribution

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, u, typ):
        return (i, u, t0 + datetime.timedelta(minutes=i), typ)

    # user 1: click -> purchase (converts through click)
    # user 2: view (never converts)
    rows = [ev(0, 1, "click"), ev(1, 1, "purchase"), ev(2, 2, "view")]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = {r["channel"]: r
           for r in markov_attribution(df, ["click", "view"]).collect()}
    assert out["click"]["p_full"] == 0.5
    assert out["click"]["p_removed"] == 0.0
    assert out["click"]["removal_effect"] == 1.0
    assert out["view"]["removal_effect"] == 0.0
    assert out["click"]["attribution"] == 1.0
    assert out["view"]["attribution"] == 0.0


def test_sequential_patterns_order_and_gaps(spark):
    """Subsequence containment with gaps: a..b counts even with c
    between; direction asymmetry separates a->b from b->a; the session
    gap splits sequences."""
    import datetime

    from semantik_spark.operators.timeseries import sequential_patterns

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, u, minutes, typ):
        return (i, u, t0 + datetime.timedelta(minutes=minutes), typ)

    rows = [
        # session 1 (user 1): a c b  -> a before b (gap allowed)
        ev(0, 1, 0, "a"), ev(1, 1, 1, "c"), ev(2, 1, 2, "b"),
        # session 2 (user 1, after 60min gap): b a -> b before a
        ev(3, 1, 90, "b"), ev(4, 1, 91, "a"),
        # user 2: a b
        ev(5, 2, 0, "a"), ev(6, 2, 1, "b"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = {(r["item_a"], r["item_b"]): r
           for r in sequential_patterns(df, gap_minutes=30,
                                        min_sessions=1, top_k=50).collect()}
    ab = out[("a", "b")]
    assert ab["n_sessions"] == 2 and ab["n_reverse"] == 1
    assert ab["asymmetry"] == round(2 / 3, 6)
    assert ab["support"] == round(2 / 3, 6)  # 3 sessions total
    assert out[("a", "c")]["n_sessions"] == 1


def test_funnel_wilson_known_interval(spark):
    """4-of-8 converts: p=0.5, Wilson z=1.96 CI = (0.21521, 0.78479); the
    interval stays in [0,1] even at p=1."""
    import datetime

    from semantik_spark.operators.timeseries import funnel_wilson

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for u in range(8):
        rows.append((u, t0, "view"))
        if u < 4:
            rows.append((u, t0 + datetime.timedelta(minutes=1), "click"))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    r = funnel_wilson(df, ["view", "click"]).collect()[0]
    assert (r["n_from"], r["n_to"], r["p"]) == (8, 4, 0.5)
    assert r["ci_lo"] == 0.215213 and r["ci_hi"] == 0.784787

    # all convert -> upper clamps at 1
    rows2 = [(u, t0, "view") for u in range(3)] + \
            [(u, t0 + datetime.timedelta(minutes=1), "click") for u in range(3)]
    df2 = spark.createDataFrame(rows2, ["user_id", "ts", "event_type"])
    r2 = funnel_wilson(df2, ["view", "click"]).collect()[0]
    assert r2["p"] == 1.0 and r2["ci_hi"] == 1.0 and r2["ci_lo"] < 1.0


def test_ljung_box_white_vs_weekly(spark):
    """A strongly weekly series exceeds the df=3 critical value; Q
    accounting matches the hand fold of the 6-dp ACF values."""
    import datetime

    from semantik_spark.operators.timeseries import acf_daily, ljung_box

    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    # 8 weeks of a hard weekly cycle: 10 events on Mondays, 1 otherwise
    eid = 0
    for d in range(56):
        n = 10 if d % 7 == 0 else 1
        for j in range(n):
            rows.append((eid, 1, t0 + datetime.timedelta(days=d, minutes=j),
                         "cycle"))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    r = ljung_box(df, lags=(1, 2, 7)).collect()[0]
    assert r["df"] == 3 and r["q_exceeds_05"]
    acf = {a["lag"]: a["acf"] for a in acf_daily(df, lags=(1, 2, 7)).collect()}
    assert acf[7] > 0.8  # the weekly peak (biased-denominator estimator)
    n = r["n_days"]
    want = round(n * (n + 2) * sum(
        round(acf[k] * acf[k] / (n - k), 9) for k in (1, 2, 7)), 6)
    assert r["q_stat"] == want


def test_pacf_matches_durbin_levinson_fold(spark):
    """PACF(1) equals ACF(1); PACF(2) matches the hand Durbin-Levinson
    fold of the 6-dp ACF values with pico quantization."""
    import datetime
    import math

    from semantik_spark.operators.timeseries import acf_daily, pacf_daily

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # alternating 9/1 days -> strong negative lag-1 structure
    for d in range(30):
        for j in range(9 if d % 2 == 0 else 1):
            rows.append((eid, 1, t0 + datetime.timedelta(days=d, minutes=j),
                         "alt"))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    acf = {r["lag"]: r["acf"] for r in acf_daily(
        df, lags=(1, 2)).collect()}
    out = {r["lag"]: r["pacf"] for r in pacf_daily(df, max_lag=2).collect()}
    q = lambda x: math.floor(x * 1e12 + 0.5)  # noqa: E731
    assert out[1] == round(q(acf[1]) / 1e12, 6) == round(acf[1], 6)
    phi11 = q(acf[1])
    sn = q((phi11 / 1e12) * acf[1])
    kk = q((acf[2] - sn / 1e12) / (1.0 - sn / 1e12))
    assert out[2] == round(kk / 1e12, 6)
    assert acf[1] < -0.8  # the alternation is visible


def test_ljung_box_rejects_oversized_lag_set(spark):
    import pytest as _pytest

    from semantik_spark.operators.timeseries import ljung_box

    df = spark.createDataFrame(
        [(1, 1, __import__("datetime").datetime(2024, 1, 1), "x")],
        ["event_id", "user_id", "ts", "event_type"])
    with _pytest.raises(ValueError, match="1..10 lags"):
        ljung_box(df, lags=tuple(range(1, 12)))


def test_ljung_box_short_series_df_shrinks(spark):
    """A group whose daily series is shorter than a requested lag
    loses that NULL ACF term from BOTH Q and df, and the verdict
    compares against the chi-square row for the shrunken df."""
    import datetime

    from semantik_spark.operators.timeseries import ljung_box

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 5-day series: lag 7 has no pairs -> NULL ACF -> df = 2, not 3
    for d in range(5):
        for j in range(2 + d % 2):
            rows.append((eid, 1, t0 + datetime.timedelta(days=d, minutes=j),
                         "short"))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts",
                                      "event_type"])
    r = ljung_box(df, lags=(1, 2, 7)).collect()[0]
    assert r["df"] == 2
    assert r["q_exceeds_05"] is not None  # critical row exists for df=2


def test_degenerate_inputs_yield_null_not_ansi_abort(spark):
    """ANSI mode turns x/0 into a job-killing error: zero-variance
    trend groups, all-NULL ewma windows, constant daily series, and
    empty funnel bases must yield NULL statistics, not abort."""
    import datetime

    from semantik_spark.operators.timeseries import (
        acf_daily,
        ewm_smooth,
        funnel,
        trend_ols,
        funnel_wilson,
    )

    t = datetime.datetime(2024, 1, 5, 12, 0, 0)
    one = spark.createDataFrame([(1, "solo", t, 5.0)],
                                ["event_id", "event_type", "ts", "value"])
    r = trend_ols(one).collect()[0]
    assert r["slope_per_day"] is None and r["r2"] is None

    nulls = spark.createDataFrame(
        [(1, "a", t, None), (2, "a", t + datetime.timedelta(hours=1), 3.0)],
        "event_id long, event_type string, ts timestamp, value double")
    rows = {x["event_id"]: x["ewma"] for x in ewm_smooth(nulls).collect()}
    assert rows[1] is None and rows[2] == 3.0

    # constant daily series: two event types, one firing exactly once
    # per day (zero variance -> NULL acf), one varying
    const = [(i, "beat", datetime.datetime(2024, 1, 1 + i), 1.0)
             for i in range(5)]
    vary = [(100 + i + j, "vary", datetime.datetime(2024, 1, 1 + i), 1.0)
            for i in range(5) for j in range(i + 1)]
    ev = spark.createDataFrame(const + vary,
                               ["event_id", "event_type", "ts", "value"])
    acf = {(r["event_type"], r["lag"]): r["acf"]
           for r in acf_daily(ev, lags=(1,)).collect()}
    assert acf[("beat", 1)] is None
    assert acf[("vary", 1)] is not None

    f = funnel(ev, ["no_such_step", "vary"], user_col="event_id").collect()
    assert all(r["conversion"] is None for r in f)
    w = funnel_wilson(ev, ["vary", "no_such_step", "beat"],
                      user_col="event_id")
    for r in w.collect():
        if r["n_from"] == 0:
            assert r["p"] is None and r["ci_lo"] is None


def test_asof_join_null_keys_never_match(spark):
    """ASOF equality semantics: NULL keys match nothing (the DuckDB
    ASOF LEFT JOIN contract) — a NULL-key left row must keep NULL
    right attributes even when a NULL-key right row precedes it."""
    from semantik_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(None, 10, "L1"), ("k", 10, "L2")],
        "key string, ts int, tag string")
    right = spark.createDataFrame(
        [(None, 5, 1.0), ("k", 5, 2.0)],
        "key string, ts int, px double")
    out = {r["tag"]: r["px"]
           for r in asof_join(left, right, ["key"], "ts", ["px"]).collect()}
    assert out["L1"] is None   # NULL key: no match
    assert out["L2"] == 2.0    # real key still matches


def test_markov_null_keyed_rows_excluded(spark):
    """markov_stationary/_attribution exclude NULL-keyed rows before
    the per-user windows: a NULL type would crash the driver-local
    state sort (None vs str) and a NULL user would fuse every
    anonymous event into one pseudo-journey."""
    import datetime

    from semantik_spark.operators.timeseries import (
        markov_attribution, markov_stationary)

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    ev = spark.createDataFrame(
        [(1, "a", t(0), 1), (1, "b", t(1), 2),
         (2, "a", t(0), 3), (2, "purchase", t(1), 4),
         (1, None, t(2), 5),            # NULL type: excluded, no crash
         (None, "b", t(0), 6),          # NULL user: no pseudo-journey
         (2, "b", None, 7)],            # NULL ts: excluded
        "user_id long, event_type string, ts timestamp, event_id long")
    pi = {r["state"]: r for r in markov_stationary(ev, iterations=5).collect()}
    assert set(pi) == {"a", "b", "purchase"}
    att = {r["channel"]: r for r in markov_attribution(
        ev, channels=["a", "b"], target_type="purchase",
        iterations=10).collect()}
    assert set(att) == {"a", "b"}
    # only user 2 converts and only via 'a': all credit lands there
    assert att["a"]["attribution"] == 1.0
    assert att["b"]["attribution"] == 0.0


def test_forecast_backtest_null_day_total_not_counted_in_means(spark):
    """A day whose revenue total is NULL yields a NULL error; the MASE
    means must skip that row in BOTH numerator and denominator — an
    unconditioned count silently deflated the mean."""
    import datetime

    from semantik_spark.operators.timeseries import forecast_backtest_snaive

    rows = []
    for d in range(14):
        day = datetime.date(2024, 1, 1) + datetime.timedelta(days=d)
        # day 3 exists but carries only a NULL value
        rows.append((day, None if d == 3 else 100.0 + d))
    df = spark.createDataFrame(rows, "o_orderdate date, o_totalprice double")
    out = forecast_backtest_snaive(df, season=7, holdout=3).collect()
    assert out, "holdout window empty"
    # train errors: |y_i - y_{i-7}| = 7.0 on the non-NULL lag pairs;
    # day 3 and day 10 (whose lag is day 3) are NULL and must be
    # skipped entirely, leaving the mean exactly 7.0
    assert out[0]["mase_denom"] == 7.0
    assert all(r["mase"] == r["mae"] / 7.0 for r in out if r["mase"] is not None)
