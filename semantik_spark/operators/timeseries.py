"""Time-series operators the reference lacks: as-of join and
range-windowed aggregates over event streams.

The reference has no temporal joins (SURVEY.md §2.3 "Absent in
reference" — no theta/range/as-of joins exist anywhere in
jbmiller10/semantik); these are the engine's native additions for
event/log analytics. Both are single-shuffle plans designed for the
100 TB case:

- ``asof_join`` uses the union-then-window formulation: tag both
  sides, union, then one window over (keys, time) carries the right
  side's last non-null attributes forward onto left rows. Exactly one
  shuffle on the join keys, no range explosion — contrast the naive
  ``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + max-filter, which is a
  quadratic theta-join that Spark executes as BroadcastNestedLoop or a
  full sort-merge-with-dup-explosion at scale.
- ``preceding_range_window`` is a plain ``Window.rangeBetween`` over a
  microsecond epoch column — Spark evaluates it with one sort per
  partition, never a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from semantik_spark.functions.caching import checkpoint


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_cols: list[str],
) -> DataFrame:
    """Backward as-of join: each left row picks up ``right_cols`` from
    the latest right row with ``right.ts_col <= left.ts_col`` and equal
    ``keys`` (inclusive at equal timestamps, matching DuckDB's
    ``ASOF LEFT JOIN ... ON l.ts >= r.ts``). Left rows with no prior
    right row keep nulls.

    Contract: ``right`` must be unique per (keys, ts_col) — pre-reduce
    it (e.g. groupBy(keys, ts).agg(max(...))) so the match is
    deterministic; ``right_cols`` must not collide with left column
    names; right rows with null ``right_cols`` values are treated as
    gaps (last *non-null* wins).
    """
    # fail fast on contract violations that would otherwise produce
    # silently-wrong joins (left values feeding the carry-forward)
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {sorted(overlap)}")
    missing = [c for c in (*keys, ts_col) if c not in left.columns] \
        + [c for c in (*keys, ts_col, *right_cols) if c not in right.columns]
    if missing:
        raise ValueError(f"asof_join: missing required columns: {missing}")
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(*keys, ts_col, *right_cols).withColumn("__side", F.lit(0))
    # ASOF equality semantics for NULL keys (DuckDB's ASOF LEFT JOIN:
    # NULL = NULL is not a match): the union-window formulation would
    # otherwise co-partition NULL-key rows from BOTH sides and carry
    # right values onto NULL-key left rows. Right rows with a NULL key
    # can never match anything — drop them; NULL-key left rows then
    # sit in a partition with no right rows and keep their NULLs.
    for k in keys:
        rt = rt.where(F.col(k).isNotNull())
    u = lt.unionByName(rt, allowMissingColumns=True)
    # right rows (__side=0) sort before left rows at the same timestamp,
    # which is what makes the match inclusive at ts equality
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        u = u.withColumn(f"__asof_{c}", F.last(F.col(c), ignorenulls=True).over(w))
    out = u.where(F.col("__side") == 1).drop("__side", *right_cols)
    for c in right_cols:
        out = out.withColumnRenamed(f"__asof_{c}", c)
    return out


def preceding_range_window(keys: list[str], us_col: str, preceding_us: int) -> WindowSpec:
    """RANGE window over a microsecond epoch column: current row plus
    everything in the trailing ``preceding_us`` microseconds (peers at
    the current timestamp included, per standard RANGE frame
    semantics)."""
    return (
        Window.partitionBy(*keys)
        .orderBy(F.col(us_col).cast("long"))
        .rangeBetween(-preceding_us, 0)
    )


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts") -> DataFrame:
    """Ordered funnel conversion: for each step i, the number of users
    with an ordered occurrence chain step_0 < step_1 < ... < step_i
    (strictly increasing timestamps; the earliest valid chain is used,
    which maximizes reach — picking min(t_i) subject to t_i > t_{i-1}
    greedily is optimal for "did the user ever complete the prefix").

    Shape: step i is one filter on ``type_col`` (a tiny fraction of the
    stream) + one groupBy(user).min + one equi-join on ``user_col``
    back to the previous stage. All k-1 joins and aggregations share
    the user_col hash partitioning, so AQE reuses one exchange per
    side; nothing here is quadratic and no per-user event array is ever
    materialized (whale-user safe at 100 TB, unlike collect_list
    formulations).

    Returns (step_index, step, n_users, conversion) where conversion is
    n_users / n_users(step_0) rounded to 6dp.
    """
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    stage = (
        e.where(F.col("et") == steps[0])
        .groupBy("u").agg(F.min("us").alias("t"))
    )
    counts = stage.agg(
        F.lit(0).alias("step_index"), F.lit(steps[0]).alias("step"),
        F.count("*").cast("bigint").alias("n_users"),
    )
    for i, s in enumerate(steps[1:], start=1):
        nxt = (
            e.where(F.col("et") == s)
            .join(stage, "u")
            .where(F.col("us") > F.col("t"))
            .groupBy("u").agg(F.min("us").alias("t2"))
            .select("u", F.col("t2").alias("t"))
        )
        counts = counts.unionByName(nxt.agg(
            F.lit(i).alias("step_index"), F.lit(s).alias("step"),
            F.count("*").cast("bigint").alias("n_users"),
        ))
        stage = nxt
    base = counts.where(F.col("step_index") == 0).select(
        F.col("n_users").alias("n_base")
    )
    return counts.crossJoin(F.broadcast(base)).select(
        "step_index", "step", "n_users",
        # try_divide: an unmatched first step gives n_base = 0 — the
        # funnel must report zero-count rows with NULL conversion, not
        # die on an ANSI division error
        F.round(F.try_divide(F.col("n_users"), F.col("n_base")), 6)
        .alias("conversion"),
    )


def retention_cohorts(events: DataFrame, max_offset: int = 7,
                      user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Cohort retention matrix: users are grouped by first-active day;
    for each day offset 0..max_offset, the fraction of the cohort with
    any activity exactly ``offset`` days after its cohort day.

    Shape: one (user, day) distinct (map-side combinable), one
    groupBy(user).min for cohort assignment, one broadcast-free
    equi-join on user (both sides already hash-partitioned by user),
    one final groupBy(cohort_day, offset). No window over per-user
    event arrays, so skewed users cost nothing beyond their distinct
    active days.
    """
    ud = events.select(
        F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
    ).distinct()
    first = ud.groupBy("u").agg(F.min("d").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.count("*").cast("bigint").alias("n_cohort")
    )
    act = (
        ud.join(first, "u")
        .select("cohort_day", F.datediff("d", "cohort_day").alias("day_offset"), "u")
        .where(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )
    return act.join(sizes, "cohort_day").select(
        F.col("cohort_day").cast("string").alias("cohort_day"),
        F.col("day_offset").cast("int").alias("day_offset"),
        "n_active", "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
    )


def props_stats(events: DataFrame, json_path: str = "$.k",
                type_col: str = "event_type",
                props_col: str = "props") -> DataFrame:
    """Semi-structured payload extraction: pull a numeric field out of
    the JSON ``props_col`` with get_json_object (JVM-side Jackson path
    evaluation — no Python, no UDF) and aggregate it per event type.
    Null-safe: rows where the path is absent or non-numeric fall out of
    the aggregates as SQL nulls. Map + one groupBy — at 100 TB the JSON
    parse is the scan cost and the aggregation is map-side combined.
    """
    k = F.get_json_object(F.col(props_col), json_path).cast("bigint")
    return (
        events.select(F.col(type_col).alias("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").cast("bigint").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


def rolling_stats(events: DataFrame, n_rows: int = 3,
                  user_col: str = "user_id", ts_col: str = "ts",
                  val_col: str = "value",
                  id_col: str = "event_id") -> DataFrame:
    """ROWS-frame rolling aggregates per user: mean/min/max of the
    current + previous ``n_rows - 1`` events, ordered by (ts, event_id)
    for a total, deterministic order. Complements
    preceding_range_window (RANGE frame): ROWS frames are the
    fixed-width smoothing used for tick data. One sort per user
    partition, no self-join; whale users cost one in-memory frame of
    ``n_rows`` values."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(n_rows - 1), 0)
    )
    return events.select(
        id_col,
        F.col(user_col).alias("user_id"),
        F.round(F.avg(val_col).over(w), 6).alias("roll_avg"),
        F.round(F.min(val_col).over(w), 6).alias("roll_min"),
        F.round(F.max(val_col).over(w), 6).alias("roll_max"),
        F.count("*").over(w).cast("int").alias("roll_n"),
    )


def funnel_latency(events: DataFrame, steps: list[str],
                   user_col: str = "user_id", type_col: str = "event_type",
                   ts_col: str = "ts") -> DataFrame:
    """Conversion-time distribution for users completing the whole
    funnel: per converting user, the time from their step-0 anchor to
    the earliest valid completion of the last step (same greedy chain
    as ``funnel``), aggregated to one row of latency percentiles.

    Shape: the same per-step filter + groupBy(user).min + user
    equi-join chain as funnel, carrying the step-0 timestamp through
    (constant per user, so min() under the groupBy); one final global
    aggregate. Percentiles are exact-interpolated (``percentile`` ≡
    DuckDB ``quantile_cont``); at 100 TB swap for approx_percentile.
    """
    if len(steps) < 2:
        raise ValueError("funnel_latency: need at least 2 steps")
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    stage = (
        e.where(F.col("et") == steps[0])
        .groupBy("u").agg(F.min("us").alias("t"))
        .withColumn("t0", F.col("t"))
    )
    for s in steps[1:]:
        stage = (
            e.where(F.col("et") == s)
            .join(stage, "u")
            .where(F.col("us") > F.col("t"))
            .groupBy("u")
            .agg(F.min("us").alias("t"), F.min("t0").alias("t0"))
        )
    lat = stage.select(((F.col("t") - F.col("t0")) / F.lit(1000000.0)).alias("s"))
    return lat.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(s, 0.9)"), 6).alias("p90_s"),
        F.round(F.max("s"), 6).alias("max_s"),
    )


def session_paths(events: DataFrame, gap_minutes: int = 30, max_len: int = 8,
                  top_k: int = 20, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  id_col: str = "event_id") -> DataFrame:
    """Top user journeys: the most frequent ordered event-type paths
    per gap-based session (truncated to the first ``max_len`` events —
    the cap is applied BEFORE any aggregation, so whale sessions cost
    max_len rows, never their full history). The sequence-mining
    counterpart of the pairwise transition matrix.

    Shape: the sessionize lag+cumsum windows (shared user partitioning),
    one row_number cap, one per-session ordered aggregation, one path
    groupBy, TakeOrdered top-k.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.lit(gap_minutes * 60)
    sess = events.withColumn(
        "_new",
        F.when(
            F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double") > gap, 1
        ).otherwise(0),
    ).withColumn(
        "_sid",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    ws = Window.partitionBy(user_col, "_sid").orderBy(ts_col, id_col)
    capped = sess.withColumn("_rn", F.row_number().over(ws)).where(F.col("_rn") <= max_len)
    paths = (
        capped.groupBy(user_col, "_sid")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_rn", F.col(type_col).alias("et")))),
                    lambda s: s["et"],
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(top_k)
    )


def state_islands(events: DataFrame, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  id_col: str = "event_id") -> DataFrame:
    """Gaps-and-islands run-length encoding of each user's event-type
    stream: consecutive same-type events collapse into one 'island'
    row with its extent and size — the SCD-2-style interval form of the
    raw event log (what a warehouse calls a type-2 state history).

    user_id, island, event_type, n_events, start_us, end_us, where
    ``island`` is the 1-based run index within the user's stream.

    Shape: one window partitioning (user, ordered ts+event_id) shared
    by the lag-change flag and the running-sum island id, then one
    groupBy on (user, island) — a single shuffle on user_id carries
    the whole computation, and the groupBy re-uses that partitioning
    (Catalyst sees the child distribution satisfies it). Ordering ties
    on ts break by event_id on both engines.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    flagged = events.withColumn(
        "_chg",
        F.when(
            F.lag(F.col(type_col)).over(w).isNull()
            | (F.lag(F.col(type_col)).over(w) != F.col(type_col)),
            1,
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return flagged.groupBy(user_col, "island").agg(
        F.min(type_col).alias("event_type"),  # constant within an island; min() is the deterministic pick
        F.count("*").cast("bigint").alias("n_events"),
        F.unix_micros(F.min(ts_col)).alias("start_us"),
        F.unix_micros(F.max(ts_col)).alias("end_us"),
    )


def session_associations(events: DataFrame, gap_minutes: int = 30,
                         min_pair: int = 5, top_k: int = 20,
                         user_col: str = "user_id",
                         type_col: str = "event_type",
                         ts_col: str = "ts",
                         id_col: str = "event_id") -> DataFrame:
    """Market-basket association mining over gap-based sessions: which
    event-type pairs co-occur in the same session more often than
    independence predicts (support / confidence-max / lift).

    item_a, item_b (a < b), n_pair, n_a, n_b, support, lift —
    support = n_pair/N, lift = n_pair·N/(n_a·n_b); pairs below
    ``min_pair`` co-occurrences drop; top_k by (lift desc, a, b).

    Shape: the sessionize lag+cumsum windows (one shuffle on user),
    distinct (basket, item), a self-join on the basket key (baskets
    hold ≤ |event types| items, so the join fan-out is bounded per
    basket, not corpus-wide), and |item|²-sized aggregation output.
    The basket count N rides along via a broadcast 1-row aggregate —
    never a driver collect.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.lit(gap_minutes * 60)
    sess = events.withColumn(
        "_new",
        F.when(
            F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double") > gap, 1
        ).otherwise(0),
    ).withColumn(
        "_sid",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    # baskets feeds FOUR consumers (the basket count, the per-item
    # counts, and both sides of the pair self-join) — materialize it
    # once so the sessionize window chain over the raw events runs one
    # time, not once per consumer; the basket table is sessions×types
    # rows, far smaller than the event stream
    baskets = sess.select(
        F.col(user_col).alias("u"), F.col("_sid").alias("s"), F.col(type_col).alias("item")
    ).distinct()
    baskets = checkpoint(baskets)
    n_baskets = baskets.select("u", "s").distinct().agg(
        F.count("*").cast("double").alias("n_baskets")
    )
    item_n = baskets.groupBy("item").agg(F.count("*").cast("bigint").alias("n_item"))
    a = baskets.select("u", "s", F.col("item").alias("item_a"))
    b = baskets.select("u", "s", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, ["u", "s"])
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("bigint").alias("n_pair"))
        .where(F.col("n_pair") >= min_pair)
    )
    na = item_n.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    nb = item_n.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    scored = (
        pairs.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a", "item_b", "n_pair", "n_a", "n_b",
            F.round(F.col("n_pair") / F.col("n_baskets"), 6).alias("support"),
            # both count products widen to DECIMAL(38,0) BEFORE
            # multiplying (the ks_test_2samp 100 TB guard — n_pair ×
            # basket count overflows BIGINT long before the counts do:
            # an ANSI error that kills the job, or a silent legacy wrap);
            # each product casts to double before the division so the
            # result keeps the exact double/double semantics BIGINT
            # division had
            F.round(
                (F.col("n_pair").cast("decimal(38,0)")
                 * F.col("n_baskets").cast("decimal(38,0)")).cast("double")
                / (F.col("n_a").cast("decimal(38,0)")
                   * F.col("n_b").cast("decimal(38,0)")).cast("double"), 6
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), F.asc("item_a"), F.asc("item_b")).limit(top_k)


def ewm_smooth(events: DataFrame, alpha: float = 0.3, window: int = 8,
               type_col: str = "event_type", ts_col: str = "ts",
               value_col: str = "value",
               id_col: str = "event_id") -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per event
    type, truncated to the last ``window`` observations — the
    telemetry-smoothing primitive (truncation keeps the weights
    closed-form: the exact recursive EWMA needs (1-α)^(-i) terms that
    overflow doubles past i≈700, so a bounded window is also the
    numerically-sane form at 100 TB).

    event_id, us, value, ewma — ewma = Σ_k α(1-α)^k·v_{i-k} over the
    available lags, normalized by the present weights (early rows see
    fewer lags). The weighted terms are summed in fixed lag order on
    both engines, so the doubles agree bit-for-bit before the 6 dp
    round.

    Shape: one window partitioning per event type (ordered ts +
    event_id tiebreak), ``window`` lag expressions over it — a single
    shuffle on event_type; no state, no recursion.
    """
    w = Window.partitionBy(type_col).orderBy(ts_col, id_col)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(window):
        wt = alpha * (1.0 - alpha) ** k
        lagv = F.lag(F.col(value_col), k).over(w) if k else F.col(value_col)
        num = num + F.coalesce(F.lit(wt) * lagv, F.lit(0.0))
        den = den + F.when(lagv.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return events.select(
        id_col,
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(value_col).alias("value"),
        # try_divide: a row whose own value AND every trailing lag
        # are NULL has den = 0.0 — ewma must be NULL, not an ANSI abort
        F.round(F.try_divide(num, den), 6).alias("ewma"),
    )


def cusum_changepoints(events: DataFrame, k_slack: float = 0.5,
                       h_threshold: float = 4.0,
                       type_col: str = "event_type", ts_col: str = "ts",
                       value_col: str = "value",
                       id_col: str = "event_id") -> DataFrame:
    """Two-sided CUSUM level-shift detection per event type — the
    Page (1954) control chart: S⁺ᵢ = max(0, S⁺ᵢ₋₁ + xᵢ − μ − kσ) alarms
    when the running positive drift exceeds hσ (and symmetrically S⁻
    for downward shifts).

    The recursion is the reflected random walk, so it is computed
    WITHOUT iteration via the prefix-sum identity
    ``Sᵢ = Pᵢ − min(0, min_{j≤i} Pⱼ)`` where P is the plain prefix sum
    of the drift terms — two ordered-window aggregates per side over
    ONE shuffle on the event-type key. No recursion, no UDF, no state.

    Cross-engine determinism: μ, σ, and the derived thresholds are
    rounded to 6 dp ONCE, then every prefix-sum term is DECIMAL(28,6)
    — the running sums are exact integers-scaled-by-1e6 in both Spark
    and DuckDB, so alarm comparisons cannot drift with partition or
    segment-tree summation order.

    Returns one row per event type: n_obs, n_pos_alarm / n_neg_alarm
    (observations in excess state), first_pos_us / first_neg_us (first
    alarm time), max_s_pos / max_s_neg (peak statistic, in value
    units, 6 dp).
    """
    d6 = "decimal(28,6)"
    ev = events.where(F.col(value_col).isNotNull())
    wstat = Window.partitionBy(type_col)
    mu = F.round(F.avg(value_col).over(wstat), 6)
    sd = F.round(F.stddev_samp(value_col).over(wstat), 6)
    ev = ev.select(
        F.col(type_col).alias("etype"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(id_col).alias("eid"),
        F.round(F.col(value_col), 6).cast(d6).alias("x"),
        F.round(mu + F.lit(k_slack) * sd, 6).cast(d6).alias("thr_pos"),
        F.round(mu - F.lit(k_slack) * sd, 6).cast(d6).alias("thr_neg"),
        F.round(F.lit(h_threshold) * sd, 6).cast(d6).alias("h_band"),
    )
    w = Window.partitionBy("etype").orderBy("us", "eid") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    zero = F.lit(0).cast(d6)
    staged = ev.select(
        "etype", "us", "eid", "h_band",
        F.sum((F.col("x") - F.col("thr_pos")).cast(d6)).over(w).alias("p_pos"),
        F.sum((F.col("thr_neg") - F.col("x")).cast(d6)).over(w).alias("p_neg"),
    )
    s_pos = F.col("p_pos") - F.least(F.min("p_pos").over(w), zero)
    s_neg = F.col("p_neg") - F.least(F.min("p_neg").over(w), zero)
    scored = staged.select(
        "etype", "us",
        s_pos.alias("s_pos"), s_neg.alias("s_neg"),
        (s_pos > F.col("h_band")).alias("a_pos"),
        (s_neg > F.col("h_band")).alias("a_neg"),
    )
    return (
        scored.groupBy("etype")
        .agg(
            F.count("*").cast("bigint").alias("n_obs"),
            F.sum(F.when(F.col("a_pos"), 1).otherwise(0)).cast("bigint").alias("n_pos_alarm"),
            F.sum(F.when(F.col("a_neg"), 1).otherwise(0)).cast("bigint").alias("n_neg_alarm"),
            F.min(F.when(F.col("a_pos"), F.col("us"))).alias("first_pos_us"),
            F.min(F.when(F.col("a_neg"), F.col("us"))).alias("first_neg_us"),
            F.round(F.max("s_pos").cast("double"), 6).alias("max_s_pos"),
            F.round(F.max("s_neg").cast("double"), 6).alias("max_s_neg"),
        )
        .withColumnRenamed("etype", type_col)
    )


def trend_ols(events: DataFrame, type_col: str = "event_type",
              ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Per-key ordinary-least-squares trend line value ~ time — the
    one-pass telemetry drift summary (is this metric going up, how
    fast, and is the line a good fit).

    Closed-form from five sufficient statistics (Σx, Σy, Σxy, Σx²,
    Σy²): slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²), r² its squared
    correlation form. x is SECONDS SINCE THE KEY'S FIRST EVENT (the
    per-group min via a window sharing the aggregation's shuffle key)
    — recentring keeps x ~1e6 instead of epoch ~1.6e9, so x² sums
    stay well inside exact range; all five sums run in DECIMAL
    (exact, partition-order-proof), and only the final closed-form
    division happens in doubles, identically ordered on both engines.

    event_type, n_obs, slope_per_day (value units/day, 6 dp),
    intercept (value at the key's first event, 6 dp), r2 (6 dp,
    NULL when x or y is constant). One shuffle on the key.
    """
    ev = events.where(F.col(value_col).isNotNull())
    wk = Window.partitionBy(type_col)
    x = (F.unix_micros(F.col(ts_col)) / F.lit(1_000_000)
         - F.min(F.unix_micros(F.col(ts_col)) / F.lit(1_000_000)).over(wk)) \
        .cast("decimal(18,6)")
    y = F.round(F.col(value_col), 6).cast("decimal(18,6)")
    d = "decimal(38,6)"
    # products of two scale-6 decimals are EXACT at scale 12 — summing
    # them at scale 12 avoids a per-row half-way rounding whose tie
    # rule differs between engines
    d12 = "decimal(38,12)"
    base = ev.select(F.col(type_col).alias("etype"),
                     x.alias("x"), y.alias("y"))
    sums = base.groupBy("etype").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast(d)).alias("sx"),
        F.sum(F.col("y").cast(d)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d12)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d12)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d12)).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    # try_divide: a zero-variance group (single event, or all rows at
    # one microsecond) must yield NULL slope, not an ANSI
    # DIVIDE_BY_ZERO that kills the whole job (r2 was already guarded)
    slope = F.try_divide(cov_n, var_x)
    return sums.select(
        F.col("etype").alias(type_col),
        F.col("n").alias("n_obs"),
        F.round(slope * F.lit(86400.0), 6).alias("slope_per_day"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(F.when((var_x > 0) & (var_y > 0),
                       (cov_n * cov_n) / (var_x * var_y)), 6).alias("r2"),
    )


def value_band_pairs(events: DataFrame, eps: float = 0.5,
                     event_type: str = "purchase",
                     id_col: str = "event_id",
                     value_col: str = "value") -> DataFrame:
    """Numeric BAND JOIN without a cartesian product: all pairs of
    same-type events whose values differ by at most ``eps``, found by
    bucket blocking — each row lands in bucket floor(value/eps) and
    probes only its own and the next bucket (any pair within eps spans
    at most adjacent buckets, the 1-D pigeonhole; the high-dim cousin
    of the embedding near-dup bit-bands). The |value difference| <= eps
    predicate then only VERIFIES candidates.

    Returns (id_a, id_b, value_a, value_b, diff) with id_a < id_b and
    diff rounded to 6 dp.

    Scale: the naive theta-join is |rows|² and plans as a nested-loop;
    this is one equi-join on the bucket key (asserted: no
    CartesianProduct) — candidates per row are bounded by the value
    density inside 2*eps, the quantity the epsilon choice already
    controls. A hot bucket (mass point) is a real pair blowup, not a
    blocking artifact — those pairs exist in the answer.
    """
    e = events.where(F.col("event_type") == event_type).select(
        F.col(id_col).alias("id"), F.col(value_col).alias("v"),
        F.floor(F.col(value_col) / eps).cast("bigint").alias("b"),
    )
    probe = e.select(
        "id", "v", F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("pb")
    )
    right = e.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                     F.col("b").alias("pb"))
    # up-only probing sees each unordered pair from exactly one side
    # (the lower-bucket row), whose id may be the LARGER one — so the
    # pair normalizes by least/greatest (values follow their ids)
    # instead of an id< filter that would drop half the cross-bucket
    # pairs (the streaming-LSH cross-probe pattern)
    first_lower = F.col("id") < F.col("id_b")
    cand = (
        probe.join(right, "pb")
        .where(F.col("id") != F.col("id_b"))
        .select(
            F.least("id", "id_b").alias("id_a"),
            F.greatest("id", "id_b").alias("id_b"),
            F.when(first_lower, F.col("v")).otherwise(F.col("v_b")).alias("value_a"),
            F.when(first_lower, F.col("v_b")).otherwise(F.col("v")).alias("value_b"),
        )
        .distinct()
    )
    return (
        cand.where(F.abs(F.col("value_a") - F.col("value_b")) <= eps)
        .select(
            "id_a", "id_b",
            F.round("value_a", 6).alias("value_a"),
            F.round("value_b", 6).alias("value_b"),
            F.round(F.abs(F.col("value_a") - F.col("value_b")), 6).alias("diff"),
        )
    )


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str = "l_start_us", l_end: str = "l_end_us",
                          r_start: str = "r_start_us", r_end: str = "r_end_us",
                          bucket_us: int = 86_400_000_000,
                          long_factor: int = 0) -> DataFrame:
    """Interval × interval OVERLAP join without a cartesian product —
    the 2-sided generalization of ``value_band_pairs``'s point band
    join, and the batch twin of the stream-stream interval join in
    streaming/incremental.py.

    Both sides carry closed integer-microsecond intervals
    [start_us, end_us]. A naive ``ON s1 <= e2 AND s2 <= e1`` theta-join
    plans as a nested loop (|L|·|R|); instead each interval is exploded
    into the time BUCKETS it covers (floor-div by ``bucket_us``), the
    join runs as an equi-join on the bucket id, multi-bucket double-hits
    are collapsed, and the true overlap predicate only VERIFIES
    candidates (pigeonhole: two overlapping intervals share at least
    one covered bucket, so recall is exact). Every output row keeps
    both sides' columns plus ``overlap_us`` (exact BIGINT).

    PRECONDITIONS (matching the naive theta-join's multiplicity for
    arbitrary inputs requires both):
      * the two sides' column names are DISJOINT (the candidate join
        carries both schemas side by side);
      * each side is row-distinct — the multi-bucket collapse dedups on
        ALL carried columns, so two byte-identical input rows would
        collapse to one output pair. Project a unique id into each side
        first if the input can carry genuine duplicates.

    Two-level bucketing (``long_factor = C > 1``): an interval spanning
    k fine buckets replicates k times, so a single month-long interval
    in a minute-bucketed join is a 43 000× blow-up. With C set, an
    interval spanning > C fine buckets is LONG and explodes into coarse
    buckets (``C * bucket_us``) instead — a C-fold replication cut —
    while every SHORT interval additionally emits its (at most
    ``ceil(C⁻¹·span)+1``) coarse buckets at level 1 so short×long pairs
    still meet. Level-tagged equi-join keys keep the levels separate;
    the ``level 0 OR at-least-one-long`` guard stops short×short pairs
    from re-firing at the coarse level. Pigeonhole recall is unchanged:
    an overlapping pair shares a fine bucket, hence also the coarse
    bucket containing it, at the level where both sides emitted.
    ``interval_overlap_two_level`` pins two-level == one-level.

    Scale: cost = sum over buckets of |L_b|·|R_b| — bounded by the
    per-bucket interval density, the quantity ``bucket_us`` controls
    (size it near the typical interval length); ``long_factor`` caps
    the replication of the heavy tail. A hot bucket (everyone online
    at the same hour) is genuine answer mass, not a blocking artifact.
    Plan-asserted: no CartesianProduct / BNLJ (tests/test_plans.py).
    """
    def span(s: str, e: str, unit: int):
        return (F.floor(F.col(s) / unit).cast("bigint"),
                F.floor(F.col(e) / unit).cast("bigint"))

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        f0, f1 = span(s, e, bucket_us)
        if not long_factor or long_factor <= 1:
            return df.select(
                "*", F.lit(0).alias("_lvl"),
                F.explode(F.sequence(f0, f1)).alias("_bk"),
                F.lit(False).alias("_long"),
            )
        coarse = bucket_us * long_factor
        c0, c1 = span(s, e, coarse)
        is_long = (f1 - f0) >= F.lit(long_factor)
        # long rows: coarse buckets only; short rows: fine buckets at
        # level 0 PLUS coarse buckets at level 1 (to meet long rows)
        fine = F.when(is_long, F.array().cast("array<bigint>")) \
                .otherwise(F.sequence(f0, f1))
        lvl_bk = F.concat(
            F.transform(fine, lambda b: F.struct(
                F.lit(0).alias("_lvl"), b.alias("_bk"))),
            F.transform(F.sequence(c0, c1), lambda b: F.struct(
                F.lit(1).alias("_lvl"), b.alias("_bk"))),
        )
        return (
            df.select("*", is_long.alias("_long"),
                      F.explode(lvl_bk).alias("_lb"))
            .select("*", F.col("_lb._lvl").alias("_lvl"),
                    F.col("_lb._bk").alias("_bk"))
            .drop("_lb")
        )

    lb = bucketed(left, l_start, l_end)
    rb = bucketed(right, r_start, r_end).withColumnRenamed("_long", "_rlong")
    cand = (
        lb.join(rb, ["_lvl", "_bk"])
        .where((F.col("_lvl") == 0) | F.col("_long") | F.col("_rlong"))
        .drop("_lvl", "_bk", "_long", "_rlong")
        .distinct()
    )
    overlap = (
        F.least(F.col(l_end), F.col(r_end))
        - F.greatest(F.col(l_start), F.col(r_start))
    )
    return (
        cand.where((F.col(l_start) <= F.col(r_end))
                   & (F.col(r_start) <= F.col(l_end)))
        .withColumn("overlap_us", overlap.cast("bigint"))
    )


def acf_daily(events: DataFrame, lags: tuple = (1, 2, 7, 14),
              ts_col: str = "ts", group_col: str = "event_type") -> DataFrame:
    """Autocorrelation function of the per-group DAILY count series at
    the given lags — the seasonality detector that tells you WHICH lag
    the seasonal-naive forecast (events_seasonal) should difference on
    (a weekly cycle shows as a peak at lag 7).

    The series is densified first (every group × every calendar day in
    the events' global [min, max] span, missing days = 0) — ACF over a
    gappy series silently shifts every lag. Estimator: the standard
    biased-denominator sample ACF
    r_L = sum_{t<=n-L}(x_t - x̄)(x_{t+L} - x̄) / sum_t(x_t - x̄)².
    Both sums are carried EXACTLY by clearing denominators: with
    S = sum x and n days, n²·num = Σ(n·x_t - S)(n·x_{t+L} - S) and
    n²·den = Σ(n·x_t - S)² — integer DECIMAL(38,0) arithmetic, one
    IEEE double division at the end (round 6), so both engines agree
    bit-for-bit.

    Scale shape: one groupBy(group, day) count, a broadcast calendar
    explode (|groups|·|days| rows — tiny), one window lead per lag over
    the day-ordered series, one final agg. The count shuffle is the
    only data-sized job.
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    counts = events.groupBy(F.col(group_col).alias("g"), day).agg(
        F.count("*").cast("bigint").alias("x"))
    span = events.agg(
        F.min(F.to_date(F.col(ts_col))).alias("d0"),
        F.max(F.to_date(F.col(ts_col))).alias("d1"))
    groups = events.select(F.col(group_col).alias("g")).distinct()
    calendar = groups.crossJoin(F.broadcast(span)).select(
        "g", F.explode(F.sequence("d0", "d1")).alias("day"))
    dense = (
        calendar.join(counts, ["g", "day"], "left")
        .select("g", "day", F.coalesce("x", F.lit(0)).cast("bigint").alias("x"))
    )
    # width budget: x, n, S all fit (18,0); the centered terms n·x - S
    # do too, so their products are (36,0) — inside BOTH engines' 38-
    # digit cap (DuckDB binds multiply width as w1+w2 and ERRORS past
    # 38; Spark silently saturates precision — (18,0) avoids both)
    stats = dense.groupBy("g").agg(
        F.sum("x").cast("decimal(18,0)").alias("s"),
        F.count("*").cast("decimal(18,0)").alias("n"))
    w = Window.partitionBy("g").orderBy("day")
    widened = dense.join(F.broadcast(stats), "g").select(
        "g", "day", "n", "s",
        (F.col("x").cast("decimal(18,0)") * F.col("n") - F.col("s"))
        .cast("decimal(18,0)").alias("c0"),
        *[
            (F.lead("x", int(l)).over(w).cast("decimal(18,0)") * F.col("n")
             - F.col("s")).cast("decimal(18,0)").alias(f"c{int(l)}")
            for l in lags
        ],
    )
    den = F.sum(F.col("c0") * F.col("c0"))
    out = widened.groupBy("g").agg(
        F.max(F.col("n").cast("bigint")).alias("n_days"),
        den.alias("_den"),
        *[
            F.sum(F.col("c0") * F.col(f"c{int(l)}")).alias(f"_num{int(l)}")
            for l in lags
        ],
    )
    pairs = []
    for l in lags:
        pairs.append(F.struct(
            F.lit(int(l)).alias("lag"),
            # try_divide: a constant daily series (e.g. a heartbeat
            # type firing k times every day) has _den = 0 — NULL acf
            # (handled downstream) instead of an ANSI job abort that
            # would also take ljung_box and pacf_daily down
            F.round(F.try_divide(
                F.col(f"_num{int(l)}").cast("double"),
                F.col("_den").cast("double")), 6).alias("acf"),
        ))
    return (
        out.select(
            F.col("g").alias(group_col), "n_days",
            F.explode(F.array(*pairs)).alias("_p"))
        .select(group_col, "n_days", F.col("_p.lag").alias("lag"),
                F.col("_p.acf").alias("acf"))
    )


def kaplan_meier_conversion(events: DataFrame, window_hours: int = 36,
                            target_type: str = "purchase",
                            user_col: str = "user_id",
                            ts_col: str = "ts",
                            type_col: str = "event_type") -> DataFrame:
    """Kaplan-Meier survival curve for time-to-conversion (Kaplan &
    Meier 1958) — the censoring-correct answer to "how long until a
    user converts?" that a naive average gets wrong: users who have not
    converted by the end of the observation window are CENSORED at the
    window boundary (they contribute risk-time, not a conversion), so
    the estimate is unbiased under administrative censoring.

    Duration = whole hours (integer µs floor-div) from the user's first
    event to their first ``target_type`` event; users whose first
    conversion falls outside ``window_hours`` (or never) are censored
    at ``window_hours``. Output: one row per distinct duration t —
    n_risk (at-risk just before t), n_events (conversions at t),
    n_censored (censored at t), survival S(t) = Π_{u<=t} (1 - d_u/n_u).

    Determinism (the bigram_logprob recipe): each event time's log
    factor ln(1 - d/n) is rounded to 9 dp and cumulated as
    DECIMAL(28,9); only the final exp is a double, rounded to 6 dp —
    engine-exact against the oracle. A time where d == n (everyone
    remaining converts) pins survival to exactly 0 from there on.

    Scale: two groupBy(user) aggregates + one integer-hour groupBy;
    the KM table itself is at most ``window_hours``+1 rows, so the
    single-partition ordered window over it costs nothing. Per-user
    state never materializes beyond (first_ts, first_conversion).
    """
    us = F.unix_micros(F.col(ts_col))
    per = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(us).alias("t0"),
        F.min(F.when(F.col(type_col) == target_type, us)).alias("tc"),
    )
    horizon = int(window_hours) * 3_600_000_000
    dur = F.floor((F.col("tc") - F.col("t0")) / 3_600_000_000)
    obs = F.col("tc").isNotNull() & ((F.col("tc") - F.col("t0")) < horizon)
    per = per.select(
        F.when(obs, dur).otherwise(F.lit(window_hours)).cast("int").alias("t"),
        obs.cast("int").alias("observed"),
    )
    agg = per.groupBy("t").agg(
        F.sum("observed").cast("bigint").alias("n_events"),
        (F.count("*") - F.sum("observed")).cast("bigint").alias("n_censored"),
    )
    total = per.agg(F.count("*").alias("n_total"))  # 1-row broadcast
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    n_risk = (F.col("n_total") - F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(wprev),
        F.lit(0))).cast("bigint").alias("n_risk")
    km = agg.crossJoin(F.broadcast(total)).select(
        "t", n_risk, "n_events", "n_censored")
    lf = F.when(
        (F.col("n_events") > 0) & (F.col("n_events") < F.col("n_risk")),
        F.round(F.log(F.lit(1.0) - F.col("n_events") / F.col("n_risk")), 9)
        .cast("decimal(28,9)"),
    ).otherwise(F.lit(0).cast("decimal(28,9)"))
    dead = F.max(
        (F.col("n_events") >= F.col("n_risk")).cast("int")).over(wcum)
    return km.select(
        "t", "n_risk", "n_events", "n_censored",
        F.when(dead == 1, F.lit(0.0)).otherwise(
            F.round(F.exp(F.sum(lf).over(wcum).cast("double")), 6)
        ).alias("survival"),
    )


def theil_sen_daily(df: DataFrame, date_col: str = "o_orderdate",
                    value_col: str = "o_totalprice") -> DataFrame:
    """Theil-Sen robust trend of the daily-total series: slope = median
    of all pairwise day-to-day slopes (Theil 1950, Sen 1968), intercept
    = median residual at day 0 (Siegel form) — the outlier-immune
    counterpart to trend_ols: a single corrupted day moves OLS
    arbitrarily but shifts a pairwise-slope median not at all (29.3%
    breakdown point).

    Exactness: daily totals aggregate in DECIMAL; day indices are
    integers (datediff from the first day), so every pair slope is one
    decimal-difference / integer-difference division — both engines
    produce bit-identical doubles, the global sort agrees, and the
    median (average of the two middles on even counts, via explicit
    row_number) is engine-exact before the terminal 6-dp rounding.

    Output (1 row): n_days, n_pairs, slope_per_day (6 dp),
    intercept (6 dp).

    Scale: the input scan collapses to the CALENDAR-bounded day table
    (map-side combine); pairs are days² — constant in data volume, a
    few million rows for decades of days — and the two medians sort
    only that bounded table. At finer granularity, pre-bucket to a
    bounded grid first (the interval_overlap discipline).
    """
    daily = df.groupBy(F.col(date_col).alias("day")).agg(
        # widen each value to DECIMAL BEFORE the sum (r12 review, the
        # pricing_summary discipline): sum(double)::DECIMAL was a
        # half-cent knife-edge under engine-specific accumulation order
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("decimal(18,2)").alias("rev"))
    d0 = daily.agg(F.min("day").alias("d0"))
    # idx feeds three consumers (both sides of the pair join + the
    # residual pass) — materialize the calendar-bounded day table once
    # instead of re-running the daily aggregation per consumer
    idx = (
        daily.crossJoin(F.broadcast(d0))
        .select(F.datediff("day", "d0").cast("bigint").alias("i"), "rev")
    )
    idx = checkpoint(idx)
    # the pair enumeration is days² rows from a days-sized input: spread
    # the stream side up to the session default parallelism (the day
    # table is calendar-bounded, so this exchange is always tiny — and
    # spread() is a no-op when the checkpointed table is already wide,
    # the documented scale-adaptive contract; ADVICE r13) and broadcast
    # the build side, so the quadratic fan-out runs on every core
    # instead of inheriting the 1-partition day aggregate. idx is a
    # checkpointed LEAF, so spread()'s partition probe runs no jobs.
    from semantik_spark.functions.parallel import spread
    a, b = spread(idx, "i").alias("a"), F.broadcast(idx).alias("b")
    slopes = (
        a.join(b, F.col("a.i") < F.col("b.i"))
        .select(((F.col("b.rev") - F.col("a.rev")).cast("double")
                 / (F.col("b.i") - F.col("a.i"))).alias("s"))
    )

    def _median(vals: DataFrame, col: str) -> DataFrame:
        """avg of the two middle values by explicit rank (1 row)."""
        w = Window.orderBy(col)
        ranked = vals.select(
            F.col(col),
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy(F.lit(1))).alias("m"),
        )
        return (
            ranked.where((F.col("rn") == F.floor((F.col("m") + 1) / 2))
                         | (F.col("rn") == F.floor((F.col("m") + 2) / 2)))
            .agg(F.avg(col).alias("med"), F.max("m").alias("m"))
        )

    med_s = _median(slopes, "s")
    slope = med_s.select(F.col("med").alias("slope"), F.col("m").alias("n_pairs"))
    res = (
        idx.crossJoin(F.broadcast(slope))
        .select((F.col("rev").cast("double")
                 - F.col("slope") * F.col("i")).alias("r0"),
                "slope", "n_pairs")
    )
    med_r = _median(res.select("r0"), "r0")
    nd = daily.agg(F.count("*").cast("bigint").alias("n_days"))
    return (
        nd.crossJoin(F.broadcast(slope))
        .crossJoin(F.broadcast(med_r.select(F.col("med").alias("icpt"))))
        .select("n_days", F.col("n_pairs").cast("bigint").alias("n_pairs"),
                F.round("slope", 6).alias("slope_per_day"),
                F.round("icpt", 6).alias("intercept"))
    )


def logrank_conversion(events: DataFrame, window_hours: int = 36,
                       target_type: str = "purchase",
                       arms: int = 2,
                       user_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type") -> DataFrame:
    """Two-sample log-rank test (Mantel 1966) on time-to-conversion
    between deterministic cohorts (user_id mod ``arms``; arm 0 vs the
    rest) — the censoring-correct "did the treatment change conversion
    latency" companion to kaplan_meier_conversion: at every conversion
    time t the observed arm-0 conversions d₀(t) compare against the
    hypergeometric expectation d(t)·n₀(t)/n(t), with variance
    d·(n₀/n)·(n₁/n)·(n−d)/(n−1); χ² = (Σ(d₀−e₀))²/Σv on 1 dof.

    Durations and censoring exactly as kaplan_meier_conversion
    (integer hours, administrative censoring at the window edge).
    O−E and v terms are rationals of exact integers, rounded at 9 dp
    and summed as DECIMAL — engine-exact.

    Output (1 row): n_users_0, n_users_1, observed_0, expected_0
    (6 dp), chi2 (6 dp).

    Scale: the kaplan_meier shape — per-user rollup (one groupBy),
    hour-level counts, all windows over the ≤ window_hours+1 row
    table.
    """
    us = F.unix_micros(F.col(ts_col))
    per = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(us).alias("t0"),
        F.min(F.when(F.col(type_col) == target_type, us)).alias("tc"),
    )
    horizon = int(window_hours) * 3_600_000_000
    dur = F.floor((F.col("tc") - F.col("t0")) / 3_600_000_000)
    obs = F.col("tc").isNotNull() & ((F.col("tc") - F.col("t0")) < horizon)
    per = per.select(
        F.when(obs, dur).otherwise(F.lit(window_hours)).cast("int").alias("t"),
        obs.cast("int").alias("observed"),
        (F.col("u") % arms == 0).cast("int").alias("g0"),
    )
    agg = per.groupBy("t").agg(
        F.sum(F.col("observed") * F.col("g0")).cast("bigint").alias("d0"),
        F.sum(F.col("observed") * (1 - F.col("g0"))).cast("bigint").alias("d1"),
        F.sum((1 - F.col("observed")) * F.col("g0")).cast("bigint").alias("c0"),
        F.sum((1 - F.col("observed")) * (1 - F.col("g0"))).cast("bigint")
        .alias("c1"),
    )
    tot = per.agg(F.sum("g0").cast("bigint").alias("nu0"),
                  F.sum(1 - F.col("g0")).cast("bigint").alias("nu1"))
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risks = agg.crossJoin(F.broadcast(tot)).select(
        "t", "d0", "d1",
        (F.col("nu0") - F.coalesce(
            F.sum(F.col("d0") + F.col("c0")).over(wprev), F.lit(0)))
        .cast("bigint").alias("n0"),
        (F.col("nu1") - F.coalesce(
            F.sum(F.col("d1") + F.col("c1")).over(wprev), F.lit(0)))
        .cast("bigint").alias("n1"),
        "nu0", "nu1",
    )
    d = F.col("d0") + F.col("d1")
    n = F.col("n0") + F.col("n1")
    e0 = d.cast("double") * F.col("n0") / n
    v = F.when(
        (d > 0) & (n > 1),
        d.cast("double") * (F.col("n0").cast("double") / n)
        * (F.col("n1").cast("double") / n)
        * (n - d).cast("double") / (n - 1),
    ).otherwise(F.lit(0.0))
    terms = risks.select(
        "nu0", "nu1", "d0",
        F.when(d > 0, F.round(F.col("d0") - e0, 9)).otherwise(F.lit(0.0))
        .cast("decimal(20,9)").alias("oe"),
        F.when(d > 0, F.round(e0, 9)).otherwise(F.lit(0.0))
        .cast("decimal(20,9)").alias("e9"),
        F.round(v, 9).cast("decimal(20,9)").alias("v9"),
    )
    out = terms.groupBy("nu0", "nu1").agg(
        F.sum("d0").cast("bigint").alias("observed_0"),
        F.sum("oe").cast("decimal(28,9)").alias("soe"),
        F.sum("e9").cast("decimal(28,9)").alias("se"),
        F.sum("v9").cast("decimal(28,9)").alias("sv"),
    )
    # a degenerate cohort (one arm empty, or no conversions) zeroes
    # every variance term: chi2 is undefined -> NULL, never a
    # DIVIDE_BY_ZERO abort (the degree_assortativity lesson)
    chi2 = F.try_divide(
        F.col("soe").cast("double") * F.col("soe").cast("double"),
        F.col("sv").cast("double"))
    return out.select(
        F.col("nu0").alias("n_users_0"), F.col("nu1").alias("n_users_1"),
        "observed_0",
        F.round(F.col("se").cast("double"), 6).alias("expected_0"),
        F.round(chi2, 6).alias("chi2"),
    )


def price_elasticity(lineitem: DataFrame, part: DataFrame,
                     min_obs: int = 50) -> DataFrame:
    """Per-brand log-log demand curve: regr_slope(ln quantity,
    ln unit_price) over line items — the textbook own-price elasticity
    estimate (a slope of −1.2 reads "a 1% price increase loses 1.2% of
    quantity"), the merchandising analytics staple on any sales fact
    table.

    unit_price = l_extendedprice / l_quantity (the TPC-H convention:
    extendedprice is quantity-scaled). Brands with fewer than
    ``min_obs`` observations are dropped (elasticity from a handful of
    points is noise). Uses the SQL regression aggregates
    (regr_slope/intercept/r2 — identical definitions in Spark and
    DuckDB, the zipf_fit discipline), so the whole estimate is one
    partial-aggregable pass.

    Output: one row per surviving brand — p_brand, n_obs, elasticity
    (6 dp), intercept (6 dp), r2 (6 dp).

    Scale: one fact scan with a broadcast part join → one
    groupBy(brand) carrying the regression moments map-side; output is
    brand-bounded. No window, no second pass.
    """
    j = (
        lineitem
        .where((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand",
                F.log(F.col("l_quantity")).alias("ly"),
                F.log(F.col("l_extendedprice") / F.col("l_quantity"))
                .alias("lx"))
    )
    return (
        j.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_obs"),
            F.round(F.expr("regr_slope(ly, lx)"), 6).alias("elasticity"),
            F.round(F.expr("regr_intercept(ly, lx)"), 6).alias("intercept"),
            F.round(F.expr("regr_r2(ly, lx)"), 6).alias("r2"),
        )
        .where(F.col("n_obs") >= min_obs)
    )


def forecast_backtest_snaive(df: DataFrame, season: int = 7,
                             holdout: int = 28,
                             date_col: str = "o_orderdate",
                             value_col: str = "o_totalprice") -> DataFrame:
    """Seasonal-naive forecast backtest with MASE (Hyndman & Koehler
    2006) over the daily-total series: forecast ŷ_i = y_{i−season}
    (one-step rolling), evaluated on the last ``holdout`` days, scaled
    by the TRAIN-period seasonal-naive MAE —

      MASE = mean_{holdout}|y − ŷ| / mean_{train}|y_i − y_{i−season}|

    — the scale-free "is any fancier model even beating persistence"
    gate every forecasting pipeline runs first. MASE < 1 beats naive.

    Fully EXACT arithmetic: daily totals and errors stay DECIMAL end
    to end (no transcendentals anywhere); only the two terminal mean
    divisions are doubles, rounded at 6 dp.

    Output: one row per holdout day — day, day_idx, actual, forecast,
    abs_err (2 dp each), plus repeated mase_denom, mae, mase (6 dp).
    Days whose lag falls before the series start are skipped (NULL
    forecast would poison the mean).

    Scale: the theil_sen shape — one scan collapses to the
    CALENDAR-bounded day table; the lag is a self-join on the integer
    day index over that bounded table; every aggregate runs on ≤
    calendar rows.
    """
    daily = df.groupBy(F.col(date_col).alias("day")).agg(
        # widen each value to DECIMAL BEFORE the sum (r12 review, the
        # pricing_summary discipline): sum(double)::DECIMAL was a
        # half-cent knife-edge under engine-specific accumulation order
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("decimal(18,2)").alias("rev"))
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    idx = (
        daily.crossJoin(F.broadcast(bounds))
        .select("day", "rev",
                F.datediff("day", "d0").cast("bigint").alias("i"),
                F.datediff("d1", "d0").cast("bigint").alias("imax"))
    )
    lag = idx.select((F.col("i") + season).alias("i"),
                     F.col("rev").alias("prev"))
    j = (
        idx.join(lag, "i")
        .select("day", "i", "imax", "rev", "prev",
                F.abs(F.col("rev") - F.col("prev"))
                .cast("decimal(18,2)").alias("ae"),
                (F.col("i") > F.col("imax") - holdout).alias("is_holdout"))
    )
    # the means count only rows whose error EXISTS: a day whose total
    # is NULL (all-NULL values) yields ae NULL, which the numerator
    # sum skips — an unconditioned count would silently deflate the
    # mean (the _value_level NULL discipline applied to both periods)
    stats = j.agg(
        F.round(F.try_divide(
            F.sum(F.when(~F.col("is_holdout"), F.col("ae"))).cast("double"),
            F.sum(F.when(~F.col("is_holdout")
                         & F.col("ae").isNotNull(), 1).otherwise(0))
            .cast("double")), 6).alias("mase_denom"),
        F.round(F.try_divide(
            F.sum(F.when(F.col("is_holdout"), F.col("ae"))).cast("double"),
            F.sum(F.when(F.col("is_holdout")
                         & F.col("ae").isNotNull(), 1).otherwise(0))
            .cast("double")), 6).alias("mae"),
    )
    return (
        j.where(F.col("is_holdout"))
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("i").cast("int").alias("day_idx"),
            F.round(F.col("rev").cast("double"), 2).alias("actual"),
            F.round(F.col("prev").cast("double"), 2).alias("forecast"),
            F.round(F.col("ae").cast("double"), 2).alias("abs_err"),
            "mase_denom", "mae",
            F.round(F.try_divide(F.col("mae"), F.col("mase_denom")), 6)
            .alias("mase"),
        )
    )


def markov_stationary(events: DataFrame, iterations: int = 30,
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """Stationary distribution of the first-order event-transition
    Markov chain — where user journeys SPEND their time in the long
    run (the PageRank of event types): π = πP iterated to the fixed
    point from uniform, P the row-normalized within-user transition
    counts.

    Exact-replay determinism for an ITERATIVE float algorithm: each
    update term π_j·(c_jk/rowtot_j) rounds at 12 dp and the per-state
    sums accumulate as DECIMAL, then π quantizes back to 12 dp before
    the next iteration — so iteration N's state is a pure function of
    the integer count matrix on ANY engine, and the DuckDB twin
    replays the identical 30-step unroll. States with no outgoing
    transitions (absorbing in the observed data) keep their mass
    (self-loop completion, the standard dangling-row fix).

    Output: one row per state — state, n_out (outgoing transition
    count), pi (6 dp), pi0 (the uniform start, for reference).

    Scale: one lag window per user partition + one pair groupBy gives
    the K×K count matrix (K = event-type cardinality); the iteration
    runs DRIVER-LOCAL on that K²-bounded matrix (the union-find /
    codebook-trainer discipline: driver state bounded by the type
    alphabet, never by data volume) and returns as a broadcast-sized
    DataFrame.
    """
    # NULL-keyed rows excluded BEFORE the lag (the _value_level NULL
    # discipline): a NULL user would fuse every anonymous event into
    # one giant pseudo-journey; a NULL type would crash the driver-
    # local sort (None is unorderable against str) or mint a phantom
    # state; a NULL ts would order differently across engines (Spark
    # NULLS FIRST vs DuckDB NULLS LAST under the same ORDER BY)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.where(F.col(user_col).isNotNull()
                     & F.col(type_col).isNotNull()
                     & F.col(ts_col).isNotNull())
        .withColumn("__prev", F.lag(type_col).over(w))
        .where(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("a"), F.col(type_col).alias("b"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    cells = pairs.collect()  # K² rows — bounded by the type alphabet
    states = sorted({r["a"] for r in cells} | {r["b"] for r in cells})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    cnt = [[0] * k for _ in range(k)]
    for r in cells:
        cnt[idx[r["a"]]][idx[r["b"]]] = r["c"]
    import math

    rowtot = [sum(row) for row in cnt]
    # π lives in integer PICO-units (1e-12): every term quantizes via
    # floor(x·1e12 + 0.5) — the same expression the SQL twin unrolls,
    # chosen over round() because Python's float round() is half-EVEN
    # while SQL round() is half-away (an iterative algorithm amplifies
    # any such divergence)
    pi0_micro = math.floor(1e12 / k + 0.5) if k else 0
    pim = [pi0_micro] * k
    for _ in range(iterations):
        nxt = []
        for j in range(k):
            acc = 0
            for i in range(k):
                p_i = pim[i] / 1e12
                if rowtot[i] == 0:
                    term = p_i if i == j else 0.0  # dangling self-loop
                else:
                    term = p_i * (cnt[i][j] / rowtot[i])
                acc += math.floor(term * 1e12 + 0.5)
            nxt.append(acc)
        pim = nxt
    spark = events.sparkSession
    rows = [(s, int(rowtot[idx[s]]), pim[idx[s]] / 1e12, pi0_micro / 1e12)
            for s in states]
    out = spark.createDataFrame(rows, "state string, n_out bigint, "
                                      "pi double, pi0 double")
    return out.select("state", "n_out", F.round("pi", 6).alias("pi"),
                      F.round("pi0", 6).alias("pi0"))


def markov_attribution(events: DataFrame, channels: list,
                       target_type: str = "purchase",
                       iterations: int = 50,
                       user_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type",
                       id_col: str = "event_id") -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014) — the
    data-driven alternative to last-touch: journeys become a chain
    START → channel* → CONV (first ``target_type``) or NULL (journey
    ends unconverted); each channel's credit is its REMOVAL EFFECT,
    1 − P(conv | channel's absorption forced to 0) / P(conv), shares
    normalized over channels.

    Absorption probabilities iterate p ← P·p with p(CONV)=1,
    p(NULL)=0 (and p(channel)=0 for the removal variant), each state
    pico-quantized per step (floor(x·1e12 + 0.5)) — the
    markov_stationary discipline, so the iterative fixed point is a
    pure function of the integer transition counts on both engines.
    Removal effects quantize at 9 dp into DECIMAL before the share
    normalization so the split is order-free.

    Output: one row per channel — channel, p_full, p_removed,
    removal_effect, attribution (all 6 dp; NULL via try-division
    semantics when no journey converts).

    Scale: one rank window + lag per user partition → the (K+3)²
    count matrix; all variants iterate DRIVER-LOCAL on that bounded
    state (channels+3 states, channels+1 variants).
    """
    import math

    # NULL-keyed rows excluded BEFORE the rank window (the
    # markov_stationary NULL discipline: NULL user fuses journeys,
    # NULL type mints a phantom channel state, NULL ts splits the
    # engines on window order)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ranked = events.where(F.col(user_col).isNotNull()
                          & F.col(type_col).isNotNull()
                          & F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"),
        F.row_number().over(w).alias("rn"),
    )
    fp = ranked.where(F.col("et") == target_type).groupBy("u").agg(
        F.min("rn").alias("fp"))
    kept = (
        ranked.join(fp, "u", "left")
        .where(F.col("fp").isNull() | (F.col("rn") <= F.col("fp")))
        .select("u", "rn",
                F.when(F.col("et") == target_type, F.lit("CONV"))
                .otherwise(F.col("et")).alias("st"),
                F.col("fp").isNotNull().alias("conv"))
    )
    wl = Window.partitionBy("u").orderBy("rn")
    trans = kept.select(
        F.coalesce(F.lag("st").over(wl), F.lit("START")).alias("a"),
        F.col("st").alias("b"),
    )
    last = (
        kept.where(~F.col("conv"))
        .groupBy("u").agg(F.max_by("st", "rn").alias("a"))
        .select("a", F.lit("NULL").alias("b"))
    )
    counts = trans.unionByName(last).groupBy("a", "b").agg(
        F.count("*").cast("bigint").alias("c"))
    cells = counts.collect()  # (K+3)^2-bounded driver state
    rowtot = {}
    mat = {}
    for r in cells:
        mat[(r["a"], r["b"])] = r["c"]
        rowtot[r["a"]] = rowtot.get(r["a"], 0) + r["c"]
    states = sorted({a for a, _ in mat} | {b for _, b in mat}
                    | {"CONV", "NULL"})

    def absorb(clamped: str | None) -> int:
        p = {s: (10**12 if s == "CONV" else 0) for s in states}
        for _ in range(iterations):
            new = {}
            for a_s in states:
                if rowtot.get(a_s, 0) > 0:
                    acc = 0
                    for b_s in states:
                        c = mat.get((a_s, b_s), 0)
                        if c:
                            acc += math.floor(
                                ((c / rowtot[a_s]) * (p[b_s] / 1e12))
                                * 1e12 + 0.5)
                    new[a_s] = acc
            p = {s: (10**12 if s == "CONV" else 0 if s == "NULL" else
                     0 if s == clamped else new.get(s, 0))
                 for s in states}
        return p.get("START", 0)

    pf = absorb(None)
    rows = []
    for ch in sorted(channels):
        pr = absorb(ch)
        rows.append((ch, pf / 1e12, pr / 1e12))
    spark = events.sparkSession
    out = spark.createDataFrame(
        rows, "channel string, p_full double, p_removed double")
    re9 = F.round(F.lit(1.0) - F.try_divide(F.col("p_removed"),
                                            F.col("p_full")), 9) \
        .cast("decimal(20,9)")
    base = out.select("channel", "p_full", "p_removed", re9.alias("re"))
    tot = base.agg(F.sum("re").cast("decimal(28,9)").alias("sre"))
    return (
        base.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round("p_full", 6).alias("p_full"),
            F.round("p_removed", 6).alias("p_removed"),
            F.round(F.col("re").cast("double"), 6).alias("removal_effect"),
            F.round(F.try_divide(F.col("re").cast("double"),
                                 F.col("sre").cast("double")), 6)
            .alias("attribution"),
        )
    )


def sequential_patterns(events: DataFrame, gap_minutes: int = 30,
                        min_sessions: int = 5, top_k: int = 20,
                        user_col: str = "user_id",
                        type_col: str = "event_type",
                        ts_col: str = "ts",
                        id_col: str = "event_id") -> DataFrame:
    """Directed sequential-pattern mining over gap-based sessions (the
    length-2 PrefixSpan core, Pei et al. 2001): for each ordered type
    pair (a → b), the number of sessions containing an occurrence of
    ``a`` BEFORE an occurrence of ``b`` (gaps allowed — the
    subsequence relation, not adjacency, which is what
    events_transitions already counts) plus the direction asymmetry
    n_ab/(n_ab + n_ba) — "do users sign up before they purchase, or
    after?".

    Containment needs only two numbers per (session, type): a ``a``
    precedes ``b`` in a session iff min_pos(a) < max_pos(b). So the
    whole pattern table reduces to a min/max groupBy and a
    session-key self-join with per-session fan-out ≤ |alphabet|².

    Output: item_a, item_b (directed, a ≠ b), n_sessions (with a→b),
    n_reverse, asymmetry (6 dp), support (6 dp over all sessions);
    pairs below ``min_sessions`` drop; top_k by (n_sessions DESC,
    item_a, item_b).

    Scale: the session_associations shape — sessionize windows (one
    user shuffle), a (session, type) min/max rollup, an
    alphabet-bounded self-join per session. Never corpus-quadratic.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.lit(gap_minutes * 60)
    sess = events.withColumn(
        "_new",
        F.when(F.col(ts_col).cast("double")
               - F.lag(F.col(ts_col)).over(w).cast("double") > gap, 1)
        .otherwise(0),
    ).withColumn(
        "_sid",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    ).withColumn("_pos", F.row_number().over(w))
    spans = (
        sess.groupBy(F.col(user_col).alias("u"), F.col("_sid").alias("s"),
                     F.col(type_col).alias("item"))
        .agg(F.min("_pos").alias("minp"), F.max("_pos").alias("maxp"))
    )
    n_sess = spans.select("u", "s").distinct().agg(
        F.count("*").cast("bigint").alias("n_total"))
    a, b = spans.alias("a"), spans.alias("b")
    ab = (
        a.join(b, (F.col("a.u") == F.col("b.u"))
               & (F.col("a.s") == F.col("b.s"))
               & (F.col("a.item") != F.col("b.item"))
               & (F.col("a.minp") < F.col("b.maxp")))
        .groupBy(F.col("a.item").alias("item_a"),
                 F.col("b.item").alias("item_b"))
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
    )
    rev = ab.select(F.col("item_a").alias("item_b"),
                    F.col("item_b").alias("item_a"),
                    F.col("n_sessions").alias("n_reverse"))
    out = (
        ab.join(rev, ["item_a", "item_b"], "left")
        .na.fill({"n_reverse": 0})
        .where(F.col("n_sessions") >= min_sessions)
        .crossJoin(F.broadcast(n_sess))
        .select(
            "item_a", "item_b", "n_sessions", "n_reverse",
            F.round(F.col("n_sessions").cast("double")
                    / (F.col("n_sessions") + F.col("n_reverse")), 6)
            .alias("asymmetry"),
            F.round(F.col("n_sessions").cast("double") / F.col("n_total"),
                    6).alias("support"),
        )
    )
    return out.orderBy(F.desc("n_sessions"), F.asc("item_a"),
                       F.asc("item_b")).limit(top_k)


def funnel_wilson(events: DataFrame, steps: list,
                  z_milli: int = 1960,
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Per-transition funnel conversion rates with Wilson score
    intervals (Wilson 1927) — the CI that stays inside [0,1] and
    behaves at small counts where the naive normal interval collapses
    (the reason every A/B dashboard quotes Wilson, Agresti-Coull, or
    Jeffreys instead of p ± z√(pq/n)):

      center = (p + z²/2n) / (1 + z²/n)
      half   = z·√(p(1−p)/n + z²/4n²) / (1 + z²/n)

    z = ``z_milli``/1000 (1.96 for 95%). Rates are between CONSECUTIVE
    steps (n_to / n_from over funnel()'s earliest-valid-chain counts).

    Output: one row per transition — step_from, step_to, n_from, n_to,
    p (6 dp), ci_lo, ci_hi (6 dp, clamped to [0,1]).

    Scale: funnel()'s join-chain plan (one filtered aggregate + one
    user equi-join per step); the Wilson arithmetic runs on the
    steps-bounded count table.
    """
    base = funnel(events, steps, user_col=user_col, type_col=type_col,
                  ts_col=ts_col).select("step_index", "step", "n_users")
    nxt = base.select((F.col("step_index") - 1).alias("step_index"),
                      F.col("step").alias("step_to"),
                      F.col("n_users").alias("n_to"))
    j = base.join(nxt, "step_index").select(
        F.col("step").alias("step_from"), "step_to",
        F.col("n_users").alias("n_from"), "n_to")
    z = F.lit(z_milli).cast("double") / 1000.0
    n = F.col("n_from").cast("double")
    p = F.col("n_to").cast("double") / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2.0 * n)) / denom
    half = z * F.sqrt(p * (1.0 - p) / n
                      + z * z / (4.0 * n * n)) / denom
    # per-row when() guard (If short-circuits per row): a mid-funnel
    # step with zero users must yield NULL p/CI rows, not an ANSI
    # DIVIDE_BY_ZERO abort; the non-degenerate arithmetic keeps its
    # exact operation order, so populated rows stay bit-identical
    nz = F.col("n_from") > 0
    return j.select(
        "step_from", "step_to", "n_from", "n_to",
        F.round(F.when(nz, p), 6).alias("p"),
        F.round(F.when(nz, F.greatest(F.lit(0.0), center - half)), 6)
        .alias("ci_lo"),
        F.round(F.when(nz, F.least(F.lit(1.0), center + half)), 6)
        .alias("ci_hi"),
    )


def ljung_box(events: DataFrame, lags: tuple = (1, 2, 7),
              ts_col: str = "ts", group_col: str = "event_type") -> DataFrame:
    """Ljung-Box portmanteau statistic (Ljung & Box 1978) over the
    daily-count ACF per group:

      Q = n(n+2) · Σ_k r_k² / (n − k)

    — the "is there ANY autocorrelation left" test run on forecast
    residuals and on raw series before claiming white noise. Computed
    over the SELECTED lags (acf_daily's set — a portmanteau over
    {1,2,7} targets the daily/weekly structure specifically; the
    classic form uses 1..h). Compare Q against the chi-square critical
    value at df = |lags| (7.815 at α=.05 for df 3).

    r_k comes 6-dp-quantized from acf_daily, so every term
    r²/(n−k) rounds at 9 dp into DECIMAL and Q is engine-exact.

    Output: one row per group — event_type, n_days, q_stat (6 dp),
    df; q_exceeds_05 against the df∈{1..10} critical row looked up by
    the PER-GROUP df (a group whose series is shorter than a lag loses
    that NULL ACF term from both Q and df, so the verdict compares Q
    against the chi-square row it actually has — not len(lags)).
    Groups with df = 0 (or beyond the hard-coded table) get a NULL
    verdict rather than a wrong one.

    Scale: acf_daily's shape (densified calendar, group×day bounded);
    the Q fold runs on |groups|×|lags| rows.
    """
    crit = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070,
            6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919, 10: 18.307}
    if not 1 <= len(lags) <= 10:
        raise ValueError(
            f"ljung_box supports 1..10 lags (chi-square table bound), "
            f"got {len(lags)}")
    acf = acf_daily(events, lags=lags, ts_col=ts_col, group_col=group_col)
    term = F.round(
        (F.col("acf") * F.col("acf"))
        / (F.col("n_days") - F.col("lag")).cast("double"), 9
    ).cast("decimal(20,9)")
    agg = acf.groupBy("event_type", "n_days").agg(
        F.sum(term).cast("decimal(28,9)").alias("s"),
        # df counts the lags that CONTRIBUTED (non-null ACF) — a short
        # series' missing lags shrink df alongside Q
        F.count("acf").cast("int").alias("df"),
    )
    # n(n+2)·s stays DECIMAL through the terminal round: the 9-dp term
    # sum times an integer can land exactly on a 6-dp half-point,
    # where a double-typed round diverges between engines (the
    # collocations_llr knife-edge, fixed the same way)
    q = F.col("s") * (F.col("n_days") * (F.col("n_days") + 2))
    q6 = F.round(q, 6).cast("double")
    cv = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(crit.items()) for x in kv]),
        F.col("df"))
    return agg.select(
        "event_type", "n_days",
        q6.alias("q_stat"), "df",
        (q6 > cv).alias("q_exceeds_05"),
    )


def pacf_daily(events: DataFrame, max_lag: int = 7,
               ts_col: str = "ts", group_col: str = "event_type") -> DataFrame:
    """Partial autocorrelation of the per-group daily count series via
    the Durbin-Levinson recursion (Durbin 1960) — the AR-order
    selector ACF can't give you: PACF at lag k is the correlation
    left AFTER regressing out lags 1..k−1, so an AR(p) process cuts
    off sharply at p (the Box-Jenkins identification step that picks
    the model order a forecaster fits).

      φ_{k,k} = (r_k − Σ_j φ_{k−1,j} r_{k−j}) / (1 − Σ_j φ_{k−1,j} r_j)
      φ_{k,j} = φ_{k−1,j} − φ_{k,k}·φ_{k−1,k−j}

    over acf_daily's 6-dp autocorrelations at lags 1..``max_lag``.

    Exact-replay determinism for the nested recursion: every φ lives
    in integer PICO-units; every product/dot-term and every φ update
    quantizes via floor(x·1e12 + 0.5) (the markov_stationary
    discipline), so step k is a pure function of the 6-dp ACF vector
    on both engines — the DuckDB twin unrolls the identical k blocks.

    Output: one row per (event_type, lag) — event_type, n_days, lag,
    acf (the input), pacf (6 dp).

    Scale: acf_daily's shape for the data pass; the recursion runs
    DRIVER-LOCAL on the groups×max_lag ACF table (alphabet-bounded
    state — the codebook-trainer discipline).
    """
    import math

    acf = acf_daily(events, lags=tuple(range(1, max_lag + 1)),
                    ts_col=ts_col, group_col=group_col)
    rows = acf.collect()  # groups × max_lag — bounded
    by_g: dict = {}
    nd: dict = {}
    for r in rows:
        by_g.setdefault(r["event_type"], {})[r["lag"]] = r["acf"]
        nd[r["event_type"]] = r["n_days"]

    def q(x: float) -> int:
        return math.floor(x * 1e12 + 0.5)

    out = []
    for g, rv in by_g.items():
        if rv.get(1) is None:
            # single-day global span: no lag-1 ACF exists, so no PACF
            # rows for this group (the k>=2 missing-ACF guard can't
            # cover lag 1 — q(None) would TypeError on the driver)
            continue
        phi = {1: q(rv[1])}  # pico units, keyed by j for current k
        out.append((g, int(nd[g]), 1, float(rv[1]), phi[1] / 1e12))
        for k in range(2, max_lag + 1):
            if any(rv.get(i) is None for i in range(1, k + 1)):
                break
            sn = sum(q((phi[j] / 1e12) * rv[k - j]) for j in range(1, k))
            sd = sum(q((phi[j] / 1e12) * rv[j]) for j in range(1, k))
            den = 1.0 - sd / 1e12
            num = rv[k] - sn / 1e12
            kk = 0 if den == 0.0 else q(num / den)
            nxt = {
                j: q(phi[j] / 1e12 - (kk / 1e12) * (phi[k - j] / 1e12))
                for j in range(1, k)
            }
            nxt[k] = kk
            phi = nxt
            out.append((g, int(nd[g]), k, float(rv[k]), kk / 1e12))
    spark = events.sparkSession
    df = spark.createDataFrame(
        out, "event_type string, n_days bigint, lag int, acf double, "
             "pacf double")
    return df.select("event_type", "n_days", "lag", "acf",
                     F.round("pacf", 6).alias("pacf"))
