"""Item-item collaborative filtering over implicit feedback — the
"users who touched X also touched Y" co-visitation model (Sarwar et al.
2001, Amazon's item-to-item CF). Kept relational: interactions →
capped per-user histories → within-user pair fan-out → cosine over
co-occurrence counts, so the whole model is two shuffles and the
quadratic stage is BOUNDED BY THE HISTORY CAP, never by a hot user's
raw event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semantik_spark.functions.caching import checkpoint


def item_item_cosine(events: DataFrame, top_k: int = 50,
                     max_items_per_user: int = 50,
                     user_col: str = "user_id",
                     item_col: str = "item",
                     ts_col: str = "ts") -> DataFrame:
    """Top-k most-similar item pairs by co-occurrence cosine:

      cos(i,j) = |U_i ∩ U_j| / √(|U_i|·|U_j|)

    over distinct (user, item) interactions, with each user's history
    capped to the ``max_items_per_user`` most-RECENT items (latest
    interaction timestamp, item-id tiebreak) — the standard hot-user
    escape: an anonymous crawler account with 10⁶ items would
    otherwise contribute 10¹² pairs; capped, every user contributes at
    most C(cap, 2). |U_i| counts the CAPPED history so the cosine is
    self-consistent.

    Output: item_a < item_b, n_a, n_b, co_count, cosine (6 dp), rank
    (cosine DESC, item_a ASC, item_b ASC).

    Scale: one scan → distinct-interaction groupBy (map-side combine);
    the recency cap is a per-user window (shuffle on user, the same
    key the pair join needs — one exchange feeds both); within-user
    self-join fans out ≤ C(cap,2) per user; pair counts and item
    counts are groupBys with map-side combine. cosine = exact integer
    co / √(exact·exact) — engine-identical doubles.
    """
    inter = (
        # NULL users/items excluded BEFORE counting (the _value_level
        # NULL discipline): a NULL item is not an interaction — left
        # in, it STEALS a recency-cap slot from a real item and lands
        # in n_items, while the pair join silently drops it (NULL
        # never equates), so the cosine denominators go inconsistent
        # exactly when item ids come from optional payload fields
        events.where(F.col(user_col).isNotNull()
                     & F.col(item_col).isNotNull())
        .groupBy(F.col(user_col).alias("u"),
                 F.col(item_col).alias("item"))
        .agg(F.max(ts_col).alias("last_ts"))
    )
    w = Window.partitionBy("u").orderBy(F.desc("last_ts"), F.asc("item"))
    # hist feeds three consumers (per-item counts + both sides of the
    # co-occurrence self-join) — materialize the bounded (user,
    # ≤max_items) table once instead of re-running the interaction
    # window per consumer
    hist = (
        inter.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_items_per_user)
        .select("u", "item")
    )
    hist = checkpoint(hist)
    n_items = hist.groupBy("item").agg(
        F.count("*").cast("bigint").alias("n_users"))
    a, b = hist.alias("a"), hist.alias("b")
    pairs = (
        a.join(b, (F.col("a.u") == F.col("b.u"))
               & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("item_a"),
                 F.col("b.item").alias("item_b"))
        .agg(F.count("*").cast("bigint").alias("co_count"))
    )
    scored = (
        pairs
        .join(n_items.select(F.col("item").alias("item_a"),
                             F.col("n_users").alias("n_a")), "item_a")
        .join(n_items.select(F.col("item").alias("item_b"),
                             F.col("n_users").alias("n_b")), "item_b")
        .select(
            "item_a", "item_b", "n_a", "n_b", "co_count",
            # n_a·n_b widens to DECIMAL(38,0) BEFORE the product (the
            # ks_test_2samp 100 TB guard): two ~3e9-user items overflow
            # BIGINT (ANSI error — the job dies — or a silent legacy
            # wrap); the double cast after an exact product is
            # bit-identical in range either way
            F.round(F.col("co_count").cast("double")
                    / F.sqrt((F.col("n_a").cast("decimal(38,0)")
                              * F.col("n_b").cast("decimal(38,0)"))
                             .cast("double")),
                    6).alias("cosine"),
        )
    )
    wr = Window.orderBy(F.desc("cosine"), F.asc("item_a"), F.asc("item_b"))
    return (
        scored.orderBy(F.desc("cosine"), F.asc("item_a"), F.asc("item_b"))
        .limit(top_k)
        .withColumn("rank", F.row_number().over(wr).cast("int"))
    )
