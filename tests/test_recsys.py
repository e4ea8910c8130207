"""Item-item CF: cosine closed forms + the recency cap contract."""

import datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, i, datetime.datetime(2024, 1, 1, 0, 0, s)) for u, i, s in rows],
        ["user_id", "item", "ts"])


def test_item_item_cosine_closed_form(spark):
    from semantik_spark.operators.recsys import item_item_cosine

    # users 1,2 both touch {10,20}; user 3 touches {10,30}
    ev = _ev(spark, [(1, 10, 0), (1, 20, 1), (2, 10, 2), (2, 20, 3),
                     (3, 10, 4), (3, 30, 5)])
    rows = {(r["item_a"], r["item_b"]): r
            for r in item_item_cosine(ev, top_k=10).collect()}
    r = rows[(10, 20)]
    # co=2, n_10=3, n_20=2 -> 2/sqrt(6)
    assert r["co_count"] == 2 and r["n_a"] == 3 and r["n_b"] == 2
    assert r["cosine"] == round(2 / 6 ** 0.5, 6)
    assert rows[(10, 30)]["cosine"] == round(1 / 3 ** 0.5, 6)
    # (20,30) never co-occur -> absent, not zero
    assert (20, 30) not in rows
    # repeated interactions dedup: same pair strength as distinct
    ev2 = _ev(spark, [(1, 10, 0), (1, 10, 9), (1, 20, 1)])
    r2 = item_item_cosine(ev2, top_k=10).collect()[0]
    assert r2["co_count"] == 1 and r2["cosine"] == 1.0


def test_item_item_recency_cap(spark):
    """cap=2 keeps each user's 2 most-recent items: user 1's stale
    item 10 drops, so (10,20) loses its only co-user and n counts
    reflect the CAPPED histories."""
    from semantik_spark.operators.recsys import item_item_cosine

    ev = _ev(spark, [(1, 10, 0), (1, 20, 5), (1, 30, 9),
                     (2, 20, 1), (2, 30, 2)])
    rows = {(r["item_a"], r["item_b"]): r
            for r in item_item_cosine(ev, top_k=10,
                                      max_items_per_user=2).collect()}
    assert set(rows) == {(20, 30)}
    assert rows[(20, 30)]["co_count"] == 2
    assert rows[(20, 30)]["cosine"] == 1.0


def test_item_item_null_keys_excluded_before_counting(spark):
    """NULL items/users are NOT interactions: left in, a NULL item
    steals a recency-cap slot and inflates n_users while the pair join
    silently drops it. With cap=2 and a NULL item as user 1's most
    recent event, the (10,20) pair must still form."""
    import datetime

    from semantik_spark.operators.recsys import item_item_cosine

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    ev = spark.createDataFrame(
        [(1, 10, t(0)), (1, 20, t(1)), (1, None, t(9)),   # NULL newest
         (2, 10, t(0)), (2, 20, t(1)),
         (None, 10, t(0)), (None, 20, t(1))],             # NULL user
        "user_id long, item long, ts timestamp")
    rows = {(r["item_a"], r["item_b"]): r
            for r in item_item_cosine(ev, top_k=10,
                                      max_items_per_user=2).collect()}
    assert set(rows) == {(10, 20)}
    r = rows[(10, 20)]
    # two real users only: the NULL user contributes to neither the
    # pair count nor the item counts
    assert r["co_count"] == 2 and r["n_a"] == 2 and r["n_b"] == 2
    assert r["cosine"] == 1.0
