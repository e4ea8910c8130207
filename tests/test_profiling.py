

def test_corpus_drift_jsd_bounds_and_attribution(spark):
    """Identical corpora give JSD 0; disjoint vocabularies give ln 2;
    the moved token tops the attribution."""
    import math

    from semantik_spark.operators.profiling import corpus_drift_jsd

    a = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    same = corpus_drift_jsd(a, a).collect()
    assert all(r["jsd_total"] == 0.0 for r in same)

    b = spark.createDataFrame([(2, "p q r")], ["doc_id", "text"])
    disj = corpus_drift_jsd(a, b).collect()
    assert disj[0]["jsd_total"] == round(math.log(2), 6)

    # one term substituted: it (and its replacement) lead the report
    c = spark.createDataFrame([(3, "x y w")], ["doc_id", "text"])
    rows = corpus_drift_jsd(a, c).collect()
    assert {rows[0]["term"], rows[1]["term"]} == {"z", "w"}
    assert rows[0]["contrib"] > rows[2]["contrib"]


def test_market_hhi_closed_forms(spark):
    """Monopoly nation -> HHI 10000; two equal suppliers -> 5000;
    shares count the capped decimal revenue."""
    from semantik_spark.operators.profiling import market_concentration_hhi

    li = spark.createDataFrame(
        [(1, 100.0, 0.0), (2, 50.0, 0.0), (3, 50.0, 0.0)],
        ["l_suppkey", "l_extendedprice", "l_discount"])
    sup = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 20)], ["s_suppkey", "s_nationkey"])
    nat = spark.createDataFrame(
        [(10, "MONO"), (20, "DUO")], ["n_nationkey", "n_name"])
    rows = {r["n_name"]: r
            for r in market_concentration_hhi(li, sup, nat).collect()}
    assert rows["MONO"]["hhi"] == 10000.0
    assert rows["MONO"]["top_share"] == 1.0 and rows["MONO"]["n_suppliers"] == 1
    assert rows["DUO"]["hhi"] == 5000.0
    assert rows["DUO"]["top_share"] == 0.5
    assert rows["DUO"]["total_revenue"] == 100.0


def test_referential_integrity_orphans_and_nulls(spark):
    """Orphans and NULL fks count separately; clean relations report
    zero; pct is orphans over ALL child rows."""
    from semantik_spark.operators.profiling import referential_integrity

    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    rows = referential_integrity(
        [(child, "fk", "c", parent, "pk", "p")]).collect()
    r = rows[0]
    assert r["relation"] == "c.fk -> p.pk"
    assert r["n_child"] == 4 and r["n_null_fk"] == 1
    assert r["n_orphans"] == 1 and r["orphan_pct"] == 0.25
