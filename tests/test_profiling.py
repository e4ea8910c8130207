

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
