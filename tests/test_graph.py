

def test_kcore_numbers_clique_plus_chain(spark):
    """4-clique {1,2,3,4} + chain 4-5-6: clique nodes have core 3,
    chain nodes core 1; 8 h-index rounds reach the exact core numbers
    and core <= degree everywhere."""
    from semantik_spark.operators.graph import kcore_numbers

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        ["src", "dst"],
    )
    rows = {r["id"]: r for r in kcore_numbers(edges, rounds=8).collect()}
    assert {i: rows[i]["core"] for i in sorted(rows)} == {
        1: 3, 2: 3, 3: 3, 4: 3, 5: 1, 6: 1}
    assert rows[4]["degree"] == 4
    for r in rows.values():
        assert r["core"] <= r["degree"]


def test_kcore_extra_rounds_are_noops(spark):
    """Past convergence the h-index iteration is a fixpoint — rounds=8
    and rounds=12 agree (the property that makes the fixed-round
    contract safe)."""
    from semantik_spark.operators.graph import kcore_numbers

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)] + [(1, 3), (2, 4), (3, 5)],
        ["src", "dst"],
    )
    norm = lambda df: sorted(  # noqa: E731
        (r["id"], r["degree"], r["core"]) for r in df.collect())
    assert norm(kcore_numbers(edges, rounds=8)) == \
        norm(kcore_numbers(edges, rounds=12))
