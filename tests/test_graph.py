

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


def test_adamic_adar_ranks_shared_hub_pairs(spark):
    """Path graph 1-2-3 plus hub 0 connected to {4,5,6}: (1,3) is a
    non-edge with common neighbor 2 (deg 2, term 1/ln2); (4,5),(4,6),
    (5,6) share hub 0 (deg 3, term 1/ln3 — lower). AA must rank (1,3)
    first and never emit existing edges or zero-common-neighbor
    pairs."""
    import math

    from semantik_spark.operators.graph import adamic_adar_links

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (0, 4), (0, 5), (0, 6)], ["src", "dst"])
    rows = adamic_adar_links(edges, top_k=10).collect()
    got = {(r["node_a"], r["node_b"]): r for r in rows}
    assert set(got) == {(1, 3), (4, 5), (4, 6), (5, 6)}
    assert got[(1, 3)]["aa_micro"] == math.floor(1e6 / math.log(2) + 0.5)
    assert got[(4, 5)]["aa_micro"] == math.floor(1e6 / math.log(3) + 0.5)
    assert rows[0]["node_a"] == 1 and rows[0]["node_b"] == 3
    assert all(r["common_neighbors"] == 1 for r in rows)


def test_adamic_adar_sums_over_common_neighbors(spark):
    """(1,2) connected through BOTH 3 and 4 -> two terms summed."""
    import math

    from semantik_spark.operators.graph import adamic_adar_links

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (1, 4), (2, 4)], ["src", "dst"])
    rows = {(r["node_a"], r["node_b"]): r
            for r in adamic_adar_links(edges, top_k=10).collect()}
    assert rows[(1, 2)]["common_neighbors"] == 2
    assert rows[(1, 2)]["aa_micro"] == 2 * math.floor(1e6 / math.log(2) + 0.5)


def test_adamic_adar_hub_salting_row_identical(spark):
    """The power-law escape: hub centers (deg > hub_degree) take the
    salted wedge self-join, cold centers the flat one — output must be
    row-identical to the unsalted plan on a star-heavy graph (one
    celebrity hub wired to everyone, plus a cold clique tail), for
    thresholds that make the hub hot, everything hot, and nothing hot."""
    from semantik_spark.operators.graph import adamic_adar_links

    # hub 0 -> 1..12 (deg 12), plus a 4-clique 20..23 (deg 3 each),
    # plus a bridge so components mingle
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 13)]
        + [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]
        + [(1, 20)],
        ["src", "dst"],
    )

    def key(df):
        return sorted(
            (r["node_a"], r["node_b"], r["common_neighbors"], r["aa_micro"])
            for r in df.collect())

    base = key(adamic_adar_links(edges, top_k=1000))
    assert len(base) > 50  # the hub alone contributes C(12,2) pairs
    for thr in (4, 11, 1, 1000):
        salted = key(adamic_adar_links(
            edges, top_k=1000, hub_degree=thr, salt=4))
        assert salted == base, f"hub_degree={thr} diverged"


def test_assortativity_signs(spark):
    """A star graph is maximally DISassortative (r = -1: the hub's
    high degree always pairs with leaf degree 1); a cycle has zero
    degree variance (r undefined -> NULL, den = 0)."""
    from semantik_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], ["src", "dst"])
    r = degree_assortativity(star).collect()[0]
    assert r["n_edges"] == 6
    assert r["assortativity"] == -1.0
    cycle = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], ["src", "dst"])
    c = degree_assortativity(cycle).collect()[0]
    assert c["n_edges"] == 5 and c["assortativity"] is None


def test_label_modularity_two_cliques(spark):
    """Two directed 3-cycles with a perfect 2-way partition: e_cc = 3
    per community, m = 6, all degrees 1-in/1-out per node →
    Q = 2*(3/6 - 9/36) = 0.5 — the textbook strong-community value."""
    from semantik_spark.operators.graph import label_modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)], ["src", "dst"])
    labels = spark.createDataFrame(
        [(i, "a" if i <= 3 else "b") for i in range(1, 7)],
        ["node", "label"])
    rows = {r["label"]: r for r in label_modularity(edges, labels).collect()}
    assert rows["a"]["e_within"] == 3 and rows["a"]["d_out"] == 3
    assert rows["a"]["q_contrib"] == 0.25
    assert rows["a"]["q_total"] == 0.5


def test_label_modularity_random_partition_near_zero(spark):
    """A partition orthogonal to the structure (odd/even split of one
    big cycle) contributes ~0; labels with no edges still get a row."""
    from semantik_spark.operators.graph import label_modularity

    n = 6
    edges = spark.createDataFrame(
        [(i, (i % n) + 1) for i in range(1, n + 1)], ["src", "dst"])
    labels = spark.createDataFrame(
        [(i, "odd" if i % 2 else "even") for i in range(1, n + 1)]
        + [(99, "isolated")],
        ["node", "label"])
    rows = {r["label"]: r for r in label_modularity(edges, labels).collect()}
    # cycle alternates odd->even: e_within = 0 for both -> Q = -0.5
    assert rows["odd"]["e_within"] == 0
    assert rows["isolated"]["n_nodes"] == 1 and rows["isolated"]["d_out"] == 0
    assert rows["isolated"]["q_contrib"] == 0.0
    assert rows["odd"]["q_total"] == -0.5


def test_clustering_coefficients_closed_forms(spark):
    """Triangle + pendant: C=1 for the triangle nodes with degree 2,
    C=1/3 for the junction (d=3, 1 triangle), C=0 for the pendant;
    transitivity = 3T/wedges = 3/5; buckets split accordingly."""
    from semantik_spark.operators.graph import clustering_coefficients

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"])
    rows = clustering_coefficients(edges, buckets=10).collect()
    g = rows[0]
    assert g["n_triangles"] == 1
    # wedges: d=(2,2,3,1) -> 1+1+3+0 = 5
    assert g["n_wedges"] == 5
    assert g["transitivity"] == 0.6
    # avg over d>=2 nodes: (1 + 1 + 1/3)/3
    assert g["avg_clustering"] == round((2 + 1 / 3) / 3, 6)
    by = {r["bucket"]: r for r in rows}
    assert by[9]["n_nodes"] == 2          # the two C=1 nodes
    assert by[3]["n_nodes"] == 1          # C = 1/3
    assert by[0]["n_nodes"] == 1          # pendant C = 0


def test_harmonic_centrality_path_graph(spark):
    """Path 1-2-3-4-5, hops=3: the center reaches everyone (1+1+.5+.5
    = 3.0 at d<=2... exactly: node 3 -> d1:{2,4}, d2:{1,5} ->
    2*1 + 2*0.5 = 3.0); the end node 1 -> d1:{2}, d2:{3}, d3:{4} ->
    1 + .5 + .333333; unreachable node 9 contributes nothing."""
    from semantik_spark.operators.graph import harmonic_centrality

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (9, 10)], ["src", "dst"])
    rows = {r["id"]: r
            for r in harmonic_centrality(edges, hops=3, top_k=20).collect()}
    assert rows[3]["harmonic"] == 3.0 and rows[3]["n_reached"] == 4
    assert rows[1]["harmonic"] == round(1 + 0.5 + 0.333333, 6)
    assert rows[1]["n_reached"] == 3
    assert rows[9]["harmonic"] == 1.0  # only its pair


def test_empty_and_degenerate_graph_inputs(spark):
    """Empty edge sets and zero-mass label joins must yield empty/NULL
    results, not driver ZeroDivisionErrors or ANSI job aborts."""
    from semantik_spark.operators.graph import (
        label_modularity,
        pagerank,
        personalized_pagerank,
    )

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    assert pagerank(empty).count() == 0

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    no_seeds = spark.createDataFrame([], "id bigint")
    assert personalized_pagerank(edges, no_seeds).count() == 0

    # labels matching no edge endpoint: m = 0 -> NULL contributions
    labels = spark.createDataFrame([(99, "z")], ["node", "label"])
    rows = label_modularity(empty, labels).collect()
    assert all(r["q_contrib"] is None for r in rows)
