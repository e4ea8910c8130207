"""Graph operators over similarity graphs — PageRank centrality.

The reference's duplicate handling stops at connected components
(re-expressed in dedup.duplicate_clusters); centrality over the
embedding kNN graph is the natural next step a curation pipeline uses
for coreset selection / representative-document picking (PageRank over
a kNN graph is the classic 'LexRank' construction, Erkan & Radev 2004).

Iteration model (Spark-first): ranks live in a DataFrame keyed by node
id; each power-iteration step is

    contribs = edges ⋈ ranks (shuffle on src)  →  groupBy(dst) sum

— two hash shuffles per iteration, both on the graph's natural keys.
Edges are re-used across iterations, so at 100 TB you persist (or
bucket) the edge table by src once and every iteration's first join is
shuffle-free on the edge side; only the rank table (|V| rows, tiny
next to |E|) moves. A fixed iteration count (default 5) keeps the
whole thing one deterministic lineage — no driver-side convergence
loop reading counts per step.

Floating determinism: damping < 1 makes the iteration a contraction,
so cross-engine summation-order noise (~1e-16) does not amplify;
outputs round to 6 dp after scaling by |V|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semantik_spark.functions.caching import cache, checkpoint
from semantik_spark.functions.parallel import spread


def pagerank(edges: DataFrame, damping: float = 0.85, iterations: int = 5,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """id, pr — PageRank after ``iterations`` power steps from the
    uniform start. pr is scaled by |V| (so a 'random' node scores ~1.0)
    and rounded to 6 dp. Nodes = src ∪ dst; dangling nodes (no
    out-edges) leak their mass, the standard simple formulation.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()  # one driver scalar, same class as the IVF codebook
    if n == 0:
        # an upstream filter selecting zero edges must yield an empty
        # result, not a driver ZeroDivisionError from 1.0 / n
        return nodes.select("id", F.lit(0.0).alias("pr")).where(F.lit(False))
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("out_deg"))
    ed = e.join(deg, "src")
    ranks = nodes.select("id", F.lit(1.0 / n).alias("pr"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("pr") / F.col("out_deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "id", "left").select(
            "id",
            (F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias("pr"),
        )
    return ranks.select("id", F.round(F.col("pr") * n, 6).alias("pr"))


def knn_graph_edges(emb: DataFrame, k: int = 5, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """src, dst — directed kNN graph: each vector points at its k
    nearest (cosine, ties → smaller id), self excluded.

    Exact all-pairs construction — the documented oracle baseline, same
    class as similarity.knn_bruteforce. At 100 TB build the edge list
    with similarity.knn_lsh / knn_ivf instead (bucketed candidate
    generation); pagerank() is agnostic to how edges were produced.
    """
    from semantik_spark.functions.vectors import dot, norm
    from pyspark.sql import Window

    # pre-compute each side's norm ONCE per row (|V| aggregate evals,
    # not |V|² — the higher-order-function aggregates are interpreted,
    # so hoisting them out of the pair loop is a measured 3× on the
    # edge build), and evaluate each UNORDERED pair's cosine ONCE
    # (src < dst join), mirroring afterwards — cosine is symmetric, so
    # this halves the |V|²-pair dot-product work, the build's entire
    # cost, without touching any float. cos = dot/(na·nb) keeps the
    # exact operation order of functions.vectors.cosine, so ranking
    # stays bit-comparable to the DuckDB oracle.
    # spread() the probe side before the broadcast pair loop: the
    # single-file scan otherwise fuses with the |V|²/2 cosine stage on
    # ONE task (guide §2.5) — repartition-safe, the pair cosines and
    # the deterministic (cos DESC, dst ASC) rank don't depend on row
    # placement. No-op once the scan carries >= cores partitions.
    a = spread(
        emb.select(F.col(id_col).alias("src"), F.col(vec_col).alias("va")),
        "src",
    ).withColumn("na", norm("va"))
    b = emb.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("vb")) \
           .withColumn("nb", norm("vb"))
    nn = F.col("na") * F.col("nb")
    half = (
        a.join(F.broadcast(b), a.src < b.dst)
        .select(
            "src", "dst",
            F.when(nn > 0, dot("va", "vb") / nn).otherwise(F.lit(0.0)).alias("cos"),
        )
    )
    scored = half.union(half.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst"), "cos"))
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "dst")
    )


def triangle_counts(edges: DataFrame, top_k: int = 20,
                    src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation over the UNDIRECTED closure of a
    directed edge list — local clustering signal for the kNN graph
    (dense triangle neighborhoods ≈ tight semantic clusters; sparse
    ones ≈ hubs/outliers).

    id, n_triangles — top_k nodes by (count desc, id asc).

    Shape: canonicalize to u < v undirected edges (one distinct), then
    the standard two-path + closing-edge join chain, every join an
    equi-join on a node key (no theta joins): e1(a,b) ⋈ e2(b,c) gives
    the wedge a<b<c candidates (the a<c filter is implied by a<b<c
    ordering never needing enumeration twice), closed by e3(a,c).
    Degree-ordering (vertex id here — at 100 TB order by degree
    instead, the classic compact-forward optimization) bounds the
    wedge fan-out.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])  # a < b < c by construction
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    return per_node.orderBy(F.desc("n_triangles"), F.asc("id")).limit(top_k)


def label_propagation(edges: DataFrame, iterations: int = 4,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan
    et al. 2007) over the UNDIRECTED closure of a directed edge list —
    the cheap community signal a curation pipeline layers on the kNN
    graph when connected components are too coarse (CC merges through
    any single spurious edge; LPA requires neighborhood majority).

    Deterministic variant: all nodes update each round (synchronous),
    new label = the most frequent label among neighbors, ties broken
    by SMALLEST label value, fixed ``iterations`` rounds — no random
    ordering, so the result is engine-replayable (the classic
    formulation randomizes update order to break oscillations; a fixed
    round count bounds those instead).

    id, community — per-node final label.

    Shape per round: one equi-join of the adjacency list against the
    |V|-row label table (shuffle on node key), a (node, label) count,
    and a per-node arg-max window — all keyed on node ids. The
    adjacency list is loop-invariant: persist or bucket it by dst once
    and every round's join reuses that layout; only labels (|V| rows,
    tiny next to |E|) move per round.
    """
    from pyspark.sql import Window

    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).union(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    labels = adj.select(F.col("src").alias("id")).distinct() \
                .select("id", F.col("id").alias("label"))
    w = Window.partitionBy("nid").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(iterations):
        counts = (
            adj.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("nid"), "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("nid").alias("id"), "label")
        )
    return labels.select("id", F.col("label").alias("community"))


def kcore_numbers(edges: DataFrame, rounds: int = 8,
                  src: str = "src", dst: str = "dst") -> DataFrame:
    """Distributed k-core decomposition via the h-index iteration
    (Montresor, De Pellegrini & Miorandi 2013, "Distributed k-core
    decomposition"; Lü et al. 2016 h-index convergence): over the
    UNDIRECTED closure, every node's core estimate starts at its degree
    and each round becomes the H-INDEX of its neighbors' estimates —
    the largest h such that >= h neighbors have estimate >= h. The
    sequence is monotone non-increasing and converges to the exact
    core number; like label_propagation, a FIXED ``rounds`` count is
    the engine-replayable contract (extra rounds past convergence are
    no-ops, so equality needs only rounds >= rounds-to-fixpoint — 8
    covers the kNN graphs here with slack; at 100 TB iterate to
    fixpoint with a convergence counter instead).

    Returns (id, degree, core): core <= degree always; the dense-core
    members (high core) are the "well-embedded" vectors a curation
    pipeline keeps, low-core tendrils are near-duplicates' satellites
    and outliers.

    Shape per round: one equi-join of the loop-invariant adjacency
    list (persisted once) against the |V|-row estimate table + one
    per-node window — the LPA shuffle profile exactly; only estimates
    (|V| rows) move per round.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # cache(), not bare persist(): the session-lifetime registry
    # (functions/caching.release_all) reclaims executor storage after
    # each entry query — a bare persist leaks across a 50-query run
    adj = cache(und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
                .union(und.select(F.col("v").alias("src"),
                                  F.col("u").alias("dst"))))
    degrees = adj.groupBy("src").agg(
        F.count("*").cast("bigint").alias("est")
    )
    est = degrees
    w = Window.partitionBy("src").orderBy(F.desc("nb_est"), F.asc("dst"))
    for t in range(rounds):
        nb = adj.join(
            est.select(F.col("src").alias("dst"),
                       F.col("est").alias("nb_est")),
            "dst",
        )
        est = (
            nb.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .groupBy("src")
            .agg(F.max(F.least("rn", "nb_est")).cast("bigint").alias("est"))
        )
        if t % 3 == 2:
            est = checkpoint(est)
    return (
        degrees.select(F.col("src").alias("id"),
                       F.col("est").alias("degree"))
        .join(est.select(F.col("src").alias("id"),
                         F.col("est").alias("core")), "id")
    )


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          damping: float = 0.85, iterations: int = 5,
                          src: str = "src", dst: str = "dst") -> DataFrame:
    """Personalized PageRank: the teleport lands on the SEED set
    instead of uniformly (Haveliwala 2002 topic-sensitive PageRank) —
    the "related documents" / seed-expansion primitive: scores measure
    proximity to the seeds through the graph, so a handful of known
    good (or bad) documents expands into a ranked neighborhood for
    curation or labeling. ``seeds`` carries an ``id`` column.

    Same power-step shape as pagerank() (edges persisted once, |V|
    rank rows move per round); the only change is the restart vector:
    pr_0 = 1[v in S]/|S| and each step adds (1-d)/|S| on seeds only.
    Returns (id, ppr) rounded to 6 dp, mass ~1 over reachable nodes
    (dangling leak matches pagerank's simple formulation).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    s = seeds.select(F.col("id")).distinct()
    ns = s.count()  # driver scalar, codebook class
    if ns == 0:
        # empty seed set: restart mass is undefined — empty result,
        # not a driver ZeroDivisionError
        return nodes.select("id", F.lit(0.0).alias("ppr")).where(F.lit(False))
    marked = cache(nodes.join(s.withColumn("_s", F.lit(1)), "id", "left")
                   .select("id", F.coalesce("_s", F.lit(0)).alias("_s")))
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("out_deg"))
    ed = e.join(deg, "src")
    ranks = marked.select(
        "id", (F.col("_s").cast("double") / ns).alias("pr")
    )
    base = (1.0 - damping) / ns
    for _ in range(iterations):
        contribs = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"),
                    (F.col("pr") / F.col("out_deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("sm"))
        )
        ranks = marked.join(contribs, "id", "left").select(
            "id",
            (F.col("_s").cast("double") * base
             + damping * F.coalesce(F.col("sm"), F.lit(0.0))).alias("pr"),
        )
    return ranks.select("id", F.round("pr", 6).alias("ppr"))


def adamic_adar_links(edges: DataFrame, top_k: int = 20,
                      src: str = "src", dst: str = "dst",
                      hub_degree: int | None = None,
                      salt: int = 8) -> DataFrame:
    """Link prediction over the undirected closure of a directed edge
    list: Adamic-Adar scores for NON-edges with at least one common
    neighbor — the classic 'which nodes should be connected' ranking
    (Adamic & Adar 2003; on the kNN graph it surfaces document pairs
    the k-cutoff split apart, a recall-repair signal for the ANN
    index).

    node_a, node_b (a < b, NOT an existing edge), common_neighbors,
    aa_micro — AA = Σ_z 1/ln(deg(z)) over common neighbors z, carried
    as integer MICRO-units per z-term (floor(1e6/ln(deg)+0.5), the
    module-standard libm carry) so the sum is order-independent and
    engine-exact. Top_k by (aa_micro DESC, a, b).

    Shape: symmetric adjacency (2|E| rows) → degree groupBy → wedge
    equi-join through the center z → existing-edge anti-join → pair
    groupBy. Every join an equi-join on a node key; wedge fan-out per
    center is deg(z)² — bounded by the kNN degree (≤ 2k) on graphs
    from knn_graph_edges, so the default plan joins flat.

    ``hub_degree`` arms the power-law escape (the dedup family's
    salted-hot-buckets pattern, functions.skew.salted_join): centers
    with deg(z) > hub_degree are split out via a lazy broadcast of the
    (few) hot keys and their wedge self-join runs on (z, salt) — the
    probe side spreads over ``salt`` reducers by the wedge endpoint's
    fingerprint while only HOT rows replicate ``salt`` ways. Cold
    centers join exactly as before; the union is row-identical to the
    unsalted join (pinned on a star-heavy graph in tests/test_graph.py)
    — only the shuffle distribution changes, so one celebrity node no
    longer sends its deg² fan-out through a single reducer.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy(F.col("u").alias("z")).agg(
        F.count("*").cast("bigint").alias("deg"))
    # per-center AA term, quantized once per z. The deg >= 2 filter
    # sits BEFORE the projection: leaf nodes (deg = 1) have ln(deg) =
    # 0, and relying on predicate pushdown to keep 1e6/0 unevaluated
    # breaks the moment anything materializes this frame (a cache, a
    # checkpoint, a collapsed-projection barrier) — only wedge centers
    # (deg >= 2) ever carry a term anyway
    term = deg.where(F.col("deg") >= 2).withColumn(
        "term_micro",
        F.floor(F.lit(1_000_000.0) / F.log(F.col("deg").cast("double"))
                + F.lit(0.5)).cast("bigint"),
    )
    wa = adj.select(F.col("v").alias("z"), F.col("u").alias("a"))
    wb = adj.select(F.col("v").alias("z"), F.col("u").alias("b"))
    if hub_degree is None:
        wedges = wa.join(wb, "z").where(F.col("a") < F.col("b"))
    else:
        from semantik_spark.functions.skew import salted_join

        # lazy hot-key broadcast (banded_candidates doctrine): in the
        # no-hub case this broadcasts an EMPTY set, the anti-join
        # passes everything through, and the salted branch unions zero
        # rows — no build-time job
        hubs = deg.where(F.col("deg") > hub_degree).select("z")
        hot_a = wa.join(F.broadcast(hubs), "z", "left_semi")
        cold_a = wa.join(F.broadcast(hubs), "z", "left_anti")
        hot_b = wb.join(F.broadcast(hubs), "z", "left_semi")
        cold_b = wb.join(F.broadcast(hubs), "z", "left_anti")
        wedges = (
            cold_a.join(cold_b, "z")
            .unionByName(salted_join(
                hot_a, hot_b, on="z", salt=salt, fingerprint_col="a"))
            .where(F.col("a") < F.col("b"))
        )
    non_edges = wedges.join(
        und, (wedges.a == und.u) & (wedges.b == und.v), "left_anti")
    scored = (
        non_edges.join(term, "z")
        .groupBy(F.col("a").alias("node_a"), F.col("b").alias("node_b"))
        .agg(
            F.count("*").cast("bigint").alias("common_neighbors"),
            F.sum("term_micro").cast("bigint").alias("aa_micro"),
        )
    )
    return scored.orderBy(
        F.desc("aa_micro"), F.asc("node_a"), F.asc("node_b")).limit(top_k)


def degree_assortativity(edges: DataFrame,
                         src: str = "src", dst: str = "dst") -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the
    undirected closure: the Pearson correlation of endpoint degrees
    over every edge counted in both directions — one number that says
    whether hubs link to hubs (r > 0, social-graph-like) or to leaves
    (r < 0, hub-and-spoke; kNN graphs typically sit near 0).

    Every moment (n, Σx, Σy, Σx², Σy², Σxy) is an exact BIGINT —
    degrees are integers — so r = (nΣxy - ΣxΣy) / √((nΣxx-Σx²)(nΣyy-Σy²))
    costs exactly one sqrt and one division in doubles, BOTH
    correctly-rounded IEEE operations (sqrt, unlike ln/log, is exact
    to the last ulp in every conforming engine), making r bit-identical
    cross-engine with no quantization step.

    Shape: undirected distinct + symmetric union (map-only), one
    degree groupBy, two broadcast-able degree joins onto the edge
    list, one global agg.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("bigint").alias("deg"))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("dx"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dy"))
    pairs = adj.join(du, "u").join(dv, "v")
    # per-row deg² products multiply in DECIMAL so a hub-heavy graph
    # (deg up to |V|) can never overflow the running sum — BIGINT would
    # wrap (non-ANSI) or abort (ANSI) at deg ≳ 3e9; the post-sum cast
    # back to (19,0) fails LOUDLY under ANSI if a moment exceeds 1e19
    # instead of silently corrupting r
    ddx = F.col("dx").cast("decimal(19,0)")
    ddy = F.col("dy").cast("decimal(19,0)")
    m = pairs.agg(
        F.count("*").cast("bigint").alias("n"),
        # first moments also accumulate in DECIMAL (a ~3e9-degree hub
        # contributes its deg² ≈ 9e18 to Σdx via the endpoint rows,
        # wrapping a BIGINT accumulator before any post-sum cast)
        F.sum(ddx).cast("decimal(19,0)").alias("sx"),
        F.sum(ddy).cast("decimal(19,0)").alias("sy"),
        F.sum(ddx * ddx).cast("decimal(19,0)").alias("sxx"),
        F.sum(ddy * ddy).cast("decimal(19,0)").alias("syy"),
        F.sum(ddx * ddy).cast("decimal(19,0)").alias("sxy"),
    )
    # moments go through DECIMAL(19,0) before multiplying: n·Σxy at a
    # 1e9-node scale overflows BIGINT, and (19,0)×(19,0) → (38,0)
    # stays inside both engines' decimal cap
    d = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    num = (d("n") * d("sxy") - d("sx") * d("sy")).cast("double")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx")).cast("double")
        * (d("n") * d("syy") - d("sy") * d("sy")).cast("double")
    )
    # zero degree variance (any d-regular graph: cycles, cliques) makes
    # den = 0 and r undefined — NULL, not a DIVIDE_BY_ZERO abort
    return m.select(
        (F.col("n") / 2).cast("bigint").alias("n_edges"),
        F.round(F.try_divide(num, den), 6).alias("assortativity"),
    )


def label_modularity(edges: DataFrame, labels: DataFrame,
                     src: str = "src", dst: str = "dst",
                     node_col: str = "node",
                     label_col: str = "label") -> DataFrame:
    """Directed modularity (Leicht & Newman 2008) of a given node
    partition: Q = Σ_c e_cc/m − Σ_c (dout_c · din_c)/m² — how much
    denser the within-community edge mass is than a degree-preserving
    random rewiring. The external-validation score for any clustering
    against the graph structure: here the embeddings' ground-truth
    labels judged on the kNN graph (a high Q says the labels track
    geometric neighborhoods).

    All counts are exact integers; the products dout·din widen to
    DECIMAL(38,0) before multiplying (the assortativity overflow
    lesson — at web scale dout·din ≈ m² overflows BIGINT silently).
    One terminal double division per term, rounded to 6 dp.

    Output: one row per label — n_nodes, e_within, d_out, d_in,
    q_contrib, q_total (repeated). Labels with nodes but no edge mass
    still appear (zero contribution rows).

    Shape: two label hash-joins onto the edge list (labels table is
    node-sized; at 100 TB both sides co-partition on the node id), one
    groupBy(label), one global window over the LABEL-bounded frame.
    """
    lab = labels.select(F.col(node_col).alias("_n"),
                        F.col(label_col).alias("_lab"))
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .join(lab.select(F.col("_n").alias("_s"),
                         F.col("_lab").alias("lab_s")), "_s")
        .join(lab.select(F.col("_n").alias("_d"),
                         F.col("_lab").alias("lab_d")), "_d")
    )
    per = e.groupBy(F.col("lab_s").alias("label")).agg(
        F.count("*").cast("bigint").alias("d_out"),
        F.sum((F.col("lab_s") == F.col("lab_d")).cast("int"))
        .cast("bigint").alias("e_within"),
    )
    din = e.groupBy(F.col("lab_d").alias("label")).agg(
        F.count("*").cast("bigint").alias("d_in"))
    nodes = lab.groupBy(F.col("_lab").alias("label")).agg(
        F.count("*").cast("bigint").alias("n_nodes"))
    full = (
        nodes.join(per, "label", "left").join(din, "label", "left")
        .select(
            "label", "n_nodes",
            F.coalesce("e_within", F.lit(0)).cast("bigint").alias("e_within"),
            F.coalesce("d_out", F.lit(0)).cast("bigint").alias("d_out"),
            F.coalesce("d_in", F.lit(0)).cast("bigint").alias("d_in"),
        )
    )
    w = Window.partitionBy()
    m = F.sum("d_out").over(w).cast("decimal(38,0)")
    # try_divide: an empty edge set (or labels matching no endpoint)
    # gives m = 0 — NULL contributions, not an ANSI job abort (the
    # degree_assortativity zero-variance lesson)
    contrib = F.round(
        F.try_divide(F.col("e_within").cast("double"), m.cast("double"))
        - F.try_divide(
            (F.col("d_out").cast("decimal(38,0)")
             * F.col("d_in").cast("decimal(38,0)")).cast("double"),
            (m * m).cast("double")), 6
    ).cast("decimal(12,6)")
    termed = full.select("label", "n_nodes", "e_within", "d_out", "d_in",
                         contrib.alias("q_contrib"))
    return termed.select(
        "label", "n_nodes", "e_within", "d_out", "d_in",
        F.col("q_contrib").cast("double").alias("q_contrib"),
        F.sum("q_contrib").over(w).cast("double").alias("q_total"),
    )


def clustering_coefficients(edges: DataFrame, buckets: int = 10,
                            src: str = "src", dst: str = "dst") -> DataFrame:
    """Local clustering coefficient distribution + global transitivity
    (Watts & Strogatz 1998; Newman 2003) of the undirected closure:

      C_i = 2·T_i / (d_i·(d_i − 1))      (0 where d_i < 2)
      transitivity = 3·triangles / wedges,  wedges = Σ_i C(d_i, 2)

    — the "is this graph clumpy or hub-and-spoke" summary: semantic
    kNN graphs cluster (C ≈ 0.2–0.6); random graphs don't (C ≈ d/n).

    Output: one row per coefficient decile bucket (floor(C·buckets),
    C = 1 rolled into the top bucket) — bucket, n_nodes, avg_c (6 dp),
    plus repeated global columns n_triangles, n_wedges, transitivity
    (6 dp), avg_clustering (6 dp, the Watts-Strogatz mean of C_i over
    nodes with d ≥ 2). C_i ratios are exact-integer rationals; means
    accumulate as 9-dp DECIMAL.

    Shape: triangle join chain exactly as triangle_counts (equi-joins
    only), one degree groupBy, one node-level join, one bucket
    groupBy. Everything after the triangle join is node-bounded.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy(F.col("u").alias("id")).agg(
        F.count("*").cast("bigint").alias("d"))
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tcount = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id").agg(F.count("*").cast("bigint").alias("t"))
    )
    node = (
        deg.join(tcount, "id", "left")
        .na.fill({"t": 0})
        .select(
            "id", "d", "t",
            F.when(F.col("d") >= 2,
                   (2 * F.col("t")).cast("double")
                   / (F.col("d") * (F.col("d") - 1)))
            .otherwise(F.lit(0.0)).alias("c"),
        )
    )
    # wedge counts stay INTEGER end-to-end: d(d-1) is even, so the
    # per-row `div 2` is exact, and sum(t) is 3 x triangles by
    # construction — no double sneaks in before the terminal ratio
    wedges_row = F.expr("(d * (d - 1)) div 2")
    glob = node.agg(
        F.expr("sum(t) div 3").cast("bigint").alias("n_triangles"),
        F.sum(wedges_row).cast("bigint").alias("n_wedges"),
        F.round(F.try_divide(F.sum("t").cast("double"),
                             F.sum(wedges_row).cast("double")), 6)
        .alias("transitivity"),
        F.round(F.try_divide(
            F.sum(F.when(F.col("d") >= 2,
                         F.round(F.col("c"), 9).cast("decimal(20,9)"))
                  .otherwise(F.lit(0).cast("decimal(20,9)")))
            .cast("double"),
            F.sum((F.col("d") >= 2).cast("int")).cast("double")), 6)
        .alias("avg_clustering"),
    )
    bucket = F.least(F.floor(F.col("c") * buckets).cast("int"),
                     F.lit(buckets - 1))
    dist = (
        node.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n_nodes"),
             F.round(F.sum(F.round(F.col("c"), 9).cast("decimal(20,9)"))
                     .cast("double") / F.count("*"), 6).alias("avg_c"))
    )
    return dist.crossJoin(F.broadcast(glob)).orderBy("bucket")


def harmonic_centrality(edges: DataFrame, hops: int = 3, top_k: int = 20,
                        src: str = "src", dst: str = "dst") -> DataFrame:
    """Truncated harmonic centrality (Boldi & Vigna 2014): for each
    node, Σ_v 1/d(u,v) over nodes within ``hops`` — the
    closeness-style centrality that handles disconnected graphs
    (unreachable nodes contribute 0, not ∞) and, truncated, costs a
    bounded BFS instead of all-pairs shortest paths. On a kNN graph
    the high scorers are the hub embeddings that sit inside dense
    semantic neighborhoods.

    Exact by construction: distances are integers from ``hops`` BFS
    rounds (each round = frontier ⋈ adjacency, anti-join against the
    visited set, min-dedup), and the score is Σ_d n_d · round(1/d, 6)
    — integer counts times shared 6-dp constants, summed in DECIMAL.

    Output: top_k nodes by (harmonic DESC, id ASC) — id, n_reached,
    harmonic (6 dp).

    Scale: frontier growth is degree^hops-bounded per node (kNN
    degree ≤ 2k ⇒ ~ (2k)^hops pairs worst-case); every round is an
    equi-join on the node key + one dedup groupBy. No all-pairs
    stage; ``hops`` caps the explosion exactly like nprobe caps IVF.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # cache() registry, not bare persist(): the per-round re-persists
    # below pin every BFS generation until release_all() runs
    adj = cache(und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))))
    best = cache(adj.select("u", F.col("v").alias("w"),
                            F.lit(1).alias("d")))
    frontier = best
    for t in range(2, hops + 1):
        cand = (
            frontier.join(adj.select(F.col("u").alias("w"),
                                     F.col("v").alias("x")), "w")
            .select("u", F.col("x").alias("w"))
            .where(F.col("u") != F.col("w"))
            .distinct()
        )
        new = cache(cand.join(best.select("u", "w"), ["u", "w"],
                              "left_anti")
                    .select("u", "w", F.lit(t).alias("d")))
        best = cache(best.unionByName(new))
        frontier = new
    # Python round() (half-EVEN) is quantization-safe here (r12 audit):
    # the DuckDB twin embeds the IDENTICAL Python-computed weight
    # literals (oracles.q_knn_harmonic renders round(1.0/d, 6) into its
    # CASE arms), so both plans score with the same constants — keep
    # the two sides' literal derivation in lockstep.
    weights = {d: round(1.0 / d, 6) for d in range(1, hops + 1)}
    wexpr = F.col("d").cast("double")
    for d, wgt in weights.items():
        wexpr = F.when(F.col("d") == d, F.lit(wgt)).otherwise(wexpr)
    scored = best.groupBy(F.col("u").alias("id")).agg(
        F.count("*").cast("bigint").alias("n_reached"),
        F.round(F.sum(wexpr.cast("decimal(12,6)")).cast("double"), 6)
        .alias("harmonic"),
    )
    return scored.orderBy(F.desc("harmonic"), F.asc("id")).limit(top_k)
