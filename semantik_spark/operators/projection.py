"""2-D embedding projection (M7) + category labeling.

Reference parity (webui/tasks/projection.py, 1151 LoC): PCA with an SVD
sample cap of 50k vectors (:91, :270-314), UMAP/t-SNE variants
(:315-415), category labeling by source/filetype/age buckets
(:141-263).

Spark-first: PCA is `pyspark.ml.feature.PCA` — distributed covariance +
local SVD of the (dim×dim) Gramian; no sample cap needed because the
driver never materializes the vectors, only the tiny covariance matrix.
UMAP/t-SNE remain driver-side sampled algorithms by nature (they are
O(n²)-ish and iterative) — stubbed behind sample_for_driver().
"""

from __future__ import annotations

from pyspark.ml.feature import PCA
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_project(emb: DataFrame, k: int = 2,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Project embeddings to k dims: id, x, y (first two components)."""
    assembled = emb.select(
        F.col(id_col).alias("vec_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = PCA(k=k, inputCol="features", outputCol="pca").fit(assembled)
    out = model.transform(assembled).select(
        "vec_id", vector_to_array("pca").alias("proj")
    )
    return out.select(
        "vec_id",
        F.col("proj")[0].alias("x"),
        *([F.col("proj")[1].alias("y")] if k >= 2 else []),
    )


def explained_variance(emb: DataFrame, k: int = 2,
                       vec_col: str = "embedding") -> list[float]:
    assembled = emb.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = PCA(k=k, inputCol="features", outputCol="pca").fit(assembled)
    return list(model.explainedVariance)


def label_categories(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Category labeling (projection.py:141-263): source directory,
    filetype-ish bucket, and size buckets as plot facets."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col("source"), F.lit("unknown")).alias("category_source"),
        F.when(F.col("n_chars") < 200, "small")
        .when(F.col("n_chars") < 1000, "medium")
        .otherwise("large").alias("category_size"),
    )


def sample_for_driver(emb: DataFrame, cap: int = 50_000,
                      vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """The reference's 50k SVD sample cap (projection.py:91) as an
    explicit op — for driver-side UMAP/t-SNE only; PCA doesn't need it."""
    n = emb.count()
    if n <= cap:
        return emb
    return emb.sample(fraction=cap / n, seed=seed)


def _tsne_fit(X, perplexity: float = 30.0, n_iter: int = 300,
              early_exaggeration: float = 4.0, lr: float = 200.0):
    """Exact (O(n²)) t-SNE on a numpy array — van der Maaten & Hinton
    2008, the algorithm behind the reference's t-SNE variant
    (projection.py:315-415). Deterministic: PCA initialization (no
    RNG), fixed iteration schedule. Intended for driver-side samples
    (reference caps at 50k; exact t-SNE is practical to ~5k)."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    perplexity = min(perplexity, max(1.0, (n - 1) / 3.0))

    # pairwise squared distances
    ss = (X ** 2).sum(1)
    D = np.maximum(ss[:, None] + ss[None, :] - 2.0 * (X @ X.T), 0.0)

    # per-point binary search for the Gaussian bandwidth matching the
    # target entropy log(perplexity)
    target = np.log(perplexity)
    P = np.zeros((n, n))
    for i in range(n):
        di = np.delete(D[i], i)
        beta, lo, hi = 1.0, 0.0, np.inf
        for _ in range(50):
            w = np.exp(-di * beta)
            sw = max(w.sum(), 1e-12)
            h = np.log(sw) + beta * (di * w).sum() / sw
            if abs(h - target) < 1e-5:
                break
            if h > target:
                lo = beta
                beta = beta * 2.0 if hi == np.inf else (beta + hi) / 2.0
            else:
                hi = beta
                beta = (beta + lo) / 2.0
        row = np.exp(-D[i] * beta)
        row[i] = 0.0
        P[i] = row / max(row.sum(), 1e-12)

    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)

    # deterministic PCA init, scaled small as in the standard algorithm
    Xc = X - X.mean(0)
    _, _, vt = np.linalg.svd(Xc, full_matrices=False)
    Y = (Xc @ vt[:2].T) * 1e-4

    dY = np.zeros_like(Y)
    gains = np.ones_like(Y)
    Pe = P * early_exaggeration
    for it in range(n_iter):
        num = 1.0 / (1.0 + np.maximum(
            (Y ** 2).sum(1)[:, None] + (Y ** 2).sum(1)[None, :] - 2.0 * (Y @ Y.T), 0.0))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        PQ = (Pe if it < 100 else P) - Q
        W = PQ * num
        grad = 4.0 * (W.sum(1)[:, None] * Y - W @ Y)
        momentum = 0.5 if it < 250 else 0.8
        gains = np.where(np.sign(grad) != np.sign(dY), gains + 0.2, gains * 0.8)
        gains = np.maximum(gains, 0.01)
        dY = momentum * dY - lr * gains * grad
        Y = Y + dY
        Y = Y - Y.mean(0)
    return Y


def tsne_project(emb: DataFrame, cap: int = 2000, perplexity: float = 30.0,
                 n_iter: int = 300, id_col: str = "vec_id",
                 vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """M7 t-SNE: sample to the driver cap, collect, fit the exact
    t-SNE, and parallelize (vec_id, x, y) back — the same
    driver-side-sample shape the reference uses (its UMAP/t-SNE also
    collect a capped sample; projection.py:91,315-415). Deterministic
    for a fixed input set: rows are sorted by id before the fit and the
    optimizer has no RNG."""
    spark = emb.sparkSession
    pdf = (
        sample_for_driver(emb, cap=cap, vec_col=vec_col, seed=seed)
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .toPandas()
    )
    import numpy as np

    Y = _tsne_fit(np.vstack(pdf["v"].to_numpy()), perplexity=perplexity, n_iter=n_iter)
    out = pdf[["vec_id"]].copy()
    out["x"] = Y[:, 0]
    out["y"] = Y[:, 1]
    return spark.createDataFrame(out)


def _fit_umap_ab(min_dist: float, spread: float = 1.0) -> tuple:
    """Deterministic least-squares fit of the UMAP low-dimensional
    kernel 1/(1 + a·x^(2b)) to the target membership curve
    psi(x) = 1 for x <= min_dist, exp(-(x - min_dist)/spread) after —
    the same objective umap-learn hands to scipy's curve_fit, solved
    here by a coarse-to-fine grid search (3 refinement rounds over a
    120x120 (a,b) grid on 300 sample points): no SciPy dependency, no
    RNG, identical (a, b) for identical min_dist on every run."""
    import numpy as np

    xs = np.linspace(0.0, 3.0 * spread, 300)
    psi = np.where(xs <= min_dist, 1.0,
                   np.exp(-(xs - min_dist) / spread))
    a_lo, a_hi, b_lo, b_hi = 0.01, 10.0, 0.1, 2.5
    best_a, best_b = 1.0, 1.0
    for _ in range(3):
        a_grid = np.linspace(a_lo, a_hi, 120)
        b_grid = np.linspace(b_lo, b_hi, 120)
        # xs^(2b) per b row, then broadcast the a axis
        xp = np.power(xs[None, :], 2.0 * b_grid[:, None])  # (B, X)
        f = 1.0 / (1.0 + a_grid[:, None, None] * xp[None, :, :])
        sse = ((f - psi[None, None, :]) ** 2).sum(axis=2)  # (A, B)
        ia, ib = np.unravel_index(np.argmin(sse), sse.shape)
        best_a, best_b = float(a_grid[ia]), float(b_grid[ib])
        da = (a_hi - a_lo) / 119.0
        db = (b_hi - b_lo) / 119.0
        a_lo, a_hi = max(0.001, best_a - da), best_a + da
        b_lo, b_hi = max(0.05, best_b - db), best_b + db
    return best_a, best_b


def _umap_fit(X, n_neighbors: int = 15, n_iter: int = 200,
              min_dist: float = 0.1, lr: float = 1.0):
    """Deterministic full-batch UMAP (McInnes, Healy & Melville 2018)
    on a numpy array — self-contained replacement for the umap-learn
    dependency the reference uses (webui/tasks/projection.py:315-339).

    Faithful to the paper's construction: exact kNN graph; smooth-kNN
    fuzzy membership (rho = nearest-neighbor distance, per-point sigma
    binary-searched so the membership sum is log2(k)); probabilistic
    t-conorm symmetrization P + Pᵀ - P∘Pᵀ; spectral initialization from
    the symmetric-normalized graph Laplacian; the standard low-dim
    kernel 1/(1 + a·d^{2b}) with (a, b) fitted for min_dist = 0.1.

    One deliberate deviation, for determinism: the paper optimizes
    cross-entropy by negative-sampling SGD (RNG-dependent); here the
    same objective is minimized by FULL-BATCH gradient descent — every
    attractive edge and every repulsive pair evaluated each step with a
    linearly decaying learning rate. O(n²) per iteration, which is
    exactly the regime the driver-side sample cap (reference's 50k SVD
    cap, here default 1-2k) exists for. No RNG anywhere: identical
    input ⇒ identical layout.
    """
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    if n <= 3:  # too few points for a graph; trivial stable layout
        return np.zeros((n, 2))
    k = min(n_neighbors, n - 1)
    # (a, b): umap-learn's least-squares fit of 1/(1 + a·x^(2b)) to
    # psi(x) = 1 for x <= min_dist else exp(-(x - min_dist)). The
    # min_dist = 0.1 default keeps the exact published literal (layout
    # stability for pinned queries); any OTHER min_dist is fitted here
    # deterministically — previously every non-0.1 value silently fell
    # back to the min_dist≈0 pair, making the parameter a boolean in
    # disguise
    if abs(min_dist - 0.1) < 1e-9:
        a, b = 1.577, 0.8951
    else:
        a, b = _fit_umap_ab(min_dist)

    ss = (X ** 2).sum(1)
    D = np.sqrt(np.maximum(ss[:, None] + ss[None, :] - 2.0 * (X @ X.T), 0.0))
    np.fill_diagonal(D, np.inf)
    knn_idx = np.argsort(D, axis=1)[:, :k]  # argsort ties → smallest index, deterministic
    knn_d = np.take_along_axis(D, knn_idx, axis=1)

    # smooth-kNN calibration: rho = distance to nearest neighbor,
    # sigma_i solves sum_j exp(-max(0, d_ij - rho_i)/sigma_i) = log2(k)
    rho = knn_d[:, 0]
    target = np.log2(k) if k > 1 else 1.0
    sigma = np.ones(n)
    for i in range(n):
        lo, hi, s = 0.0, np.inf, 1.0
        di = np.maximum(knn_d[i] - rho[i], 0.0)
        for _ in range(64):
            v = np.exp(-di / s).sum()
            if abs(v - target) < 1e-5:
                break
            if v > target:
                hi = s
                s = (lo + s) / 2.0
            else:
                lo = s
                s = s * 2.0 if hi == np.inf else (s + hi) / 2.0
        sigma[i] = s

    P = np.zeros((n, n))
    rows = np.repeat(np.arange(n), k)
    P[rows, knn_idx.ravel()] = np.exp(
        -np.maximum(knn_d - rho[:, None], 0.0) / sigma[:, None]
    ).ravel()
    P = P + P.T - P * P.T  # fuzzy-union t-conorm

    # spectral init: leading nontrivial eigenvectors of D^-1/2 A D^-1/2
    deg = np.maximum(P.sum(1), 1e-12)
    Dn = 1.0 / np.sqrt(deg)
    M = P * Dn[:, None] * Dn[None, :]
    vals, vecs = np.linalg.eigh(M)  # ascending; top = trivial component
    Y = vecs[:, [-2, -3]] * Dn[:, None]
    Y = (Y - Y.mean(0)) / max(Y.std(), 1e-12) * 10.0

    # Full-batch analogue of umap-learn's SGD epoch: each pair's update
    # is the CLIPPED per-sample gradient (±4/coord — the clip is what
    # keeps close-range repulsion from exploding) times the frequency
    # the sampler would draw it: attractive edges ∝ membership P_ij,
    # repulsive pairs ∝ neg_rate·k/n (k edges/point, neg_rate negatives
    # per edge, n candidate partners).
    eps = 1e-3
    neg_rate = 5.0
    rep_freq = neg_rate * k / max(n - 1, 1)
    for it in range(n_iter):
        alpha = lr * (1.0 - it / n_iter)
        dy = Y[:, None, :] - Y[None, :, :]
        d2 = (dy ** 2).sum(-1)
        denom = 1.0 + a * d2 ** b
        att_coef = (-2.0 * a * b * np.maximum(d2, eps) ** (b - 1.0)) / denom
        rep_coef = (2.0 * b) / ((eps + d2) * denom)
        np.fill_diagonal(att_coef, 0.0)
        np.fill_diagonal(rep_coef, 0.0)
        upd = (
            P[:, :, None] * np.clip(att_coef[:, :, None] * dy, -4.0, 4.0)
            + rep_freq * np.clip(rep_coef[:, :, None] * dy, -4.0, 4.0)
        ).sum(1)
        Y = Y + alpha * upd
        Y = Y - Y.mean(0)
    return Y


def umap_project(emb: DataFrame, cap: int = 1000, n_neighbors: int = 15,
                 n_iter: int = 200, min_dist: float = 0.1,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 seed: int = 42) -> DataFrame:
    """M7 UMAP: sample to the driver cap, collect, fit the
    deterministic full-batch UMAP (_umap_fit), and parallelize
    (vec_id, x, y) back — identical contract and shape to
    tsne_project. Deterministic for a fixed input set: rows sorted by
    id before the fit, no RNG in the optimizer."""
    spark = emb.sparkSession
    pdf = (
        sample_for_driver(emb, cap=cap, vec_col=vec_col, seed=seed)
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .toPandas()
    )
    import numpy as np

    Y = _umap_fit(np.vstack(pdf["v"].to_numpy()), n_neighbors=n_neighbors,
                  n_iter=n_iter, min_dist=min_dist)
    out = pdf[["vec_id"]].copy()
    out["x"] = Y[:, 0]
    out["y"] = Y[:, 1]
    return spark.createDataFrame(out)


def _jl_signs(i: int, dim: int) -> list[float]:
    """Row i of the deterministic Rademacher (+1/-1) projection matrix:
    sign j = parity of md5('jl:i:j') — the same md5-literal trick as
    similarity._hyperplane, so the DuckDB oracle replays the matrix
    bit-for-bit."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[:15], 16) % 2 == 0
        else -1.0
        for j in range(dim)
    ]


def jl_projection(emb: DataFrame, out_dim: int = 16, dim: int = 64,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Johnson-Lindenstrauss random projection: embed ``dim``-d vectors
    into ``out_dim`` dimensions with a deterministic Rademacher matrix
    (Achlioptas 2001 — +-1 entries, scale 1/sqrt(out_dim)), the cheap
    dimensionality reducer in front of clustering / dedup / ANN when
    the full embedding width is overkill (distance distortion is
    (1 +- eps) with out_dim = O(log n / eps^2), data-independent —
    unlike PCA there is NOTHING to train or store except the seed).

    Returns (vec_id, proj, norm_ratio): the projected vector (each
    component rounded to 6 dp) and ||proj|| / ||x|| as the per-vector
    distortion witness (JL: concentrates around 1).

    Scale shape: pure map — out_dim dot products per row against
    literal sign arrays, whole-stage codegen, zero shuffle, zero state.
    The matrix travels in the plan (out_dim x dim literals — 16x64
    here; for a 4096-wide projection move it to a broadcast table like
    the IVF codebook).
    """
    import math

    from semantik_spark.functions.vectors import dot, norm

    scale = math.sqrt(float(out_dim))
    v = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    # each sign row as ONE parsed array literal — the F.lit-per-entry
    # form is out_dim*dim py4j round-trips (1024 for 16x64), pure
    # driver-side plan-construction latency (r7 perf)
    comps = [
        F.round(dot(F.col("v"), F.expr(
            "array(" + ", ".join(repr(s) for s in _jl_signs(i, dim)) + ")"))
                / F.lit(scale), 6)
        for i in range(out_dim)
    ]
    projected = v.select("vec_id", "v", F.array(*comps).alias("proj"))
    return projected.select(
        "vec_id",
        "proj",
        F.when(norm("v") > 0, F.round(norm("proj") / norm("v"), 6))
        .otherwise(F.lit(0.0)).alias("norm_ratio"),
    )


def dbscan_projected(emb: DataFrame, eps_micro: int = 50_000,
                     min_pts: int = 4, dim: int = 64,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """DBSCAN (Ester et al. 1996) over the deterministic 2-D JL sketch
    of an embedding corpus — density clustering as grid-blocked
    equi-joins, the clustering family k-means (cluster_profile) cannot
    express: clusters of ARBITRARY shape, an explicit noise label, and
    no k to guess. On a near-dup-planted corpus the dense pockets ARE
    the duplicate neighborhoods, so this doubles as a
    dedup-candidate-region finder.

    Determinism end to end: coordinates are the first two JL
    components (md5-parity Rademacher signs, _jl_signs — the matrix the
    DuckDB twin replays bit-for-bit) quantized to integer MICRO-units
    (floor(round(x, 6) * 1e6 + 0.5)); every distance compare is then
    exact BIGINT arithmetic (dx² + dy² <= eps², coords <= ~1e8 µ so the
    squares fit comfortably), and the classic DBSCAN
    order-dependence of border points is removed by assigning each
    border to its MINIMUM-labelled core neighbor's cluster.

    Shape (all equi-joins, no cartesian — plan-asserted):
      1. map: project + quantize (zero shuffle, codegen'd dots);
      2. grid block: cell = (floor(qx/eps), floor(qy/eps)); probe side
         explodes to its 3×3 neighborhood, build side sits in its home
         cell → every candidate pair appears EXACTLY once (the home
         cell is unique), and any pair within eps shares a blocked cell
         pairing by construction (recall-exact);
      3. one groupBy: neighborhood counts → core = n_nb >= min_pts;
      4. core–core edges → connected_components (min-label
         propagation, the dedup CC machinery);
      5. border = non-core with a core neighbor, labelled by the min
         core neighbor's cluster; the rest is noise.

    Scale: candidate mass = Σ_cells |probe_b|·|build_b| — bounded by
    the per-cell density that eps controls (DBSCAN's own premise:
    eps is chosen so neighborhoods are small); a genuinely dense blob
    is answer mass. Returns (vec_id, n_neighbors, role, cluster_id)
    with cluster_id NULL exactly for noise.
    """
    import math

    from semantik_spark.functions.vectors import dot
    from semantik_spark.operators.dedup import connected_components

    scale = math.sqrt(2.0)
    v = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).cast("array<double>").alias("v"))

    def coord(i: int):
        signs = F.expr(
            "array(" + ", ".join(repr(s) for s in _jl_signs(i, dim)) + ")")
        return F.floor(
            F.round(dot(F.col("v"), signs) / F.lit(scale), 6) * 1e6
            + F.lit(0.5)).cast("bigint")

    pts = v.select("vec_id", coord(0).alias("qx"), coord(1).alias("qy"))
    eps = F.lit(int(eps_micro)).cast("bigint")
    cell = lambda c: F.floor(F.col(c) / eps).cast("bigint")  # noqa: E731
    build = pts.select(
        F.col("vec_id").alias("b_id"), F.col("qx").alias("bx"),
        F.col("qy").alias("by"), cell("qx").alias("cx"), cell("qy").alias("cy"))
    off = F.expr("explode(array(-1, 0, 1))")
    probe = (
        pts.select("vec_id", "qx", "qy", cell("qx").alias("_cx0"),
                   cell("qy").alias("_cy0"))
        .select("*", off.alias("_dx"))
        .select("*", off.alias("_dy"))
        .select(F.col("vec_id").alias("a_id"), "qx", "qy",
                (F.col("_cx0") + F.col("_dx")).alias("cx"),
                (F.col("_cy0") + F.col("_dy")).alias("cy"))
    )
    d2 = ((F.col("qx") - F.col("bx")) * (F.col("qx") - F.col("bx"))
          + (F.col("qy") - F.col("by")) * (F.col("qy") - F.col("by")))
    nbrs = (
        probe.join(build, ["cx", "cy"])
        .where(d2 <= eps * eps)
        .select("a_id", "b_id")
    )
    from semantik_spark.functions.caching import cache

    nbrs = cache(nbrs)
    counts = nbrs.groupBy(F.col("a_id").alias("vec_id")).agg(
        F.count("*").cast("bigint").alias("n_neighbors"))
    core_ids = counts.where(F.col("n_neighbors") >= min_pts) \
        .select(F.col("vec_id").alias("core_id"))
    core_edges = (
        nbrs.where(F.col("a_id") < F.col("b_id"))
        .join(core_ids, nbrs.a_id == core_ids.core_id, "left_semi")
        .join(core_ids, nbrs.b_id == core_ids.core_id, "left_semi")
        .select(F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b"))
    )
    # Tiered CC (same discipline as the MMR serve-batch collect): an
    # eps-graph is CHAIN-shaped — min-label propagation needs
    # ~log(diameter) rounds even with pointer jumping (measured: 21
    # rounds / 172 scheduler jobs on a 1794-edge blob at sf0.1, ~10 s
    # of pure per-round overhead) — while the core-core edge list of a
    # well-tuned eps is ANSWER MASS, usually tiny. When it fits the
    # driver comfortably, union-find locally (O(E α(E)), one collect
    # job); genuinely huge cluster graphs take the distributed
    # min-label path. Labels are identical by construction: component
    # id = min node id.
    from semantik_spark.functions.caching import cache

    core_edges = cache(core_edges)
    if core_edges.count() <= 200_000:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        nodes: set = set()
        for row in core_edges.collect():
            a, b = row["doc_a"], row["doc_b"]
            nodes.add(a)
            nodes.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        members: dict = {}
        for node in nodes:
            members.setdefault(find(node), []).append(node)
        out_rows = [(n, min(group))
                    for group in members.values() for n in group]
        spark = emb.sparkSession
        # schema follows the caller's id type — a hardcoded BIGINT
        # would make string-keyed corpora crash ONLY on the small
        # (<=200k-edge) path while the distributed CC branch succeeds
        id_type = dict(emb.dtypes)[id_col]
        cc = spark.createDataFrame(
            out_rows or [(None, None)],
            f"core_id {id_type}, cluster_id {id_type}"
        ).where(F.col("core_id").isNotNull())
    else:
        cc = connected_components(core_edges, edges_canonical=True).select(
            F.col("node").alias("core_id"),
            F.col("component").alias("cluster_id"))
    # isolated cores (no core neighbor) are their own singleton cluster
    core_lab = core_ids.join(cc, "core_id", "left").select(
        "core_id", F.coalesce("cluster_id", "core_id").alias("cluster_id"))
    # border: non-core with >= 1 core neighbor -> min core cluster
    border_lab = (
        nbrs.where(F.col("a_id") != F.col("b_id"))
        .join(core_lab.withColumnRenamed("core_id", "b_id"), "b_id")
        .join(core_ids.withColumnRenamed("core_id", "a_id"), "a_id",
              "left_anti")
        .groupBy(F.col("a_id"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    return (
        counts
        .join(core_lab.select(F.col("core_id").alias("vec_id"),
                              F.col("cluster_id").alias("_core_cl")),
              "vec_id", "left")
        .join(border_lab.select(F.col("a_id").alias("vec_id"),
                                F.col("cluster_id").alias("_border_cl")),
              "vec_id", "left")
        .select(
            "vec_id", "n_neighbors",
            F.when(F.col("_core_cl").isNotNull(), F.lit("core"))
            .when(F.col("_border_cl").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise")).alias("role"),
            # cluster_id keeps the caller's id type: both label branches
            # already carry it (the small path builds its frame with
            # id_type, the distributed path propagates node ids), and a
            # hardcoded BIGINT cast turned every STRING-keyed corpus's
            # labels into NULL — the value the contract reserves for
            # noise — while role still said core/border (r12 review)
            F.coalesce("_core_cl", "_border_cl").alias("cluster_id"),
        )
    )
