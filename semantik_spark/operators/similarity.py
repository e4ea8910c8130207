"""Similarity search over an embedding column (ARRAY<FLOAT>).

Two physical strategies for the same logical top-k-by-cosine:

  knn_bruteforce — exact: broadcast the query batch against the corpus
                   scan; one pass, zip_with/aggregate dot products in
                   whole-stage codegen; window top-k per query.
                   O(|corpus|·|queries|) work but ZERO index build —
                   correct v1 and the correctness oracle for ANN.

  knn_lsh        — approximate: random-hyperplane LSH (deterministic
                   hyperplanes derived from hash60 so the oracle can
                   replay them). Corpus is bucketed by an nbits-bit
                   sign signature; queries probe their own bucket plus
                   hamming-1 neighbors; exact cosine re-rank within
                   candidates. At 100 TB the bucket column is a
                   partition/bucketing key — probes prune to a handful
                   of buckets instead of the full scan.

The reference's dense retrieval is Qdrant HNSW (service.py:209-218);
brute-force gives identical results to exhaustive search, LSH is the
scale path (SURVEY §4: ANN is a physical-plan swap, not a semantic
change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semantik_spark.functions.vectors import cosine


def knn_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "query_id", query_vec_col: str = "query_vec") -> DataFrame:
    """Exact cosine top-k: query_id, vec_id, cos, rank (ties → vec_id)."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", cosine("v", "qv").alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplane(dim: int, bit: int) -> F.Column:
    """Deterministic pseudo-random hyperplane: component j of plane b is
    hash60('hp:b:j') scaled to [-1,1] — computed driver-side with
    hashlib.md5 (bit-identical to the SQL hash60, so the DuckDB oracle
    replays it) and emitted as a literal array, keeping the plan small."""
    import hashlib

    return F.array(*[
        F.lit(int(hashlib.md5(f"hp:{bit}:{j}".encode()).hexdigest()[:15], 16)
              / float(2 ** 59) - 1.0)
        for j in range(dim)
    ])


def lsh_signature(vec_col: str, dim: int, nbits: int = 8) -> F.Column:
    """nbits-bit sign signature of ``vec_col`` against the deterministic
    hyperplanes, packed into a BIGINT bucket id."""
    sig = F.lit(0).cast("bigint")
    for b in range(nbits):
        d = F.aggregate(
            F.zip_with(F.col(vec_col), _hyperplane(dim, b),
                       lambda x, h: x.cast("double") * h),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        sig = sig + F.when(d > 0, F.shiftleft(F.lit(1).cast("bigint"), b)).otherwise(0)
    return sig


def knn_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
            nbits: int = 8, probe_hamming: int = 1,
            id_col: str = "vec_id", vec_col: str = "embedding",
            query_id_col: str = "query_id", query_vec_col: str = "query_vec") -> DataFrame:
    """Approximate cosine top-k via hyperplane-LSH bucket probing.

    Queries probe all buckets within ``probe_hamming`` of their own
    signature (probe_hamming=1 → nbits+1 buckets), then exact-cosine
    re-rank inside the candidate set.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")) \
              .withColumn("bucket", lsh_signature("v", dim, nbits))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")) \
               .withColumn("qbucket", lsh_signature("qv", dim, nbits))
    # probe set: own bucket + flip each single bit (hamming ≤ 1)
    flips = [F.col("qbucket")] + [
        F.col("qbucket").bitwiseXOR(F.shiftleft(F.lit(1).cast("bigint"), b))
        for b in range(nbits)
    ][: (nbits if probe_hamming >= 1 else 0)]
    q = q.withColumn("bucket", F.explode(F.array(*flips)))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .select("query_id", "vec_id", cosine("v", "qv").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
