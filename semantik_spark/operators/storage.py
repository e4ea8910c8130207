"""Bucketed-table storage layout — shuffle-free co-located joins.

The reference's storage engines (Postgres + Qdrant) co-locate by
primary key / shard implicitly; the Spark-native equivalent for a
100 TB lake is BUCKETING: write both sides of a recurring join
pre-hash-partitioned AND pre-sorted on the join key
(``bucketBy(n, key).sortBy(key)``), and every later equi-join on that
key needs NO exchange on either side — the single biggest
recurring-cost lever for index/payload joins that run on every query
batch (doc hydration, postings∪payload, chunk→doc rollups).

Rules this module encodes (and tests/test_plans.py asserts):
- both tables bucketed on the JOIN key with the SAME bucket count;
- ``sortBy`` the same key: since Spark 3.0 the scan no longer
  *advertises* bucket-file order (SPARK-28554's multi-file hazard), so
  a per-bucket Sort node remains in-plan — but it runs over
  already-sorted single-file buckets (linear verify, no spill) and,
  crucially, with NO Exchange before it; deployments that accept the
  single-file-per-bucket invariant can flip
  ``spark.sql.legacy.bucketedTableScan.outputOrdering`` to elide it;
- the bucket count is a storage-time decision: pick
  ``total_size / target_partition_size`` at the largest consumer, and
  keep it a power of two so a future re-bucket can split/merge evenly.

Bucketed tables must go through the session catalog
(``saveAsTable`` — plain ``parquet(path)`` writes lose the bucket
spec); the catalog entry is what lets the planner trust the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8,
                   path: str | None = None, mode: str = "overwrite") -> None:
    """Persist ``df`` hash-bucketed and sorted on ``key`` as a catalog
    table. ``path`` makes it an external table (parquet files live
    there); omit it for the session warehouse.

    The pre-write ``repartition(n_buckets, key)`` matters: it aligns
    task partitioning with the bucket function so each bucket is ONE
    file — Spark only elides the join-side Sort when files-per-bucket
    is 1, and it caps the file count at n_buckets instead of
    tasks×buckets."""
    w = (df.repartition(n_buckets, F.col(key))
         .write.format("parquet").mode(mode).bucketBy(n_buckets, key).sortBy(key))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def co_located_join(spark: SparkSession, left_table: str, right_table: str,
                    key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching bucket counts the physical plan is a SortMergeJoin with
    ZERO Exchange and zero per-side Sort — reading n_buckets co-located
    file groups. (Broadcast is disabled per-join via hints being absent
    and AQE honoring the bucket layout; the plan assertion in
    tests/test_plans.py is the contract.)"""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) interleave of pre-normalized integer columns
    (each in [0, 2^bits)): bit b of column i lands at position
    b*len(cols)+i. Pure JVM bitwise expressions — one narrow
    projection, whole-stage-codegen'd."""
    n = len(cols)
    if n * bits > 63:
        # bit position n*bits-1 would land in the LONG sign bit: keys
        # with it set sort NEGATIVE, silently breaking the curve order
        # (r12 review). Fail fast; callers drop bits-per-column when
        # interleaving more columns (4 cols -> bits <= 15).
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits = {n * bits} interleaved"
            " bits > 63 (long sign bit) — reduce bits or columns")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            key = key + F.shiftleft(
                F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), b * n + i
            )
    return key


def zorder_write(df: DataFrame, path: str, cols: list[str], n_files: int = 8,
                 bits: int = 16) -> None:
    """Write ``df`` laid out along a Z-order (Morton) curve over
    ``cols`` — the Delta/Iceberg OPTIMIZE ZORDER technique with plain
    parquet: multi-dimensional locality means every file's min/max
    envelope is narrow in EVERY listed column, so point/range
    predicates on ANY of them skip most files via footer statistics.
    A single-column sort gives that for one column only; Z-order trades
    a little per-column locality for pruning on all of them
    (tests/test_storage.py measures exactly this trade).

    Shape: one tiny min/max agg per column (collected — 2·len(cols)
    doubles), a narrow Morton-key projection, one range repartition on
    the key (the only shuffle — also what a plain sort would pay), and
    a within-partition sort so row groups inside each file stay tight.
    """
    stats = df.agg(*[f for c in cols for f in
                     (F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}"))]).collect()[0]
    scale = (1 << bits) - 1
    norm = []
    for c in cols:
        mn, mx = float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        norm.append(((F.col(c) - F.lit(mn)) * F.lit(scale) / F.lit(span)).cast("long"))
    (
        df.withColumn("_zkey", zorder_key(norm, bits))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite").parquet(path)
    )


def bloom_prune_stats(large: DataFrame, small: DataFrame, key_col: str,
                      n_bits: int = 4096, k: int = 3) -> DataFrame:
    """Deterministic Bloom-filter semi-join pruning with a measured
    false-positive report — the runtime-filter pattern (Spark's
    spark.sql.optimizer.runtime.bloomFilter, Trino/ORC bloom indexes)
    made observable and engine-replayable.

    Build: each small-side key sets k bit positions
    ``hash60(key + '#' + i) % n_bits``; the filter is the DISTINCT set
    of positions (a table of ≤ k·|small| ints, broadcast to the probe).
    Probe: a large-side key passes iff ALL k of its positions are set.
    Every key that truly matches passes (no false negatives, by
    construction); the report measures the false-positive overhang an
    exact semi-join would then discard.

    Returns ONE row: n_small_keys, n_bits_set, n_probe_keys, n_pass,
    n_true, n_false_pos, fp_rate (fp among true negatives, 6 dp).

    Scale shape: the probe never shuffles the large side — positions
    are computed map-side and checked against the BROADCAST bit table;
    only the distinct-key aggregations shuffle. At 100 TB the bit table
    is a real bitmap pushed into the scan; the position-set formulation
    here is what keeps the whole thing exact-replayable in the oracle.
    """
    from semantik_spark.functions.hashing import hash60

    def positions(key: Column) -> Column:
        return F.array(*[
            F.pmod(hash60(F.concat(key.cast("string"), F.lit(f"#{i}"))),
                   F.lit(n_bits))
            for i in range(k)
        ])

    skeys = small.select(F.col(key_col).alias("sk")).distinct()
    bits = (
        skeys.select(F.explode(positions(F.col("sk"))).alias("setbit"))
        .distinct()
    )
    pkeys = large.select(F.col(key_col).alias("pk")).distinct()
    probe = pkeys.select(
        "pk", F.explode(positions(F.col("pk"))).alias("bitpos")
    )
    hits = (
        probe.join(F.broadcast(bits), probe.bitpos == bits.setbit, "left")
        .groupBy("pk")
        .agg(F.min(F.when(F.col("setbit").isNotNull(), 1).otherwise(0)).alias("passes"))
    )
    truth = pkeys.join(skeys, pkeys.pk == skeys.sk, "left").select(
        "pk", F.when(F.col("sk").isNotNull(), 1).otherwise(0).alias("is_true")
    )
    joined = hits.join(truth, "pk")
    return joined.agg(
        F.sum("is_true").cast("bigint").alias("n_true"),
        F.sum("passes").cast("bigint").alias("n_pass"),
        F.count("*").cast("bigint").alias("n_probe_keys"),
        F.sum(F.when((F.col("passes") == 1) & (F.col("is_true") == 0), 1)
              .otherwise(0)).cast("bigint").alias("n_false_pos"),
    ).crossJoin(F.broadcast(skeys.agg(F.count("*").cast("bigint").alias("n_small_keys")))) \
     .crossJoin(F.broadcast(bits.agg(F.count("*").cast("bigint").alias("n_bits_set")))) \
     .select(
        "n_small_keys", "n_bits_set", "n_probe_keys", "n_pass", "n_true",
        "n_false_pos",
        F.round(F.col("n_false_pos") /
                F.greatest(F.col("n_probe_keys") - F.col("n_true"), F.lit(1)),
                6).alias("fp_rate"),
    )


def compaction_plan(files: DataFrame, partition_col: str, file_col: str,
                    size_col: str, target_bytes: int,
                    small_below: int | None = None) -> DataFrame:
    """Small-file compaction planning — the Delta/Iceberg ``OPTIMIZE``
    bin-packer as a deterministic, engine-replayable rule. The
    small-files problem is THE operational failure mode of a streaming
    lake (every micro-batch writes a file per partition; a year later
    the table is 10M 200 KB files and scan planning dominates runtime).

    Rule: within each table partition, candidate files (all of them,
    or only those under ``small_below``) are ordered size-DESC (first-
    fit-decreasing order, name as tiebreak) and packed by cumulative
    quota — a file joins bin ``floor(bytes_packed_before_it /
    target_bytes)``. That is the prefix-sum approximation of FFD:
    monotone, one window pass, and independent of Spark partitioning —
    greedy per-bin backtracking would need a sequential loop for ~2%
    tighter packing.

    Returns one row per (partition, bin): n_files, bin_bytes,
    largest/smallest member, and fill_frac vs target. A bin with
    n_files == 1 and fill_frac >= 1 is an oversize file the planner
    leaves alone; everything else is a rewrite task whose input set is
    reproducible from the rule.

    Scale shape: one shuffle on the table-partition key; the window
    never materializes file contents — this plans over the catalog
    listing (path, size), which for a 10M-file table is ~1 GB of
    metadata, not the 100 TB of data."""
    cand = files
    if small_below is not None:
        cand = cand.where(F.col(size_col) < small_below)
    w = Window.partitionBy(partition_col) \
        .orderBy(F.col(size_col).desc(), F.col(file_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = cand.withColumn(
        "_bin",
        F.floor((F.sum(size_col).over(w) - F.col(size_col))
                / F.lit(target_bytes)).cast("int"),
    )
    return (
        packed.groupBy(F.col(partition_col), F.col("_bin").alias("bin_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum(size_col).cast("bigint").alias("bin_bytes"),
            F.max(size_col).cast("bigint").alias("largest_file"),
            F.min(size_col).cast("bigint").alias("smallest_file"),
            F.round(F.sum(size_col) / F.lit(float(target_bytes)), 6)
             .alias("fill_frac"),
        )
    )
