"""Distributed heavy hitters — Misra-Gries candidates + exact recount.

At 100 TB, "which tokens/domains/users exceed x% of the corpus" cannot
afford a full groupBy over billions of distinct keys when only the few
heavy keys matter. The classic answer (Misra & Gries 1982; mergeable
form: Agarwal et al., "Mergeable Summaries", PODS 2012) is a per-
partition m-counter summary whose candidate set PROVABLY contains every
key with global frequency > N/m (averaging argument: if
sum_p freq_p > sum_p N_p/m then freq_p > N_p/m for some partition, and
an MG(m) summary retains any key whose partition count exceeds
N_p/m). The union of per-partition candidates is therefore a guaranteed
superset, and a second exact pass over ONLY candidate keys makes the
final answer exact and partitioning-independent:

    output == {key : count(key) * m > N}   (exactly, any partitioning)

which is what lets a DuckDB oracle replay it as a plain
GROUP BY/HAVING even though the candidate stage is approximate.

Shapes: phase 1 is a map-only Arrow pass (mapInPandas; counts are
vectorized per batch via value_counts, the MG decrement runs on the
aggregated dict — O(distinct-per-batch) Python ops, never per row);
phase 2 broadcast-semi-joins the tiny candidate set back and aggregates
candidate rows only — the full key space never shuffles. The extra
N-count job is a column-pruned scan (at cluster scale you piggyback it
on phase 1 via a count aggregate on the same cached frame, as here).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantik_spark.functions.caching import cache


def _mg_candidates(m: int):
    """Per-partition mergeable Misra-Gries candidate keys — the same
    fold as _mg_counters with the counts projected away, so the trim
    rule lives in exactly one place (a fix applied to one copy and not
    the other would silently change the candidate-superset guarantee)."""
    counters_fn = _mg_counters(m)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in counters_fn(it):
            yield pdf[["k"]]

    return run


def _mg_counters(m: int):
    """Per-partition Misra-Gries summary WITH counts (k, c) — the
    mergeable-state form of _mg_candidates. Counter values matter for
    streaming: they are what merges across micro-batches by addition
    (Agarwal et al. PODS'12), whereas the batch path only needs the
    candidate key set."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: pd.Series = pd.Series(dtype="int64")
        for pdf in it:
            batch = pdf["k"].value_counts()
            counters = counters.add(batch, fill_value=0)
            if len(counters) > m - 1:
                cut = counters.nlargest(m).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        yield pd.DataFrame(
            {"k": counters.index.astype(str), "c": counters.values.astype("int64")}
        )

    return run


def mg_summarize(df: DataFrame, key_col: str, m: int) -> DataFrame:
    """One MG(m) summary (k, c) over df's non-null keys: per-partition
    mapInPandas summaries merged via mg_merge. ≤ m-1 rows out."""
    keys = df.select(F.col(key_col).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    partials = keys.mapInPandas(_mg_counters(m), "k string, c long")
    return mg_merge(partials, m)


def mg_merge(summaries: DataFrame, m: int) -> DataFrame:
    """Merge any union of MG(m) summaries (k, c) into one MG(m) summary:
    add counts per key, then the PODS'12 trim — subtract the m-th
    largest summed count from every counter and drop the non-positive.
    Every decrement step removes ≥ m units of total mass, so the total
    decrement any key ever suffers stays ≤ N/m across arbitrary merge
    trees, preserving the heavy-key superset guarantee.

    The trim threshold is a 1-row aggregate over the ≤ P*(m-1)-row
    summary union, broadcast back — never a full-data shuffle; input
    and output are both bounded by m, not by corpus size."""
    summed = summaries.groupBy("k").agg(F.sum("c").cast("bigint").alias("c"))
    # m-th largest count, 0 when fewer than m keys survive the sum
    cut = summed.agg(
        F.coalesce(
            # F.get is null (not an error) when fewer than m keys exist
            F.get(F.sort_array(F.collect_list("c"), False), m - 1),
            F.lit(0),
        ).cast("bigint").alias("cut")
    )
    return (
        summed.crossJoin(F.broadcast(cut))
        .where(F.col("c") - F.col("cut") > 0)
        .select("k", (F.col("c") - F.col("cut")).cast("bigint").alias("c"))
    )


def heavy_hitters_exact(df: DataFrame, key_col: str, candidates: DataFrame,
                        total: int, m: int) -> DataFrame:
    """Exact-recount phase shared by the batch and streaming paths:
    semi-join df's keys to the tiny candidate set (broadcast), count
    exactly, keep count*m > total. Output (key_col, n, frac)."""
    keys = df.select(F.col(key_col).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    exact = (
        keys.join(F.broadcast(candidates.select("k")), "k", "left_semi")
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n"))
        .where(F.col("n") * m > F.lit(total))
    )
    return exact.select(
        F.col("k").alias(key_col),
        "n",
        F.round(F.col("n") / F.lit(float(total)), 6).alias("frac"),
    )


def heavy_hitters(df: DataFrame, key_col: str, m: int = 50) -> DataFrame:
    """All keys with count(key) * m > N (strictly), with exact counts
    and corpus fractions: (key_col, n, frac). Deterministic for any
    partitioning — see module docstring for the superset proof.

    NULL keys are excluded up front (explicitly, not incidentally):
    they can never survive the equi-join recount, and pandas
    value_counts drops them from candidates — filtering first makes N
    and frac consistently 'over non-null keys' instead of mixing a
    null-inclusive N with a null-free output."""
    keys = cache(
        df.select(F.col(key_col).cast("string").alias("k"))
        .where(F.col("k").isNotNull())
    )
    total = keys.count()
    cand = keys.mapInPandas(_mg_candidates(m), "k string").distinct()
    exact = (
        keys.join(F.broadcast(cand), "k", "left_semi")
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n"))
        .where(F.col("n") * m > F.lit(total))
    )
    return exact.select(
        F.col("k").alias(key_col),
        "n",
        F.round(F.col("n") / F.lit(float(total)), 6).alias("frac"),
    )


def _cm_row_bucket(key: F.Column | str, row: int, width: int) -> F.Column:
    """Bucket of ``key`` in Count-Min row ``row``: hash60 of the
    row-prefixed key, mod width. md5-based, so any engine (and the
    DuckDB oracle) reproduces it bit-for-bit."""
    from semantik_spark.functions.hashing import hash60

    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        hash60(F.concat(F.lit(f"cm{row}:"), c.cast("string"))), F.lit(width)
    ).cast("int")


def count_min_cells(df: DataFrame, key_col: str, depth: int = 4,
                    width: int = 256) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) cell table over
    ``df[key_col]``: ``depth`` hash rows x ``width`` buckets, each cell
    the number of input rows hashing into it. Returns (row, bucket, n)
    for non-empty cells only — absent cells are zero.

    Why CM alongside Misra-Gries: MG answers "which keys are heavy"
    (candidate set + exact recount); CM answers point-frequency queries
    for ANY key with a one-sided guarantee — estimate >= true count,
    and <= true + 2N/width with probability 1 - 2^-depth — in
    depth*width integers of state, mergeable by cell-wise addition
    (Agarwal et al., PODS 2012). That makes it the frequency twin of
    the KMV/DDSketch state family, incl. the streaming merge path
    (streaming.incremental.streaming_count_min).

    Scale shape: one explode to depth rows per input, then a single
    map-side-combined aggregation onto depth*width distinct keys —
    constant-size result regardless of corpus size, no windows, no
    skew exposure (bucket load is hash-uniform by construction).
    NULL keys are excluded (same contract as heavy_hitters).
    """
    keys = df.select(F.col(key_col).cast("string").alias("_k")).where(
        F.col("_k").isNotNull()
    )
    rb = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).cast("int").alias("row"),
                _cm_row_bucket("_k", i, width).alias("bucket"),
            )
            for i in range(depth)
        ])
    ).alias("rb")
    return (
        keys.select(rb)
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def count_min_estimate(cells: DataFrame, probes: DataFrame, key_col: str,
                       depth: int = 4, width: int = 256) -> DataFrame:
    """Point-frequency estimates for every key in ``probes[key_col]``
    from a ``count_min_cells`` table: min over the key's depth cells
    (missing cell = 0). Output (key_col, cm_estimate).

    The cells table is depth*width rows at most — broadcast onto the
    probe side, so serving estimates is a map-only pass over the probe
    keys no matter how large the sketched corpus was."""
    pr = probes.select(
        F.col(key_col).cast("string").alias("_k"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).cast("int").alias("row"),
                    _cm_row_bucket(key_col, i, width).alias("bucket"),
                )
                for i in range(depth)
            ])
        ).alias("rb"),
    ).select("_k", "rb.row", "rb.bucket")
    return (
        pr.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy("_k")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("bigint")
             .alias("cm_estimate"))
        .select(F.col("_k").alias(key_col), "cm_estimate")
    )


def count_min_report(df: DataFrame, key_col: str, depth: int = 4,
                     width: int = 256, top: int = 30) -> DataFrame:
    """CM accuracy report over the ``top`` exact-heaviest keys: (key,
    n_exact, cm_estimate, overestimate). overestimate >= 0 ALWAYS (the
    one-sided CM guarantee — each of the key's cells holds its true
    count plus colliding mass); its magnitude measures collision load
    at this width, which is what an operator sizing width against a
    real corpus needs to see."""
    keys = cache(
        df.select(F.col(key_col).cast("string").alias("_k")).where(
            F.col("_k").isNotNull()
        )
    )
    cells = count_min_cells(keys, "_k", depth, width)
    exact = (
        keys.groupBy("_k")
        .agg(F.count("*").cast("bigint").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("_k"))
        .limit(top)
    )
    est = count_min_estimate(cells, exact.select("_k"), "_k", depth, width)
    return (
        exact.join(est, "_k")
        .select(
            F.col("_k").alias(key_col),
            "n_exact",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("n_exact")).cast("bigint")
            .alias("overestimate"),
        )
    )
