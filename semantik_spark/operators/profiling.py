"""Dataset profiling — per-column statistics in one scan.

The reference surfaces corpus-level stats (chunk counters, collection
counters — ``shared/database/repositories/collection_repository.py``
counter updates) but has no generic column profiler; a 100 TB ingest
pipeline needs one to catch schema drift, null storms, and cardinality
blow-ups before they poison a training run.

Shape: ONE aggregate pass over the fact table computes every measure
for every profiled column as a single wide row (map-side partial
aggregation, no shuffle of the raw data — only the one-row exchange of
the partial aggregates), then an in-row ``stack`` unpivot turns it
into one output row per column. Nothing touches the driver.

Scale note: ``count(DISTINCT x)`` over several columns expands the
input (one Expand row per distinct-column per input row — a 5× blow-up
when profiling 5 columns). That is exact-by-construction, which the
DuckDB oracle needs; at 100 TB swap ``exact=False`` to use
``approx_count_distinct`` (HyperLogLog++, no Expand, mergeable) — the
profile's consumers tolerate ±2% cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str],
                    exact: bool = True) -> DataFrame:
    """column_name, n_rows, n_nulls, n_distinct, min_val, max_val,
    avg_val — numeric-column profile, one row per profiled column.

    min/max/avg are cast to double so every profiled column shares one
    output schema; avg is rounded to 6 dp for engine portability.
    """
    total = F.count(F.lit(1))
    aggs = [total.alias("__n_rows")]
    for c in columns:
        col = F.col(c)
        aggs.append((total - F.count(col)).alias(f"__nulls_{c}"))
        if exact:
            aggs.append(F.countDistinct(col).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"__nd_{c}"))
        aggs.append(F.min(col).cast("double").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("double").alias(f"__max_{c}"))
        aggs.append(F.round(F.avg(col.cast("double")), 6).alias(f"__avg_{c}"))
    wide = df.agg(*aggs)

    stack_args = []
    for c in columns:
        stack_args.append(f"'{c}', __nulls_{c}, __nd_{c}, __min_{c}, __max_{c}, __avg_{c}")
    stacked = wide.selectExpr(
        "__n_rows as n_rows",
        f"stack({len(columns)}, "
        + ", ".join(stack_args)
        + ") as (column_name, n_nulls, n_distinct, min_val, max_val, avg_val)",
    )
    return stacked.select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_val", "max_val", "avg_val",
    )
