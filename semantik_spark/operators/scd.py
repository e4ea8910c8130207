"""Slowly-changing-dimension (type 2) history over an update log.

The reference keeps only the LATEST row per entity (Postgres upsert,
e.g. document/collection rows, `packages/shared/database/models.py`'s
updated_at columns); a 100 TB lake wants the full SCD2 version chain —
every attribute change as a (valid_from, valid_to] interval — because
training-data snapshots must be reproducible *as of* a date, and
because downstream incremental jobs join on "what was true then".

Spark shape: both operators are ONE shuffle on the entity key
(window partitionBy) — change detection is `lag` over the update
sequence, interval closing is `lead` over the retained change rows,
versioning is `row_number`. No joins, no iteration; at 100 TB the
key-hash shuffle is the floor for any per-entity ordering and AQE
handles hot entities.

The merge contract is the sketch contract (streaming_kmv et al.):
``scd2_merge(scd2_history(old), new) == scd2_history(old ∪ new)``
whenever the new batch's timestamps are strictly later than the
history's per-key frontier — collapsing runs loses no information
because the first update of each run carries its valid_from, and a
batch row equal to the key's last known attribute is suppressed by
the same lag-compare that suppressed it in the full log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _collapse(updates: DataFrame, key_col: str, attr_cols: list[str],
              ts_col: str, seq_col: str) -> DataFrame:
    """Retain only updates that CHANGE at least one attribute vs the
    previous update of the same key (first update always retained),
    then close intervals with lead() and number versions."""
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    cur = updates
    change = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        # null-safe: a real NULL→value or value→NULL flip is a change
        change = change | ~F.col(c).eqNullSafe(prev)
    first = F.row_number().over(w) == 1
    cur = cur.withColumn("_is_change", first | change).where("_is_change")
    wv = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    return (
        cur.select(
            F.col(key_col),
            *[F.col(c) for c in attr_cols],
            F.col(ts_col).alias("valid_from"),
            F.col(seq_col).alias("_seq"),
        )
        .withColumn("valid_to", F.lead("valid_from").over(
            Window.partitionBy(key_col).orderBy("valid_from", "_seq")))
        .withColumn("version", F.row_number().over(
            Window.partitionBy(key_col).orderBy("valid_from", "_seq")))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_seq")
    )


def scd2_history(updates: DataFrame, key_col: str, attr_cols: list[str],
                 ts_col: str, seq_col: str) -> DataFrame:
    """Full-log rebuild: collapse an update log (one row per observed
    entity state, ordered by ``ts_col`` then ``seq_col`` within key)
    into SCD2 rows ``(key, attrs…, valid_from, valid_to, version,
    is_current)``. Consecutive updates with identical attributes fold
    into one interval starting at the run's first timestamp."""
    return _collapse(updates, key_col, attr_cols, ts_col, seq_col)


def scd2_merge(history: DataFrame, batch: DataFrame, key_col: str,
               attr_cols: list[str], ts_col: str, seq_col: str) -> DataFrame:
    """Incremental nightly merge: fold a new update ``batch`` into an
    existing SCD2 ``history`` (the output of scd2_history/scd2_merge).

    Contract: every batch timestamp is strictly later than the key's
    current ``valid_from`` frontier in history (the normal append-only
    ingestion guarantee). Under it, the result row-for-row equals the
    full-log rebuild — history rows re-enter the collapse as synthetic
    updates at their valid_from (seq pinned below any real batch seq so
    equal-timestamp ordering cannot interleave), so an unchanged batch
    value is suppressed and a changed one closes the open interval.
    """
    hist_as_updates = history.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        F.col("valid_from").alias(ts_col),
        # seq from the version number, pinned below any real batch seq:
        # two history versions sharing a timestamp stay in version
        # order inside the re-collapse (real seqs are non-negative)
        (F.col("version").cast("long") - F.lit(2**40)).alias(seq_col),
    )
    batch_updates = batch.select(
        F.col(key_col), *[F.col(c) for c in attr_cols],
        F.col(ts_col), F.col(seq_col).cast("long"),
    )
    return _collapse(hist_as_updates.unionByName(batch_updates),
                     key_col, attr_cols, ts_col, seq_col)


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time snapshot: the one version per key whose
    [valid_from, valid_to) interval covers ``ts`` — the join target
    for "reproduce the dataset as of that date"."""
    return history.where(
        (F.col("valid_from") <= F.lit(ts))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(ts)))
    )
