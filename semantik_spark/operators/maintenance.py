"""Index maintenance: GC (P7), stale marking, blue/green reindex (P6).

Reference parity:
  orphaned points  vecpipe/maintenance.py:175-238 — delete index points
                   whose document no longer exists
  orphaned collections :239-302 — drop index tables with no catalog row
                   after a grace period
  stale docs       Document.last_seen_at / is_stale (models.py:369-370)
                   via anti-join of catalog vs latest enumeration
  blue/green       webui/tasks/reindex.py:275-1018 — staging build →
                   validation checkpoints → atomic swap

Spark-first: every cleanup is an anti-join + rewrite; the atomic swap is
a table-pointer flip (directory rename locally; REPLACE TABLE / metastore
pointer on a cluster). No tombstone bookkeeping — the rewritten parquet
IS the new truth.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def orphaned_points(index: DataFrame, documents: DataFrame,
                    doc_id_col: str = "doc_id") -> DataFrame:
    """P7: index rows whose doc vanished (maintenance.py:175-238)."""
    return index.join(
        documents.select(F.col(doc_id_col).alias("doc_id")), "doc_id", "left_anti"
    )


def gc_index(index: DataFrame, documents: DataFrame,
             doc_id_col: str = "doc_id") -> DataFrame:
    """The kept rows after GC — semi-join against live documents. At
    scale this is the rewrite side of the same scan that found orphans."""
    return index.join(
        documents.select(F.col(doc_id_col).alias("doc_id")), "doc_id", "left_semi"
    )


def mark_stale(catalog: DataFrame, enumeration: DataFrame,
               key_cols: tuple[str, ...] = ("uri",)) -> DataFrame:
    """Stale marking: catalog rows absent from the latest enumeration get
    is_stale=true (models.py:369-370 semantics)."""
    seen = enumeration.select(*key_cols).distinct().withColumn("_seen", F.lit(True))
    return (
        catalog.join(seen, list(key_cols), "left")
        .withColumn("is_stale", F.col("_seen").isNull())
        .drop("_seen")
    )


class BlueGreenIndex:
    """P6 blue/green reindex over a directory-per-color layout:

        {root}/live   -> symlink to blue/ or green/
        {root}/blue, {root}/green — parquet index tables

    write_staging → validate (row count + sample query) → swap (atomic
    symlink replace). On a cluster the same protocol runs against a
    metastore table pointer or Delta REPLACE TABLE — the validation
    checkpoints (reindex.py:307-1018) are the part that matters.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def live_path(self) -> str:
        return os.path.join(self.root, "live")

    def _color_of(self, path: str) -> str:
        return os.path.basename(os.path.realpath(path))

    def staging_color(self) -> str:
        if not os.path.lexists(self.live_path):
            return "blue"
        return "green" if self._color_of(self.live_path) == "blue" else "blue"

    def write_staging(self, index: DataFrame,
                      partition_by: tuple[str, ...] = ()) -> str:
        color = self.staging_color()
        path = os.path.join(self.root, color)
        if os.path.exists(path):
            shutil.rmtree(path)
        w = index.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        return path

    def validate_staging(self, spark: SparkSession,
                         min_rows: int = 1,
                         expect_columns: tuple[str, ...] = ()) -> dict:
        """Validation checkpoint: row count + schema presence. Raises on
        failure — the swap never happens on a bad build."""
        path = os.path.join(self.root, self.staging_color())
        df = spark.read.parquet(path)
        n = df.count()
        missing = [c for c in expect_columns if c not in df.columns]
        if n < min_rows:
            raise ValueError(f"staging index has {n} rows < {min_rows}")
        if missing:
            raise ValueError(f"staging index missing columns: {missing}")
        return {"rows": n, "columns": df.columns, "path": path}

    def swap(self) -> str:
        """Atomic pointer flip: build the symlink beside live, rename
        over it (rename is atomic on POSIX)."""
        color = self.staging_color()
        tmp = self.live_path + ".tmp"
        if os.path.lexists(tmp):
            os.unlink(tmp)
        os.symlink(color, tmp)
        os.replace(tmp, self.live_path)
        return os.path.join(self.root, color)

    def read_live(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.realpath(self.live_path))

    def cleanup_old(self) -> None:
        """Drop the non-live color after a successful swap (the
        reference waits a grace period; callers decide when)."""
        live = self._color_of(self.live_path)
        for color in ("blue", "green"):
            if color != live:
                p = os.path.join(self.root, color)
                if os.path.exists(p):
                    shutil.rmtree(p)
