"""Hashing Column helpers shared by dedup/fingerprint operators.

``hash60`` is the engine's portable 60-bit hash: the first 15 hex chars
of md5, read as an integer. It is identical in Spark
(``conv(substr(md5(x),1,15),16,10)``) and DuckDB
(``('0x'||substr(md5(x),1,15))::bigint``), which makes every
hash-derived operator (minhash, simhash, LSH banding, fingerprints)
oracle-checkable. 60 bits keeps it inside a signed 64-bit long.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash60(c: Column | str) -> Column:
    return F.conv(F.substring(F.md5(_col(c).cast("string")), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str) -> str:
    return f"(('0x'||substr(md5(cast({expr} as varchar)),1,15))::bigint)"


def content_hash(c: Column | str) -> Column:
    """SHA-256 content hash (reference loader / executor.py:379)."""
    return F.sha2(_col(c).cast("string"), 256)
