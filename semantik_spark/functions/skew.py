"""Skew-aware join helper.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles sort-merge skew at runtime, but it cannot help when
the skewed side must hash-join against a *replicated* build side — the
classic hot-key aggregation/join on a power-law key (domain, language,
near-empty term buckets). ``salted_join`` is the explicit fallback:

* the SKEWED probe side gets a deterministic salt in [0, salt) derived
  from a row fingerprint (hash60 of a designated column — no RNG, so
  plans are reproducible and oracle-friendly);
* the small build side is replicated ``salt`` times (explode of a
  literal range — rows × salt, acceptable because the build side is the
  small one by contract);
* the join key becomes (key, salt), spreading each hot key over
  ``salt`` reducers.

Result set is row-identical to the unsalted join (salt columns are
dropped); only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantik_spark.functions.hashing import hash60

_SALT = "__salt"


def salted_join(skewed: DataFrame, small: DataFrame, on: str,
                salt: int = 16, fingerprint_col: str | None = None,
                how: str = "inner") -> DataFrame:
    """Join ``skewed`` (probe, power-law keys) to ``small`` (build)
    on column ``on`` with an explicit ``salt``-way key split.

    ``fingerprint_col`` picks the column whose hash spreads rows of the
    same hot key across salts (default: the first non-key column of the
    skewed side). Supports inner and left joins — the semantics where
    salting is row-preserving.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if fingerprint_col is None:
        others = [c for c in skewed.columns if c != on]
        if not others:
            raise ValueError("skewed side needs a non-key column to fingerprint")
        fingerprint_col = others[0]
    # NULL fingerprints must still land in a REAL salt bucket: hash60
    # of NULL is NULL, and a NULL salt key silently DROPS the row from
    # an inner join (and fabricates an unmatched row in a left join) —
    # breaking the row-identity contract for any corpus with NULLs in
    # the fingerprint column (r13 formula review). Coalesce to '' so
    # NULL-fingerprint rows all hash to one deterministic bucket.
    probe = skewed.withColumn(
        _SALT,
        (hash60(F.coalesce(F.col(fingerprint_col).cast("string"),
                           F.lit(""))) % salt).cast("int"))
    build = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return probe.join(build, [on, _SALT], how).drop(_SALT)
