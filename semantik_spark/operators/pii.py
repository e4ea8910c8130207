"""PII detection and redaction over document text.

Training-data pipelines scrub personally-identifiable information
before anything else touches the corpus. This module provides the
regex family a C4/Gopher-style curation pass uses — emails, phone
numbers, SSN-like ids, card-like numbers, IPv4 addresses — as pure
Column expressions (JVM regex, no Python in the hot path), so the scan
is a single narrow projection over the text column and the redaction a
fixed chain of ``regexp_replace``. Patterns stay inside the syntax
subset shared by Java regex and RE2 so the DuckDB oracle replays them
byte-identically.

Scale: per-row expressions only — no shuffle, no UDF; Catalyst keeps
the whole scan in one WholeStageCodegen span over the parquet scan.

The synthetic corpus carries no PII, so ``inject_synthetic_pii``
deterministically plants doc_id-derived PII in a subset of documents;
queries run the scan over the augmented text so every pattern is
exercised end-to-end against the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pattern order IS the redaction order: emails first (their local parts
# may contain digit runs), then the longer digit shapes before the
# shorter ones so a card never half-matches as a phone.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("card", r"\b(?:\d{4}[- ]){3}\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
]


def inject_synthetic_pii(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Deterministically append doc_id-derived PII strings to a subset
    of documents (test fixture — the synthetic corpus has none).

    doc_id % 3 == 0 → email, % 4 == 0 → phone, % 5 == 0 → SSN + IPv4,
    % 7 == 0 → card. Pure string concat of doc_id arithmetic, so the
    oracle rebuilds the identical augmented text in SQL.
    """
    i = F.col(id_col).cast("bigint")
    d3 = (i % 1000).cast("string")

    def pad3(c: Column) -> Column:
        return F.lpad(c.cast("string"), 3, "0")

    def pad4(c: Column) -> Column:
        return F.lpad(c.cast("string"), 4, "0")

    parts = [
        F.when(i % 3 == 0, F.concat(F.lit(" contact user"), d3, F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(i % 4 == 0, F.concat(F.lit(" call 555-"), pad3(i % 900 + 100), F.lit("-"), pad4(i % 10000))).otherwise(F.lit("")),
        F.when(i % 5 == 0, F.concat(
            F.lit(" ssn "), pad3(i % 900 + 100), F.lit("-"), F.lpad((i % 90 + 10).cast("string"), 2, "0"),
            F.lit("-"), pad4(i % 10000),
            F.lit(" host 10."), (i % 256).cast("string"), F.lit("."), ((i * 7) % 256).cast("string"),
            F.lit("."), ((i * 13) % 256).cast("string"),
        )).otherwise(F.lit("")),
        F.when(i % 7 == 0, F.concat(
            F.lit(" card "), pad4(i % 10000), F.lit("-"), pad4((i * 3) % 10000),
            F.lit("-"), pad4((i * 11) % 10000), F.lit("-"), pad4((i * 17) % 10000),
        )).otherwise(F.lit("")),
    ]
    return docs.withColumn(text_col, F.concat(F.col(text_col), *parts))


def pii_scan(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts: doc_id, n_<kind> per PII_PATTERNS,
    n_pii total, has_pii flag."""
    t = F.col(text_col)
    counts = {k: F.regexp_count(t, F.lit(p)).cast("int").alias(f"n_{k}")
              for k, p in PII_PATTERNS}
    out = docs.select(F.col(id_col).alias("doc_id"), *counts.values())
    total = sum((F.col(f"n_{k}") for k, _ in PII_PATTERNS[1:]),
                F.col(f"n_{PII_PATTERNS[0][0]}"))
    return out.withColumn("n_pii", total.cast("int")).withColumn(
        "has_pii", (F.col("n_pii") > 0)
    )


def pii_redact(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """doc_id, redacted — each PII kind replaced by its [KIND]
    placeholder, applied in PII_PATTERNS order (fixed chain so the
    oracle replays the same rewrite sequence)."""
    red = F.col(text_col)
    for kind, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"[{kind.upper()}]")
    return docs.select(F.col(id_col).alias("doc_id"), red.alias("redacted"))


def pii_report(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Scan counts + redacted text in one narrow projection (no
    self-join): doc_id, n_<kind>..., n_pii, has_pii, redacted."""
    t = F.col(text_col)
    counts = [F.regexp_count(t, F.lit(p)).cast("int").alias(f"n_{k}")
              for k, p in PII_PATTERNS]
    red = t
    for kind, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"[{kind.upper()}]")
    out = docs.select(F.col(id_col).alias("doc_id"), *counts, red.alias("redacted"))
    total = sum((F.col(f"n_{k}") for k, _ in PII_PATTERNS[1:]),
                F.col(f"n_{PII_PATTERNS[0][0]}"))
    return out.select(
        "doc_id", *[f"n_{k}" for k, _ in PII_PATTERNS],
        total.cast("int").alias("n_pii"), (total > 0).alias("has_pii"), "redacted",
    )


def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       k: int = 5) -> DataFrame:
    """k-anonymity audit over the given quasi-identifier columns
    (Sweeney 2002): every equivalence class (distinct quasi-identifier
    combination) with its size, an ``at_risk`` flag (size < k — those
    rows are re-identifiable within fewer than k candidates), and the
    dataset's achieved ``k_anonymity`` (the minimum class size,
    broadcast onto every row so the report is self-contained).

    The compliance companion to the redaction pass above: redaction
    removes DIRECT identifiers; this measures what the remaining
    quasi-identifiers still leak in combination.

    Scale shape: one groupBy on the quasi columns (map-side
    combinable) + a 1-row global-min broadcast — the same two-exchange
    profile as any grouped aggregate; no windows, no self-joins.
    """
    classes = df.groupBy(*quasi_cols).agg(
        F.count("*").cast("bigint").alias("class_size")
    )
    kmin = classes.agg(F.min("class_size").alias("k_anonymity"))
    return (
        classes.crossJoin(F.broadcast(kmin))
        .withColumn("at_risk", F.col("class_size") < k)
    )
