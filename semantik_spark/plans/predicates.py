"""Predicate expression language → Spark Column compiler (F1).

Grammar parity with shared/pipeline/predicates.py:7-17, match_value
:90-169, _compare_numeric :172-194, matches_predicate :197-258:

  exact match      {"mime_type": "application/pdf"}
  glob             {"mime_type": "application/*"}      (fnmatch)
  negation         {"mime_type": "!image/*"}
  numeric compare  {"size_bytes": ">10000000"}   (>= <= > < == !=)
  array OR         {"extension": [".md", ".txt"]}
  nested dot path  {"metadata.source.language": "zh"}
  legacy path      {"source_metadata.x"} → metadata.source.x
  catch-all        None or {}
  multiple keys    AND

The crucial difference from the reference: this compiles to a Column
*expression*, so routing predicates participate in Catalyst — predicate
pushdown into the parquet scan, constant folding, partition pruning —
instead of running per-row Python. No UDFs anywhere.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUMERIC_PATTERN = re.compile(r"^(>=|<=|>|<|==|!=)\s*(-?\d+(?:\.\d+)?)$")


def glob_to_regex(pattern: str) -> str:
    """fnmatch-style glob → anchored Java regex ('*'→'.*', '?'→'.',
    char classes pass through, everything else escaped)."""
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = pattern.find("]", i + 1)
            if j == -1:
                out.append(re.escape(c))
            else:
                inner = pattern[i + 1:j]
                if inner.startswith("!"):
                    inner = "^" + inner[1:]
                out.append("[" + inner + "]")
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def _translate_legacy_path(path: str) -> str:
    if path.startswith("source_metadata."):
        return path.replace("source_metadata.", "metadata.source.", 1)
    if path == "source_metadata":
        return "metadata.source"
    return path


def _field_col(field: str) -> Column:
    return F.col(_translate_legacy_path(field))


def compile_value_match(col: Column, pattern: Any) -> Column:
    """Column<boolean> implementing match_value(pattern, value)."""
    if pattern is None:
        return F.lit(True)
    if isinstance(pattern, list):
        out = F.lit(False)
        for p in pattern:
            out = out | compile_value_match(col, p)
        return col.isNotNull() & out
    if isinstance(pattern, bool):
        return col.isNotNull() & (col.cast("string").isin(
            ["true", "1", "yes"] if pattern else ["false", "0", "no"]
        ) | (col.cast("boolean") == F.lit(pattern)))
    if isinstance(pattern, (int, float)):
        return col.isNotNull() & (col.cast("double") == F.lit(float(pattern)))
    if isinstance(pattern, str):
        m = _NUMERIC_PATTERN.match(pattern)
        if m:
            op, thr = m.group(1), float(m.group(2))
            num = col.cast("double")
            ops = {
                ">": num > thr, ">=": num >= thr, "<": num < thr,
                "<=": num <= thr, "==": num == thr, "!=": num != thr,
            }
            return col.isNotNull() & num.isNotNull() & ops[op]
        if pattern.startswith("!"):
            return col.isNotNull() & ~compile_value_match(col, pattern[1:])
        if any(c in pattern for c in "*?["):
            return col.isNotNull() & col.cast("string").rlike(glob_to_regex(pattern))
        return col.isNotNull() & (col.cast("string") == F.lit(pattern))
    return F.lit(False)


def compile_predicate(predicate: dict[str, Any] | None) -> Column:
    """Predicate dict → Column<boolean> (AND-fold of per-field matches);
    None/{} is the catch-all TRUE."""
    if not predicate:
        return F.lit(True)
    out = F.lit(True)
    for field, pattern in predicate.items():
        out = out & compile_value_match(_field_col(field), pattern)
    return out
