"""Content sniffers (F7) — derived boolean/format columns.

Parity with shared/pipeline/sniff.py:
  is_code           :530-556  (shebang / common syntax probes)
  is_structured + format detection (JSON/XML/YAML/CSV) :557-766
  is_scanned_pdf    :478-529  (text-layer chars/page below threshold
                    :305 → scanned; the text layer comes from the
                    stdlib extractor in sources.parsers._pdf_text, so
                    no pypdf is needed — sniff_pdf computes page count
                    + char count in one Arrow-batched pass and the
                    verdict itself is a pure Column expression)

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


# reference sniff.py:305 — a page with a real text layer has far more
# than 50 chars; below this the PDF is treated as image-only (scanned)
PDF_MIN_CHARS_PER_PAGE = 50


def is_scanned_pdf(text_chars: Column, n_pages: Column,
                   min_chars_per_page: int = PDF_MIN_CHARS_PER_PAGE) -> Column:
    """Scanned-PDF verdict from extracted-text size (sniff.py:478-529):
    empty PDF → scanned; else average chars/page under the threshold →
    scanned. The reference samples the first 3 pages as an IO
    optimization; here the text layer is already a column, so the
    average is over all pages — same verdict on machine-generated PDFs,
    one less parameter."""
    return (n_pages == 0) | (
        text_chars.cast("double") / F.greatest(n_pages, F.lit(1)) <
        F.lit(float(min_chars_per_page))
    )


def sniff_pdf(pdfs: DataFrame, uri_col: str = "uri",
              content_col: str = "content",
              min_chars_per_page: int = PDF_MIN_CHARS_PER_PAGE) -> DataFrame:
    """PDF text-layer probe over binary content: one mapInPandas pass
    emits n_pages (count of /Type /Page objects) and text_chars
    (stripped length of the stdlib-extracted text layer), then the
    is_scanned_pdf verdict is a plain Column on top. At 100 TB this is
    a map-only scan of the binary column — no shuffle, no Python in
    any later stage."""
    from collections.abc import Iterator

    import pandas as pd

    from semantik_spark.sources.parsers import _pdf_text

    src = pdfs.select(F.col(uri_col).alias("uri"), F.col(content_col).alias("content"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        for pdf in batches:
            rows = []
            for u, c in zip(pdf["uri"], pdf["content"]):
                # NULL binary degrades like the multimodal kernels'
                # guard (r12 review) — bytes(None) would TypeError and
                # kill the whole task; an empty blob is 0 pages/0 chars
                # and sniffs as scanned, a filterable row
                raw = bytes(c) if c is not None else b""
                n_pages = len(re.findall(rb"/Type\s*/Page\b", raw))
                try:
                    chars = len(_pdf_text(raw).strip())
                except Exception:  # noqa: BLE001 — unparseable → no text layer
                    chars = 0
                rows.append({"uri": u, "n_pages": n_pages, "text_chars": chars})
            yield pd.DataFrame(rows, columns=["uri", "n_pages", "text_chars"])

    stats = src.mapInPandas(run, schema="uri string, n_pages int, text_chars int")
    return stats.withColumn(
        "is_scanned_pdf",
        is_scanned_pdf(F.col("text_chars"), F.col("n_pages"), min_chars_per_page),
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
