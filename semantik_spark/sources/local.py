"""Local file source (S1) + loader (S4) + text parser (S5).

Reference parity:
  enumerate   shared/connectors/local.py:246-303 — recursive walk,
              include/exclude extension sets, hidden-file skip,
              size caps (filters :153-187)
  load+hash   shared/pipeline/loader.py — bytes + SHA-256 content_hash
              (used executor.py:379-387)
  text parse  shared/text_processing/parsers/text.py:22-247 — BOM strip,
              utf-8 with fallback decode, binary sniff

Spark-first: one `binaryFile` scan gives enumeration AND loading in a
single distributed read (path, modificationTime, length, content);
filters compile to Column predicates pushed at the source (pathGlobFilter
prunes files before they are opened). The FileReference row contract
(pipeline/types.py:32-148) becomes the output schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# reference default extension set (connectors/local.py defaults)
DEFAULT_EXTENSIONS = (
    ".txt", ".md", ".markdown", ".rst", ".py", ".js", ".ts", ".java",
    ".json", ".yaml", ".yml", ".xml", ".csv", ".html", ".htm", ".pdf",
    ".docx", ".doc", ".pptx", ".eml",
)

_MIME_BY_EXT = {
    ".txt": "text/plain", ".md": "text/markdown", ".markdown": "text/markdown",
    ".rst": "text/x-rst", ".py": "text/x-python", ".js": "text/javascript",
    ".ts": "text/typescript", ".java": "text/x-java",
    ".json": "application/json", ".yaml": "application/yaml",
    ".yml": "application/yaml", ".xml": "application/xml", ".csv": "text/csv",
    ".html": "text/html", ".htm": "text/html", ".pdf": "application/pdf",
    ".docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ".doc": "application/msword",
    ".pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    ".eml": "message/rfc822",
}


def _ext_col(path: Column) -> Column:
    base = F.element_at(F.split(path, "/"), -1)
    return F.when(
        base.rlike(r"\.[^.]+$"),
        F.lower(F.regexp_extract(base, r"(\.[^.]+)$", 1)),
    ).otherwise(F.lit(""))


def mime_for_extension(ext: Column) -> Column:
    m = F.lit(None).cast("string")
    expr = F.when(F.lit(False), m)
    for e, mime in _MIME_BY_EXT.items():
        expr = expr.when(ext == e, F.lit(mime))
    return expr.otherwise(F.lit("application/octet-stream"))


def enumerate_files(spark: SparkSession, root: str,
                    extensions: tuple[str, ...] = DEFAULT_EXTENSIONS,
                    max_size_bytes: int | None = None) -> DataFrame:
    """S1+S4 in one scan: FileReference rows with loaded content.

    Output: uri, file_name, extension, mime_type, size_bytes,
    modified_at, content BINARY, content_hash (SHA-256 hex),
    source_type='local'. Extension/size filters are Column predicates
    evaluated before content flows downstream; at cluster scale
    `pathGlobFilter`/`recursiveFileLookup` prune at file-listing time so
    excluded files are never opened.

    Hidden files/dirs (dot-prefixed) are ALWAYS excluded — Hadoop's
    file listing filters them before Spark sees them, which matches the
    reference connector's default (local.py hidden-file skip).
    """
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    out = df.select(
        F.col("path").alias("uri"),
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        _ext_col(F.col("path")).alias("extension"),
        F.col("length").alias("size_bytes"),
        F.col("modificationTime").alias("modified_at"),
        F.col("content"),
    )
    if extensions:
        out = out.where(F.col("extension").isin(list(extensions)))
    if max_size_bytes is not None:
        out = out.where(F.col("size_bytes") <= max_size_bytes)
    return out.select(
        "uri", "file_name", "extension",
        mime_for_extension(F.col("extension")).alias("mime_type"),
        "size_bytes", "modified_at", "content",
        F.sha2(F.col("content"), 256).alias("content_hash"),
        F.lit("local").alias("source_type"),
    )


_TEXT_EXTENSIONS = (
    ".txt", ".md", ".markdown", ".rst", ".py", ".js", ".ts", ".java",
    ".json", ".yaml", ".yml", ".xml", ".csv", ".html", ".htm",
)


def parse_text(files: DataFrame) -> DataFrame:
    """S5 text parser with the reference's BOM-detection + binary-sniff
    chain (text_processing/parsers/text.py:13-58,220-231), as pure
    Column expressions:

      1. BOM detect, longest first (UTF-32 before UTF-16 — FF FE 00 00
         must not read as UTF-16-LE): UTF-16 BOMs decode via the JVM
         UTF-16 charset (BOM-consuming); UTF-8 BOM strips then decodes;
         UTF-32 has no JVM charset in Spark's decode() and is flagged
         unsupported_encoding rather than mis-decoded.
      2. No BOM → binary sniff: a NUL byte anywhere, or >30%
         non-printable bytes in the first 8 KiB (tab/LF/CR excluded),
         rejects the row as binary_rejected (text.py:34-58).
      3. Else the charset fallback chain (text.py:22-58): UTF-8 first
         (validity via is_valid_utf8 over the zero-copy binary→string
         cast — never a throwing ANSI decode); invalid UTF-8 falls
         back to Latin-1, which maps every byte — same terminal
         fallback as the reference's encoding list. The chosen charset
         is surfaced in the ``encoding`` column.

    Non-text extensions pass through with text NULL for the registry's
    binary families.
    """
    is_text = F.col("extension").isin(list(_TEXT_EXTENSIONS))
    c = F.col("content")
    pfx4, pfx3, pfx2 = c.substr(1, 4), c.substr(1, 3), c.substr(1, 2)
    is32 = (pfx4 == F.lit(b"\xff\xfe\x00\x00")) | (pfx4 == F.lit(b"\x00\x00\xfe\xff"))
    is16 = (pfx2 == F.lit(b"\xff\xfe")) | (pfx2 == F.lit(b"\xfe\xff"))
    is8sig = pfx3 == F.lit(b"\xef\xbb\xbf")
    has_bom = is32 | is16 | is8sig
    # binary sniff on BOM-less content: NUL byte, or non-printable
    # ratio > 0.30 over the first 8 KiB (ISO-8859-1 maps bytes 1:1 to
    # chars, so the byte-class count is a regexp over the decoded head)
    head = F.decode(c.substr(1, 8192), "ISO-8859-1")
    nonprint = F.length(
        F.regexp_replace(head, "[^\\x00-\\x08\\x0e-\\x1f]", "")
    )
    is_binary = ~has_bom & (
        F.contains(c, F.lit(b"\x00"))
        | ((F.length(head) > 0) & (nonprint / F.length(head) > 0.30))
    )
    # Invalid-UTF-8 handling (r13 formula review): Spark 4's ANSI-mode
    # decode(_, 'UTF-8') THROWS on malformed bytes, so the old
    # decode-then-scan-for-'�' chain crashed the WHOLE SCAN on the
    # first Latin-1 file instead of falling back — the fallback path
    # was unreachable. The validity test is is_valid_utf8 over the
    # zero-copy binary→string cast (a Spark string is raw bytes; the
    # cast does not validate), and the valid path returns that cast
    # directly — no decode call that can throw, and a document
    # legitimately CONTAINING U+FFFD stays utf-8 (a '�' scan would
    # have silently garbled it via the Latin-1 branch).
    utf8 = c.cast("string")
    utf8_bad = ~F.expr("is_valid_utf8(cast(content as string))")
    # UTF-16 guard: an odd byte length is certainly-truncated UTF-16 —
    # ANSI decode would throw, so route it to the Latin-1 terminal
    # fallback (the reference's Python chain does the same on
    # UnicodeDecodeError). An even-length unpaired-surrogate stream
    # can still throw; that residual matches the reference's behavior
    # of treating a BOM as authoritative.
    even16 = F.length(c) % 2 == 0
    tail8 = F.expr("cast(substring(content, 4) as string)")
    tail8_ok = F.expr("is_valid_utf8(cast(substring(content, 4) as string))")
    decoded = (
        F.when(is16 & even16, F.decode(c, "UTF-16"))  # charset eats the BOM
        .when(is16, F.decode(c, "ISO-8859-1"))
        .when(is8sig & tail8_ok, tail8)
        # invalid tail after a UTF-8 BOM: Latin-1 over ALL bytes,
        # mirroring the reference's next-encoding-in-chain fallback
        .when(is8sig, F.decode(c, "ISO-8859-1"))
        .when(utf8_bad, F.decode(c, "ISO-8859-1"))  # terminal fallback
        .otherwise(utf8)
    )
    return files.withColumn(
        "text", F.when(is_text & ~is_binary & ~is32, decoded)
    ).withColumn(
        "encoding",
        F.when(~is_text | is_binary | is32, F.lit(None).cast("string"))
        .when(is16 & even16, F.lit("utf-16"))
        .when(is16, F.lit("latin-1"))
        .when(is8sig & tail8_ok, F.lit("utf-8-sig"))
        .when(is8sig, F.lit("latin-1"))
        .when(utf8_bad, F.lit("latin-1"))
        .otherwise(F.lit("utf-8")),
    ).withColumn(
        "parse_status",
        F.when(~is_text, F.lit("needs_binary_parser"))
        .when(is32, F.lit("unsupported_encoding:utf-32"))
        .when(is_binary, F.lit("binary_rejected"))
        .otherwise(F.lit("parsed")),
    )


def files_to_documents(files: DataFrame, collection_id: str) -> DataFrame:
    """Shape parsed files into the documents-table contract
    (models.py:333-408): doc row per file keyed by uri, with
    content_hash for change detection."""
    parsed = parse_text(files)
    return parsed.select(
        F.lit(collection_id).alias("collection_id"),
        F.col("uri"),
        F.col("file_name"),
        F.col("extension"),
        F.col("mime_type"),
        F.col("size_bytes"),
        F.col("content_hash"),
        F.col("text"),
        F.col("parse_status"),
        F.current_timestamp().alias("last_seen_at"),
    )
