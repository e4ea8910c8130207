"""Parser registry (S7) + binary-format parsers (S6) + email decode (C11).

Reference parity:
  registry    shared/text_processing/parsers/registry.py:74-215 — maps
              extension → ordered parser candidates with fallback; the
              first parser that succeeds wins.
  unstructured shared/text_processing/parsers/unstructured.py:15-223 —
              15+ binary formats via `unstructured.partition.auto`
              (extensions :39-69, partition call :160-170).
  email       shared/connectors/imap.py:32-62 — MIME header decode
              (RFC 2047 encoded-words), date normalization.

Spark-first shape: the registry compiles to a literal routing column
(`when/otherwise` over the extension — no UDF), and each parser family
is a `mapInPandas` stage applied only to its routed subset, so a PDF
parser never touches a .txt row. The `.eml` parser is REAL (stdlib
`email` package — header decode, multipart walk, text/plain extraction);
the `unstructured`/pypdf family is a documented slot gated behind
import-try because those libs are not in this image.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# extension → ordered parser candidates (registry.py:74-215 semantics:
# try in order, fall through on failure)
PARSER_REGISTRY: dict[str, tuple[str, ...]] = {
    ".txt": ("text",), ".md": ("text",), ".markdown": ("text",),
    ".rst": ("text",), ".py": ("text",), ".js": ("text",),
    ".ts": ("text",), ".java": ("text",), ".json": ("text",),
    ".yaml": ("text",), ".yml": ("text",), ".xml": ("text",),
    ".csv": ("text",), ".html": ("html", "text"),
    ".htm": ("html", "text"),
    ".eml": ("email", "text"), ".msg": ("email",),
    ".pdf": ("unstructured",), ".docx": ("unstructured",),
    ".doc": ("unstructured",), ".pptx": ("unstructured",),
    ".ppt": ("unstructured",), ".xlsx": ("unstructured",),
    ".odt": ("unstructured",), ".epub": ("unstructured",),
}
DEFAULT_CANDIDATES: tuple[str, ...] = ("text",)


def route_parsers(files: DataFrame) -> DataFrame:
    """Adds `parser` (first candidate) and `parser_candidates`
    ARRAY<STRING> columns from the extension — a literal when/otherwise
    chain Catalyst constant-folds; no UDF, no shuffle."""
    cand = F.when(F.lit(False), F.array(F.lit("")))
    first = F.when(F.lit(False), F.lit(""))
    for ext, parsers in PARSER_REGISTRY.items():
        cand = cand.when(F.col("extension") == ext,
                         F.array(*[F.lit(p) for p in parsers]))
        first = first.when(F.col("extension") == ext, F.lit(parsers[0]))
    return files.withColumn(
        "parser_candidates",
        cand.otherwise(F.array(*[F.lit(p) for p in DEFAULT_CANDIDATES])),
    ).withColumn("parser", first.otherwise(F.lit(DEFAULT_CANDIDATES[0])))


# --- email parser (REAL — stdlib) ------------------------------------------

_EMAIL_SCHEMA = (
    "uri string, subject string, from_addr string, to_addr string, "
    "sent_at string, text string, parse_status string"
)


def _decode_header(raw: str | None) -> str:
    """RFC 2047 encoded-word decode (imap.py:32-47)."""
    if not raw:
        return ""
    import email.header

    parts = []
    for chunk, charset in email.header.decode_header(raw):
        if isinstance(chunk, bytes):
            parts.append(chunk.decode(charset or "utf-8", errors="replace"))
        else:
            parts.append(chunk)
    return "".join(parts)


def _eml_to_row(uri: str, raw: bytes) -> dict:
    import email
    import email.policy
    import email.utils

    try:
        msg = email.message_from_bytes(raw, policy=email.policy.default)
        texts: list[str] = []
        for part in msg.walk():
            if part.get_content_type() == "text/plain" and not part.is_multipart():
                payload = part.get_payload(decode=True)
                if payload is not None:
                    cs = part.get_content_charset() or "utf-8"
                    texts.append(payload.decode(cs, errors="replace"))
        sent = msg.get("Date")
        if sent:
            try:  # normalize to ISO-8601 UTC (imap.py:49-62)
                dt = email.utils.parsedate_to_datetime(sent)
                sent = dt.isoformat()
            except (TypeError, ValueError):
                pass
        return {
            "uri": uri,
            "subject": _decode_header(msg.get("Subject")),
            "from_addr": _decode_header(msg.get("From")),
            "to_addr": _decode_header(msg.get("To")),
            "sent_at": sent or "",
            "text": "\n\n".join(texts),
            "parse_status": "parsed",
        }
    except Exception as exc:  # malformed message → dead-letter row
        return {
            "uri": uri, "subject": "", "from_addr": "", "to_addr": "",
            "sent_at": "", "text": "",
            "parse_status": f"error: {type(exc).__name__}",
        }


def parse_email(files: DataFrame) -> DataFrame:
    """S6 email family: mapInPandas over (uri, content) → decoded
    header + body rows. Arrow-batched; one Python pass per partition."""
    src = files.select("uri", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([
                _eml_to_row(u, bytes(c)) for u, c in zip(pdf["uri"], pdf["content"])
            ], columns=["uri", "subject", "from_addr", "to_addr",
                        "sent_at", "text", "parse_status"])

    return src.mapInPandas(run, schema=_EMAIL_SCHEMA)


# --- html parser (REAL — stdlib) -------------------------------------------

_HTML_SCHEMA = "uri string, title string, text string, parse_status string"

_SKIP_TAGS = {"script", "style", "head", "template", "noscript"}
_BLOCK_TAGS = {"p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5",
               "h6", "section", "article", "blockquote", "pre"}


def _html_to_row(uri: str, raw: bytes) -> dict:
    """Text extraction via the stdlib HTMLParser: skip script/style,
    newline on block boundaries, entity decode (the parser handles
    charrefs), <title> captured separately — the text layer the
    reference gets from unstructured.partition for .html
    (unstructured.py:39-69)."""
    from html.parser import HTMLParser

    class Extract(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self.title: list[str] = []
            self._skip = 0
            self._in_title = False

        def handle_starttag(self, tag: str, attrs) -> None:
            if tag in _SKIP_TAGS:
                self._skip += 1
            if tag == "title":
                self._in_title = True
            if tag in _BLOCK_TAGS:
                self.parts.append("\n")

        def handle_endtag(self, tag: str) -> None:
            if tag in _SKIP_TAGS and self._skip:
                self._skip -= 1
            if tag == "title":
                self._in_title = False
            if tag in _BLOCK_TAGS:
                self.parts.append("\n")

        def handle_data(self, data: str) -> None:
            if self._in_title:
                self.title.append(data)
            elif not self._skip:
                self.parts.append(data)

    try:
        p = Extract()
        p.feed(raw.decode("utf-8", errors="replace"))
        p.close()
        text = "\n".join(
            ln.strip() for ln in "".join(p.parts).splitlines() if ln.strip()
        )
        return {"uri": uri, "title": "".join(p.title).strip(),
                "text": text, "parse_status": "ok"}
    except Exception as exc:  # noqa: BLE001 — registry falls through on failure
        return {"uri": uri, "title": "", "text": "",
                "parse_status": f"error: {type(exc).__name__}"}


def parse_html(files: DataFrame) -> DataFrame:
    """S6 html family: mapInPandas over (uri, content) → title + visible
    text rows. Arrow-batched, one Python pass per partition."""
    src = files.select("uri", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([
                _html_to_row(u, bytes(c)) for u, c in zip(pdf["uri"], pdf["content"])
            ], columns=["uri", "title", "text", "parse_status"])

    return src.mapInPandas(run, schema=_HTML_SCHEMA)


# --- unstructured parser (slot — libs not in image) ------------------------

def unstructured_available() -> bool:
    try:
        import unstructured  # noqa: F401

        return True
    except ImportError:
        return False


def parse_unstructured(files: DataFrame) -> DataFrame:
    """S6 slot: pandas-batched `unstructured.partition.auto` over binary
    content (unstructured.py:160-170). The library stack is not in this
    image; the Spark-side plumbing (schema, routing, batch shape) is the
    engine's work and is exercised by `route_parsers` + `parse` tests."""
    if not unstructured_available():
        raise NotImplementedError(
            "unstructured/pypdf not installed in this image; "
            "route_parsers marks these rows parse_status='needs_binary_parser'"
        )
    raise NotImplementedError("real unstructured wiring pending model image")


def parse(files: DataFrame) -> DataFrame:
    """Registry-dispatched parse: text rows decode JVM-side
    (sources.local.parse_text), email rows through the stdlib parser,
    unstructured-family rows pass through flagged for the binary-parser
    slot. Output: uri, extension, text, parse_status, parser."""
    from semantik_spark.sources.local import parse_text

    routed = route_parsers(files)
    text_part = (
        parse_text(routed.where(F.col("parser") == "text"))
        .select("uri", "extension", "text", "parse_status", "parser")
    )
    email_in = routed.where(F.col("parser") == "email")
    email_part = (
        email_in.select("uri", "extension", "parser")
        .join(parse_email(email_in).select("uri", "text", "parse_status"), "uri")
        .select("uri", "extension", "text", "parse_status", "parser")
    )
    html_in = routed.where(F.col("parser") == "html")
    html_part = (
        html_in.select("uri", "extension", "parser")
        .join(parse_html(html_in).select("uri", "text", "parse_status"), "uri")
        .select("uri", "extension", "text", "parse_status", "parser")
    )
    rest = routed.where(~F.col("parser").isin("text", "email", "html")).select(
        "uri", "extension", F.lit(None).cast("string").alias("text"),
        F.lit("needs_binary_parser").alias("parse_status"), "parser",
    )
    return (
        text_part.unionByName(email_part)
        .unionByName(html_part).unionByName(rest)
    )
