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
                 id_col: str = "doc_id", text_col: str = "text",
                 drop_contained_tail: bool = True) -> DataFrame:
    """Sliding fixed-size character windows (stride = size − overlap).

    Pure expression: starts = sequence(0, len-1, stride); content =
    substring. Emits chunk_index, offsets, chars/4 token estimate, and
    total_chunks via a count window — the SQL-expressible core of the
    reference's character strategy.

    NULL/empty documents emit ZERO chunks (matching every mapInPandas
    kernel in this module; Spark's NULL-skipping greatest would
    otherwise mint a phantom chunk claiming chunk_size covered chars
    for a NULL doc — and DuckDB's NULL-propagating greatest would emit
    nothing, a latent cross-engine split).

    ``drop_contained_tail=True`` (the default since round 11, per the
    pre-wired flip plan) suppresses a final chunk whose span is fully
    inside the previous one (doc tail past the last stride boundary
    <= overlap: zero new content, duplicated embedding and storage
    downstream). The five registered queries built on this operator
    rotated into the round-11 driver window under the new semantics;
    their oracle twins mirror the same start-filter.
    """
    if overlap >= chunk_size:
        # stride <= 0 would make F.sequence abort mid-job ("step must
        # not be zero" / negative-step error) — fail at plan time
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_size "
            f"({chunk_size})")
    stride = chunk_size - overlap
    t = F.col(text_col)
    starts = F.sequence(F.lit(0), F.greatest(F.length(t) - 1, F.lit(0)), F.lit(stride))
    ex = docs.where(F.length(t) > 0).select(
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
    if drop_contained_tail:
        # a start past 0 whose chunk ends within the previous chunk's
        # coverage (start + overlap >= end_offset, i.e. the doc tail
        # past the last stride boundary is <= overlap) adds no new
        # content; only the LAST start can satisfy this, so
        # chunk_index stays contiguous after the filter
        ex = ex.where((F.col("start_offset") == 0)
                      | (F.col("start_offset") + F.lit(overlap)
                         < F.col("end_offset")))
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


_RECURSIVE_SEPARATORS = ["\n\n\n", "\n\n", "\n", ". ", "! ", "? ", "; ", ", ", " "]


def recursive_chunk_spans(text: str, chunk_size: int = DEFAULT_CHUNK_SIZE) -> list[tuple[int, int]]:
    """K2 recursive strategy kernel, flat formulation: (start, len)
    spans of the final chunks.

    Semantics (recursive_strategy.py:63-74,423-517, reformulated):
      1. descend the separator hierarchy level by level, splitting only
         pieces over budget (separator kept attached to the left part);
      2. hard-slice anything still over budget after the last level
         (the reference's "" separator);
      3. one greedy left-to-right merge of adjacent pieces up to budget.
    The single final merge (vs the reference's per-level merge) is the
    one deviation; it makes the algorithm level-iterative instead of
    nested-recursive, which is what lets BOTH the Spark kernel and the
    DuckDB oracle (oracles.q_chunk_recursive: unrolled level CTEs + a
    recursive merge CTE) express it exactly. Chunks are contiguous,
    in order, lossless, and ≤ chunk_size.
    """
    if not text:
        return []
    pieces = [(0, len(text))]
    for sep in _RECURSIVE_SEPARATORS:
        out: list[tuple[int, int]] = []
        for off, ln in pieces:
            if ln <= chunk_size:
                out.append((off, ln))
                continue
            parts = text[off:off + ln].split(sep)
            if len(parts) == 1:
                out.append((off, ln))
                continue
            o = off
            for j, part in enumerate(parts):
                fl = len(part) + (len(sep) if j < len(parts) - 1 else 0)
                if fl:
                    out.append((o, fl))
                o += fl
        pieces = out
    out = []
    for off, ln in pieces:
        if ln <= chunk_size:
            out.append((off, ln))
        else:
            out += [(off + i, min(chunk_size, ln - i)) for i in range(0, ln, chunk_size)]
    pieces = out
    chunks: list[tuple[int, int]] = []
    cs, cl = pieces[0]
    for off, ln in pieces[1:]:
        if cl + ln <= chunk_size:
            cl += ln
        else:
            chunks.append((cs, cl))
            cs, cl = off, ln
    chunks.append((cs, cl))
    return chunks


def recursive_chunk_doc(text: str, chunk_size: int = DEFAULT_CHUNK_SIZE) -> list[dict[str, Any]]:
    """Chunk-dict form of recursive_chunk_spans (offsets exact, not
    re-derived by substring search)."""
    return [
        {
            "chunk_index": i,
            "content": text[s:s + ln],
            "start_offset": s,
            "end_offset": s + ln,
            "token_count": (ln + 3) // 4,
        }
        for i, (s, ln) in enumerate(recursive_chunk_spans(text, chunk_size))
    ]


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
            for s, ln in recursive_chunk_spans(content, chunk_size):
                out.append({"content": content[s:s + ln], "breadcrumb": crumb})
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


_SENTENCE_SPLIT_MARKS = (". ", "! ", "? ", "\n")


def _split_sentences(text: str) -> list[dict[str, Any]]:
    """Sentence segmentation with offsets (semantic_strategy.py:520-565
    behavior: split on terminal punctuation + newline)."""
    out: list[dict[str, Any]] = []
    start = 0
    i = 0
    n = len(text)
    while i < n:
        hit = None
        for mark in _SENTENCE_SPLIT_MARKS:
            if text.startswith(mark, i):
                hit = mark
                break
        if hit:
            end = i + len(hit)
            seg = text[start:end]
            if seg.strip():
                out.append({"text": seg, "start_offset": start, "end_offset": end})
            start = end
            i = end
        else:
            i += 1
    if start < n and text[start:].strip():
        out.append({"text": text[start:], "start_offset": start, "end_offset": n})
    return out


def _word_jaccard(a: str, b: str) -> float:
    """Word-overlap similarity (semantic_strategy.py:703-728 — the
    deterministic Jaccard placeholder for the embedding splitter)."""
    wa, wb = set(a.lower().split()), set(b.lower().split())
    if not wa or not wb:
        return 0.0
    return len(wa & wb) / len(wa | wb)


def semantic_chunk_doc(text: str, chunk_size: int = DEFAULT_CHUNK_SIZE,
                       similarity_threshold: float = 0.3) -> list[dict[str, Any]]:
    """K4 semantic strategy kernel: sentences → greedy clustering while
    adjacent similarity ≥ threshold and budget holds
    (semantic_strategy.py:566-701); oversized sentences hard-split by
    words; small trailing clusters merge back (:730-790)."""
    sentences = _split_sentences(text)
    if not sentences:
        return []
    clusters: list[list[dict[str, Any]]] = []
    cur: list[dict[str, Any]] = []
    cur_len = 0
    for s in sentences:
        s_len = len(s["text"])
        if s_len > chunk_size:  # oversized sentence: flush + word-split
            if cur:
                clusters.append(cur)
                cur, cur_len = [], 0
            words = s["text"].split(" ")
            buf: list[str] = []
            off = s["start_offset"]
            for w in words:
                cand = (" ".join(buf + [w])) if buf else w
                if len(cand) > chunk_size and buf:
                    seg = " ".join(buf)
                    clusters.append([{"text": seg, "start_offset": off,
                                      "end_offset": off + len(seg)}])
                    off += len(seg) + 1
                    buf = [w]
                else:
                    buf.append(w)
            if buf:
                seg = " ".join(buf)
                clusters.append([{"text": seg, "start_offset": off,
                                  "end_offset": s["end_offset"]}])
            continue
        if not cur:
            cur, cur_len = [s], s_len
            continue
        sim = _word_jaccard(cur[-1]["text"], s["text"])
        if sim >= similarity_threshold and cur_len + s_len <= chunk_size:
            cur.append(s)
            cur_len += s_len
        else:
            clusters.append(cur)
            cur, cur_len = [s], s_len
    if cur:
        clusters.append(cur)
    # merge small adjacent clusters up to budget (min cluster ~10% budget)
    min_len = max(1, chunk_size // 10)
    merged: list[list[dict[str, Any]]] = []
    for cl in clusters:
        cl_len = sum(len(s["text"]) for s in cl)
        if merged:
            prev_len = sum(len(s["text"]) for s in merged[-1])
            if (cl_len < min_len or prev_len < min_len) and prev_len + cl_len <= chunk_size:
                merged[-1].extend(cl)
                continue
        merged.append(cl)
    out = []
    for i, cl in enumerate(merged):
        start, end = cl[0]["start_offset"], cl[-1]["end_offset"]
        content = text[start:end]
        out.append({
            "chunk_index": i, "content": content,
            "start_offset": start, "end_offset": end,
            "token_count": (len(content) + 3) // 4,
        })
    return out


def hierarchical_chunk_doc(text: str, chunk_size: int = DEFAULT_CHUNK_SIZE,
                           levels: int = 2) -> list[dict[str, Any]]:
    """K5 hierarchical strategy kernel: level-0 parents at full budget,
    each deeper level at budget/2^level (floor 200 chars ≈ 50 tokens,
    hierarchical_strategy.py:396-428), children linked to the parent
    whose span contains them. Rows carry level + parent_index."""
    out: list[dict[str, Any]] = []
    parents = character_chunk_doc(text, chunk_size=chunk_size, overlap=0)
    idx = 0
    parent_ids: list[tuple[int, int, int]] = []  # (chunk_index, start, end)
    for p in parents:
        p2 = dict(p, chunk_index=idx, level=0, parent_index=-1)
        parent_ids.append((idx, p["start_offset"], p["end_offset"]))
        out.append(p2)
        idx += 1
    for level in range(1, levels):
        size = max(200, chunk_size // (2 ** level))
        prev_level_ids = [(i, s, e) for (i, s, e) in parent_ids]
        for (pi, ps, pe) in prev_level_ids:
            seg = text[ps:pe]
            for c in character_chunk_doc(seg, chunk_size=size, overlap=0):
                out.append({
                    "chunk_index": idx,
                    "content": c["content"],
                    "start_offset": ps + c["start_offset"],
                    "end_offset": ps + c["end_offset"],
                    "token_count": c["token_count"],
                    "level": level,
                    "parent_index": pi,
                })
                idx += 1
        # next level nests under this level's chunks
        parent_ids = [(r["chunk_index"], r["start_offset"], r["end_offset"])
                      for r in out if r.get("level") == level]
    return out


_CODE_FENCE = "```"


def analyze_content(text: str) -> dict[str, Any]:
    """K6 content analysis (hybrid_strategy.py:197-315): markdown
    headers, code fences, structure ratio, avg sentence length."""
    lines = text.split("\n")
    n_lines = max(1, len(lines))
    header_lines = sum(1 for ln in lines if ln.lstrip().startswith("#"))
    list_lines = sum(1 for ln in lines if ln.lstrip()[:2] in ("- ", "* ", "1."))
    has_markdown = header_lines >= 2 or (header_lines >= 1 and list_lines >= 2)
    has_code = text.count(_CODE_FENCE) >= 2
    structure_ratio = (header_lines + list_lines) / n_lines
    sentences = _split_sentences(text)
    avg_sentence_len = (sum(len(s["text"]) for s in sentences) / len(sentences)) if sentences else 0.0
    return {
        "has_markdown": has_markdown,
        "has_code": has_code,
        "structure_ratio": structure_ratio,
        "avg_sentence_len": avg_sentence_len,
    }


def hybrid_chunk_doc(text: str, chunk_size: int = DEFAULT_CHUNK_SIZE,
                     overlap: int = DEFAULT_CHUNK_OVERLAP) -> list[dict[str, Any]]:
    """K6 hybrid strategy kernel: analyze → route (markdown/code →
    markdown strategy; narrative (long sentences) → semantic; else
    character), per hybrid_strategy.py:316-383's strategy map. Each
    chunk row records the routed strategy."""
    a = analyze_content(text)
    if a["has_markdown"] or a["has_code"]:
        routed = "markdown"
        chunks = markdown_chunk_doc(text, chunk_size=chunk_size)
        # markdown kernel has no offsets; leave -1 sentinels
        for c in chunks:
            c.setdefault("start_offset", -1)
            c.setdefault("end_offset", -1)
            c.pop("breadcrumb", None)
    elif a["avg_sentence_len"] > 50:
        routed = "semantic"
        chunks = semantic_chunk_doc(text, chunk_size=chunk_size)
    else:
        routed = "character"
        chunks = character_chunk_doc(text, chunk_size=chunk_size, overlap=overlap)
    for c in chunks:
        c["strategy"] = routed
    return chunks


def _strategy_to_df(docs: DataFrame, kernel, id_col: str, text_col: str,
                    extra_cols: list[tuple[str, str, Any]] | None = None,
                    **kw) -> DataFrame:
    """Run a per-document kernel via mapInPandas, emitting CHUNK_SCHEMA
    (+ optional extra columns as (name, sql_type, default) triples)."""
    extra = extra_cols or []
    schema = CHUNK_SCHEMA + "".join(f", {n} {t}" for n, t, _ in extra)
    base_cols = ["doc_id", "chunk_index", "content",
                 "start_offset", "end_offset", "token_count"]
    all_cols = base_cols + [n for n, _, _ in extra]

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
                    row = {
                        "doc_id": str(doc_id),
                        "chunk_index": c["chunk_index"],
                        "content": c["content"],
                        "start_offset": c.get("start_offset", -1),
                        "end_offset": c.get("end_offset", -1),
                        "token_count": c["token_count"],
                    }
                    for n, _, default in extra:
                        row[n] = c.get(n, default)
                    rows.append(row)
            yield pd.DataFrame(rows, columns=all_cols)

    prepared = docs.select(
        F.col(id_col).cast("string").alias("_id"), F.col(text_col).alias("_text")
    )
    out = prepared.mapInPandas(run, schema)
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


def semantic_chunks(docs: DataFrame, chunk_size: int = DEFAULT_CHUNK_SIZE,
                    similarity_threshold: float = 0.3,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return _strategy_to_df(docs, semantic_chunk_doc, id_col, text_col,
                           chunk_size=chunk_size,
                           similarity_threshold=similarity_threshold)


def hierarchical_chunks(docs: DataFrame, chunk_size: int = DEFAULT_CHUNK_SIZE,
                        levels: int = 2,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Multi-level chunks with parent linkage: extra columns
    level INT, parent_index INT (-1 for roots); parent_chunk_id derived."""
    out = _strategy_to_df(
        docs, hierarchical_chunk_doc, id_col, text_col,
        extra_cols=[("level", "int", 0), ("parent_index", "int", -1)],
        chunk_size=chunk_size, levels=levels,
    )
    return out.withColumn(
        "parent_chunk_id",
        F.when(F.col("parent_index") >= 0,
               F.concat_ws("#", "doc_id", "parent_index")),
    )


def hybrid_chunks(docs: DataFrame, chunk_size: int = DEFAULT_CHUNK_SIZE,
                  overlap: int = DEFAULT_CHUNK_OVERLAP,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content-routed chunking; extra column strategy STRING records the
    route taken (markdown|semantic|character)."""
    return _strategy_to_df(
        docs, hybrid_chunk_doc, id_col, text_col,
        extra_cols=[("strategy", "string", "character")],
        chunk_size=chunk_size, overlap=overlap,
    )


def content_defined_chunks(docs: DataFrame, window: int = 16,
                           modulus: int = 64, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/restic family): a
    chunk boundary falls AFTER position i iff the rolling fingerprint
    of the trailing ``window`` chars satisfies hash % modulus == 0 —
    so boundaries move WITH the content. Insert a sentence into a doc
    and only the chunks overlapping the edit change; fixed-size
    chunking would shift every later boundary and re-embed/re-store
    the whole tail. Expected chunk length ≈ ``modulus`` chars.

    doc_id, chunk_index, chunk_start (1-based), chunk_text — every
    char of the doc lands in exactly one chunk; docs shorter than
    ``window`` are a single chunk.

    Shape: the anchor scan materializes one row per character
    position (explode + substring + hash — all Catalyst expressions,
    whole-stage-codegen'd, embarrassingly parallel), then one window
    pass per doc to pair consecutive anchors into spans. The
    position-explosion form IS the replayable spec; the production
    100 TB pass is ``content_defined_chunks_scan`` — a fused
    mapInPandas scan with no row amplification whose rule='md5' mode
    reproduces these boundaries exactly (equality test-pinned) and
    whose rule='gear' mode is the O(1)-per-char gear-hash family
    production stores deploy (different hash → different boundaries;
    same expected chunk length).
    """
    from semantik_spark.functions.hashing import hash60
    from semantik_spark.functions.parallel import spread

    # the anchor scan below costs one md5 per character position — for
    # a single-file input (one scan task) the whole corpus would hash
    # on one core; spread() unlocks an N-way stage and is a no-op once
    # the scan already carries >= cores partitions (production scale)
    d = spread(docs.select(F.col(id_col).alias("doc_id"),
                           F.col(text_col).alias("text"),
                           F.length(text_col).alias("len")), "doc_id")
    anch = (
        d.where(F.col("len") >= window)
        .select("doc_id", "text", "len",
                F.explode(F.sequence(F.lit(window), F.col("len"))).alias("i"))
        .where(F.pmod(
            hash60(F.expr(f"substring(text, i - {window - 1}, {window})")),
            F.lit(modulus)) == 0)
        .select("doc_id", "i")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    spans = anch.select(
        "doc_id",
        (F.coalesce(F.lag("i").over(w), F.lit(0)) + 1).alias("s"),
        F.col("i").alias("e"),
    )
    last = (
        d.join(anch.groupBy("doc_id").agg(F.max("i").alias("mx")),
               "doc_id", "left")
        .where(F.coalesce(F.col("mx"), F.lit(0)) < F.col("len"))
        .select("doc_id", (F.coalesce(F.col("mx"), F.lit(0)) + 1).alias("s"),
                F.col("len").alias("e"))
    )
    wc = Window.partitionBy("doc_id").orderBy("s")
    return (
        spans.unionByName(last)
        .join(d.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            (F.row_number().over(wc) - 1).alias("chunk_index"),
            F.col("s").alias("chunk_start"),
            F.expr("substring(text, s, e - s + 1)").alias("chunk_text"),
        )
    )


def cdc_dedup_stats(docs: DataFrame, window: int = 16, modulus: int = 64,
                    id_col: str = "doc_id", text_col: str = "text",
                    source_col: str = "source") -> DataFrame:
    """Chunk-level dedup yield of content-defined chunking, per
    source: how much of the corpus is re-used byte ranges (boilerplate
    headers, shared passages, mirrored docs) that a CDC-addressed
    store (restic/borg/casync style) would store once.

    source, total_chunks, distinct_chunks, cross_doc_chunks (chunk
    contents seen in >1 document of the source), dup_frac
    (1 - distinct/total), avg_chunk_len (6 dp).
    """
    chunks = content_defined_chunks(docs, window, modulus, id_col, text_col) \
        .join(docs.select(F.col(id_col).alias("doc_id"),
                          F.col(source_col).alias("source")), "doc_id")
    per_chunk = chunks.groupBy("source", "chunk_text").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs_seen"),
        F.sum(F.length("chunk_text")).alias("bytes_occ"),
    )
    return per_chunk.groupBy("source").agg(
        F.sum("n_occ").cast("bigint").alias("total_chunks"),
        F.count("*").cast("bigint").alias("distinct_chunks"),
        F.sum(F.when(F.col("n_docs_seen") > 1, 1).otherwise(0))
         .cast("bigint").alias("cross_doc_chunks"),
        F.round(F.lit(1.0) - F.count("*") / F.sum("n_occ"), 6).alias("dup_frac"),
        F.round(F.sum("bytes_occ") / F.sum("n_occ"), 6).alias("avg_chunk_len"),
    )


def _gear_table() -> list[int]:
    """256-entry gear table seeded from md5('gear:<byte>') — the
    deterministic instance of the gear-hash family (Xia et al. 2016,
    FastCDC; the gear rolling hash of Zhang et al.'s Ddelta). Public
    construction, no randomness to replay."""
    import hashlib

    return [
        int(hashlib.md5(f"gear:{b}".encode()).hexdigest()[:15], 16)
        for b in range(256)
    ]


def content_defined_chunks_scan(docs: DataFrame, window: int = 16,
                                modulus: int = 64, rule: str = "md5",
                                id_col: str = "doc_id",
                                text_col: str = "text") -> DataFrame:
    """The PRODUCTION form of content_defined_chunks (VERDICT r6 item
    6): one mapInPandas pass per document — no per-character row
    explosion, no anchor shuffle, no per-doc window exchange. Arrow
    batches stream through the Python kernel and each doc's chunks are
    emitted from a single in-memory scan, so the cost is O(doc bytes)
    work and O(chunks) output rows instead of the spec form's
    O(doc chars) intermediate rows + two shuffles.

    ``rule``:
      "md5"   the SPEC rule — a boundary falls after position i iff
              hash60 of the trailing ``window`` chars ≡ 0 (mod
              ``modulus``), exactly content_defined_chunks' anchor
              test; boundary equality with the Column-expression form
              is pinned in tests/test_chunking_advanced.py. One md5
              per position (C-speed hashlib), executor-local.
      "gear"  the O(1)-per-char rolling gear hash production
              deployments use (FastCDC's base rule): h = (h << 1 +
              GEAR[char]) masked to 60 bits, boundary after i ≥
              window iff h ≡ 0 (mod modulus). DIFFERENT boundaries
              than "md5" (a different hash family — chunk-coverage
              and edit-locality invariants are pinned instead);
              expected chunk length ≈ modulus chars, same as the spec
              rule, so stats are comparable.

    Output matches content_defined_chunks: doc_id, chunk_index,
    chunk_start (1-based), chunk_text; docs shorter than ``window``
    are one chunk.
    """
    if rule not in ("md5", "gear"):
        raise ValueError(f"content_defined_chunks_scan: unknown rule {rule!r}")
    import hashlib

    gear = _gear_table() if rule == "gear" else None
    mask60 = (1 << 60) - 1

    def anchors_md5(text: str) -> list[int]:
        out = []
        for i in range(window, len(text) + 1):
            h = int(hashlib.md5(
                text[i - window:i].encode("utf-8")).hexdigest()[:15], 16)
            if h % modulus == 0:
                out.append(i)
        return out

    def anchors_gear(text: str) -> list[int]:
        out = []
        h = 0
        for i, ch in enumerate(text, start=1):
            h = ((h << 1) + gear[ord(ch) & 0xFF]) & mask60
            if i >= window and h % modulus == 0:
                out.append(i)
        return out

    anchor_fn = anchors_md5 if rule == "md5" else anchors_gear

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                text = text or ""
                if not text:  # spec form emits no row for empty docs
                    continue
                cuts = anchor_fn(text) if len(text) >= window else []
                if not cuts or cuts[-1] < len(text):
                    cuts = cuts + [len(text)]
                start = 1
                for idx, e in enumerate(cuts):
                    rows.append({"doc_id": did, "chunk_index": idx,
                                 "chunk_start": start,
                                 "chunk_text": text[start - 1:e]})
                    start = e + 1
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_index", "chunk_start",
                               "chunk_text"])

    # keep the caller's id type (the documented parity with the spec
    # form content_defined_chunks): a hard bigint cast aborts under
    # ANSI for string ids and changes the output schema vs the twin
    id_type = docs.schema[id_col].dataType.simpleString()
    from semantik_spark.functions.parallel import spread

    # the Python kernel is O(doc chars) per row — spread a single-task
    # scan across the session's cores (no-op at production partition
    # counts); only (doc_id, text) crosses the Python boundary
    d = spread(docs.select(F.col(id_col).alias("doc_id"),
                           F.col(text_col).alias("text")), "doc_id")
    return d.mapInPandas(
        run,
        f"doc_id {id_type}, chunk_index int, chunk_start int, "
        f"chunk_text string",
    )
