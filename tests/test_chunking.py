"""Chunking invariants mirroring the reference's performance/contract
tests (tests/performance/test_chunking_large_documents.py:13-28 — every
chunk within size cap, offsets monotone, full coverage)."""

from __future__ import annotations

from semantik_spark.operators.chunking import (
    character_chunk_doc,
    character_chunks,
    fixed_chunks,
    markdown_chunk_doc,
    markdown_chunks,
    recursive_chunk_doc,
    recursive_chunks,
)

LOREM = (
    "Spark builds a logical plan first. The optimizer rewrites it! "
    "Then Tungsten generates code? Yes, whole-stage codegen. "
) * 40  # ~4.6 KB


def test_fixed_chunks_offsets_and_coverage(spark):
    df = spark.createDataFrame([(1, LOREM)], ["doc_id", "text"])
    rows = sorted(fixed_chunks(df, chunk_size=200, overlap=50).collect(),
                  key=lambda r: r["chunk_index"])
    assert rows[0]["start_offset"] == 0
    assert rows[-1]["end_offset"] == len(LOREM)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["start_offset"] == prev["start_offset"] + 150  # stride
        assert cur["chunk_index"] == prev["chunk_index"] + 1
    assert all(r["total_chunks"] == len(rows) for r in rows)
    assert all(len(r["content"]) <= 200 for r in rows)
    # content matches the offsets it claims
    for r in rows:
        assert r["content"] == LOREM[r["start_offset"]:r["end_offset"]]


def test_character_kernel_boundaries_and_coverage():
    chunks = character_chunk_doc(LOREM, chunk_size=300, overlap=60)
    assert chunks[0]["start_offset"] == 0
    assert chunks[-1]["end_offset"] == len(LOREM)
    for c in chunks:
        assert 0 < len(c["content"]) <= 300
        assert c["content"] == LOREM[c["start_offset"]:c["end_offset"]]
    # consecutive chunks overlap, never gap (full coverage)
    for prev, cur in zip(chunks, chunks[1:]):
        assert cur["start_offset"] <= prev["end_offset"]
        assert cur["start_offset"] > prev["start_offset"]
    # non-final cuts land after sentence/word boundaries (snap window 50)
    for c in chunks[:-1]:
        assert LOREM[c["end_offset"] - 1] in ".!? " or LOREM[c["end_offset"] - 2:c["end_offset"]] in (". ", "! ", "? ")


def test_character_chunks_dataframe(spark):
    df = spark.createDataFrame([(7, LOREM), (8, "short doc")], ["doc_id", "text"])
    rows = character_chunks(df, chunk_size=300, overlap=60).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc["8"]) == 1 and by_doc["8"][0]["content"] == "short doc"
    ordered = sorted(by_doc["7"], key=lambda r: r["chunk_index"])
    assert [r["chunk_index"] for r in ordered] == list(range(len(ordered)))
    assert all(r["chunk_id"] == f"{r['doc_id']}#{r['chunk_index']}" for r in rows)


def test_recursive_kernel_respects_budget_and_order():
    text = "para one.\n\npara two is a bit longer here.\n\n" + "x" * 500 + "\n\nlast para."
    chunks = recursive_chunk_doc(text, chunk_size=120)
    assert all(len(c["content"]) <= 120 for c in chunks)
    assert "".join(c["content"] for c in chunks) == text  # lossless in-order reassembly
    assert all(c["content"] == text[c["start_offset"]:c["end_offset"]] for c in chunks)


def test_recursive_chunks_dataframe(spark):
    df = spark.createDataFrame([(1, "a. " * 200)], ["doc_id", "text"])
    rows = recursive_chunks(df, chunk_size=100).collect()
    assert all(r["token_count"] >= 1 for r in rows)
    assert len(rows) > 1


def test_markdown_kernel_breadcrumbs():
    md = "# Title\nintro text\n## Section A\nbody a\n## Section B\nbody b\n### Deep\ndeep body"
    chunks = markdown_chunk_doc(md, chunk_size=60)
    crumbs = [c["breadcrumb"] for c in chunks]
    assert any("Title" in c for c in crumbs)
    assert any("Title > Section B > Deep" == c for c in crumbs)
    # grouped under budget
    assert all(len(c["content"]) <= 120 for c in chunks)  # budget + one block


def test_markdown_chunks_dataframe(spark):
    md = "# H\n" + "text line\n" * 50
    df = spark.createDataFrame([(1, md)], ["doc_id", "text"])
    rows = markdown_chunks(df, chunk_size=200).collect()
    assert len(rows) >= 2
    assert all(r["total_chunks"] == len(rows) for r in rows)


def test_empty_doc_yields_no_chunks(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    assert character_chunks(df).count() == 0
    assert recursive_chunks(df).count() == 0


def test_fixed_chunks_degenerate_docs_and_tail_mode(spark):
    """NULL/empty docs emit zero chunks (no phantom chunk_size-wide
    chunk); overlap >= chunk_size fails at plan time; and
    drop_contained_tail suppresses a final chunk fully inside the
    previous one while leaving genuinely-new tails alone."""
    import pytest as _pytest

    from semantik_spark.operators.chunking import fixed_chunks

    docs = spark.createDataFrame(
        [(1, "x" * 160),   # tail [150,160) inside chunk 0's [0,160)
         (2, "x" * 210),   # tail [150,210) has new content [200,210)
         (3, None),
         (4, "")],
        "doc_id long, text string")
    base = fixed_chunks(docs, drop_contained_tail=False)
    counts = {r["doc_id"]: r["total_chunks"]
              for r in base.select("doc_id", "total_chunks")
              .distinct().collect()}
    assert "3" not in counts and "4" not in counts   # zero chunks
    assert counts["1"] == 2 and counts["2"] == 2     # opt-out keeps tail

    trimmed = fixed_chunks(docs)   # default drops the contained tail (r11 flip)
    tcounts = {r["doc_id"]: r["total_chunks"]
               for r in trimmed.select("doc_id", "total_chunks")
               .distinct().collect()}
    assert tcounts["1"] == 1     # contained tail dropped
    assert tcounts["2"] == 2     # new-content tail kept

    with _pytest.raises(ValueError, match="overlap"):
        fixed_chunks(docs, chunk_size=100, overlap=100)
