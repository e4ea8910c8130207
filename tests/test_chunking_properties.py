"""Property-based invariants for the chunking kernels (hypothesis).

The reference pins chunking behavior with invariant tests over large
generated documents (tests/performance/test_chunking_large_documents.py);
these are the same floor, but adversarial: arbitrary unicode-ish text
with punctuation, newlines and degenerate whitespace. Pure-Python
kernel tests — no Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from semantik_spark.operators.chunking import (
    character_chunk_doc,
    hierarchical_chunk_doc,
    markdown_chunk_doc,
    recursive_chunk_spans,
    semantic_chunk_doc,
)

TEXT = st.text(
    alphabet=st.sampled_from(list("abcdef ?!.,;\n#-*XY")), min_size=0, max_size=600
)


@settings(max_examples=200, deadline=None)
@given(TEXT, st.integers(min_value=20, max_value=120))
def test_recursive_spans_are_a_lossless_partition(text, size):
    spans = recursive_chunk_spans(text, chunk_size=size)
    if not text:
        assert spans == []
        return
    assert spans[0][0] == 0
    pos = 0
    for off, ln in spans:
        assert off == pos and ln >= 1 and ln <= size
        pos += ln
    assert pos == len(text)


@settings(max_examples=200, deadline=None)
@given(TEXT, st.integers(min_value=30, max_value=120))
def test_character_chunks_cover_and_progress(text, size):
    chunks = character_chunk_doc(text, chunk_size=size, overlap=size // 4)
    if not text:
        assert chunks == []
        return
    assert chunks[0]["start_offset"] == 0
    assert chunks[-1]["end_offset"] == len(text)
    prev_start, prev_end = -1, 0
    for c in chunks:
        s, e = c["start_offset"], c["end_offset"]
        assert 0 <= s < e <= len(text)
        assert c["content"] == text[s:e]
        assert e - s <= size
        assert s > prev_start           # strict progress: no infinite loops
        assert s <= prev_end            # overlap never skips text
        prev_start, prev_end = s, e
        assert c["token_count"] == (len(c["content"]) + 3) // 4


@settings(max_examples=150, deadline=None)
@given(TEXT, st.integers(min_value=30, max_value=120))
def test_markdown_chunks_respect_budget(text, size):
    chunks = markdown_chunk_doc(text, chunk_size=size)
    for i, c in enumerate(chunks):
        assert c["chunk_index"] == i
        assert 1 <= len(c["content"]) <= size
        assert c["token_count"] == (len(c["content"]) + 3) // 4


@settings(max_examples=150, deadline=None)
@given(TEXT, st.integers(min_value=30, max_value=120))
def test_semantic_chunks_are_ordered_substrings(text, size):
    chunks = semantic_chunk_doc(text, chunk_size=size)
    prev_end = 0
    for i, c in enumerate(chunks):
        s, e = c["start_offset"], c["end_offset"]
        assert c["chunk_index"] == i
        assert 0 <= s < e <= len(text)
        assert c["content"] == text[s:e]
        assert s >= prev_end            # clusters never overlap or reorder
        prev_end = e


@settings(max_examples=100, deadline=None)
@given(TEXT, st.integers(min_value=60, max_value=200))
def test_hierarchical_children_nest_inside_parents(text, size):
    rows = hierarchical_chunk_doc(text, chunk_size=size, levels=2)
    parents = {r["chunk_index"]: r for r in rows if r["level"] == 0}
    for r in rows:
        assert r["content"] == text[r["start_offset"]:r["end_offset"]]
        if r["level"] == 1:
            p = parents[r["parent_index"]]
            assert p["start_offset"] <= r["start_offset"]
            assert r["end_offset"] <= p["end_offset"]
