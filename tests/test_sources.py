"""Local file source (S1/S4/S5): enumerate, filter, hash, decode."""

from __future__ import annotations

import os

import pytest

from semantik_spark.sources.local import enumerate_files, files_to_documents, parse_text


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    (root / "a.txt").write_text("hello world")
    (root / "b.md").write_text("# title\nbody")
    (root / "big.txt").write_text("x" * 10_000)
    (root / "skip.bin").write_bytes(b"\x00\x01\x02")
    (root / ".hidden.txt").write_text("secret")
    sub = root / "sub"
    sub.mkdir()
    (sub / "c.py").write_text("print('hi')")
    hidden_dir = root / ".git"
    hidden_dir.mkdir()
    (hidden_dir / "d.txt").write_text("vcs file")
    return str(root)


def test_enumerate_filters(spark, tree):
    rows = enumerate_files(spark, tree).collect()
    names = sorted(r["file_name"] for r in rows)
    assert names == ["a.txt", "b.md", "big.txt", "c.py"]
    # .hidden.txt, .git/d.txt excluded; skip.bin not in extension set


def test_enumerate_hidden_always_excluded_and_size_cap(spark, tree):
    # Hadoop's listing filters dot-files before Spark sees them — the
    # hidden-skip is structural, matching the reference default
    rows = enumerate_files(spark, tree).collect()
    names = {r["file_name"] for r in rows}
    assert ".hidden.txt" not in names and "d.txt" not in names
    small = enumerate_files(spark, tree, max_size_bytes=100).collect()
    assert "big.txt" not in {r["file_name"] for r in small}
    assert "a.txt" in {r["file_name"] for r in small}


def test_content_hash_and_mime(spark, tree):
    import hashlib

    rows = {r["file_name"]: r for r in enumerate_files(spark, tree).collect()}
    assert rows["a.txt"]["content_hash"] == hashlib.sha256(b"hello world").hexdigest()
    assert rows["a.txt"]["mime_type"] == "text/plain"
    assert rows["b.md"]["mime_type"] == "text/markdown"
    assert rows["a.txt"]["size_bytes"] == 11


def test_parse_text_decodes(spark, tree):
    parsed = {r["file_name"]: r for r in parse_text(enumerate_files(spark, tree)).collect()}
    assert parsed["a.txt"]["text"] == "hello world"
    assert parsed["a.txt"]["parse_status"] == "parsed"
    assert parsed["b.md"]["text"].startswith("# title")


def test_files_to_documents_contract(spark, tree):
    docs = files_to_documents(enumerate_files(spark, tree), "coll1")
    rows = docs.collect()
    assert all(r["collection_id"] == "coll1" for r in rows)
    cols = set(docs.columns)
    assert {"uri", "content_hash", "text", "last_seen_at", "mime_type"} <= cols


def test_parse_text_encoding_chain(spark):
    """BOM-driven decode + binary sniff (reference text.py:13-58)."""
    from semantik_spark.sources.local import parse_text

    rows = [
        ("u8.txt", ".txt", "héllo utf8".encode("utf-8")),
        ("u8sig.txt", ".txt", "﻿héllo sig".encode("utf-8")[0:0] + b"\xef\xbb\xbf" + "héllo sig".encode("utf-8")),
        ("u16le.txt", ".txt", "héllo 16le".encode("utf-16")),  # includes BOM
        ("u16be.txt", ".txt", "﻿héllo 16be".encode("utf-16-be")),
        ("u32.txt", ".txt", "x".encode("utf-32")),
        ("nul.txt", ".txt", b"looks\x00binary"),
        ("hi.txt", ".txt", bytes(range(1, 8)) * 40 + b"ab"),  # >30% non-printable
    ]
    df = spark.createDataFrame(rows, "uri string, extension string, content binary")
    out = {r["uri"]: r for r in parse_text(df).collect()}
    assert out["u8.txt"].text == "héllo utf8" and out["u8.txt"].parse_status == "parsed"
    assert out["u8sig.txt"].text == "héllo sig"
    assert out["u16le.txt"].text == "héllo 16le"
    assert out["u16be.txt"].text == "héllo 16be"
    assert out["u32.txt"].parse_status == "unsupported_encoding:utf-32"
    assert out["u32.txt"].text is None
    assert out["nul.txt"].parse_status == "binary_rejected"
    assert out["hi.txt"].parse_status == "binary_rejected"


def test_parse_text_legit_replacement_char_stays_utf8(spark):
    """r13 formula review: invalid-UTF-8 detection is the encode
    round-trip, not a replacement-char scan — a document legitimately
    CONTAINING U+FFFD (web-crawl text lossily decoded upstream) must
    stay utf-8, not get re-decoded as Latin-1 (which garbles every
    multi-byte char)."""
    from semantik_spark.sources.local import parse_text

    legit = "prefix � héllo"  # valid UTF-8 containing U+FFFD
    rows = [
        ("legit.txt", ".txt", legit.encode("utf-8")),
        ("bad.txt", ".txt", b"caf\xe9 latin1"),  # invalid UTF-8
        # odd-length UTF-16 (truncated): ANSI decode would throw —
        # must degrade to the Latin-1 terminal fallback, not crash
        ("trunc16.txt", ".txt", "héllo".encode("utf-16")[:-1]),
    ]
    df = spark.createDataFrame(rows, "uri string, extension string, content binary")
    out = {r["uri"]: r for r in parse_text(df).collect()}
    assert out["legit.txt"].encoding == "utf-8"
    assert out["legit.txt"].text == legit
    assert out["bad.txt"].encoding == "latin-1"
    assert out["bad.txt"].text == "café latin1"
    assert out["trunc16.txt"].encoding == "latin-1"
    assert out["trunc16.txt"].parse_status == "parsed"
