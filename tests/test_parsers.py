"""Parser registry (S7) + email parser (S6/C11) tests."""

from __future__ import annotations

import pytest

from semantik_spark.sources.local import enumerate_files
from semantik_spark.sources.parsers import parse, parse_email, route_parsers

EML = b"""\
From: =?utf-8?b?SsO8cmdlbg==?= <j@example.com>\r
To: Alice <alice@example.com>\r
Subject: =?utf-8?q?Caf=C3=A9_meeting?=\r
Date: Mon, 10 Aug 2026 12:30:00 +0000\r
MIME-Version: 1.0\r
Content-Type: multipart/alternative; boundary="B"\r
\r
--B\r
Content-Type: text/plain; charset="utf-8"\r
Content-Transfer-Encoding: 8bit\r
\r
Hello from the caf\xc3\xa9.\r
--B\r
Content-Type: text/html; charset="utf-8"\r
\r
<p>Hello from the caf&eacute;.</p>\r
--B--\r
"""


@pytest.fixture(scope="module")
def mail_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("mail")
    (root / "m1.eml").write_bytes(EML)
    (root / "note.txt").write_text("plain note")
    (root / "deck.pdf").write_bytes(b"%PDF-1.4 fake")
    return str(root)


def test_route_parsers(spark, mail_tree):
    routed = {r.file_name: r for r in
              route_parsers(enumerate_files(spark, mail_tree)).collect()}
    assert routed["m1.eml"].parser == "email"
    assert list(routed["m1.eml"].parser_candidates) == ["email", "text"]
    assert routed["note.txt"].parser == "text"
    assert routed["deck.pdf"].parser == "unstructured"


def test_parse_email_headers_and_body(spark, mail_tree):
    files = enumerate_files(spark, mail_tree).where("extension = '.eml'")
    row = parse_email(files).collect()[0]
    assert row.subject == "Café meeting"
    assert "Jürgen" in row.from_addr
    assert row.sent_at.startswith("2026-08-10T12:30:00")
    assert row.text.strip() == "Hello from the café."
    assert "<p>" not in row.text  # html alternative not selected
    assert row.parse_status == "parsed"


def test_parse_dispatch(spark, mail_tree):
    out = {r.uri.rsplit("/", 1)[-1]: r for r in
           parse(enumerate_files(spark, mail_tree)).collect()}
    assert out["note.txt"].text == "plain note"
    assert out["note.txt"].parse_status == "parsed"
    assert out["m1.eml"].parse_status == "parsed"
    assert "café" in out["m1.eml"].text
    assert out["deck.pdf"].parse_status == "needs_binary_parser"
    assert out["deck.pdf"].text is None


def test_malformed_email_dead_letters(spark, tmp_path):
    (tmp_path / "bad.eml").write_bytes(b"\xff\xfe not an email at all")
    files = enumerate_files(spark, str(tmp_path))
    row = parse_email(files).collect()[0]
    # stdlib parser is lenient: worst case empty text, never a crash
    assert row.parse_status.startswith(("parsed", "error"))


def test_parse_html_extracts_visible_text(spark):
    from semantik_spark.sources.parsers import parse_html

    html = b"""<html><head><title>My Doc</title>
    <style>body { color: red }</style>
    <script>var x = 1;</script></head>
    <body><h1>Header</h1><p>First &amp; second.</p>
    <div>Nested <b>bold</b> text</div></body></html>"""
    files = spark.createDataFrame([("a.html", html)], "uri string, content binary")
    rows = parse_html(files).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["parse_status"] == "ok"
    assert r["title"] == "My Doc"
    assert "Header" in r["text"]
    assert "First & second." in r["text"]       # entity decoded
    assert "Nested bold text" in r["text"].replace("\n", " ")
    assert "color: red" not in r["text"]        # style skipped
    assert "var x" not in r["text"]             # script skipped


def test_parse_routes_html_through_real_parser(spark):
    from semantik_spark.sources.parsers import parse

    files = spark.createDataFrame(
        [
            ("p.html", ".html", b"<html><body><p>hello</p></body></html>"),
            ("p.txt", ".txt", b"plain"),
            ("p.pdf", ".pdf", b"%PDF-"),
        ],
        "uri string, extension string, content binary",
    )
    out = {r["uri"]: r for r in parse(files).collect()}
    assert out["p.html"]["parser"] == "html"
    assert out["p.html"]["text"].strip() == "hello"
    assert out["p.html"]["parse_status"] == "ok"
    assert out["p.txt"]["text"] == "plain"
    assert out["p.pdf"]["parse_status"] == "needs_binary_parser"
