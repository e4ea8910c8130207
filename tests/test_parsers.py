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
    assert routed["deck.pdf"].parser == "pdf"


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
    # content-free pdf bytes parse to empty text via the real pdf family
    assert out["deck.pdf"].parser == "pdf"
    assert out["deck.pdf"].parse_status == "empty"
    assert out["deck.pdf"].text == ""


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
    assert out["p.pdf"]["parser"] == "pdf"
    assert out["p.pdf"]["parse_status"] == "empty"


# --- round-2 parser families (pdf / office / structured) -------------------

def _mk_pdf(text: str, compress: bool = False) -> bytes:
    import zlib

    esc = text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    content = f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode("latin-1")
    if compress:
        body = zlib.compress(content)
        return (b"%PDF-1.4\n4 0 obj<</Length " + str(len(body)).encode()
                + b"/Filter/FlateDecode>>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF")
    return (b"%PDF-1.4\n4 0 obj<</Length " + str(len(content)).encode()
            + b">>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF")


def _mk_docx(paragraphs) -> bytes:
    import io
    import zipfile

    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = "".join(f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs)
    doc = f'<?xml version="1.0"?><w:document xmlns:w="{w}"><w:body>{body}</w:body></w:document>'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


def _mk_pptx(slides) -> bytes:
    import io
    import zipfile

    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i, lines in enumerate(slides, 1):
            paras = "".join(f"<a:p><a:r><a:t>{ln}</a:t></a:r></a:p>" for ln in lines)
            zf.writestr(f"ppt/slides/slide{i}.xml",
                        f'<?xml version="1.0"?><p:sld xmlns:a="{a}" '
                        f'xmlns:p="x"><p:txBody>{paras}</p:txBody></p:sld>')
    return buf.getvalue()


def _mk_xlsx(strings) -> bytes:
    import io
    import zipfile

    s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    items = "".join(f"<si><t>{x}</t></si>" for x in strings)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/sharedStrings.xml",
                    f'<?xml version="1.0"?><sst xmlns="{s}">{items}</sst>')
    return buf.getvalue()


def test_pdf_text_plain_and_flate():
    from semantik_spark.sources.parsers import _pdf_text

    assert _pdf_text(_mk_pdf("Hello (quoted) world")) == "Hello (quoted) world"
    assert _pdf_text(_mk_pdf("line one", compress=True)) == "line one"


def test_parse_pdf_dataframe(spark):
    from semantik_spark.sources.parsers import parse_pdf

    df = spark.createDataFrame(
        [("a.pdf", _mk_pdf("alpha beta")), ("bad.pdf", b"not a pdf")],
        ["uri", "content"])
    rows = {r["uri"]: r for r in parse_pdf(df).collect()}
    assert rows["a.pdf"]["text"] == "alpha beta"
    assert rows["a.pdf"]["parse_status"] == "ok"
    assert rows["bad.pdf"]["parse_status"] == "empty"


def test_parse_office_formats(spark):
    from semantik_spark.sources.parsers import parse_office

    df = spark.createDataFrame([
        ("d.docx", ".docx", _mk_docx(["para one", "para two"])),
        ("p.pptx", ".pptx", _mk_pptx([["slide one"], ["slide two a", "slide two b"]])),
        ("x.xlsx", ".xlsx", _mk_xlsx(["cell a", "cell b"])),
        ("broken.docx", ".docx", b"PK garbage"),
    ], ["uri", "extension", "content"])
    rows = {r["uri"]: r for r in parse_office(df).collect()}
    assert rows["d.docx"]["text"] == "para one\npara two"
    assert rows["p.pptx"]["text"] == "slide one\nslide two a\nslide two b"
    assert rows["x.xlsx"]["text"] == "cell a\ncell b"
    assert rows["broken.docx"]["parse_status"].startswith("error")


def test_parse_structured_formats(spark):
    from semantik_spark.sources.parsers import parse_structured

    df = spark.createDataFrame([
        ("a.json", ".json", b'{"title": "T", "tags": ["x", "y"], "meta": {"n": 3}}'),
        ("b.yaml", ".yaml", b"name: test\nitems:\n  - 1\n  - 2\n"),
        ("c.csv", ".csv", b"h1,h2\nv1,v2\n"),
        ("d.xml", ".xml", b"<root><a>alpha</a><b>beta</b></root>"),
        ("bad.json", ".json", b"{not json"),
    ], ["uri", "extension", "content"])
    rows = {r["uri"]: r for r in parse_structured(df).collect()}
    assert rows["a.json"]["text"] == "title: T\ntags.0: x\ntags.1: y\nmeta.n: 3"
    assert rows["b.yaml"]["text"] == "name: test\nitems.0: 1\nitems.1: 2"
    assert rows["c.csv"]["text"] == "h1, h2\nv1, v2"
    assert rows["d.xml"]["text"] == "alpha\nbeta"
    assert rows["bad.json"]["parse_status"] == "fallback:text"
    assert rows["bad.json"]["text"] == "{not json"


def test_registry_routes_new_families(spark):
    from semantik_spark.sources.parsers import route_parsers

    df = spark.createDataFrame(
        [("a.pdf", ".pdf"), ("b.docx", ".docx"), ("c.json", ".json"),
         ("d.doc", ".doc")], ["uri", "extension"])
    routed = {r["uri"]: r["parser"] for r in route_parsers(df).collect()}
    assert routed == {"a.pdf": "pdf", "b.docx": "office",
                      "c.json": "structured", "d.doc": "ole"}


def _zip_bytes(members):
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def test_parse_odt_paragraphs_and_escapes(spark):
    """.odt (zip + content.xml): text:p/text:h paragraphs in order,
    XML entities unescaped, nested spans flattened."""
    from semantik_spark.sources.parsers import parse_office

    odt = _zip_bytes([("content.xml",
        '<office:document-content'
        ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
        ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        '<office:body><office:text>'
        '<text:h>Title &amp; more</text:h>'
        '<text:p>first <text:span>inner</text:span> tail</text:p>'
        '<text:p></text:p>'
        '<text:p>&lt;second&gt;</text:p>'
        '</office:text></office:body></office:document-content>')])
    df = spark.createDataFrame([("a.odt", ".odt", odt)],
                               ["uri", "extension", "content"])
    row = parse_office(df).collect()[0]
    assert row["parse_status"] == "ok"
    assert row["text"] == "Title & more\nfirst inner tail\n<second>"


def test_parse_epub_spine_order(spark):
    """.epub: chapters are concatenated in SPINE order, not zip order."""
    from semantik_spark.sources.parsers import parse_office

    opf = ('<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
           '<manifest>'
           '<item id="c2" href="two.xhtml" media-type="application/xhtml+xml"/>'
           '<item id="c1" href="one.xhtml" media-type="application/xhtml+xml"/>'
           '</manifest><spine>'
           '<itemref idref="c1"/><itemref idref="c2"/>'
           '</spine></package>')
    epub = _zip_bytes([
        ("mimetype", "application/epub+zip"),
        ("META-INF/container.xml",
         '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container"'
         ' version="1.0"><rootfiles><rootfile full-path="OEBPS/content.opf"'
         ' media-type="application/oebps-package+xml"/></rootfiles></container>'),
        ("OEBPS/two.xhtml",
         '<html xmlns="http://www.w3.org/1999/xhtml"><body><p>chapter two</p></body></html>'),
        ("OEBPS/content.opf", opf),
        ("OEBPS/one.xhtml",
         '<html xmlns="http://www.w3.org/1999/xhtml"><body><p>chapter one</p></body></html>'),
    ])
    df = spark.createDataFrame([("b.epub", ".epub", epub)],
                               ["uri", "extension", "content"])
    row = parse_office(df).collect()[0]
    assert row["parse_status"] == "ok"
    assert row["text"] == "chapter one\nchapter two"


def test_parse_odt_epub_corrupt_zip_errors(spark):
    from semantik_spark.sources.parsers import parse_office

    df = spark.createDataFrame(
        [("bad.odt", ".odt", b"not a zip"), ("bad.epub", ".epub", b"PK\x03\x04junk")],
        ["uri", "extension", "content"])
    rows = {r["uri"]: r for r in parse_office(df).collect()}
    assert rows["bad.odt"]["parse_status"].startswith("error:")
    assert rows["bad.epub"]["parse_status"].startswith("error:")


def test_registry_routes_odt_epub_to_office(spark):
    from semantik_spark.sources.parsers import PARSER_REGISTRY

    assert PARSER_REGISTRY[".odt"] == ("office",)
    assert PARSER_REGISTRY[".epub"] == ("office",)
    assert PARSER_REGISTRY[".doc"] == ("ole", "unstructured")


def test_sniff_pdf_scanned_detection(spark):
    """is_scanned_pdf (F7, reference sniff.py:478-529): empty PDF and
    image-only pages are scanned; a real text layer is not; threshold
    is average chars/page < 50."""
    from semantik_spark.operators.sniff import sniff_pdf

    long_text = "x" * 200
    cases = [
        ("empty", b"%PDF-1.4\n%%EOF", True),                     # 0 pages
        ("scanned", b"%PDF-1.4\n/Type /Page\n%%EOF", True),      # no text
        ("text1p", ("%PDF-1.4\n/Type /Page\nBT (" + long_text
                    + ") Tj ET\n%%EOF").encode(), False),        # 200/1
        ("thin5p", ("%PDF-1.4\n" + "/Type /Page\n" * 5
                    + "BT (" + long_text + ") Tj ET\n%%EOF").encode(), True),  # 200/5=40
        ("corrupt", b"\x00\x01 not a pdf", True),                # 0 pages
    ]
    df = spark.createDataFrame([(n, c) for n, c, _ in cases], ["uri", "content"])
    rows = {r["uri"]: r for r in sniff_pdf(df).collect()}
    for name, _, expect in cases:
        assert rows[name]["is_scanned_pdf"] == expect, (name, rows[name])
    assert rows["thin5p"]["n_pages"] == 5
    assert rows["text1p"]["text_chars"] == 200


def _build_cfb(streams):
    """Minimal MS-CFB writer for tests: 512-byte sectors, v3 header,
    single FAT sector, miniFAT for streams under 4096 bytes. Sibling
    pointers are left unset (readers walking the flat directory, like
    ours, don't need the red-black tree)."""
    import struct

    SSZ, MSZ, CUTOFF = 512, 64, 4096
    FREE, END, FATSECT = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD

    small = {n: d for n, d in streams.items() if len(d) < CUTOFF}
    big = {n: d for n, d in streams.items() if len(d) >= CUTOFF}

    # mini stream: concat small streams padded to 64B sectors
    mini_data, mini_starts, minifat = b"", {}, []
    for n, d in small.items():
        nsec = max(1, -(-len(d) // MSZ))
        mini_starts[n] = len(minifat)
        for i in range(nsec):
            minifat.append(len(minifat) + 1 if i < nsec - 1 else END)
        mini_data += d + b"\0" * (nsec * MSZ - len(d))

    sectors = []          # payload sectors in order; FAT entries parallel
    fat = []

    def add_chain(data):
        start = len(sectors)
        nsec = max(1, -(-len(data) // SSZ))
        for i in range(nsec):
            sectors.append(data[i * SSZ:(i + 1) * SSZ].ljust(SSZ, b"\0"))
            fat.append(len(sectors) if i < nsec - 1 else END)
        return start

    # directory entries
    def dirent(name, etype, start, size):
        raw = name.encode("utf-16-le")
        e = raw.ljust(64, b"\0")[:64]
        e += struct.pack("<HBB", len(raw) + 2, etype, 1)
        e += struct.pack("<III", FREE, FREE, FREE)
        e += b"\0" * 16 + b"\0" * 4 + b"\0" * 16
        e += struct.pack("<IQ", start, size)
        assert len(e) == 128
        return e

    # reserve layout: dir, minifat, ministream, big streams — build in
    # dependency order using add_chain bookkeeping
    entries = [None]  # root placeholder
    body_chains = {}
    # big streams first so their starts are known
    for n, d in big.items():
        body_chains[n] = add_chain(d)
    minifat_start = END
    if minifat:
        mf = b"".join(struct.pack("<I", v) for v in minifat)
        minifat_start = add_chain(mf)
    mini_start = add_chain(mini_data) if mini_data else END
    entries[0] = dirent("Root Entry", 5, mini_start, len(mini_data))
    for n in streams:
        if n in big:
            entries.append(dirent(n, 2, body_chains[n], len(streams[n])))
        else:
            entries.append(dirent(n, 2, mini_starts[n], len(streams[n])))
    dirdata = b"".join(entries)
    dir_start = add_chain(dirdata)

    # FAT sector itself
    fat_sector_index = len(sectors)
    fat_full = fat + [FATSECT]
    fat_full += [FREE] * (SSZ // 4 - len(fat_full))
    sectors.append(b"".join(struct.pack("<I", v) for v in fat_full))

    header = _CFB_HEADER(dir_start, minifat_start, len(minifat),
                         fat_sector_index)
    return header + b"".join(sectors)


def _CFB_HEADER(dir_start, minifat_start, n_minifat, fat_sector):
    import struct

    FREE, END = 0xFFFFFFFF, 0xFFFFFFFE
    h = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 16
    h += struct.pack("<HHHH", 0x003E, 0x0003, 0xFFFE, 9)
    h += struct.pack("<H", 6) + b"\0" * 6
    h += struct.pack("<IIIIIIIII", 0, 1, dir_start, 0, 4096,
                     minifat_start if n_minifat else END,
                     1 if n_minifat else 0, END, 0)
    difat = [fat_sector] + [FREE] * 108
    h += b"".join(struct.pack("<I", v) for v in difat)
    assert len(h) == 512
    return h


def test_parse_doc_fib_window_small_stream(spark):
    """.doc via the miniFAT path (stream < 4096): FIB fcMin/fcMac
    window decodes the clear text; \\r becomes a paragraph break."""
    import struct

    from semantik_spark.sources.parsers import parse_ole

    text = "Legacy Word line one.\rAnd line two."
    wd = bytearray(1024)
    wd[0:2] = struct.pack("<H", 0xA5EC)          # wIdent
    struct.pack_into("<H", wd, 0x0A, 0)          # flags: not complex, cp1252
    struct.pack_into("<II", wd, 0x18, 1024, 1024 + len(text))
    doc = _build_cfb({"WordDocument": bytes(wd) + text.encode("cp1252")})
    df = spark.createDataFrame([("a.doc", ".doc", doc)],
                               ["uri", "extension", "content"])
    row = parse_ole(df).collect()[0]
    assert row["parse_status"] == "ok"
    assert row["text"] == "Legacy Word line one.\nAnd line two."


def test_parse_ppt_record_walk_regular_stream(spark):
    """.ppt via the regular-FAT path (stream >= 4096): TextBytesAtom +
    nested-container TextCharsAtom both surface, in record order."""
    import struct

    from semantik_spark.sources.parsers import parse_ole

    def rec(rtype, body, container=False):
        ver = 0x000F if container else 0
        return struct.pack("<HHI", ver, rtype, len(body)) + body

    inner = rec(0x0FA0, "Título dos".encode("utf-16-le"))
    stream = rec(0x0FA8, b"Slide one text") + rec(0x03E8, inner, container=True)
    stream += b"\0" * (4608 - len(stream))  # force regular FAT chain
    ppt = _build_cfb({"PowerPoint Document": stream})
    df = spark.createDataFrame([("b.ppt", ".ppt", ppt)],
                               ["uri", "extension", "content"])
    row = parse_ole(df).collect()[0]
    assert row["parse_status"] == "ok"
    assert row["text"] == "Slide one text\nTítulo dos"


def test_parse_ole_corrupt_and_dispatch(spark):
    from semantik_spark.sources.parsers import PARSER_REGISTRY, parse

    assert PARSER_REGISTRY[".doc"][0] == "ole"
    assert PARSER_REGISTRY[".ppt"][0] == "ole"
    df = spark.createDataFrame(
        [("x.doc", ".doc", b"garbage"), ("y.txt", ".txt", b"plain text")],
        ["uri", "extension", "content"])
    rows = {r["uri"]: r for r in parse(df).collect()}
    assert rows["x.doc"]["parser"] == "ole"
    assert rows["x.doc"]["parse_status"].startswith("error:")
    assert rows["y.txt"]["text"] == "plain text"


def test_cfb_reader_bounded_on_corruption():
    """Seeded fuzz: random byte flips in a valid CFB file must either
    parse or raise promptly — never hang (the chain walkers are
    length-bounded) and never crash the worker loop (parse_ole maps
    any exception to an error row)."""
    import random
    import struct

    from semantik_spark.sources.parsers import _cfb_streams, make_doc_bytes

    base = bytearray(make_doc_bytes("fuzz corpus text " * 40))
    rng = random.Random(99)
    for _ in range(60):
        raw = bytearray(base)
        for _ in range(rng.randint(1, 8)):
            raw[rng.randrange(len(raw))] = rng.randrange(256)
        try:
            out = _cfb_streams(bytes(raw))
            assert isinstance(out, dict)
        except (ValueError, struct.error, IndexError, KeyError,
                MemoryError, OverflowError):
            pass


def test_parse_msg_property_streams(spark):
    """Outlook .msg: properties decoded from __substg1.0_* streams,
    UTF-16 (001F) preferred, 8-bit (001E) fallback; registry routes
    .msg to the CFB-backed family, falling back to email."""
    from semantik_spark.sources.parsers import (
        PARSER_REGISTRY, build_cfb, parse, parse_msg,
    )

    msg = build_cfb({
        "__substg1.0_0037001F": "Quarterly report".encode("utf-16-le"),
        "__substg1.0_0C1A001E": b"Alice Sender",
        "__substg1.0_0E04001F": "Bob Recipient".encode("utf-16-le"),
        "__substg1.0_1000001F": "Body line one\r\nBody line two".encode("utf-16-le"),
    })
    assert PARSER_REGISTRY[".msg"] == ("msg", "email")
    df = spark.createDataFrame([("m.msg", ".msg", msg)],
                               ["uri", "extension", "content"])
    row = parse_msg(df).collect()[0]
    assert row["parse_status"] == "parsed"
    assert row["subject"] == "Quarterly report"
    assert row["from_addr"] == "Alice Sender"
    assert row["to_addr"] == "Bob Recipient"
    assert "Body line one" in row["text"]

    out = {r["uri"]: r for r in parse(df).collect()}
    assert out["m.msg"]["parser"] == "msg"
    assert out["m.msg"]["parse_status"] == "parsed"

    bad = spark.createDataFrame([("z.msg", ".msg", b"not ole")],
                                ["uri", "extension", "content"])
    assert parse_msg(bad).collect()[0]["parse_status"].startswith("error:")


def _mk_rtf() -> bytes:
    parts = [
        "{\\rtf1\\ansi\\deff0",
        "{\\fonttbl{\\f0 Times New Roman;}}",
        "{\\colortbl;\\red0\\green0\\blue0;}",
        "{\\info{\\title Secret}}",
        "\\pard Hello \\b bold\\b0  world\\par ",
        "Second \\'e9 line \\u8364? euro\\par ",
        "{\\*\\generator Riched20}",
        "Tab:\\tab done\\par}",
    ]
    return "".join(parts).encode("ascii")


def test_rtf_to_text_strips_control_words():
    from semantik_spark.sources.parsers import _rtf_to_text

    text = _rtf_to_text(_mk_rtf())
    assert text == "Hello bold world\nSecond é line € euro\nTab:\tdone"
    # destination groups (fonttbl/info/\*generator) must not leak
    assert "Times" not in text and "Secret" not in text and "Riched" not in text


def test_rtf_rejects_non_rtf():
    import pytest as _pytest

    from semantik_spark.sources.parsers import _rtf_to_text

    with _pytest.raises(ValueError):
        _rtf_to_text(b"plain text, no rtf header")


def test_parse_rtf_family_and_routing(spark):
    from semantik_spark.sources.parsers import parse_rtf, route_parsers

    files = spark.createDataFrame(
        [("a.rtf", ".rtf", bytearray(_mk_rtf())),
         ("b.rtf", ".rtf", bytearray(b"broken"))],
        "uri string, extension string, content binary",
    )
    routed = {r["uri"]: r["parser"] for r in route_parsers(files).collect()}
    assert routed["a.rtf"] == "rtf"
    out = {r["uri"]: r for r in parse_rtf(files).collect()}
    assert out["a.rtf"]["parse_status"] == "ok"
    assert out["a.rtf"]["text"].startswith("Hello bold world")
    assert out["b.rtf"]["parse_status"].startswith("error:")


def test_rtf_fuzz_never_crashes_or_emits_surrogates():
    """Arbitrary bytes after a valid RTF magic must produce a str (no
    exception, no lone surrogates — Arrow rejects those batch-wide)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from semantik_spark.sources.parsers import _rtf_to_text

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=400))
    def run(payload):
        text = _rtf_to_text(b"{\\rtf1" + payload)
        assert isinstance(text, str)
        assert not any(0xD800 <= ord(ch) <= 0xDFFF for ch in text)
        text.encode("utf-8")  # must be Arrow-encodable

    run()


def test_sniff_pdf_null_content_degrades_not_fails(spark):
    """r12 review: a NULL binary row must sniff as a scanned (0-page)
    row, not TypeError the whole Arrow batch — the multimodal kernels'
    NULL guard, applied to the PDF prober."""
    from semantik_spark.operators.sniff import sniff_pdf

    df = spark.createDataFrame(
        [("a.pdf", None), ("b.pdf", b"%PDF-1.4 /Type /Page x")],
        "uri string, content binary")
    out = {r["uri"]: r for r in sniff_pdf(df).collect()}
    assert out["a.pdf"]["n_pages"] == 0
    assert out["a.pdf"]["text_chars"] == 0
    assert out["a.pdf"]["is_scanned_pdf"] is True
    assert out["b.pdf"]["n_pages"] == 1


def test_all_parser_kernels_survive_null_content(spark):
    """r13 formula review (the sniff_pdf/multimodal r12 defect class):
    bytes(None) in a mapInPandas kernel kills the whole Arrow task —
    every parser family must degrade a NULL content row to its
    dead-letter row (parse_status 'error: NullContent') instead."""
    from semantik_spark.sources.parsers import (
        parse_email, parse_html, parse_msg, parse_office, parse_ole,
        parse_pdf, parse_rtf, parse_structured,
    )

    def nulled(ext):
        return spark.createDataFrame(
            [(f"u{ext}", ext, None), (f"ok{ext}", ext, b"plain body")],
            "uri string, extension string, content binary")

    cases = [
        (parse_email, ".eml"), (parse_html, ".html"), (parse_pdf, ".pdf"),
        (parse_office, ".docx"), (parse_structured, ".json"),
        (parse_ole, ".doc"), (parse_msg, ".msg"), (parse_rtf, ".rtf"),
    ]
    for fn, ext in cases:
        out = {r["uri"]: r["parse_status"] for r in fn(nulled(ext)).collect()}
        assert out[f"u{ext}"] == "error: NullContent", (ext, out)
        # the non-null row still parses (status is family-specific but
        # never the null marker and never a crash)
        assert out[f"ok{ext}"] != "error: NullContent", (ext, out)
