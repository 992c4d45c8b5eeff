"""Ingestion layer tests (mirror of reference DataSourceTest.cs plus
unit coverage for charset/PDF/web/db sources)."""

import os
import sqlite3
import zlib

import numpy as np
import pytest

from docodo_tpu.sources import (
    DocumentsDataSource,
    EntityDataSource,
    IndexTextFilesDataSource,
    IndexType,
    SqliteDataSource,
    WebDataSource,
    XmlDataSource,
    from_html,
)
from docodo_tpu.sources.charset import decode_bytes, detect_encoding
from docodo_tpu.sources.files import headers_from_dscr
from docodo_tpu.sources.pdftext import PdfDocument, extract_pdf_text


# ---------------------------------------------------------------------------
# charset
# ---------------------------------------------------------------------------

def test_detect_utf8_and_cp1251():
    assert detect_encoding("hello plain ascii".encode()) == "ascii"
    assert detect_encoding("привет мир".encode("utf-8")) == "utf-8"
    raw = "Война и мир, том первый. Москва!".encode("cp1251")
    assert detect_encoding(raw) == "windows-1251"
    assert decode_bytes(raw) == "Война и мир, том первый. Москва!"
    assert detect_encoding("caffè città".encode("cp1252")) == "windows-1252"
    assert detect_encoding("﻿bom".encode("utf-8-sig")) == "utf-8-sig"
    assert detect_encoding("текст".encode("utf-16-le")) == "utf-16-le"


# ---------------------------------------------------------------------------
# text files source
# ---------------------------------------------------------------------------

def _drain(src):
    src.reset()
    docs = []
    while True:
        d = src.next_document()
        if d is None:
            break
        docs.append(d)
    return docs


def test_text_files_walk_pagination_and_dscr(tmp_path):
    root = tmp_path / "corpus"
    sub = root / "sub"
    sub.mkdir(parents=True)
    (root / "a.txt").write_text("alpha beta " * 5)
    (sub / "b.txt").write_text("x" * 3000 + "tail page two")
    (root / ".dscr").write_text("Category=root\nName=ignored\n")
    (sub / "b.txt.dscr").write_text("Author=Dickens\n")
    (root / "skip.bin").write_text("nope")

    src = IndexTextFilesDataSource("files", str(root) + os.sep)
    docs = _drain(src)
    names = sorted(d.name for d in docs)
    assert names == ["a.txt", os.path.join("sub", "b.txt")]

    bdoc = next(d for d in docs if d.name.endswith("b.txt"))
    pages = list(bdoc)
    assert pages[0].id == "0"
    hdr = pages[0].text
    # file .dscr beats dir .dscr beats base; Name seeded first so it wins
    assert "Author=Dickens" in hdr and "Category=root" in hdr
    assert f"Name={bdoc.name}" in hdr
    assert [p.id for p in pages[1:]] == ["1", "2"]
    assert len(pages[1].text) == 3000
    assert pages[2].text == "tail page two"
    # direct page access for snippets
    assert bdoc["2"].text == "tail page two"
    with pytest.raises(IndexError):
        bdoc["99"]


def test_headers_first_key_wins(tmp_path):
    f = tmp_path / "doc.txt"
    f.write_text("text")
    (tmp_path / "doc.txt.dscr").write_text("K=file\n")
    (tmp_path / ".dscr").write_text("K=dir\nD=dironly\n")
    hdr = headers_from_dscr(str(f), "K=base\n")
    assert "K=base" in hdr and "D=dironly" in hdr


# ---------------------------------------------------------------------------
# PDF
# ---------------------------------------------------------------------------

def _make_pdf(pages, compress=False):
    """Hand-assemble a minimal valid PDF with one content stream/page."""
    objs = []
    kids = ", ".join(f"{4 + 2 * i} 0 R" for i in range(len(pages)))
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(
        f"2 0 obj\n<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>\nendobj\n".encode()
    )
    objs.append(
        b"3 0 obj\n<< /Title (Tiny Spec) /Author (Docodo) >>\nendobj\n"
    )
    for i, text in enumerate(pages):
        content = b"BT /F1 12 Tf 72 700 Td (" + text.encode("latin-1") + b") Tj ET"
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        objs.append(
            f"{4 + 2 * i} 0 obj\n<< /Type /Page /Parent 2 0 R /Contents {5 + 2 * i} 0 R >>\nendobj\n".encode()
        )
        objs.append(
            (f"{5 + 2 * i} 0 obj\n<< /Length {len(content)}".encode() + filt
             + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
        )
    body = b"%PDF-1.4\n" + b"".join(objs)
    return body + b"\ntrailer\n<< /Root 1 0 R /Info 3 0 R >>\n%%EOF\n"


@pytest.mark.parametrize("compress", [False, True])
def test_pdf_extract_pages(compress):
    data = _make_pdf(["Hello first page", "Second page words"], compress)
    doc = PdfDocument(data)
    assert doc.page_count == 2
    assert doc.extract_page_text(0) == "Hello first page"
    assert doc.extract_page_text(1) == "Second page words"
    assert doc.info["Title"] == "Tiny Spec"
    assert doc.info["Author"] == "Docodo"
    assert "Hello first page" in extract_pdf_text(data)


def test_pdf_tj_array_and_escapes():
    content = b"BT [ (Hel) -20 (lo) -500 (world) ] TJ ET (paren\\)ok) Tj"
    from docodo_tpu.sources.pdftext import extract_text_operators

    assert extract_text_operators(content) == "Hello world\nparen)ok"


def test_documents_source_mixed(tmp_path):
    (tmp_path / "t.txt").write_text("plain words here")
    (tmp_path / "d.pdf").write_bytes(_make_pdf(["pdf body text"]))
    src = DocumentsDataSource("docs", str(tmp_path) + os.sep)
    docs = _drain(src)
    by_ext = {os.path.splitext(d.name)[1]: list(d) for d in docs}
    assert "pdf body text" in by_ext[".pdf"][1].text
    assert "plain words here" in by_ext[".txt"][1].text
    assert "Title=Tiny Spec" in by_ext[".pdf"][0].text


# ---------------------------------------------------------------------------
# web
# ---------------------------------------------------------------------------

SITE = {
    "http://test.local/": (
        "text/html",
        b"<html><head><title>Home = Page</title>"
        b"<meta name='author' content='Boz'></head><body>"
        b"<script>var x=1;</script><style>.c{}</style>"
        b"Welcome <img src='x.png' alt='logo alt'> text"
        b"<a href='page2.html'>two</a>"
        b"<a href='pic.jpg'>img</a>"
        b"<a href='http://other.host/x'>ext</a></body></html>",
    ),
    "http://test.local/page2.html": (
        "text/html",
        b"<html><body>Second page body"
        b"<meta http-equiv='refresh' content='0;url=plain.txt'></body></html>",
    ),
    "http://test.local/plain.txt": ("text/plain", b"plain text file"),
}


def fake_fetch(url):
    if url not in SITE:
        raise OSError(f"404 {url}")
    return SITE[url]


def test_from_html_extraction():
    doc = from_html(SITE["http://test.local/"][1], "home", "websrc")
    pages = list(doc)
    assert "Welcome" in pages[1].text and "logo alt" in pages[1].text
    assert "var x=1" not in pages[1].text
    hdr = pages[0].text
    assert "Title=Home   Page" in hdr  # '=' replaced by space
    assert "Author=Boz" in hdr
    assert "Source=websrc" in hdr


def test_web_crawl(tmp_path):
    src = WebDataSource(
        "web", "http://test.local", fetcher=fake_fetch, politeness_s=0.0
    )
    docs = _drain(src)
    # page2 (linked) + plain.txt (via meta refresh); the base URL itself
    # is only parsed for links, never indexed (reference behavior, ref
    # WebDataSource.cs:42-95) — and no images/offsite links
    assert len(docs) == 2
    texts = {
        d.name: "".join(p.text for p in d) for d in docs
    }
    assert any("plain text file" in t for t in texts.values())


# ---------------------------------------------------------------------------
# xml manifest
# ---------------------------------------------------------------------------

def test_xml_manifest(tmp_path):
    base = tmp_path / "files"
    base.mkdir()
    (base / "one.txt").write_text("manifest doc one")
    man = tmp_path / "test.xml"
    man.write_text(
        "<root><basepath>files/</basepath>"
        "<document><file>one.txt</file><type>txt</type></document>"
        "<document><type>broken-no-file</type></document></root>"
    )
    src = XmlDataSource("xml", str(man).replace(os.sep, "/"))
    docs = _drain(src)
    assert len(docs) == 1
    assert "manifest doc one" in "".join(p.text for p in docs[0])


# ---------------------------------------------------------------------------
# db / entity
# ---------------------------------------------------------------------------

def test_sqlite_text_source(tmp_path):
    db = tmp_path / "t.db"
    con = sqlite3.connect(db)
    con.execute("create table docs (name text, body text, author text)")
    con.execute("insert into docs values ('d1', 'sqlite body words', 'Boz')")
    con.commit()
    con.close()
    src = SqliteDataSource(
        "db", "", str(db), "select name, body, author from docs",
        IndexType.TEXT, "body",
    )
    docs = _drain(src)
    assert len(docs) == 1
    pages = list(docs[0])
    assert "sqlite body words" in pages[1].text
    assert "author=Boz" in pages[0].text
    assert "Source=db" in pages[0].text


def test_sqlite_blob_pdf_sniffing(tmp_path):
    db = tmp_path / "b.db"
    con = sqlite3.connect(db)
    con.execute("create table blobs (name text, data blob)")
    con.execute(
        "insert into blobs values ('p1', ?)", (_make_pdf(["blob pdf text"]),)
    )
    con.execute(
        "insert into blobs values ('h1', ?)",
        (b"<html><body>blob html text</body></html>",),
    )
    con.commit()
    con.close()
    src = SqliteDataSource(
        "db", "", str(db), "select name, data from blobs", IndexType.BLOB
    )
    docs = _drain(src)
    texts = ["".join(p.text for p in d) for d in docs]
    assert any("blob pdf text" in t for t in texts)
    assert any("blob html text" in t for t in texts)


class _Book:
    def __init__(self, key, title, body):
        self.key = key
        self.title = title
        self.body = body


def test_entity_source():
    books = [_Book(1, "First", "entity body one"),
             _Book(2, "Second", "entity body two")]
    src = EntityDataSource(
        "ent", lambda: books, indextype=IndexType.TEXT,
        datafieldname="body", key="key",
    )
    docs = _drain(src)
    assert len(docs) == 2
    pages = list(docs[0])
    assert "title=First" in pages[0].text
    assert "Name=1" in pages[0].text
    assert "entity body one" in pages[1].text


# ---------------------------------------------------------------------------
# end-to-end: index a mixed folder and search it
# ---------------------------------------------------------------------------

def test_index_documents_folder(tmp_path):
    root = tmp_path / "corpus"
    root.mkdir()
    (root / "a.txt").write_text("the quick brown fox jumps over the lazy dog")
    (root / "b.pdf").write_bytes(_make_pdf(["quick silver pdf payload"]))

    import docodo_tpu

    ind = docodo_tpu.Index(path=str(tmp_path / "idx"), in_memory=True)
    ind.add_data_source(DocumentsDataSource("docs", str(root) + os.sep))
    ind.create()
    res = ind.search("quick")
    assert len(res.found_docs) == 2
    res2 = ind.search('"quick silver"')
    assert len(res2.found_docs) == 1
    assert res2.found_docs[0].name.endswith("b.pdf")


def test_malformed_pdfs_yield_empty_text():
    assert extract_pdf_text(b"not a pdf at all") == ""
    assert extract_pdf_text(b"%PDF-1.4\n1 0 obj\n<< /Type /Page") == ""
    assert extract_pdf_text(b"") == ""
    # flate stream with corrupt payload: page exists, text degrades to ""
    bad = (b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\nendobj\n"
           b"4 0 obj\n<< /Type /Page /Contents 5 0 R >>\nendobj\n"
           b"5 0 obj\n<< /Length 8 /Filter /FlateDecode >>\nstream\n"
           b"\xff\xfe\xfd\xfc\xfb\xfa\xf9\xf8\nendstream\nendobj\n"
           b"trailer\n<< /Root 1 0 R >>\n%%EOF")
    assert extract_pdf_text(bad) == ""
