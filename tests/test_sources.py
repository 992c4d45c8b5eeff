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


def test_pdf_filter_chain_a85_flate_and_lzw():
    import base64

    from docodo_tpu.sources import pdftext as px

    text = b"BT (chained filter text) Tj ET"
    chained = base64.a85encode(zlib.compress(text)) + b"~>"
    pdf = (
        b"%PDF-1.5\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + b"4 0 obj\n<< /Length " + str(len(chained)).encode()
        + b" /Filter [/ASCII85Decode /FlateDecode] >>\nstream\n"
        + chained + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "chained filter text"
    # LZW round-trip via the decoder itself is covered by a known vector:
    # TIFF LZW of b'-----A---B' (per the PDF spec example)
    enc = bytes([0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01])
    assert px._lzw_decode(enc) == b"-----A---B"


def _make_objstm_pdf(text=b"inside objstm page"):
    """Page tree + catalog packed into an /ObjStm (modern writer layout);
    only the content stream is a file-level object."""
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
    ]
    bodies = b""
    header = b""
    for num, body in inner:
        header += f"{num} {len(bodies)} ".encode()
        bodies += body + b"\n"
    payload = header + bodies
    stm = zlib.compress(payload)
    content = b"BT (" + text + b") Tj ET"
    return (
        b"%PDF-1.5\n"
        + b"4 0 obj\n<< /Type /ObjStm /N 3 /First "
        + str(len(header)).encode()
        + b" /Length " + str(len(stm)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + stm
        + b"\nendstream\nendobj\n"
        + b"5 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )


def test_pdf_object_streams():
    doc = PdfDocument(_make_objstm_pdf())
    assert doc.page_count == 1
    assert doc.extract_page_text(0) == "inside objstm page"


def _encrypt_pdf_rc4(pages, user_pw=b""):
    """Standard handler V2/R3 (RC4-128) encryption of _make_pdf output,
    following ISO 32000 Algorithm 2 for the file key."""
    import hashlib
    import struct

    from docodo_tpu.sources import pdftext as px

    o_entry = bytes(range(32))
    id0 = bytes(range(16))
    p = 0xFFFFFFFC  # -4
    key = hashlib.md5(
        (user_pw + px._PAD)[:32] + o_entry + struct.pack("<I", p) + id0
    ).digest()
    for _ in range(50):
        key = hashlib.md5(key[:16]).digest()
    key = key[:16]

    def obj_key(num, gen):
        k = key + struct.pack("<I", num)[:3] + struct.pack("<I", gen)[:2]
        return hashlib.md5(k).digest()[:16]

    # Algorithm 5 (R>=3): the /U entry the extractor validates against
    x = px._rc4(key, hashlib.md5(px._PAD + id0).digest())
    for i in range(1, 20):
        x = px._rc4(bytes(b ^ i for b in key), x)
    u_entry = x + bytes(16)

    objs = []
    kids = ", ".join(f"{3 + 2 * i} 0 R" for i in range(len(pages)))
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(
        f"2 0 obj\n<< /Type /Pages /Kids [{kids}] /Count {len(pages)} "
        f">>\nendobj\n".encode()
    )
    for i, text in enumerate(pages):
        content = b"BT (" + text.encode("latin-1") + b") Tj ET"
        enc = px._rc4(obj_key(4 + 2 * i, 0), content)
        objs.append(
            f"{3 + 2 * i} 0 obj\n<< /Type /Page /Parent 2 0 R /Contents "
            f"{4 + 2 * i} 0 R >>\nendobj\n".encode()
        )
        objs.append(
            f"{4 + 2 * i} 0 obj\n<< /Length {len(enc)} >>\nstream\n".encode()
            + enc + b"\nendstream\nendobj\n"
        )
    objs.append(
        b"9 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 /P -4 /O <"
        + o_entry.hex().encode() + b"> /U <" + u_entry.hex().encode()
        + b"> >>\nendobj\n"
    )
    return (
        b"%PDF-1.4\n" + b"".join(objs)
        + b"trailer\n<< /Root 1 0 R /Encrypt 9 0 R /ID [<"
        + id0.hex().encode() + b"> <" + id0.hex().encode() + b">] >>\n%%EOF\n"
    )


def test_pdf_rc4_encrypted():
    data = _encrypt_pdf_rc4(["rc4 secret body", "second rc4 page"])
    doc = PdfDocument(data)
    assert doc.page_count == 2
    assert doc.extract_page_text(0) == "rc4 secret body"
    assert doc.extract_page_text(1) == "second rc4 page"


def _encrypt_pdf_aes128(text):
    """V4/R4 with /StdCF AESV2 (AES-128-CBC, random IV, PKCS#5 pad)."""
    import hashlib
    import os as _os
    import struct

    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    from docodo_tpu.sources import pdftext as px

    o_entry = bytes(range(32, 64))
    id0 = bytes(range(16))
    p = 0xFFFFFFFC
    key = hashlib.md5(
        px._PAD + o_entry + struct.pack("<I", p) + id0
    ).digest()
    for _ in range(50):
        key = hashlib.md5(key[:16]).digest()
    key = key[:16]
    # Algorithm 5 /U for the extractor's key validation
    x = px._rc4(key, hashlib.md5(px._PAD + id0).digest())
    for i in range(1, 20):
        x = px._rc4(bytes(b ^ i for b in key), x)
    u_entry = x + bytes(16)
    content = b"BT (" + text + b") Tj ET"
    ok = hashlib.md5(
        key + struct.pack("<I", 4)[:3] + struct.pack("<I", 0)[:2] + b"sAlT"
    ).digest()[:16]
    iv = _os.urandom(16)
    padn = 16 - len(content) % 16
    enc_ = Cipher(algorithms.AES(ok), modes.CBC(iv)).encryptor()
    enc = iv + enc_.update(content + bytes([padn]) * padn) + enc_.finalize()
    return (
        b"%PDF-1.6\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + b"4 0 obj\n<< /Length " + str(len(enc)).encode()
        + b" >>\nstream\n" + enc + b"\nendstream\nendobj\n"
        + b"9 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128 /P -4"
        b" /CF << /StdCF << /CFM /AESV2 >> >> /StmF /StdCF /StrF /StdCF"
        b" /O <" + o_entry.hex().encode() + b"> /U <"
        + u_entry.hex().encode() + b"> >>\nendobj\n"
        + b"trailer\n<< /Root 1 0 R /Encrypt 9 0 R /ID [<"
        + id0.hex().encode() + b">] >>\n%%EOF\n"
    )


def test_pdf_aes128_encrypted():
    data = _encrypt_pdf_aes128(b"aes secret words")
    assert extract_pdf_text(data) == "aes secret words"


def test_pdf_aes256_r6_encrypted():
    import os as _os

    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    from docodo_tpu.sources import pdftext as px

    file_key = bytes(range(11, 43))
    vsalt, ksalt = bytes(range(8)), bytes(range(8, 16))
    u_hash = px._hash_r6(b"", vsalt, b"")
    ik = px._hash_r6(b"", ksalt, b"")
    ue = px._aes_cbc_encrypt_nopad(ik, file_key, b"\0" * 16)
    u_entry = u_hash + vsalt + ksalt

    content = b"BT (aes256 hardened) Tj ET"
    iv = _os.urandom(16)
    padn = 16 - len(content) % 16
    enc_ = Cipher(algorithms.AES(file_key), modes.CBC(iv)).encryptor()
    enc = iv + enc_.update(content + bytes([padn]) * padn) + enc_.finalize()
    data = (
        b"%PDF-2.0\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + b"4 0 obj\n<< /Length " + str(len(enc)).encode()
        + b" >>\nstream\n" + enc + b"\nendstream\nendobj\n"
        + b"9 0 obj\n<< /Filter /Standard /V 5 /R 6 /Length 256 /P -4"
        b" /O <" + bytes(48).hex().encode() + b"> /U <"
        + u_entry.hex().encode() + b"> /UE <" + ue.hex().encode()
        + b"> /OE <" + bytes(32).hex().encode() + b"> >>\nendobj\n"
        + b"trailer\n<< /Root 1 0 R /Encrypt 9 0 R /ID [<"
        + bytes(16).hex().encode() + b">] >>\n%%EOF\n"
    )
    assert extract_pdf_text(data) == "aes256 hardened"


def _make_cid_pdf(text="Composite Text"):
    """Type0/CID font: content shows 2-byte codes mapped via /ToUnicode."""
    codes = {ch: i + 1 for i, ch in enumerate(dict.fromkeys(text))}
    hexstr = "".join(f"{codes[c]:04X}" for c in text)
    bfchars = "".join(
        f"<{v:04X}> <{ord(k):04X}>\n" for k, v in codes.items()
    )
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(codes)} beginbfchar\n{bfchars}endbfchar\n"
        "endcmap end end\n"
    ).encode()
    content = f"BT /F1 12 Tf <{hexstr}> Tj ET".encode()
    return (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n"
        + b"4 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        + b"5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H"
        b" /Encoding /Identity-H /ToUnicode 6 0 R >>\nendobj\n"
        + b"6 0 obj\n<< /Length " + str(len(cmap)).encode()
        + b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n"
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )


def test_pdf_cid_type0_tounicode():
    data = _make_cid_pdf("Composite CID Text")
    assert extract_pdf_text(data) == "Composite CID Text"


def test_pdf_tounicode_bfrange():
    from docodo_tpu.sources.pdftext import _parse_tounicode

    cmap = (
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfrange <41> <43> <0061> endbfrange\n"
        b"1 beginbfrange <50> <52> [<0078> <0079> <007A>] endbfrange\n"
    )
    fm = _parse_tounicode(cmap)
    assert fm.nbytes == 1
    assert fm.decode(b"\x41\x42\x43") == "abc"
    assert fm.decode(b"\x50\x51\x52") == "xyz"


def test_pdf_inherited_resources():
    """/Resources on the /Pages node must be inherited by kid pages."""
    cmap = (
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfchar <0001> <0058> endbfchar\n"
    )
    content = b"BT /F1 9 Tf <0001> Tj ET"
    data = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1"
        b" /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + b"4 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        + b"5 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>\nendobj\n"
        + b"6 0 obj\n<< /Length " + str(len(cmap)).encode()
        + b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n"
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(data) == "X"


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


def test_pdf_password_protected_yields_empty_text():
    """A document whose /U does not validate with the empty password is
    password-required: the extractor must skip it cleanly (empty text),
    not index RC4 garbage."""
    data = _encrypt_pdf_rc4(["locked body"])
    # corrupt /U so the Algorithm-5 check fails (as if a user pw was set)
    import re as _re

    m = _re.search(rb"/U <([0-9a-f]{64})>", data)
    bad = data[: m.start(1)] + b"ff" * 32 + data[m.end(1):]
    assert extract_pdf_text(bad) == ""


def test_pdf_truncated_bfrange_array_terminates():
    """A bfrange destination array missing its ']' must not hang the
    CMap parser (regression: find() returning -1 reset the scan)."""
    from docodo_tpu.sources.pdftext import _parse_tounicode

    data = (b"begincodespacerange <00> <FF> endcodespacerange\n"
            b"beginbfrange <01> <03> [ <0041> <0042> endbfrange\n")
    fm = _parse_tounicode(data)  # must return, not spin
    assert fm.nbytes == 1


def _xref_pdf():
    """A PDF whose LAST definition of the content object is stale: a
    rolled-back incremental update left `5 0 obj (WRONG)` later in the
    file, but the final xref table points object 5 at its ORIGINAL
    offset. xref-aware resolution (ref DocumentDataSource.cs:27-117 —
    PdfSharp resolves through xref) must pick CORRECT; the linear
    last-definition scavenger alone would pick WRONG."""
    head = b"%PDF-1.4\n"
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Title (XrefCase) >>\nendobj\n",
        b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\n"
        b"endobj\n",
    ]
    good = b"BT /F1 12 Tf 72 700 Td (CORRECT) Tj ET"
    objs.append(
        b"5 0 obj\n<< /Length " + str(len(good)).encode()
        + b" >>\nstream\n" + good + b"\nendstream\nendobj\n"
    )
    offsets = {}
    pos = len(head)
    for i, o in enumerate(objs, start=1):
        offsets[i] = pos
        pos += len(o)
    body = head + b"".join(objs)
    # stale re-definition appended by a rolled-back update
    bad = b"BT /F1 12 Tf 72 700 Td (WRONG) Tj ET"
    body += (
        b"5 1 obj\n<< /Length " + str(len(bad)).encode()
        + b" >>\nstream\n" + bad + b"\nendstream\nendobj\n"
    )
    xref_pos = len(body)
    ent = [b"0000000000 65535 f \n"] + [
        f"{offsets[i]:010d} 00000 n \n".encode() for i in range(1, 6)
    ]
    body += (
        b"xref\n0 6\n" + b"".join(ent)
        + b"trailer\n<< /Size 6 /Root 1 0 R /Info 3 0 R >>\n"
        + b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    return body


def test_pdf_xref_overrides_stale_redefinition(tmp_path):
    from docodo_tpu.sources.pdftext import PdfDocument

    doc = PdfDocument(_xref_pdf())
    text = doc.extract_page_text(0)
    assert "CORRECT" in text and "WRONG" not in text
    # generation follows the xref-designated object
    assert doc._gens[5] == 0


def test_pdf_damaged_xref_falls_back_to_scavenger():
    """A corrupt xref offset must not break extraction — the linear
    scavenger's pick stands (damaged-file robustness)."""
    from docodo_tpu.sources.pdftext import PdfDocument

    data = _xref_pdf()
    # corrupt the startxref target
    data = data.replace(
        b"startxref\n", b"startxref\n9", 1
    )
    doc = PdfDocument(data)
    text = doc.extract_page_text(0)
    # scavenger semantics: last definition wins
    assert "WRONG" in text


def test_pdf_xref_stream_resolution():
    """Same rollback scenario through a PDF 1.5 xref STREAM (/Type
    /XRef, /W field widths) instead of a classic table."""
    import zlib as _z

    from docodo_tpu.sources.pdftext import PdfDocument

    head = b"%PDF-1.5\n"
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Title (XrefStm) >>\nendobj\n",
        b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\n"
        b"endobj\n",
    ]
    good = b"BT /F1 12 Tf 72 700 Td (CORRECT) Tj ET"
    objs.append(
        b"5 0 obj\n<< /Length " + str(len(good)).encode()
        + b" >>\nstream\n" + good + b"\nendstream\nendobj\n"
    )
    offsets = {}
    pos = len(head)
    for i, o in enumerate(objs, start=1):
        offsets[i] = pos
        pos += len(o)
    body = head + b"".join(objs)
    bad = b"BT /F1 12 Tf 72 700 Td (WRONG) Tj ET"
    body += (
        b"5 1 obj\n<< /Length " + str(len(bad)).encode()
        + b" >>\nstream\n" + bad + b"\nendstream\nendobj\n"
    )
    xref_pos = len(body)
    # /W [1 4 2]: type u8, offset u32be, gen u16be; entries 0..6
    rows = [bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")]
    for i in range(1, 6):
        rows.append(
            bytes([1]) + offsets[i].to_bytes(4, "big")
            + (0).to_bytes(2, "big")
        )
    rows.append(  # the xref stream object itself (6)
        bytes([1]) + xref_pos.to_bytes(4, "big") + (0).to_bytes(2, "big")
    )
    stream = _z.compress(b"".join(rows))
    body += (
        b"6 0 obj\n<< /Type /XRef /Size 7 /W [1 4 2] /Root 1 0 R "
        b"/Info 3 0 R /Filter /FlateDecode /Length "
        + str(len(stream)).encode() + b" >>\nstream\n" + stream
        + b"\nendstream\nendobj\n"
        + b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    doc = PdfDocument(body)
    text = doc.extract_page_text(0)
    assert "CORRECT" in text and "WRONG" not in text
