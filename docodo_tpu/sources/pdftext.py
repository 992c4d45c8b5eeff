"""Minimal pure-Python PDF text extraction.

The reference delegates to PdfSharp + the PdfSharpTextExtractor submodule
(ref Docodo.NET/DataSources/DocumentDataSource.cs:27-117). No PDF library
is available in this environment, so this is a small tolerant extractor
sufficient for text-first PDFs: it scans indirect objects, resolves the
page tree, inflates FlateDecode content streams and concatenates the
string operands of the Tj/TJ/'/" text operators page by page.

Not supported (returns empty text rather than failing): encrypted
documents, CID/Type0 composite fonts with custom CMaps, object streams
(/ObjStm) holding page dictionaries.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n")


class PdfDocument:
    def __init__(self, data: bytes):
        self.data = data
        self.objects: Dict[int, bytes] = {}
        self._streams: Dict[int, bytes] = {}
        self._scan_objects()
        self.info = self._info()
        self.pages = self._page_objects()

    # ---- object scan -------------------------------------------------------
    def _scan_objects(self) -> None:
        data = self.data
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            start = m.end()
            end = data.find(b"endobj", start)
            if end < 0:
                end = len(data)
            body = data[start:end]
            sm = _STREAM_RE.search(body)
            if sm:
                self.objects[num] = body[: sm.start()]
                raw = body[sm.end():]
                es = raw.rfind(b"endstream")
                if es >= 0:
                    raw = raw[:es]
                self._streams[num] = raw.rstrip(b"\r\n")
            else:
                self.objects[num] = body

    def _resolve(self, num: int) -> bytes:
        return self.objects.get(num, b"")

    @staticmethod
    def _dict_value(body: bytes, key: bytes) -> Optional[bytes]:
        m = re.search(re.escape(key) + rb"\s*", body)
        if not m:
            return None
        rest = body[m.end():]
        mm = re.match(rb"(\d+)\s+\d+\s+R", rest)
        if mm:
            return mm.group(0)
        mm = re.match(rb"\[(.*?)\]", rest, re.S)
        if mm:
            return mm.group(0)
        mm = re.match(rb"[^/\r\n<>\[\]]+", rest)
        return mm.group(0) if mm else None

    @staticmethod
    def _refs(val: bytes) -> List[int]:
        return [int(m.group(1)) for m in re.finditer(rb"(\d+)\s+\d+\s+R", val)]

    # ---- page tree ---------------------------------------------------------
    def _page_objects(self) -> List[int]:
        # find the catalog -> /Pages, walk /Kids depth-first in order
        root: Optional[int] = None
        m = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", self.data)
        if m:
            cat = self._resolve(int(m.group(1)))
            v = self._dict_value(cat, b"/Pages")
            if v:
                refs = self._refs(v)
                root = refs[0] if refs else None
        pages: List[int] = []
        seen = set()

        def walk(num: int) -> None:
            if num in seen:
                return
            seen.add(num)
            body = self._resolve(num)
            if re.search(rb"/Type\s*/Page\b(?!s)", body):
                pages.append(num)
                return
            kids = self._dict_value(body, b"/Kids")
            if kids:
                for r in self._refs(kids):
                    walk(r)

        if root is not None:
            walk(root)
        if not pages:  # fallback: every /Type /Page object in file order
            for num, body in sorted(self.objects.items()):
                if re.search(rb"/Type\s*/Page\b(?!s)", body):
                    pages.append(num)
        return pages

    # ---- metadata ----------------------------------------------------------
    def _info(self) -> Dict[str, str]:
        info: Dict[str, str] = {}
        m = re.search(rb"/Info\s+(\d+)\s+\d+\s+R", self.data)
        if not m:
            return info
        body = self._resolve(int(m.group(1)))
        for key in (b"/Title", b"/Author", b"/Subject"):
            km = re.search(re.escape(key) + rb"\s*\((.*?)(?<!\\)\)", body, re.S)
            if km:
                info[key[1:].decode()] = _decode_pdf_string(km.group(1))
            else:
                km = re.search(re.escape(key) + rb"\s*<([0-9A-Fa-f\s]+)>", body)
                if km:
                    info[key[1:].decode()] = _decode_hex_string(km.group(1))
        return info

    @property
    def page_count(self) -> int:
        return len(self.pages)

    # ---- content -----------------------------------------------------------
    def _content_bytes(self, page_num: int) -> bytes:
        body = self._resolve(page_num)
        v = self._dict_value(body, b"/Contents")
        if not v:
            return b""
        out = []
        for ref in self._refs(v):
            raw = self._streams.get(ref)
            if raw is None:
                continue
            obj = self.objects.get(ref, b"")
            if b"/FlateDecode" in obj:
                try:
                    raw = zlib.decompress(raw)
                except zlib.error:
                    try:
                        raw = zlib.decompressobj().decompress(raw)
                    except zlib.error:
                        continue
            out.append(raw)
        return b"\n".join(out)

    def extract_page_text(self, index: int) -> str:
        if not 0 <= index < len(self.pages):
            return ""
        return extract_text_operators(self._content_bytes(self.pages[index]))

    def extract_text(self) -> str:
        return "\n".join(
            self.extract_page_text(i) for i in range(self.page_count)
        )


_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        try:
            return raw.decode("utf-16-be", "replace")[1:]
        except Exception:
            pass
    out = []
    i = 0
    while i < len(raw):
        c = raw[i: i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1: i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal escape, 1-3 digits
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j: j + 1].isdigit():
                    j += 1
                out.append(chr(int(raw[i + 1: j], 8) & 0xFF))
                i = j
                continue
            i += 1
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


def _decode_hex_string(raw: bytes) -> str:
    hexstr = re.sub(rb"\s+", b"", raw)
    if len(hexstr) % 2:
        hexstr += b"0"
    data = bytes.fromhex(hexstr.decode("ascii", "ignore"))
    if data.startswith(b"\xfe\xff"):
        return data.decode("utf-16-be", "replace")
    return data.decode("latin-1")


_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^()\\])*\)"      # literal string
    rb"|<[0-9A-Fa-f\s]*>"         # hex string
    rb"|\[|\]"
    rb"|/[^\s/<>\[\]()]*"
    rb"|[^\s/<>\[\]()]+",
    re.S,
)


def extract_text_operators(content: bytes) -> str:
    """Walk a content stream, emitting string operands at text-showing
    operators. TD/Td/T*/ET insert line breaks; TJ number offsets below
    -100/1000 em insert a space (word gap heuristic)."""
    out: List[str] = []
    stack: List[object] = []
    in_array: List[object] = []
    array_depth = 0
    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        if tok == b"[":
            array_depth += 1
            in_array = []
            continue
        if tok == b"]":
            array_depth = max(0, array_depth - 1)
            stack.append(list(in_array))
            in_array = []
            continue
        target = in_array if array_depth else stack
        if tok.startswith(b"("):
            target.append(_decode_pdf_string(tok[1:-1]))
        elif tok.startswith(b"<"):
            target.append(_decode_hex_string(tok[1:-1]))
        elif tok.startswith(b"/"):
            target.append(tok)
        else:
            try:
                target.append(float(tok))
                continue
            except ValueError:
                pass
            op = tok
            if op == b"Tj" and stack and isinstance(stack[-1], str):
                out.append(stack[-1])
            elif op in (b"'", b'"'):
                strs = [x for x in stack if isinstance(x, str)]
                if strs:
                    out.append("\n" + strs[-1])
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                for item in stack[-1]:
                    if isinstance(item, str):
                        out.append(item)
                    elif isinstance(item, float) and item < -100:
                        out.append(" ")
            elif op in (b"Td", b"TD", b"T*", b"ET"):
                if out and not out[-1].endswith("\n"):
                    out.append("\n")
            stack = []
    return "".join(out).rstrip("\n")


def extract_pdf_text(data: bytes) -> str:
    """One-shot helper: full document text (empty string on failure)."""
    try:
        return PdfDocument(data).extract_text()
    except Exception:
        return ""
