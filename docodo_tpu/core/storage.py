"""Index storage: the ArrayIndex structure-of-arrays and its binary format.

The on-disk `.index` stream is byte-compatible with the reference
(ref Docodo.NET/Index.cs:312-380, Build.cs:370-404):

    [max_coord: u64-LE]
    repeat: [term: 7bit-len + UTF-8][n: i32-LE][n x u16-LE varint words]

In memory the index is NOT a map of objects: it is one uint64 coordinate
vector plus CSR term offsets — the layout that transfers to TPU HBM as-is
and lets the query kernels gather posting ranges with two offsets.

Loading is a single vectorized pass: all posting bytes are concatenated,
varint-decoded at once, and per-term prefix sums are fixed up with a
segment-base subtraction (no per-term Python loops over postings).
"""

from __future__ import annotations

import io
import os
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from docodo_tpu.core import varint
from docodo_tpu.lang.vocab import _read_7bit_len, _write_7bit_len

INDEX_FILE = ".index"
PAGES_FILE = ".index.list"


class ArrayIndex:
    """Structure-of-arrays inverted index.

    terms        : sorted (ordinal) term strings
    offsets      : int64[T+1] CSR into coords
    coords       : uint64[N] posting coordinates (per-term ascending)
    enc_counts   : int64[T] stored u16 word count per term (popularity proxy,
                   equals the reference's IndexSequence.Count)
    """

    def __init__(self):
        self.terms: List[str] = []
        self.offsets = np.zeros(1, dtype=np.int64)
        self.coords: Optional[np.ndarray] = np.zeros(0, dtype=np.uint64)
        self.enc_counts = np.zeros(0, dtype=np.int64)
        self.max_coord: int = 0
        self._tmap: Dict[str, int] = {}
        # lazy mode
        self._file = None
        self._spans: Optional[np.ndarray] = None  # int64[T,2] byte (off, nwords)

    # ---- lookup ---------------------------------------------------------------
    def __contains__(self, term: str) -> bool:
        return term in self._tmap

    def __len__(self) -> int:
        return len(self.terms)

    def term_id(self, term: str) -> int:
        return self._tmap.get(term, -1)

    def posting_count(self, tid: int) -> int:
        return int(self.offsets[tid + 1] - self.offsets[tid])

    def get_by_id(self, tid: int) -> np.ndarray:
        if self.coords is not None:
            return self.coords[self.offsets[tid]: self.offsets[tid + 1]]
        off, nwords = self._spans[tid]
        self._file.seek(off)
        raw = self._file.read(int(nwords) * 2)
        return varint.decode(np.frombuffer(raw, dtype=np.uint16))

    def get(self, term: str) -> Optional[np.ndarray]:
        tid = self._tmap.get(term)
        if tid is None:
            return None
        return self.get_by_id(tid)

    def enc_count(self, tid: int) -> int:
        return int(self.enc_counts[tid])

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None

    # ---- construction -----------------------------------------------------------
    @classmethod
    def from_postings(
        cls, terms: List[str], offsets: np.ndarray, coords: np.ndarray,
        max_coord: int,
    ) -> "ArrayIndex":
        idx = cls()
        idx.terms = terms
        idx.offsets = offsets.astype(np.int64)
        idx.coords = coords.astype(np.uint64)
        idx.max_coord = int(max_coord)
        idx._tmap = {t: i for i, t in enumerate(terms)}
        # u16 count per term, vectorized: chunk count per delta, segment-summed
        if coords.size:
            deltas = np.empty_like(idx.coords)
            np.subtract(
                idx.coords[1:], idx.coords[:-1], out=deltas[1:]
            )
            deltas[0] = idx.coords[0]
            starts = idx.offsets[:-1]
            valid = starts < idx.offsets[1:]
            deltas[starts[valid]] = idx.coords[starts[valid]]
            ch = varint.chunks_per_delta(deltas)
            cs = np.concatenate([[0], np.cumsum(ch)])
            idx.enc_counts = cs[idx.offsets[1:]] - cs[idx.offsets[:-1]]
        else:
            idx.enc_counts = np.zeros(len(terms), dtype=np.int64)
        return idx


def write_index(path: str, index: ArrayIndex) -> None:
    with open(path, "wb") as f:
        f.write(int(index.max_coord).to_bytes(8, "little"))
        for tid, term in enumerate(index.terms):
            data = term.encode("utf-8")
            _write_7bit_len(f, len(data))
            f.write(data)
            varint.write_block(f, index.get_by_id(tid))


def write_postings_stream(
    f, max_coord: int, records: Iterable[Tuple[str, np.ndarray]]
) -> None:
    """Write a spill/index stream from (term, coords) records."""
    f.write(int(max_coord).to_bytes(8, "little"))
    for term, coords in records:
        data = term.encode("utf-8")
        _write_7bit_len(f, len(data))
        f.write(data)
        varint.write_block(f, coords)


def _parse_records(buf: bytes):
    """Parse the record stream; returns (max_coord, terms, word-spans)."""
    mv = memoryview(buf)
    max_coord = int.from_bytes(mv[:8], "little")
    pos = 8
    terms: List[str] = []
    spans: List[Tuple[int, int]] = []  # byte offset of u16 data, word count
    n_total = len(buf)
    while pos < n_total:
        # 7-bit length
        shift = 0
        slen = 0
        while True:
            b = buf[pos]
            pos += 1
            slen |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        terms.append(str(mv[pos: pos + slen], "utf-8"))
        pos += slen
        nwords = int.from_bytes(mv[pos: pos + 4], "little", signed=True)
        pos += 4
        spans.append((pos, nwords))
        pos += 2 * nwords
    return max_coord, terms, spans


def read_index(path: str, in_memory: bool = True) -> ArrayIndex:
    idx = ArrayIndex()
    with open(path, "rb") as f:
        # both modes parse the whole file once for record spans; lazy
        # mode then drops the coords and re-reads per lookup
        buf = f.read()
    max_coord, terms, spans = _parse_records(buf)
    idx.max_coord = max_coord
    idx.terms = terms
    idx._tmap = {t: i for i, t in enumerate(terms)}
    nwords = np.array([n for _, n in spans], dtype=np.int64)
    idx.enc_counts = nwords.copy()
    if in_memory:
        if spans:
            ucat = np.concatenate(
                [
                    np.frombuffer(buf, dtype="<u2", count=n, offset=off)
                    for off, n in spans
                ]
            ).astype(np.uint16)
        else:
            ucat = np.zeros(0, dtype=np.uint16)
        deltas = varint.decode_deltas(ucat)
        # postings per term = count of non-continuation words per span
        final = (ucat & varint.OVERFLOW) == 0
        cfin = np.concatenate([[0], np.cumsum(final)])
        wends = np.cumsum(nwords)
        wstarts = wends - nwords
        counts = cfin[wends] - cfin[wstarts]
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        gcoords = np.cumsum(deltas, dtype=np.uint64)
        # per-term local prefix: subtract the running total before each term
        bases = np.zeros(len(terms), dtype=np.uint64)
        nz = offsets[:-1] > 0
        bases[nz] = gcoords[offsets[:-1][nz] - 1]
        coords = gcoords - np.repeat(bases, counts)
        idx.offsets = offsets
        idx.coords = coords
    else:
        idx.coords = None
        idx._spans = np.array(spans, dtype=np.int64).reshape(-1, 2)
        idx._file = open(path, "rb")
        # decoded counts are unknown without reading postings; like the
        # reference's lazy stubs, Count is the STORED u16 word count
        # (ref Index.cs:346-348) — cumulated here so posting_count and
        # enc_count work without touching the disk
        nwords = (
            idx._spans[:, 1] if len(spans)
            else np.zeros(0, dtype=np.int64)
        )
        idx.offsets = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(nwords)]
        )
        idx.enc_counts = nwords.astype(np.int64)
    return idx


def read_spill(path: str):
    """Read a spill file fully: (max_coord, terms, list-of-coord-arrays)."""
    with open(path, "rb") as f:
        buf = f.read()
    max_coord, terms, spans = _parse_records(buf)
    arrays = []
    for off, n in spans:
        stream = np.frombuffer(buf, dtype="<u2", count=n, offset=off)
        arrays.append(varint.decode(stream.astype(np.uint16)))
    return max_coord, terms, arrays


class _SpillCursor:
    """Sequential reader over one spill file's (term, encoded-words)
    records — nothing but the current record is resident."""

    def __init__(self, path: str):
        self.f = open(path, "rb")
        self.max_coord = int.from_bytes(self.f.read(8), "little")
        self.term: Optional[str] = None
        self.advance()

    def advance(self) -> None:
        head = self.f.read(1)
        if not head:
            self.term = None
            self.f.close()
            return
        slen = 0
        shift = 0
        b = head[0]
        while True:
            slen |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            b = self.f.read(1)[0]
        self.term = self.f.read(slen).decode("utf-8")
        nwords = int.from_bytes(self.f.read(4), "little", signed=True)
        self._raw = self.f.read(2 * nwords)

    def coords(self) -> np.ndarray:
        return varint.decode(np.frombuffer(self._raw, dtype=np.uint16))


def merge_spills(
    paths: List[str], out_path: str, shift_coords: bool = False,
    collect: Optional[list] = None,
) -> int:
    """STREAMING k-way merge of spill/index files (ref Index.cs:577-689,
    which also streams term-by-term so memory stays bounded).

    Terms are united in ordinal order; a term's postings concatenate in
    file order (files are ordered by ascending coordinate ranges). With
    shift_coords each file's coordinates are offset by the cumulative
    max_coord of the preceding files — the reference's shard-merge
    shift. Peak memory = one term's postings, never a whole file.

    With `collect` (a list), every merged (term, coords) record is also
    appended to it — an in-memory build can then install the arrays
    directly instead of re-reading the file it just wrote. Returns the
    output max_coord (the stream header value).
    """
    import heapq

    cursors = [_SpillCursor(p) for p in paths]
    shifts = np.zeros(len(cursors), dtype=np.uint64)
    total = 0
    for q, c in enumerate(cursors):
        if shift_coords:
            shifts[q] = total
        total += c.max_coord
    out_max = (
        total if shift_coords
        else max((c.max_coord for c in cursors), default=0)
    )

    heap = [
        (c.term, q) for q, c in enumerate(cursors) if c.term is not None
    ]
    heapq.heapify(heap)

    def records():
        while heap:
            term, q0 = heap[0]
            parts = []
            while heap and heap[0][0] == term:
                _, q = heapq.heappop(heap)
                c = cursors[q]
                coords = c.coords()
                if shift_coords and shifts[q]:
                    coords = coords + shifts[q]
                parts.append((q, coords))
                c.advance()
                if c.term is not None:
                    heapq.heappush(heap, (c.term, q))
            parts.sort(key=lambda t: t[0])  # file order = coordinate order
            arrs = [p for _, p in parts]
            rec = term, (np.concatenate(arrs) if len(arrs) > 1 else arrs[0])
            if collect is not None:
                collect.append(rec)
            yield rec

    with open(out_path, "wb") as f:
        write_postings_stream(f, out_max, records())
    return int(out_max)
