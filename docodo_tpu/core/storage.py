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


def write_postings_arrays(
    f, max_coord: int, terms: List[str], offsets: np.ndarray,
    coords: np.ndarray,
) -> None:
    """Vectorized stream writer: ONE varint pass over every block
    (varint.encode_blocks) plus one bytes join — replaces the per-term
    write_block loop whose per-call overhead dominated the facade
    build's save/merge phases (same byte-exact output)."""
    stream, wstarts = varint.encode_blocks(coords, offsets)
    terms_b = [t.encode("utf-8") for t in terms]
    tlens = np.fromiter((len(b) for b in terms_b), np.int64, len(terms_b))
    if tlens.size == 0:
        f.write(int(max_coord).to_bytes(8, "little"))
        return
    if tlens.max() < 0x80:
        # numpy-assembled framing: one u8 buffer scattered in four
        # vectorized passes (1-byte lens, term bytes, i32 counts, u16
        # words) — no per-record Python
        wcounts = np.diff(wstarts)
        sizes = 1 + tlens + 4 + 2 * wcounts
        starts = 8 + np.concatenate([[0], np.cumsum(sizes)[:-1]])
        out = np.empty(8 + int(sizes.sum()), dtype=np.uint8)
        out[:8] = np.frombuffer(
            int(max_coord).to_bytes(8, "little"), dtype=np.uint8
        )
        out[starts] = tlens
        tb = np.frombuffer(b"".join(terms_b), dtype=np.uint8)
        tpos = (
            np.repeat(starts + 1, tlens)
            + np.arange(int(tlens.sum()))
            - np.repeat(np.cumsum(tlens) - tlens, tlens)
        )
        out[tpos] = tb
        cpos = starts + 1 + tlens
        out[cpos[:, None] + np.arange(4)] = (
            wcounts.astype("<i4").view(np.uint8).reshape(-1, 4)
        )
        sb = stream.view(np.uint8)
        nbytes = 2 * wcounts
        wpos = (
            np.repeat(cpos + 4, nbytes)
            + np.arange(int(nbytes.sum()))
            - np.repeat(np.cumsum(nbytes) - nbytes, nbytes)
        )
        out[wpos] = sb
        f.write(out.tobytes())
        return
    sbytes = stream.tobytes()
    frags: List[bytes] = [int(max_coord).to_bytes(8, "little")]
    for i, data in enumerate(terms_b):
        head = io.BytesIO()
        _write_7bit_len(head, len(data))
        frags.append(head.getvalue())
        frags.append(data)
        a, b = int(wstarts[i]), int(wstarts[i + 1])
        frags.append(int(b - a).to_bytes(4, "little"))
        frags.append(sbytes[2 * a: 2 * b])
    f.write(b"".join(frags))


def _parse_records(buf: bytes):
    """Parse the record stream; returns (max_coord, terms, word-spans).

    The framing walk runs in C when the native library is present (one
    call instead of a per-record Python loop — this parse is on both
    the merge path and every index load); the Python walk below is the
    DOCODO_NO_NATIVE fallback and the behavioral reference."""
    mv = memoryview(buf)
    max_coord = int.from_bytes(mv[:8], "little")
    lib = varint._lib()
    if lib is not None and len(buf) > 8:
        cap = (len(buf) - 8) // 5 + 2
        term_off = np.empty(cap, np.int64)
        term_len = np.empty(cap, np.int32)
        span_off = np.empty(cap, np.int64)
        span_words = np.empty(cap, np.int32)
        cnt = int(lib.docodo_parse_records(
            buf, len(buf),
            term_off.ctypes.data, term_len.ctypes.data,
            span_off.ctypes.data, span_words.ctypes.data,
        ))
        if cnt < 0:
            raise ValueError("truncated index record stream")
        terms = [
            str(mv[o: o + l], "utf-8")
            for o, l in zip(term_off[:cnt].tolist(), term_len[:cnt].tolist())
        ]
        spans = list(zip(span_off[:cnt].tolist(), span_words[:cnt].tolist()))
        return max_coord, terms, spans
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
        if pos + slen + 4 > n_total:
            raise ValueError("truncated index record stream")
        terms.append(str(mv[pos: pos + slen], "utf-8"))
        pos += slen
        nwords = int.from_bytes(mv[pos: pos + 4], "little", signed=True)
        pos += 4
        if nwords < 0 or pos + 2 * nwords > n_total:
            raise ValueError("corrupt posting block length")
        spans.append((pos, nwords))
        pos += 2 * nwords
    return max_coord, terms, spans


def _bulk_decode(buf: bytes, terms: List[str], spans) -> Tuple[np.ndarray, np.ndarray]:
    """One vectorized varint pass over a whole record stream:
    (offsets int64[T+1], coords uint64[N]) with per-term prefix fixup."""
    nwords = np.array([n for _, n in spans], dtype=np.int64)
    if spans:
        # one fancy-gather instead of a frombuffer per span: the spans'
        # u16 payloads sit at arbitrary byte offsets in `buf`
        all_u16 = np.frombuffer(buf, dtype=np.uint8)
        offs = np.array([o for o, _ in spans], dtype=np.int64)
        total16 = int(nwords.sum())
        widx = (
            np.repeat(offs, nwords)
            + 2 * (np.arange(total16)
                   - np.repeat(np.cumsum(nwords) - nwords, nwords))
        )
        lo = all_u16[widx].astype(np.uint16)
        hi = all_u16[widx + 1].astype(np.uint16)
        ucat = lo | (hi << np.uint16(8))
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
    return offsets, coords


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
        idx.offsets, idx.coords = _bulk_decode(buf, terms, spans)
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
    collect: Optional[list] = None, mem_items: Optional[int] = None,
    arrays_out: Optional[list] = None,
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

    Small inputs take a fully VECTORIZED merge — each file bulk-decoded
    in one varint pass, records united by one stable argsort, output
    written by the vectorized stream writer. The cutover keys on
    `mem_items`, the caller's in-RAM posting budget (the builder's
    spill threshold, ref Index.cs:96): the vectorized path costs ~40
    bytes per stored word, about the builder's own per-posting RAM, so
    merges whose word count fits 1.5x the budget vectorize and larger
    ones keep the streaming path (peak memory = one term's postings).
    With `arrays_out` (a list), the vectorized path appends ONE
    (terms, offsets, coords) tuple instead of filling `collect` — the
    in-memory installer consumes the arrays directly with no per-term
    record slicing. The streaming path ignores it (collect still fills).
    """
    if mem_items is None:
        mem_items = 1_000_001
    total_words = sum(
        max(0, os.path.getsize(p) - 8) // 2 for p in paths
    )
    if total_words <= 1.5 * mem_items:
        return _merge_spills_vectorized(paths, out_path, shift_coords,
                                        collect, arrays_out)
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


def _merge_spills_vectorized(
    paths: List[str], out_path: str, shift_coords: bool,
    collect: Optional[list], arrays_out: Optional[list] = None,
) -> int:
    """merge_spills fast path: every file decoded in ONE varint pass,
    union by one stable argsort over term ranks (stability keeps the
    file-order = coordinate-order rule for shared terms), one vectorized
    stream write. Byte-identical output to the streaming path."""
    import shutil

    loaded = []
    mcs = []
    total = 0
    out_max = 0
    for p in paths:
        with open(p, "rb") as f:
            buf = f.read()
        mc, terms, spans = _parse_records(buf)
        offsets, coords = _bulk_decode(buf, terms, spans)
        if shift_coords and total:
            coords = coords + np.uint64(total)
        if shift_coords:
            total += mc
        out_max = max(out_max, mc)
        mcs.append(mc)
        loaded.append((terms, offsets, coords))
    if shift_coords:
        out_max = total

    # identity merge: one file carries every record and the others are
    # coordinate-empty (a parallel task that drew no documents) — the
    # merged stream is byte-identical to that file, so copy it instead
    # of re-encoding (the reference's standalone build moves its single
    # tmpind the same way, ref Build.cs:420-422)
    nonempty = [i for i, (t, _, _) in enumerate(loaded) if t]
    if len(nonempty) == 1 and all(
        mcs[j] == 0 for j in range(len(mcs)) if j != nonempty[0]
    ):
        i = nonempty[0]
        shutil.copyfile(paths[i], out_path)
        if arrays_out is not None:
            arrays_out.append(loaded[i])
        elif collect is not None:
            terms, offsets, coords = loaded[i]
            for k, t in enumerate(terms):
                collect.append((t, coords[offsets[k]: offsets[k + 1]]))
        return int(out_max)

    union = sorted({t for terms, _, _ in loaded for t in terms})
    rank_of = {t: i for i, t in enumerate(union)}
    ranks = np.concatenate([
        np.repeat(
            np.fromiter((rank_of[t] for t in terms), np.int32, len(terms)),
            np.diff(offsets),
        )
        for terms, offsets, _ in loaded
    ]) if loaded else np.zeros(0, dtype=np.int32)
    coords_all = (
        np.concatenate([c for _, _, c in loaded])
        if loaded else np.zeros(0, dtype=np.uint64)
    )
    loaded.clear()  # free per-file decodes before the sort temporaries
    perm = np.argsort(ranks, kind="stable")  # file order within a term
    counts = np.bincount(ranks, minlength=len(union))
    del ranks
    coords_all = coords_all[perm]
    del perm
    offsets_out = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    with open(out_path, "wb") as f:
        write_postings_arrays(f, out_max, union, offsets_out, coords_all)
    if arrays_out is not None:
        arrays_out.append((union, offsets_out, coords_all))
    elif collect is not None:
        for i, t in enumerate(union):
            collect.append(
                (t, coords_all[offsets_out[i]: offsets_out[i + 1]])
            )
    return int(out_max)
