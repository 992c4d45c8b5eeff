"""High-level wrappers over the native host library.

`tokenize_intern` is the host front of the device index build: one C++
pass over the raw text produces (term_ids, starts) plus an incremental
term dictionary — the arrays feed ops/device_index.build_postings
directly. Falls back to the pure-Python tokenizer + dict interning when
the native library is unavailable (identical results).
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Tuple

import numpy as np

from docodo_tpu.native import get_lib

_FOLD: Optional[np.ndarray] = None
_CLS: Optional[np.ndarray] = None


def _tables() -> Tuple[np.ndarray, np.ndarray]:
    """Per-unit case-fold and class tables matching lang/tokenizer
    semantics (fold keeps units whose lower() is not a single BMP char).
    The class table IS the tokenizer's own table — one source of truth,
    so classification rules can never drift between the two paths."""
    global _FOLD, _CLS
    if _FOLD is None:
        from docodo_tpu.lang.tokenizer import _unit_table

        fold = np.arange(0x10000, dtype=np.uint16)
        for cp in range(0x10000):
            if 0xD800 <= cp <= 0xDFFF:
                continue
            low = chr(cp).lower()
            if len(low) == 1 and ord(low) < 0x10000:
                fold[cp] = ord(low)
        _FOLD = fold
        _CLS = _unit_table()
    return _FOLD, _CLS


class NativeInterner:
    """Incremental term dictionary living in C++ (term -> dense id)."""

    def __init__(self):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._ptr = ctypes.c_void_p(lib.docodo_interner_new())

    def __len__(self) -> int:
        return int(self._lib.docodo_interner_count(self._ptr))

    def term_at(self, idx: int) -> str:
        """Single term fetch by dense id (incremental consumers pull only
        the ids minted since their last call, avoiding the O(total)
        arena export of terms())."""
        lib = self._lib
        buf = np.empty(64, dtype=np.uint16)  # MAX_WORD_LENGTH is 32
        n = int(lib.docodo_interner_get(
            self._ptr, idx, buf.ctypes.data_as(ctypes.c_void_p), buf.size
        ))
        if n < 0:
            raise IndexError(idx)
        if n > buf.size:
            buf = np.empty(n, dtype=np.uint16)
            lib.docodo_interner_get(
                self._ptr, idx, buf.ctypes.data_as(ctypes.c_void_p), buf.size
            )
        return buf[:n].tobytes().decode("utf-16-le")

    def terms_range(self, lo: int, hi: int) -> List[str]:
        """Terms [lo, hi) in one export call — incremental consumers
        pull only the ids minted since their last call without the
        per-id ctypes round trips of term_at."""
        if hi <= lo:
            return []
        lib = self._lib
        n_units = int(lib.docodo_interner_export_range(
            self._ptr, lo, hi, None, None
        ))
        units = np.empty(max(n_units, 1), dtype=np.uint16)
        lens = np.empty(hi - lo, dtype=np.int32)
        lib.docodo_interner_export_range(
            self._ptr, lo, hi,
            units.ctypes.data_as(ctypes.c_void_p),
            lens.ctypes.data_as(ctypes.c_void_p),
        )
        blob = units[:n_units].tobytes().decode("utf-16-le")
        if len(blob) != n_units:
            # astral terms: unit lengths != code-point lengths, so the
            # joined decode can't be sliced by lens — per-term fetch
            return [self.term_at(i) for i in range(lo, hi)]
        out: List[str] = []
        pos = 0
        for ln in lens.tolist():
            out.append(blob[pos: pos + ln])
            pos += ln
        return out

    def terms(self) -> List[str]:
        lib = self._lib
        n = len(self)
        arena = int(lib.docodo_interner_arena_size(self._ptr))
        units = np.empty(arena, dtype=np.uint16)
        lens = np.empty(n, dtype=np.int32)
        lib.docodo_interner_export(
            self._ptr, units.ctypes.data_as(ctypes.c_void_p),
            lens.ctypes.data_as(ctypes.c_void_p),
        )
        raw = units.tobytes()
        out: List[str] = []
        off = 0
        for ln in lens.tolist():
            out.append(raw[2 * off: 2 * (off + ln)].decode("utf-16-le"))
            off += ln
        return out

    def close(self) -> None:
        if self._ptr:
            self._lib.docodo_interner_free(self._ptr)
            self._ptr = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def tokenize_intern_native(
    text: str, interner: NativeInterner,
    min_len: int = 3, max_len: int = 32,
) -> Tuple[np.ndarray, np.ndarray]:
    """One-pass native tokenize+intern of `text` into `interner`.

    Returns (term_ids int32[N], starts int32[N]) where starts are UTF-16
    code-unit offsets (the engine coordinate unit)."""
    lib = interner._lib
    fold, cls = _tables()
    units = np.frombuffer(text.encode("utf-16-le"), dtype="<u2")
    n = units.size
    # an emitted token occupies >= min_len units of the input, so the
    # output bound is n // min_len — sizing to n page-faulted ~8x the
    # memory the results touch (measured 96 -> ~120 MB/s end-to-end)
    cap = n if min_len < 2 else n // min_len + 1
    out_ids = np.empty(cap, dtype=np.int32)
    out_starts = np.empty(cap, dtype=np.int32)
    cnt = lib.docodo_tokenize_intern(
        interner._ptr,
        units.ctypes.data_as(ctypes.c_void_p), n,
        fold.ctypes.data_as(ctypes.c_void_p),
        cls.ctypes.data_as(ctypes.c_void_p),
        min_len, max_len,
        out_ids.ctypes.data_as(ctypes.c_void_p),
        out_starts.ctypes.data_as(ctypes.c_void_p), cap,
    )
    return out_ids[:cnt].copy(), out_starts[:cnt].copy()


class _PyInterner:
    """Fallback interner with the same surface."""

    def __init__(self):
        self._map: dict = {}

    def __len__(self) -> int:
        return len(self._map)

    def terms_range(self, lo: int, hi: int) -> List[str]:
        """Terms [lo, hi) — dict insertion order IS id order here."""
        return list(self._map)[lo:hi]

    def terms(self) -> List[str]:
        return list(self._map)

    def close(self) -> None:
        pass


def make_interner():
    if get_lib() is not None:
        return NativeInterner()
    return _PyInterner()


def tokenize_intern_packed(
    text: str, interner, min_len: int = 3, max_len: int = 32,
) -> np.ndarray:
    """One-pass tokenize+intern emitting the PACKED device-build token
    stream (uint32 rows, ops/device_index.pack_tokens layout) straight
    from the C loop — the separate packing pass costs ~40% of the
    producer thread in the pipelined build. Falls back to
    tokenize_intern + pack_tokens without the native lib or once the
    vocabulary reaches the 2^20-1 sentinel id."""
    lib = get_lib()
    if isinstance(interner, NativeInterner) and lib is not None:
        fold, cls = _tables()
        units = np.frombuffer(text.encode("utf-16-le"), dtype="<u2")
        n = units.size
        # tokens bound: n // min_len; escape rows bound: total gap
        # (<= n units) / 4095 per full escape
        cap = (n if min_len < 2 else n // min_len + 1) + n // 4095 + 2
        out = np.empty(cap, dtype=np.uint32)
        cnt = lib.docodo_tokenize_intern_packed(
            interner._ptr,
            units.ctypes.data_as(ctypes.c_void_p), n,
            fold.ctypes.data_as(ctypes.c_void_p),
            cls.ctypes.data_as(ctypes.c_void_p),
            min_len, max_len,
            out.ctypes.data_as(ctypes.c_void_p), cap,
        )
        if cnt >= 0:
            return out[:cnt].copy()
    from docodo_tpu.ops.device_index import pack_tokens

    ids, starts = tokenize_intern(text, interner, min_len, max_len)
    return pack_tokens(ids, starts)


def tokenize_intern(
    text: str, interner, min_len: int = 3, max_len: int = 32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize+intern through whichever interner was produced by
    make_interner()."""
    if isinstance(interner, NativeInterner):
        return tokenize_intern_native(text, interner, min_len, max_len)
    from docodo_tpu.lang.tokenizer import tokenize

    words, starts = tokenize(text)
    ids = np.empty(len(words), dtype=np.int32)
    keep = np.zeros(len(words), dtype=bool)
    m = interner._map
    for i, w in enumerate(words):
        if min_len and not min_len <= len(w) <= max_len:
            continue
        ids[i] = m.setdefault(w, len(m))
        keep[i] = True
    return ids[keep], starts[keep].astype(np.int32)


def parallel_tokenize_intern(
    texts, workers: int = 0, min_len: int = 3, max_len: int = 32,
):
    """Tokenize+intern many documents on real threads.

    The native call releases the GIL, so worker threads scale on cores.
    Each worker owns a private interner (local term ids); afterwards the
    term dictionaries are unified and every id array is remapped through
    one vectorized gather.

    Returns (doc_ids: List[int32[Ni]], doc_starts: List[int32[Ni]],
    terms: List[str]).
    """
    import concurrent.futures as cf
    import os as _os

    texts = list(texts)
    if workers <= 0:
        workers = min(_os.cpu_count() or 1, 8)
    if get_lib() is None or workers == 1 or len(texts) <= 1:
        it = make_interner()
        out = [tokenize_intern(t, it, min_len, max_len) for t in texts]
        return [o[0] for o in out], [o[1] for o in out], it.terms()

    shards = [[] for _ in range(workers)]
    for i, _ in enumerate(texts):
        shards[i % workers].append(i)

    def run(idxs):
        it = NativeInterner()
        res = {
            i: tokenize_intern_native(texts[i], it, min_len, max_len)
            for i in idxs
        }
        return res, it.terms()

    with cf.ThreadPoolExecutor(workers) as ex:
        parts = list(ex.map(run, shards))

    # unify term dictionaries; remap each shard's local ids
    global_map: dict = {}
    terms: List[str] = []
    doc_ids: List[Optional[np.ndarray]] = [None] * len(texts)
    doc_starts: List[Optional[np.ndarray]] = [None] * len(texts)
    for res, local_terms in parts:
        remap = np.empty(len(local_terms), dtype=np.int32)
        for lid, w in enumerate(local_terms):
            gid = global_map.get(w)
            if gid is None:
                gid = len(terms)
                global_map[w] = gid
                terms.append(w)
            remap[lid] = gid
        for i, (ids, starts) in res.items():
            doc_ids[i] = remap[ids]
            doc_starts[i] = starts
    return doc_ids, doc_starts, terms


def varint_encode(coords: np.ndarray) -> np.ndarray:
    """Native 15-bit varint encode (falls back to core.varint)."""
    lib = get_lib()
    coords = np.ascontiguousarray(coords, dtype=np.uint64)
    if lib is None:
        from docodo_tpu.core import varint

        return varint.encode(coords)
    nwords = lib.docodo_varint_encode(
        coords.ctypes.data_as(ctypes.c_void_p), coords.size, None
    )
    out = np.empty(nwords, dtype=np.uint16)
    lib.docodo_varint_encode(
        coords.ctypes.data_as(ctypes.c_void_p), coords.size,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def varint_decode(words: np.ndarray) -> np.ndarray:
    """Native 15-bit varint decode (falls back to core.varint)."""
    lib = get_lib()
    words = np.ascontiguousarray(words, dtype=np.uint16)
    if lib is None:
        from docodo_tpu.core import varint

        return varint.decode(words)
    n = lib.docodo_varint_decode(
        words.ctypes.data_as(ctypes.c_void_p), words.size, None
    )
    out = np.empty(n, dtype=np.uint64)
    lib.docodo_varint_decode(
        words.ctypes.data_as(ctypes.c_void_p), words.size,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
