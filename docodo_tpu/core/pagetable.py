"""Page/document boundary table.

The reference resolves a hit coordinate to (doc, page, page base coord) by
forward-scanning a Dictionary of boundary coords with a stateful cursor
(ref Docodo.NET/Build.cs:41-148). Here the table is three parallel arrays
(ascending page END coordinates, per-page doc ordinal, page id strings) and
GetPage is a binary search — `np.searchsorted(bounds, coords, 'right')` —
which vectorizes over whole result sets and runs on device as `jnp.searchsorted`.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from docodo_tpu.constants import DOC_SEP
from docodo_tpu.lang.vocab import _read_7bit_len, _write_7bit_len


def _read_str(f) -> Optional[str]:
    n = _read_7bit_len(f)
    if n is None:
        return None
    raw = f.read(n)
    if len(raw) < n:
        return None
    return raw.decode("utf-8")


def _write_str(f, s: str) -> None:
    data = s.encode("utf-8")
    _write_7bit_len(f, len(data))
    f.write(data)


@dataclass
class PageTable:
    bounds: np.ndarray = field(
        default_factory=lambda: np.zeros(0, dtype=np.uint64)
    )  # page END coordinate (exclusive)
    page_doc: np.ndarray = field(
        default_factory=lambda: np.zeros(0, dtype=np.int64)
    )  # doc ordinal per page
    page_ids: List[str] = field(default_factory=list)
    doc_names: List[str] = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.page_ids)

    # ---- construction ------------------------------------------------------
    @classmethod
    def from_marks(cls, marks: List[Tuple[str, int]], shift: int = 0) -> "PageTable":
        """Build from the builder's mark stream: ('source:docname', coord)
        entries open a document, (':pageid', coord) entries close a page
        (ref Build.cs:53-72, 348-367)."""
        t = cls()
        t.extend_from_marks(marks, shift)
        return t

    def extend_from_marks(self, marks, shift: int = 0) -> None:
        bounds = list(self.bounds)
        page_doc = list(self.page_doc)
        for key, coord in marks:
            if not key.startswith(DOC_SEP):
                self.doc_names.append(key)
            else:
                bounds.append(int(coord) + shift)
                page_doc.append(len(self.doc_names) - 1)
                self.page_ids.append(key[1:])
        self.bounds = np.array(bounds, dtype=np.uint64)
        self.page_doc = np.array(page_doc, dtype=np.int64)

    # ---- lookup --------------------------------------------------------------
    def locate(self, coords: np.ndarray):
        """Vectorized GetPage: for each coordinate return (page_index,
        in-page position). Coordinates beyond the last bound map to the
        last page (reference returns an empty DocPage; callers never hit
        this for well-formed indexes)."""
        coords = np.asarray(coords, dtype=np.uint64)
        page = np.searchsorted(self.bounds, coords, side="right")
        page = np.minimum(page, len(self.bounds) - 1)
        base = np.where(page > 0, self.bounds[np.maximum(page - 1, 0)], 0)
        pos = (coords - base).astype(np.int64)
        return page.astype(np.int64), pos

    def page_base(self, page_idx: int) -> int:
        return int(self.bounds[page_idx - 1]) if page_idx > 0 else 0

    # ---- binary IO (byte-compatible with reference .index.list,
    # ref Build.cs:99-148) ------------------------------------------------------
    def save(self, f) -> None:
        prev_doc = -1
        for p in range(len(self.page_ids)):
            f.write(int(self.bounds[p]).to_bytes(8, "little"))
            d = int(self.page_doc[p])
            if d != prev_doc:
                _write_str(f, self.doc_names[d])
                f.write(int(self.bounds[p]).to_bytes(8, "little"))
                prev_doc = d
            _write_str(f, DOC_SEP + self.page_ids[p])

    @classmethod
    def load(cls, f) -> "PageTable":
        t = cls()
        bounds: List[int] = []
        page_doc: List[int] = []
        while True:
            raw = f.read(8)
            if len(raw) < 8:
                break
            coord = int.from_bytes(raw, "little")
            s = _read_str(f)
            if s is None:
                break
            if not s.startswith(DOC_SEP):
                t.doc_names.append(s)
            else:
                bounds.append(coord)
                page_doc.append(len(t.doc_names) - 1)
                t.page_ids.append(s[1:])
        t.bounds = np.array(bounds, dtype=np.uint64)
        t.page_doc = np.array(page_doc, dtype=np.int64)
        return t
