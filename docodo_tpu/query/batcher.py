"""Batched on-device query serving.

The reference serves each HTTP request on its own thread through a
global search lock (ref /server.cs:29-30, Docodo.NET/Index.cs:399) — one
query at a time. Here concurrent requests are MICRO-BATCHED: a collector
thread drains the request queue (up to `max_batch` or `max_wait_ms`),
compiles every batchable query to term-id form, and evaluates the whole
batch as one device program (ops/device_index). Requests the device path
doesn't cover (wildcards, field filters, OR operators, regex filters)
fall back to the host engine transparently.

Device-mode results carry doc/page ids, ranks and hit counts — the
position/snippet materialization stays host-side and is served by the
normal path when needed.
"""

from __future__ import annotations

import math
import queue
import re
import threading
import time
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from docodo_tpu.constants import DOC_RANK_MULTIPLY
from docodo_tpu.ops.device_index import DeviceIndex
from docodo_tpu.query.search import ResultDocPage, ResultDocument, SearchResult

_UNSUPPORTED = re.compile(r'[|?{}"~]|-filter:')
_DEFAULT_DIST = 255


def compile_request(index, req: str) -> Optional[List[Tuple[str, int]]]:
    """Compile an AND-only request into device (term-key, R) pairs.

    Mirrors the host pipeline's word handling (sanitize, 3..32 length,
    stop words, voc-code preference — ref Search.cs:319-363, 192-260)
    for the subset the device fast path evaluates: space-separated words
    and quoted exact phrases. Returns None when the request needs the
    host engine.
    """
    if _UNSUPPORTED.search(req.replace('"', "")):
        return None
    stripped = req.strip()
    quoted = False
    if '"' in req:
        # only a FULLY quoted request maps cleanly (partial quoting mixes
        # exact and free modes — host engine handles that)
        if not (
            req.count('"') == 2
            and stripped.startswith('"')
            and stripped.endswith('"')
        ):
            return None
        quoted = True
    body = req.replace('"', " ")
    body = re.sub(r"[^\w ]|_+", " ", body)
    words = [w for w in body.split() if len(w) >= 3]
    words = [w for w in words if w.lower() not in index.stop_words]
    if not words or len(words) > 8:
        return None
    out = []
    coder = index.word_coder
    for w in words:
        exact = quoted or (w.upper() == w and index.b_keep_forms)
        lw = w.lower()
        codes = list(coder.codes(lw))
        if not codes:
            return None
        selfcodes = [c for c in codes if re.match(r"\w", c[0])]
        known = [c for c in codes if c not in selfcodes]
        if exact:
            chosen = selfcodes[:1]
        else:
            chosen = known if known else selfcodes[:1]
        if not chosen:
            return None
        r = -(len(lw) + 4) if exact else _DEFAULT_DIST + len(lw)
        out.append((chosen, r))
    return out


@dataclass
class _Pending:
    compiled: list
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[SearchResult] = None


class BatchExecutor:
    """Micro-batching device query executor."""

    def __init__(self, index, device_index: Optional[DeviceIndex] = None,
                 max_batch: int = 512, max_wait_ms: float = 2.0):
        self.index = index
        self.di = device_index or DeviceIndex.from_index(index)
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        self.stats = {"batches": 0, "device_queries": 0, "host_queries": 0}

    # ---- public ----------------------------------------------------------
    def search(self, req: str, timeout: float = 30.0) -> SearchResult:
        compiled = compile_request(self.index, req)
        if compiled is not None and any(len(c) > 1 for c, _ in compiled):
            # a word matching several vocabularies ORs all its group
            # codes on the host path — serve those host-side
            compiled = None
        if compiled is None:
            self.stats["host_queries"] += 1
            return self.index.search(req)
        flat = [(codes[0], r) for codes, r in compiled]
        p = _Pending(compiled=flat)
        self._q.put(p)
        if not p.event.wait(timeout):
            return self.index.search(req)  # device stall: serve host-side
        return p.result

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    # ---- batching loop ---------------------------------------------------
    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            t0 = time.perf_counter()
            while len(batch) < self.max_batch:
                left = self.max_wait_s - (time.perf_counter() - t0)
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            try:
                self._execute(batch)
            except Exception as e:  # noqa: BLE001 — fail the whole batch over
                for p in batch:
                    if p.result is None:
                        p.result = SearchResult()
                        p.result.success = False
                        p.result.error = str(e)
                    p.event.set()

    # serving trades padding waste for a BOUNDED compile-shape count:
    # query batches churn, so tight caps would compile endlessly
    CAP_LADDER = (128, 1024, 16384, 1 << 17)

    def _execute(self, batch: List[_Pending]) -> None:
        pages, ranks, counts = self.di.search_batch(
            [p.compiled for p in batch], topk=16,
            cap_ladder=self.CAP_LADDER,
        )
        self.stats["batches"] += 1
        self.stats["device_queries"] += len(batch)
        for row, p in enumerate(batch):
            res = SearchResult()
            docs = {}
            for k in range(pages.shape[1]):
                pg = int(pages[row, k])
                if pg < 0:
                    continue
                page = ResultDocPage(self.di.page_ids[pg])
                page.pos = [0] * int(counts[row, k])  # count only; no offsets
                res.found_pages.append(page)
                dname = self.di.doc_names[int(self.di.page_doc_np[pg])]
                doc = docs.get(dname)
                if doc is None:
                    doc = ResultDocument(dname)
                    docs[dname] = doc
                    res.found_docs.append(doc)
                doc.pages.append(page)
                doc.rank += float(ranks[row, k])
            # doc rank formula matches the host engine (ref
            # Search.cs:552-557): 1 + ln(sum page ranks), x10 when the
            # first found page is the header page "0"
            for doc in res.found_docs:
                total = doc.rank
                doc.rank = 1 + math.log(total) if total > 0 else 1.0
                # device pages arrive in rank order, not coordinate
                # order; the header page "0" is coordinate-first when
                # hit at all, so "any" is the host-equivalent test
                if any(pg.id == "0" for pg in doc.pages):
                    doc.rank *= DOC_RANK_MULTIPLY
            res.found_docs.sort(key=lambda d: d.rank)
            p.result = res
            p.event.set()
