"""The Index facade: build pipeline, storage orchestration, and search.

Mirrors the reference's Index partial class (ref Docodo.NET/Index.cs,
Build.cs, Search.cs) with an array-first design:

* the index is an ArrayIndex (CSR postings over one uint64 coordinate
  vector) plus a PageTable (vectorized coordinate->page resolution);
* the build pipeline tokenizes pages into NumPy token batches, expands
  word->keys through a cached WordCoder, and spills sorted (term, coords)
  runs that merge with coordinate shifts — the reference's thread-sharded
  build (ref Index.cs:536-752) recast as array concatenation + stable sort;
* search parses the request into an operator AST and evaluates it over
  PostingSeq algebra (host NumPy) or the batched device path in ops/.
"""

from __future__ import annotations

import itertools
import math
import os
import re
import shutil
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from docodo_tpu import constants as C
from docodo_tpu.core import storage, varint
from docodo_tpu.core.pagetable import PageTable, _read_str, _write_str
from docodo_tpu.core.postings import PostingSeq
from docodo_tpu.core.storage import ArrayIndex
from docodo_tpu.lang import stemmers as stemmers_mod
from docodo_tpu.lang import tokenizer
from docodo_tpu.lang.vocab import Vocab, load_stop_words
from docodo_tpu.lang.wordcodes import WordCoder
from docodo_tpu.query import parser as qparser
from docodo_tpu.utils import profiling
from docodo_tpu.query import search as qsearch
from docodo_tpu.query.parser import QuerySyntaxError, WordThunk
from docodo_tpu.query.search import (
    ErrorSearchResult,
    SearchResult,
    combine_search_results,
    highlight_positions,
    prepare_page_text,
    prepare_search_result,
)
from docodo_tpu.sources.cache import IndexTextCacheDataSource

CACHE_END = ".cache.zip"


def levenshtein(s: str, t: str) -> int:
    """Edit distance (ref Index.cs:46-89)."""
    n, m = len(s), len(t)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if t[j - 1] == s[i - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


class SearchOptions:
    def __init__(self, dist: int = 0, do_correction: bool = False,
                 remove_word_breaks: bool = True):
        self.dist = dist
        self.do_correction = do_correction
        self.remove_word_breaks = remove_word_breaks


_FILTER_RE = re.compile(r"\B-filter:((?:[\w*?\\.()+{}/]+,?)+)")


class Index:
    """Positional full-text index with morphological search."""

    def __init__(self, path: Optional[str] = None, in_memory: bool = True,
                 vocs: Optional[Sequence[Vocab]] = None):
        self.work_path = path if path is not None else os.path.join(".", "index")
        self.in_memory = in_memory
        self.vocs: List[Vocab] = list(vocs) if vocs else []
        self.stop_words: set = set()
        self.stemmers = list(stemmers_mod.KNOWN_STEMMERS)
        self.b_keep_forms = True
        self.max_degree_of_parallelism = 2
        self.max_tmp_index_items = C.MAX_TMP_INDEX_ITEMS
        self.arr: Optional[ArrayIndex] = None
        self.pages: Optional[PageTable] = None
        self.sources: List = []
        self.can_search = False
        self.status = "Idle"
        # bumped whenever new index arrays install (load / rebuild):
        # device-serving wrappers re-stage when it changes
        self.generation = 0
        self._search_lock = threading.RLock()
        self._cancel = threading.Event()
        self._coder: Optional[WordCoder] = None
        self._coder_key = None
        # builder-dir -> (terms, offsets, coords) of unspilled saves,
        # consumed by the identity-merge fast path in _merge_indexes
        self._task_arrays: Dict[str, tuple] = {}
        if path is not None:
            self.load()

    # ------------------------------------------------------------------ config
    def add_voc(self, voc: Vocab) -> None:
        self.vocs.append(voc)

    def load_stop_words(self, path: str) -> None:
        self.stop_words = load_stop_words(path)

    def add_stop_words(self, words) -> None:
        self.stop_words.update(words)

    @property
    def word_coder(self) -> WordCoder:
        key = (
            tuple(id(v) for v in self.vocs),
            len(self.stop_words),
            hash(frozenset(self.stop_words)) if len(self.stop_words) < 100000 else 0,
            tuple((lang, id(fn)) for lang, fn, _ in self.stemmers),
        )
        if self._coder is None or key != self._coder_key:
            self._coder = WordCoder(
                vocs=self.vocs,
                stop_words=self.stop_words,
                stemmer_table=self.stemmers,
            )
            self._coder_key = key
        return self._coder

    # ------------------------------------------------------------------ state
    @property
    def count(self) -> int:
        return len(self.arr) if self.arr is not None else 0

    @property
    def max_coord(self) -> int:
        return self.arr.max_coord if self.arr is not None else 0

    @property
    def is_creating(self) -> bool:
        return self.status != "Idle"

    @property
    def can_index(self) -> bool:
        return bool(self.sources) and not self.is_creating

    def __getitem__(self, key: str) -> PostingSeq:
        coords = self.arr.get(key)
        if coords is None:
            raise KeyError(key)
        return PostingSeq(coords)

    def cancel(self) -> None:
        self._cancel.set()

    # ------------------------------------------------------------------ sources
    def add_data_source(self, source) -> None:
        wrapped = IndexTextCacheDataSource(
            source, os.path.join(self.work_path, source.name + CACHE_END)
        )
        self.sources.append(wrapped)

    # ------------------------------------------------------------------ storage
    def load(self) -> bool:
        index_file = os.path.join(self.work_path, storage.INDEX_FILE)
        pages_file = os.path.join(self.work_path, storage.PAGES_FILE)
        if not (os.path.exists(index_file) and os.path.exists(pages_file)):
            return False
        self.can_search = False
        try:
            if self.arr is not None:
                self.arr.close()
            self.arr = storage.read_index(index_file, in_memory=self.in_memory)
            with open(pages_file, "rb") as f:
                self.pages = PageTable.load(f)
            self.generation += 1
            self.can_search = True
            return True
        except Exception as e:  # parity: log-and-continue (ref Index.cs:374-377)
            print(f"Can't load: {e}")
            return False

    def close(self) -> None:
        self.can_search = False
        if self.arr is not None:
            self.arr.close()

    def dispose(self) -> None:
        self.close()
        for s in self.sources:
            if isinstance(s, IndexTextCacheDataSource):
                s.close()
        self.sources = []
        self.arr = None
        self.pages = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.dispose()
        return False

    # ------------------------------------------------------------------ build
    def get_builder(self) -> "IndexBuilder":
        return IndexBuilder(parent=self)

    def create(self) -> None:
        """Full rebuild from data sources (ref Index.cs:424-534)."""
        if not self.sources:
            return
        if self.status != "Idle":
            return
        start = time.time()
        self.status = "Nav"
        self._cancel = threading.Event()
        try:
            os.makedirs(self.work_path, exist_ok=True)
            self._task_arrays.clear()
            for d in os.listdir(self.work_path):
                full = os.path.join(self.work_path, d)
                if os.path.isdir(full):
                    shutil.rmtree(full)

            tmp_caches = []
            task_sources = []
            for source in self.sources:
                if isinstance(source, IndexTextCacheDataSource):
                    tmp = IndexTextCacheDataSource(
                        source.source,
                        os.path.join(self.work_path, source.name + CACHE_END + "_"),
                    )
                    tmp_caches.append(tmp)
                else:
                    tmp = source
                tmp.reset()
                task_sources.append(tmp)

            threads = []
            errors: List[BaseException] = []

            def run_task(src):
                try:
                    self._index_task(src)
                except BaseException as e:  # noqa: BLE001
                    errors.append(e)

            for src in task_sources:
                for _ in range(max(1, self.max_degree_of_parallelism)):
                    t = threading.Thread(target=run_task, args=(src,), daemon=True)
                    threads.append(t)
                    t.start()
            self.status = "Index"
            with profiling.phase("index.tokenize"):
                for t in threads:
                    t.join()
            for tmp in tmp_caches:
                tmp.close()
            if errors:
                raise errors[0]
            if self._cancel.is_set():
                # cancelled during indexing: abandon the partial build
                # (ref: a cancelled CreateAsync leaves the old index
                # intact and restarts from scratch, Index.cs:434-444)
                for d in os.listdir(self.work_path):
                    full = os.path.join(self.work_path, d)
                    if os.path.isdir(full):
                        shutil.rmtree(full, ignore_errors=True)
                self.status = "Idle"
                print("Indexing was cancelled.")
                return

            self.status = "Merge"
            t_merge = time.time()
            dirs = sorted(
                (
                    d for d in os.listdir(self.work_path)
                    if os.path.isdir(os.path.join(self.work_path, d))
                ),
                key=lambda d: int(d) if d.isdigit() else 1 << 30,
            )
            files = []
            for d in dirs:
                full = os.path.join(self.work_path, d)
                spills = sorted(
                    (f for f in os.listdir(full) if f.endswith(".tmpind")),
                    key=lambda f: int(f.split(".")[0]),
                )
                if not spills:
                    continue
                merged = os.path.join(full, "1.tmpind")
                if len(spills) > 1:
                    storage.merge_spills(
                        [os.path.join(full, f) for f in spills],
                        merged + "_",
                        shift_coords=False,
                        mem_items=self.max_tmp_index_items,
                    )
                    for f in spills:
                        os.remove(os.path.join(full, f))
                    os.replace(merged + "_", merged)
                files.append(merged)

            merged = self._merge_indexes(
                files, os.path.join(self.work_path, storage.INDEX_FILE),
                collect=self.in_memory,
            )
            profiling.record("index.merge", time.time() - t_merge)

            with self._search_lock:
                new_sources = []
                for source in self.sources:
                    if isinstance(source, IndexTextCacheDataSource):
                        source.close()
                        final = os.path.join(self.work_path, source.name + CACHE_END)
                        tmp = final + "_"
                        if os.path.exists(tmp):
                            if os.path.exists(final):
                                os.remove(final)
                            os.replace(tmp, final)
                        new_sources.append(
                            IndexTextCacheDataSource(source.source, final)
                        )
                    else:
                        new_sources.append(source)
                self.sources = new_sources

                if merged is not None:
                    # in-memory build: install the merged arrays directly
                    # — the .index on disk is already written; re-reading
                    # it would only re-decode what is in hand
                    records, table, max_coord = merged
                    if (isinstance(records, tuple)
                            and records[0] == "arrays"):
                        # vectorized merge hands whole arrays over — no
                        # per-term record slicing/concat at all
                        _, terms, offsets, coords = records
                    else:
                        terms = [t for t, _ in records]
                        lens = np.fromiter(
                            (c.size for _, c in records), np.int64,
                            len(records)
                        )
                        offsets = np.concatenate(
                            [np.zeros(1, np.int64), np.cumsum(lens)]
                        )
                        coords = (
                            np.concatenate([c for _, c in records])
                            if records else np.zeros(0, dtype=np.uint64)
                        )
                    if self.arr is not None:
                        self.arr.close()
                    self.arr = storage.ArrayIndex.from_postings(
                        terms, offsets, coords, max_coord
                    )
                    self.pages = table
                    self.generation += 1
                    self.can_search = True
                else:
                    self.load()
                    self.can_search = True

            for d in dirs:
                shutil.rmtree(os.path.join(self.work_path, d), ignore_errors=True)
            self.status = "Idle"
            print(f"Time elapsed: {time.time() - start:.1f} s")
        except Exception as e:  # noqa: BLE001 — parity: log, reset state
            print(f"Error: {e}")
            self.status = "Idle"
            self.can_search = False
            raise

    # CreateAsync-style alias
    def create_async(self):
        t = threading.Thread(target=self.create, daemon=True)
        t.start()
        return t

    def _index_task(self, source) -> None:
        """Per-thread worker: pull docs, tokenize pages, feed the builder
        (ref Build.cs:445-564).

        Body pages take the native one-pass tokenize+intern when the C++
        library is available (same fold/class tables as the Python
        tokenizer — one source of truth), expanding word codes once per
        UNIQUE interned id; the pure-Python path remains the fallback
        (DOCODO_NO_NATIVE) and serves header pages."""
        from docodo_tpu.native import pipeline as npipe

        builder = IndexBuilder(parent=self)
        interner = None
        if npipe.get_lib() is not None:
            interner = npipe.NativeInterner()
        id_words: List[str] = []
        coord = 0
        # token batches from many pages accumulate and flush to the
        # builder in big chunks: per-page add_interned calls pay ~0.5 ms
        # of fixed vectorization overhead each (measured — it dominated
        # the facade build), while one call per ~128k tokens amortizes
        # it away. Marks (docs/pages) carry explicit coordinates, so
        # buffering postings does not disturb them; the flush threshold
        # stays under the spill budget so MemUse bounds hold.
        pend_ids: List[np.ndarray] = []
        pend_starts: List[np.ndarray] = []
        pend_n = 0
        flush_at = max(4096, min(131072, builder.max_items // 2))

        def flush():
            nonlocal pend_n
            if not pend_ids:
                return
            with profiling.phase("build.wordcode+gather"):
                id_words.extend(
                    interner.terms_range(len(id_words), len(interner))
                )
                builder.add_interned(
                    np.concatenate(pend_ids),
                    np.concatenate(pend_starts),
                    id_words,
                )
            pend_ids.clear()
            pend_starts.clear()
            pend_n = 0

        while not self._cancel.is_set():
            doc = source.next_document(True)
            if doc is None:
                break
            try:
                flush()  # add_doc's default mark reads builder.max_coord
                builder.add_doc(source.name, doc.name)
                for page in doc:
                    if self._cancel.is_set():
                        break  # cooperative cancel inside huge documents
                    try:
                        if len(page.text) == 0:
                            continue
                        if page.id == "0":
                            flush()
                            coord = self._index_header_page(builder, page.text, coord)
                            builder.end_page(page.id, coord)
                            continue
                        if interner is not None:
                            with profiling.phase("build.tokenize"):
                                ids, starts = npipe.tokenize_intern_native(
                                    page.text, interner,
                                    C.MIN_WORD_LENGTH, C.MAX_WORD_LENGTH,
                                )
                            pend_ids.append(ids)
                            pend_starts.append(
                                starts.astype(np.uint64) + np.uint64(coord)
                            )
                            pend_n += ids.size
                            if pend_n >= flush_at:
                                flush()
                            coord += tokenizer.char_len(page.text)
                            builder.end_page(page.id, coord)
                            continue
                        low = tokenizer.lower_keep_length(page.text)
                        words, starts = tokenizer.tokenize(low, lowered=True)
                        keep = [
                            k for k, w in enumerate(words)
                            if C.MIN_WORD_LENGTH <= len(w) <= C.MAX_WORD_LENGTH
                        ]
                        builder.add_tokens(
                            [words[k] for k in keep],
                            starts[keep] + np.uint64(coord),
                        )
                        coord += tokenizer.char_len(low)
                        builder.end_page(page.id, coord)
                    except Exception as e:  # noqa: BLE001
                        print(f"Error parsing file {doc.name}: {e}")
            except Exception as e:  # noqa: BLE001
                print(f"Error in doc {doc.name}: {e}")
            finally:
                close = getattr(doc, "close", None)
                if close:
                    close()
        flush()
        if interner is not None:
            interner.close()
        with profiling.phase("build.spill-save"):
            builder.save()

    def _index_header_page(self, builder: "IndexBuilder", text: str, coord: int) -> int:
        """Header page: 'name=value' lines index '&name' at the value start
        and the value words after it (ref Build.cs:485-524)."""
        lines = text.split("\n")
        if text.endswith("\n"):
            lines = lines[:-1]
        for line in lines:
            low = line.lower()
            fields = low.split("=")
            if len(fields) > 1 and len(fields[0]) >= C.MIN_WORD_LENGTH:
                pieces = re.split(r"\b", fields[1])
                dc = len(fields[0]) + 1
                for piece in pieces:
                    if len(piece) >= 1 and re.match(r"\w", piece[0]):
                        builder.add(C.FIELD_NAME_CHAR + fields[0], coord + dc - 1)
                        builder.add_word(piece, coord + dc)
                    dc += len(piece)
            coord += len(line) + 1
        return coord

    def _merge_indexes(self, files: List[str], output: str,
                       collect: bool = False):
        """Final cross-builder merge with coordinate shifts
        (ref Index.cs:695-752).

        With `collect`, returns (records, table, max_coord) so an
        in-memory build can install the merged arrays directly instead of
        re-reading (and re-decoding) the .index it just wrote."""
        if not files:
            return None
        records: Optional[list] = [] if collect else None
        arrays: Optional[list] = [] if collect else None
        # identity fast path: ONE file has records, every other file is
        # coordinate-empty, and the task that wrote it registered its
        # in-memory arrays — copy the file, skip parse+decode entirely
        fast = None
        if collect:
            import shutil as _sh

            sizes = [os.path.getsize(p) for p in files]
            nonempty = [i for i, sz in enumerate(sizes) if sz > 8]
            if len(nonempty) == 1:
                def _mc(p):
                    with open(p, "rb") as f:
                        return int.from_bytes(f.read(8), "little")
                i = nonempty[0]
                key = os.path.abspath(files[i])
                if key in self._task_arrays and all(
                    _mc(files[j]) == 0
                    for j in range(len(files)) if j != i
                ):
                    fast = self._task_arrays[key]
                    _sh.copyfile(files[i], output + "_")
                    max_coord = _mc(files[i])
        if fast is not None:
            arrays = [fast]
        else:
            max_coord = storage.merge_spills(
                files, output + "_", shift_coords=True, collect=records,
                mem_items=self.max_tmp_index_items, arrays_out=arrays,
            )
        table = PageTable()
        shift = 0
        for path in files:
            with open(path, "rb") as f:
                mc = int.from_bytes(f.read(8), "little")
            marks_path = os.path.join(os.path.dirname(path), "index.tmplist")
            marks = _load_marks(marks_path)
            table.extend_from_marks(marks, shift)
            shift += mc
        with self._search_lock:
            self.can_search = False
            list_path = output + ".list"
            if os.path.exists(list_path):
                os.remove(list_path)
            with open(list_path, "wb") as f:
                table.save(f)
            if self.arr is not None:
                self.arr.close()
                self.arr = None
            if os.path.exists(output):
                os.remove(output)
            os.replace(output + "_", output)
        for path in files:
            os.remove(path)
        if collect:
            if arrays:
                terms, offsets, coords = arrays[0]
                return ("arrays", terms, offsets, coords), table, max_coord
            return records, table, max_coord
        return None

    # ------------------------------------------------------------------ lookup
    def search_word(self, word: str) -> PostingSeq:
        """Single-word lookup with exact/wildcard handling
        (ref Search.cs:192-260)."""
        b_exact = word.upper() == word and self.b_keep_forms
        word = word.lower()
        total: Optional[PostingSeq] = None
        words = [word]
        if "_" in word:
            if self.b_keep_forms:
                b_exact = True
                words = self.get_like_words(word)
            else:
                return PostingSeq()
        for wword in words:
            codes = list(self.word_coder.codes(wword))
            if codes:
                selfcodes = [c for c in codes if re.match(r"\w", c[0])]
                knowcodes = [c for c in codes if c not in selfcodes]
                if b_exact:
                    chosen = selfcodes[:1]
                else:
                    chosen = knowcodes if knowcodes else selfcodes[:1]
                for code in chosen:
                    coords = self.arr.get(code) if self.arr is not None else None
                    if coords is not None:
                        res = PostingSeq(coords)
                        total = res if total is None else total + res
        if total is None:
            total = PostingSeq()
        if b_exact:
            total.R = -1
        return total

    def search_field(self, field: str, value: str) -> PostingSeq:
        """{field=value} lookup (ref Search.cs:126-155)."""
        try:
            key = C.FIELD_NAME_CHAR + field.lower()
            coords = self.arr.get(key) if self.arr is not None else None
            if coords is None:
                return PostingSeq()
            seq = PostingSeq(coords, R=-1)
            newseq = self.search_word(value.lower())
            return seq * newseq
        except Exception:  # noqa: BLE001
            return PostingSeq()

    def get_like_words(self, word: str) -> List[str]:
        """Wildcard expansion: '_' matches any run (ref Search.cs:160-167)."""
        if "_" not in word or not self.b_keep_forms:
            return [word]
        if len(word) < 2:
            return []
        pattern = re.compile(word.replace("_", ".*"))
        out = []
        for key in self.arr.terms if self.arr is not None else []:
            if key and key[0].isalpha() and pattern.search(key):
                out.append(key)
                if len(out) >= C.MAX_LIKE_WORDS:
                    break
        return out

    def get_close_words(self, word: str) -> List[str]:
        terms = self.arr.terms if self.arr is not None else []
        return sorted(terms, key=lambda s: levenshtein(s, word))[:10]

    def get_suggestions(self, req: str, n: int = 10) -> List[str]:
        """Prefix autocomplete ordered by posting volume
        (ref Search.cs:176-188)."""
        if len(req) < 2 or self.arr is None:
            return []
        parts = [s for s in re.split(r"\b", req) if len(s) > 0]
        if not parts:
            return []
        lastword = parts[-1].lower()
        if len(lastword) < 2:
            return []
        import bisect

        arr = self.arr
        # terms is already a sorted list — bisect avoids building an
        # O(T) object array per keystroke
        lo = bisect.bisect_left(arr.terms, lastword)
        cands = []
        for tid in range(int(lo), len(arr.terms)):
            key = arr.terms[tid]
            if not key.startswith(lastword):
                break
            if key[0] >= "A" and len(key) > len(lastword):
                cands.append((-arr.enc_count(tid), tid, key))
        cands.sort(key=lambda c: c[0])
        return [key[len(lastword):] for _, _, key in cands[:n]]

    def get_words_group(self, code) -> str:
        """Word list of a vocab group code (ref Index.cs:270-281)."""
        if isinstance(code, str):
            if code.startswith(C.KNOWN_WORD_CHAR):
                code = code[1:]
            code = int(code, 16)
        n_voc = code >> 24
        masked = code & C.GROUP_NUMBER_MASK
        voc = self.vocs[n_voc]
        words = [w for w, g in voc.words.items() if g == masked][:20]
        return ",".join(words)

    @staticmethod
    def calc_histogram(index: "Index", n: int = 1000) -> Dict[str, int]:
        """Top-N terms by stored posting volume (ref Index.cs:284-307)."""
        out: Dict[str, int] = {}
        if index.arr is None:
            return out
        arr = index.arr
        order = np.argsort(-arr.enc_counts, kind="stable")[:n]
        for tid in order.tolist():
            key = arr.terms[tid]
            val = int(arr.enc_counts[tid])
            try:
                if key.startswith(C.KNOWN_WORD_CHAR):
                    out["(" + index.get_words_group(key[1:]) + ")"] = val
                else:
                    out[key] = val
            except Exception as e:  # noqa: BLE001
                print(f"Error in Histogram: {e}")
        return out

    # ------------------------------------------------------------------ search
    def search(self, req: str, opt: Optional[SearchOptions] = None) -> SearchResult:
        if not self.can_search:
            return ErrorSearchResult("Index is not built")
        try:
            with self._search_lock:
                req = req.lower()

                filters: List[str] = []
                m = _FILTER_RE.search(req)
                if m:
                    filters = [p for p in m.group(1).split(",") if p]
                req = _FILTER_RE.sub(" ", req)

                thunks: List[WordThunk] = []
                main_expr, fields_expr = qparser.prepare_search_request(
                    req,
                    thunks,
                    search_word=self.search_word,
                    search_field=self.search_field,
                    stop_words=self.stop_words,
                )
                dist = 255 if opt is None else opt.dist
                for t in thunks:
                    t.dist = dist

                res: Optional[PostingSeq] = None
                resf: Optional[PostingSeq] = None
                if main_expr.strip():
                    try:
                        ast = qparser.parse_expression(main_expr, thunks)
                        if ast is not None:
                            res = qparser.eval_ast(ast)
                    except QuerySyntaxError:
                        return ErrorSearchResult("Syntax Error in search request")
                if fields_expr.strip():
                    try:
                        astf = qparser.parse_expression(fields_expr, thunks)
                        if astf is not None:
                            resf = qparser.eval_ast(astf)
                    except QuerySyntaxError:
                        return ErrorSearchResult("Syntax Error in search request")
                if res is None:
                    res = resf
                if res is None:
                    return SearchResult()

                result = prepare_search_result(res.coords, self.pages, filters)
                if resf is not None:
                    result = combine_search_results(
                        result, prepare_search_result(resf.coords, self.pages, [])
                    )

                self._materialize_docs(result)
                result.found_docs.sort(key=lambda d: d.rank)
                result.words = [t.info for t in thunks]
                return result
        except Exception as e:  # noqa: BLE001
            print(f"Error: {e}")
            return ErrorSearchResult(f"Error: {e}")

    def _materialize_docs(self, result: SearchResult) -> None:
        """Doc ranks, headers, snippets (ref Search.cs:552-597)."""
        for doc in result.found_docs:
            total = sum(p.rank for p in doc.pages)
            doc.rank = 1 + math.log(total) if total > 0 else 1.0
            first_is_header = bool(doc.pages) and doc.pages[0].id == "0"
            if first_is_header:
                doc.rank *= C.DOC_RANK_MULTIPLY
            doc.found_words = []
            srcname = doc.name.split(":")[0]
            source = next(
                (s for s in self.sources if s.name == srcname), None
            )
            if source is not None and hasattr(source, "__getitem__"):
                document = source[doc.name[len(srcname) + 1:]]
                if document is not None:
                    headers_text = document["0"].text
                    if first_is_header:
                        headers_text = highlight_positions(
                            headers_text, doc.pages[0].pos
                        )
                    doc.make_headers(headers_text)
                    doc.pages = [p for p in doc.pages if p.id != "0"]
                    for page in doc.pages:
                        text, matched = prepare_page_text(
                            page, document[page.id].text, C.MAX_FOUND_PAGE_TEXT
                        )
                        page.text = text
                        doc.found_words.extend(matched)
                    if doc.pages:
                        top = sorted(doc.pages, key=lambda p: p.rank)[:3]
                        top = sorted(top, key=lambda p: p.id)
                        doc.summary = " ... ".join(
                            p.text or "" for p in top
                        )
                    document.close()
            seen = set()
            doc.found_words = [
                w for w in doc.found_words if not (w in seen or seen.add(w))
            ]


def _load_marks(path: str) -> List[Tuple[str, int]]:
    marks = []
    with open(path, "rb") as f:
        while True:
            s = _read_str(f)
            if s is None:
                break
            raw = f.read(8)
            if len(raw) < 8:
                break
            marks.append((s, int.from_bytes(raw, "little")))
    return marks


def _save_marks(path: str, marks: List[Tuple[str, int]]) -> None:
    with open(path, "wb") as f:
        for key, coord in marks:
            _write_str(f, key)
            f.write(int(coord).to_bytes(8, "little"))


class IndexBuilder:
    """Thread-safe-ish posting accumulator with spill-to-disk
    (ref Build.cs:258-437). One builder per build thread.

    Standalone use:
        bldr = IndexBuilder(path="idx").add_voc(voc)
        bldr.add_doc("A", ""); bldr.add_word(w, coord); bldr.end_page("1")
        index = bldr.build()
    """

    _counter = itertools.count()

    def __init__(self, parent: Optional[Index] = None, path: Optional[str] = None,
                 in_memory: bool = True, vocs=None, stop_words_file=None):
        if parent is None:
            parent = Index(path, in_memory, vocs)
            if stop_words_file:
                parent.load_stop_words(stop_words_file)
        self.parent = parent
        self.max_items = parent.max_tmp_index_items
        self.n_builder = next(IndexBuilder._counter)
        self.path = os.path.join(parent.work_path, str(self.n_builder))
        os.makedirs(self.path, exist_ok=True)
        self.n_tmp_index = 0
        self.total_count = 0
        self.max_coord = 0
        self.marks: List[Tuple[str, int]] = []
        self._reset_buffers()

    def _reset_buffers(self) -> None:
        self._terms: List[str] = []
        self._tmap: Dict[str, int] = {}
        self._word_tids: Dict[str, np.ndarray] = {}
        # interner id -> tid rows, stored densely (interner ids are
        # dense): lens/offs LUT arrays + one flat tid array. -1 len =
        # not yet expanded (reset on spill: tids renumber per spill)
        self._code_lens = np.full(1024, -1, dtype=np.int64)
        self._code_offs = np.zeros(1024, dtype=np.int64)
        self._code_flat = np.empty(4096, dtype=np.int64)
        self._code_flat_n = 0
        self._chunk_tids: List[np.ndarray] = []
        self._chunk_coords: List[np.ndarray] = []
        self._one_tids: List[int] = []
        self._one_coords: List[int] = []

    # fluent config (standalone path)
    def add_voc(self, voc: Vocab) -> "IndexBuilder":
        self.parent.add_voc(voc)
        return self

    def stop_words(self, path: str) -> "IndexBuilder":
        self.parent.load_stop_words(path)
        return self

    # ------------------------------------------------------------------ feed
    def _tid(self, code: str) -> int:
        tid = self._tmap.get(code)
        if tid is None:
            tid = len(self._terms)
            self._tmap[code] = tid
            self._terms.append(code)
        return tid

    def add(self, code: str, coord: int) -> None:
        """Add one posting; coords must ascend per call (ref Build.cs:324-341)."""
        self.max_coord = int(coord)
        self._one_tids.append(self._tid(code))
        self._one_coords.append(int(coord))
        self.total_count += 1
        if self.total_count > self.max_items:
            self.save(save_pages=False)
            self._reset_buffers()
            self.total_count = 0

    def add_word(self, word: str, coord: int) -> None:
        for code in self.parent.word_coder.codes(word):
            self.add(code, coord)

    def add_tokens(self, words: List[str], coords: np.ndarray) -> None:
        """Bulk path: expand a token batch through the word coder and append
        as arrays (vectorized expansion via np.unique + gather)."""
        if not words:
            return
        coder = self.parent.word_coder
        uarr, inv = np.unique(np.asarray(words, dtype=object), return_inverse=True)
        flat: List[np.ndarray] = []
        lens = np.empty(uarr.size, dtype=np.int64)
        for k, w in enumerate(uarr.tolist()):
            arr = self._word_tids.get(w)
            if arr is None:
                arr = np.array(
                    [self._tid(c) for c in coder.codes(w)], dtype=np.int64
                )
                self._word_tids[w] = arr
            flat.append(arr)
            lens[k] = arr.size
        flat_u = np.concatenate(flat) if flat else np.zeros(0, dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        counts = lens[inv]
        total = int(counts.sum())
        if total:
            gather = (
                np.repeat(offs[inv], counts)
                + np.arange(total)
                - np.repeat(np.cumsum(counts) - counts, counts)
            )
            tids = flat_u[gather]
            out_coords = np.repeat(
                np.asarray(coords, dtype=np.uint64), counts
            )
            self._chunk_tids.append(tids)
            self._chunk_coords.append(out_coords)
            self.total_count += total
        if len(coords):
            self.max_coord = int(coords[-1])
        if self.total_count > self.max_items:
            self.save(save_pages=False)
            self._reset_buffers()
            self.total_count = 0

    def add_interned(self, ids: np.ndarray, coords: np.ndarray,
                     id_words: List[str]) -> None:
        """Bulk path over PRE-INTERNED tokens (the native tokenizer's
        dense ids): word-code expansion runs once per unique id, the
        token stream fans out through one vectorized gather — no
        per-token Python, no object-array unique (ref Build.cs:526-530,
        the AddWord hot loop, recast as array ops)."""
        if ids.size == 0:
            if len(coords):
                self.max_coord = int(coords[-1])
            return
        coder = self.parent.word_coder
        hi = len(id_words)
        if self._code_lens.size < hi:
            grow = max(hi, 2 * self._code_lens.size)
            lens2 = np.full(grow, -1, dtype=np.int64)
            lens2[: self._code_lens.size] = self._code_lens
            self._code_lens = lens2
            offs2 = np.zeros(grow, dtype=np.int64)
            offs2[: self._code_offs.size] = self._code_offs
            self._code_offs = offs2
        lens_lut = self._code_lens
        offs_lut = self._code_offs
        unseen = lens_lut[ids] < 0
        if unseen.any():
            new_ids = np.unique(ids[unseen]).tolist()
            coder.prime(id_words[i] for i in new_ids)  # one bulk stem
            code_rows = [coder.codes(id_words[i]) for i in new_ids]
            # inline the _tid intern (dict get-or-append): a method call
            # + np.fromiter generator per code measured ~2x the cost of
            # this plain loop on the facade-build hot path
            tmap = self._tmap
            terms = self._terms
            flat_list: List[int] = []
            fl_append = flat_list.append
            for row in code_rows:
                for c in row:
                    t = tmap.get(c)
                    if t is None:
                        t = len(terms)
                        tmap[c] = t
                        terms.append(c)
                    fl_append(t)
            pos = self._code_flat_n
            need = pos + len(flat_list)
            if need > self._code_flat.size:
                flat2 = np.empty(
                    max(need, 2 * self._code_flat.size), dtype=np.int64
                )
                flat2[:pos] = self._code_flat[:pos]
                self._code_flat = flat2
            self._code_flat[pos:need] = flat_list
            self._code_flat_n = need
            new_arr = np.asarray(new_ids, dtype=np.int64)
            row_lens = np.fromiter(
                (len(r) for r in code_rows), np.int64, len(code_rows)
            )
            offs_lut[new_arr] = pos + np.cumsum(row_lens) - row_lens
            lens_lut[new_arr] = row_lens
        counts = lens_lut[ids]
        total = int(counts.sum())
        if total:
            starts = offs_lut[ids]
            gather = (
                np.repeat(starts, counts)
                + np.arange(total)
                - np.repeat(np.cumsum(counts) - counts, counts)
            )
            self._chunk_tids.append(self._code_flat[gather])
            self._chunk_coords.append(
                np.repeat(np.asarray(coords, dtype=np.uint64), counts)
            )
            self.total_count += total
        if len(coords):
            self.max_coord = int(coords[-1])
        if self.total_count > self.max_items:
            self.save(save_pages=False)
            self._reset_buffers()
            self.total_count = 0

    def add_doc(self, sourceid: str, name: str, maxcoord: Optional[int] = None) -> None:
        self.marks.append(
            (f"{sourceid}{C.DOC_SEP}{name}",
             self.max_coord if maxcoord is None else maxcoord)
        )

    def end_page(self, page_id: str, maxcoord: Optional[int] = None) -> None:
        self.marks.append(
            (C.DOC_SEP + page_id,
             self.max_coord if maxcoord is None else maxcoord)
        )

    # ------------------------------------------------------------------ output
    def _gather_sorted(self):
        """Collapse buffers into term-ordinal-sorted (terms, offsets, coords)."""
        parts_t = list(self._chunk_tids)
        parts_c = list(self._chunk_coords)
        if self._one_tids:
            parts_t.append(np.array(self._one_tids, dtype=np.int64))
            parts_c.append(np.array(self._one_coords, dtype=np.uint64))
        if not parts_t:
            return [], np.zeros(1, dtype=np.int64), np.zeros(0, dtype=np.uint64)
        tids = np.concatenate(parts_t)
        coords = np.concatenate(parts_c)
        order_terms = sorted(range(len(self._terms)), key=self._terms.__getitem__)
        # int32 keys: numpy's stable argsort radix-sorts ints — half the
        # passes of int64 (term count is bounded way below 2**31)
        rank = np.empty(len(self._terms), dtype=np.int32)
        rank[np.array(order_terms, dtype=np.int64)] = np.arange(
            len(order_terms), dtype=np.int32
        )
        keys = rank[tids]
        perm = np.argsort(keys, kind="stable")
        coords = coords[perm]
        counts = np.bincount(keys, minlength=len(self._terms))
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        terms_sorted = [self._terms[i] for i in order_terms]
        # drop empty terms (possible after spills)
        keep = counts > 0
        if not keep.all():
            terms_sorted = [t for t, k in zip(terms_sorted, keep) if k]
            new_offsets = np.concatenate(
                [[0], np.cumsum(counts[keep])]
            ).astype(np.int64)
            offsets = new_offsets
        return terms_sorted, offsets, coords

    def save(self, save_pages: bool = True) -> None:
        """Spill current postings to <n>.tmpind (ref Build.cs:370-404)."""
        self.n_tmp_index += 1
        terms, offsets, coords = self._gather_sorted()
        out = os.path.join(self.path, f"{self.n_tmp_index}.tmpind")
        with open(out, "wb") as f:
            storage.write_postings_arrays(
                f, self.max_coord, terms, offsets, coords
            )
        # unspilled single-file builds register their arrays so an
        # identity merge can skip re-decoding the file it just wrote
        if self.n_tmp_index == 1:
            self.parent._task_arrays[os.path.abspath(out)] = (
                terms, offsets, coords
            )
        else:
            self.parent._task_arrays.pop(
                os.path.abspath(
                    os.path.join(self.path, "1.tmpind")
                ), None,
            )
        if save_pages:
            _save_marks(os.path.join(self.path, "index.tmplist"), self.marks)

    def build(self) -> Index:
        """Standalone small-index build (ref Build.cs:407-434)."""
        if self.n_tmp_index != 0:
            raise RuntimeError("Can't build, index is too large")
        if not self.marks:
            self.add_doc("", "", 0)
            self.end_page("1")
        with self.parent._search_lock:
            self.save()
            self.parent.close()
            work = self.parent.work_path
            index_path = os.path.join(work, storage.INDEX_FILE)
            list_path = os.path.join(work, storage.PAGES_FILE)
            for p in (index_path, list_path):
                if os.path.exists(p):
                    os.remove(p)
            os.replace(os.path.join(self.path, "1.tmpind"), index_path)
            table = PageTable.from_marks(self.marks)
            with open(list_path, "wb") as f:
                table.save(f)
            self.parent.load()
        return self.parent
