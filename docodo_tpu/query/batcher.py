"""Batched on-device query serving.

The reference serves each HTTP request on its own thread through a
global search lock (ref /server.cs:29-30, Docodo.NET/Index.cs:399) — one
query at a time. Here concurrent requests are MICRO-BATCHED: a collector
thread drains the request queue (up to `max_batch` or `max_wait_ms`),
compiles every batchable query to term-id form, and evaluates the whole
batch as one device program (ops/device_index). Requests the device path
doesn't cover (wildcards, field filters, regex filters) fall back to the
host engine transparently.

Coverage: the device path evaluates every query whose operator AST is a
conjunction of OR-groups of words — plain AND queries, quoted phrases,
`a|b` alternations, and multi-vocabulary morphological words (each word
contributes its voc-group/raw/stem codes as OR'd variants, ref
Search.cs:226-247). The device returns the top-k pages AND the exact hit
coordinate stream inside them, so results carry real per-page positions
(`ResultDocPage.pos`, ref Search.cs:381) and are materialized through
the same prepare_search_result/_materialize_docs pipeline as the host
engine — device-served results match the host engine's bit for bit
whenever the result fits the top-k/hit_cap budget; larger results
(n_pages > topk or n_hits > hit_cap) re-serve host-side for exactness
(on the CALLER's thread — fallbacks inside the collector would serialize
every pending batch behind them). `SearchResult.words` is filled from
per-word resolved posting counts, cached per index generation.
"""

from __future__ import annotations

import queue
import re
import threading
import time
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from docodo_tpu.ops.device_index import INT32_MAX, DeviceIndex
from docodo_tpu.query import parser as qparser
from docodo_tpu.query.parser import WordThunk
from docodo_tpu.query.search import (
    SearchResult,
    finalize_doc_ranks,
    prepare_search_result,
)

_DEFAULT_DIST = 255
# only `~` stays host-bounced — the REFERENCE gives it no semantics
# either: it survives the sanitizer char class (Search.cs:325) but
# IndexSequence overloads only & * + (IndexSequence.cs:205-286), so a
# surviving ~ makes DynamicExpresso evaluation fail — our host parser's
# syntax-error path is the parity behavior. Wildcards, field queries
# and -filter: regexes all serve through the device path.
_UNSUPPORTED = re.compile(r"~")
_MAX_WORDS = 8
# wildcard expansions OR up to MAX_LIKE_WORDS (=100) raw-form keys into
# one variant group (ref Search.cs:158-167); morphological groups stay
# small, so large V only appears for wildcards, budget-gated below
_MAX_VARIANTS = 100
# posting-volume budget for one device row: V-bucket x cap-bucket of the
# widest group — a wildcard matching a frequent term would otherwise
# materialize a multi-GB merged stream on device
_ROW_BUDGET = 1 << 18


def _disjunct_words(node) -> Optional[List[WordThunk]]:
    """Flatten one AND operand into OR'd word leaves; None for nested
    AND (e.g. a quoted phrase inside an OR branch)."""
    if isinstance(node, WordThunk):
        return [node]
    if isinstance(node, tuple) and node[0] == "or":
        left = _disjunct_words(node[1])
        right = _disjunct_words(node[2])
        if left is None or right is None:
            return None
        return left + right
    return None


def _chosen_codes(index, word: str, b_exact: bool) -> Tuple[str, ...]:
    """The host search_word code-preference rule for ONE form: exact
    mode takes the raw form only; otherwise voc-group '#' codes win over
    the raw form (ref Search.cs:226-233)."""
    codes = list(index.word_coder.codes(word))
    if not codes:
        return ()
    selfcodes = [c for c in codes if re.match(r"\w", c[0])]
    known = [c for c in codes if c not in selfcodes]
    chosen = selfcodes[:1] if b_exact else (known or selfcodes[:1])
    return tuple(chosen)


def _word_codes(index, word: str) -> Optional[Tuple[Tuple[str, ...], int]]:
    """One word -> (chosen index keys, R), mirroring the host
    search_word preference rules (ref Search.cs:192-260): ALL-UPPERCASE
    (quoted) words are exact (single raw-form key, negative ordered R);
    `_` wildcards expand via get_like_words into an OR of up to 100
    raw-form keys in exact mode (ref Search.cs:158-167, 206-217);
    otherwise voc-group '#' codes win over the raw form."""
    b_exact = word.upper() == word and index.b_keep_forms
    lw = word.lower()
    if "_" in lw:
        if not index.b_keep_forms:
            return None  # host returns an empty seq: matches nothing
        variants: List[str] = []
        for w in index.get_like_words(lw):
            for c in _chosen_codes(index, w, b_exact=True):
                if c not in variants:
                    variants.append(c)
        if not variants:
            return None
        return tuple(variants), -(len(lw) + 4)
    chosen = _chosen_codes(index, lw, b_exact)
    if not chosen:
        return None
    r = -(len(lw) + 4) if b_exact else _DEFAULT_DIST + len(lw)
    return chosen, r


_EMPTY_GROUP = ((("\0",), 1),)  # impossible key: matches nothing on device


def _compile_group(index, node) -> Optional[Tuple[Tuple[str, ...], int]]:
    """One OR-group of word leaves -> (variant keys, group R), or None
    when the node isn't a flat OR of words. A group whose every branch
    is empty (stop word) compiles to ((), 0) — "matches nothing".

    Group R mirrors the reference operator+ combine: max magnitude,
    ordered only if every member is ordered (IndexSequence.cs:286-322).
    """
    leaves = _disjunct_words(node)
    if leaves is None:
        return None
    variants: List[str] = []
    rs: List[int] = []
    for leaf in leaves:
        wc = _word_codes(index, leaf.word)
        if wc is None:
            continue  # empty branch contributes nothing to the OR
        codes, r = wc
        variants.extend(c for c in codes if c not in variants)
        rs.append(r)
    if not variants:
        return (), 0
    mag = max(abs(r) for r in rs)
    return tuple(variants), (-mag if all(r < 0 for r in rs) else mag)


def _spine(index, node) -> Optional[list]:
    """Left-spine linearization: the device kernel evaluates queries as
    a LEFT FOLD of pairwise proximity-ANDs, which reproduces the host
    AST evaluation exactly when the AND tree is a left spine (every
    right child an atomic OR-group) — the shape the parser emits for
    sequences without parentheses (and for a fully quoted phrase)."""
    g = _compile_group(index, node)
    if g is not None:
        return [g]
    if not (isinstance(node, tuple) and node[0] == "and"):
        return None
    left = _spine(index, node[1])
    if left is None:
        return None
    right = _compile_group(index, node[2])
    if right is None:
        return None
    return left + [right]


def _and_subtrees(node) -> list:
    """Conjunction operands as the parser chained them: only the LEFT
    spine unrolls (the parser left-associates sequences); each right
    child stays one operand — a parenthesized subtree survives intact."""
    if isinstance(node, tuple) and node[0] == "and":
        return _and_subtrees(node[1]) + [node[2]]
    return [node]


def _linearize(index, ast) -> Optional[list]:
    """AST -> fold-ordered group list, or None for shapes the linear
    fold can't reproduce (those fall back to the host AST evaluator).

    Two accepted shapes:
    * a left spine — fold order IS the host evaluation order;
    * a spine containing exactly ONE parenthesized ordered sub-phrase
      (a quoted phrase inside a free query, e.g. `word "a b"`) with
      every other group unordered: the phrase moves to the FRONT of the
      fold. Valid because the phrase folds first (preserving its ordered
      cut) and every subsequent step combines to an unordered R, and
      unordered proximity-AND is commutative/associative in its operand
      set (both orders merge the same streams with the same window).
    """
    lst = _spine(index, ast)
    if lst is not None:
        return lst
    phrase = None
    rest = []
    for sub in _and_subtrees(ast):
        g = _compile_group(index, sub)
        if g is not None:
            if g[0] and g[1] < 0:
                return None  # bare ordered group outside the spine case
            rest.append(g)
            continue
        sp = _spine(index, sub)
        if sp is None or phrase is not None:
            return None  # nested non-spine, or a second phrase
        if not all(r < 0 for codes, r in sp if codes):
            return None
        phrase = sp
    if phrase is None:
        return None
    return phrase + rest


def _row_budget_ok(index, groups) -> bool:
    """Device-row size gate: V-bucket x cap-bucket of the widest group
    must stay within _ROW_BUDGET — wildcard expansions can pull a
    frequent term into a 100-way variant OR whose merged stream would
    not fit sanely on device. Only checked when some group exceeds the
    small-variant regime (<= 8), so normal queries skip the walk."""
    if all(len(codes) <= 8 for codes, _ in groups):
        return True
    need = 1
    vmax = 1
    for codes, _ in groups:
        vb = 1
        while vb < max(len(codes), 1):
            vb <<= 1
        vmax = max(vmax, vb)
        for c in codes:
            a = index.arr.get(c)
            if a is not None:
                need = max(need, int(a.size))
    capb = 128
    while capb < need:
        capb <<= 1
    return vmax * capb <= _ROW_BUDGET


def _compile_field_part(index, thunks, fields_expr: str):
    """Compile the fields expression to ONE device row, or None.

    Supported: exactly one {field=value} with a single value word — the
    overwhelmingly common shape (ref tests' {Name=Dump}). The row is
    the host search_field evaluation (ref Search.cs:126-155): the
    `&field` key (R=-1) proximity-AND'd with the value word's codes
    (inner R: -1 for exact/digit values, else 0 — what search_word
    returns before the thunk-level R override, which never applies here
    because the single pair is the whole expression). Multi-word values
    and multiple fields nest pair-evaluations the linear fold cannot
    reproduce — those stay on the host.
    """
    fthunks = [t for t in thunks if t.field_name]
    if len(fthunks) != 1:
        return None
    if not re.fullmatch(r"\(\w+\.d\(\)\)", fields_expr.strip()):
        return None
    ft = fthunks[0]
    from docodo_tpu.constants import FIELD_NAME_CHAR

    fkey = FIELD_NAME_CHAR + ft.field_name.lower()
    vw = ft.word.lower()
    b_exact_inner = vw.upper() == vw and index.b_keep_forms
    codes = _chosen_codes(index, vw, b_exact_inner)
    if not codes:
        # stop-word/uncodable value: host search_word yields an empty
        # seq, annihilating the field AND
        return list(_EMPTY_GROUP)
    return [((fkey,), -1), (codes, -1 if b_exact_inner else 0)]


def compile_request(index, req: str, words_out: Optional[list] = None,
                    n_found=None, reason_out: Optional[list] = None,
                    field_out: Optional[list] = None,
                    filters_out: Optional[list] = None,
                    ) -> Optional[List[Tuple[Tuple[str, ...], int]]]:
    """Compile a request into device groups [(variant keys, R), ...] in
    left-fold evaluation order.

    Returns None when the request needs the host engine (correction
    mode, regex filters, fold-incompatible operator shapes, parse
    errors, over-budget wildcard rows). A group may carry several OR'd
    variant keys (voc-group codes, `a|b` alternations, and wildcard
    expansions — ref Search.cs:226-247, 351, 158-167).

    With `field_out` (a list), a single {field=value} sub-query compiles
    to its own device row appended there (evaluated separately and
    doc-intersected by the caller, ref Search.cs:423-428); the return
    value is then the MAIN expression's groups — possibly [] for a
    field-only request. Without `field_out`, field requests return None.

    With `words_out` (a list), the per-word WordInfo records are appended
    to it on success — the host path's result.words parity (ref
    Search.cs:599-601); `n_found(thunk) -> int` supplies the resolved
    posting counts (cached by the executor).

    With `filters_out` (a list), `-filter:` doc-name regexes extract
    into it exactly like the host engine (ref Search.cs:456-466) — they
    only affect result materialization, so the caller applies them in
    delivery. Without it, filter requests return None.

    With `reason_out` (a list), a failure appends one reason tag:
    "unsupported" (a syntax feature the device path lacks) or "shape"
    (fold-incompatible operator tree / budget overflow / parse error).
    """
    def bail(reason):
        if reason_out is not None:
            reason_out.append(reason)
        return None

    if _UNSUPPORTED.search(req):
        return bail("unsupported")
    if "-filter:" in req:
        if filters_out is None:
            return bail("unsupported")
        from docodo_tpu.index import _FILTER_RE

        m = _FILTER_RE.search(req.lower())
        if m:
            filters_out.extend(
                pat for pat in m.group(1).split(",") if pat
            )
        req = _FILTER_RE.sub(" ", req)
    if "{" in req and field_out is None:
        # a caller without field-row support must not silently drop the
        # {field=value} filter (sanitation strips unparsed braces)
        return bail("unsupported")
    thunks: List[WordThunk] = []
    try:
        main_expr, fields_expr = qparser.prepare_search_request(
            req.lower(), thunks,
            search_word=None,
            search_field=(index.search_field if field_out is not None
                          else None),
            stop_words=index.stop_words,
        )
    except Exception:  # noqa: BLE001 — any sanitize hiccup -> host
        return bail("shape")
    field_groups = None
    if fields_expr.strip():
        if field_out is None:
            return bail("unsupported")
        field_groups = _compile_field_part(index, thunks, fields_expr)
        if field_groups is None:
            return bail("shape")
    if not main_expr.strip() and field_groups is None:
        return bail("shape")
    groups: list = []
    if main_expr.strip():
        try:
            ast = qparser.parse_expression(main_expr, thunks)
        except qparser.QuerySyntaxError:
            return bail("shape")
        if ast is None:
            return bail("shape")
        groups = _linearize(index, ast)
        if groups is None or len(groups) > _MAX_WORDS:
            return bail("shape")
        if any(len(codes) > _MAX_VARIANTS for codes, _ in groups):
            return bail("shape")
        if len(groups) > 2 and any(len(c) > 8 for c, _ in groups):
            # W>=3 folds evaluate variant ORs stage-by-stage (one OR
            # stage per variant) — a 100-way wildcard there compiles a
            # 100-stage program; W<=2 takes the flat tagged-sort path
            return bail("shape")
        if not _row_budget_ok(index, groups):
            return bail("shape")
    if words_out is not None:
        for t in thunks:
            if n_found is not None:
                t.info.n_found = n_found(t)
            words_out.append(t.info)
    if field_groups is not None:
        field_out.append(field_groups)
    if any(not codes for codes, _ in groups):
        # an all-empty AND operand annihilates the query (host parity:
        # empty PostingSeq * anything = empty)
        return list(_EMPTY_GROUP)
    return groups


@dataclass
class _Pending:
    req: str
    compiled: list                      # main-expression groups ([] = none)
    field_compiled: Optional[list] = None  # {field=value} row, if any
    filters: list = field(default_factory=list)  # -filter: doc regexes
    words: list = field(default_factory=list)
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[SearchResult] = None
    esc: bool = False  # second (escalated-budget) device attempt


class BatchExecutor:
    """Micro-batching device query executor."""

    def __init__(self, index, device_index: Optional[DeviceIndex] = None,
                 max_batch: int = 512, max_wait_ms: float = 2.0,
                 topk: int = 64, hit_cap: int = 1024,
                 materialize: bool = True, mesh=None,
                 pipeline: Optional[bool] = None,
                 escalate: Optional[bool] = None):
        """With `mesh`, serve from a document-sharded mesh index
        (parallel/serving.ShardedDeviceIndex) instead of a single-chip
        DeviceIndex — corpora larger than one device's HBM.

        `pipeline` overlaps batch i+1's collection+dispatch with batch
        i's readback+materialization (a completion thread does the
        device_get): hides the per-batch RTT on locally-attached
        devices. Default OFF — this environment's TPU tunnel stalls
        under readbacks concurrent with dispatches (see CLAUDE.md);
        DOCODO_PIPELINE=1 overrides."""
        self.index = index
        self.mesh = mesh
        self.sdi = None
        self.di = device_index if mesh is None else None
        self._doc_ord = (
            {n: i for i, n in enumerate(device_index.doc_names)}
            if device_index is not None else {}
        )
        self._gen = None
        self._stage_lock = threading.Lock()
        self._winfo: dict = {}
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.topk = topk
        self.hit_cap = hit_cap
        self.materialize = materialize
        if pipeline is None:
            import os

            pipeline = os.environ.get("DOCODO_PIPELINE") == "1"
        self.pipeline = bool(pipeline) and mesh is None
        if escalate is None:
            import os

            # a truncated query's SECOND batched device pass with
            # escalated budgets: the right default on locally-attached
            # devices (the heaviest queries stay on device); OFF here
            # because each escalated wave pays the tunnel's ~300 ms
            # dispatch+readback floor (measured: serve QPS 164 -> 96)
            escalate = os.environ.get("DOCODO_ESCALATE") == "1"
        self.escalate = bool(escalate)
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._done_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        self._completion = None
        if self.pipeline:
            self._completion = threading.Thread(
                target=self._completion_loop, daemon=True
            )
            self._completion.start()
        # stats are bumped from the collector thread, the completion
        # thread AND caller threads — unlocked += interleaves and
        # under-counts, and /status could serialize a torn snapshot
        self._stats_lock = threading.Lock()
        self.stats = {
            "batches": 0, "device_queries": 0, "host_queries": 0,
            "truncated_fallbacks": 0, "device_s": 0.0, "material_s": 0.0,
            # why queries bypassed the device (verdict: surface the
            # fallback reason, not just the count)
            "fallback_unsupported": 0, "fallback_shape": 0,
            "fallback_no_index": 0, "escalations": 0,
            # mesh serving: boundary_reserves = queries whose proximity
            # window could cross a shard boundary, re-served EXACTLY on
            # the host (the default boundary="reserve" policy);
            # boundary_risk counts flag-mode results that may miss
            # cross-boundary matches (parallel/serving.py contract)
            "boundary_risk": 0, "boundary_reserves": 0,
        }
        # compiled request-plan cache: serving mixes repeat request
        # strings heavily, and compile_request re-runs the sanitizer
        # regexes + word-code/variant expansion per call (measured ~40%
        # of the host-side per-query cost on the serve path). Keyed on
        # the raw request string; invalidated on index restage (word
        # codes and wildcard expansions are generation-scoped). Entries
        # are immutable after insertion: _Pending shares the cached
        # groups/words lists read-only.
        self._plan_cache: "dict" = {}
        self._plan_lock = threading.Lock()
        self.PLAN_CACHE_MAX = 8192
        if device_index is not None:
            self._gen = index.generation
        elif index.can_search:
            self._stage()

    def _bump(self, **deltas) -> None:
        with self._stats_lock:
            for k, d in deltas.items():
                self.stats[k] += d

    # ---- public ----------------------------------------------------------
    def _stage(self) -> bool:
        """(Re)stage the index onto the device(s); lazy so the executor
        can be constructed before the first build, and re-runs when the
        index GENERATION changes (rebuild swaps the arrays in place,
        ref Index.cs:493-513)."""
        with self._stage_lock:
            if not self.index.can_search:
                return False
            if self._gen == self.index.generation:
                return True
            if self.mesh is not None:
                from docodo_tpu.parallel.serving import ShardedDeviceIndex

                self.sdi = ShardedDeviceIndex.from_index(
                    self.index, self.mesh
                )
            else:
                self.di = DeviceIndex.from_index(self.index)
                self._doc_ord = {
                    n: i for i, n in enumerate(self.di.doc_names)
                }
            self._winfo.clear()
            with self._plan_lock:
                self._plan_cache.clear()
            self._gen = self.index.generation
            return True

    def _n_found(self, t) -> int:
        """Resolved posting count of one request thunk (WordThunk.d()'s
        info.n_found): the union of the chosen variant keys' postings —
        or, for a field thunk, the host search_field result length.
        Cached per (field, word) — counts are query-independent for an
        index generation, and the executor restages on rebuild."""
        key = (t.field_name, t.word)
        v = self._winfo.get(key)
        if v is not None:
            return v
        n = 0
        if t.field_name:
            n = len(self.index.search_field(t.field_name, t.word))
        else:
            wc = _word_codes(self.index, t.word)
            if wc is not None:
                arrs = [
                    a for a in (self.index.arr.get(c) for c in wc[0])
                    if a is not None and a.size
                ]
                if len(arrs) == 1:
                    n = int(arrs[0].size)
                elif arrs:
                    n = int(np.unique(np.concatenate(arrs)).size)
        self._winfo[key] = n
        return n

    def _compile_plan(self, req: str):
        """compile_request through the per-generation plan cache:
        (compiled, field_compiled, filters, words, fail_reason)."""
        with self._plan_lock:
            plan = self._plan_cache.get(req)
        if plan is not None:
            return plan
        words: list = []
        reason: list = []
        fields: list = []
        filters: list = []
        compiled = compile_request(
            self.index, req, words_out=words, n_found=self._n_found,
            reason_out=reason, field_out=fields, filters_out=filters,
        )
        # tuples: consumers receive fresh lists per call (below), so a
        # caller mutating SearchResult.words/filters cannot corrupt the
        # cached plan or other in-flight results for the same request
        plan = (compiled, fields[0] if fields else None, tuple(filters),
                tuple(words), reason[0] if reason else None)
        with self._plan_lock:
            if len(self._plan_cache) >= self.PLAN_CACHE_MAX:
                self._plan_cache.clear()  # bulk reset beats LRU churn
            self._plan_cache[req] = plan
        return plan

    def search(self, req: str, timeout: float = 120.0) -> SearchResult:
        if self._gen != self.index.generation and not self._stage():
            self._bump(host_queries=1, fallback_no_index=1)
            return self.index.search(req)  # no index yet: host semantics
        compiled, field_compiled, filters, words, fail_reason = (
            self._compile_plan(req)
        )
        if compiled is None:
            key = ("fallback_unsupported"
                   if fail_reason == "unsupported"
                   else "fallback_shape")
            self._bump(host_queries=1, **{key: 1})
            return self.index.search(req)
        p = _Pending(req=req, compiled=compiled,
                     field_compiled=field_compiled,
                     filters=list(filters), words=list(words))
        self._q.put(p)
        if not p.event.wait(timeout) or p.result is None:
            # device stall, or a result that overflowed even the
            # escalated budget: re-serve host-side ON THIS THREAD —
            # fallbacks in the collector would serialize every pending
            # batch behind them
            return self.index.search(req)
        return p.result

    # escalation budgets: a rank-truncated query re-enqueues and the
    # collector serves the escalated set as ONE batched device pass
    # (per-query escalation would pay one dispatch RTT each — measured
    # 164 -> 97 QPS over the tunnel). Budgets clamp per bucket inside
    # search_batch_full; queries above ESC_CAP_MAX go host-side.
    ESC_TOPK = 2048
    ESC_HIT_CAP = 1 << 13
    # only moderate posting volumes escalate: the clamped budgets keep
    # those kernels cheap and the hit readbacks small; true monster
    # queries (cap > 2048) cost less on the host engine than their
    # device streams would
    ESC_CAP_MAX = 2048

    def _esc_eligible(self, p: _Pending) -> bool:
        if not self.escalate or self.di is None or p.esc:
            return False
        for q in (p.compiled or None, p.field_compiled):
            if not q:
                continue
            cg = self.di.compile_group_query(q)
            if cg is not None and cg[4] > self.ESC_CAP_MAX:
                return False
        return True

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        if self._completion is not None:
            try:  # bounded: a wedged readback must not hang close()
                self._done_q.put(None, timeout=5)
            except queue.Full:
                pass
            self._completion.join(timeout=5)

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
            normal = [p for p in batch if not p.esc]
            esc = [p for p in batch if p.esc]
            for sub, escalated in ((normal, False), (esc, True)):
                if not sub:
                    continue
                try:
                    if self.pipeline:
                        self._dispatch_pipelined(sub, escalated)
                    else:
                        self._execute(sub, escalated)
                except Exception as e:  # noqa: BLE001 — fail the batch
                    self._fail(sub, e)

    @staticmethod
    def _fail(batch: List[_Pending], e: BaseException) -> None:
        for p in batch:
            if p.result is None:
                p.result = SearchResult()
                p.result.success = False
                p.result.error = str(e)
            p.event.set()

    @staticmethod
    def _batch_rows(batch: List[_Pending]):
        """Flatten pendings into device rows: a main-expression row per
        query (when present) plus a separate row for its {field=value}
        part — the host evaluates the two expressions independently and
        intersects found docs (ref Search.cs:423-428, 470-501)."""
        rows: list = []
        mains: List[Optional[int]] = []
        frows: List[Optional[int]] = []
        for p in batch:
            if p.compiled:
                mains.append(len(rows))
                rows.append(p.compiled)
            else:
                mains.append(None)
            if p.field_compiled is not None:
                frows.append(len(rows))
                rows.append(p.field_compiled)
            else:
                frows.append(None)
        return rows, mains, frows

    def _budgets(self, escalated: bool):
        if escalated:
            return self.ESC_TOPK, self.ESC_HIT_CAP
        return self.topk, self.hit_cap

    def _dispatch_pipelined(self, batch: List[_Pending],
                            escalated: bool = False) -> None:
        """Dispatch the device program and hand the pending readback to
        the completion thread; bounded queue depth 2 applies
        backpressure (one batch in flight + one queued)."""
        if self.sdi is not None:
            return self._execute_sharded(batch)
        t0 = time.perf_counter()
        rows, mains, frows = self._batch_rows(batch)
        topk, hit_cap = self._budgets(escalated)
        finish = self.di.search_batch_full(
            rows, topk=topk,
            hit_cap=hit_cap, cap_ladder=self.CAP_LADDER,
            fused=False, deferred=True,
            # full materialization recomputes doc ranks host-side; only
            # brief mode consumes the device ranks (skip the readback)
            want_docs=not self.materialize,
            clamp_budgets=escalated,
        )
        self._bump(batches=1, device_s=time.perf_counter() - t0)
        while not self._stop.is_set():
            try:
                self._done_q.put((batch, finish, mains, frows), timeout=0.5)
                return
            except queue.Full:
                continue
        self._fail(batch, RuntimeError("executor stopping"))

    def _completion_loop(self) -> None:
        while True:
            item = self._done_q.get()
            if item is None:
                return
            batch, finish, mains, frows = item
            try:
                t0 = time.perf_counter()
                out = finish()  # the device_get: the batch's readback
                t1 = time.perf_counter()
                self._bump(device_s=t1 - t0)
                self._deliver(batch, out, t1, mains, frows)
            except Exception as e:  # noqa: BLE001
                self._fail(batch, e)

    # serving trades padding waste for a BOUNDED compile-shape count:
    # query batches churn, so tight caps would compile endlessly
    CAP_LADDER = (128, 1024, 16384, 1 << 17)

    def _execute(self, batch: List[_Pending],
                 escalated: bool = False) -> None:
        if self.sdi is not None:
            return self._execute_sharded(batch)
        t0 = time.perf_counter()
        rows, mains, frows = self._batch_rows(batch)
        topk, hit_cap = self._budgets(escalated)
        out = self.di.search_batch_full(
            rows, topk=topk,
            hit_cap=hit_cap, cap_ladder=self.CAP_LADDER,
            # per-bucket cached jits: serving batch COMPOSITIONS churn per
            # request wave, and the fused multi-bucket program recompiles
            # per composition tuple (minutes over a remote-tunnel device);
            # individual bucket shapes recur and hit the jit cache
            fused=False,
            want_docs=not self.materialize,
            clamp_budgets=escalated,
        )
        t1 = time.perf_counter()
        self._bump(batches=1, device_s=t1 - t0)
        self._deliver(batch, out, t1, mains, frows)

    def _row_coords(self, out, row: int) -> np.ndarray:
        hits = out["hits"][row]
        return hits[hits < INT32_MAX].astype(np.uint64)

    def _deliver(self, batch: List[_Pending], out, t1: float,
                 mains, frows, topk: Optional[int] = None,
                 hit_cap: Optional[int] = None) -> None:
        """Materialize one executed batch's rows and release waiters.
        topk/hit_cap override the batch budgets (the escalation path
        runs with its own)."""
        from docodo_tpu.query.search import combine_search_results

        topk = self.topk if topk is None else topk
        hit_cap = self.hit_cap if hit_cap is None else hit_cap
        tk_eff = out.get("topk_eff")
        hc_eff = out.get("hit_cap_eff")
        for i, p in enumerate(batch):
            qrows = [r for r in (mains[i], frows[i]) if r is not None]
            if any(
                int(out["n_pages"][r]) > (
                    tk_eff[r] if tk_eff is not None else topk
                )
                or int(out["n_hits"][r]) > (
                    hc_eff[r] if hc_eff is not None else hit_cap
                )
                for r in qrows
            ):
                # rank-truncated: re-enqueue ONCE with escalated budgets
                # (served as one batched second pass — per-query retries
                # pay a dispatch RTT each); queries too big even for the
                # escalated budget go to the caller's host fallback
                if self._esc_eligible(p):
                    p.esc = True
                    self._q.put(p)
                    continue
                self._bump(truncated_fallbacks=1)
                p.event.set()
                continue
            if p.esc:
                self._bump(escalations=1)
            self._bump(device_queries=1)
            # the primary row: the main expression, or — for a
            # field-only request — the field row (host parity: res is
            # resf when the main expression is empty, Search.cs:679-682)
            row = mains[i] if mains[i] is not None else frows[i]
            if row is None:  # defensive: no rows at all -> empty result
                p.result = SearchResult()
                p.result.words = p.words
                p.event.set()
                continue
            # doc-name filters apply to the MAIN result only (the host
            # prepares the field part with no filters, Search.cs:686-688)
            res = prepare_search_result(
                self._row_coords(out, row), self.index.pages, p.filters
            )
            if mains[i] is not None and frows[i] is not None:
                resf = prepare_search_result(
                    self._row_coords(out, frows[i]), self.index.pages, []
                )
                res = combine_search_results(res, resf)
            if self.materialize:
                self.index._materialize_docs(res)
                res.found_docs.sort(key=lambda d: d.rank)
            else:
                # brief mode: doc ranks come straight off the device
                # (locate_full computes 1+ln(sum page ranks) with the
                # x10 header boost, ref Search.cs:552-557) — no host
                # finalize pass. Untruncated results list every doc in
                # the top-k rows, so the lookup always resolves.
                dr = {
                    int(o): float(r) for o, r in zip(
                        out["docs"][row], out["doc_ranks"][row]
                    ) if o >= 0 and r > 0
                }
                for doc in res.found_docs:
                    doc.rank = dr.get(
                        self._doc_ord.get(doc.name, -1), doc.rank
                    )
                res.found_docs.sort(key=lambda d: d.rank)
            res.words = p.words
            p.result = res
            p.event.set()
        self._bump(material_s=time.perf_counter() - t1)

    def _execute_sharded(self, batch: List[_Pending]) -> None:
        """Mesh-sharded execution: rows evaluate RAW on the mesh
        (materialize="defer"), main/field row pairs doc-intersect here,
        then the batch materializes/finalizes exactly like the
        single-chip path; truncated queries come back None and re-serve
        on the caller's thread."""
        from docodo_tpu.query.search import combine_search_results

        t0 = time.perf_counter()
        rows, mains, frows = self._batch_rows(batch)
        # per-row -filter: lists: a query's filters apply to its MAIN
        # row only (field rows prepare unfiltered, host parity)
        row_filters: List[Optional[list]] = [None] * len(rows)
        for i, p in enumerate(batch):
            if mains[i] is not None:
                row_filters[mains[i]] = p.filters
            elif frows[i] is not None:
                # field-only: the field row IS the result -> filtered
                row_filters[frows[i]] = p.filters
        results = self.sdi.search_batch(
            rows, topk=self.topk, hit_cap=self.hit_cap,
            materialize="defer", filters=row_filters,
        )
        self._bump(batches=1, device_s=time.perf_counter() - t0)
        for i, p in enumerate(batch):
            qrows = [r for r in (mains[i], frows[i]) if r is not None]
            if not qrows:
                p.result = SearchResult()
                p.result.words = p.words
                p.event.set()
                continue
            if any(results[r] is None for r in qrows):
                self._bump(truncated_fallbacks=1)
                p.event.set()
                continue
            row = mains[i] if mains[i] is not None else frows[i]
            res = results[row]
            if mains[i] is not None and frows[i] is not None:
                res = combine_search_results(res, results[frows[i]])
            if any(results[r].boundary_risk for r in qrows):
                res.boundary_risk = True
                self._bump(boundary_risk=1)
            if any(getattr(results[r], "boundary_reserved", False)
                   for r in qrows):
                res.boundary_reserved = True
                self._bump(boundary_reserves=1)
            if self.materialize:
                self.index._materialize_docs(res)
                res.found_docs.sort(key=lambda d: d.rank)
            else:
                finalize_doc_ranks(res)
            self._bump(device_queries=1)
            res.words = p.words
            p.result = res
            p.event.set()
