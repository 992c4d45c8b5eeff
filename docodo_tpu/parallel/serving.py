"""Mesh-sharded full-result serving: a built Index re-sharded by
document over a jax.sharding Mesh and served with EXACT host parity.

The single-chip serving path (ops/device_index.DeviceIndex +
query/batcher) requires the whole CSR in one device's HBM. Here the
corpus is document-sharded (parallel/sharding staging — the device twin
of the reference's per-thread builders, ref Docodo.NET/Index.cs:464-465):
every device evaluates the replicated query batch against its local
shard with the full-result program (query_step_full), the per-shard
LocateFull fields ride one all_gather over ICI, and the host
materializes each shard's hit stream against that shard's OWN page
table. Because documents never span shards (sharding._assign_docs),
per-shard materialization composes exactly: the final result is the
union of per-shard docs, ranked by the same doc-rank formula
(ref Search.cs:552-599) via the parent index's materializer.

Queries whose per-shard result overflows the topk/hit_cap budget
re-serve through the parent host engine, mirroring the single-chip
batcher's truncation contract.

Boundary contract: the reference's coordinates are CORPUS-GLOBAL, so its
proximity windows can span document boundaries (ref Build.cs:529-531 —
coord accumulates across docs with no gap). Documents are therefore
assigned to shards in CONTIGUOUS ranges (assign_docs_contiguous):
cross-document windows match the host exactly within every shard; only
matches that would span one of the S-1 shard boundaries could diverge —
a window-width (default 255+len chars) sliver per boundary. Queries
whose window could touch such a sliver (boundary_risk, a conservative
per-term bisect check) RE-SERVE through the parent host engine under
the default boundary="reserve" policy, exactly like truncated queries:
mesh results therefore EQUAL single-chip host results for every query
(ref IndexSequence.cs:218-284 semantics over the global space).
boundary="flag" keeps the old flag-only behavior for measurement.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from docodo_tpu.core.pagetable import PageTable
from docodo_tpu.core.postings import PostingSeq
from docodo_tpu.ops.device_index import INT32_MAX, _bucket, _bucket4
from docodo_tpu.parallel import sharding as sh
from docodo_tpu.query.search import (
    SearchResult,
    finalize_doc_ranks,
    prepare_search_result,
)


class ShardedDeviceIndex:
    """A built host Index staged onto a device mesh for serving."""

    def __init__(self, index, mesh, corpus: sh.ShardedCorpus,
                 shard_tables: List[PageTable]):
        self.index = index
        self.mesh = mesh
        self.corpus = corpus
        self.shard_tables = shard_tables
        self.terms = list(index.arr.terms)
        self._tmap = {t: i for i, t in enumerate(self.terms)}
        counts = index.arr.offsets[1:] - index.arr.offsets[:-1]
        self._counts = np.asarray(counts, dtype=np.int64)
        # 2-D hosts x devices layout (parallel/distributed): shard s
        # lives at [h, d] = divmod(s, D); build/query dispatch to the
        # DCN-aware twins (hit streams ride ICI only and stay h-sharded)
        self._is2d = tuple(getattr(mesh, "axis_names", ())) == ("h", "d")
        # device arrays
        if self._is2d:
            from docodo_tpu.parallel import distributed as dd

            self._st, self._sc, self._off = dd.distributed_build(
                mesh, jnp.asarray(corpus.term_ids),
                jnp.asarray(corpus.coords), len(self.terms),
            )
        else:
            self._st, self._sc, self._off = sh.sharded_build(
                mesh, jnp.asarray(corpus.term_ids),
                jnp.asarray(corpus.coords), len(self.terms),
            )
        self._bounds = jnp.asarray(corpus.bounds)
        self._page_doc = jnp.asarray(corpus.page_doc)
        header = np.zeros(corpus.bounds.shape, dtype=bool)
        for s, table in enumerate(shard_tables):
            for p, pid in enumerate(table.page_ids):
                header[s, p] = pid == "0"
        self._is_header = jnp.asarray(header)
        # per-shard host CSR mirrors -> stacked page_of + combined
        # coords||pages small tables, so every shard runs the same
        # routed kernel stack as the single-chip path (carried/shared
        # page streams, small-table row gathers)
        self._page_of, self._small_stack = self._stage_paged_tables()
        self._doc_ordinal = {
            n: i for i, n in enumerate(index.pages.doc_names)
        }
        # GLOBAL coordinates where shards 1..S-1 begin — the boundary
        # list for the divergence check (a proximity window crossing one
        # of these is dropped by contiguous-range sharding)
        pt = index.pages
        bounds_g = pt.bounds.astype(np.uint64)
        page_doc_g = pt.page_doc.astype(np.int64)
        n_docs = len(pt.doc_names)
        doc_last = np.zeros(n_docs, dtype=np.int64)
        for p_, d_ in enumerate(page_doc_g):
            doc_last[d_] = p_
        doc_base_g = np.zeros(n_docs, dtype=np.uint64)
        doc_base_g[1:] = bounds_g[doc_last[:-1]]
        self.boundaries = np.array(
            [int(doc_base_g[corpus.doc_assign[s_][0]])
             for s_ in range(1, len(corpus.doc_assign))
             if len(corpus.doc_assign[s_])],
            dtype=np.uint64,
        )

    def _stage_paged_tables(self):
        """Per-shard page_of arrays [S, n] + STACKED combined small
        tables (w, band, row_map [S, T], tab [S, rows, 2w]) from host
        mirrors of the per-shard CSR (the same lexsort the device build
        performs). Shard counts are subsets of the global counts, so
        the single-chip small-table contract (every real term in a
        bucket has count <= cap) carries over per shard."""
        import os as _os

        corpus = self.corpus
        T = len(self.terms)
        S, nloc = corpus.coords.shape
        sc_np = np.full((S, nloc), INT32_MAX, dtype=np.int32)
        pg = np.zeros((S, nloc), dtype=np.int32)
        offs = np.zeros((S, T + 1), dtype=np.int64)
        for s in range(S):
            n = int(corpus.n_tokens[s])
            tid = corpus.term_ids[s, :n].astype(np.int64)
            co = corpus.coords[s, :n]
            order = np.lexsort((co, tid))
            sc_s = co[order]
            sc_np[s, :n] = sc_s
            np.cumsum(np.bincount(tid, minlength=T), out=offs[s, 1:])
            breal = self.shard_tables[s].bounds.astype(np.int64)
            if breal.size and n:
                pg[s, :n] = np.minimum(
                    np.searchsorted(breal, sc_s.astype(np.int64),
                                    side="right"),
                    breal.size - 1,
                ).astype(np.int32)
        small_stack = []
        if _os.environ.get("DOCODO_SMALL_TAB", "1") != "0" and T:
            from docodo_tpu.ops.device_index import build_small_tables

            # per-shard tables via the SAME builder as the single-chip
            # path (cumulative + banded widths, coords||pages rows),
            # then stacked: every (width, band) present on any shard
            # becomes one [S, rows, cols] entry, absent/narrower shards
            # padded with -1 row_maps (their gathers select nothing)
            per_shard = [
                build_small_tables(
                    offs[s], sc_np[s, : int(corpus.n_tokens[s])],
                    pages_np=pg[s, : int(corpus.n_tokens[s])],
                    as_numpy=True,
                ) or () for s in range(S)
            ]
            keys = []
            for tabs in per_shard:
                for st in tabs:
                    if (st.w, st.band) not in keys:
                        keys.append((st.w, st.band))
            for w, band in sorted(keys):
                entries = [
                    next((st for st in per_shard[s]
                          if st.w == w and st.band == band), None)
                    for s in range(S)
                ]
                rows = max(
                    (e.tab.shape[0] for e in entries if e is not None),
                    default=0,
                )
                row_map = np.full((S, T), -1, dtype=np.int32)
                tab = np.full((S, rows, 2 * w), INT32_MAX,
                              dtype=np.int32)
                for s, e in enumerate(entries):
                    if e is None or e.tab.shape[0] == 0:
                        continue
                    row_map[s] = e.row_map
                    tab[s, : e.tab.shape[0]] = e.tab
                small_stack.append(
                    (w, band, jnp.asarray(row_map), jnp.asarray(tab))
                )
        return jnp.asarray(pg), tuple(small_stack)

    # ---- staging -----------------------------------------------------------
    @classmethod
    def from_index(cls, index, mesh) -> "ShardedDeviceIndex":
        """Re-shard a built in-memory Index by document.

        The global CSR's (term, coord) stream is re-based into per-doc
        local coordinate spaces (the inverse of the reference's
        coordinate-shift merge, ref Index.cs:584-592) and greedily
        assigned to shards; per-shard page tables keep the original page
        ids and doc names so snippets and headers resolve through the
        parent index's sources.
        """
        arr = index.arr
        if arr.coords is None:
            raise ValueError("sharded staging requires an in-memory index")
        pt = index.pages
        num_shards = int(np.prod([d for d in mesh.devices.shape]))

        T = len(arr.terms)
        counts = (arr.offsets[1:] - arr.offsets[:-1]).astype(np.int64)
        g_tids = np.repeat(np.arange(T, dtype=np.int32), counts)
        g_coords = arr.coords.astype(np.uint64)

        bounds = pt.bounds.astype(np.uint64)
        page_doc = pt.page_doc.astype(np.int64)
        n_docs = len(pt.doc_names)
        # doc base coord = end bound of the previous doc's last page
        doc_last_page = np.zeros(n_docs, dtype=np.int64)
        for p, d in enumerate(page_doc):
            doc_last_page[d] = p
        doc_base = np.zeros(n_docs, dtype=np.uint64)
        doc_base[1:] = bounds[doc_last_page[:-1]]

        page_of = np.searchsorted(bounds, g_coords, side="right")
        page_of = np.minimum(page_of, len(bounds) - 1)
        doc_of = page_doc[page_of]

        order = np.argsort(doc_of, kind="stable")
        sorted_docs = doc_of[order]
        splits = np.searchsorted(
            sorted_docs, np.arange(n_docs + 1), side="left"
        )
        doc_tids: List[np.ndarray] = []
        doc_coords: List[np.ndarray] = []
        doc_pages: List[List[int]] = [[] for _ in range(n_docs)]
        for d in range(n_docs):
            sel = order[splits[d]: splits[d + 1]]
            # per-doc streams must ascend by coordinate for the device
            # sort's padding contract; CSR order is term-major
            local = (g_coords[sel] - doc_base[d]).astype(np.int64)
            sub = np.argsort(local, kind="stable")
            doc_tids.append(g_tids[sel][sub])
            doc_coords.append(local[sub].astype(np.int32))
        for p, d in enumerate(page_doc):
            doc_pages[d].append(int(bounds[p] - doc_base[d]))

        # CONTIGUOUS doc ranges: the reference's proximity windows span
        # document boundaries (coordinates are corpus-global), and
        # contiguous packing preserves that behavior within every shard;
        # only windows crossing one of the S-1 shard boundaries diverge
        assign = sh.assign_docs_contiguous(
            [t.size for t in doc_tids],
            [(p[-1] if p else 0) for p in doc_pages],
            num_shards,
        )
        corpus = sh.stage_shards_arrays(
            doc_tids, doc_coords, doc_pages, num_shards=num_shards,
            terms=list(arr.terms), assign=assign,
        )
        # per-shard page tables in shard-local coordinates. Page rows
        # per doc come from ONE stable argsort + searchsorted split (a
        # per-doc flatnonzero scan would be O(n_docs * n_pages))
        order_p = np.argsort(page_doc, kind="stable")
        psplit = np.searchsorted(
            page_doc[order_p], np.arange(n_docs + 1), side="left"
        )
        tables: List[PageTable] = []
        for s in range(num_shards):
            t = PageTable()
            bnds, pdoc, pids, names = [], [], [], []
            base = 0
            for nd, d in enumerate(corpus.doc_assign[s]):
                names.append(pt.doc_names[d])
                for p in order_p[psplit[d]: psplit[d + 1]]:
                    bnds.append(base + int(bounds[p] - doc_base[d]))
                    pdoc.append(nd)
                    pids.append(pt.page_ids[p])
                base += doc_pages[d][-1] if doc_pages[d] else 0
            t.bounds = np.array(bnds, dtype=np.uint64)
            t.page_doc = np.array(pdoc, dtype=np.int64)
            t.page_ids = pids
            t.doc_names = names
            tables.append(t)
        return cls(index, mesh, corpus, tables)

    # ---- query compilation ---------------------------------------------------
    def term_id(self, term: str) -> int:
        return self._tmap.get(term, -1)

    def posting_count(self, term: str) -> int:
        tid = self.term_id(term)
        return int(self._counts[tid]) if tid >= 0 else 0

    # same coarse posting-cap ladder as serving (query/batcher.py):
    # batch compositions churn per request wave, and every distinct
    # (B, W, V, cap) tuple is a fresh XLA compile — minutes over a
    # tunnelled device — so every shape dimension pads to a ladder
    CAP_LADDER = (128, 1024, 16384, 1 << 17)

    def _round_cap(self, need: int) -> int:
        for c in self.CAP_LADDER:
            if need <= c:
                return c
        return _bucket(need)

    def _compile_one(self, q):
        """One group query -> (rows of variant ids, rvals, cap need), or
        None when some group resolves to no known terms (matches
        nothing, host parity)."""
        rows, rvals = [], []
        need = 1
        for codes, r in q:
            if isinstance(codes, str):
                codes = (codes,)
            ids = [self.term_id(c) for c in codes]
            ids = [i for i in ids if i >= 0]
            if not ids:
                return None
            for c in codes:
                need = max(need, self.posting_count(c))
            rows.append(ids)
            rvals.append(r)
        return rows, rvals, need

    def _bucketize(self, queries):
        """Group queries into (cap, W, V) shape buckets — a frequent
        word no longer drags every rare-word query in the batch to its
        cap (the single-chip search_batch_full design). Returns
        (compiled, {bucket_key: [query idx]})."""
        compiled = [self._compile_one(q) for q in queries]
        buckets = {}
        for i, cg in enumerate(compiled):
            if cg is None:
                continue
            rows, rvals, need = cg
            w = _bucket(max(len(rows), 1), lo=1)
            v = _bucket(max((len(x) for x in rows), default=1), lo=1)
            buckets.setdefault(
                (self._round_cap(need), w, v), []
            ).append(i)
        return compiled, buckets

    def boundary_risk(self, q, max_r: int) -> bool:
        """Whether this query's proximity window could cross one of the
        S-1 shard boundaries: any posting of any query term within
        max_r of a boundary coordinate (conservative — a flagged result
        MAY silently miss a cross-boundary match; an unflagged one
        cannot). Cheap: one bisect pair per (term, boundary)."""
        if self.boundaries.size == 0:
            return False
        r = np.uint64(max(max_r, 1))
        arr = self.index.arr
        for codes, _ in q:
            if isinstance(codes, str):
                codes = (codes,)
            for c in codes:
                p = arr.get(c)
                if p is None or p.size == 0:
                    continue
                for b in self.boundaries:
                    lo = np.searchsorted(p, b - min(r, b), side="left")
                    hi = np.searchsorted(p, b + r, side="left")
                    if hi > lo:
                        return True
        return False

    def _host_reserve(self, q, filters) -> SearchResult:
        """Evaluate one compiled group query EXACTLY on the host: the
        parent index's global postings folded through the semantic
        oracle algebra (or_merge across a group's variant codes, then a
        left group_and fold — the same composition the device kernels
        are parity-pinned against, ref IndexSequence.cs:205-322). Used
        to re-serve boundary-risk queries so mesh serving never returns
        a result that could silently miss a cross-shard-boundary match."""
        arr = self.index.arr
        seq: Optional[PostingSeq] = None
        for codes, r in q:
            if isinstance(codes, str):
                codes = (codes,)
            cur: Optional[PostingSeq] = None
            for c in codes:
                p = arr.get(c)
                ps = PostingSeq(
                    p if p is not None else np.zeros(0, np.uint64), r
                )
                cur = ps if cur is None else cur + ps
            seq = cur if seq is None else seq * cur
        coords = seq.coords if seq is not None else np.zeros(0, np.uint64)
        res = prepare_search_result(coords, self.index.pages,
                                    filters or [])
        res.boundary_reserved = True
        return res

    # ---- serving ---------------------------------------------------------------
    def search_batch(self, queries, topk: int = 64, hit_cap: int = 1024,
                     materialize=True,
                     filters: Optional[List[Optional[list]]] = None,
                     boundary: str = "reserve",
                     ) -> List[SearchResult]:
        """Evaluate group queries over the mesh and materialize full
        SearchResults with exact host parity.

        queries: per query a list of (codes, R) groups, the same form the
        batcher's compile_request emits. Truncated queries (any shard
        over the topk/hit_cap budget) re-serve via the parent host
        engine's expression path.

        boundary: "reserve" (default) evaluates queries whose proximity
        window could cross a shard boundary EXACTLY on the host
        (_host_reserve; boundary_reserved=True on the result) — every
        returned result then equals the single-chip host result.
        "flag" keeps the old behavior: flagged results serve from the
        mesh with boundary_risk=True and may miss cross-boundary
        matches (see the module docstring).

        materialize: True = full (snippets/headers); False = brief
        (finalize_doc_ranks only); "defer" = RAW results (doc.rank is
        still the sum of page ranks, no materialization at all) — for
        callers that combine several rows (field-query doc intersection)
        before running their own materialize/finalize pass.

        filters: optional per-query `-filter:` doc-name regex lists,
        applied while assembling each query's per-shard docs (shard doc
        names are the parent index's names, so name filtering composes
        exactly — ref Search.cs:456-466).

        Queries are (cap, W, V)-shape-bucketed: each bucket runs its own
        cached jitted mesh program, so one frequent word no longer drags
        the whole batch to its padding, and recurring bucket shapes skip
        re-tracing. Materialization locates ALL hit coordinates of a
        shard in ONE page-table pass, then slices per query.
        """
        import jax

        compiled, buckets = self._bucketize(queries)
        B = len(queries)
        results: List[Optional[SearchResult]] = [None] * B
        for i, cg in enumerate(compiled):
            if cg is None:
                results[i] = SearchResult()  # matches nothing

        # boundary policy: pull boundary-risk queries OUT of the device
        # buckets and evaluate them exactly on the host (rare by
        # construction — a window-width sliver per shard boundary)
        reserved: set = set()
        if boundary == "reserve" and self.boundaries.size:
            for i, cg in enumerate(compiled):
                if cg is None or len(queries[i]) < 2:
                    # single-group queries evaluate no proximity fold —
                    # per-shard union composes exactly, never reserve
                    continue
                max_r = max(
                    (abs(r) for _, r in queries[i]), default=0
                )
                if self.boundary_risk(queries[i], max_r):
                    reserved.add(i)
                    results[i] = self._host_reserve(
                        queries[i],
                        (filters[i] or []) if filters is not None
                        else [],
                    )
            if reserved:
                for key in list(buckets):
                    kept = [i for i in buckets[key] if i not in reserved]
                    if kept:
                        buckets[key] = kept
                    else:
                        del buckets[key]

        bucket_outs = []
        for (cap, w, v), idxs in sorted(buckets.items()):
            brows = _bucket4(len(idxs))
            if v == 1:
                terms = np.full((brows, w), -1, dtype=np.int32)
            else:
                terms = np.full((brows, w, v), -1, dtype=np.int32)
            rs = np.ones((brows, w), dtype=np.int32)
            for row, qi in enumerate(idxs):
                rows_i, rvals_i, _ = compiled[qi]
                for j, (ids, r) in enumerate(zip(rows_i, rvals_i)):
                    if v == 1:
                        terms[row, j] = ids[0]
                    else:
                        terms[row, j, : len(ids)] = ids
                    rs[row, j] = r
            if self._is2d:
                from docodo_tpu.parallel import distributed as dd

                qf = dd.distributed_query_full
            else:
                qf = sh.sharded_query_full
            out = qf(
                self.mesh, self._off, self._sc, self._bounds,
                self._page_doc, self._is_header, jnp.asarray(terms),
                jnp.asarray(rs), cap=cap, topk=topk, hit_cap=hit_cap,
                # doc ranks recompute host-side in every materialize
                # mode — don't compute/all_gather/read them back
                with_docs=False,
                small=self._small_stack, page_of=self._page_of,
            )
            bucket_outs.append((idxs, out))
        # ONE coalesced device->host transfer for every bucket
        bucket_outs = [
            (idxs, jax.device_get(out)) for idxs, out in bucket_outs
        ]

        # assemble per-query shard hit streams; batch page-location per
        # shard (one locate pass instead of one per query x shard)
        S = len(self.shard_tables)
        per_shard: List[list] = [[] for _ in range(S)]  # (qi, coords)
        for idxs, (pages, ranks, counts, n_pages, docs, doc_ranks,
                   hits, n_hits) in bucket_outs:
            for row, qi in enumerate(idxs):
                if (n_pages[:, row] > topk).any() or                         (n_hits[:, row] > hit_cap).any():
                    continue  # stays None: caller re-serves host-side
                results[qi] = SearchResult()
                for s_ in range(S):
                    hv = hits[s_, row]
                    hv = hv[hv < INT32_MAX].astype(np.uint64)
                    if hv.size:
                        per_shard[s_].append((qi, hv))
        shard_parts: dict = {}
        for s_ in range(S):
            items = per_shard[s_]
            if not items:
                continue
            cat = np.concatenate([hv for _, hv in items])
            page_idx, pos = self.shard_tables[s_].locate(cat)
            off = 0
            for qi, hv in items:
                n = hv.size
                part = prepare_search_result(
                    hv, self.shard_tables[s_],
                    (filters[qi] or []) if filters is not None else [],
                    located=(page_idx[off: off + n], pos[off: off + n]),
                )
                shard_parts.setdefault(qi, []).append(part)
                off += n

        ordinal = self._doc_ordinal
        for qi, parts in shard_parts.items():
            combined = results[qi]
            for part in parts:
                combined.found_docs.extend(part.found_docs)
            # host parity for rank TIES: the host engine's stable sort
            # preserves global coordinate (= doc ordinal) order; shards
            # deliver docs shard-major, so restore ordinal order first
            combined.found_docs.sort(key=lambda d: ordinal.get(d.name, 0))
        for qi, q in enumerate(queries):
            combined = results[qi]
            if combined is None or compiled[qi] is None:
                continue
            if boundary == "flag" and qi not in reserved:
                max_r = max(
                    (abs(r) for _, r in q), default=0
                )
                combined.boundary_risk = self.boundary_risk(q, max_r)
            if materialize == "defer":
                continue  # caller combines rows, then materializes
            if materialize:
                self.index._materialize_docs(combined)
                combined.found_docs.sort(key=lambda d: d.rank)
            else:  # rank-only half, identical to the single-chip brief
                finalize_doc_ranks(combined)
        return results
