"""Multi-chip index build and query over a jax.sharding Mesh.

The reference's only parallelism is document-sharded data parallelism on
threads, with per-thread coordinate spaces reconciled by an offline
coordinate-shift merge (ref Docodo.NET/Index.cs:127, 464-465, 584-592).
The TPU-native layout keeps that sharding but makes it a device mesh:

* axis "d": each device owns a disjoint set of DOCUMENTS — its own
  coordinate space, postings CSR, and page table rows. Documents never
  span shards, so proximity windows need no halo exchange.
* build: per-device `lax.sort` of the local (term, coord) tuple stream
  inside shard_map — the "merge" of the reference is gone; shard
  reconciliation is a per-shard page offset added to query results.
* query: the query batch is REPLICATED; every device evaluates it
  against its local shard, then one `all_gather` over ICI combines the
  per-shard top-k into a global top-k on every device.

Term ids are global (host dictionary is shared), so per-shard CSR arrays
have identical shapes [T+1] and queries need no vocabulary exchange.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from docodo_tpu.ops.device_index import build_postings, query_step
from docodo_tpu.ops.seqops import INF32

shard_map = jax.shard_map


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D device mesh over axis "d" (document shards ride ICI)."""
    if devices is None:
        devices = jax.devices()[: n_devices or None]
    return Mesh(np.array(devices), axis_names=("d",))


# ---------------------------------------------------------------------------
# sharded build
# ---------------------------------------------------------------------------

_build_cache = {}


def sharded_build(mesh: Mesh, term_ids, coords, num_terms: int):
    """Sort every shard's tuple stream in place: [S, Nloc] -> per-shard CSR.

    term_ids/coords: int32[S, Nloc], padding term_id == INT32_MAX.
    Returns (sorted_terms [S, Nloc], sorted_coords [S, Nloc],
    offsets [S, T+1]), all sharded over "d". The jitted program is cached
    per (mesh, num_terms) — shapes re-specialize inside jit as usual.
    """
    key = (mesh, num_terms)
    fn = _build_cache.get(key)
    if fn is None:

        def local_build(t, c):
            st, sc, off = build_postings(t[0], c[0], num_terms)
            return st[None], sc[None], off[None]

        fn = jax.jit(shard_map(
            local_build, mesh=mesh,
            in_specs=(P("d", None), P("d", None)),
            out_specs=(P("d", None), P("d", None), P("d", None)),
        ))
        _build_cache[key] = fn
    return fn(term_ids, coords)


# ---------------------------------------------------------------------------
# sharded query
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("mesh", "cap", "topk")
)
def sharded_query(mesh, term_offsets, coords, bounds, page_doc,
                  page_base, terms, rs, cap: int, topk: int):
    """Evaluate a replicated query batch against every shard, then
    all_gather per-shard top-k and reduce to a global top-k.

    page_base: int32[S] — global page-row offset of each shard, so the
    combined result uses global page indices.
    Returns replicated (pages int32[B, topk], ranks f32[B, topk],
    counts int32[B, topk]).
    """

    def local_query(off, co, bo, pd, base, tq, rq):
        off, co, bo, pd = off[0], co[0], bo[0], pd[0]
        fn = functools.partial(query_step, cap=cap, topk=topk)
        pages, ranks, counts = jax.vmap(
            fn, in_axes=(None, None, None, None, 0, 0)
        )(off, co, bo, pd, tq, rq)
        pages = jnp.where(pages >= 0, pages + base[0], -1)
        # combine across shards: gather [S, B, k] then global top-k
        all_pages = jax.lax.all_gather(pages, "d")
        all_ranks = jax.lax.all_gather(ranks, "d")
        all_counts = jax.lax.all_gather(counts, "d")
        s, b, k = all_ranks.shape
        flat_r = jnp.transpose(all_ranks, (1, 0, 2)).reshape(b, s * k)
        flat_p = jnp.transpose(all_pages, (1, 0, 2)).reshape(b, s * k)
        flat_c = jnp.transpose(all_counts, (1, 0, 2)).reshape(b, s * k)
        top_r, sel = jax.lax.top_k(flat_r, k)
        top_p = jnp.take_along_axis(flat_p, sel, axis=1)
        top_c = jnp.take_along_axis(flat_c, sel, axis=1)
        return top_p, top_r, top_c

    fn = shard_map(
        local_query, mesh=mesh,
        in_specs=(
            P("d", None), P("d", None), P("d", None), P("d", None),
            P("d"), P(None, None), P(None, None),
        ),
        out_specs=(P(None, None), P(None, None), P(None, None)),
        # outputs ARE replicated (identical all_gather + local top-k on
        # every device) but the varying-manner analysis can't infer it
        check_vma=False,
    )
    return fn(term_offsets, coords, bounds, page_doc, page_base, terms, rs)


@functools.lru_cache(maxsize=128)
def _sharded_query_full_jit(mesh, cap: int, topk: int, hit_cap: int,
                            t_ndim: int, with_docs: bool,
                            use_pallas: bool, chunked: str,
                            small_widths: tuple, with_pg: bool):
    """Cached JITTED mesh program per (mesh, cap, topk, hit_cap, terms
    rank): serving calls this per shape BUCKET, so recurring bucket
    shapes hit the jit cache instead of re-tracing the shard_map on
    every batch (the mesh analog of batched_query_full's per-bucket
    cache). with_docs=False skips computing AND all_gathering the
    docs/doc_ranks fields (serving recomputes doc ranks host-side —
    shipping them was pure wasted ICI/readback bytes).

    Every shard runs the SAME routed kernel stack as the single-chip
    path (ops/device_index._bucket_full: hybrid Pallas kernels, chunked
    big-bucket pipeline, carried/shared page streams, small-table row
    gathers) on its local CSR — use_pallas/chunked/small_widths/with_pg
    key the cache so the routing is static under jit."""
    from docodo_tpu.ops.device_index import SmallTab, _bucket_full

    def local_query(off, co, bo, pd, hd, pg, *rest):
        ns = len(small_widths)
        small_flat, (tq, rq) = rest[: 2 * ns], rest[2 * ns:]
        off, co, bo, pd, hd = off[0], co[0], bo[0], pd[0], hd[0]
        small = tuple(
            SmallTab(w, small_flat[2 * i][0], small_flat[2 * i + 1][0],
                     band=band)
            for i, (w, band) in enumerate(small_widths)
        ) or None
        lf = _bucket_full(
            off, co, bo, pd, hd, tq, rq, cap=cap, topk=topk,
            hit_cap=hit_cap, with_docs=with_docs, use_pallas=use_pallas,
            small=small, chunked=chunked,
            page_of=pg[0] if with_pg else None,
        )
        return tuple(
            jax.lax.all_gather(x, "d") for x in lf if x is not None
        )

    t_spec = P(*([None] * t_ndim))
    # LocateFull field order: pages/ranks/counts [S,B,k], n_pages
    # [S,B], (docs/doc_ranks [S,B,k] when with_docs), hits
    # [S,B,hit_cap], n_hits [S,B]
    p3 = P(None, None, None)
    p2 = P(None, None)
    out_specs = (p3, p3, p3, p2) + ((p3, p3) if with_docs else ()) + (
        p3, p2
    )
    small_specs = sum(
        ((P("d", None), P("d", None, None)),) * len(small_widths), ()
    ) if small_widths else ()
    fn = shard_map(
        local_query, mesh=mesh,
        in_specs=(
            P("d", None), P("d", None), P("d", None), P("d", None),
            P("d", None), P("d", None),
        ) + small_specs + (t_spec, P(None, None)),
        out_specs=out_specs,
        check_vma=False,  # replicated outputs, as in sharded_query
    )
    return jax.jit(fn)


def sharded_query_full(mesh, term_offsets, coords, bounds, page_doc,
                       is_header, terms, rs, cap: int, topk: int,
                       hit_cap: int, with_docs: bool = True,
                       small=None, page_of=None,
                       use_pallas: Optional[bool] = None):
    """Full-result twin of sharded_query: every shard evaluates the
    replicated (variant-aware) query batch with the single-chip routed
    kernel stack (ops/device_index._bucket_full), and the per-shard
    LocateFull fields are all_gathered so every host process sees
    [S, B, ...] — hit streams stay in SHARD-LOCAL coordinates, which
    is exactly what per-shard materialization needs (in-page positions
    are shard-invariant because documents never span shards).

    terms: int32[B, W] or int32[B, W, V]; rs: int32[B, W].
    small: optional stacked small tables — tuple of (w, band,
    row_map [S, T], tab [S, rows, 2w]) entries
    (serving.ShardedDeviceIndex staging).
    page_of: optional [S, n] per-posting page indices.
    Returns the 8 LocateFull fields as a tuple of [S, B, ...] arrays;
    with_docs=False returns None in the docs/doc_ranks slots (and skips
    their compute + collective entirely).
    """
    import os

    if use_pallas is None:
        env = os.environ.get("DOCODO_PALLAS")
        use_pallas = (env == "1") if env is not None else (
            jax.default_backend() == "tpu")
    from docodo_tpu.ops.device_index import _chunked_mode

    small = small or ()
    widths = tuple((w, band) for w, band, _, _ in small)
    with_pg = page_of is not None
    if not with_pg:
        page_of = jnp.zeros(
            (coords.shape[0], 1), dtype=jnp.int32)  # placeholder leaf
    fn = _sharded_query_full_jit(
        mesh, cap, topk, hit_cap, terms.ndim, with_docs,
        use_pallas, _chunked_mode(), widths, with_pg,
    )
    small_flat = sum(((rm, tb) for _, _, rm, tb in small), ())
    out = fn(term_offsets, coords, bounds, page_doc, is_header, page_of,
             *small_flat, terms, rs)
    if with_docs:
        return out
    pages, ranks, counts, n_pages, hits, n_hits = out
    return pages, ranks, counts, n_pages, None, None, hits, n_hits


# ---------------------------------------------------------------------------
# host-side shard assembly
# ---------------------------------------------------------------------------

INT32_COORD_LIMIT = (1 << 31) - 1  # device coords are int32 per shard


class ShardCoordinateOverflow(ValueError):
    """A shard's coordinate space would exceed 2^31-1 chars (the int32
    device coordinate contract, ops/device_index.py) — raise rather than
    silently wrap. Remedy: more shards, or split oversized documents."""


def _assign_docs(sizes, extents, num_shards: int):
    """Greedy least-loaded document assignment with an int32 coordinate
    budget per shard: documents are placed on the least-loaded shard
    whose coordinate space still fits the doc's extent; a doc that fits
    no shard raises ShardCoordinateOverflow (the document-level split IS
    the sharding — docs never span shards, so the only unsplittable unit
    is a single >2 GB document)."""
    loads = [0] * num_shards
    coord_loads = [0] * num_shards
    assign = [[] for _ in range(num_shards)]
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    for i in order:
        ext = int(extents[i])
        if ext > INT32_COORD_LIMIT:
            raise ShardCoordinateOverflow(
                f"document {i} spans {ext} chars > 2^31-1; split the "
                f"document (e.g. smaller pages) before staging"
            )
        for s in sorted(range(num_shards), key=loads.__getitem__):
            if coord_loads[s] + ext <= INT32_COORD_LIMIT:
                assign[s].append(i)
                loads[s] += sizes[i]
                coord_loads[s] += ext
                break
        else:
            raise ShardCoordinateOverflow(
                f"document {i} ({ext} chars) fits no shard: every "
                f"shard's int32 coordinate space is full — increase "
                f"num_shards (corpus needs > {num_shards} shards)"
            )
    for s in range(num_shards):
        assign[s].sort()
    return assign


@dataclass
class ShardedCorpus:
    """Host staging of a tokenized corpus into uniform device shards."""

    term_ids: np.ndarray   # int32[S, Nloc]
    coords: np.ndarray     # int32[S, Nloc]
    bounds: np.ndarray     # int32[S, Ploc] page END coords per shard
    page_doc: np.ndarray   # int32[S, Ploc]
    page_base: np.ndarray  # int32[S] global page row offset
    terms: List[str]
    n_tokens: np.ndarray   # int32[S]
    # document assignment: doc_assign[s] = original doc indices on shard
    # s, in shard-local order (None for legacy callers)
    doc_assign: Optional[List[List[int]]] = None


def stage_shards(
    docs: Sequence[Sequence[tuple]], doc_pages: Sequence[Sequence[int]],
    term_to_id, num_shards: int,
) -> ShardedCorpus:
    """Assign documents to shards (greedy least-loaded by token count),
    each shard getting its own 0-based coordinate space — the device-mesh
    analog of the reference's per-thread builders (ref Build.cs:443-452).

    docs[i]      : sequence of (term_id, coord) for document i
                   (coords doc-local ascending)
    doc_pages[i] : page END coords (doc-local) of document i
    """
    extents = [
        (doc_pages[i][-1] if doc_pages[i] else 0) for i in range(len(docs))
    ]
    assign = _assign_docs(
        [len(d) for d in docs], extents, num_shards
    )

    tid_rows, coord_rows, bound_rows, pdoc_rows = [], [], [], []
    for s in range(num_shards):
        tids, cs, bs, pd = [], [], [], []
        base = 0
        ndocs = 0
        for i in assign[s]:
            for t, c in docs[i]:
                tids.append(t)
                cs.append(base + c)
            for pend in doc_pages[i]:
                bs.append(base + pend)
                pd.append(ndocs)
            base += doc_pages[i][-1] if doc_pages[i] else 0
            ndocs += 1
        tid_rows.append(np.asarray(tids, dtype=np.int32))
        coord_rows.append(np.asarray(cs, dtype=np.int32))
        bound_rows.append(np.asarray(bs, dtype=np.int32))
        pdoc_rows.append(np.asarray(pd, dtype=np.int32))

    nloc = max((r.size for r in tid_rows), default=1) or 1
    ploc = max((r.size for r in bound_rows), default=1) or 1
    S = num_shards
    term_ids = np.full((S, nloc), int(INF32), dtype=np.int32)
    coords = np.full((S, nloc), int(INF32), dtype=np.int32)
    bounds = np.full((S, ploc), int(INF32), dtype=np.int32)
    page_doc = np.zeros((S, ploc), dtype=np.int32)
    n_tokens = np.zeros(S, dtype=np.int32)
    page_base = np.zeros(S, dtype=np.int32)
    acc = 0
    for s in range(S):
        n = tid_rows[s].size
        term_ids[s, :n] = tid_rows[s]
        coords[s, :n] = coord_rows[s]
        p = bound_rows[s].size
        bounds[s, :p] = bound_rows[s]
        page_doc[s, :p] = pdoc_rows[s]
        n_tokens[s] = n
        page_base[s] = acc
        acc += p
    return ShardedCorpus(
        term_ids=term_ids, coords=coords, bounds=bounds,
        page_doc=page_doc, page_base=page_base,
        terms=list(term_to_id), n_tokens=n_tokens, doc_assign=assign,
    )


def assign_docs_contiguous(sizes, extents, num_shards: int):
    """Contiguous balanced document partition: shard s owns a RANGE of
    consecutive documents. Within a shard the packed coordinate space
    preserves the global doc adjacency, so the reference's cross-document
    proximity windows (coordinates are corpus-global, ref Build.cs:529-531)
    match exactly everywhere except the S-1 shard boundaries."""
    total = sum(sizes)
    target = max(1, total // num_shards + 1)
    assign = [[] for _ in range(num_shards)]
    s = 0
    load = 0
    coord_load = 0
    for i, size in enumerate(sizes):
        ext = int(extents[i])
        if ext > INT32_COORD_LIMIT:
            raise ShardCoordinateOverflow(
                f"document {i} spans {ext} chars > 2^31-1; split the "
                f"document (e.g. smaller pages) before staging"
            )
        remaining_docs = len(sizes) - i
        if assign[s] and s < num_shards - 1 and (
            load + size > target or coord_load + ext > INT32_COORD_LIMIT
            or remaining_docs <= num_shards - 1 - s
        ):
            s += 1
            load = coord_load = 0
        if coord_load + ext > INT32_COORD_LIMIT:
            raise ShardCoordinateOverflow(
                f"document {i} ({ext} chars) fits no shard: increase "
                f"num_shards (corpus needs > {num_shards} shards)"
            )
        assign[s].append(i)
        load += size
        coord_load += ext
    return assign


def stage_shards_arrays(
    doc_tids: Sequence[np.ndarray], doc_coords: Sequence[np.ndarray],
    doc_pages: Sequence[Sequence[int]], num_shards: int,
    terms: Sequence[str] = (),
    assign: Optional[List[List[int]]] = None,
) -> ShardedCorpus:
    """Array-native shard staging (no per-token Python objects): same
    assignment policy as stage_shards but documents stay as numpy
    (term_id, coord) arrays end to end — required at GB scale.

    `assign` overrides the greedy least-loaded placement with a
    precomputed per-shard doc-index list (e.g. assign_docs_contiguous
    for serving parity)."""
    extents = [
        (doc_pages[i][-1] if doc_pages[i] else 0)
        for i in range(len(doc_tids))
    ]
    if assign is None:
        assign = _assign_docs(
            [t.size for t in doc_tids], extents, num_shards
        )

    nloc = max((sum(doc_tids[i].size for i in a) for a in assign), default=1) or 1
    ploc = max((sum(len(doc_pages[i]) for i in a) for a in assign), default=1) or 1
    S = num_shards
    term_ids = np.full((S, nloc), int(INF32), dtype=np.int32)
    coords = np.full((S, nloc), int(INF32), dtype=np.int32)
    bounds = np.full((S, ploc), int(INF32), dtype=np.int32)
    page_doc = np.zeros((S, ploc), dtype=np.int32)
    n_tokens = np.zeros(S, dtype=np.int32)
    page_base = np.zeros(S, dtype=np.int32)
    acc = 0
    for s in range(S):
        pos = 0
        ppos = 0
        base = 0
        for ndoc, i in enumerate(assign[s]):
            n = doc_tids[i].size
            term_ids[s, pos: pos + n] = doc_tids[i]
            coords[s, pos: pos + n] = doc_coords[i] + np.int32(base)
            pos += n
            for pend in doc_pages[i]:
                bounds[s, ppos] = base + pend
                page_doc[s, ppos] = ndoc
                ppos += 1
            base += doc_pages[i][-1] if doc_pages[i] else 0
        n_tokens[s] = pos
        page_base[s] = acc
        acc += ppos
    return ShardedCorpus(
        term_ids=term_ids, coords=coords, bounds=bounds,
        page_doc=page_doc, page_base=page_base,
        terms=list(terms), n_tokens=n_tokens, doc_assign=assign,
    )


def full_step(mesh: Mesh, corpus: ShardedCorpus, terms, rs,
              num_terms: int, cap: int, topk: int):
    """One combined build+query step over the mesh (used by the
    multi-chip dry run and scale benchmarks): sharded sort-build followed
    by a replicated query batch with an all_gather top-k combine."""
    st, sc, off = sharded_build(
        mesh, jnp.asarray(corpus.term_ids), jnp.asarray(corpus.coords),
        num_terms,
    )
    return sharded_query(
        mesh, off, sc, jnp.asarray(corpus.bounds),
        jnp.asarray(corpus.page_doc), jnp.asarray(corpus.page_base),
        jnp.asarray(terms), jnp.asarray(rs), cap=cap, topk=topk,
    )
