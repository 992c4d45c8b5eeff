"""Multi-host (DCN) corpus sharding over a 2-D device mesh.

The single-host layout (parallel/sharding.py) shards DOCUMENTS over the
local devices' ICI axis. At multi-host scale the same document sharding
extends over a second mesh axis: a global mesh ("h", "d") = (process
count, local device count), where axis "h" rides DCN and axis "d" rides
ICI. Documents never span shards, so there is still no halo exchange —
the only cross-host traffic is the per-query top-k combine, which
gathers over "d" (ICI) FIRST and only then over "h" (DCN), so the
narrow inter-host links carry one already-reduced [B, topk] tensor per
host rather than per device.

Host staging is process-local: `stage_for_process` materializes ONLY
the shard rows owned by this process's addressable devices, so a 1 TB
corpus divides its host RAM/IO across the fleet (the reference's
per-thread builders recast one level up — ref Docodo.NET/Index.cs:127,
464-465, 584-592; coordinate reconciliation is the same page_base
offset table).

Single-process use (tests, this image) builds the same global mesh from
local virtual devices; real fleets call `init_distributed()` first
(jax.distributed over DCN) and pass jax.devices() — the code paths are
identical, which is what makes the layout testable on an 8-virtual-CPU
mesh.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from docodo_tpu.ops.device_index import build_postings, query_step
from docodo_tpu.parallel.sharding import ShardedCorpus, _assign_docs
from docodo_tpu.ops.seqops import INF32

shard_map = jax.shard_map


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed (DCN control plane). No-op when the
    runtime is already initialized or single-process values are given.

    On TPU pods the three arguments auto-detect from the environment;
    pass them explicitly on CPU/GPU fleets.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_global_mesh(devices=None, num_hosts: Optional[int] = None) -> Mesh:
    """2-D mesh ("h", "d"): hosts over DCN x local devices over ICI.

    With `devices` unset, uses jax.devices() (all processes' devices in
    a jax.distributed fleet) grouped by process; `num_hosts` overrides
    the grouping for single-process simulation of a multi-host layout.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if num_hosts is None:
        num_hosts = max(1, getattr(jax, "process_count", lambda: 1)())
    if n % num_hosts:
        raise ValueError(f"{n} devices not divisible by {num_hosts} hosts")
    grid = np.array(devices).reshape(num_hosts, n // num_hosts)
    return Mesh(grid, axis_names=("h", "d"))


# ---------------------------------------------------------------------------
# process-local staging
# ---------------------------------------------------------------------------

@dataclass
class ProcessShards:
    """This process's rows of the global ShardedCorpus: shard s of the
    global layout lives at [h, d] = divmod(s, num_local); a process
    materializes only its own h-row."""

    term_ids: np.ndarray   # int32[num_local, Nloc]
    coords: np.ndarray     # int32[num_local, Nloc]
    bounds: np.ndarray     # int32[num_local, Ploc]
    page_doc: np.ndarray   # int32[num_local, Ploc]
    page_base: np.ndarray  # int32[num_local] global page row offsets
    n_tokens: np.ndarray   # int32[num_local]


def plan_document_assignment(doc_sizes: Sequence[int],
                             doc_extents: Sequence[int],
                             num_shards: int) -> List[List[int]]:
    """Global document->shard plan (greedy least-loaded with the int32
    coordinate guard). Deterministic: every process computes the same
    plan from the same (sizes, extents) metadata — only the OWNED shards
    are then materialized, so the full corpus text never needs to be
    resident on any single host."""
    return _assign_docs(list(doc_sizes), list(doc_extents), num_shards)


def stage_for_process(
    doc_tids: Sequence[Optional[np.ndarray]],
    doc_coords: Sequence[Optional[np.ndarray]],
    doc_pages: Sequence[Sequence[int]],
    assign: List[List[int]],
    num_hosts: int, num_local: int, process_index: int,
    nloc: Optional[int] = None, ploc: Optional[int] = None,
    page_counts: Optional[Sequence[int]] = None,
) -> ProcessShards:
    """Materialize the shard rows owned by `process_index`.

    doc_tids/doc_coords entries may be None for documents NOT owned by
    this process (their tokens are never touched; doc_pages metadata is
    still required everywhere for the global page_base offsets).
    nloc/ploc fix the global row widths — pass the fleet-wide maxima so
    every process produces identically-shaped rows (jit shape contract);
    they default to this process's own maxima.
    """
    S = num_hosts * num_local
    if len(assign) != S:
        raise ValueError(f"plan has {len(assign)} shards, mesh has {S}")
    if page_counts is None:
        page_counts = [len(p) for p in doc_pages]
    # global page row offsets: shard s starts after all pages of shards
    # < s (every process derives this identically from metadata)
    shard_pages = [sum(page_counts[i] for i in a) for a in assign]
    page_base_all = np.concatenate(
        [[0], np.cumsum(shard_pages)[:-1]]
    ).astype(np.int32)

    own = range(process_index * num_local, (process_index + 1) * num_local)
    if nloc is None:
        nloc = max(
            (sum(doc_tids[i].size for i in assign[s]) for s in own),
            default=1,
        ) or 1
    if ploc is None:
        ploc = max((shard_pages[s] for s in own), default=1) or 1

    term_ids = np.full((num_local, nloc), int(INF32), dtype=np.int32)
    coords = np.full((num_local, nloc), int(INF32), dtype=np.int32)
    bounds = np.full((num_local, ploc), int(INF32), dtype=np.int32)
    page_doc = np.zeros((num_local, ploc), dtype=np.int32)
    n_tokens = np.zeros(num_local, dtype=np.int32)
    page_base = np.zeros(num_local, dtype=np.int32)
    for row, s in enumerate(own):
        pos = ppos = base = 0
        for ndoc, i in enumerate(assign[s]):
            t, c = doc_tids[i], doc_coords[i]
            if t is None or c is None:
                raise ValueError(
                    f"doc {i} assigned to local shard {s} but not loaded"
                )
            n = t.size
            term_ids[row, pos: pos + n] = t
            coords[row, pos: pos + n] = c + np.int32(base)
            pos += n
            for pend in doc_pages[i]:
                bounds[row, ppos] = base + pend
                page_doc[row, ppos] = ndoc
                ppos += 1
            base += doc_pages[i][-1] if doc_pages[i] else 0
        n_tokens[row] = pos
        page_base[row] = page_base_all[s]
    return ProcessShards(
        term_ids=term_ids, coords=coords, bounds=bounds,
        page_doc=page_doc, page_base=page_base, n_tokens=n_tokens,
    )


# ---------------------------------------------------------------------------
# 2-D sharded build + query
# ---------------------------------------------------------------------------

_build_cache = {}


def distributed_build(mesh: Mesh, term_ids, coords, num_terms: int):
    """Per-shard local sort over the full ("h", "d") grid: inputs are
    [H*D, Nloc] globally (each process passes its ProcessShards rows via
    jax.make_array_from_process_local_data in a real fleet; a
    single-process caller passes the full stack)."""
    key = (mesh, num_terms)
    fn = _build_cache.get(key)
    if fn is None:

        def local_build(t, c):
            st, sc, off = build_postings(t[0], c[0], num_terms)
            return st[None], sc[None], off[None]

        fn = jax.jit(shard_map(
            local_build, mesh=mesh,
            in_specs=(P(("h", "d"), None), P(("h", "d"), None)),
            out_specs=(
                P(("h", "d"), None), P(("h", "d"), None),
                P(("h", "d"), None),
            ),
        ))
        _build_cache[key] = fn
    return fn(term_ids, coords)


@functools.partial(jax.jit, static_argnames=("mesh", "cap", "topk"))
def distributed_query(mesh, term_offsets, coords, bounds, page_doc,
                      page_base, terms, rs, cap: int, topk: int):
    """Replicated query batch against every shard of the global mesh;
    top-k combine gathers over "d" (ICI) first, reduces to a per-host
    top-k, and only then gathers over "h" (DCN) — inter-host traffic is
    [B, topk] per host, independent of local device count."""

    def local_query(off, co, bo, pd, base, tq, rq):
        off, co, bo, pd = off[0], co[0], bo[0], pd[0]
        fn = functools.partial(query_step, cap=cap, topk=topk)
        pages, ranks, counts = jax.vmap(
            fn, in_axes=(None, None, None, None, 0, 0)
        )(off, co, bo, pd, tq, rq)
        pages = jnp.where(pages >= 0, pages + base[0], -1)

        def combine(axis, p, r, c):
            ap = jax.lax.all_gather(p, axis)
            ar = jax.lax.all_gather(r, axis)
            ac = jax.lax.all_gather(c, axis)
            s, b, k = ar.shape
            fr = jnp.transpose(ar, (1, 0, 2)).reshape(b, s * k)
            fp = jnp.transpose(ap, (1, 0, 2)).reshape(b, s * k)
            fc = jnp.transpose(ac, (1, 0, 2)).reshape(b, s * k)
            tr, sel = jax.lax.top_k(fr, k)
            return (
                jnp.take_along_axis(fp, sel, axis=1), tr,
                jnp.take_along_axis(fc, sel, axis=1),
            )

        # ICI reduce first, DCN second
        pages, ranks, counts = combine("d", pages, ranks, counts)
        pages, ranks, counts = combine("h", pages, ranks, counts)
        return pages, ranks, counts

    fn = shard_map(
        local_query, mesh=mesh,
        in_specs=(
            P(("h", "d"), None), P(("h", "d"), None), P(("h", "d"), None),
            P(("h", "d"), None), P(("h", "d")), P(None, None), P(None, None),
        ),
        out_specs=(P(None, None), P(None, None), P(None, None)),
        check_vma=False,  # outputs replicated by construction
    )
    return fn(term_offsets, coords, bounds, page_doc, page_base, terms, rs)


@functools.lru_cache(maxsize=128)
def _distributed_query_full_jit(mesh, cap: int, topk: int, hit_cap: int,
                                t_ndim: int, with_docs: bool,
                                use_pallas: bool, chunked: str,
                                small_widths: tuple, with_pg: bool):
    """2-D twin of sharding._sharded_query_full_jit, DCN-aware: every
    shard of the ("h", "d") mesh runs the same routed full-result
    kernel stack (_bucket_full) on its local CSR, and the LocateFull
    STREAM fields (pages/ranks/counts/hits — the big tensors) ride ONE
    all_gather over "d" (ICI) only, leaving the outputs SHARDED over
    "h": in a jax.distributed fleet each process reads back only its
    addressable rows, so hit streams never cross DCN (per-shard
    materialization is host-local; the application combines the small
    materialized doc lists). Only the [S, B] truncation counts
    (n_pages/n_hits) additionally cross DCN, so every host makes the
    identical re-serve decision (the batcher's truncation contract,
    ref Search.cs:365-420)."""
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
        out = []
        for x in lf:
            if x is None:
                continue
            g = jax.lax.all_gather(x, "d")  # ICI: [D, B, ...]
            if x.ndim == 1:
                # n_pages / n_hits: [D, B] int32 — the only DCN bytes
                gh = jax.lax.all_gather(g, "h")  # [H, D, B]
                out.append(gh.reshape(-1, gh.shape[-1]))  # [S, B]
            else:
                out.append(g)  # stays h-sharded: global [H*D, B, ...]
        return tuple(out)

    t_spec = P(*([None] * t_ndim))
    # stream fields shard dim0 over "h" (each host holds its D shards);
    # count fields are fully replicated
    p3h = P("h", None, None)
    p2r = P(None, None)
    out_specs = (p3h, p3h, p3h, p2r) + ((p3h, p3h) if with_docs
                                        else ()) + (p3h, p2r)
    small_specs = sum(
        ((P(("h", "d"), None), P(("h", "d"), None, None)),)
        * len(small_widths), ()
    ) if small_widths else ()
    sh2 = P(("h", "d"), None)
    fn = shard_map(
        local_query, mesh=mesh,
        in_specs=(sh2, sh2, sh2, sh2, sh2, sh2) + small_specs
        + (t_spec, P(None, None)),
        out_specs=out_specs,
        check_vma=False,  # replication by construction, as in the 1-D leg
    )
    return jax.jit(fn)


def distributed_query_full(mesh, term_offsets, coords, bounds, page_doc,
                           is_header, terms, rs, cap: int, topk: int,
                           hit_cap: int, with_docs: bool = True,
                           small=None, page_of=None,
                           use_pallas: Optional[bool] = None):
    """Full-result (positions) serving over the 2-D hosts x devices
    mesh — same signature and [S, B, ...] return contract as
    sharding.sharded_query_full, so ShardedDeviceIndex serves either
    layout with the identical materialization/boundary machinery
    (ref Search.cs:365-420: ResultDocPage.pos for every query)."""
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
        page_of = jnp.zeros((coords.shape[0], 1), dtype=jnp.int32)
    fn = _distributed_query_full_jit(
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


def assemble_global(rows_per_process: Sequence[ProcessShards]) -> ShardedCorpus:
    """Single-process helper (tests/dryrun): stack every process's rows
    into the global [H*D, ...] arrays a real fleet would form with
    jax.make_array_from_process_local_data."""
    return ShardedCorpus(
        term_ids=np.concatenate([r.term_ids for r in rows_per_process]),
        coords=np.concatenate([r.coords for r in rows_per_process]),
        bounds=np.concatenate([r.bounds for r in rows_per_process]),
        page_doc=np.concatenate([r.page_doc for r in rows_per_process]),
        page_base=np.concatenate([r.page_base for r in rows_per_process]),
        terms=[],
        n_tokens=np.concatenate([r.n_tokens for r in rows_per_process]),
    )
