"""Stage-by-stage timing of the dominant full-result bucket
(cap=64, W=2, hit=128, B~5929 on the 10k Pickwick mix).

Each stage prefix runs as one jitted fori_loop (chained through a
checksum scalar) so the ~1 ms/dispatch tunnel floor amortizes over
REPS; successive differences give per-stage device cost.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get(
    "DOCODO_BENCH_CORPUS",
    "/root/reference/Test/Dickens Charles. The Pickwick Papers - royallib.ru.txt",
)
N_QUERIES = int(os.environ.get("DOCODO_BENCH_QUERIES", "10000"))
REPS = int(os.environ.get("DOCODO_BENCH_REPS", "25"))
FULL_TOPK = 64
HIT_CAP = 128
CAP = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from docodo_tpu.ops import device_index as di
    from docodo_tpu.ops.seqops import INF32
    from docodo_tpu.ops import pallas_query as pq
    from benchmarks import common as bc

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    log("devices:", jax.devices())

    with open(CORPUS, encoding="cp1251", errors="replace") as f:
        text = f.read()

    from docodo_tpu.native import pipeline as npipe

    interner = npipe.make_interner()
    tids, coords = npipe.tokenize_intern(text, interner)
    T = len(interner.terms())

    build = jax.jit(di.build_postings, static_argnames=("num_terms",))
    st, sc, off = build(jnp.asarray(tids), jnp.asarray(coords), num_terms=T)
    assert int(off[-1]) == tids.size

    counts = np.bincount(tids, minlength=T)
    id_to_term = {v: k for k, v in
                  {w: i for i, w in enumerate(interner.terms())}.items()}
    # regenerate the id->term map properly
    id_to_term = {i: w for i, w in enumerate(interner.terms())}
    terms, rs = bc.standard_mix(counts, id_to_term, N_QUERIES)

    page_len = 3000
    n_pages = (len(text) + page_len - 1) // page_len
    bounds = jnp.asarray(np.minimum(
        np.arange(1, n_pages + 1) * page_len, len(text)).astype(np.int32))
    page_doc = jnp.zeros(n_pages, dtype=jnp.int32)
    is_header = jnp.zeros(n_pages, dtype=bool)
    log(f"pages: {n_pages}")

    fterms, frs, fcaps, fhcaps = bc.full_buckets(terms, rs, counts, 1024)
    tq = rq = None
    for t, r, c, hb in zip(fterms, frs, fcaps, fhcaps):
        if c == CAP and t.shape[1] == 2 and hb == HIT_CAP:
            tq, rq = t, r
            break
    assert tq is not None
    bsz0 = tq.shape[0]
    pqn = pq.q_for_sorted_cap(CAP)
    pad = (-bsz0) % pqn
    if pad:
        tq = jnp.concatenate([tq, jnp.full((pad, 2), -1, jnp.int32)])
        rq = jnp.concatenate([rq, jnp.ones((pad, 2), jnp.int32)])
    bsz = tq.shape[0]
    log(f"bucket B={bsz0} padded to {bsz}, Q/program={pqn}, "
        f"grid={bsz // pqn}")

    pages_np = di.build_page_of(np.asarray(bounds), np.asarray(sc))
    page_of = jnp.asarray(pages_np)
    small = di.build_small_tables(np.asarray(off), np.asarray(sc),
                                  pages_np=pages_np)
    log(f"small tables: {[tuple(t.shape) for _, _, t in (small or ())]}")

    def gather(tqz):
        g = jax.vmap(lambda t: di.gather_term_paged(
            sc, page_of, off, t, CAP, small))
        a, apg, na = g(tqz[:, 0])
        b, bpg, nb = g(tqz[:, 1])
        return a, apg, na, b, bpg, nb

    def tagged_sort(a, apg, na, b, bpg, nb):
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (bsz, CAP), 1)
        av = jnp.where(lane_c < na[:, None], a, INF32)
        bv = jnp.where(lane_c < nb[:, None], b, INF32)
        tag = jnp.concatenate([
            jnp.where(lane_c < na[:, None], 0, 2),
            jnp.where(lane_c < nb[:, None], 1, 2),
        ], axis=1).astype(jnp.int32)
        vals, tag, pg = jax.vmap(
            lambda v, t, p: jax.lax.sort((v, t, p), num_keys=2)
        )(jnp.concatenate([av, bv], axis=1), tag,
          jnp.concatenate([apg, bpg], axis=1))
        return vals, tag, pg

    import functools
    from jax.experimental import pallas as pl

    n = 2 * CAP

    def kernel_slots(vals, tag, pg):
        kernel = functools.partial(
            pq._sorted_and_locate_full_slots_kernel, cap=CAP, paged=True)
        grid = (bsz // pqn,)
        in_specs = [
            pl.BlockSpec((pqn, n), lambda i: (i, 0)),
            pl.BlockSpec((pqn, n), lambda i: (i, 0)),
            pl.BlockSpec((pqn, 1), lambda i: (i, 0)),
            pl.BlockSpec((pqn, 1), lambda i: (i, 0)),
            pl.BlockSpec((pqn, n), lambda i: (i, 0)),
        ]
        out_specs = [
            pl.BlockSpec((pqn, n), lambda i: (i, 0)),
            pl.BlockSpec((pqn, n), lambda i: (i, 0)),
            pl.BlockSpec((pqn, n), lambda i: (i, 0)),
            pl.BlockSpec((pqn, 1), lambda i: (i, 0)),
            pl.BlockSpec((pqn, 1), lambda i: (i, 0)),
            pl.BlockSpec((pqn, n), lambda i: (i, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bsz, n), jnp.int32),
            jax.ShapeDtypeStruct((bsz, n), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, n), jnp.int32),
        ]
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
        )(vals, tag, rq[:, :1], rq[:, 1:], pg)

    # ---- stage prefixes ------------------------------------------------
    def s_gather(tqz):
        a, apg, na, b, bpg, nb = gather(tqz)
        return (jnp.sum(a * (a < INF32)) + jnp.sum(b * (b < INF32))
                + jnp.sum(apg * (apg < INF32)))

    def s_sort(tqz):
        a, apg, na, b, bpg, nb = gather(tqz)
        vals, tag, pg = tagged_sort(a, apg, na, b, bpg, nb)
        return jnp.sum(jnp.where(vals < INF32, vals, 0)) + jnp.sum(tag)

    def s_kernel(tqz):
        a, apg, na, b, bpg, nb = gather(tqz)
        vals, tag, pg = tagged_sort(a, apg, na, b, bpg, nb)
        page_s, rank_s, cnt_s, n_pages_, n_hits, hitvals = kernel_slots(
            vals, tag, pg)
        return (jnp.sum(rank_s) + jnp.sum(n_hits.astype(jnp.float32)))

    def s_topk(tqz):
        a, apg, na, b, bpg, nb = gather(tqz)
        vals, tag, pg = tagged_sort(a, apg, na, b, bpg, nb)
        page_s, rank_s, cnt_s, n_pages_, n_hits, hitvals = kernel_slots(
            vals, tag, pg)
        pages, ranks, counts = pq._slots_topk_sort(
            page_s, rank_s, cnt_s, FULL_TOPK)
        return jnp.sum(ranks) + jnp.sum(n_hits.astype(jnp.float32))

    def s_hits(tqz):
        a, apg, na, b, bpg, nb = gather(tqz)
        vals, tag, pg = tagged_sort(a, apg, na, b, bpg, nb)
        page_s, rank_s, cnt_s, n_pages_, n_hits, hitvals = kernel_slots(
            vals, tag, pg)
        pages, ranks, counts = pq._slots_topk_sort(
            page_s, rank_s, cnt_s, FULL_TOPK)
        hits = jax.lax.sort(hitvals)[:, :HIT_CAP]
        return (jnp.sum(ranks) + jnp.sum(n_hits.astype(jnp.float32))
                + jnp.sum(jnp.where(hits < INF32, hits, 0)))

    def s_full(tqz):
        outs = di._bucket_full(
            off, sc, bounds, page_doc, is_header, tqz, rq,
            cap=CAP, topk=FULL_TOPK, hit_cap=HIT_CAP, with_docs=True,
            use_pallas=True, small=small, page_of=page_of,
        )
        return (jnp.sum(outs.ranks)
                + jnp.sum(outs.n_hits.astype(jnp.float32)))

    def s_full_nodocs(tqz):
        outs = di._bucket_full(
            off, sc, bounds, page_doc, is_header, tqz, rq,
            cap=CAP, topk=FULL_TOPK, hit_cap=HIT_CAP, with_docs=False,
            use_pallas=True, small=small, page_of=page_of,
        )
        return (jnp.sum(outs.ranks)
                + jnp.sum(outs.n_hits.astype(jnp.float32)))

    stages = [
        ("gather", s_gather),
        ("+tagged sort", s_sort),
        ("+slots kernel", s_kernel),
        ("+topk sort", s_topk),
        ("+hits sort", s_hits),
        ("full (no docs)", s_full_nodocs),
        ("full (+docs)", s_full),
    ]

    prev = 0.0
    for name, fn in stages:
        @jax.jit
        def floop(s0, fn=fn):
            def body(_, s):
                return fn(tq + (s * 0).astype(jnp.int32)).astype(
                    jnp.float32) + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(floop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(floop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert abs(final - warm) < 1e-3 * max(abs(final), 1.0)
        log(f"{name:16s} {dt:7.2f} ms  (+{dt - prev:6.2f})")
        prev = dt


if __name__ == "__main__":
    main()
