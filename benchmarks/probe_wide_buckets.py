"""Stage decomposition of the EN headline's top remaining cost
(PROFILE_r05 ablation: the 'chunked' group — 5 sparse wide W2 buckets,
14 rows, 3.2 ms marginal of the 10.4 ms batch = 229 us/row). Each
bucket rides gather-paged fetch -> pallas_bitonic_merge -> chunked AND
-> chunked locate with rows PADDED to the Mosaic block height (8), so
a B=1 cap-32768 query pays 8 rows of 65536-lane kernel work. This
probe times each stage per bucket shape on the real Pickwick staging
so the 3.2 ms has an owner.

    python benchmarks/probe_wide_buckets.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CORPUS = os.environ.get(
    "DOCODO_BENCH_CORPUS",
    "/root/reference/Test/Dickens Charles. The Pickwick Papers - royallib.ru.txt",
)
REPS = int(os.environ.get("DOCODO_BENCH_REPS", "30"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    log("devices:", jax.devices())

    from benchmarks import common as bc
    from docodo_tpu.native import pipeline as npipe
    from docodo_tpu.ops import device_index as di
    from docodo_tpu.ops import pallas_query as pq

    text = open(CORPUS, encoding="cp1251", errors="replace").read()
    interner = npipe.make_interner()
    tids, coords = npipe.tokenize_intern(text, interner)
    T = len(interner.terms())
    st, sc, off = di.build_postings(jnp.asarray(tids),
                                    jnp.asarray(coords), T)
    order = np.lexsort((coords, tids))
    sc_host = coords[order]
    counts = np.bincount(tids, minlength=T)
    off_np = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(counts, out=off_np[1:])
    page_len = 3000
    n_pages = (len(text) + page_len - 1) // page_len
    bounds_np = np.minimum(
        np.arange(1, n_pages + 1, dtype=np.int64) * page_len, len(text))
    pages_np = di.build_page_of(bounds_np, sc_host)
    page_of = jnp.asarray(pages_np)
    small = di.build_small_tables(off_np, sc_host, pages_np=pages_np)
    bounds = jnp.asarray(bounds_np.astype(np.int32))
    page_doc = jnp.zeros(n_pages, dtype=jnp.int32)
    is_header = jnp.zeros(n_pages, dtype=bool)

    # reproduce the standard mix's wide W2 buckets exactly
    id_to_term = {i: w for i, w in enumerate(interner.terms())}
    terms, rs = bc.standard_mix(counts, id_to_term, 10_000)
    fterms, frs, fcaps, fhcaps = bc.full_buckets(terms, rs, counts, 1024)
    wide = [
        (i, fcaps[i], fhcaps[i]) for i in range(len(fterms))
        if fterms[i].shape[1] == 2 and isinstance(fcaps[i], int)
        and 2 * fcaps[i] > pq.FUSED_AND_MAX
    ]
    log(f"wide W2 buckets: "
        f"{[(c, tuple(fterms[i].shape), h) for i, c, h in wide]}")

    def chain_time(name, fn, *args):
        """Time fn(*args) chained through a checksum scalar."""
        @jax.jit
        def floop(s0):
            def body(_, s):
                outs = fn(*[a + (s * 0).astype(a.dtype)
                            if hasattr(a, "dtype")
                            and a.dtype in (jnp.int32,) else a
                            for a in args])
                leaves = jax.tree_util.tree_leaves(outs)
                acc = s * 0
                for o in leaves:
                    acc = acc + jnp.sum(o.astype(jnp.float32)) * 1e-9
                return acc + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(floop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(floop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert abs(final - warm) < 1e-2 * max(abs(final), 1.0), name
        log(f"    {name:26s} {dt:7.3f} ms")
        return dt

    for i, cap, hcap in wide:
        tq, rq = fterms[i], frs[i]
        B = tq.shape[0]
        log(f"  bucket cap={cap} B={B} hcap={hcap}:")

        # stage 1: paged fetch of both words
        def fetch(tqa):
            g = jax.vmap(lambda t: di.gather_term_paged(
                sc, page_of, off, t, cap, small))
            a, apg, na = g(tqa[:, 0])
            b, bpg, nb = g(tqa[:, 1])
            return a, apg, na, b, bpg, nb
        chain_time("fetch (gather paged x2)", jax.jit(fetch), tq)
        a, apg, na, b, bpg, nb = jax.jit(fetch)(tq)

        # stage 2: bitonic merge kernel
        def merge(a, b):
            return pq.pallas_bitonic_merge(
                a, na, b, nb, apg, bpg, cap=cap)
        chain_time("bitonic merge", jax.jit(merge), a, b)
        vals, tag, pg = jax.jit(merge)(a, b)

        # stage 3: chunked AND (two-pass past FUSED_AND_MAX)
        def do_and(vals, tag):
            return pq.pallas_chunked_and(vals, tag, rq[:, :1], rq[:, 1:2])
        chain_time("chunked AND", jax.jit(do_and), vals, tag)
        hv = jax.jit(do_and)(vals, tag)

        # stage 4: chunked locate + tails (deferred-tail mode off)
        def locate(hv):
            return di._locate_full_chunked(
                hv, bounds, page_doc, is_header, topk=64,
                hit_cap=hcap, with_docs=True, pg=pg)
        chain_time("chunked locate+tails", jax.jit(locate), hv)

        # the production bucket end-to-end
        def bucket(tq2):
            return di.batched_query_full(
                off, sc, bounds, page_doc, is_header, tq2, rq,
                cap=cap, topk=64, hit_cap=hcap, use_pallas=True,
                small=small, page_of=page_of)
        chain_time("production bucket total", jax.jit(bucket), tq)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
