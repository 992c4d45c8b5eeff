"""Stage split of the ru mix's DOMINANT bucket on the r4 fused path
(cap-1024 W2 B=5000 through the fused merge+AND+locate kernel): gather
-> fused kernel -> top-k tail -> hits compaction sort -> full bucket
(with docs). Reps chain inside ONE jitted fori_loop so per-dispatch
overhead is amortized (the EN roofline measured ~2.8 ms per isolated
program dispatch over the tunnel); every stage's checksum consumes its
outputs so nothing DCEs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "25"))


def main() -> int:
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    import docodo_tpu
    from docodo_tpu.lang.vocab import Vocab, build_opencorpora_voc
    from docodo_tpu.ops import device_index as di
    from docodo_tpu.ops import pallas_query as pq
    from docodo_tpu.ops.seqops import INF32
    from docodo_tpu.query.batcher import compile_request
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    print("devices:", jax.devices(), file=sys.stderr)
    tmp = tempfile.mkdtemp(prefix="rufst")
    build_opencorpora_voc(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "Dict", "ru",
            "dict.opcorpora.xml"), tmp + "/ru.voc")
    voc = Vocab(tmp + "/ru.voc")
    raw = open("/root/reference/Test/voyna-i-mir-tom-1.txt",
               encoding="cp1251", errors="replace").read()
    ind = docodo_tpu.Index(path=tmp, in_memory=True, vocs=[voc])
    ind.add_data_source(
        ListDataSource("docs", [IndexPagedTextFile("vim", raw, "")]))
    ind.create()
    dix = di.DeviceIndex.from_index(ind)

    reqs = ['"князь андрей"', "сказала княжна"] * 2500
    comp = [dix.compile_group_query(compile_request(ind, r))
            for r in reqs]
    terms = np.full((len(comp), 2), -1, dtype=np.int32)
    rsq = np.ones((len(comp), 2), dtype=np.int32)
    need = 0
    for row, cg in enumerate(comp):
        rows_i, rvals_i = cg[0], cg[1]
        for j, (ids, r) in enumerate(zip(rows_i, rvals_i)):
            terms[row, j] = ids[0]
            rsq[row, j] = r
        need = max(need, cg[4])
    cap = di._bucket(need)
    tq, rq = jnp.asarray(terms), jnp.asarray(rsq)
    B = len(comp)
    print(f"B={B} cap={cap} (fused admission: "
          f"{2 * cap <= pq.FUSED_AND_MAX})", file=sys.stderr)
    bounds, page_doc = dix.bounds, dix.page_doc
    hdr = dix.header_mask()
    small, page_of = dix.small, dix.page_of
    topk, hit_cap = 16, 256

    def gather(tqz):
        g = jax.vmap(lambda t: di.gather_term_paged(
            dix.coords, page_of, dix.term_offsets, t, cap, small))
        a, apg, na = g(tqz[:, 0])
        b, bpg, nb = g(tqz[:, 1])
        return a, apg, na, b, bpg, nb

    def fused(tqz):
        a, apg, na, b, bpg, nb = gather(tqz)
        return pq.pallas_merge_and_locate(
            a, na, b, nb, apg, bpg, rq[:, :1], rq[:, 1:2], cap=cap)

    def with_topk(tqz):
        hv, page_s, rank_s, cnt_s = fused(tqz)
        located = pq.locate_streams_topk(page_s, rank_s, cnt_s, topk, B)
        return hv, located

    def with_hits(tqz):
        hv, located = with_topk(tqz)
        hits = jax.lax.sort(hv)[:, :hit_cap]
        n_hits = jnp.sum((hv < INF32).astype(jnp.int32), axis=1)
        return hits, n_hits, located

    def full(tqz):
        return di._bucket_full(
            dix.term_offsets, dix.coords, bounds, page_doc, hdr,
            tqz, rq, cap=cap, topk=topk, hit_cap=hit_cap,
            with_docs=True, use_pallas=True, small=small,
            page_of=page_of)

    def _csum(*arrs):
        s = jnp.float32(0)
        for a in arrs:
            if a.dtype == jnp.int32:
                a = jnp.where(a == INF32, 0, a)
            s = s + jnp.sum(a.astype(jnp.float32))
        return s

    def s_gather(t):
        a, apg, na, b, bpg, nb = gather(t)
        return _csum(a, apg, na, b, bpg, nb)

    def s_merge_only(t):
        a, apg, na, b, bpg, nb = gather(t)
        vals, tg, pg = pq.pallas_bitonic_merge(
            a, na, b, nb, apg, bpg, cap=cap)
        return _csum(vals, tg, pg)

    def s_merge_and(t):
        a, apg, na, b, bpg, nb = gather(t)
        vals, tg, pg = pq.pallas_bitonic_merge(
            a, na, b, nb, apg, bpg, cap=cap)
        hv = pq.pallas_chunked_and(vals, tg, rq[:, :1], rq[:, 1:2])
        return _csum(hv, pg)

    def s_fused(t):
        hv, page_s, rank_s, cnt_s = fused(t)
        return _csum(hv, page_s, rank_s, cnt_s)

    def s_topk(t):
        hv, located = with_topk(t)
        return _csum(hv, *located)

    def s_hits(t):
        hits, n_hits, located = with_hits(t)
        return _csum(hits, n_hits, *located)

    def s_full(t):
        o = full(t)
        return _csum(o.pages, o.ranks, o.counts, o.n_pages, o.docs,
                     o.doc_ranks, o.hits, o.n_hits)

    stages = [
        ("gather", s_gather),
        ("gather+bitonic merge", s_merge_only),
        ("gather+merge+AND (3-kernel)", s_merge_and),
        ("gather+FUSED m+A+l", s_fused),
        ("+topk tail", s_topk),
        ("+hits sort/crop", s_hits),
        ("full (+docs)", s_full),
    ]
    prev = 0.0
    for name, fn in stages:
        @jax.jit
        def floop(s0, fn=fn):
            def body(_, s):
                return fn(tq + (s * 0).astype(jnp.int32)).astype(
                    jnp.float32) * 1e-6 + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(floop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(floop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert abs(final - warm) < 1e-3 * max(abs(final), 1.0)
        print(f"{name:26s} {dt:7.2f} ms  (+{dt - prev:6.2f})",
              file=sys.stderr)
        prev = dt
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
