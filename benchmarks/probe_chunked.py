"""Fine-grained stage timing of the PRODUCTION chunked W2 pipeline at
the ru mix's dominant bucket shape (B=5000, cap-1024 phrases, 2048-lane
streams): gather -> bitonic merge -> chunked AND -> chunked locate
KERNEL -> weave/top-k tail -> hits sort. Unlike profile_ru_w2.py (which
times the legacy 3-op lax.sort merge for comparison), every stage here
is the exact op the serving path runs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "50"))


def main() -> int:
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    import docodo_tpu
    from docodo_tpu.lang.vocab import Vocab, build_opencorpora_voc
    from docodo_tpu.ops import device_index as di
    from docodo_tpu.ops import pallas_query as pq
    from docodo_tpu.ops.seqops import INF32
    from docodo_tpu.query.batcher import compile_request
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    print("devices:", jax.devices(), file=sys.stderr)
    tmp = tempfile.mkdtemp(prefix="ruw2p")
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
    print(f"B={len(comp)} cap={cap}", file=sys.stderr)
    c0 = cap
    bounds, page_doc = dix.bounds, dix.page_doc
    hdr = dix.header_mask()
    small, page_of = dix.small, dix.page_of
    assert di._tab_serves(small, c0), "banded tables must cover the cap"

    def gather(tqz):
        g0 = jax.vmap(lambda t: di.gather_term_paged(
            dix.coords, page_of, dix.term_offsets, t, c0, small))
        a, apg, na = g0(tqz[:, 0])
        b, bpg, nb = g0(tqz[:, 1])
        return a, apg, na, b, bpg, nb

    def merged(tqz):
        a, apg, na, b, bpg, nb = gather(tqz)
        return pq.pallas_bitonic_merge(a, na, b, nb, apg, bpg, cap=c0)

    def anded(tqz):
        vals, tag, pg = merged(tqz)
        hv = pq.pallas_chunked_and(vals, tag, rq[:, :1], rq[:, 1:2])
        return hv, pg

    def loc_raw(tqz):
        hv, pg = anded(tqz)
        outs = pq.pallas_chunked_locate(
            hv, bounds, topk=16, pg=pg, raw=True)
        return hv, outs

    def located(tqz):
        hv, pg = anded(tqz)
        pages, ranks, counts, n_pages = pq.pallas_chunked_locate(
            hv, bounds, topk=16, pg=pg)
        return hv, pages, ranks, n_pages

    def hits_sorted(tqz):
        hv, pages, ranks, n_pages = located(tqz)
        hits = jax.lax.sort(hv)[:, :256]
        # consume hits so the sort survives DCE
        return (jnp.sum(ranks) + jnp.sum(hits[:, :1].astype(jnp.float32))
                ), n_pages

    def full(tqz):
        return di._bucket_full(
            dix.term_offsets, dix.coords, bounds, page_doc, hdr,
            tqz, rq, cap=cap, topk=16, hit_cap=256, with_docs=True,
            use_pallas=True, small=small, page_of=page_of,
        )

    stages = [
        ("gather", lambda t: (
            jnp.sum(gather(t)[0][:, :4]) + jnp.sum(gather(t)[3][:, :4])
        ).astype(jnp.float32)),
        ("+bitonic merge", lambda t: jnp.sum(
            merged(t)[0][:, :4]).astype(jnp.float32)),
        ("+chunked AND", lambda t: jnp.sum(
            jnp.where(anded(t)[0] < INF32, 1, 0)).astype(jnp.float32)),
        ("+locate KERNEL", lambda t: (
            jnp.sum(loc_raw(t)[1][1]) + jnp.sum(loc_raw(t)[1][4])
        ).astype(jnp.float32)),
        ("+weave/top-k", lambda t: jnp.sum(
            located(t)[2]).astype(jnp.float32)),
        ("+hits sort", lambda t: hits_sorted(t)[0].astype(jnp.float32)),
        ("full (+docs)", lambda t: (
            jnp.sum(full(t).ranks)
            + jnp.sum(full(t).n_hits.astype(jnp.float32)))),
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
        print(f"{name:18s} {dt:7.2f} ms  (+{dt - prev:6.2f})",
              file=sys.stderr)
        prev = dt
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
