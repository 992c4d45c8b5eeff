"""Stage timing of the ru mix's dominant bucket (cap-1024 W2 B=5000
phrase queries through the chunked pipeline): gather -> 3-op merge
sort -> chunked AND (fwd+bwd) -> chunked locate -> topk/hits sorts."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "50"))


def main() -> int:
    import random
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
    tmp = tempfile.mkdtemp(prefix="ruw2")
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
    c0 = c1 = cap
    bounds, page_doc = dix.bounds, dix.page_doc
    hdr = dix.header_mask()
    small, page_of = dix.small, dix.page_of

    def gather(tqz):
        g0 = jax.vmap(lambda t: di.gather_term_paged(
            dix.coords, page_of, dix.term_offsets, t, c0, small))
        a, apg, na = g0(tqz[:, 0])
        b, bpg, nb = g0(tqz[:, 1])
        return a, apg, na, b, bpg, nb

    def merged(tqz):
        a, apg, na, b, bpg, nb = gather(tqz)
        bsz = tqz.shape[0]
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (bsz, c0), 1)
        av = jnp.where(lane0 < na[:, None], a, INF32)
        bv = jnp.where(lane0 < nb[:, None], b, INF32)
        tag = jnp.concatenate([
            jnp.where(lane0 < na[:, None], 0, 2),
            jnp.where(lane0 < nb[:, None], 1, 2),
        ], axis=1).astype(jnp.int32)
        vals, tag, pg = jax.vmap(
            lambda v, t, p: jax.lax.sort((v, t, p), num_keys=2)
        )(jnp.concatenate([av, bv], axis=1), tag,
          jnp.concatenate([apg, bpg], axis=1))
        return vals, tag, pg

    def anded(tqz):
        vals, tag, pg = merged(tqz)
        hv = pq.pallas_chunked_and(vals, tag, rq[:, :1], rq[:, 1:2])
        return hv, pg

    def located(tqz):
        hv, pg = anded(tqz)
        pages, ranks, counts, n_pages = pq.pallas_chunked_locate(
            hv, bounds, topk=16, pg=pg)
        return hv, pages, ranks, n_pages

    def hits_sorted(tqz):
        hv, pages, ranks, n_pages = located(tqz)
        hits = jax.lax.sort(hv)[:, :256]
        return hits, ranks, n_pages

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
        ("+3op merge sort", lambda t: jnp.sum(
            merged(t)[0][:, :4]).astype(jnp.float32)),
        ("+chunked AND", lambda t: jnp.sum(
            jnp.where(anded(t)[0] < INF32, 1, 0)).astype(jnp.float32)),
        ("+chunked locate", lambda t: jnp.sum(
            located(t)[2]).astype(jnp.float32)),
        ("+hits sort", lambda t: jnp.sum(
            hits_sorted(t)[1]).astype(jnp.float32)),
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
