"""Per-bucket timing of the ru morphological mix (the ru_morph bench's
engine leg, one chained jitted program per bucket)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "25"))


def main() -> int:
    import random
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    import docodo_tpu
    from docodo_tpu.lang.vocab import Vocab, build_opencorpora_voc
    from docodo_tpu.ops.device_index import (
        DeviceIndex, _bucket, multi_bucket_query_full_chained,
    )
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    print("devices:", jax.devices(), file=sys.stderr)
    tmp = tempfile.mkdtemp(prefix="ruprof")
    build_opencorpora_voc(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "Dict", "ru",
            "dict.opcorpora.xml"),
        tmp + "/ru.voc")
    voc = Vocab(tmp + "/ru.voc")
    raw = open("/root/reference/Test/voyna-i-mir-tom-1.txt",
               encoding="cp1251", errors="replace").read()
    ind = docodo_tpu.Index(path=tmp, in_memory=True, vocs=[voc])
    ind.add_data_source(
        ListDataSource("docs", [IndexPagedTextFile("vim", raw, "")]))
    ind.create()
    di = DeviceIndex.from_index(ind)

    rng = random.Random(3)
    reqs = []
    for i in range(10_000):
        kind = i % 4
        if kind == 0:
            reqs.append(rng.choice(["войну", "князья", "сказала",
                                    "офицеры", "лошадей", "говорили"]))
        elif kind == 1:
            reqs.append('"князь андрей"')
        elif kind == 2:
            reqs.append("наполеон | кутузов")
        else:
            reqs.append("сказала княжна")
    from docodo_tpu.query.batcher import compile_request

    compiled = [compile_request(ind, r) for r in reqs]
    groups = [c for c in compiled if c is not None]
    comp = [di.compile_group_query(q) for q in groups]
    buckets = {}
    for i, cg in enumerate(comp):
        if cg is None:
            continue
        rows, rvals, w, v, need, min_need = cg[:6]
        buckets.setdefault(
            (_bucket(need), w, _bucket(v, lo=1)), []
        ).append(i)

    use_pallas = jax.default_backend() == "tpu"
    rows_out = []
    for (cap, w, vb), idxs in sorted(buckets.items()):
        if vb == 1:
            terms = np.full((len(idxs), w), -1, dtype=np.int32)
        else:
            terms = np.full((len(idxs), w, vb), -1, dtype=np.int32)
        rsq = np.ones((len(idxs), w), dtype=np.int32)
        for row, i in enumerate(idxs):
            rows_i, rvals_i = comp[i][0], comp[i][1]
            for j, (ids, r) in enumerate(zip(rows_i, rvals_i)):
                if vb == 1:
                    terms[row, j] = ids[0]
                else:
                    terms[row, j, : len(ids)] = ids
                rsq[row, j] = r
        tq, rq = jnp.asarray(terms), jnp.asarray(rsq)

        @jax.jit
        def floop(s0, tq=tq, rq=rq, cap=cap):
            def body(_, s):
                outs, s2 = multi_bucket_query_full_chained(
                    di.term_offsets, di.coords, di.bounds, di.page_doc,
                    di.header_mask(), (tq,), (rq,), s * 0, (cap,), 16,
                    256, use_pallas=use_pallas, small=di.small,
                    page_of=di.page_of,
                )
                return s2 + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(floop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(floop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert abs(final - warm) < 1e-3 * max(abs(final), 1.0)
        rows_out.append((cap, w, vb, len(idxs), dt))
        print(f"cap={cap:6d} W={w} V={vb} B={len(idxs):5d}  {dt:8.2f} ms",
              file=sys.stderr)
    total = sum(r[4] for r in rows_out)
    print(f"sum: {total:.1f} ms", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
