"""Host-API serving decomposition (SERVE_PROFILE artifact): where do
the ~60 us/query go between a 1.0M-QPS engine and the ~16-18k-QPS
host-API path (RU_BENCH_r04)? Replays search_batch_full's phases
inline on the serving-shape Pickwick mix and times each:

  parse      compile_request per unique request (plan-cache miss cost)
  plan_hit   the same through a dict hit (the serving steady state)
  compile    DeviceIndex.compile_group_query per query
  bucketize  bucket assembly (numpy fills) + H2D of the bucket arrays
  dispatch   the async multi_bucket_query_full call (program launch)
  readback   jax.device_get of the result pytree (tunnel-bound leg)
  scatter    result scatter into the output arrays
  prepare    prepare_search_result per row (host materialization)
  finalize   finalize_doc_ranks + doc sort (brief-mode tail)
  json       the server's JSON emit of the prepared results

The phases bracket the whole batcher hot path (query/batcher.py
_execute + _deliver, ref server.cs:85-97 / Search.cs:437-617).

    python benchmarks/profile_serve.py [--n 10000] [--platform cpu]
        [--out SERVE_PROFILE_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CORPUS = os.environ.get(
    "DOCODO_BENCH_CORPUS",
    "/root/reference/Test/Dickens Charles. The Pickwick Papers - royallib.ru.txt",
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform",
                    default=os.environ.get("DOCODO_BENCH_PLATFORM"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    log("devices:", jax.devices())

    import shutil
    import tempfile

    import docodo_tpu
    from docodo_tpu.ops.device_index import (
        DeviceIndex,
        _bucket,
        _bucket_sort_key,
        multi_bucket_query_full,
    )
    from docodo_tpu.query.batcher import compile_request
    from docodo_tpu.query.search import (
        finalize_doc_ranks,
        prepare_search_result,
    )
    from docodo_tpu.sources.files import IndexTextFilesDataSource

    corpus_dir = tempfile.mkdtemp()
    shutil.copy(CORPUS, os.path.join(corpus_dir, "pickwick.txt"))
    ind = docodo_tpu.Index(path=tempfile.mkdtemp(), in_memory=True)
    ind.add_data_source(
        IndexTextFilesDataSource("docs", corpus_dir + "/", "*.txt"))
    ind.create()
    di = DeviceIndex.from_index(ind)
    log(f"index: {ind.count} terms")

    hist = docodo_tpu.Index.calc_histogram(ind, 1000)
    words = [w for w in hist if w[0].isalpha() and len(w) >= 4][50:400]
    rng = random.Random(7)
    reqs = []
    for i in range(args.n):
        kind = i % 3
        if kind == 0:
            reqs.append(rng.choice(words))
        elif kind == 1:
            reqs.append(f'"{rng.choice(words)} {rng.choice(words)}"')
        else:
            reqs.append(f"{rng.choice(words)} {rng.choice(words)}")

    TOPK, HIT_CAP = 16, 256
    LADDER = (128, 1024, 16384, 1 << 17)
    phases: dict = {}

    def timed(name, fn, reps=1):
        best = None
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        phases[name] = best
        log(f"  {name:10s} {best*1e3:9.2f} ms "
            f"({best/args.n*1e6:7.2f} us/q)")
        return out

    # ---- parse (plan-cache miss) and plan-cache hit ----
    unique = sorted(set(reqs))
    log(f"{len(reqs)} queries, {len(unique)} unique")

    def parse_all():
        return {r: compile_request(ind, r) for r in unique}

    plans = timed("parse", parse_all)
    phases["parse"] *= len(unique) / args.n  # amortized per query

    def plan_hits():
        return [plans[r] for r in reqs]

    queries = timed("plan_hit", plan_hits)
    queries = [q for q in queries if q is not None]

    # ---- compile_group_query ----
    def compile_all():
        return [di.compile_group_query(q) for q in queries]

    compiled = timed("compile", compile_all, reps=args.reps)

    # ---- bucketize (the search_batch_full assembly, fused layout) ----
    def bucketize():
        hit_tiers = sorted({min(HIT_CAP, t) for t in (128, 512, HIT_CAP)})

        def hit_tier(mn):
            want = 4 * mn + 16
            for t in hit_tiers:
                if want <= t:
                    return t
            return HIT_CAP

        def round_cap(need):
            for c in LADDER:
                if need <= c:
                    return c
            return _bucket(need)

        buckets = {}
        for i, cg in enumerate(compiled):
            if cg is None:
                continue
            rows, rvals, w, v, need, min_need, needs = cg
            buckets.setdefault(
                (round_cap(need), w, _bucket(v, lo=1),
                 hit_tier(min_need)), []).append(i)
        packs = []
        for (qcap, w, vb, hb), idxs in sorted(
                buckets.items(), key=_bucket_sort_key):
            brows = _bucket(len(idxs), lo=8)
            if vb == 1:
                terms = np.full((brows, w), -1, dtype=np.int32)
            else:
                terms = np.full((brows, w, vb), -1, dtype=np.int32)
            rs = np.ones((brows, w), dtype=np.int32)
            for row, i in enumerate(idxs):
                rows_i, rvals_i = compiled[i][0], compiled[i][1]
                for j, (ids, r) in enumerate(zip(rows_i, rvals_i)):
                    if vb == 1:
                        terms[row, j] = ids[0]
                    else:
                        terms[row, j, : len(ids)] = ids
                    rs[row, j] = r
            packs.append((jnp.asarray(terms), jnp.asarray(rs), qcap, hb,
                          idxs))
        return packs

    packs = timed("bucketize", bucketize, reps=args.reps)
    terms_t = tuple(p[0] for p in packs)
    rs_t = tuple(p[1] for p in packs)
    caps_t = tuple(p[2] for p in packs)
    hcaps_t = tuple(p[3] for p in packs)
    log(f"  buckets: {len(packs)}")

    use_pallas = jax.default_backend() == "tpu"

    def dispatch():
        return multi_bucket_query_full(
            di.term_offsets, di.coords, di.bounds, di.page_doc,
            di.header_mask(), terms_t, rs_t, caps_t, TOPK, hcaps_t,
            with_docs=True, use_pallas=use_pallas, small=di.small,
            page_of=di.page_of,
        )

    outs = dispatch()  # compile + warm (not timed)
    jax.device_get(outs[0].n_pages)
    outs = timed("dispatch", dispatch, reps=args.reps)
    outs_h = timed("readback", lambda: jax.device_get(outs),
                   reps=args.reps)

    # ---- scatter into the flat output dict ----
    def scatter():
        b = len(queries)
        out = {
            "pages": np.full((b, TOPK), -1, dtype=np.int32),
            "ranks": np.zeros((b, TOPK), dtype=np.float32),
            "n_pages": np.zeros(b, dtype=np.int32),
            "n_hits": np.zeros(b, dtype=np.int32),
            "hits": np.full((b, HIT_CAP), 2**31 - 1, dtype=np.int32),
        }
        for (_, _, _, hb, idxs), o in zip(packs, outs_h):
            n = len(idxs)
            out["pages"][idxs] = o.pages[:n]
            out["ranks"][idxs] = o.ranks[:n]
            out["n_pages"][idxs] = o.n_pages[:n]
            out["n_hits"][idxs] = o.n_hits[:n]
            out["hits"][np.ix_(idxs, range(min(hb, HIT_CAP)))] = \
                o.hits[:n, :HIT_CAP]
        return out

    out = timed("scatter", scatter, reps=args.reps)

    # ---- host materialization (prepare + finalize) ----
    served = [
        i for i in range(len(queries))
        if out["n_pages"][i] <= TOPK and out["n_hits"][i] <= HIT_CAP
    ]
    log(f"  served rows: {len(served)}/{len(queries)}")
    INT32_MAX = 2**31 - 1

    def prepare():
        res = []
        for i in served:
            hv = out["hits"][i]
            hv = hv[hv < INT32_MAX].astype(np.uint64)
            res.append(prepare_search_result(hv, ind.pages, []))
        return res

    results = timed("prepare", prepare, reps=args.reps)
    phases["prepare"] *= len(queries) / max(len(served), 1)

    def finalize():
        for r in results:
            for d in r.found_docs:
                d.rank = sum(p.rank for p in d.pages)
            finalize_doc_ranks(r)

    timed("finalize", finalize, reps=1)
    phases["finalize"] *= len(queries) / max(len(served), 1)

    # ---- server JSON emit (the reference's {found, result} shape) ----
    def emit():
        docs = []
        for r in results:
            docs.append(json.dumps({
                "found": len(r.found_docs),
                "result": [
                    {"name": d.name, "rank": d.rank,
                     "pages": [{"id": p.id, "pos": p.pos}
                               for p in d.pages]}
                    for d in r.found_docs
                ],
            }))
        return docs

    timed("json", emit, reps=args.reps)
    phases["json"] *= len(queries) / max(len(served), 1)

    total = sum(phases.values())
    host_side = total - phases["dispatch"] - phases["readback"]
    result = {
        "platform": jax.default_backend(),
        "queries": args.n,
        "unique_requests": len(unique),
        "buckets": len(packs),
        "served_rows": len(served),
        "phases_ms": {k: round(v * 1e3, 2) for k, v in phases.items()},
        "phases_us_per_query": {
            k: round(v / args.n * 1e6, 2) for k, v in phases.items()
        },
        "total_ms": round(total * 1e3, 2),
        "total_qps": round(args.n / total, 1),
        "host_side_ms": round(host_side * 1e3, 2),
        "host_side_qps_bound": round(args.n / host_side, 1),
        "note": "parse amortized by unique/total (plan cache steady "
                "state); prepare/finalize/json scaled from served rows "
                "to all rows; dispatch+readback are the device/tunnel "
                "legs",
    }
    doc = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(doc + "\n")
        log(f"wrote {args.out}")
    print(doc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
