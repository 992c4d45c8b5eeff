"""Russian morphological search benchmark (BASELINE.md workload 3:
voyna-i-mir morphological + quoted-exact queries, ru.voc rebuilt from
an OpenCorpora dump — here the bundled reduced extract
Dict/ru/dict.opcorpora.xml; drop the full dump in its place for full
coverage).

Builds ru.voc offline, indexes the real War&Peace tome 1 with it, then
measures batched device QPS on a mixed morphological/exact query set and
verifies position parity against the host engine on a sample.

    python benchmarks/ru_morph.py [--n 10000] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/root/reference/Test/voyna-i-mir-tom-1.txt"
DUMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "Dict", "ru", "dict.opcorpora.xml")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--platform", default=os.environ.get("DOCODO_BENCH_PLATFORM"))
    ap.add_argument("--out", default=None,
                    help="also write the JSON line to this artifact file")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import docodo_tpu
    from docodo_tpu.lang.vocab import Vocab, build_opencorpora_voc
    from docodo_tpu.ops.device_index import DeviceIndex
    from docodo_tpu.query.batcher import compile_request
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    print("devices:", jax.devices(), file=sys.stderr)
    tmp = tempfile.mkdtemp(prefix="rumorph")
    voc_path = os.path.join(tmp, "ru.voc")
    t0 = time.perf_counter()
    build_opencorpora_voc(DUMP, voc_path)
    voc = Vocab(voc_path)
    print(f"ru.voc: {len(voc)} stems in {time.perf_counter()-t0:.2f}s",
          file=sys.stderr)

    raw = open(CORPUS, encoding="cp1251", errors="replace").read()
    ind = docodo_tpu.Index(path=tmp, in_memory=True, vocs=[voc])
    ind.add_data_source(
        ListDataSource("docs", [IndexPagedTextFile("vim", raw, "")])
    )
    t0 = time.perf_counter()
    ind.create()
    t_build = time.perf_counter() - t0
    mb = len(raw.encode("utf-8", "replace")) / 1e6
    print(f"build: {t_build:.2f}s ({mb/t_build:.1f} MB/s), "
          f"{ind.count} terms", file=sys.stderr)

    di = DeviceIndex.from_index(ind)

    # query mix over the voc's own lemma forms + exact phrases
    forms = sorted({w for w in voc.words})
    rng = random.Random(3)
    reqs = []
    for i in range(args.n):
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
    compiled = [compile_request(ind, r) for r in reqs]
    n_host = sum(1 for c in compiled if c is None)
    print(f"host fallback rate: {n_host}/{len(reqs)}", file=sys.stderr)
    groups = [c for c in compiled if c is not None]

    # warm + timed batched device evaluation
    t0 = time.perf_counter()
    out = di.search_batch_full(groups, topk=16, hit_cap=256,
                               cap_ladder=(128, 1024, 16384, 1 << 17))
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = di.search_batch_full(groups, topk=16, hit_cap=256,
                                   cap_ladder=(128, 1024, 16384, 1 << 17))
    t_query = (time.perf_counter() - t0) / reps
    qps = len(groups) / t_query
    print(f"warm {t_warm:.1f}s; {len(groups)} queries in "
          f"{t_query*1e3:.1f} ms -> {qps:.0f} QPS "
          f"(host-API: compile + dispatch + readback)", file=sys.stderr)

    # device-ENGINE leg: the same buckets chained through a checksum
    # scalar with ONE closing readback (the Pickwick full_result.py
    # protocol) — isolates kernel throughput from the host-API tail
    # (per-batch Python compile + the tunnel's ~300 ms readback floor)
    import jax.numpy as jnp
    import numpy as np

    from docodo_tpu.ops.device_index import (
        _bucket,
        multi_bucket_query_full_chained,
    )

    comp = [di.compile_group_query(q) for q in groups]
    buckets = {}
    for i, cg in enumerate(comp):
        if cg is None:
            continue
        rows, rvals, w, v, need, min_need = cg[:6]
        buckets.setdefault(
            (_bucket(need), w, _bucket(v, lo=1)), []
        ).append(i)
    terms_l, rs_l, caps_l = [], [], []
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
        terms_l.append(jnp.asarray(terms))
        rs_l.append(jnp.asarray(rsq))
        caps_l.append(cap)
    terms_l, rs_l, caps_l = tuple(terms_l), tuple(rs_l), tuple(caps_l)

    use_pallas = jax.default_backend() == "tpu"

    use_small = os.environ.get("RU_SMALL", "1") == "1"
    use_pages = os.environ.get("RU_PAGES", "1") == "1"

    def estep(chain):
        return multi_bucket_query_full_chained(
            di.term_offsets, di.coords, di.bounds, di.page_doc,
            di.header_mask(), terms_l, rs_l, chain, caps_l, 16, 256,
            use_pallas=use_pallas,
            small=di.small if use_small else None,
            page_of=di.page_of if use_pages else None,
        )

    eouts, es = estep(jnp.float32(0))
    ewarm = float(es)
    t0 = time.perf_counter()
    for _ in range(reps):
        eouts, es = estep(es)
    efinal = float(es)
    t_engine = (time.perf_counter() - t0) / reps
    assert abs(efinal - ewarm) < 1e-3 * max(abs(efinal), 1.0)
    engine_qps = len(groups) / t_engine
    print(f"device-engine chained: {len(groups)} queries in "
          f"{t_engine*1e3:.1f} ms -> {engine_qps:.0f} QPS",
          file=sys.stderr)

    # parity sample vs the host engine
    sample = rng.sample(range(len(reqs)), 20)
    mismatches = 0
    for i in sample:
        if compiled[i] is None:
            continue
        host = ind.search(reqs[i])
        # device row index within `groups`
        gi = sum(1 for j in range(i) if compiled[j] is not None)
        hits = out["hits"][gi]
        import numpy as np

        coords = hits[hits < np.iinfo(np.int32).max]
        if int(out["n_pages"][gi]) <= 16 and int(out["n_hits"][gi]) <= 256:
            from docodo_tpu.query.search import prepare_search_result

            dev = prepare_search_result(
                coords.astype(np.uint64), ind.pages, []
            )
            if dev.found_pages != host.found_pages:
                mismatches += 1
    print(f"parity sample mismatches: {mismatches}", file=sys.stderr)

    doc = json.dumps({
        "metric": "ru_morph_query_qps", "value": round(qps, 1),
        "unit": "qps", "build_mb_s": round(mb / t_build, 2),
        "host_fallback": n_host, "parity_mismatches": mismatches,
        "engine_qps": round(engine_qps, 1),
        # chained-checksum protocol: the closing readback that bounds
        # the engine timing; also the cross-run bit-parity pin
        "warm_checksum": round(ewarm, 2),
        "engine_ms_per_batch": round(t_engine * 1e3, 2),
        "queries": len(groups),
        "platform": jax.default_backend(),
    })
    if args.out:
        with open(args.out, "w") as f:
            f.write(doc + "\n")
    print(doc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
