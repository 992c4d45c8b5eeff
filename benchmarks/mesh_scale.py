"""Mesh serving at Pickwick scale (MESH_SCALE artifact): run a
serving-shape query mix through ShardedDeviceIndex on an 8-virtual-
device CPU mesh and record what the tiny dryruns cannot show — the
real bucket composition, the boundary_reserve rate, the truncation
(host re-serve) rate, and FULL parity against the single-chip host
engine (docs, pages, in-page positions, ranks) for every unique
request.

Reference semantics being validated at scale: global-coordinate-space
windows over contiguous doc shards (ref IndexSequence.cs:218-284) and
the full result contract (ref Search.cs:365-420).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/mesh_scale.py [--n 10000] [--out MESH_SCALE_r05.json]

(The script force-sets CPU + 8 virtual devices itself when run without
flags; it never touches the TPU tunnel.)
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip(),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get(
    "DOCODO_BENCH_CORPUS",
    "/root/reference/Test/Dickens Charles. The Pickwick Papers - royallib.ru.txt",
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _doc_view(res):
    return [
        (d.name, [(p.id, list(p.pos)) for p in d.pages],
         round(d.rank, 4))
        for d in res.found_docs
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--chars", type=int, default=0,
                    help="corpus slice (0 = whole book)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--chunk", type=int, default=256,
                    help="search_batch chunk size (collector-batch analog)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, jax.devices()

    import shutil
    import tempfile

    import docodo_tpu
    from docodo_tpu.parallel import sharding as sh
    from docodo_tpu.parallel.serving import ShardedDeviceIndex
    from docodo_tpu.query.batcher import compile_request
    from docodo_tpu.sources.files import IndexTextFilesDataSource

    raw = open(CORPUS, encoding="cp1251", errors="replace").read()
    if args.chars:
        raw = raw[: args.chars]
    # index through the real file source: 3000-char pages + text cache,
    # split into multiple .txt docs so the mesh has documents to shard
    # (contiguous doc ranges per shard; docs never span shards)
    corpus_dir = tempfile.mkdtemp()
    n_docs = 64
    step = len(raw) // n_docs
    for i in range(n_docs):
        with open(os.path.join(corpus_dir, f"part{i:02d}.txt"), "w",
                  encoding="utf-8") as f:
            f.write(raw[i * step: (i + 1) * step])
    ind = docodo_tpu.Index(path=tempfile.mkdtemp(), in_memory=True)
    ind.max_degree_of_parallelism = 1  # deterministic doc order
    ind.add_data_source(
        IndexTextFilesDataSource("docs", corpus_dir + "/", "*.txt"))
    t0 = time.perf_counter()
    ind.create()
    log(f"index: {ind.count} terms in {time.perf_counter()-t0:.1f}s, "
        f"{n_docs} docs")

    mesh = sh.make_mesh(8)
    sdi = ShardedDeviceIndex.from_index(ind, mesh)
    log(f"mesh: {mesh.shape}, boundaries: {sdi.boundaries.size}")

    # serving-shape mix (serve_qps.py's): real histogram words,
    # single / quoted-phrase / proximity-pair kinds
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

    # compile once per unique request (the serving plan cache's job)
    unique = sorted(set(reqs))
    log(f"{len(reqs)} queries, {len(unique)} unique")
    plans = {}
    for r in unique:
        plans[r] = compile_request(ind, r)
    n_unsup = sum(1 for v in plans.values() if v is None)

    # run the mix through the mesh in collector-sized chunks
    stats = {"reserved": 0, "truncated": 0, "served": 0}
    buckets_seen: dict = {}
    t0 = time.perf_counter()
    mesh_results = {}
    for r in unique:
        if plans[r] is None:
            continue
        q = plans[r]
        key = None
        # mirror _bucketize's (cap, w, v) for the composition record
        cg = sdi._bucketize([q])[1]
        for k in cg:
            key = k
        buckets_seen[str(key)] = buckets_seen.get(str(key), 0) + 1
    served = [r for r in unique if plans[r] is not None]
    for i in range(0, len(served), args.chunk):
        chunk = served[i: i + args.chunk]
        outs = sdi.search_batch([plans[r] for r in chunk])
        for r, res in zip(chunk, outs):
            if res is None:
                stats["truncated"] += 1
                mesh_results[r] = None
            else:
                if getattr(res, "boundary_reserved", False):
                    stats["reserved"] += 1
                stats["served"] += 1
                mesh_results[r] = res
        log(f"  {min(i+args.chunk, len(served))}/{len(served)} unique "
            f"served ({stats})")
    t_mesh = time.perf_counter() - t0

    # full parity vs the single-chip host engine on every unique request
    mismatches = []
    t0 = time.perf_counter()
    for r in served:
        want = ind.search(r)
        got = mesh_results[r]
        if got is None:  # truncated -> serving re-serves on host: parity
            continue     # by construction (same engine)
        if _doc_view(got) != _doc_view(want):
            mismatches.append(r)
    t_host = time.perf_counter() - t0
    log(f"parity: {len(mismatches)} mismatches "
        f"({t_host:.1f}s host pass)")

    n_served_total = sum(1 for r in reqs if plans[r] is not None)
    reserve_rate = stats["reserved"] / max(len(served), 1)
    result = {
        "artifact": "mesh serving at corpus scale (8 virtual devices)",
        "corpus_chars": len(raw),
        "n_docs": n_docs,
        "mesh": "1x8 cpu (XLA kernels; Pallas interpret-mode shapes "
                "covered by test_fuzz_mesh_pallas_kernels)",
        "queries": args.n,
        "unique_requests": len(unique),
        "unsupported": n_unsup,
        "bucket_composition": dict(sorted(buckets_seen.items())),
        "n_buckets": len(buckets_seen),
        "boundary_reserves_unique": stats["reserved"],
        "boundary_reserve_rate": round(reserve_rate, 4),
        "truncated_unique": stats["truncated"],
        "parity_mismatches": len(mismatches),
        "mismatched_requests": mismatches[:20],
        "mesh_wall_s": round(t_mesh, 1),
        "host_parity_pass_s": round(t_host, 1),
        "note": "wall times are 1-core CPU interpret-scale, not perf "
                "claims; the artifact's point is composition, reserve "
                "rate and exact parity at serving scale",
    }
    doc = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(doc + "\n")
        log(f"wrote {args.out}")
    print(doc)
    return 0 if not mismatches else 1


if __name__ == "__main__":
    raise SystemExit(main())
