"""REST serving benchmark (BASELINE.md config: "REST server workload:
10k concurrent mixed word/phrase/proximity queries, batched on-TPU
evaluation").

Builds the Pickwick index, starts DocodoServer with device batching,
fires N concurrent HTTP requests over a thread pool and reports QPS and
latency percentiles; a host-path (unbatched) pass runs for comparison.

    python benchmarks/serve_qps.py [--n 10000] [--conc 64] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get(
    "DOCODO_BENCH_CORPUS",
    "/root/reference/Test/Dickens Charles. The Pickwick Papers - royallib.ru.txt",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--conc", type=int, default=64)
    ap.add_argument("--platform", default=os.environ.get("DOCODO_BENCH_PLATFORM"))
    ap.add_argument("--host-pass", action="store_true",
                    help="also measure the unbatched host path")
    ap.add_argument("--pipeline", action="store_true",
                    help="overlap batch dispatch with readback (for "
                         "locally-attached devices; tunnels stall)")
    ap.add_argument("--brief", action="store_true",
                    help="serve rank/position results without snippet "
                         "text IO (isolates engine+HTTP from host "
                         "materialization)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import shutil
    import tempfile

    import docodo_tpu
    from docodo_tpu.server import DocodoServer
    from docodo_tpu.sources.files import IndexTextFilesDataSource

    # index through the REAL file source (3000-char pages + text cache,
    # ref DataSources.cs:308): a single whole-book page would make every
    # snippet decompress and span-scan megabytes
    corpus_dir = tempfile.mkdtemp()
    shutil.copy(CORPUS, os.path.join(corpus_dir, "pickwick.txt"))
    ind = docodo_tpu.Index(path=tempfile.mkdtemp(), in_memory=True)
    ind.add_data_source(
        IndexTextFilesDataSource("docs", corpus_dir + "/", "*.txt")
    )
    t0 = time.perf_counter()
    ind.create()
    print(f"index: {ind.count} terms in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # query mix from real corpus words: skip the hyper-frequent head so
    # padding stays sane (stop-word-class terms are dropped by the
    # request pipeline anyway, ref Search.cs:344-346)
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

    def run_pass(device_batching: bool):
        srv = DocodoServer(ind, port=0, device_batching=device_batching,
                           materialize=not args.brief,
                           pipeline=args.pipeline or None)
        srv.start(background=True)
        lat = []

        def one(req):
            t0 = time.perf_counter()
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/search?req="
                + urllib.parse.quote(req), timeout=600,
            ) as r:
                json.loads(r.read())
            lat.append(time.perf_counter() - t0)

        import concurrent.futures as cf

        # warm pass: every (cap, words, rows) shape compiles once here
        with cf.ThreadPoolExecutor(args.conc) as ex:
            list(ex.map(one, reqs[: min(len(reqs), 2 * args.conc * 8)]))
        lat.clear()
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(args.conc) as ex:
            list(ex.map(one, reqs))
        dt = time.perf_counter() - t0
        srv.stop()
        lat.sort()
        p50 = lat[len(lat) // 2] * 1e3
        p95 = lat[int(len(lat) * 0.95)] * 1e3
        stats = srv.batcher.stats if srv.batcher else {}
        return len(reqs) / dt, p50, p95, stats

    qps, p50, p95, stats = run_pass(device_batching=True)
    print(f"batched: {qps:.0f} QPS, p50 {p50:.1f} ms, p95 {p95:.1f} ms, "
          f"{stats}", file=sys.stderr)
    if args.host_pass:
        hqps, hp50, hp95, _ = run_pass(device_batching=False)
        print(f"host:    {hqps:.0f} QPS, p50 {hp50:.1f} ms, p95 {hp95:.1f} ms",
              file=sys.stderr)
    print(json.dumps({
        "metric": "serve_qps", "value": round(qps, 1), "unit": "qps",
        "p50_ms": round(p50, 2), "p95_ms": round(p95, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
