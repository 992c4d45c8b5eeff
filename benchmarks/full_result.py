"""FULL-RESULT query throughput on the standard 10k Pickwick mix.

The headline bench (bench.py) measures the page-level path (top-k
pages/ranks/counts only). This one measures the path SERVING actually
uses — query_step_full: the same mix evaluated to exact positions
(hit-coordinate streams of the top-k pages) plus device doc ranks
(ref Search.cs:365-420, 552-557), topk=64, tiered hit buffers.

Usage: python benchmarks/full_result.py  (run from /root/repo; TPU by
default, DOCODO_BENCH_PLATFORM=cpu to validate on CPU).

Prints ONE JSON line:
  {"metric": "full_query_qps", "value": N, "unit": "qps",
   "vs_baseline": N}
vs_baseline: same sequential-host-engine proxy protocol as bench.py,
but the host loop ALSO materializes positions/ranks per page, i.e. the
comparison is full path vs full path (see BASELINE.md).
"""

import json
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
TOPK = 64
HIT_CAP = 1024
REPS = int(os.environ.get("DOCODO_BENCH_REPS", "5"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_corpus() -> str:
    if os.path.exists(CORPUS):
        with open(CORPUS, encoding="cp1251", errors="replace") as f:
            return f.read()
    rng = np.random.default_rng(0)
    words = [f"word{i:04d}" for i in range(4000)]
    return " ".join(rng.choice(words, size=300_000))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from docodo_tpu.core.postings import group_and
    from docodo_tpu.ops import device_index as di

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    log("devices:", jax.devices())
    text = load_corpus()

    from docodo_tpu.native import pipeline as npipe

    interner = npipe.make_interner()
    tids, coords = npipe.tokenize_intern(text, interner)
    terms_list_str = interner.terms()
    T = len(terms_list_str)
    id_to_term = dict(enumerate(terms_list_str))

    build = jax.jit(di.build_postings, static_argnames=("num_terms",))
    st, sc, off = build(jnp.asarray(tids), jnp.asarray(coords), num_terms=T)
    assert int(off[-1]) == tids.size

    counts = np.bincount(tids, minlength=T)
    order = np.lexsort((coords, tids))
    sc_host = coords[order]
    off_np = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(counts, out=off_np[1:])

    # ---- same mixed query set as bench.py (shared module, seed 42) ------
    from benchmarks import common as bc

    terms, rs = bc.standard_mix(counts, id_to_term, N_QUERIES)

    page_len = 3000
    n_pages = (len(text) + page_len - 1) // page_len
    bounds_host = np.minimum(
        np.arange(1, n_pages + 1) * page_len, len(text)
    ).astype(np.int32)
    _bounds = jnp.asarray(bounds_host)
    _page_doc = jnp.zeros(n_pages, dtype=jnp.int32)
    _is_header = jnp.zeros(n_pages, dtype=bool)

    # ---- bucket by (cap, W, hit tier) — serving's fused layout ----------
    terms_t, rs_t, caps_t, hcaps_t = bc.full_buckets(terms, rs, counts,
                                                     HIT_CAP)
    log(f"buckets: {[(c, h, t.shape) for c, h, t in zip(caps_t, hcaps_t, terms_t)]}")

    env_pallas = os.environ.get("DOCODO_PALLAS")
    if env_pallas is not None:
        use_pallas = env_pallas == "1"
    else:
        use_pallas = jax.default_backend() == "tpu"
    log(f"pallas kernels: {use_pallas}")

    def step(chain):
        return di.multi_bucket_query_full_chained(
            off, sc, _bounds, _page_doc, _is_header, terms_t, rs_t, chain,
            caps_t, TOPK, hcaps_t, use_pallas=use_pallas,
        )

    t0 = time.perf_counter()
    outs, s = step(jnp.float32(0))
    warm = float(s)
    log(f"compile+warm {time.perf_counter() - t0:.1f}s, checksum {warm:.1f}")
    t0 = time.perf_counter()
    for _ in range(REPS):
        outs, s = step(s)
    final = float(s)
    t_query = (time.perf_counter() - t0) / REPS
    assert abs(final - warm) < 1e-3 * max(abs(final), 1.0)
    qps = N_QUERIES / t_query
    log(f"device full-result: {N_QUERIES} queries in {t_query*1e3:.1f} ms "
        f"-> {qps:.0f} QPS ({t_query / N_QUERIES * 1e6:.1f} us/query)")

    # one real readback (the serving shape): time device_get of the pytree
    t0 = time.perf_counter()
    outs_h = jax.device_get(outs)
    t_rb = time.perf_counter() - t0
    nbytes = sum(
        a.nbytes for o in outs_h for a in (o if isinstance(o, tuple) else [o])
        if hasattr(a, "nbytes")
    )
    log(f"readback: {nbytes/1e6:.1f} MB in {t_rb*1e3:.0f} ms")

    # ---- host sequential full-result baseline (shared module) ----------
    host_qps = bc.host_full_baseline(
        terms, rs, sc_host, off_np, bounds_host, TOPK,
        n_base=min(256, N_QUERIES),
    )
    log(f"host sequential full-result baseline (best of 3): {host_qps:.0f} QPS")

    print(json.dumps({
        "metric": "full_query_qps",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / host_qps, 2),
    }))


if __name__ == "__main__":
    main()
