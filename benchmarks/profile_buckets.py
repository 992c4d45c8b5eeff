"""Per-bucket timing of the FULL-RESULT 10k-mix benchmark.

bench.py times the whole fused multi-bucket program; this script times
each (cap, W, hit-tier) bucket as its own chained jitted program, so
the next optimization target is visible (which bucket owns the 22 ms).

Method matches bench.py: reps chained through the checksum scalar, ONE
final readback (block_until_ready is unreliable over the axon tunnel).
Per-bucket wall times measured this way sum to ~the fused-program time
(each bucket is a separate dispatch, so there is a little per-dispatch
overhead the fused program does not pay — noted in the output).

Usage: python benchmarks/profile_buckets.py [--ru]
"""

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
REPS = int(os.environ.get("DOCODO_BENCH_REPS", "10"))
FULL_TOPK = 64
HIT_CAP = 1024


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from docodo_tpu.ops import device_index as di
    from benchmarks import common as bc

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    log("devices:", jax.devices())

    with open(CORPUS, encoding="cp1251", errors="replace") as f:
        text = f.read()

    from docodo_tpu.native import pipeline as npipe

    interner = npipe.make_interner()
    tids, coords = npipe.tokenize_intern(text, interner)
    terms_list = interner.terms()
    term_to_id = {w: i for i, w in enumerate(terms_list)}
    T = len(term_to_id)

    build = jax.jit(di.build_postings, static_argnames=("num_terms",))
    st, sc, off = build(jnp.asarray(tids), jnp.asarray(coords), num_terms=T)
    assert int(off[-1]) == tids.size

    counts = np.bincount(tids, minlength=T)
    id_to_term = {v: k for k, v in term_to_id.items()}
    terms, rs = bc.standard_mix(counts, id_to_term, N_QUERIES)

    page_len = 3000
    n_pages = (len(text) + page_len - 1) // page_len
    bounds = jnp.asarray(np.minimum(
        np.arange(1, n_pages + 1) * page_len, len(text)).astype(np.int32))
    page_doc = jnp.zeros(n_pages, dtype=jnp.int32)
    is_header = jnp.zeros(n_pages, dtype=bool)

    fterms, frs, fcaps, fhcaps = bc.full_buckets(terms, rs, counts, HIT_CAP)

    off_np = np.asarray(off)
    sc_host = np.asarray(sc)
    pages_np = di.build_page_of(np.asarray(bounds), sc_host)
    page_of = jnp.asarray(pages_np)
    small = di.build_small_tables(off_np, sc_host, pages_np=pages_np)
    log(f"small tables: {[tuple(t.shape) for _, _, t in (small or ())]}")

    env_pallas = os.environ.get("DOCODO_PALLAS")
    use_pallas = (env_pallas == "1") if env_pallas is not None else (
        jax.default_backend() == "tpu")
    log(f"pallas: {use_pallas}")

    # The rep loop runs INSIDE one jitted program (fori_loop chained
    # through the checksum scalar): a per-program dispatch over the axon
    # tunnel costs ~3 ms of host time, which swamps small buckets when
    # each rep is its own dispatch.
    rows = []
    for tq, rq, cap, hb in zip(fterms, frs, fcaps, fhcaps):
        w = tq.shape[1]
        bsz = tq.shape[0]

        @jax.jit
        def floop(s0, tq=tq, rq=rq, cap=cap, hb=hb):
            def body(_, s):
                outs, s2 = di.multi_bucket_query_full_chained(
                    off, sc, bounds, page_doc, is_header, (tq,), (rq,),
                    s * 0, (cap,), FULL_TOPK, (hb,),
                    use_pallas=use_pallas, small=small, page_of=page_of,
                )
                return s2 + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(floop(jnp.float32(0)))  # compile + warm
        t0 = time.perf_counter()
        final = float(floop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS
        assert abs(final - warm) < 1e-3 * max(abs(final), 1.0)
        rows.append((cap, w, hb, bsz, dt * 1e3))
        log(f"cap={cap:6d} W={w} hit={hb:5d} B={bsz:5d}  {dt*1e3:8.2f} ms"
            f"  ({dt/bsz*1e6:6.2f} us/q)")

    total = sum(r[4] for r in rows)
    log(f"\nsum of per-bucket times: {total:.1f} ms "
        f"({N_QUERIES/ (total/1e3):.0f} QPS-equiv; fused program avoids "
        f"{len(rows)-1} dispatch gaps)")
    log("\ntop buckets by cost:")
    for cap, w, hb, bsz, ms in sorted(rows, key=lambda r: -r[4])[:8]:
        log(f"  cap={cap:6d} W={w} hit={hb:5d} B={bsz:5d}  {ms:8.2f} ms"
            f"  ({ms/total*100:4.1f}%)")


if __name__ == "__main__":
    main()
