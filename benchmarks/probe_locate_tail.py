"""Bisect the resident-locate tail regression: kernel(raw) -> +weave
-> +top_k -> +take_along -> full, for resident (k=1, q=32) vs chunked
(k=2, q=8) grids at [5000, 2048]."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "50"))


def main() -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from docodo_tpu.ops import pallas_query as pq
    from docodo_tpu.ops.seqops import INF32

    print("devices:", jax.devices(), file=sys.stderr)
    B, n, P = 5000, 2048, 600
    nprng = np.random.default_rng(11)
    bounds = np.sort(nprng.choice(900_000, P, replace=False)).astype(np.int32)
    bounds[-1] = 900_000
    vals = np.sort(nprng.integers(0, 900_000, (B, n)), axis=1).astype(np.int32)
    keep = nprng.random((B, n)) < 0.05
    hv = np.where(keep, vals, np.int32(INF32))
    pgs = np.searchsorted(bounds, vals, side="right")
    pgs = np.minimum(pgs, P - 1).astype(np.int32)
    pg = np.where(keep, pgs, P - 1).astype(np.int32)
    hvj, pgj, bj = jnp.asarray(hv), jnp.asarray(pg), jnp.asarray(bounds)

    def stages_for(resident, chunk, k):
        def raw(h):
            return pq.pallas_chunked_locate(
                h, bj, topk=16, pg=pgj, resident=resident, raw=True)

        def weave(main, side, b):
            m = main.reshape(b, k, chunk)
            s = side[:, 0::128].reshape(b, k, 1)
            out = jnp.concatenate([s, m], axis=2).reshape(
                b, k * (chunk + 1))
            flush = side[:, (k - 1) * 128 + 1:(k - 1) * 128 + 2]
            return jnp.concatenate([out, flush], axis=1)

        def s_weave(h):
            page_s, rank_s, cnt_s, sp, sr, sc = raw(h)
            b = page_s.shape[0]
            return (weave(rank_s, sr, b),)

        def s_topk(h):
            page_s, rank_s, cnt_s, sp, sr, sc = raw(h)
            b = page_s.shape[0]
            ranks_all = weave(rank_s, sr, b)
            tr, ts = jax.lax.top_k(ranks_all, 16)
            return (tr,)

        def s_take(h):
            page_s, rank_s, cnt_s, sp, sr, sc = raw(h)
            b = page_s.shape[0]
            ranks_all = weave(rank_s, sr, b)
            pages_all = weave(page_s.astype(jnp.float32), sp.astype(
                jnp.float32), b)
            tr, ts = jax.lax.top_k(ranks_all, 16)
            tp = jnp.take_along_axis(pages_all, ts, axis=1)
            return (tr + tp,)

        def s_full(h):
            return pq.pallas_chunked_locate(
                h, bj, topk=16, pg=pgj, resident=resident)

        return [("raw", lambda h: (raw(h)[1],)), ("weave", s_weave),
                ("topk", s_topk), ("take", s_take), ("full", s_full)]

    def timed(label, fn):
        @jax.jit
        def loop(s0):
            def body(_, s):
                out = fn(hvj + (s * 0).astype(jnp.int32))
                return jnp.sum(out[0]).astype(jnp.float32) * 1e-6 + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(loop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(loop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert final == warm
        print(f"{label:22s} run {dt:7.2f} ms", file=sys.stderr)

    for resident, chunk, k in ((False, 1024, 2), (True, 2048, 1)):
        for name, fn in stages_for(resident, chunk, k):
            timed(f"res={resident} {name}", fn)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
