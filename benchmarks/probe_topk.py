"""Probe: why is lax.top_k over the resident locate kernel's
(B, 2048) rank stream 4-5x slower than over the chunked weave's
(B, 2051)? Variants: raw widths, 3-col pad to 2051, row slice,
optimization_barrier, i32 bitcast keys."""

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
    pgs = np.minimum(np.searchsorted(bounds, vals, side="right"),
                     P - 1).astype(np.int32)
    pg = np.where(keep, pgs, P - 1).astype(np.int32)
    hvj, pgj, bj = jnp.asarray(hv), jnp.asarray(pg), jnp.asarray(bounds)

    def rank_of(h):
        return pq.pallas_chunked_locate(
            h, bj, topk=16, pg=pgj, resident=True, raw=True)[1]

    variants = {
        "raw only": lambda h: (jnp.sum(rank_of(h)),),
        "topk@2048": lambda h: (jax.lax.top_k(rank_of(h), 16)[0],),
        "topk@2051pad": lambda h: (jax.lax.top_k(jnp.concatenate(
            [rank_of(h),
             jnp.zeros((rank_of(h).shape[0], 3), jnp.float32)],
            axis=1), 16)[0],),
        "topk@2176pad": lambda h: (jax.lax.top_k(jnp.concatenate(
            [rank_of(h),
             jnp.zeros((rank_of(h).shape[0], 128), jnp.float32)],
            axis=1), 16)[0],),
        "topk@5000rows": lambda h: (
            jax.lax.top_k(rank_of(h)[:5000], 16)[0],),
        "topk@barrier": lambda h: (jax.lax.top_k(
            jax.lax.optimization_barrier(rank_of(h)), 16)[0],),
        "topk@i32bitcast": lambda h: (jax.lax.top_k(
            jax.lax.bitcast_convert_type(rank_of(h), jnp.int32), 16
        )[0].astype(jnp.float32),),
        "sort1op": lambda h: (jax.lax.sort(-rank_of(h))[:, :16],),
    }
    for label, fn in variants.items():
        @jax.jit
        def loop(s0, fn=fn):
            def body(_, s):
                out = fn(hvj + (s * 0).astype(jnp.int32))
                return jnp.sum(out[0]).astype(jnp.float32) * 1e-6 + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(loop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(loop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert final == warm
        print(f"{label:18s} run {dt:7.2f} ms", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
