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


if __name__ == "__main__" and os.environ.get("PROBE_TOPK_R4") != "1":
    raise SystemExit(main())


def main2() -> int:
    """r4 leg: the cost of top_k INDICES at [5000, 2048] k=16 and a
    two-level (block 128) index-exact alternative."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from docodo_tpu.ops.seqops import select_slots

    print("devices:", jax.devices(), file=sys.stderr)
    B, n, k = 5000, 2048, 16
    nprng = np.random.default_rng(11)
    ranks = np.where(nprng.random((B, n)) < 0.06,
                     (1.0 + nprng.integers(0, 50, (B, n))
                      + np.log(1 + nprng.integers(0, 9, (B, n)))), 0.0
                     ).astype(np.float32)
    pages = nprng.integers(0, 600, (B, n)).astype(np.int32)
    rj, pj = jnp.asarray(ranks), jnp.asarray(pages)

    def two_level(r):
        bits = jax.lax.bitcast_convert_type(r, jnp.int32)
        blk = bits.reshape(B, n // 128, 128)
        v1, i1 = jax.lax.top_k(blk, k)          # [B, nb, k]
        base = (jnp.arange(n // 128, dtype=jnp.int32) * 128)[None, :, None]
        cand_v = v1.reshape(B, -1)
        cand_s = (i1 + base).reshape(B, -1)
        v2, i2 = jax.lax.top_k(cand_v, k)       # [B, k] over 256
        slot = select_slots(cand_s, i2, chunk=256)
        return jax.lax.bitcast_convert_type(v2, jnp.float32), slot

    variants = {
        "topk values only": lambda r: (jax.lax.top_k(
            jax.lax.bitcast_convert_type(r, jnp.int32), k)[0],),
        "topk + indices consumed": lambda r: jax.lax.top_k(
            jax.lax.bitcast_convert_type(r, jnp.int32), k),
        "topk + idx + select_slots": lambda r: (lambda v, s: (
            v, select_slots(pj, s)))(*jax.lax.top_k(
                jax.lax.bitcast_convert_type(r, jnp.int32), k)),
        "two-level topk": lambda r: two_level(r),
        "two-level + select_slots": lambda r: (lambda v, s: (
            v, s, select_slots(pj, s)))(*two_level(r)),
    }
    for label, fn in variants.items():
        @jax.jit
        def loop(s0, fn=fn):
            def body(_, s):
                outs = fn(rj + s * 0)
                acc = jnp.float32(0)
                for o in outs:
                    acc = acc + jnp.sum(o.astype(jnp.float32))
                return acc * 1e-6 + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(loop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(loop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert final == warm
        print(f"{label:28s} run {dt:7.2f} ms", file=sys.stderr)

    # exactness incl. tie-break vs the one-level form
    v_ref, s_ref = jax.lax.top_k(
        jax.lax.bitcast_convert_type(rj, jnp.int32), k)
    v2, s2 = two_level(rj)
    np.testing.assert_array_equal(
        np.asarray(jax.lax.bitcast_convert_type(v_ref, jnp.float32)),
        np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s2))
    print("two-level top_k bit-matches one-level incl. tie-break",
          file=sys.stderr)
    return 0


if __name__ == "__main__" and os.environ.get("PROBE_TOPK_R4") == "1":
    raise SystemExit(main2())
