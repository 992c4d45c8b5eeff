"""Hits-compaction alternatives at the dominant ru bucket's shape
([B, n] INF-masked ascending kept stream -> first `hit_cap` kept
values): the full-width 1-op i32 lax.sort (current) vs lax.top_k on
the NEGATED stream (k smallest in order, i32 keys) at several tiers.
Synthetic streams, fori_loop-chained reps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "25"))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    from docodo_tpu.ops.seqops import INF32

    print("devices:", jax.devices(), file=sys.stderr)
    B, n = 5000, 2048
    rng = np.random.default_rng(7)
    vals = np.sort(rng.integers(0, 700_000, size=(B, n)), axis=1)
    keep = rng.random((B, n)) < 0.1
    hv_np = np.where(keep, vals, np.int64(INF32)).astype(np.int32)
    hv = jnp.asarray(hv_np)

    def time_fn(name, fn):
        @jax.jit
        def floop(s0):
            def body(_, s):
                out = fn(hv + (s * 0).astype(jnp.int32))
                return jnp.sum(
                    jnp.where(out == INF32, 0, out).astype(jnp.float32)
                ) * 1e-6 + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(floop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(floop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert abs(final - warm) < 1e-3 * max(abs(final), 1.0)
        print(f"{name:32s} {dt:7.2f} ms", file=sys.stderr)
        return dt

    time_fn("lax.sort full -> crop 256", lambda h: jax.lax.sort(h)[:, :256])
    for cap in (128, 256, 512, 1024):
        def tk(h, cap=cap):
            # k smallest in ascending order: top_k of the negation
            # (i32 keys; INF32 negates to the minimum, sorts last)
            neg, _ = jax.lax.top_k(-h, cap)
            return -neg
        time_fn(f"top_k negated k={cap}", tk)
    # correctness pin for the top_k form
    want = np.sort(hv_np, axis=1)[:, :256]
    got = np.asarray(-jax.lax.top_k(-hv, 256)[0])
    np.testing.assert_array_equal(want, got)
    print("top_k form bit-matches sort-crop", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
