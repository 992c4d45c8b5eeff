"""Probe: chunked vs resident (one-chunk) locate at [5000, 2048] —
raw kernel output vs the full weave+top-k tail, and the rows-per-
program sweep for the resident grid. Localizes the resident-locate
regression (full pipeline 8.91 -> 12.91 ms when resident q=32
replaced the q=8 two-chunk grid)."""

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

    def timed(label, fn):
        @jax.jit
        def loop(s0):
            def body(_, s):
                out = fn(hvj + (s * 0).astype(jnp.int32))
                return jnp.sum(out[1]).astype(jnp.float32) * 1e-6 + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        t0 = time.perf_counter()
        warm = float(loop(jnp.float32(0)))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        final = float(loop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert final == warm
        print(f"{label:26s} compile {tc:5.1f} s  run {dt:7.2f} ms",
              file=sys.stderr)

    for resident in (False, True):
        for raw in (True, False):
            timed(
                f"resident={resident} raw={raw}",
                lambda h, r=resident, w=raw: pq.pallas_chunked_locate(
                    h, bj, topk=16, pg=pgj, resident=r, raw=w),
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
