"""Probe: Mosaic compile feasibility + timing of the ONE-pass fused
AND kernel at the FUSED_AND_MAX=4096 ceiling (cap-2048 W2 buckets),
vs the two-pass chunked pipeline on the same stream. The 2048-lane
width is covered by benchmarks/profile_ru_w2.py; this probes the
widest admitted stream, where compile time is the open risk (the
unrolled locate/top-k pipeline at 2048 lanes famously ran >10 min —
the AND-only kernel is ~9 log-depth scans and should be fine)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "30"))


def main() -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from docodo_tpu.ops import pallas_query as pq
    from docodo_tpu.ops.seqops import INF32

    print("devices:", jax.devices(), file=sys.stderr)
    B, n = int(os.environ.get("DOCODO_PROBE_B", "2000")), 4096
    nprng = np.random.default_rng(7)
    vals = np.full((B, n), INF32, np.int32)
    tag = np.full((B, n), 2, np.int32)
    for i in range(B):
        na = int(nprng.integers(n // 4, n // 2 + 1))
        nb = n - na
        v = np.sort(nprng.choice(6 * n, na + nb, replace=False) * 3)
        t = (nprng.random(na + nb) < nb / n).astype(np.int32)
        vals[i], tag[i] = v.astype(np.int32), t
    ra = np.full((B, 1), 300, np.int32)
    rb = np.full((B, 1), -300, np.int32)
    vj, tj, raj, rbj = map(jnp.asarray, (vals, tag, ra, rb))

    def timed(label, fn):
        t0 = time.perf_counter()

        @jax.jit
        def loop(s0):
            def body(_, s):
                hv = fn(vj + (s * 0).astype(jnp.int32))
                return jnp.sum(
                    jnp.where(hv < INF32, 1, 0)).astype(jnp.float32)
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(loop(jnp.float32(0)))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        final = float(loop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert final == warm
        print(f"{label:14s} compile {tc:6.1f} s  run {dt:7.2f} ms "
              f"  checksum {final}", file=sys.stderr)
        return final

    fused = timed("fused@4096", lambda v: pq.pallas_fused_and(
        vj * 0 + v, tj, raj, rbj))
    saved = pq.FUSED_AND_MAX
    pq.FUSED_AND_MAX = 0
    try:
        two = timed("two-pass@4096", lambda v: pq.pallas_chunked_and(
            vj * 0 + v, tj, raj, rbj)[:, :n])
    finally:
        pq.FUSED_AND_MAX = saved
    assert fused == two, (fused, two)
    print("checksums match", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
