"""Probe: row-gather cost vs row width (is tab[row] latency-bound or
bytes-bound?). Decides whether carrying a precomputed page stream
through the posting fetch is ~free (interleaved 2w rows) or 2x."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "100"))


def main():
    import jax
    import jax.numpy as jnp

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    print("devices:", jax.devices(), file=sys.stderr)

    rng = np.random.default_rng(0)
    B = 11904          # 2 words x 5952 queries
    T = 16384
    rows = jnp.asarray(rng.integers(0, T, size=B).astype(np.int32))

    for w in (64, 128, 256):
        tab = jnp.asarray(rng.integers(0, 1 << 20, size=(T, w)).astype(
            np.int32))

        @jax.jit
        def floop(s0, tab=tab):
            def body(_, s):
                r = jnp.minimum(rows + s.astype(jnp.int32) * 0, T - 1)
                v = tab[r]
                return jnp.sum(v, dtype=jnp.int32) * 0 + s + jnp.float32(0)
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(floop(jnp.float32(0)))
        t0 = time.perf_counter()
        float(floop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"width {w:4d}: {dt:7.3f} ms ({dt / B * 1e6:6.1f} ns/row, "
              f"{B * w * 4 / dt / 1e6:8.1f} GB/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
