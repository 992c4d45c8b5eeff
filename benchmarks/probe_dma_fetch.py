"""Can a Pallas kernel with manual per-row async DMAs beat the XLA
row gather? probe_gather_paged.py put the XLA gather floor at ~63 GB/s
for [10k rows x 2048 lanes] (1.27 ms) — the fetch is the largest
remaining stage of the ru dominant bucket. If per-row DMAs from an
HBM-resident table (row ids scalar-prefetched, q rows per program,
copies overlapped then waited) run materially faster, the fetch can
fuse INTO the merge kernel (saving the gathered stream's HBM round
trip too). Legs:

  xla-gather      tab[ids] -> [B, n] (the current approach's floor)
  dma-fetch-out   Pallas per-row DMAs -> write the fetched [B, n]
  dma-fetch-sum   same, but reduce in-kernel to [B, 128] (the
                  fused-use bound: the stream never leaves VMEM)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "25"))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    print("devices:", jax.devices(), file=sys.stderr)
    R, n, B, q = 16384, 2048, 10_000, 32
    rng = np.random.default_rng(5)
    tab = jnp.asarray(rng.integers(0, 1 << 20, (R, n)).astype(np.int32))
    ids_np = rng.integers(0, R, B).astype(np.int32)
    pad = (-B) % q
    ids = jnp.asarray(np.concatenate([ids_np, np.zeros(pad, np.int32)]))
    bp = B + pad

    def fetch_kernel(ids_ref, tab_ref, out_ref, scratch, sems, *,
                     q: int, reduce_out: bool):
        i = pl.program_id(0)
        for j in range(q):
            row = ids_ref[i * q + j]
            pltpu.make_async_copy(
                tab_ref.at[row], scratch.at[j], sems.at[j]
            ).start()
        for j in range(q):
            pltpu.make_async_copy(
                tab_ref.at[ids_ref[i * q + j]], scratch.at[j],
                sems.at[j]
            ).wait()
        if reduce_out:
            s = scratch[...].reshape(q, n // 128, 128)
            out_ref[...] = jnp.sum(s, axis=1)
        else:
            out_ref[...] = scratch[...]

    def make_fetch(reduce_out: bool):
        out_w = 128 if reduce_out else n
        kern = functools.partial(fetch_kernel, q=q, reduce_out=reduce_out)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bp // q,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((q, out_w), lambda i, *_: (i, 0)),
                scratch_shapes=[
                    pltpu.VMEM((q, n), jnp.int32),
                    pltpu.SemaphoreType.DMA((q,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((bp, out_w), jnp.int32),
        )

    fetch_out = make_fetch(False)
    fetch_sum = make_fetch(True)

    # parity
    want = np.asarray(tab)[ids_np]
    got = np.asarray(jax.jit(lambda i2: fetch_out(i2, tab))(ids))[:B]
    np.testing.assert_array_equal(got, want)
    got_s = np.asarray(jax.jit(lambda i2: fetch_sum(i2, tab))(ids))[:B]
    np.testing.assert_array_equal(
        got_s, want.reshape(B, n // 128, 128).sum(axis=1).astype(np.int32))
    print("parity ok", file=sys.stderr)

    def time_fn(name, fn):
        @jax.jit
        def floop(s0):
            def body(_, s):
                o = fn(ids + (s * 0).astype(jnp.int32))
                return jnp.sum(o.astype(jnp.float32)) * 1e-9 + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(floop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(floop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert abs(final - warm) < 1e-3 * max(abs(final), 1.0)
        gbs = B * n * 4 / dt * 1e-6
        print(f"{name:22s} {dt:7.2f} ms  ({gbs:6.1f} GB/s)",
              file=sys.stderr)
        return dt

    time_fn("xla row gather", lambda i2: tab[i2])
    time_fn("dma fetch -> out", lambda i2: fetch_out(i2, tab))
    time_fn("dma fetch -> sum128", lambda i2: fetch_sum(i2, tab))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
