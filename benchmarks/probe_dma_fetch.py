"""Can a Pallas kernel with manual per-row async DMAs beat the XLA
row gather? probe_gather_paged.py put the XLA gather floor at ~63 GB/s
for [10k rows x 2048 lanes] (1.27 ms) — the fetch is the largest
remaining stage of the ru dominant bucket. If per-row DMAs from an
HBM-resident table (row ids scalar-prefetched, q rows per program,
copies overlapped then waited) run materially faster, the fetch can
fuse INTO the merge kernel (saving the gathered stream's HBM round
trip too).

Mosaic landmine (first attempt): a [R, n] HBM table is (8, 128)-tiled
and `tab_ref.at[row]` is a 1-row slice — "Slice shape along dimension 0
must be aligned to tiling (8)". The table therefore ships 3-D as
[R, 8, n/8]: each logical row occupies its own aligned (8, n/8) tile
(row-major contiguous, so one DMA copies the whole 4n-byte row) and
first-dim slices are tile-exact.

Legs:
  xla-gather      tab[ids] -> [B, n] (the current approach's floor)
  dma-out3d       per-row DMAs -> write [B, 8, n/8] (pure DMA rate;
                  no relayout — answers "can DMAs beat the gather?")
  dma-reshape     same + in-kernel (8, n/8)->(n,) reshape -> [B, n]
                  (what a fused consumer pays to see lane-order rows)
  dma-sum128      reduce in-kernel to [B, 128] (fused-use bound: the
                  stream never leaves VMEM)

MEASURED (TPU v5e, r5): the in-kernel DMA fetch is a NEGATIVE — the
XLA row gather IS the memory-system floor for random 8 KB rows, not an
XLA inefficiency:

  xla row gather     1.26 ms  (64.9 GB/s)   <- floor
  dma(q=32)  out3d   1.45 ms  (56.4 GB/s)   per-DMA overhead loses
  dma(q=32)  reshape 1.36 ms  (60.1 GB/s)   (relayout itself is cheap)
  dma(q=32)  sum128  4.39 ms  (18.7 GB/s)   in-kernel reduce swamps it
  dma(q=64)  out3d   4.72 ms / dma(q=128) out3d 3.41 ms — deeper DMA
             queues hurt (VMEM scratch pressure breaks the output
             pipelining); q=32 is the best and still loses.

Conclusion recorded for the doctrine: random-row posting fetch is
latency/issue-bound at ~60-65 GB/s whichever engine issues it; the
road below the floor would need layout changes that amortize
randomness (bigger rows per access), not a different fetch engine.
The banded-table row-gather fetch stays.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "25"))
Q = int(os.environ.get("DOCODO_DMA_Q", "32"))
LEGS = os.environ.get("DOCODO_DMA_LEGS", "gather,out,reshape,sum").split(",")


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
    R, n, B, q = 16384, 2048, 10_000, Q
    sub = n // 8
    rng = np.random.default_rng(5)
    tab_np = rng.integers(0, 1 << 20, (R, n)).astype(np.int32)
    tab3 = jnp.asarray(tab_np.reshape(R, 8, sub))
    tab = jnp.asarray(tab_np)
    ids_np = rng.integers(0, R, B).astype(np.int32)
    pad = (-B) % q
    ids = jnp.asarray(np.concatenate([ids_np, np.zeros(pad, np.int32)]))
    bp = B + pad

    def fetch_kernel(ids_ref, tab_ref, out_ref, scratch, sems, *,
                     q: int, mode: str):
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
        if mode == "sum":
            s = scratch[...].reshape(q * 8, sub)
            acc = jnp.sum(s.reshape(q * 8, sub // 128, 128), axis=1)
            out_ref[...] = jnp.sum(
                acc.reshape(q, 8, 128), axis=1)
        elif mode == "reshape":
            out_ref[...] = scratch[...].reshape(q, n)
        else:
            out_ref[...] = scratch[...]

    def make_fetch(mode: str):
        if mode == "sum":
            oshape, ospec = (bp, 128), pl.BlockSpec(
                (q, 128), lambda i, *_: (i, 0))
        elif mode == "reshape":
            oshape, ospec = (bp, n), pl.BlockSpec(
                (q, n), lambda i, *_: (i, 0))
        else:
            oshape, ospec = (bp, 8, sub), pl.BlockSpec(
                (q, 8, sub), lambda i, *_: (i, 0, 0))
        kern = functools.partial(fetch_kernel, q=q, mode=mode)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bp // q,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=ospec,
                scratch_shapes=[
                    pltpu.VMEM((q, 8, sub), jnp.int32),
                    pltpu.SemaphoreType.DMA((q,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.int32),
        )

    want = tab_np[ids_np]
    fetchers = {}
    for leg in ("out", "reshape", "sum"):
        if leg not in LEGS:
            continue
        fetchers[leg] = make_fetch(leg)
        got = np.asarray(
            jax.jit(lambda i2, f=fetchers[leg]: f(i2, tab3))(ids))[:B]
        if leg == "out":
            np.testing.assert_array_equal(got.reshape(B, n), want)
        elif leg == "reshape":
            np.testing.assert_array_equal(got, want)
        else:
            want_s = want.reshape(B, 8, sub // 128, 128).sum(axis=(1, 2))
            np.testing.assert_array_equal(got, want_s.astype(np.int32))
        print(f"parity {leg} ok", file=sys.stderr)

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

    if "gather" in LEGS:
        time_fn("xla row gather", lambda i2: tab[i2])
    for leg, f in fetchers.items():
        time_fn(f"dma(q={q}) -> {leg}", lambda i2, f=f: f(i2, tab3))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
