"""Probe: what fraction of the slots kernel is the page-locate
compare-all, and does an MXU one-hot two-level locate beat it?

Times three kernel variants on the cap-64 W2 bucket shapes
(B=5952, n=128, P=578):
  full   — the production _sorted_and_locate_full_slots_kernel
  nopage — compare-all replaced by arithmetic page (LOWER BOUND only,
           wrong results; isolates the locate cost)
  mxu    — two-level locate: coarse compare vs every 128th bound, then
           an exact hi/lo-split one-hot matmul selects the 128-bound
           block and a fine compare counts within it
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "100"))


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from docodo_tpu.ops import pallas_query as pq
    from docodo_tpu.ops.seqops import INF32

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    print("devices:", jax.devices(), file=sys.stderr)

    rng = np.random.default_rng(0)
    B, CAP, P = 5952, 64, 578
    n = 2 * CAP
    corpus_len = P * 3000
    bounds = np.minimum(np.arange(1, P + 1) * 3000, corpus_len).astype(
        np.int32)

    # realistic sorted merged streams: ascending coords, INF32 tail
    lens = rng.integers(8, n, size=B)
    vals = np.full((B, n), np.iinfo(np.int32).max, dtype=np.int32)
    tag = np.full((B, n), 2, dtype=np.int32)
    for i in range(B):
        m = lens[i]
        v = np.sort(rng.integers(0, corpus_len, size=m)).astype(np.int32)
        vals[i, :m] = v
        tag[i, :m] = rng.integers(0, 2, size=m)
    vals = jnp.asarray(vals)
    tag = jnp.asarray(tag)
    ra = jnp.full((B, 1), 10, jnp.int32)
    rb = jnp.full((B, 1), 10, jnp.int32)
    PC = 128  # fine block width
    PPAD = ((P + PC - 1) // PC) * PC
    bounds_pad = np.full(PPAD, np.iinfo(np.int32).max, dtype=np.int32)
    bounds_pad[:P] = bounds
    bnd = jnp.asarray(bounds_pad).reshape(1, -1)

    q = pq.q_for_sorted_cap(CAP)
    grid = (B // q,)

    def call(kernel):
        in_specs = [
            pl.BlockSpec((q, n), lambda i: (i, 0)),
            pl.BlockSpec((q, n), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, PPAD), lambda i: (0, 0)),
        ]
        out_specs = [
            pl.BlockSpec((q, n), lambda i: (i, 0)),
            pl.BlockSpec((q, n), lambda i: (i, 0)),
            pl.BlockSpec((q, n), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, n), lambda i: (i, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, n), jnp.int32),
            jax.ShapeDtypeStruct((B, n), jnp.float32),
            jax.ShapeDtypeStruct((B, n), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, n), jnp.int32),
        ]
        from jax.experimental.pallas import tpu as pltpu

        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    # ---- variant kernels ------------------------------------------------
    def locate_core_page(vals, keep, lane, nn, bounds_ref, page):
        """_locate_rank_core tail with `page` precomputed."""
        prev_val = pq._shift_right_fill(
            pq._cummax(jnp.where(keep, vals, -1)), np.int32(-1))
        prev_page = pq._shift_right_fill(
            pq._cummax(jnp.where(keep, page, -1)), np.int32(-1))
        has_prev = prev_val >= 0
        first = jnp.logical_and(keep, page != prev_page)
        gap = jnp.where(has_prev, vals - prev_val, 0)
        bonus = jnp.where(
            jnp.logical_and(keep, ~first), 30 // jnp.maximum(5, gap), 0)
        bigi = jnp.int32(np.iinfo(np.int32).max)
        term = pq._roll(first.astype(jnp.int32), -1) > 0
        term = jnp.logical_or(term, lane == nn - 1)
        cbc = pq._cumsum(bonus * pq._PACK + keep.astype(jnp.int32))
        cbc_end = pq._rev_cummin(jnp.where(term, cbc, bigi), bigi)
        cbc_prev = pq._shift_right_fill(cbc, np.int32(0))
        run_bonus = cbc_end // pq._PACK - cbc // pq._PACK
        run_count = (cbc_end % pq._PACK - cbc_prev % pq._PACK).astype(
            jnp.float32)
        slot_rank = jnp.where(
            first, 1.0 + run_bonus.astype(jnp.float32)
            + jnp.log(jnp.maximum(run_count, 1.0)), 0.0)
        slot_count = jnp.where(first, run_count, 0.0)
        return page, first, slot_rank, slot_count

    def mk_kernel(page_fn):
        def kern(vals_ref, tag_ref, ra_ref, rb_ref, bounds_ref,
                 page_ref, rank_ref, cnt_ref, npages_ref, nhits_ref,
                 hits_ref):
            nn = n
            qq = vals_ref.shape[0]
            lane = pq._iota((qq, nn), 1)
            v = vals_ref[...]
            keep = pq._sorted_and_keep(
                v, tag_ref[...], ra_ref, rb_ref, lane, nn)
            nhits_ref[:, 0] = jnp.sum(keep.astype(jnp.int32), axis=-1)
            hits_ref[...] = jnp.where(keep, v, INF32)
            page = page_fn(v, bounds_ref)
            page, first, slot_rank, slot_count = locate_core_page(
                v, keep, lane, nn, bounds_ref, page)
            npages_ref[:, 0] = jnp.sum(first.astype(jnp.int32), axis=-1)
            page_ref[...] = page
            rank_ref[...] = slot_rank
            cnt_ref[...] = slot_count
        return kern

    def page_compare_all(v, bounds_ref):
        # padded entries are INT32_MAX: only the INF32 padding slots
        # count them, and those are keep-masked downstream + clamped
        cmp = bounds_ref[0, :][None, None, :] <= v[:, :, None]
        page = jnp.sum(cmp, axis=2).astype(jnp.int32)
        return jnp.minimum(page, P - 1)

    def page_arith(v, bounds_ref):
        return jnp.minimum(v // 3000, P - 1)

    def page_mxu(v, bounds_ref):
        pc = PPAD // PC                   # coarse blocks
        f = bounds_ref[0, :].reshape(pc, PC)
        coarse_b = f[:, PC - 1]           # [pc]
        qq = v.shape[0]
        coarse = jnp.sum(
            coarse_b[None, None, :] < v[:, :, None], axis=2
        ).astype(jnp.int32)
        coarse = jnp.minimum(coarse, pc - 1)           # [qq, n]
        # one-hot select of the block's bounds, exact via hi/lo split
        ci = pq._iota((qq, v.shape[1], pc), 2)
        oh = (ci == coarse[:, :, None]).astype(jnp.float32)
        oh2 = oh.reshape(qq * v.shape[1], pc)
        f_hi = (f >> 12).astype(jnp.float32)
        f_lo = (f & 4095).astype(jnp.float32)
        sel_hi = jnp.dot(oh2, f_hi, preferred_element_type=jnp.float32)
        sel_lo = jnp.dot(oh2, f_lo, preferred_element_type=jnp.float32)
        sel = (sel_hi.astype(jnp.int32) << 12) + sel_lo.astype(jnp.int32)
        sel = sel.reshape(qq, v.shape[1], PC)
        fine = jnp.sum(sel <= v[:, :, None], axis=2).astype(jnp.int32)
        return jnp.minimum(coarse * PC + fine, P - 1)

    variants = [
        ("full (compare-all)", page_compare_all),
        ("nopage (arith)", page_arith),
        ("mxu 2-level", page_mxu),
    ]

    outs = {}
    for name, fn in variants:
        c = call(mk_kernel(fn))

        @jax.jit
        def floop(s0, c=c):
            def body(_, s):
                rs = c(vals + (s * 0).astype(jnp.int32), tag, ra, rb, bnd)
                return jnp.sum(rs[1]) * 1e-6 + jnp.sum(
                    rs[3].astype(jnp.float32)) * 1e-6 + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(floop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(floop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        outs[name] = (dt, final)
        print(f"{name:22s} {dt:7.3f} ms  checksum {final:.3f}",
              file=sys.stderr)

    ok = abs(outs["full (compare-all)"][1] - outs["mxu 2-level"][1]) < 1e-3
    print(f"mxu checksum parity: {ok}", file=sys.stderr)


if __name__ == "__main__":
    main()
