"""Log-shift stream compaction vs the current tails at the dominant ru
bucket's shape ([5000, 2048]).

Both big tails of the full-result path are COMPACTIONS (move kept
values left, order preserved): the hits tail is a full-width 1-op
lax.sort (ascending kept stream: mask+sort = stable partition) and the
first-topk-runs tail is 3x chunked compare-all one-hots
(_compact_runs). A compaction has an exact O(log n)-stage masked-shift
form: with d[l] = #dropped lanes before l (= l - exclusive-cumsum of
keep), process bit b of d LSB-first, shifting left by 2^b every kept
element whose bit is set. For kept i<j, d[j]-d[i] <= j-i-1 (lane i
itself is kept), so intermediate positions i - (d[i] & (2^(b+1)-1))
stay STRICTLY increasing — no two kept elements ever collide, moves
are pure rolls+selects (fusion-friendly; the sort's compare-exchange
while-loop cannot fuse).

Variants timed (fori_loop-chained, checksums consume outputs, numpy
parity asserted):
  hits:  (a) lax.sort -> crop   (b) log-shift -> crop
         (c) log-shift, (d,keep) packed into one meta array
  runs:  (d) _compact_runs 3x compare-all (current)
         (e) log-shift, shared masks over 3 payloads
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
    HCAP = 512
    TOPK = 16
    rng = np.random.default_rng(7)
    vals = np.sort(rng.integers(0, 700_000, size=(B, n)), axis=1)
    keep = rng.random((B, n)) < 0.1
    hv_np = np.where(keep, vals, np.int64(INF32)).astype(np.int32)
    hv = jnp.asarray(hv_np)

    # runs fixture: sparse run starts with 3 payloads
    start_np = rng.random((B, n)) < 0.01
    page_np = np.where(start_np, rng.integers(0, 5000, (B, n)), -1).astype(np.int32)
    rank_np = np.where(start_np, rng.random((B, n)) + 1.0, 0.0).astype(np.float32)
    cnt_np = np.where(start_np, rng.integers(1, 50, (B, n)), 0).astype(np.float32)
    page_j = jnp.asarray(page_np)
    rank_j = jnp.asarray(rank_np)
    cnt_j = jnp.asarray(cnt_np)

    def shift_left_fill(x, k, fill):
        return jnp.concatenate(
            [x[:, k:], jnp.full((x.shape[0], k), fill, x.dtype)], axis=1)

    nbits = int(np.ceil(np.log2(n)))

    def compact_shift(v, kp, crop):
        """Exact first-`crop` kept values of an order-preserving sparse
        stream via LSB-first log-shifts (collision-free, see header)."""
        c = jnp.cumsum(kp.astype(jnp.int32), axis=1)
        d = jnp.arange(n, dtype=jnp.int32)[None, :] - (c - 1)  # dropped before, for kept lanes
        d = jnp.where(kp, d, 0)
        for b in range(nbits):
            s = 1 << b
            sv = shift_left_fill(v, s, INF32)
            sd = shift_left_fill(d, s, np.int32(0))
            sk = shift_left_fill(kp, s, False)
            inc = jnp.logical_and(sk, (sd & s) != 0)
            stay = jnp.logical_and(kp, (d & s) == 0)
            v = jnp.where(inc, sv, jnp.where(stay, v, INF32))
            d = jnp.where(inc, sd, jnp.where(stay, d, 0))
            kp = jnp.logical_or(inc, stay)
        return v[:, :crop]

    def compact_shift_packed(v, crop):
        """Same, (d<<1 | keep) packed into one meta array (2 rolls per
        stage instead of 3)."""
        kp = v < INF32
        c = jnp.cumsum(kp.astype(jnp.int32), axis=1)
        d = jnp.arange(n, dtype=jnp.int32)[None, :] - (c - 1)
        meta = jnp.where(kp, (d << 1) | 1, 0)
        for b in range(nbits):
            s = 1 << b
            sv = shift_left_fill(v, s, INF32)
            sm = shift_left_fill(meta, s, np.int32(0))
            inc = (sm & ((s << 1) | 1)) == ((s << 1) | 1)
            stay = (meta & ((s << 1) | 1)) == 1
            v = jnp.where(inc, sv, jnp.where(stay, v, INF32))
            meta = jnp.where(inc, sm, jnp.where(stay, meta, 0))
        return v[:, :crop]

    def compact_shift_multi(streams, fills, kp, crop):
        """Shared-mask log-shift over several payload streams."""
        c = jnp.cumsum(kp.astype(jnp.int32), axis=1)
        d = jnp.arange(n, dtype=jnp.int32)[None, :] - (c - 1)
        d = jnp.where(kp, d, 0)
        streams = list(streams)
        for b in range(nbits):
            s = 1 << b
            sd = shift_left_fill(d, s, np.int32(0))
            sk = shift_left_fill(kp, s, False)
            inc = jnp.logical_and(sk, (sd & s) != 0)
            stay = jnp.logical_and(kp, (d & s) == 0)
            for i, (st, fl) in enumerate(zip(streams, fills)):
                sv = shift_left_fill(st, s, fl)
                streams[i] = jnp.where(
                    inc, sv, jnp.where(stay, st, jnp.full((), fl, st.dtype)))
            d = jnp.where(inc, sd, jnp.where(stay, d, 0))
            kp = jnp.logical_or(inc, stay)
        return [st[:, :crop] for st in streams]

    # ---- parity vs numpy ----
    def np_compact(v_np, k_np, crop, fill):
        out = np.full((B, crop), fill, v_np.dtype)
        for r in range(B):
            kept = v_np[r][k_np[r]]
            m = min(crop, kept.size)
            out[r, :m] = kept[:m]
        return out

    got = np.asarray(jax.jit(lambda v: compact_shift(v, v < INF32, HCAP))(hv))
    want = np_compact(hv_np, keep, HCAP, INF32)
    assert np.array_equal(got, want), "log-shift hits parity FAILED"
    got_p = np.asarray(jax.jit(lambda v: compact_shift_packed(v, HCAP))(hv))
    assert np.array_equal(got_p, want), "packed log-shift parity FAILED"
    outs = jax.jit(lambda p, r, c, s: compact_shift_multi(
        (p, r, c), (np.int32(-1), np.float32(0), np.float32(0)),
        s, TOPK))(page_j, rank_j, cnt_j, jnp.asarray(start_np))
    want_pg = np_compact(page_np, start_np, TOPK, -1)
    assert np.array_equal(np.asarray(outs[0]), want_pg), "runs parity FAILED"
    print("parity ok", file=sys.stderr)

    def time_fn(name, fn, *args):
        @jax.jit
        def floop(s0):
            def body(_, s):
                outs = fn(*[a + (s * 0).astype(a.dtype) for a in args])
                if not isinstance(outs, (tuple, list)):
                    outs = (outs,)
                acc = s * 0
                for o in outs:
                    acc = acc + jnp.sum(
                        jnp.where(o.astype(jnp.float32) >= INF32, 0.0,
                                  o.astype(jnp.float32))) * 1e-6
                return acc + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(floop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(floop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert abs(final - warm) < 1e-3 * max(abs(final), 1.0)
        print(f"{name:40s} {dt:7.2f} ms", file=sys.stderr)
        return dt

    time_fn("hits: lax.sort -> crop 512 (current)",
            lambda h: jax.lax.sort(h)[:, :HCAP], hv)
    time_fn("hits: log-shift -> crop 512",
            lambda h: compact_shift(h, h < INF32, HCAP), hv)
    time_fn("hits: log-shift packed meta",
            lambda h: compact_shift_packed(h, HCAP), hv)

    from docodo_tpu.ops.pallas_query import _compact_runs
    def runs_current(p, r, c):
        st = r > 0
        run_sel = jnp.where(st, jnp.cumsum(st.astype(jnp.int32), axis=1) - 1, -1)
        return (_compact_runs(r, run_sel, TOPK),
                _compact_runs(p, run_sel, TOPK),
                _compact_runs(c, run_sel, TOPK))
    time_fn("runs: 3x compare-all (current)", runs_current,
            page_j, rank_j, cnt_j)

    def runs_shift(p, r, c):
        st = r > 0
        return tuple(compact_shift_multi(
            (r, p, c), (np.float32(0), np.int32(-1), np.float32(0)),
            st, TOPK))
    time_fn("runs: log-shift shared masks", runs_shift,
            page_j, rank_j, cnt_j)
    return 0


if __name__ == "__main__":
    sys.exit(main())
