"""Shared pieces of the query benchmarks (bench.py at the repo root and
benchmarks/full_result.py): the standard 10k mixed query set, the
(cap, W, hit-tier) full-result bucketing policy, and the sequential
host full-result baseline — ONE copy, so a formula or tier change
cannot silently skew one benchmark's vs_baseline against the other."""

from __future__ import annotations

import time

import numpy as np

HIT_TIERS = (128, 512, 1024)


def standard_mix(counts: np.ndarray, id_to_term, n_queries: int,
                 seed: int = 42):
    """The standard mixed word/phrase/proximity query set over the real
    term distribution (BASELINE.json: '10k concurrent mixed queries').
    Returns (terms int32[N, 2], rs int32[N, 2])."""
    rng = np.random.default_rng(seed)
    eligible = np.flatnonzero(counts >= 2)
    terms = np.full((n_queries, 2), -1, dtype=np.int32)
    rs = np.ones((n_queries, 2), dtype=np.int32)
    for i in range(n_queries):
        a, b = rng.choice(eligible, size=2, replace=False)
        kind = i % 3
        if kind == 0:      # single word
            terms[i, 0] = a
            rs[i, 0] = 255 + len(id_to_term[a])
        elif kind == 1:    # ordered "phrase"
            terms[i] = (a, b)
            rs[i] = (-(len(id_to_term[a]) + 4), -(len(id_to_term[b]) + 4))
        else:              # proximity AND, default dist
            terms[i] = (a, b)
            rs[i] = (255 + len(id_to_term[a]), 255 + len(id_to_term[b]))
    return terms, rs


def tier_of(min_need: int, hit_cap: int) -> int:
    """Hit-buffer readback tier from the smallest operand's volume."""
    want = 4 * min_need + 16
    for t in HIT_TIERS:
        if t <= hit_cap and want <= t:
            return t
    return hit_cap


def full_buckets(terms: np.ndarray, rs: np.ndarray, counts: np.ndarray,
                 hit_cap: int):
    """Group the mix into (posting-cap, W, hit-tier) buckets — the
    serving fused layout. Returns (terms_t, rs_t, caps_t, hcaps_t)
    tuples of jnp arrays / ints."""
    import jax.numpy as jnp

    from docodo_tpu.ops.device_index import (
        ASYM_CAP_MIN, _asym_enabled, _bucket_sort_key,
    )

    def pow2(n: int) -> int:
        c = 64
        while c < n:
            c <<= 1
        return c

    buckets = {}
    for i in range(terms.shape[0]):
        w = int((terms[i] >= 0).sum()) or 1
        need = int(counts[terms[i, :w]].max())
        min_need = int(counts[terms[i, :w]].min())
        c = pow2(need)
        if w == 2 and c >= ASYM_CAP_MIN and _asym_enabled():
            c0, c1 = pow2(int(counts[terms[i, 0]])), pow2(
                int(counts[terms[i, 1]]))
            if min(c0, c1) <= max(c0, c1) // 4:
                c = (c0, c1)
        buckets.setdefault(
            (c, w, tier_of(min_need, hit_cap)), []
        ).append(i)
    terms_t, rs_t, caps_t, hcaps_t = [], [], [], []
    for (qcap, w, hb), idxs in sorted(
            buckets.items(), key=_bucket_sort_key):
        terms_t.append(jnp.asarray(terms[idxs, :w]))
        rs_t.append(jnp.asarray(rs[idxs, :w]))
        caps_t.append(qcap)
        hcaps_t.append(hb)
    return (tuple(terms_t), tuple(rs_t), tuple(caps_t), tuple(hcaps_t))


def host_full_baseline(terms: np.ndarray, rs: np.ndarray,
                       sc_host: np.ndarray, off_np: np.ndarray,
                       bounds_np: np.ndarray, topk: int,
                       n_base: int = 256, best_of: int = 3) -> float:
    """Sequential host FULL-RESULT engine (the reference-analog per-query
    loop: proximity-AND + locate + rank + per-page position extraction +
    doc rank). Returns best-of QPS — the strongest host measurement is
    the baseline, so vs_baseline stays conservative under load noise."""
    from docodo_tpu.core.postings import group_and

    w_max = terms.shape[1]
    n_base = min(n_base, terms.shape[0])

    def chunk():
        t0 = time.perf_counter()
        for i in range(n_base):
            acc = sc_host[
                off_np[terms[i, 0]]: off_np[terms[i, 0] + 1]
            ].astype(np.uint64)
            r_acc = int(rs[i, 0])
            for j in range(1, w_max):
                t = terms[i, j]
                if t < 0:
                    continue
                b = sc_host[off_np[t]: off_np[t + 1]].astype(np.uint64)
                acc, r_acc = group_and(acc, b, r_acc, int(rs[i, j]))
            page = np.searchsorted(bounds_np, acc, side="right")
            if acc.size:
                first = np.concatenate([[True], page[1:] != page[:-1]])
                run = np.cumsum(first) - 1
                gaps = np.diff(acc.astype(np.int64), prepend=0)
                bonus = np.where(~first, 30 // np.maximum(5, gaps), 0)
                nb = np.bincount(run)
                rank = (1 + np.bincount(run, weights=bonus)
                        + np.log(np.maximum(nb, 1)))
                k = min(topk, rank.size)
                top = np.argpartition(-rank, k - 1)[:k]
                starts = np.flatnonzero(first)
                ends = np.append(starts[1:], acc.size)
                base = np.where(
                    page > 0, bounds_np[np.maximum(page - 1, 0)], 0
                )
                for t_ in top:
                    _ = (acc[starts[t_]:ends[t_]]
                         - base[starts[t_]]).tolist()
                1 + np.log(max(rank[top].sum(), 1e-30))
        return (time.perf_counter() - t0) / n_base

    return 1.0 / min(chunk() for _ in range(best_of))
