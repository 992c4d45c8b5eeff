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


W_WIDE = 4
V_WIDE = 8


def wide_mix(counts: np.ndarray, id_to_term, n_queries: int,
             seed: int = 77):
    """Second recorded mix covering the reference's own request surface
    (ref XUnitDocodoTest/IndexTest.cs:164-226 — e.g.
    `"old (lady|ladies) (who|were|looked)"`, `?an?` wildcards,
    `{Name=Dump}` fields): 3-4-word phrases, nested OR variant groups,
    wildcard-style variant unions, and field rows — all the shapes
    standard_mix (W<=2, V=1, no fields) never exercises.

    Returns (terms int32[R, 4, 8], rs int32[R, 4], qid int32[R]): row r
    belongs to logical query qid[r]. Field queries emit TWO rows (main
    + the field row — the serving layout: the field row is a separate
    device row doc-intersected in delivery, see query/batcher.py), so
    R >= n_queries; QPS counts logical queries."""
    rng = np.random.default_rng(seed)
    eligible = np.flatnonzero(counts >= 2)
    by_freq = eligible[np.argsort(counts[eligible])]
    # wildcard expansions (?an?) hit mostly rare terms plus a few
    # frequent ones; the batcher's _ROW_BUDGET gates the worst blowups
    rare = by_freq[: max(8, int(by_freq.size * 0.8))]
    rows_t, rows_r, rows_q = [], [], []

    def wlen(t):
        return len(id_to_term[int(t)])

    def emit(words, ordered, qid):
        """words: list of per-word variant lists."""
        t = np.full((W_WIDE, V_WIDE), -1, np.int32)
        r = np.ones(W_WIDE, np.int32)
        for w, vs in enumerate(words):
            t[w, : len(vs)] = vs
            ml = max(wlen(v) for v in vs)
            r[w] = -(ml + 4) if ordered else 255 + ml
        rows_t.append(t)
        rows_r.append(r)
        rows_q.append(qid)

    for i in range(n_queries):
        kind = i % 7
        picks = rng.choice(eligible, size=4, replace=False)
        if kind == 0:    # single word
            emit([[picks[0]]], False, i)
        elif kind == 1:  # 2-word proximity (continuity with standard)
            emit([[picks[0]], [picks[1]]], False, i)
        elif kind == 2:  # 3-word exact phrase
            emit([[p] for p in picks[:3]], True, i)
        elif kind == 3:  # 4-word proximity AND
            emit([[p] for p in picks], False, i)
        elif kind == 4:  # nested OR: w1 (a|b|c) — ref "old (lady|ladies)"
            emit([[picks[0]], list(picks[1:4])], False, i)
        elif kind == 5:  # wildcard-style union: one word, 8 variants
            vs = rng.choice(rare, size=V_WIDE, replace=False)
            emit([list(vs)], False, i)
        else:            # field query: main pair + separate field row
            emit([[picks[0]], [picks[1]]], False, i)
            emit([[picks[2]]], False, i)
    return (np.stack(rows_t), np.stack(rows_r),
            np.asarray(rows_q, np.int32))


def full_buckets_wide(terms: np.ndarray, rs: np.ndarray,
                      counts: np.ndarray, hit_cap: int):
    """full_buckets twin for the wide mix: rows grouped by
    (posting-cap, W, V, hit-tier); V=1 buckets ship 2-D [B, W] terms
    (the engine dispatches on ndim), variant buckets ship [B, W, V]."""
    import jax.numpy as jnp

    from docodo_tpu.ops.device_index import _bucket_sort_key

    def pow2(n: int) -> int:
        c = 64
        while c < n:
            c <<= 1
        return c

    def pow2v(n: int) -> int:
        c = 1
        while c < n:
            c <<= 1
        return c

    buckets = {}
    for i in range(terms.shape[0]):
        valid = terms[i] >= 0
        w = int(valid.any(axis=1).sum()) or 1
        # V rounds to a power of two exactly like production bucketing
        # (search_batch_full's _bucket(v, lo=1)): odd-V kernel shapes
        # are never exercised in serving and Mosaic rejects them
        v = pow2v(int(valid[:w].sum(axis=1).max()) or 1)
        need = int(counts[terms[i][valid]].max())
        # per-word union volume bound = sum of its variants' counts
        per_word = [
            int(counts[terms[i, j][valid[j]]].sum()) for j in range(w)
        ]
        min_need = min(per_word)
        key = (pow2(need), w, v, tier_of(min_need, hit_cap))
        buckets.setdefault(key, []).append(i)
    terms_t, rs_t, caps_t, hcaps_t = [], [], [], []
    for (qcap, w, v, hb), idxs in sorted(
            buckets.items(), key=_bucket_sort_key):
        t = terms[idxs][:, :w, :v]
        if v == 1:
            t = t[:, :, 0]
        terms_t.append(jnp.asarray(t))
        rs_t.append(jnp.asarray(rs[idxs][:, :w]))
        caps_t.append(qcap)
        hcaps_t.append(hb)
    return (tuple(terms_t), tuple(rs_t), tuple(caps_t), tuple(hcaps_t))


def host_wide_baseline(terms: np.ndarray, rs: np.ndarray, qid: np.ndarray,
                       sc_host: np.ndarray, off_np: np.ndarray,
                       bounds_np: np.ndarray, topk: int,
                       n_base: int = 128, best_of: int = 3) -> float:
    """Sequential host FULL-RESULT engine over the wide mix (variant
    OR folds + W-word proximity folds + locate + rank + positions) —
    the reference-analog per-query loop for vs_baseline on the wide
    leg. Returns best-of QPS over the first `n_base` LOGICAL queries."""
    from docodo_tpu.core.postings import group_and, or_merge

    n_rows = terms.shape[0]
    n_base = min(n_base, int(qid.max()) + 1)
    rows = [r for r in range(n_rows) if qid[r] < n_base]

    def fetch(t):
        return sc_host[off_np[t]: off_np[t + 1]].astype(np.uint64)

    def chunk():
        t0 = time.perf_counter()
        for r in rows:
            acc = None
            r_acc = 0
            for j in range(terms.shape[1]):
                vs = terms[r, j][terms[r, j] >= 0]
                if vs.size == 0:
                    continue
                b = fetch(vs[0])
                for vv in vs[1:]:
                    b, _ = or_merge(b, fetch(vv), 1, 1)
                if acc is None:
                    acc, r_acc = b, int(rs[r, j])
                else:
                    acc, r_acc = group_and(acc, b, r_acc, int(rs[r, j]))
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
    # WIDE-bucket merging (A/B, DOCODO_MERGE_WIDE_B — measured
    # NEUTRAL-to-NEGATIVE r5, default OFF): PROFILE_r05's ablation
    # names the sparse wide W2 chunked buckets (14 rows over 5 buckets,
    # cap 4096-32768) as 3.15 ms of the 10.2 ms batch. Rows pad to the
    # Mosaic block height 8 per bucket, so merging B<=n same-(W, tier)
    # buckets above FUSED_AND_MAX into one bucket at the largest cap
    # keeps total kernel lanes ~equal while cutting the per-bucket
    # stage chains 4-5x. Back-to-back A/B (full_result.py protocol):
    # OFF 459.6k / ON 447.1k QPS — the padded lanes at the max cap eat
    # the thunk save, consistent with r4's finding that thunks inside
    # one fused program are cheap. Kept env-gated for re-tests after
    # the next kernel-structure change (crossover doctrine).
    import os as _os2

    merge_b = int(_os2.environ.get("DOCODO_MERGE_WIDE_B", "0"))
    if merge_b:
        groups: dict = {}
        for key in list(buckets):
            qcap, w, hb = key
            if (isinstance(qcap, int) and w == 2 and qcap >= 2048
                    and len(buckets[key]) <= merge_b):
                groups.setdefault((w, hb), []).append(key)
        for (w, hb), keys in groups.items():
            if len(keys) < 2:
                continue
            tkey = (max(k[0] for k in keys), w, hb)
            merged = []
            for k in keys:
                merged.extend(buckets.pop(k))
            buckets.setdefault(tkey, []).extend(merged)

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
