"""Roofline accounting for the full-result query pipeline: per-bucket
measured time vs a LOWER-BOUND HBM traffic model, reported as achieved
GB/s against the v5e HBM peak — names the bound (bandwidth / compute /
dispatch) per bucket and for the whole 10k batch, so a "is another 2x
available?" question has an answer grounded in bytes, not vibes.

Traffic model (documented assumptions, all LOWER bounds):
  * every pipeline stage reads its inputs from HBM once and writes its
    outputs once; VMEM-resident fusion means fused stages contribute
    one read + one write for the whole group. XLA may spill more
    (multi-pass sorts), so ACHIEVED GB/s computed on this model is a
    lower bound — a bucket at >= 40% of peak on the lower bound is
    genuinely bandwidth-bound.
  * v5e HBM peak: 819 GB/s (public TPU v5e spec). VPU envelope used for
    the compute classification: ~4 Tops int32/f32 elementwise.
  * scan stages (AND, locate) execute ~(packed scans x log2(n)) vector
    ops per lane; the op estimate below counts them for the compute leg
    of the classification.

Usage:
    python benchmarks/roofline.py [--queries 10000] [--reps 10]
        [--out PROFILE_r05.json] [--platform cpu] [--ablate]
        [--mix standard|wide]

--ablate: INTRA-PROGRAM attribution. Isolated per-bucket dispatches hit
a ~2.8 ms per-PROGRAM floor over the tunnel, which r4's floor
adjustment could no longer resolve at sub-ms bucket costs
(PROFILE_r04: sum_adj 24.7 vs real batch 9.9 ms). Ablation re-times
the FUSED batch with one bucket GROUP removed (groups = route x cap
class, so the extra compiles stay bounded); marginal_ms = t_full -
t_without is each group's true share of the one fused program.
Marginals are subadditive (shared fetch/tail work re-overlaps), so the
sum is reported against t_full as a coverage check.

Writes the JSON artifact and prints a per-bucket table to stderr.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CORPUS = os.environ.get(
    "DOCODO_BENCH_CORPUS",
    "/root/reference/Test/Dickens Charles. The Pickwick Papers - royallib.ru.txt",
)
V5E_HBM_GBS = 819.0      # TPU v5e HBM bandwidth (public spec)
V5E_VPU_TOPS = 4.0       # rough VPU elementwise envelope, int32/f32
DISPATCH_US = 5.0        # per-launch dispatch floor estimate


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# lower-bound HBM bytes per bucket, by route (see module docstring)
# ---------------------------------------------------------------------------
def bucket_traffic(B: int, cap, w: int, v: int, topk: int, hit_cap: int,
                   carried: bool, route: str):
    """(bytes_lower_bound, scan_ops_estimate, launches_estimate)."""
    I4 = 4
    caps = cap if isinstance(cap, tuple) else (cap,) * w
    n = sum(caps) if w == 2 else caps[0] * max(v, 1)
    row = B * I4
    fetch = row * sum(caps) * max(v, 1) * (2 if carried else 1) * 2
    #        ^ read from tables/coords + write the gathered block(+pages)
    scan_ops = 0
    launches = 1
    if route == "fused_mal":
        # one kernel: reads gathered coords+pages, writes hv + 3 locate
        # streams; merge+AND+locate all VMEM-resident
        stream = row * n * (2 + 4)
        scan_ops = B * n * (math.log2(max(n, 2)) * 2 + 10 * math.log2(max(n, 2)))
        launches = 1
    elif route == "chunked":
        # bitonic merge (r 3n w 3n) + AND (fused: r 2n w n; two-pass
        # adds r n w n) + chunked locate (r 2n w 3n)
        and_extra = 0 if n <= 4096 else 2
        stream = row * n * (6 + 3 + and_extra + 5)
        scan_ops = B * n * (math.log2(max(n, 2)) * (3 + 4 + 10))
        launches = 3
    elif route == "chunked_variants":
        # r5 oversize variant route: one vmapped 3-op tagged sort over
        # the w*v*cap stream + fused variants-AND kernel + chunked locate
        n = w * max(v, 1) * caps[0]
        stream = row * n * (6 + 3 + 5)
        scan_ops = B * n * (math.log2(max(n, 2)) * (3 + 4 + 10))
        launches = 3
    elif route == "chunked_multi":
        # r5 W>=3 carried fold: (w-1) vmapped tagged sorts of the kept
        # stream + next word (each <= 2*cap wide) + fused AND + locate
        n = 2 * caps[0]
        stream = row * n * ((w - 1) * 6 + 3 + 5)
        scan_ops = B * n * ((w - 1) * math.log2(max(n, 2)) * 3
                            + math.log2(max(n, 2)) * 14)
        launches = w + 1
    elif route == "w1_chunked":
        # gathered block IS the stream: locate reads it + pages, writes 3
        stream = row * n * 5
        scan_ops = B * n * math.log2(max(n, 2)) * 10
        launches = 1
    elif route == "hybrid":
        # lax.sort merge (r 2-3n w 3n) + kernel (r 3n w 2n)
        stream = row * n * (6 + 5)
        scan_ops = B * n * math.log2(max(n, 2)) * 12
        launches = 2
    elif route == "w1_kernel":
        stream = row * n * 3
        scan_ops = B * n * math.log2(max(n, 2)) * 8
        launches = 1
    else:  # xla
        stream = row * n * 12
        scan_ops = B * n * math.log2(max(n, 2)) * 16
        launches = 8
    # hits compaction sort + crop, top-k tail, doc grouping
    tail = row * (n * 2 + min(hit_cap, n) + n) + row * topk * 4
    return fetch + stream + tail, scan_ops, launches


def classify(gbs: float, ops_ts: float, t_ms: float, launches: int):
    pct = gbs / V5E_HBM_GBS * 100
    if pct >= 40:
        return "bandwidth"
    if ops_ts >= 0.5 * V5E_VPU_TOPS:
        return "compute(VPU scans)"
    if t_ms * 1e3 <= launches * DISPATCH_US * 4:
        return "dispatch/latency"
    if ops_ts >= 0.15 * V5E_VPU_TOPS:
        return "compute-leaning (scan chains)"
    return "latency/underutilized"


def route_of(di_mod, pq_mod, B, cap, w, v, carried, backend):
    """Mirror _bucket_full's routing for the roofline labels (the real
    routing is exercised by the measurement itself; this only names the
    branch for the bytes model)."""
    caps = cap if isinstance(cap, tuple) else (cap,) * w
    n = sum(caps) if w == 2 else caps[0] * max(v, 1)
    if not isinstance(cap, tuple):
        if w == 2 and v == 1 and cap <= pq_mod.MAX_SORTED_PALLAS_CAP:
            return "hybrid"
        if w == 1 and v == 1 and cap <= pq_mod.W1_FULL_STREAM_MAX:
            return "w1_kernel"
        if w <= 2 and v > 1 and n <= pq_mod.MAX_STREAM_WIDTH:
            return "hybrid"
    chunk_ok = backend == "tpu" and B >= di_mod._chunk_min_b()
    if chunk_ok and w == 2 and v == 1 and sum(caps) >= 2048:
        if carried and caps[0] == caps[1] and 2 * caps[0] <= pq_mod.FUSED_AND_MAX:
            return "fused_mal"
        return "chunked"
    if (chunk_ok and w == 2 and v > 1 and carried
            and not isinstance(cap, tuple)):
        return "chunked_variants"       # r5 oversize variant kernel route
    if (chunk_ok and w >= 3 and v == 1 and carried
            and not isinstance(cap, tuple)):
        return "chunked_multi"          # r5 W>=3 carried fold route
    if chunk_ok and w == 1 and v == 1 and caps[0] >= 2048 and carried:
        return "w1_chunked"
    return "xla"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=os.environ.get("DOCODO_BENCH_PLATFORM"))
    ap.add_argument("--ablate", action="store_true",
                    help="fused-batch group ablation (see module doc)")
    ap.add_argument("--mix", choices=("standard", "wide"),
                    default="standard")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    log("devices:", jax.devices())
    backend = jax.default_backend()

    from benchmarks import common as bc
    from docodo_tpu.native import pipeline as npipe
    from docodo_tpu.ops import device_index as di
    from docodo_tpu.ops import pallas_query as pq

    with open(CORPUS, encoding="cp1251", errors="replace") as f:
        text = f.read()

    interner = npipe.make_interner()
    tids, coords = npipe.tokenize_intern(text, interner)
    terms_list = interner.terms()
    T = len(terms_list)
    st, sc, off = di.build_postings(
        jnp.asarray(tids), jnp.asarray(coords), T)
    order = np.lexsort((coords, tids))
    sc_host = coords[order]
    counts = np.bincount(tids, minlength=T)
    off_np = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(counts, out=off_np[1:])

    page_len = 3000
    n_pages = (len(text) + page_len - 1) // page_len
    bounds_host = np.minimum(
        np.arange(1, n_pages + 1, dtype=np.int64) * page_len, len(text))
    pages_np = di.build_page_of(bounds_host, sc_host)
    page_of = jnp.asarray(pages_np)
    small = di.build_small_tables(off_np, sc_host, pages_np=pages_np)
    bounds = jnp.asarray(bounds_host.astype(np.int32))
    page_doc = jnp.zeros(n_pages, dtype=jnp.int32)
    is_header = jnp.zeros(n_pages, dtype=bool)

    id_to_term = {i: w for i, w in enumerate(terms_list)}
    FULL_TOPK, HIT_CAP = 64, 1024
    if args.mix == "wide":
        terms, rs, _qid = bc.wide_mix(counts, id_to_term, args.queries)
        fterms, frs, fcaps, fhcaps = bc.full_buckets_wide(
            terms, rs, counts, HIT_CAP)
    else:
        terms, rs = bc.standard_mix(counts, id_to_term, args.queries)
        fterms, frs, fcaps, fhcaps = bc.full_buckets(
            terms, rs, counts, HIT_CAP)
    use_pallas = backend == "tpu"

    def time_buckets(sel):
        tsel = tuple(fterms[i] for i in sel)
        rsel = tuple(frs[i] for i in sel)
        csel = tuple(fcaps[i] for i in sel)
        hsel = tuple(fhcaps[i] for i in sel)

        def step(chain):
            return di.multi_bucket_query_full_chained(
                off, sc, bounds, page_doc, is_header, tsel, rsel, chain,
                csel, FULL_TOPK, hsel, use_pallas=use_pallas,
                small=small, page_of=page_of)

        outs, s = step(jnp.float32(0))
        warm = float(s)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            outs, s = step(s)
        final = float(s)
        dt = (time.perf_counter() - t0) / args.reps
        assert abs(final - warm) < 1e-3 * max(abs(final), 1.0)
        return dt

    # whole fused batch first
    t_full = time_buckets(range(len(fterms)))
    log(f"full batch: {t_full*1e3:.2f} ms "
        f"({args.queries / t_full:.0f} QPS)")

    def bucket_meta(i):
        tq = fterms[i]
        B, w = int(tq.shape[0]), int(tq.shape[1])
        v = int(tq.shape[2]) if tq.ndim == 3 else 1
        cap = fcaps[i]
        carried = (page_of is not None and not isinstance(cap, tuple)
                   and di._tab_serves(small, cap))
        route = route_of(di, pq, B, cap, w, v, carried, backend)
        return B, w, v, cap, carried, route

    if args.ablate:
        # INTRA-PROGRAM attribution: marginal cost of each route group
        # inside the ONE fused program (isolated dispatches ride the
        # ~2.8 ms per-program tunnel floor and can't see sub-ms buckets)
        from collections import defaultdict

        groups = defaultdict(list)
        for i in range(len(fterms)):
            _B, _w, _v, _cap, _carried, route = bucket_meta(i)
            groups[route].append(i)
        abl_rows = []
        for route, idxs in sorted(groups.items()):
            drop = set(idxs)
            keep = [i for i in range(len(fterms)) if i not in drop]
            # contemporaneous full-batch reference: the tunnel drifts
            # between ablations (r5 saw one window 30% slow, flipping a
            # marginal negative) — the full program is already compiled
            # so this re-measure is cheap and the drift cancels
            t_ref = time_buckets(range(len(fterms)))
            t_wo = time_buckets(keep) if keep else 0.0
            nq = sum(int(fterms[i].shape[0]) for i in idxs)
            marg_ms = (t_ref - t_wo) * 1e3
            abl_rows.append({
                "group": route,
                "buckets": [
                    f"cap={fcaps[i]} W={fterms[i].shape[1]} "
                    f"V={fterms[i].shape[2] if fterms[i].ndim == 3 else 1} "
                    f"B={fterms[i].shape[0]}" for i in idxs],
                "rows": nq,
                "t_full_ref_ms": round(t_ref * 1e3, 3),
                "t_without_ms": round(t_wo * 1e3, 3),
                "marginal_ms": round(marg_ms, 3),
                "marginal_us_per_row": round(marg_ms * 1e3 / max(nq, 1),
                                             3),
            })
            log(f"ablate {route:12s} ({len(idxs):2d} buckets, "
                f"{nq:5d} rows): ref {t_ref*1e3:7.3f} / without "
                f"{t_wo*1e3:7.3f} ms, marginal "
                f"{marg_ms:7.3f} ms ({marg_ms*1e3/max(nq,1):.2f} us/row)")
        abl_rows.sort(key=lambda r: -r["marginal_ms"])
        sum_marg = sum(r["marginal_ms"] for r in abl_rows)
        result = {
            "platform": backend,
            "mix": args.mix,
            "queries": args.queries,
            "full_batch_ms": round(t_full * 1e3, 3),
            "full_batch_qps": round(args.queries / t_full, 1),
            "mode": "ablation",
            "sum_of_marginals_ms": round(sum_marg, 3),
            "coverage_vs_full": round(sum_marg / (t_full * 1e3), 3),
            "ablation": abl_rows,
            "note": "marginal_ms = t(full fused batch) - t(batch with "
                    "the group's buckets removed); subadditive where "
                    "groups overlap shared work, so coverage < 1 means "
                    "overlap, > 1 means removal unblocked scheduling",
        }
        doc = json.dumps(result, indent=1)
        if args.out:
            with open(args.out, "w") as f:
                f.write(doc + "\n")
            log(f"wrote {args.out}")
        print(doc)
        return 0

    rows = []
    total_bytes = 0
    for i in range(len(fterms)):
        tq = fterms[i]
        B = int(tq.shape[0])
        w = int(tq.shape[1])
        v = int(tq.shape[2]) if tq.ndim == 3 else 1
        cap = fcaps[i]
        carried = (page_of is not None and not isinstance(cap, tuple)
                   and di._tab_serves(small, cap))
        route = route_of(di, pq, B, cap, w, v, carried, backend)
        t_b = time_buckets([i])
        nbytes, ops, launches = bucket_traffic(
            B, cap, w, v, FULL_TOPK, fhcaps[i], carried, route)
        total_bytes += nbytes
        gbs = nbytes / t_b / 1e9
        ops_ts = ops / t_b / 1e12
        bound = classify(gbs, ops_ts, t_b * 1e3, launches)
        rows.append({
            "bucket": f"cap={cap} W={w} V={v} B={B} hcap={fhcaps[i]}",
            "route": route, "t_ms": round(t_b * 1e3, 3),
            "bytes_mb": round(nbytes / 1e6, 2),
            "achieved_gbs": round(gbs, 1),
            "pct_hbm_peak": round(gbs / V5E_HBM_GBS * 100, 1),
            "scan_tops": round(ops_ts, 3),
            "bound": bound,
        })
        log(f"{rows[-1]['bucket']:42s} {route:10s} {t_b*1e3:7.3f} ms  "
            f"{nbytes/1e6:8.2f} MB  {gbs:6.1f} GB/s "
            f"({gbs/V5E_HBM_GBS*100:4.1f}% peak)  {bound}")

    # isolated per-bucket timings ride a per-PROGRAM dispatch floor
    # (measured ~3 ms over the axon tunnel regardless of bucket size;
    # the fused batch is ONE program and dodges it 29x). The cheapest
    # bucket is within noise of the pure floor; adjusted times subtract
    # it — their sum reproduces the fused batch time, which validates
    # the decomposition.
    floor_ms = min(r["t_ms"] for r in rows) if rows else 0.0
    for r in rows:
        adj = max(r["t_ms"] - floor_ms, 1e-3)
        r["t_ms_adj"] = round(adj, 3)
        gbs = r["bytes_mb"] * 1e6 / (adj * 1e-3) / 1e9
        r["achieved_gbs_adj"] = round(gbs, 1)
        r["pct_hbm_peak_adj"] = round(gbs / V5E_HBM_GBS * 100, 1)

    sum_t = sum(r["t_ms"] for r in rows)
    batch_gbs = total_bytes / t_full / 1e9
    result = {
        "platform": backend,
        "hbm_peak_gbs": V5E_HBM_GBS,
        "queries": args.queries,
        "full_batch_ms": round(t_full * 1e3, 3),
        "full_batch_qps": round(args.queries / t_full, 1),
        "dispatch_floor_ms": round(floor_ms, 3),
        "sum_of_buckets_ms": round(sum_t, 3),
        "sum_of_buckets_adj_ms": round(
            sum(r["t_ms_adj"] for r in rows), 3),
        "batch_bytes_mb_lower_bound": round(total_bytes / 1e6, 2),
        "batch_achieved_gbs": round(batch_gbs, 1),
        "batch_pct_hbm_peak": round(batch_gbs / V5E_HBM_GBS * 100, 1),
        "buckets": rows,
        "model": "lower-bound traffic (each stage reads inputs once, "
                 "writes outputs once; fused kernels one read+write "
                 "per group) — achieved GB/s is a lower bound",
    }
    doc = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(doc + "\n")
        log(f"wrote {args.out}")
    print(doc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
