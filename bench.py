"""Headline benchmark: batched query throughput on the device index
built from the Pickwick corpus — measured in FULL-RESULT mode, the path
serving actually uses (exact hit positions + device doc ranks, ref
Search.cs:365-420: the reference's only result path carries positions,
so ours is benchmarked carrying them too). The page-level mode
(top-k pages/ranks/counts only, rounds 1-2's headline) is also measured
and logged to stderr for continuity.

Prints ONE JSON line:
  {"metric": "full_query_qps", "value": N, "unit": "qps", "vs_baseline": N}

vs_baseline: the reference (alexarchen/Docodo, C#) publishes no absolute
numbers and no .NET runtime exists in this image (see BASELINE.md), so
the baseline is the measured sequential host engine — the NumPy
implementation of the same query semantics (per-query proximity-AND +
locate + rank + per-page position extraction + doc rank), a faithful
stand-in for the reference's single-core per-query evaluation loop (ref
Docodo.NET/Search.cs:437-617, IndexSequence.cs:218-284).
vs_baseline = device full-result QPS / host full-result QPS.

Run on whatever jax.devices() provides (TPU under the driver; CPU works
too). Diagnostics go to stderr; stdout carries only the JSON line.
"""

import faulthandler
import json
import os
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

import numpy as np

CORPUS = os.environ.get(
    "DOCODO_BENCH_CORPUS",
    "/root/reference/Test/Dickens Charles. The Pickwick Papers - royallib.ru.txt",
)
N_QUERIES = int(os.environ.get("DOCODO_BENCH_QUERIES", "10000"))  # BASELINE.json: "10k concurrent mixed queries"
TOPK = 16
REPS = int(os.environ.get("DOCODO_BENCH_REPS", "10"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---- tunnel-fault hardening -------------------------------------------------
# The axon TPU tunnel suffers transient outages (FAILED_PRECONDITION /
# UNAVAILABLE at a readback; multi-hour init outages — see CLAUDE.md).
# Round 3's driver run died with rc=1 at the FIRST warm readback. Every
# device stage therefore runs under bounded retry-with-backoff, and a
# terminal fault emits a PARTIAL result JSON with "degraded": true
# instead of a non-zero exit.
_TRANSIENT_MARKERS = (
    "UNAVAILABLE", "FAILED_PRECONDITION", "DEADLINE_EXCEEDED",
    "ABORTED", "Unable to initialize backend", "Socket closed",
    "Connection reset", "transport is closing",
)
_RETRY_ATTEMPTS = int(os.environ.get("DOCODO_BENCH_RETRIES", "4"))
_RETRY_BASE_S = float(os.environ.get("DOCODO_BENCH_RETRY_BASE_S", "20"))


class TunnelLost(RuntimeError):
    """A device stage failed transiently and exhausted its retries."""


# milestones recorded as stages complete; the degraded-emission path
# reports whatever was measured before the tunnel disappeared
PARTIAL: dict = {}


def _is_transient(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    return any(m in s for m in _TRANSIENT_MARKERS)


def retry_device(fn, what: str):
    """Run one device stage; retry transient tunnel faults with
    exponential backoff (the stage re-warms and re-times itself, so a
    mid-loop fault never contaminates a timing). Non-transient errors
    propagate unchanged."""
    for k in range(_RETRY_ATTEMPTS):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — classified below
            if not _is_transient(e):
                raise
            if k == _RETRY_ATTEMPTS - 1:
                raise TunnelLost(f"{what}: {e}") from e
            wait = _RETRY_BASE_S * (2 ** k)
            log(f"transient device fault in {what} "
                f"(attempt {k + 1}/{_RETRY_ATTEMPTS}), retrying in "
                f"{wait:.0f}s: {str(e)[:200]}")
            time.sleep(wait)


def load_corpus() -> str:
    if os.path.exists(CORPUS):
        with open(CORPUS, encoding="cp1251", errors="replace") as f:
            return f.read()
    # fallback synthetic corpus (driver machines without the reference mount)
    rng = np.random.default_rng(0)
    words = [f"word{i:04d}" for i in range(4000)]
    return " ".join(rng.choice(words, size=300_000))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from docodo_tpu.lang.tokenizer import tokenize
    from docodo_tpu.ops import device_index as di
    from docodo_tpu.core.postings import group_and

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:  # the TPU plugin in this image force-sets jax_platforms;
        # honor an explicit override (e.g. cpu validation runs)
        jax.config.update("jax_platforms", plat)
    # probe the backend BEFORE any corpus work: a tunnel outage at init
    # is the cheapest place to discover it (and to wait it out)
    log("devices:", retry_device(jax.devices, "backend probe"))
    text = load_corpus()
    mb = len(text.encode("utf-8", "replace")) / 1e6

    # ---- host tokenize + term dict (native C++ one-pass, ~40 MB/s) -----
    from docodo_tpu.native import pipeline as npipe

    t0 = time.perf_counter()
    interner = npipe.make_interner()
    tids, coords = npipe.tokenize_intern(text, interner)
    terms_list = interner.terms()
    term_to_id = {w: i for i, w in enumerate(terms_list)}
    t_tok = time.perf_counter() - t0
    T = len(term_to_id)
    log(f"corpus {mb:.2f} MB, {tids.size} postings, {T} terms, "
        f"tokenize+intern {t_tok:.2f}s "
        f"({'native' if npipe.get_lib() is not None else 'python'})")

    # ---- device index build (reps chained; one closing readback) -------
    build = jax.jit(di.build_postings, static_argnames=("num_terms",))
    dt = jnp.asarray(tids)
    dc = jnp.asarray(coords)

    def _build_stage():
        st, sc, off = build(dt, dc, num_terms=T)  # compile + warm
        n_postings = int(off[-1])             # readback forces completion
        assert n_postings == tids.size
        t0 = time.perf_counter()
        chain = jnp.int32(0)
        for _ in range(REPS):
            st, sc, off = build(dt + chain, dc, num_terms=T)
            chain = (off[-1] * 0).astype(jnp.int32)
        assert int(off[-1]) == tids.size      # closes the chain
        return (time.perf_counter() - t0) / REPS, st, sc, off

    t_build, st, sc, off = retry_device(_build_stage, "device build")
    PARTIAL["build_mb_s_device"] = round(mb / t_build, 1)
    log(f"device build: {t_build*1e3:.1f} ms -> {mb / (t_build + t_tok):.1f} MB/s end-to-end, "
        f"{mb / t_build:.1f} MB/s device-only")

    # host mirror of the CSR (device->host transfers over the axon tunnel
    # stall intermittently; everything below derives from host data)
    order = np.lexsort((coords, tids))
    sc_host = coords[order]
    counts = np.bincount(tids, minlength=T)
    off_np = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(counts, out=off_np[1:])

    # page table must exist before the small tables: the combined
    # coords||page_of rows carry the precomputed page stream into the
    # kernels (no in-kernel compare-all locate)
    page_len = 3000
    n_pages_pre = (len(text) + page_len - 1) // page_len
    bounds_pre = np.minimum(
        np.arange(1, n_pages_pre + 1, dtype=np.int64) * page_len, len(text))
    pages_np = di.build_page_of(bounds_pre, sc_host)
    page_of = jnp.asarray(pages_np)

    # small-term posting tables: row-gather fetch for caps below the
    # block-DMA crossover (the cap-64 W2 bucket spent 6.9 of 8.8 ms in
    # the element gather; the row gather runs it in ~0.7 ms)
    small = di.build_small_tables(off_np, sc_host, pages_np=pages_np)
    log(f"small tables: "
        f"{[tuple(t.shape) for _, _, t in (small or ())]}")

    # ---- query set: mixed single/phrase/proximity over ALL terms -------
    # (term popularity follows the real corpus distribution: frequent
    # words get big posting lists, the bucketing keeps rare ones cheap)
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks import common as bc

    id_to_term = {v: k for k, v in term_to_id.items()}
    sc_np = sc_host
    W = 2
    terms, rs = bc.standard_mix(counts, id_to_term, N_QUERIES)

    # page table: 3000-char pages over the single doc (ref DataSources.cs:308)
    page_len = 3000
    n_pages = (len(text) + page_len - 1) // page_len
    bounds_host = np.minimum(
        np.arange(1, n_pages + 1) * page_len, len(text)
    ).astype(np.int32)
    _bounds = jnp.asarray(bounds_host)
    _page_doc = jnp.zeros(n_pages, dtype=jnp.int32)

    # bucket queries by (posting cap, word count): tight powers of two.
    # (Measured on TPU: a coarse mid-range ladder is 3x WORSE — the XLA
    # path's searchsorted gathers scale with the padded width, so
    # padding is not free there either.)
    def bucket_of(i):
        w = int((terms[i] >= 0).sum()) or 1
        need = int(counts[terms[i, :w]].max()) if w else 1
        c = 64
        while c < need:
            c <<= 1
        return (c, w)

    buckets = {}
    for i in range(N_QUERIES):
        buckets.setdefault(bucket_of(i), []).append(i)
    terms_t, rs_t, caps_t = [], [], []
    for (qcap, w), idxs in sorted(buckets.items()):
        terms_t.append(jnp.asarray(terms[idxs, :w]))
        rs_t.append(jnp.asarray(rs[idxs, :w]))
        caps_t.append(qcap)
    log(f"buckets: {[(c, t.shape) for c, t in zip(caps_t, terms_t)]}")
    terms_t, rs_t, caps_t = tuple(terms_t), tuple(rs_t), tuple(caps_t)

    # ALL buckets fused into one device program: one dispatch per batch.
    # Reps are chained through a ranks-checksum scalar so ONE final tiny
    # readback bounds the wall time of all executions even where
    # block_until_ready is unreliable (remote-tunnel device).
    # Pallas default ON for TPU: the hybrid lax.sort+scan-kernel W2 path
    # + merge-free W1 kernel measure 379k vs 339k QPS for pure XLA on
    # this bench (round 2); DOCODO_PALLAS=0/1 overrides.
    env_pallas = os.environ.get("DOCODO_PALLAS")
    if env_pallas is not None:
        use_pallas = env_pallas == "1"
    else:
        use_pallas = jax.default_backend() == "tpu"
    log(f"pallas kernels for small buckets: {use_pallas}")

    def step(chain):
        return di.multi_bucket_query_step_chained(
            off, sc, _bounds, _page_doc, terms_t, rs_t, chain, caps_t, TOPK,
            use_pallas=use_pallas, small=small, page_of=page_of,
        )

    def _page_stage():
        outs, s = step(jnp.float32(0))  # compile + warm
        warm = float(s)                 # forces completion (readback)
        t0 = time.perf_counter()
        for _ in range(REPS):
            outs, s = step(s)
        final = float(s)  # single readback closes the dependency chain
        t_query = (time.perf_counter() - t0) / REPS
        assert abs(final - warm) < 1e-3 * max(abs(final), 1.0)
        return t_query, warm

    t_query, warm_checksum = retry_device(_page_stage, "page-level query stage")
    log(f"warm checksum: {warm_checksum:.1f}")
    qps = N_QUERIES / t_query
    PARTIAL["page_qps"] = round(qps, 1)
    log(f"device batch: {N_QUERIES} queries in {t_query*1e3:.1f} ms -> {qps:.0f} QPS, "
        f"p50-equiv latency {t_query / N_QUERIES * 1e6:.1f} us/query")

    # ---- host sequential baseline (reference per-query loop analog) ----
    # best-of-3 chunks: the STRONGEST host measurement is the baseline,
    # so vs_baseline is conservative under machine-load noise
    bounds_np = bounds_host
    n_base = min(256, N_QUERIES)

    def host_chunk():
        t0 = time.perf_counter()
        for i in range(n_base):
            acc = sc_np[off_np[terms[i, 0]]: off_np[terms[i, 0] + 1]].astype(np.uint64)
            r_acc = int(rs[i, 0])
            for j in range(1, W):
                t = terms[i, j]
                if t < 0:
                    continue
                b = sc_np[off_np[t]: off_np[t + 1]].astype(np.uint64)
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
                k = min(TOPK, rank.size)
                np.argpartition(-rank, k - 1)[:k]
        return (time.perf_counter() - t0) / n_base

    t_host = min(host_chunk() for _ in range(3))
    host_qps = 1.0 / t_host
    log(f"host sequential page-level baseline (best of 3): {host_qps:.0f} QPS "
        f"(page-level vs_baseline {qps / host_qps:.1f})")

    # ---- FULL-RESULT leg: the serving path (positions + doc ranks) -----
    # same mix re-bucketed by (cap, W, hit tier), evaluated through
    # multi_bucket_query_full_chained (topk=64, tiered hit buffers)
    FULL_TOPK = 64
    HIT_CAP = 1024
    fterms, frs, fcaps, fhcaps = bc.full_buckets(terms, rs, counts,
                                                 HIT_CAP)
    _is_header = jnp.zeros(n_pages, dtype=bool)

    def fstep(chain):
        return di.multi_bucket_query_full_chained(
            off, sc, _bounds, _page_doc, _is_header, fterms, frs, chain,
            fcaps, FULL_TOPK, fhcaps, use_pallas=use_pallas, small=small,
            page_of=page_of,
        )

    def _full_stage():
        fouts, fs = fstep(jnp.float32(0))
        fwarm = float(fs)
        t0 = time.perf_counter()
        for _ in range(REPS):
            fouts, fs = fstep(fs)
        ffinal = float(fs)
        t_full = (time.perf_counter() - t0) / REPS
        assert abs(ffinal - fwarm) < 1e-3 * max(abs(ffinal), 1.0)
        return t_full, fwarm

    t_full, fwarm = retry_device(_full_stage, "full-result query stage")
    log(f"full-result warm checksum: {fwarm:.1f}")
    full_qps = N_QUERIES / t_full
    PARTIAL["full_qps"] = round(full_qps, 1)
    log(f"device FULL-RESULT batch: {N_QUERIES} queries in "
        f"{t_full*1e3:.1f} ms -> {full_qps:.0f} QPS "
        f"({t_full / N_QUERIES * 1e6:.1f} us/query)")

    # host full-result baseline: the shared reference-analog loop
    # (benchmarks/common.py — ONE copy across both benchmarks)
    host_full_qps = bc.host_full_baseline(
        terms, rs, sc_np, off_np, bounds_np, FULL_TOPK, n_base
    )
    log(f"host sequential full-result baseline (best of 3): "
        f"{host_full_qps:.0f} QPS")

    # ---- WIDE-MIX leg: the reference's full request surface ------------
    # (ref XUnitDocodoTest/IndexTest.cs:164-226) — 3-4-word phrases,
    # nested OR variant groups, wildcard-style unions, field rows; the
    # standard mix (W<=2, V=1) is kept above for cross-round continuity
    wterms, wrs, wqid = bc.wide_mix(counts, id_to_term, N_QUERIES)
    wt_t, wr_t, wcaps, whcaps = bc.full_buckets_wide(
        wterms, wrs, counts, HIT_CAP
    )
    log(f"wide buckets: "
        f"{[(c, tuple(t.shape)) for c, t in zip(wcaps, wt_t)]}")

    def wstep(chain):
        return di.multi_bucket_query_full_chained(
            off, sc, _bounds, _page_doc, _is_header, wt_t, wr_t, chain,
            wcaps, FULL_TOPK, whcaps, use_pallas=use_pallas, small=small,
            page_of=page_of,
        )

    def _wide_stage():
        wouts, ws = wstep(jnp.float32(0))
        wwarm = float(ws)
        t0 = time.perf_counter()
        for _ in range(REPS):
            wouts, ws = wstep(ws)
        wfinal = float(ws)
        t_w = (time.perf_counter() - t0) / REPS
        assert abs(wfinal - wwarm) < 1e-3 * max(abs(wfinal), 1.0)
        return t_w, wwarm

    t_wide, wwarm = retry_device(_wide_stage, "wide-mix query stage")
    log(f"wide-mix warm checksum: {wwarm:.1f}")
    wide_qps = N_QUERIES / t_wide  # logical queries (field rows extra)
    PARTIAL["wide_qps"] = round(wide_qps, 1)
    log(f"device WIDE-MIX batch: {N_QUERIES} queries "
        f"({wterms.shape[0]} rows) in {t_wide*1e3:.1f} ms -> "
        f"{wide_qps:.0f} QPS")

    host_wide_qps = bc.host_wide_baseline(
        wterms, wrs, wqid, sc_np, off_np, bounds_np, FULL_TOPK,
        min(128, N_QUERIES)
    )
    log(f"host sequential wide-mix baseline (best of 3): "
        f"{host_wide_qps:.0f} QPS")
    PARTIAL["wide_vs_baseline"] = round(wide_qps / host_wide_qps, 2)

    print(json.dumps({
        "metric": "full_query_qps",
        "value": round(full_qps, 1),
        "unit": "qps",
        "vs_baseline": round(full_qps / host_full_qps, 2),
        "wide_qps": round(wide_qps, 1),
        "wide_vs_baseline": round(wide_qps / host_wide_qps, 2),
        "wide_checksum": round(wwarm, 1),
    }))


if __name__ == "__main__":
    try:
        main()
    except TunnelLost as e:
        # the device disappeared mid-run and outlived every retry:
        # report what WAS measured as a degraded partial result — the
        # driver records parsed JSON either way (round 3's rc=1 run
        # recorded nothing despite a healthy engine)
        log("DEGRADED RUN (device lost):", e)
        print(json.dumps({
            "metric": "full_query_qps",
            "value": PARTIAL.get("full_qps"),
            "unit": "qps",
            "vs_baseline": PARTIAL.get("vs_baseline"),
            "degraded": True,
            "partial": PARTIAL,
            "reason": str(e)[:300],
        }))
