"""Pallas fused query kernel: bit-parity with the XLA path (interpret
mode — the compiled kernel runs on real TPU; see ops/pallas_query.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from docodo_tpu.ops import pallas_query as pq
from docodo_tpu.ops.device_index import locate_topk_masked
from docodo_tpu.ops.seqops import and_masked, pad_to


def _random_batch(rng, bsz, cap, ordered_rows):
    a = np.zeros((bsz, cap), np.int32)
    b = np.zeros((bsz, cap), np.int32)
    na = np.zeros(bsz, np.int32)
    nb = np.zeros(bsz, np.int32)
    for i in range(bsz):
        xa = np.cumsum(rng.integers(1, 30, size=rng.integers(0, cap)))
        xb = np.cumsum(rng.integers(1, 30, size=rng.integers(0, cap)))
        pa, la = pad_to(xa, cap)
        pb, lb = pad_to(xb, cap)
        a[i], na[i], b[i], nb[i] = pa, la, pb, lb
    ra = np.full(bsz, 25, np.int32)
    rb = np.full(bsz, 20, np.int32)
    ra[ordered_rows:] = -25
    rb[ordered_rows:] = -20
    return a, na, ra, b, nb, rb


@pytest.mark.parametrize("cap", [32, 64])
def test_pallas_matches_xla_path(rng, cap):
    bsz = 16
    a, na, ra, b, nb, rb = _random_batch(rng, bsz, cap, ordered_rows=8)
    bounds = np.arange(1, 24, dtype=np.int32) * 60
    pg, rk, ct = pq.pallas_batched_and_locate(
        jnp.asarray(a), jnp.asarray(na), jnp.asarray(ra),
        jnp.asarray(b), jnp.asarray(nb), jnp.asarray(rb),
        jnp.asarray(bounds), cap=cap, topk=8, interpret=True,
    )
    pg, rk, ct = np.asarray(pg), np.asarray(rk), np.asarray(ct)
    for i in range(bsz):
        vals, keep, _ = and_masked(
            jnp.asarray(a[i]), na[i], ra[i], jnp.asarray(b[i]), nb[i], rb[i]
        )
        p2, r2, c2 = locate_topk_masked(vals, keep, jnp.asarray(bounds), 8)
        np.testing.assert_array_equal(pg[i], np.asarray(p2), err_msg=f"q{i}")
        np.testing.assert_allclose(rk[i], np.asarray(r2), atol=1e-4)
        np.testing.assert_array_equal(ct[i], np.asarray(c2))


def test_pallas_empty_and_degenerate(rng):
    cap = 32
    a = np.full((8, cap), 2**31 - 1, np.int32)
    b = np.full((8, cap), 2**31 - 1, np.int32)
    na = np.zeros(8, np.int32)
    nb = np.zeros(8, np.int32)
    # row 1: only a has data; row 2: identical singleton (cross-dup)
    a[1, 0] = 5
    na[1] = 1
    a[2, 0] = 7
    b[2, 0] = 7
    na[2] = nb[2] = 1
    ra = np.full(8, 10, np.int32)
    rb = np.full(8, 10, np.int32)
    bounds = np.array([100], np.int32)
    pg, rk, ct = pq.pallas_batched_and_locate(
        jnp.asarray(a), jnp.asarray(na), jnp.asarray(ra),
        jnp.asarray(b), jnp.asarray(nb), jnp.asarray(rb),
        jnp.asarray(bounds), cap=cap, topk=4, interpret=True,
    )
    pg = np.asarray(pg)
    assert (pg[0] == -1).all()          # empty & empty
    assert (pg[1] == -1).all()          # a-only: no b in any group
    assert pg[2][0] == 0                # shared coordinate: both present


def test_multi_bucket_pallas_matches_xla(rng):
    """The use_pallas dispatch must return identical results to XLA."""
    from docodo_tpu.ops import device_index as di

    T = 50
    tids = rng.integers(0, T, 3000).astype(np.int32)
    coords = np.sort(rng.integers(0, 1 << 18, 3000)).astype(np.int32)
    st, sc, off = di.build_postings(tids, coords, T)
    bounds = jnp.asarray(np.arange(1, 90, dtype=np.int32) * 3000)
    pd = jnp.zeros(89, jnp.int32)
    t1 = jnp.asarray(rng.integers(0, T, (5, 1)).astype(np.int32))
    r1 = jnp.asarray(np.full((5, 1), 260, np.int32))
    t2 = jnp.asarray(rng.integers(0, T, (11, 2)).astype(np.int32))
    r2 = jnp.asarray(np.full((11, 2), 300, np.int32))
    args = (off, sc, bounds, pd, (t1, t2), (r1, r2), (64, 64), 8)
    xla = di.multi_bucket_query_step(*args, use_pallas=False)
    pls = di.multi_bucket_query_step(*args, use_pallas=True)
    for (p1, k1, c1), (p2, k2, c2) in zip(xla, pls):
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_multi_bucket_full_deferred_tail_matches_xla(rng):
    """multi_bucket_query_full with use_pallas=True defers every
    bucket's rank top-k + doc grouping into ONE shared tail over the
    concatenated buckets (PreFull path) — outputs must be bit-identical
    to the per-bucket XLA program across mixed bucket shapes (W=1, W=2,
    W=1 V=2 variants, ordered rows, per-bucket hit_cap tiers)."""
    from docodo_tpu.ops import device_index as di

    T = 50
    tids = rng.integers(0, T, 3000).astype(np.int32)
    coords = np.sort(rng.integers(0, 1 << 18, 3000)).astype(np.int32)
    st, sc, off = di.build_postings(tids, coords, T)
    n_pg = 89
    bounds = jnp.asarray(np.arange(1, n_pg + 1, dtype=np.int32) * 3000)
    pd = jnp.asarray((np.arange(n_pg) // 10).astype(np.int32))
    hdr = jnp.asarray(np.arange(n_pg) % 10 == 0)
    t1 = jnp.asarray(rng.integers(0, T, (5, 1)).astype(np.int32))
    r1 = jnp.asarray(np.full((5, 1), 260, np.int32))
    t2 = rng.integers(0, T, (11, 2)).astype(np.int32)
    r2 = np.full((11, 2), 300, np.int32)
    r2[5:] = -40  # ordered rows
    t3 = rng.integers(0, T, (6, 1, 2)).astype(np.int32)
    t3[2, 0, 1] = -1  # variant padding
    r3 = np.full((6, 1), 260, np.int32)
    terms = (t1, jnp.asarray(t2), jnp.asarray(t3))
    rs = (r1, jnp.asarray(r2), jnp.asarray(r3))
    args = (off, sc, bounds, pd, hdr, terms, rs, (64, 64, 64), 8,
            (128, 512, 128))
    xla = di.multi_bucket_query_full(*args, use_pallas=False)
    pls = di.multi_bucket_query_full(*args, use_pallas=True)
    for o1, o2 in zip(xla, pls):
        for f in LocateFullFields:
            a1, a2 = getattr(o1, f), getattr(o2, f)
            if f in ("ranks", "doc_ranks"):
                np.testing.assert_allclose(
                    np.asarray(a1), np.asarray(a2), atol=1e-4,
                    err_msg=f)
            else:
                np.testing.assert_array_equal(
                    np.asarray(a1), np.asarray(a2), err_msg=f)


LocateFullFields = ("pages", "ranks", "counts", "n_pages", "docs",
                    "doc_ranks", "hits", "n_hits")


def test_pallas_single_word_kernel(rng):
    """Merge-free W=1 kernel must equal the XLA locate pipeline."""
    cap = 64
    bsz = 16
    a = np.zeros((bsz, cap), np.int32)
    na = np.zeros(bsz, np.int32)
    for i in range(bsz):
        xa = np.cumsum(rng.integers(1, 40, size=rng.integers(0, cap)))
        a[i], na[i] = pad_to(xa, cap)
    bounds = np.arange(1, 20, dtype=np.int32) * 70
    pg, rk, ct = pq.pallas_batched_single_locate(
        jnp.asarray(a), jnp.asarray(na), jnp.asarray(bounds),
        cap=cap, topk=8, interpret=True,
    )
    pg, rk, ct = np.asarray(pg), np.asarray(rk), np.asarray(ct)
    for i in range(bsz):
        keep = jnp.arange(cap) < na[i]
        p2, r2, c2 = locate_topk_masked(
            jnp.asarray(a[i]), keep, jnp.asarray(bounds), 8
        )
        np.testing.assert_array_equal(pg[i], np.asarray(p2), err_msg=f"q{i}")
        np.testing.assert_allclose(rk[i], np.asarray(r2), atol=1e-4)
        np.testing.assert_array_equal(ct[i], np.asarray(c2))


@pytest.mark.parametrize("cap", [64, 128, 512])
def test_sorted_kernel_matches_xla_path(rng, cap):
    """The hybrid (lax.sort merge + scan-only Pallas locate) kernel must
    equal the XLA path bit for bit — including caps the in-kernel-merge
    kernel cannot reach, and in every page-stream mode (in-kernel
    compare-all, carried a_pg/b_pg, shared XLA lookup)."""
    bsz = 16
    a, na, ra, b, nb, rb = _random_batch(rng, bsz, cap, ordered_rows=8)
    bounds = np.arange(1, 24, dtype=np.int32) * 60
    pg, rk, ct = pq.pallas_sorted_and_locate(
        jnp.asarray(a), jnp.asarray(na), jnp.asarray(ra),
        jnp.asarray(b), jnp.asarray(nb), jnp.asarray(rb),
        jnp.asarray(bounds), cap=cap, topk=8, interpret=True,
    )
    pg, rk, ct = np.asarray(pg), np.asarray(rk), np.asarray(ct)
    # paged modes: carried streams (page index per fetched posting) and
    # the shared lookup — identical outputs
    def page_np(x):
        return np.minimum(
            np.searchsorted(bounds, x, side="right"), bounds.size - 1
        ).astype(np.int32)
    pgc, rkc, ctc = pq.pallas_sorted_and_locate(
        jnp.asarray(a), jnp.asarray(na), jnp.asarray(ra),
        jnp.asarray(b), jnp.asarray(nb), jnp.asarray(rb),
        jnp.asarray(bounds), cap=cap, topk=8, interpret=True,
        a_pg=jnp.asarray(page_np(a)), b_pg=jnp.asarray(page_np(b)),
    )
    pgs, rks, cts = pq.pallas_sorted_and_locate(
        jnp.asarray(a), jnp.asarray(na), jnp.asarray(ra),
        jnp.asarray(b), jnp.asarray(nb), jnp.asarray(rb),
        jnp.asarray(bounds), cap=cap, topk=8, interpret=True,
        shared_pg=True,
    )
    for got in ((pgc, rkc, ctc), (pgs, rks, cts)):
        np.testing.assert_array_equal(pg, np.asarray(got[0]))
        np.testing.assert_allclose(rk, np.asarray(got[1]), atol=1e-6)
        np.testing.assert_array_equal(ct, np.asarray(got[2]))
    for i in range(bsz):
        vals, keep, _ = and_masked(
            jnp.asarray(a[i]), na[i], ra[i], jnp.asarray(b[i]), nb[i], rb[i]
        )
        p2, r2, c2 = locate_topk_masked(vals, keep, jnp.asarray(bounds), 8)
        np.testing.assert_array_equal(pg[i], np.asarray(p2), err_msg=f"q{i}")
        np.testing.assert_allclose(rk[i], np.asarray(r2), atol=1e-4)
        np.testing.assert_array_equal(ct[i], np.asarray(c2))


def test_sorted_kernel_cross_operand_duplicates(rng):
    """Shared coordinates across operands must fold to one kept slot
    (ghost rule) identically to the XLA path."""
    cap = 64
    base = np.cumsum(rng.integers(1, 12, size=40))
    a_list = base[rng.random(40) < 0.8]
    b_list = base[rng.random(40) < 0.8]
    pa, la = pad_to(a_list, cap)
    pb, lb = pad_to(b_list, cap)
    bounds = np.arange(1, 24, dtype=np.int32) * 30
    for r1, r2 in ((25, 20), (-25, -20)):
        pg, rk, ct = pq.pallas_sorted_and_locate(
            jnp.asarray(pa)[None], jnp.asarray([la]),
            jnp.asarray([r1], np.int32),
            jnp.asarray(pb)[None], jnp.asarray([lb]),
            jnp.asarray([r2], np.int32),
            jnp.asarray(bounds), cap=cap, topk=8, interpret=True,
        )
        vals, keep, _ = and_masked(
            jnp.asarray(pa), la, np.int32(r1), jnp.asarray(pb), lb,
            np.int32(r2),
        )
        p2, r2_, c2 = locate_topk_masked(vals, keep, jnp.asarray(bounds), 8)
        np.testing.assert_array_equal(np.asarray(pg)[0], np.asarray(p2))
        np.testing.assert_allclose(np.asarray(rk)[0], np.asarray(r2_),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(ct)[0], np.asarray(c2))


def test_full_result_pallas_matches_xla(rng):
    """Full-result hybrid kernels (W=1 merge-free + W=2 sorted) must
    equal the XLA full path on every field: pages/ranks/counts,
    n_pages/n_hits totals, the compacted hit stream, and the device doc
    grouping."""
    from docodo_tpu.ops import device_index as di

    T = 50
    tids = rng.integers(0, T, 3000).astype(np.int32)
    coords = np.sort(rng.integers(0, 1 << 18, 3000)).astype(np.int32)
    st, sc, off = di.build_postings(tids, coords, T)
    n_pg = 89
    bounds = jnp.asarray(np.arange(1, n_pg + 1, dtype=np.int32) * 3000)
    pd = jnp.asarray((np.arange(n_pg) // 10).astype(np.int32))
    hdr = jnp.asarray(np.arange(n_pg) % 10 == 0)
    t1 = jnp.asarray(rng.integers(0, T, (5, 1)).astype(np.int32))
    r1 = jnp.asarray(np.full((5, 1), 260, np.int32))
    t2 = jnp.asarray(rng.integers(0, T, (11, 2)).astype(np.int32))
    r2 = np.full((11, 2), 300, np.int32)
    r2[5:] = -40  # ordered rows too
    r2 = jnp.asarray(r2)
    for (tq, rq), hit_cap in [((t1, r1), 128), ((t2, r2), 128),
                              ((t2, r2), 1024)]:
        xla = di.batched_query_full(
            off, sc, bounds, pd, hdr, tq, rq, cap=64, topk=8,
            hit_cap=hit_cap, use_pallas=False,
        )
        pls = di.batched_query_full(
            off, sc, bounds, pd, hdr, tq, rq, cap=64, topk=8,
            hit_cap=hit_cap, use_pallas=True,
        )
        np.testing.assert_array_equal(np.asarray(xla.pages),
                                      np.asarray(pls.pages))
        np.testing.assert_allclose(np.asarray(xla.ranks),
                                   np.asarray(pls.ranks), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(xla.counts),
                                      np.asarray(pls.counts))
        np.testing.assert_array_equal(np.asarray(xla.n_pages),
                                      np.asarray(pls.n_pages))
        np.testing.assert_array_equal(np.asarray(xla.n_hits),
                                      np.asarray(pls.n_hits))
        np.testing.assert_array_equal(np.asarray(xla.hits),
                                      np.asarray(pls.hits))
        np.testing.assert_array_equal(np.asarray(xla.docs),
                                      np.asarray(pls.docs))
        np.testing.assert_allclose(np.asarray(xla.doc_ranks),
                                   np.asarray(pls.doc_ranks), atol=1e-4)


def test_full_result_without_docs(rng):
    """with_docs=False must omit the doc fields (no readback bytes) and
    leave every other field untouched."""
    from docodo_tpu.ops import device_index as di

    T = 20
    tids = rng.integers(0, T, 500).astype(np.int32)
    coords = np.sort(rng.integers(0, 1 << 14, 500)).astype(np.int32)
    st, sc, off = di.build_postings(tids, coords, T)
    bounds = jnp.asarray(np.arange(1, 12, dtype=np.int32) * 1500)
    pd = jnp.zeros(11, jnp.int32)
    hdr = jnp.zeros(11, dtype=bool)
    tq = jnp.asarray(rng.integers(0, T, (8, 2)).astype(np.int32))
    rq = jnp.asarray(np.full((8, 2), 300, np.int32))
    full = di.batched_query_full(
        off, sc, bounds, pd, hdr, tq, rq, cap=64, topk=8, hit_cap=64,
        with_docs=True, use_pallas=False,
    )
    brief = di.batched_query_full(
        off, sc, bounds, pd, hdr, tq, rq, cap=64, topk=8, hit_cap=64,
        with_docs=False, use_pallas=False,
    )
    assert brief.docs is None and brief.doc_ranks is None
    np.testing.assert_array_equal(np.asarray(full.hits),
                                  np.asarray(brief.hits))
    np.testing.assert_array_equal(np.asarray(full.pages),
                                  np.asarray(brief.pages))


def test_full_result_variant_kernels_match_xla(rng):
    """The variant-OR full-result kernels (W=1 union + W=2 run-dedupe
    AND) must equal the XLA and_variants_sorted/or_variants_sorted path
    on every field — including cross-variant shared coordinates,
    ordered mode, W-padded rows, and -1-padded variant slots."""
    from docodo_tpu.ops import device_index as di

    T = 40
    # deliberately overlapping postings so variants share coordinates
    base = np.sort(rng.integers(0, 1 << 16, 4000)).astype(np.int32)
    tids = rng.integers(0, T, 4000).astype(np.int32)
    st, sc, off = di.build_postings(tids, base, T)
    n_pg = 30
    bounds = jnp.asarray(np.arange(1, n_pg + 1, dtype=np.int32) * 2200)
    pd = jnp.asarray((np.arange(n_pg) // 5).astype(np.int32))
    hdr = jnp.asarray(np.arange(n_pg) % 5 == 0)

    rng2 = np.random.default_rng(4)
    # W=1, V=3 unions (with some -1 variant padding)
    t1 = rng2.integers(0, T, (6, 1, 3)).astype(np.int32)
    t1[2, 0, 2] = -1
    t1[3, 0, 1:] = -1
    r1 = np.full((6, 1), 260, np.int32)
    # W=2, V=2 variant ANDs (ordered rows + W-padded row)
    t2 = rng2.integers(0, T, (10, 2, 2)).astype(np.int32)
    t2[3, 1, :] = -1           # W-padded: identity fold -> A's union
    t2[5, 0, 1] = -1
    r2 = np.full((10, 2), 300, np.int32)
    r2[6:] = -40
    for tq, rq in [(jnp.asarray(t1), jnp.asarray(r1)),
                   (jnp.asarray(t2), jnp.asarray(r2))]:
        xla = di.batched_query_full(
            off, sc, bounds, pd, hdr, tq, rq, cap=128, topk=8,
            hit_cap=512, use_pallas=False,
        )
        pls = di.batched_query_full(
            off, sc, bounds, pd, hdr, tq, rq, cap=128, topk=8,
            hit_cap=512, use_pallas=True,
        )
        np.testing.assert_array_equal(np.asarray(xla.pages),
                                      np.asarray(pls.pages))
        np.testing.assert_allclose(np.asarray(xla.ranks),
                                   np.asarray(pls.ranks), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(xla.n_pages),
                                      np.asarray(pls.n_pages))
        np.testing.assert_array_equal(np.asarray(xla.n_hits),
                                      np.asarray(pls.n_hits))
        np.testing.assert_array_equal(np.asarray(xla.hits),
                                      np.asarray(pls.hits))
        np.testing.assert_allclose(np.asarray(xla.doc_ranks),
                                   np.asarray(pls.doc_ranks), atol=1e-4)


def test_chunked_locate_matches_locate_core(rng):
    """The CHUNKED locate kernel (sequential grid + per-row carries,
    interpret mode) matches a NUMPY oracle of the full-result top-k
    contract on random masked streams — including page runs spanning
    several chunks, empty rows and single-hit-page rank ties.

    Contract (r4): pages/ranks/counts are the rank-ordered top-k of the
    FIRST `topk` page runs in slot order (exact for every SERVED row —
    n_pages <= topk means all runs participate; rows with more runs
    always re-serve host-side, n_pages stays exact full-width). The
    full-width index-bearing top_k this replaces paid a ~3.4 ms
    iota-payload sort at [5000, 2048]."""
    from docodo_tpu.ops import device_index as di
    from docodo_tpu.ops.pallas_query import pallas_chunked_locate
    from docodo_tpu.ops.seqops import INF32

    nprng = np.random.default_rng(23)
    B, n, chunk, topk = 11, 2048, 512, 16
    P = 41
    bounds = np.sort(
        nprng.choice(120_000, P, replace=False)).astype(np.int32)
    bounds[-1] = 120_000
    cases = []
    for density, hi in ((0.03, 120_000), (0.5, 120_000), (0.9, 2500)):
        vals = np.sort(
            nprng.integers(0, hi, size=(B, n)), axis=1).astype(np.int32)
        keep = nprng.random((B, n)) < density
        cases.append((vals, keep))
    vals, keep = cases[0][0].copy(), np.ones((B, n), bool)
    keep[0] = False  # empty row
    cases.append((vals, keep))
    bj = jnp.asarray(bounds)
    for vals, keep in cases:
        hv = jnp.asarray(np.where(keep, vals, np.int32(INF32)))

        def one(v, k):
            page, first, slot_rank, slot_count = (
                np.asarray(x) for x in di._locate_core(
                    jnp.asarray(v), jnp.asarray(k), bj)
            )
            starts = np.flatnonzero(first)[:topk]  # first-k runs
            order = np.argsort(-slot_rank[starts], kind="stable")
            tp = np.full(topk, -1, np.int32)
            tr = np.zeros(topk, np.float32)
            tc = np.zeros(topk, np.int32)
            m = starts.size
            tp[:m] = page[starts][order]
            tr[:m] = slot_rank[starts][order]
            tc[:m] = slot_count[starts][order].astype(np.int32)
            return tp, tr, tc, int(first.sum())

        ones = [one(v, k) for v, k in zip(vals, keep)]
        want = tuple(np.stack([o[i] for o in ones]) for i in range(4))
        for resident in (False, True):   # chunked grid / one-chunk
            got = pallas_chunked_locate(
                hv, bj, topk=topk, chunk=chunk, interpret=True,
                resident=resident)
            np.testing.assert_array_equal(np.asarray(want[0]),
                                          np.asarray(got[0]))
            np.testing.assert_allclose(np.asarray(want[1]),
                                       np.asarray(got[1]), atol=1e-5)
            np.testing.assert_array_equal(np.asarray(want[2]),
                                          np.asarray(got[2]))
            np.testing.assert_array_equal(np.asarray(want[3]),
                                          np.asarray(got[3]))


def test_chunked_bucket_routing_matches_xla(rng):
    """DOCODO_CHUNKED=force routes admissible XLA full-result buckets
    (n >= 2048, B >= 4) through the chunked locate; results equal the
    plain XLA program field-for-field."""
    import os

    from docodo_tpu.ops import device_index as di

    nprng = np.random.default_rng(31)
    T = 10
    counts = nprng.integers(600, 1000, size=T)
    # two SMALL terms so the banded-table chain has its cumulative base
    # (coverage = cum table + every band up to the cap) — queries below
    # only touch the big terms, so bucket shapes are unchanged
    counts[8], counts[9] = 40, 90
    tids = np.repeat(np.arange(T), counts).astype(np.int32)
    coords_np = np.sort(nprng.choice(
        500_000, size=int(counts.sum()), replace=False)).astype(np.int32)
    nprng.shuffle(tids)
    st, sc, off = di.build_postings(
        jnp.asarray(tids), jnp.asarray(coords_np), T)
    bounds = jnp.asarray(
        np.arange(3000, 503_000, 3000, dtype=np.int32))
    pd = jnp.zeros(bounds.shape[0], jnp.int32)
    hdr = jnp.zeros(bounds.shape[0], dtype=bool)
    tq = jnp.asarray(nprng.integers(0, T - 2, (8, 2)).astype(np.int32))
    rq = jnp.asarray(np.broadcast_to(
        np.where(np.arange(8)[:, None] % 2, 300, -300), (8, 2)
    ).astype(np.int32))
    kw = dict(cap=1024, topk=16, hit_cap=256, with_docs=True)
    xla = di.batched_query_full(
        off, sc, bounds, pd, hdr, tq, rq, use_pallas=False, **kw)
    pages_np = di.build_page_of(np.asarray(bounds), np.asarray(sc))
    page_arr = jnp.asarray(pages_np)
    tq1 = tq[:, :1]
    rq1 = rq[:, :1]
    kw1 = dict(cap=2048, topk=16, hit_cap=256, with_docs=True)
    xla1 = di.batched_query_full(
        off, sc, bounds, pd, hdr, tq1, rq1, use_pallas=False, **kw1)
    # combined coords||pages tables: with page_of they make the bucket
    # CARRIED, routing the equal-cap W2 bucket through the fused
    # merge+AND+locate kernel (2*1024 <= FUSED_AND_MAX) — the branch
    # the suite previously only covered kernel-level
    off_np = np.asarray(off).astype(np.int64)
    small_tabs = di.build_small_tables(off_np, np.asarray(sc),
                                       pages_np=pages_np)
    assert di._tab_serves(small_tabs, 1024), \
        "combined tables must cover cap 1024 for the fused leg"
    from docodo_tpu.ops.pallas_query import FUSED_AND_MAX
    assert 2 * 1024 <= FUSED_AND_MAX
    os.environ["DOCODO_CHUNKED"] = "force"
    try:
        chk = di.batched_query_full(
            off, sc, bounds, pd, hdr, tq, rq, use_pallas=True, **kw)
        # paged leg: the carried page stream replaces the shared
        # compare-all lookup in the chunked pipeline, bit-identically
        chkp = di.batched_query_full(
            off, sc, bounds, pd, hdr, tq, rq, use_pallas=True,
            page_of=page_arr, **kw)
        # carried fused leg (combined tables + page_of => fused kernel)
        chkf = di.batched_query_full(
            off, sc, bounds, pd, hdr, tq, rq, use_pallas=True,
            page_of=page_arr, small=small_tabs, **kw)
        # W=1 big-cap paged leg (gathered block IS the stream)
        chk1 = di.batched_query_full(
            off, sc, bounds, pd, hdr, tq1, rq1, use_pallas=True,
            page_of=page_arr, **kw1)
    finally:
        os.environ.pop("DOCODO_CHUNKED", None)
    for want, got in ((xla, chk), (xla, chkp), (xla, chkf), (xla1, chk1)):
        for name in ("pages", "counts", "n_pages", "n_hits", "hits",
                     "docs"):
            np.testing.assert_array_equal(
                np.asarray(getattr(want, name)),
                np.asarray(getattr(got, name)), err_msg=name)
        np.testing.assert_allclose(np.asarray(want.ranks),
                                   np.asarray(got.ranks), atol=1e-4)
        np.testing.assert_allclose(np.asarray(want.doc_ranks),
                                   np.asarray(got.doc_ranks), atol=1e-4)


def test_multiword_chunked_fold_matches_xla(rng):
    """The W>=3 carried fold (_chunked_and_full_multi: tagged-sort
    merge + chunked AND per fold step, carried page streams) equals the
    vmapped XLA eval_and_query + locate_full program field-for-field —
    W=3 and W=4, ordered and proximity rows, small and big caps, rows
    with empty results. This is the route PROFILE_WIDE_r05's ablation
    motivated (the XLA W>2 fold was 82% of the wide batch)."""
    import os

    from docodo_tpu.ops import device_index as di

    nprng = np.random.default_rng(77)
    T = 12
    counts = nprng.integers(200, 900, size=T)
    counts[10], counts[11] = 30, 70  # banded-table cumulative base
    tids = np.repeat(np.arange(T), counts).astype(np.int32)
    coords_np = np.sort(nprng.choice(
        400_000, size=int(counts.sum()), replace=False)).astype(np.int32)
    nprng.shuffle(tids)
    st, sc, off = di.build_postings(
        jnp.asarray(tids), jnp.asarray(coords_np), T)
    bounds = jnp.asarray(np.arange(3000, 403_000, 3000, dtype=np.int32))
    pd = jnp.asarray((np.arange(bounds.shape[0]) // 9).astype(np.int32))
    hdr = jnp.asarray(np.arange(bounds.shape[0]) % 9 == 0)
    pages_np = di.build_page_of(np.asarray(bounds), np.asarray(sc))
    page_arr = jnp.asarray(pages_np)
    off_np = np.asarray(off).astype(np.int64)
    small_tabs = di.build_small_tables(off_np, np.asarray(sc),
                                       pages_np=pages_np)
    assert di._tab_serves(small_tabs, 1024)
    for w, bsz in ((3, 9), (4, 6)):
        tq = jnp.asarray(
            nprng.integers(0, T - 2, (bsz, w)).astype(np.int32))
        # huge windows on half the rows (big kept groups), ordered
        # phrase windows on the rest (mostly-empty results)
        rv = np.where(np.arange(bsz)[:, None] % 2, 5000, -9)
        rq = jnp.asarray(np.broadcast_to(rv, (bsz, w)).astype(np.int32))
        kw = dict(cap=1024, topk=16, hit_cap=512, with_docs=True)
        xla = di.batched_query_full(
            off, sc, bounds, pd, hdr, tq, rq, use_pallas=False, **kw)
        os.environ["DOCODO_CHUNKED"] = "force"
        try:
            got = di.batched_query_full(
                off, sc, bounds, pd, hdr, tq, rq, use_pallas=True,
                page_of=page_arr, small=small_tabs, **kw)
        finally:
            os.environ.pop("DOCODO_CHUNKED", None)
        for name in ("pages", "counts", "n_pages", "n_hits", "hits",
                     "docs"):
            np.testing.assert_array_equal(
                np.asarray(getattr(xla, name)),
                np.asarray(getattr(got, name)), err_msg=f"W{w}:{name}")
        np.testing.assert_allclose(np.asarray(xla.ranks),
                                   np.asarray(got.ranks), atol=1e-4)
        np.testing.assert_allclose(np.asarray(xla.doc_ranks),
                                   np.asarray(got.doc_ranks), atol=1e-4)


def test_oversize_variants_chunked_matches_xla(rng):
    """W=2 V>1 buckets past the slots kernels' MAX_STREAM_WIDTH but
    within FUSED_AND_MAX route through the fused variants AND kernel
    (_chunked_variants_full, DOCODO_CHUNKED=force) — field-for-field
    equal to the XLA and_variants_sorted program, incl. cross-variant
    duplicate coords (multi-key words share coordinates), empty
    variants, padded word-B rows, ordered and proximity windows."""
    import os

    from docodo_tpu.ops import device_index as di
    from docodo_tpu.ops.pallas_query import MAX_STREAM_WIDTH

    nprng = np.random.default_rng(55)
    T = 16
    counts = nprng.integers(150, 500, size=T)
    counts[14], counts[15] = 25, 60  # banded-table cumulative base
    tids = np.repeat(np.arange(T), counts).astype(np.int32)
    coords_np = np.sort(nprng.choice(
        300_000, size=int(counts.sum()), replace=False)).astype(np.int32)
    nprng.shuffle(tids)
    st, sc, off = di.build_postings(
        jnp.asarray(tids), jnp.asarray(coords_np), T)
    bounds = jnp.asarray(np.arange(3000, 303_000, 3000, dtype=np.int32))
    pd = jnp.asarray((np.arange(bounds.shape[0]) // 8).astype(np.int32))
    hdr = jnp.asarray(np.arange(bounds.shape[0]) % 8 == 0)
    pages_np = di.build_page_of(np.asarray(bounds), np.asarray(sc))
    page_arr = jnp.asarray(pages_np)
    small_tabs = di.build_small_tables(
        np.asarray(off).astype(np.int64), np.asarray(sc),
        pages_np=pages_np)
    # cap must cover every term count (512 >= max 500): the carried
    # tables cannot serve truncated terms, and production caps are
    # pow2(max count) so they never truncate. The cap>=1024 shapes
    # push 2*v*cap past FUSED_AND_MAX onto the TWO-PASS chunked
    # variants AND (multi-chunk carries: 6 and 16 chunks).
    for v, bsz, cap in ((3, 8, 512), (4, 6, 512),
                        (3, 8, 1024), (4, 6, 2048)):
        assert 2 * v * cap > MAX_STREAM_WIDTH  # really oversize
        tq = nprng.integers(0, T - 2, (bsz, 2, v)).astype(np.int32)
        tq[0, 1, :] = -1          # word-B padded row (union identity)
        tq[1, 0, 1:] = -1         # single-variant word
        tq[2, 1, 0] = tq[2, 0, 0]  # shared term across words
        rv = np.where(np.arange(bsz)[:, None] % 2, 4000, -9)
        rq = jnp.asarray(np.broadcast_to(rv, (bsz, 2)).astype(np.int32))
        tqj = jnp.asarray(tq)
        kw = dict(cap=cap, topk=16, hit_cap=512, with_docs=True)
        xla = di.batched_query_full(
            off, sc, bounds, pd, hdr, tqj, rq, use_pallas=False, **kw)
        os.environ["DOCODO_CHUNKED"] = "force"
        try:
            got = di.batched_query_full(
                off, sc, bounds, pd, hdr, tqj, rq, use_pallas=True,
                page_of=page_arr, small=small_tabs, **kw)
        finally:
            os.environ.pop("DOCODO_CHUNKED", None)
        for name in ("pages", "counts", "n_pages", "n_hits", "hits",
                     "docs"):
            np.testing.assert_array_equal(
                np.asarray(getattr(xla, name)),
                np.asarray(getattr(got, name)), err_msg=f"V{v}:{name}")
        np.testing.assert_allclose(np.asarray(xla.ranks),
                                   np.asarray(got.ranks), atol=1e-4)
        np.testing.assert_allclose(np.asarray(xla.doc_ranks),
                                   np.asarray(got.doc_ranks), atol=1e-4)


def test_fused_and_matches_two_pass_chunked(rng):
    """The ONE-pass full-width AND kernel (pallas_fused_and, interpret
    mode) equals the two-pass chunked AND on random merged tagged
    streams — odd widths (lane padding), widths past the _PACK=2048
    packing bound of the resident kernels, ordered/unordered/r=0 rows,
    empty rows and cross-operand duplicate coordinates."""
    from docodo_tpu.ops.pallas_query import pallas_fused_and
    from docodo_tpu.ops.seqops import INF32

    def merged_stream(nprng, bsz, n):
        vals = np.full((bsz, n), INF32, np.int32)
        tag = np.full((bsz, n), 2, np.int32)
        for i in range(bsz):
            na = int(nprng.integers(0, n + 1))
            nb = n - na
            if i == 0:
                na, nb = 0, 0          # empty row
            if i == 1:
                na, nb = n, 0          # one-operand-only row
            pool = nprng.choice(
                np.arange(6 * n) * 3, size=max(na + nb, 1),
                replace=False)
            # force cross-operand duplicates on a third of the rows
            v = np.concatenate([
                np.sort(pool[:na]), np.sort(pool[:nb])
                if i % 3 == 0 and nb <= na else np.sort(pool[na:na + nb])
            ]).astype(np.int32)
            t = np.concatenate([
                np.zeros(na, np.int32), np.ones(nb, np.int32)])
            order = np.lexsort((t, v))
            vals[i, : na + nb] = v[order]
            tag[i, : na + nb] = t[order]
        ra = nprng.integers(-60, 61, (bsz, 1)).astype(np.int32)
        rb = nprng.integers(-60, 61, (bsz, 1)).astype(np.int32)
        ra[2], rb[2] = 0, 0            # no-gap-cut row
        ra[3], rb[3] = -30, -30        # ordered row
        return (jnp.asarray(vals), jnp.asarray(tag),
                jnp.asarray(ra), jnp.asarray(rb))

    nprng = np.random.default_rng(41)
    saved = pq.FUSED_AND_MAX
    try:
        for bsz, n in ((13, 600), (9, 1536), (7, 3072)):
            vals, tag, ra, rb = merged_stream(nprng, bsz, n)
            pq.FUSED_AND_MAX = 0       # force the two-pass oracle
            want = np.asarray(pq.pallas_chunked_and(
                vals, tag, ra, rb, interpret=True))
            pq.FUSED_AND_MAX = saved
            got = np.asarray(pallas_fused_and(
                vals, tag, ra, rb, interpret=True))
            # the two-pass path keeps its chunk padding; the fused one
            # crops to the input width — the padding tail is never kept
            assert got.shape == (bsz, n)
            assert (want[:, n:] == INF32).all()
            np.testing.assert_array_equal(
                want[:, :n], got,
                err_msg=f"fused AND diverges at [{bsz}, {n}]")
    finally:
        pq.FUSED_AND_MAX = saved


def test_bitonic_merge_matches_lax_sort(rng):
    """The bitonic two-stream merge kernel (interpret mode) equals the
    stable 3-operand lax.sort of the tagged concatenation on random
    ragged blocks — including empty operands, full operands, and
    cross-operand duplicate coordinates."""
    from docodo_tpu.ops.pallas_query import pallas_bitonic_merge
    from docodo_tpu.ops.seqops import INF32

    for cap in (64, 256):
        B = 12
        a = np.full((B, cap), INF32, np.int32)
        b = np.full((B, cap), INF32, np.int32)
        na = rng.integers(0, cap + 1, B).astype(np.int32)
        nb = rng.integers(0, cap + 1, B).astype(np.int32)
        na[0] = 0            # empty a
        nb[1] = 0            # empty b
        na[2] = nb[2] = cap  # both full
        pool = np.arange(0, 4 * cap) * 7
        for i in range(B):
            a[i, : na[i]] = np.sort(
                rng.choice(pool, na[i], replace=False))
            b[i, : nb[i]] = np.sort(
                rng.choice(pool, nb[i], replace=False))
        pga = np.where(a < INF32, a // 100, INF32).astype(np.int32)
        pgb = np.where(b < INF32, b // 100, INF32).astype(np.int32)
        v, t, p = pallas_bitonic_merge(
            jnp.asarray(a), jnp.asarray(na), jnp.asarray(b),
            jnp.asarray(nb), jnp.asarray(pga), jnp.asarray(pgb),
            cap=cap, interpret=True)
        lane = np.arange(cap)[None, :]
        av = np.where(lane < na[:, None], a, np.int32(INF32))
        bv = np.where(lane < nb[:, None], b, np.int32(INF32))
        tag = np.concatenate([
            np.where(lane < na[:, None], 0, 2),
            np.where(lane < nb[:, None], 1, 2),
        ], axis=1).astype(np.int32)
        vs, ts, ps = jax.vmap(
            lambda x, y, z: jax.lax.sort((x, y, z), num_keys=2)
        )(jnp.asarray(np.concatenate([av, bv], axis=1)),
          jnp.asarray(tag),
          jnp.asarray(np.concatenate([pga, pgb], axis=1)))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(vs))
        np.testing.assert_array_equal(np.asarray(t), np.asarray(ts))
        np.testing.assert_array_equal(np.asarray(p), np.asarray(ps))


def test_merge_and_locate_matches_three_stage(rng):
    """The fused merge+AND+locate kernel (pallas_merge_and_locate,
    interpret mode) is bit-identical to the three-stage pipeline it
    replaces — pallas_bitonic_merge -> pallas_chunked_and ->
    pallas_chunked_locate — on random ragged blocks with carried page
    streams, including empty operands, r<0 ordered rows, and
    cross-operand duplicates."""
    from docodo_tpu.ops.pallas_query import (
        locate_streams_topk,
        pallas_bitonic_merge,
        pallas_chunked_and,
        pallas_chunked_locate,
        pallas_merge_and_locate,
    )
    from docodo_tpu.ops.seqops import INF32

    for cap in (64, 256):
        B = 12
        bounds = np.concatenate([
            [0],
            np.sort(rng.choice(
                np.arange(1, 30 * cap), size=40, replace=False)),
        ]).astype(np.int32)
        a = np.full((B, cap), INF32, np.int32)
        b = np.full((B, cap), INF32, np.int32)
        na = rng.integers(0, cap + 1, B).astype(np.int32)
        nb = rng.integers(0, cap + 1, B).astype(np.int32)
        na[0] = 0
        nb[1] = 0
        na[2] = nb[2] = cap
        pool = np.arange(0, 8 * cap) * 3  # duplicates across operands
        for i in range(B):
            a[i, : na[i]] = np.sort(rng.choice(pool, na[i], replace=False))
            b[i, : nb[i]] = np.sort(rng.choice(pool, nb[i], replace=False))

        def pg_of(x):
            return np.where(
                x < INF32,
                np.maximum(
                    np.searchsorted(bounds, x, side="right") - 1, 0),
                INF32,
            ).astype(np.int32)

        apg, bpg = pg_of(a), pg_of(b)
        ra = rng.integers(1, 40, (B, 1)).astype(np.int32)
        rb = rng.integers(1, 40, (B, 1)).astype(np.int32)
        ra[3:5] = -ra[3:5]  # ordered rows
        rb[3:5] = -np.abs(rb[3:5])
        args = [jnp.asarray(x) for x in (a, na, b, nb, apg, bpg)]
        hv_f, ps, rs, cs = pallas_merge_and_locate(
            args[0], args[1], args[2], args[3], args[4], args[5],
            jnp.asarray(ra), jnp.asarray(rb), cap=cap, interpret=True)
        got = locate_streams_topk(ps, rs, cs, 16, B)
        v, t, p = pallas_bitonic_merge(
            args[0], args[1], args[2], args[3], args[4], args[5],
            cap=cap, interpret=True)
        hv_3 = pallas_chunked_and(
            v, t, jnp.asarray(ra), jnp.asarray(rb), interpret=True)
        want = pallas_chunked_locate(
            hv_3, jnp.asarray(bounds), topk=16, interpret=True, pg=p)
        np.testing.assert_array_equal(np.asarray(hv_f), np.asarray(hv_3))
        for g, w, name in zip(got, want,
                              ["pages", "ranks", "counts", "n_pages"]):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=name)


def test_merge_and_locate_topk_matches_external_tails(rng):
    """The in-kernel-tails fused kernel (pallas_merge_and_locate_topk:
    log-shift hit compaction + first-k-runs compaction + in-kernel
    counts) is bit-identical to pallas_merge_and_locate + the external
    tails it replaces (full-width hits lax.sort -> crop,
    locate_streams_topk, outside n_hits/n_pages sums) on random ragged
    blocks with carried pages, including empty operands, fully-kept
    rows, ordered (r<0) rows, cross-operand duplicates, rows with
    n_pages > topk and n_hits > hit_cap."""
    from docodo_tpu.ops.pallas_query import (
        locate_streams_topk,
        pallas_merge_and_locate,
        pallas_merge_and_locate_topk,
        streams_topk_tail,
    )
    from docodo_tpu.ops.seqops import INF32

    for cap, hit_cap in ((64, 128), (256, 64), (128, 2048)):
        B = 12
        topk = 4  # small so some rows exceed it (re-serve contract)
        bounds = np.concatenate([
            [0],
            np.sort(rng.choice(
                np.arange(1, 30 * cap), size=40, replace=False)),
        ]).astype(np.int32)
        a = np.full((B, cap), INF32, np.int32)
        b = np.full((B, cap), INF32, np.int32)
        na = rng.integers(0, cap + 1, B).astype(np.int32)
        nb = rng.integers(0, cap + 1, B).astype(np.int32)
        na[0] = 0
        nb[1] = 0
        na[2] = nb[2] = cap  # fully-kept candidates
        pool = np.arange(0, 8 * cap) * 3
        for i in range(B):
            a[i, : na[i]] = np.sort(rng.choice(pool, na[i], replace=False))
            b[i, : nb[i]] = np.sort(rng.choice(pool, nb[i], replace=False))
        # row 2: identical dense operands, huge window -> all kept
        dense = np.sort(rng.choice(pool, cap, replace=False))
        a[2] = b[2] = dense

        def pg_of(x):
            return np.where(
                x < INF32,
                np.maximum(
                    np.searchsorted(bounds, x, side="right") - 1, 0),
                INF32,
            ).astype(np.int32)

        apg, bpg = pg_of(a), pg_of(b)
        ra = rng.integers(1, 40, (B, 1)).astype(np.int32)
        rb = rng.integers(1, 40, (B, 1)).astype(np.int32)
        ra[2] = rb[2] = 10 * 24 * cap  # keep everything on row 2
        ra[3:5] = -ra[3:5]
        rb[3:5] = -np.abs(rb[3:5])
        args = [jnp.asarray(x) for x in (a, na, b, nb, apg, bpg)]
        hits_c, pg_c, rk_c, ct_c, npg, nht = pallas_merge_and_locate_topk(
            args[0], args[1], args[2], args[3], args[4], args[5],
            jnp.asarray(ra), jnp.asarray(rb), cap=cap,
            hit_cap=hit_cap, interpret=True)
        got = streams_topk_tail(pg_c, rk_c, ct_c, npg, topk, B)

        hv, ps, rs, cs = pallas_merge_and_locate(
            args[0], args[1], args[2], args[3], args[4], args[5],
            jnp.asarray(ra), jnp.asarray(rb), cap=cap, interpret=True)
        want = locate_streams_topk(ps, rs, cs, topk, B)
        for g, w, name in zip(got, want,
                              ["pages", "ranks", "counts", "n_pages"]):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=name)
        assert np.asarray(npg).max() > topk, "fixture must exceed topk"
        want_nht = np.sum(np.asarray(hv) < INF32, axis=1)
        np.testing.assert_array_equal(np.asarray(nht), want_nht)
        want_hits = np.asarray(jax.lax.sort(hv))[:, :hit_cap]
        got_hits = np.asarray(hits_c)[:, :hit_cap]
        width = min(hit_cap, got_hits.shape[1], want_hits.shape[1])
        np.testing.assert_array_equal(
            got_hits[:, :width], want_hits[:, :width])


def test_merge_and_locate_topk_escalated_topk(rng):
    """Escalated budgets (BatchExecutor ESC_TOPK=2048, topk_b =
    min(2048, qcap)) route W=2 equal-cap carried buckets through the
    fused kernel with topk > 128. The kernel must compact to
    min(topk, 2cap) runs and pad to topk — a hardcoded kpad=128 made
    streams_topk_tail's lax.top_k raise ('k must be no larger than
    size along axis') and the collector then failed the whole batch
    (ADVICE r4 high)."""
    from docodo_tpu.ops.pallas_query import (
        locate_streams_topk,
        pallas_merge_and_locate,
        pallas_merge_and_locate_topk,
        streams_topk_tail,
    )
    from docodo_tpu.ops.seqops import INF32

    cap, hit_cap, B = 256, 512, 6
    bounds = np.concatenate([
        [0],
        np.sort(rng.choice(np.arange(1, 30 * cap), 40, replace=False)),
    ]).astype(np.int32)
    pool = np.arange(0, 8 * cap) * 3
    a = np.full((B, cap), INF32, np.int32)
    b = np.full((B, cap), INF32, np.int32)
    na = rng.integers(cap // 2, cap + 1, B).astype(np.int32)
    nb = rng.integers(cap // 2, cap + 1, B).astype(np.int32)
    for i in range(B):
        a[i, : na[i]] = np.sort(rng.choice(pool, na[i], replace=False))
        b[i, : nb[i]] = np.sort(rng.choice(pool, nb[i], replace=False))

    def pg_of(x):
        return np.where(
            x < INF32,
            np.maximum(np.searchsorted(bounds, x, side="right") - 1, 0),
            INF32,
        ).astype(np.int32)

    apg, bpg = pg_of(a), pg_of(b)
    ra = np.full((B, 1), 3 * pool[-1], np.int32)  # keep everything
    rb = np.full((B, 1), 3 * pool[-1], np.int32)
    args = [jnp.asarray(x) for x in (a, na, b, nb, apg, bpg)]
    hv, ps, rs, cs = pallas_merge_and_locate(
        args[0], args[1], args[2], args[3], args[4], args[5],
        jnp.asarray(ra), jnp.asarray(rb), cap=cap, interpret=True)
    # topk > kernel width (2048 > 2cap=512) AND 128 < topk <= width
    for topk in (512, 2048):
        hits_c, pg_c, rk_c, ct_c, npg, nht = (
            pallas_merge_and_locate_topk(
                args[0], args[1], args[2], args[3], args[4], args[5],
                jnp.asarray(ra), jnp.asarray(rb), cap=cap,
                hit_cap=hit_cap, topk=topk, interpret=True))
        assert pg_c.shape[1] >= topk
        got = streams_topk_tail(pg_c, rk_c, ct_c, npg, topk, B)
        want = locate_streams_topk(ps, rs, cs, topk, B)
        for g, w, name in zip(got, want,
                              ["pages", "ranks", "counts", "n_pages"]):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=name)


def test_union2_merge_kernel_matches_unpaged_route(rng):
    """The V=2 carried union route (in-kernel bitonic merge + dedupe +
    locate, _union2_merge_locate_slots_kernel) equals the unpaged union
    route (vmapped lax.sort + kernel) on random variant blocks incl.
    cross-variant duplicate coords, empty variants, and n_pages > topk
    rows."""
    from docodo_tpu.ops.pallas_query import pallas_union_locate_full
    from docodo_tpu.ops.seqops import INF32

    cap, B, topk, hit_cap = 128, 16, 4, 64
    bounds_np = np.sort(
        rng.choice(np.arange(1, 20 * cap), 30, replace=False)
    ).astype(np.int32)
    a = np.full((B, 2, cap), INF32, np.int32)
    na = rng.integers(0, cap + 1, (B, 2)).astype(np.int32)
    na[0, 0] = 0
    na[1] = 0
    pool = np.arange(0, 6 * cap) * 2
    for i in range(B):
        for v in range(2):
            a[i, v, : na[i, v]] = np.sort(
                rng.choice(pool, na[i, v], replace=False))
    # force cross-variant duplicates on row 2
    na[2] = (cap, cap)
    shared = np.sort(rng.choice(pool, cap, replace=False))
    a[2, 0] = shared
    a[2, 1] = shared
    # page = #{bounds <= coord} clipped to P-1 (_shared_pg convention)
    pg = np.where(
        a < INF32,
        np.minimum(np.searchsorted(bounds_np, a, side="right"),
                   bounds_np.shape[0] - 1),
        INF32,
    ).astype(np.int32)
    bounds = jnp.asarray(bounds_np)
    got = pallas_union_locate_full(
        jnp.asarray(a), jnp.asarray(na), bounds, topk=topk,
        hit_cap=hit_cap, interpret=True, sort_topk=True,
        a_pg=jnp.asarray(pg))
    want = pallas_union_locate_full(
        jnp.asarray(a), jnp.asarray(na), bounds, topk=topk,
        hit_cap=hit_cap, interpret=True, sort_topk=True)
    names = ["pages", "ranks", "counts", "n_pages", "n_hits", "hits"]
    for g, w, name in zip(got, want, names):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(w), err_msg=name)


def test_resident_locate_fully_kept_max_width_run_count(rng):
    """Regression: a fully-kept FUSED_AND_MAX-wide stream in one page
    closes its single run with count EXACTLY 4096 — the packed
    (bonus,count) scan base must exceed it (the old base 4096 wrapped
    the final count to 0 and bumped the bonus by 1). Covers both the
    resident one-chunk kernel and the chunked kernel at a 4096 chunk."""
    from docodo_tpu.ops.pallas_query import pallas_chunked_locate

    B, n = 8, 4096
    # constant gap 6: every non-first kept slot earns bonus 30//6 = 5
    vals = (np.arange(n, dtype=np.int64) * 6 + 3).astype(np.int32)
    hv = jnp.asarray(np.broadcast_to(vals, (B, n)).copy())
    bounds = jnp.asarray(np.array([n * 6 + 10], dtype=np.int32))
    want_rank = 1.0 + 5.0 * (n - 1) + np.log(float(n))
    for resident in (True, False):
        pages, ranks, counts, n_pages = pallas_chunked_locate(
            hv, bounds, topk=4, chunk=4096, interpret=True,
            resident=resident)
        np.testing.assert_array_equal(
            np.asarray(n_pages), np.ones(B, np.int32),
            err_msg=f"resident={resident}")
        np.testing.assert_array_equal(
            np.asarray(counts)[:, 0], np.full(B, n, np.int32),
            err_msg=f"resident={resident}")
        np.testing.assert_allclose(
            np.asarray(ranks)[:, 0], want_rank, rtol=1e-5,
            err_msg=f"resident={resident}")
