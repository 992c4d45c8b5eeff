"""Wide-mix parity: the second recorded benchmark mix (W=3-4 phrases,
nested OR variant groups, wildcard-style unions, field rows — the
reference's own request surface, ref XUnitDocodoTest/IndexTest.cs:164-226)
must serve bit-identically across the XLA and Pallas dispatch and match
the host posting algebra (core/postings — the semantic oracle) on every
fully-served row."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import common as bc  # noqa: E402
from docodo_tpu.core.postings import group_and, or_merge  # noqa: E402
from docodo_tpu.ops import device_index as di  # noqa: E402

FIELDS = ("pages", "ranks", "counts", "n_pages", "docs", "doc_ranks",
          "hits", "n_hits")


@pytest.fixture(scope="module")
def corpus(rng_module):
    rng = rng_module
    T = 60
    n = 5000
    tids = rng.integers(0, T, n).astype(np.int32)
    coords = np.sort(rng.choice(1 << 17, size=n, replace=False)).astype(
        np.int32)
    counts = np.bincount(tids, minlength=T)
    order = np.lexsort((coords, tids))
    sc_host = coords[order]
    off_np = np.zeros(T + 1, np.int64)
    np.cumsum(counts, out=off_np[1:])
    st, sc, off = di.build_postings(tids, coords, T)
    n_pg = 44
    bounds_np = (np.arange(1, n_pg + 1) * 3000).astype(np.int32)
    return dict(T=T, counts=counts, sc_host=sc_host, off_np=off_np,
                sc=sc, off=off, bounds_np=bounds_np, n_pg=n_pg)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(123)


def _host_eval(cx, trow, rrow):
    """Host oracle for one wide row: per-word variant OR fold, then the
    proximity-AND left fold (ref Search.cs:501 expression semantics)."""
    acc, r_acc = None, 0
    for j in range(trow.shape[0]):
        vs = trow[j][trow[j] >= 0]
        if vs.size == 0:
            continue
        b = cx["sc_host"][
            cx["off_np"][vs[0]]: cx["off_np"][vs[0] + 1]
        ].astype(np.uint64)
        for vv in vs[1:]:
            nxt = cx["sc_host"][
                cx["off_np"][vv]: cx["off_np"][vv + 1]].astype(np.uint64)
            b, _ = or_merge(b, nxt, 1, 1)
        if acc is None:
            acc, r_acc = b, int(rrow[j])
        else:
            acc, r_acc = group_and(acc, b, r_acc, int(rrow[j]))
    return acc


def test_wide_mix_device_matches_host_and_pallas(corpus, rng_module):
    cx = corpus
    id_to_term = {i: f"word{i:03d}" for i in range(cx["T"])}
    terms, rs, qid = bc.wide_mix(cx["counts"], id_to_term, 35, seed=5)
    # every kind present: 35 logical queries -> 40 rows (5 field rows)
    assert terms.shape[0] == 40
    ft, fr, fc, fh = bc.full_buckets_wide(terms, rs, cx["counts"], 1024)
    ws = {t.shape[1] for t in ft}
    vs = {t.shape[2] if t.ndim == 3 else 1 for t in ft}
    # V buckets are pow2-rounded (production mirror): V=3 rows land in 4
    assert {3, 4} <= ws and {4, 8} <= vs, (ws, vs)

    bounds = jnp.asarray(cx["bounds_np"])
    pd = jnp.asarray((np.arange(cx["n_pg"]) // 7).astype(np.int32))
    hdr = jnp.asarray(np.arange(cx["n_pg"]) % 7 == 0)
    topk = 64
    args = (cx["off"], cx["sc"], bounds, pd, hdr, ft, fr, fc, topk, fh)
    xla = di.multi_bucket_query_full(*args, use_pallas=False)
    pls = di.multi_bucket_query_full(*args, use_pallas=True)
    for o1, o2 in zip(xla, pls):
        for f in FIELDS:
            a1, a2 = getattr(o1, f), getattr(o2, f)
            if f in ("ranks", "doc_ranks"):
                np.testing.assert_allclose(
                    np.asarray(a1), np.asarray(a2), atol=1e-4, err_msg=f)
            else:
                np.testing.assert_array_equal(
                    np.asarray(a1), np.asarray(a2), err_msg=f)

    # host-oracle leg: rebuild the bucket->row mapping and check every
    # fully-served row's hit stream + page count against the algebra
    buckets = {}
    for i in range(terms.shape[0]):
        valid = terms[i] >= 0
        w = int(valid.any(axis=1).sum()) or 1
        v = int(valid[:w].sum(axis=1).max()) or 1
        vp = 1  # production pow2-V rounding (full_buckets_wide mirrors)
        while vp < v:
            vp <<= 1
        v = vp
        need = int(cx["counts"][terms[i][valid]].max())
        per_word = [int(cx["counts"][terms[i, j][valid[j]]].sum())
                    for j in range(w)]
        c = 64
        while c < need:
            c <<= 1
        key = (c, w, v, bc.tier_of(min(per_word), 1024))
        buckets.setdefault(key, []).append(i)
    checked = 0
    for bi, (key, idxs) in enumerate(
            sorted(buckets.items(),
                   key=di._bucket_sort_key)):
        out = xla[bi]
        for row, i in enumerate(idxs):
            acc = _host_eval(cx, terms[i], rs[i])
            n_pages_host = np.unique(np.searchsorted(
                cx["bounds_np"], acc, side="right")).size
            assert int(out.n_hits[row]) == acc.size, (key, i)
            assert int(out.n_pages[row]) == n_pages_host, (key, i)
            hcap = int(out.hits.shape[1])
            if acc.size <= hcap and n_pages_host <= topk:
                got = np.asarray(out.hits[row][: acc.size])
                np.testing.assert_array_equal(
                    got, acc.astype(np.int64), err_msg=str((key, i)))
                checked += 1
    assert checked >= 30  # enough fully-served rows to mean something
