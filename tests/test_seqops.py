"""Device posting algebra must match the host oracle exactly (on
strictly-ascending inputs, the device path's contract)."""

import numpy as np
import jax.numpy as jnp
import pytest

from docodo_tpu.core.postings import group_and, or_merge
from docodo_tpu.ops import seqops


def strict_ascending(rng, n, max_delta=50):
    deltas = rng.integers(1, max_delta, size=n, dtype=np.int64)
    return np.cumsum(deltas)


def run_and(a, b, r1, r2, cap=64):
    pa, na = seqops.pad_to(a, cap)
    pb, nb = seqops.pad_to(b, cap)
    out, n, r = seqops.device_and(
        pa, na, np.int32(r1), pb, nb, np.int32(r2)
    )
    return np.asarray(out)[: int(n)], int(r)


def run_or(a, b, r1, r2, cap=64):
    pa, na = seqops.pad_to(a, cap)
    pb, nb = seqops.pad_to(b, cap)
    out, n, r = seqops.device_or(
        pa, na, np.int32(r1), pb, nb, np.int32(r2)
    )
    return np.asarray(out)[: int(n)], int(r)


@pytest.mark.parametrize("ordered", [False, True])
def test_device_and_matches_host(rng, ordered):
    for _ in range(40):
        na, nb = rng.integers(0, 40, size=2)
        a = strict_ascending(rng, int(na))
        b = strict_ascending(rng, int(nb))
        r1 = int(rng.integers(0, 25))
        r2 = int(rng.integers(0, 25))
        if ordered:
            r1, r2 = -max(r1, 1), -max(r2, 1)
        want, wr = group_and(
            a.astype(np.uint64), b.astype(np.uint64), r1, r2
        )
        got, gr = run_and(a, b, r1, r2)
        assert gr == wr
        np.testing.assert_array_equal(got, want.astype(np.int64))


def test_device_or_matches_host(rng):
    for _ in range(40):
        na, nb = rng.integers(0, 40, size=2)
        a = strict_ascending(rng, int(na))
        b = strict_ascending(rng, int(nb))
        want, wr = or_merge(a.astype(np.uint64), b.astype(np.uint64), 3, -4)
        got, gr = run_or(a, b, 3, -4)
        assert gr == wr
        np.testing.assert_array_equal(got, want.astype(np.int64))


def test_batch_and_vmap(rng):
    B, cap = 8, 32
    pa = np.stack([seqops.pad_to(strict_ascending(rng, 20), cap)[0] for _ in range(B)])
    pb = np.stack([seqops.pad_to(strict_ascending(rng, 20), cap)[0] for _ in range(B)])
    na = np.full(B, 20, dtype=np.int32)
    r = np.full(B, 10, dtype=np.int32)
    out, n, rr = seqops.batch_and(pa, na, r, pb, na, r)
    assert out.shape == (B, 2 * cap)
    for q in range(B):
        want, _ = group_and(
            pa[q, :20].astype(np.uint64), pb[q, :20].astype(np.uint64), 10, 10
        )
        np.testing.assert_array_equal(
            np.asarray(out[q])[: int(n[q])], want.astype(np.int64)
        )


def test_device_locate_rank(rng):
    from docodo_tpu.query.search import ResultDocPage

    bounds = np.array([100, 250, 400, 900], dtype=np.int32)
    page_doc = np.array([0, 0, 1, 1], dtype=np.int32)
    coords = np.array([5, 8, 40, 120, 260, 270, 300], dtype=np.int32)
    cap = 16
    pc, n = seqops.pad_to(coords, cap)
    page, pos, first, rank = seqops.device_locate_rank(
        pc, n, bounds, page_doc, max_pages=cap
    )
    page = np.asarray(page)[:7]
    pos = np.asarray(pos)[:7]
    np.testing.assert_array_equal(page, [0, 0, 0, 1, 2, 2, 2])
    np.testing.assert_array_equal(pos, [5, 8, 40, 20, 10, 20, 50])
    # rank parity with the host formula
    host = ResultDocPage("1", [5, 8, 40])
    got = float(np.asarray(rank)[0])
    assert abs(got - host.rank) < 1e-4  # device rank is float32


@pytest.mark.parametrize("ordered", [False, True])
def test_device_and_cross_operand_collisions(rng, ordered):
    """Shared coordinates between operands stress the dup/ghost rule
    (a coordinate present in BOTH lists satisfies the group by itself)."""
    for _ in range(25):
        base = np.cumsum(rng.integers(1, 30, size=40, dtype=np.int64))
        sel_a = rng.random(40) < 0.7
        sel_b = rng.random(40) < 0.7
        a = base[sel_a]
        b = base[sel_b]  # heavy overlap with a
        if a.size == 0 or b.size == 0:
            continue
        r1 = int(rng.integers(1, 25))
        r2 = int(rng.integers(1, 25))
        if ordered:
            r1, r2 = -r1, -r2
        want, wr = group_and(a.astype(np.uint64), b.astype(np.uint64), r1, r2)
        got, gr = run_and(a, b, r1, r2)
        assert gr == wr
        np.testing.assert_array_equal(got, want.astype(np.int64))


def test_compare_all_formulation_matches(rng, monkeypatch):
    """The TPU compare-all rank/placement formulation (normally gated to
    TPU backends) must match the binary-search path bit for bit."""
    monkeypatch.setenv("DOCODO_COMPARE_ALL", "1")
    import jax

    jax.clear_caches()
    try:
        for _ in range(15):
            a = strict_ascending(rng, int(rng.integers(0, 40)))
            b = strict_ascending(rng, int(rng.integers(0, 40)))
            r1, r2 = int(rng.integers(1, 25)), int(rng.integers(1, 25))
            want, wr = group_and(a.astype(np.uint64), b.astype(np.uint64), r1, r2)
            got, gr = run_and(a, b, r1, r2)
            assert gr == wr
            np.testing.assert_array_equal(got, want.astype(np.int64))
    finally:
        monkeypatch.delenv("DOCODO_COMPARE_ALL", raising=False)
        jax.clear_caches()


def test_sort_merge_branch_matches_large_caps(rng, monkeypatch):
    """Large-cap TPU merges take a lax.sort of the tagged concatenation
    (> 2*_COMPARE_ALL_MAX); it must match the host oracle and the
    binary-search path bit for bit."""
    from docodo_tpu.core.postings import group_and, or_merge

    monkeypatch.setenv("DOCODO_COMPARE_ALL", "1")
    import jax

    jax.clear_caches()
    cap = seqops._COMPARE_ALL_MAX + 64  # 2*cap > 2*_COMPARE_ALL_MAX
    try:
        for ordered in (False, True):
            for _ in range(4):
                a = strict_ascending(rng, int(rng.integers(100, 900)))
                b = strict_ascending(rng, int(rng.integers(100, 900)))
                r1, r2 = int(rng.integers(1, 25)), int(rng.integers(1, 25))
                if ordered:
                    r1, r2 = -r1, -r2
                want, wr = group_and(
                    a.astype(np.uint64), b.astype(np.uint64), r1, r2
                )
                got, gr = run_and(a, b, r1, r2, cap=cap)
                assert gr == wr
                np.testing.assert_array_equal(got, want.astype(np.int64))
                wanto, _ = or_merge(
                    a.astype(np.uint64), b.astype(np.uint64),
                    abs(r1), abs(r2),
                )
                goto, _ = run_or(a, b, abs(r1), abs(r2), cap=cap)
                np.testing.assert_array_equal(goto, wanto.astype(np.int64))
    finally:
        monkeypatch.delenv("DOCODO_COMPARE_ALL", raising=False)
        jax.clear_caches()


def test_and_variants_sorted_multiway_duplicates(rng):
    """A coordinate present in SEVERAL variants of one word and in the
    other word must fold to ONE representative carrying both word tags
    (the host fold dedupes per word first, then pair-folds) — exercised
    against the host oracle composition or_merge + group_and."""
    from docodo_tpu.core.postings import group_and, or_merge

    for ordered in (False, True):
        for _ in range(10):
            base = np.cumsum(rng.integers(1, 9, size=60)).astype(np.int64)
            va = [base[rng.random(60) < p] for p in (0.7, 0.5)]
            vb = [base[rng.random(60) < p] for p in (0.6, 0.4)]
            r1, r2 = int(rng.integers(5, 30)), int(rng.integers(5, 30))
            if ordered:
                r1, r2 = -r1, -r2
            cap = 64
            sa = np.stack([seqops.pad_to(x, cap)[0] for x in va])
            na = np.array([min(x.size, cap) for x in va], np.int32)
            sb = np.stack([seqops.pad_to(x, cap)[0] for x in vb])
            nb = np.array([min(x.size, cap) for x in vb], np.int32)
            vals, keep, r = seqops.and_variants_sorted(
                jnp.asarray(sa), jnp.asarray(na), np.int32(r1),
                jnp.asarray(sb), jnp.asarray(nb), np.int32(r2),
            )
            got = np.asarray(vals)[np.asarray(keep)]
            # host oracle: per-word variant OR (dedupe), then group AND
            A, _ = or_merge(va[0].astype(np.uint64), va[1].astype(np.uint64),
                            abs(r1), abs(r1))
            B, _ = or_merge(vb[0].astype(np.uint64), vb[1].astype(np.uint64),
                            abs(r2), abs(r2))
            want, _ = group_and(A, B, r1, r2)
            np.testing.assert_array_equal(
                np.sort(got), want.astype(np.int64), err_msg=str(ordered)
            )
