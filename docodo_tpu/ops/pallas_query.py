"""Pallas TPU kernel: fully-fused proximity-AND query evaluation.

One kernel program evaluates Q=8 queries (the TPU sublane) at once —
the entire hot path of ref Docodo.NET/IndexSequence.cs:218-284 +
Search.cs:365-420 in VMEM: merge, group segmentation, page locate,
rank, top-k — one HBM read of the posting blocks, topk-sized HBM
writes. The XLA path (ops/device_index.py) materializes [B, 2cap]
intermediates in HBM between fused regions; here nothing intermediate
leaves VMEM.

TPU-shaped building blocks (no dynamic gathers, no scatters, no sorts):

* merge ranks by COMPARE-ALL: rank of a[i] = i + #{j: b[j] < a[i]} — an
  O(cap^2) broadcast-compare + row-sum, which the VPU eats for the
  small-cap buckets this kernel serves (cap <= 128 covers most real
  query terms; bigger buckets stay on the XLA path);
* placement by ONE-HOT REDUCTION: merged[k] = sum_i a[i] * (ra[i]==k);
* shifted neighbors via roll; prefix sums via log-step doubling scans;
* every "value at an earlier index" is a MONOTONE quantity here (prefix
  sums at segment starts/ends, previous kept value), so it propagates by
  a running max / reverse running min — the same gather-free scan
  formulation as the XLA path (ops/seqops.py), NOT O(n^2) one-hot
  value-at-index reductions (the round-1 kernel's bottleneck);
* top-k by iterative masked argmax (topk passes).

The kernel is numerically IDENTICAL to the XLA path (tests compare both
on random posting lists, ordered and unordered).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from docodo_tpu.ops.seqops import INF32, select_slots, topk_nonneg

Q = 32  # default queries per kernel program (4 sublane tiles)


def q_for_cap(cap: int) -> int:
    """Queries per program, VMEM-bounded: the two [Q, cap, 2cap] int32
    merge one-hots dominate — keep their sum <= ~8 MB (measured safe at
    cap 128 / Q 32). cap 64 -> 64 queries/program, cap 128 -> 32."""

    def onehot_bytes(q: int) -> int:
        return 2 * q * cap * (2 * cap) * 4

    q = 8
    while q < 64 and onehot_bytes(q * 2) <= 8 * 1024 * 1024 + 1:
        q <<= 1
    return q


# cap 128 stays the routing limit: cap 256 fits VMEM at Q=8 but measured
# NEUTRAL on the 10k bench (343.6k vs 346.8k QPS) — the shrunken grid
# (8 queries/program) trades launch overhead for no compute win
MAX_PALLAS_CAP = 128


# Packing base for fusing two small non-negative monotone integer
# streams into one int32 scan: both components must stay < _PACK.
# Stream widths the resident kernels admit are <= 1024 lanes, so lane
# indices, segment counts, and run counts all fit; the packed value is
# bounded by (max_lane + max_bonus_sum) * _PACK + 1024 < 2^31.
_PACK = 2048


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _roll(x, shift):
    """Circular shift along the last axis via the native TPU lane
    rotation (jnp.roll lowers to unaligned-lane concats Mosaic rejects)."""
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[-1]
    return pltpu.roll(x, shift % n, axis=x.ndim - 1)


def _shift_right_fill(x, fill):
    """[Q, n] shifted one lane right along axis -1, first lane = fill."""
    n = x.shape[-1]
    rolled = _roll(x, 1)
    lane = _iota(x.shape, 1)
    return jnp.where(lane == 0, fill, rolled)


def _cummax(x):
    """Inclusive running max along the last axis (log-step doubling)."""
    n = x.shape[-1]
    lane = _iota(x.shape, 1)
    s = 1
    while s < n:
        shifted = _roll(x, s)
        shifted = jnp.where(lane >= s, shifted, x.dtype.type(-(2 ** 31)))
        x = jnp.maximum(x, shifted)
        s <<= 1
    return x


def _rev_cummin(x, big):
    """Inclusive running min from the right along the last axis."""
    n = x.shape[-1]
    lane = _iota(x.shape, 1)
    s = 1
    while s < n:
        shifted = _roll(x, -s)
        shifted = jnp.where(lane < n - s, shifted, big)
        x = jnp.minimum(x, shifted)
        s <<= 1
    return x


def _cumsum(x):
    """Inclusive prefix sum along the last axis (log-step doubling —
    jnp.cumsum has no Mosaic lowering)."""
    n = x.shape[-1]
    lane = _iota(x.shape, 1)
    s = 1
    while s < n:
        shifted = _roll(x, s)
        shifted = jnp.where(lane >= s, shifted, x.dtype.type(0))
        x = x + shifted
        s <<= 1
    return x


def _and_locate_kernel(a_ref, na_ref, ra_ref, b_ref, nb_ref, rb_ref,
                       bounds_ref, pages_ref, ranks_ref, counts_ref,
                       *, cap: int, topk: int):
    n = 2 * cap
    q = a_ref.shape[0]
    lane_c = _iota((q, cap), 1)
    lane = _iota((q, n), 1)

    na = na_ref[:, 0][:, None]            # [Q, 1]
    nb = nb_ref[:, 0][:, None]
    r1 = ra_ref[:, 0][:, None]
    r2 = rb_ref[:, 0][:, None]
    abs_r = jnp.maximum(jnp.abs(r1), jnp.abs(r2))
    ordered = jnp.logical_and(r1 < 0, r2 < 0)  # [Q, 1]

    av = jnp.where(lane_c < na, a_ref[...], INF32)
    bv = jnp.where(lane_c < nb, b_ref[...], INF32)

    # merge ranks: compare-all [Q, cap, cap], a before b on ties
    lt = bv[:, None, :] < av[:, :, None]       # b[j] <  a[i]
    ra = lane_c + jnp.sum(lt, axis=2)
    le = av[:, None, :] <= bv[:, :, None]      # a[j] <= b[i]
    rb = lane_c + jnp.sum(le, axis=2)

    # place values/tags at merged ranks: one-hot reductions [Q, cap, n]
    lane_qcn = _iota((q, cap, n), 2)
    oh_a = ra[:, :, None] == lane_qcn
    oh_b = rb[:, :, None] == lane_qcn
    # NB: Mosaic cannot reshape 2D bool vectors to 3D — expand masks as
    # int32 and use arithmetic selects
    ia3 = (lane_c < na).astype(jnp.int32)[:, :, None]
    ib3 = (lane_c < nb).astype(jnp.int32)[:, :, None]
    vals = (
        jnp.sum(jnp.where(oh_a, av[:, :, None], 0), axis=1)
        + jnp.sum(jnp.where(oh_b, bv[:, :, None], 0), axis=1)
    )
    placed = (jnp.sum(oh_a, axis=1) + jnp.sum(oh_b, axis=1))
    vals = jnp.where(placed > 0, vals, INF32)
    isa = jnp.sum(jnp.where(oh_a, ia3, 0), axis=1) > 0
    isb = jnp.sum(jnp.where(oh_b, ib3, 0), axis=1) > 0
    valid = vals < INF32

    # cross-operand duplicates merge onto the first; second is ghost
    prev_vals = _shift_right_fill(vals, np.int32(-1))
    nxt_vals = _roll(vals, -1)
    nxt_vals = jnp.where(lane == n - 1, INF32, nxt_vals)
    dup_prev = jnp.logical_and(vals == prev_vals, valid)
    dup_next = jnp.logical_and(vals == nxt_vals, valid)
    # roll on bool vectors breaks Mosaic — roll int32 and re-compare
    isa_next = _roll(isa.astype(jnp.int32), -1) > 0
    isb_next = _roll(isb.astype(jnp.int32), -1) > 0
    isa2 = jnp.logical_and(
        jnp.logical_or(isa, jnp.logical_and(dup_next, isa_next)), ~dup_prev
    )
    isb2 = jnp.logical_and(
        jnp.logical_or(isb, jnp.logical_and(dup_next, isb_next)), ~dup_prev
    )
    keep = _segment_and_k(
        vals, isa2, isb2, dup_prev, valid, ra_ref, rb_ref, lane, n
    )

    _locate_rank_topk(
        vals, keep, lane, n, bounds_ref, pages_ref, ranks_ref, counts_ref,
        topk=topk,
    )


def _single_word_kernel(a_ref, na_ref, loc_ref, pages_ref, ranks_ref,
                        counts_ref, *, cap: int, topk: int,
                        paged: bool = False):
    """W=1 fast path: no merge/segmentation at all — a single word's
    posting block IS the result stream (the AND fold is empty), so only
    the locate/rank/top-k tail runs (ref Search.cs:365-420)."""
    q = a_ref.shape[0]
    lane = _iota((q, cap), 1)
    na = na_ref[:, 0][:, None]
    keep = lane < na
    vals = jnp.where(keep, a_ref[...], INF32)
    _locate_rank_topk(
        vals, keep, lane, cap, None if paged else loc_ref, pages_ref,
        ranks_ref, counts_ref, topk=topk,
        page=loc_ref[...] if paged else None,
    )


def _single_word_full_kernel(a_ref, na_ref, loc_ref, pages_ref,
                             ranks_ref, counts_ref, npages_ref,
                             *, cap: int, topk: int, paged: bool = False):
    """FULL-RESULT W=1 kernel: the posting block IS the (already
    compacted) hit stream, so only n_pages needs the kernel — hits and
    n_hits come straight from the gathered block and its length."""
    q = a_ref.shape[0]
    lane = _iota((q, cap), 1)
    na = na_ref[:, 0][:, None]
    keep = lane < na
    vals = jnp.where(keep, a_ref[...], INF32)
    _locate_rank_topk(
        vals, keep, lane, cap, None if paged else loc_ref, pages_ref,
        ranks_ref, counts_ref, topk=topk, npages_ref=npages_ref,
        page=loc_ref[...] if paged else None,
    )


def _locate_rank_core(vals, keep, lane, n, bounds_ref, page=None):
    """Coords+mask -> (page, first, slot_rank, slot_count) per slot.

    page = #bounds <= val (right bisect) by compare-all — unless a
    precomputed per-slot `page` stream is given (the PAGED kernels:
    page_of[coord] is staged once per index generation and carried
    through the posting fetch + merge sort, because this compare-all
    measured ~65% of the dominant kernel's time at P=578 pages)."""
    if page is None:
        nb_pages = bounds_ref.shape[-1]
        cmp = bounds_ref[0, :][None, None, :] <= vals[:, :, None]
        page = jnp.sum(cmp, axis=2).astype(jnp.int32)
        page = jnp.minimum(page, nb_pages - 1)

    # page runs over kept slots: vals (and thus page) are non-decreasing
    # over kept slots, so the previous kept value/page is a shifted
    # running max of the masked stream (ops/device_index._locate_core)
    prev_val = _shift_right_fill(
        _cummax(jnp.where(keep, vals, -1)), np.int32(-1)
    )
    prev_page = _shift_right_fill(
        _cummax(jnp.where(keep, page, -1)), np.int32(-1)
    )
    has_prev = prev_val >= 0
    first = jnp.logical_and(keep, page != prev_page)
    gap = jnp.where(has_prev, vals - prev_val, 0)
    bonus = jnp.where(
        jnp.logical_and(keep, ~first), 30 // jnp.maximum(5, gap), 0
    )

    # prefix value at each run's terminal slot = reverse running min
    # over terminals; prefix before the run = shifted prefix. Bonus and
    # count prefixes are PACKED into one int32 cumsum (bonus*_PACK +
    # keep; per-slot bonus <= 6, run counts <= n <= 1024 < _PACK, both
    # non-decreasing) — exact integer run totals, one scan pair for two
    bigi = jnp.int32(np.iinfo(np.int32).max)
    terminal_p = _roll(first.astype(jnp.int32), -1) > 0
    terminal_p = jnp.logical_or(terminal_p, lane == n - 1)
    cbc = _cumsum(bonus * _PACK + keep.astype(jnp.int32))
    cbc_end = _rev_cummin(jnp.where(terminal_p, cbc, bigi), bigi)
    cbc_prev = _shift_right_fill(cbc, np.int32(0))
    run_bonus = cbc_end // _PACK - cbc // _PACK  # first slot's bonus is 0
    run_count = (cbc_end % _PACK - cbc_prev % _PACK).astype(jnp.float32)
    slot_rank = jnp.where(
        first,
        1.0 + run_bonus.astype(jnp.float32)
        + jnp.log(jnp.maximum(run_count, 1.0)),
        0.0,
    )
    slot_count = jnp.where(first, run_count, 0.0)
    return page, first, slot_rank, slot_count


def _locate_rank_topk(vals, keep, lane, n, bounds_ref, pages_ref,
                      ranks_ref, counts_ref, *, topk: int,
                      npages_ref=None, page=None):
    """Shared result tail: coords+mask -> per-page runs -> rank -> topk.

    With `npages_ref`, also writes the UNtruncated page-run count (the
    full-result truncation flag)."""
    page, first, slot_rank, slot_count = _locate_rank_core(
        vals, keep, lane, n, bounds_ref, page=page
    )
    if npages_ref is not None:
        npages_ref[:, 0] = jnp.sum(first.astype(jnp.int32), axis=-1)

    # ---- top-k by iterative masked argmax (per row) --------------------
    remaining = slot_rank
    for k in range(topk):
        m = jnp.max(remaining, axis=-1, keepdims=True)       # [Q, 1]
        is_m = jnp.logical_and(remaining == m, m > 0)
        pick = jnp.min(jnp.where(is_m, lane, n), axis=-1, keepdims=True)
        hit = jnp.logical_and(lane == pick, m > 0)
        pages_ref[:, k] = (
            jnp.sum(jnp.where(hit, page, 0), axis=-1)
            + jnp.where(m[:, 0] > 0, 0, -1)
        )
        ranks_ref[:, k] = jnp.where(m[:, 0] > 0, m[:, 0], 0.0)
        counts_ref[:, k] = jnp.sum(
            jnp.where(hit, slot_count, 0.0), axis=-1
        ).astype(jnp.int32)
        remaining = jnp.where(lane == pick, 0.0, remaining)


def _segment_and_k(vals, isa2, isb2, ghost, valid, ra_ref, rb_ref,
                   lane, n, pack: int = _PACK):
    """Gap segmentation + ordered cut + per-segment both-operands
    containment over a merged tagged stream whose representative tags
    (isa2/isb2) and ghosts are already folded. Pure log-depth scans —
    the kernel twin of ops/seqops._segment_and.

    The a/b prefix sums (and the scans over them) are PACKED into one
    int32 stream (cum_a + pack*cum_b, both <= n < pack; pack defaults
    to _PACK=2048 for the <=1024-lane resident kernels, 1<<15 for the
    fused AND's <=4096-lane streams): both
    components are non-decreasing, so the packed stream is too, and
    every running max / reverse running min commutes with the packing —
    one scan replaces two (exact integer arithmetic throughout)."""
    r1 = ra_ref[:, 0][:, None]
    r2 = rb_ref[:, 0][:, None]
    abs_r = jnp.maximum(jnp.abs(r1), jnp.abs(r2))
    ordered = jnp.logical_and(r1 < 0, r2 < 0)

    prev_vals = _shift_right_fill(vals, np.int32(-1))
    # gap segmentation (ref IndexSequence.cs:218-284 group semantics)
    gap_prev = vals - jnp.where(lane == 0, 0, prev_vals)
    gap_cut = jnp.logical_and(abs_r != 0, gap_prev > abs_r)
    seg_start = jnp.logical_or(lane == 0, jnp.logical_and(gap_cut, valid))

    isa_i = isa2.astype(jnp.int32)
    cum_ab = _cumsum(isa_i + pack * isb2.astype(jnp.int32))
    cum_a = cum_ab % pack
    before = cum_a - isa_i
    # (start_idx, before_at_start) packed: lane strictly increases, so
    # the running max of lane*_PACK + before picks the LATEST segment
    # start's pair regardless of `before`'s own ordering
    k_sb = _cummax(jnp.where(seg_start, lane * pack + before, -1))
    start_idx = k_sb // pack
    before_at_start = k_sb % pack
    ordered_cut = jnp.logical_and(
        jnp.logical_and(isa2, (before - before_at_start) == 0),
        lane != start_idx,
    )
    seg_start = jnp.logical_or(
        seg_start, jnp.logical_and(ordered, ordered_cut)
    )

    bigi = jnp.int32(np.iinfo(np.int32).max)
    terminal = _roll(seg_start.astype(jnp.int32), -1) > 0
    terminal = jnp.logical_or(terminal, lane == n - 1)
    prev_cum_ab = _shift_right_fill(cum_ab, np.int32(0))
    before_start = _cummax(jnp.where(seg_start, prev_cum_ab, -1))
    end_ab = _rev_cummin(jnp.where(terminal, cum_ab, bigi), bigi)
    has_a = (end_ab % pack - before_start % pack) > 0
    has_b = (end_ab // pack - before_start // pack) > 0
    return jnp.logical_and(
        jnp.logical_and(has_a, has_b), jnp.logical_and(valid, ~ghost)
    )


def _sorted_and_keep(vals, tag, ra_ref, rb_ref, lane, n,
                     pack: int = _PACK):
    """Shared AND body over a PRE-MERGED tagged stream (tag: 0 = a,
    1 = b, 2 = padding): dup/ghost folding, gap segmentation, the
    ordered cut, per-segment containment. Pure log-depth scans.
    Returns the keep mask (ref IndexSequence.cs:218-284)."""
    valid = vals < INF32
    isa = jnp.logical_and(tag == 0, valid)
    isb = jnp.logical_and(tag == 1, valid)

    # cross-operand duplicates merge onto the first; second is ghost
    prev_vals = _shift_right_fill(vals, np.int32(-1))
    nxt_vals = _roll(vals, -1)
    nxt_vals = jnp.where(lane == n - 1, INF32, nxt_vals)
    dup_prev = jnp.logical_and(vals == prev_vals, valid)
    dup_next = jnp.logical_and(vals == nxt_vals, valid)
    isa_next = _roll(isa.astype(jnp.int32), -1) > 0
    isb_next = _roll(isb.astype(jnp.int32), -1) > 0
    isa2 = jnp.logical_and(
        jnp.logical_or(isa, jnp.logical_and(dup_next, isa_next)), ~dup_prev
    )
    isb2 = jnp.logical_and(
        jnp.logical_or(isb, jnp.logical_and(dup_next, isb_next)), ~dup_prev
    )
    return _segment_and_k(
        vals, isa2, isb2, dup_prev, valid, ra_ref, rb_ref, lane, n,
        pack=pack,
    )


def _span_contains_k(marks, starts, terminals, lane):
    """Kernel twin of ops/seqops._span_contains: whether each slot's
    enclosing [start..terminal] span contains a marked slot — prefix
    sum + running max at starts + reverse running min at terminals."""
    bigi = jnp.int32(np.iinfo(np.int32).max)
    cum = _cumsum(marks.astype(jnp.int32))
    prev = _shift_right_fill(cum, np.int32(0))
    before = _cummax(jnp.where(starts, prev, -1))
    end = _rev_cummin(jnp.where(terminals, cum, bigi), bigi)
    return (end - before) > 0


def _span_contains2_k(marks0, marks1, starts, terminals, lane,
                      pack: int = _PACK):
    """Two _span_contains_k queries sharing starts/terminals, PACKED
    into one scan set (both prefix sums non-decreasing and < pack —
    _PACK=2048 for the <=1024-lane resident kernels, 1<<15 for the
    fused <=4096-lane variants AND)."""
    bigi = jnp.int32(np.iinfo(np.int32).max)
    cum = _cumsum(marks0.astype(jnp.int32) + pack * marks1.astype(jnp.int32))
    prev = _shift_right_fill(cum, np.int32(0))
    before = _cummax(jnp.where(starts, prev, -1))
    end = _rev_cummin(jnp.where(terminals, cum, bigi), bigi)
    # lane 0 is always a span start, so `before` >= 0 everywhere
    return (
        (end % pack - before % pack) > 0,
        (end // pack - before // pack) > 0,
    )


def _variants_and_keep(vals, tag, ra_ref, rb_ref, bpad_ref, lane, n,
                       pack: int = _PACK):
    """Keep mask for a PRE-MERGED stream of MANY variant substreams of
    two words (tag 0 = word A variants, 1 = B, 2 = padding): run-dedupe
    folds every equal-coordinate run (length up to Va+Vb) onto its
    first slot carrying the union of word tags, then the shared AND
    segmentation — the kernel twin of ops/seqops.and_variants_sorted.
    bpad_ref[:, 0] > 0 marks rows whose word-B slot is query padding:
    the AND is the identity and the result is word A's deduped union.
    `pack` sizes the packed scans (1<<15 for the fused <=4096-lane
    form, _PACK for the <=1024-lane slots kernels)."""
    valid = vals < INF32
    is0 = jnp.logical_and(tag == 0, valid)
    is1 = jnp.logical_and(tag == 1, valid)

    prev_vals = _shift_right_fill(vals, np.int32(-1))
    run_start = jnp.logical_and(valid, vals != prev_vals)
    nxt_rs = _roll(run_start.astype(jnp.int32), -1) > 0
    nxt_valid = _roll(valid.astype(jnp.int32), -1) > 0
    terminal = jnp.logical_or(nxt_rs, ~nxt_valid)
    terminal = jnp.logical_or(terminal, lane == n - 1)
    span0, span1 = _span_contains2_k(is0, is1, run_start, terminal,
                                     lane, pack=pack)
    isa = jnp.logical_and(run_start, span0)
    isb = jnp.logical_and(run_start, span1)
    ghost = jnp.logical_and(valid, ~run_start)
    keep = _segment_and_k(
        vals, isa, isb, ghost, valid, ra_ref, rb_ref, lane, n,
        pack=pack,
    )
    # Mosaic landmine (r5): a broadcast select over i1 vectors fails to
    # compile on real TPU ("Unsupported target bitwidth for
    # truncation") — like the i1-rotate, run boolean selects in i32.
    # (Never hit before r5: W=2 variant buckets wide enough to matter
    # exceed MAX_STREAM_WIDTH and ride XLA; the wide bench's small-cap
    # variant shapes are the first to compile this kernel for real.)
    b_pad = bpad_ref[:, 0][:, None] > 0
    union_only = jnp.logical_and(run_start, valid).astype(jnp.int32)
    return jnp.where(b_pad, union_only, keep.astype(jnp.int32)) > 0


def _sorted_and_locate_kernel(vals_ref, tag_ref, ra_ref, rb_ref,
                              loc_ref, pages_ref, ranks_ref, counts_ref,
                              *, cap: int, topk: int,
                              paged: bool = False):
    """AND locate over a PRE-MERGED tagged stream: the [Q, 2cap] merge
    arrives already sorted (one vmapped lax.sort outside the kernel —
    the TPU's native sort replaces the O(cap^2) in-kernel compare-all
    merge and its VMEM-bounding one-hots), so this kernel is pure
    log-depth scans feeding the shared locate/rank/top-k tail."""
    n = 2 * cap
    q = vals_ref.shape[0]
    lane = _iota((q, n), 1)
    vals = vals_ref[...]
    keep = _sorted_and_keep(vals, tag_ref[...], ra_ref, rb_ref, lane, n)
    _locate_rank_topk(
        vals, keep, lane, n, None if paged else loc_ref, pages_ref,
        ranks_ref, counts_ref, topk=topk,
        page=loc_ref[...] if paged else None,
    )


def _sorted_and_locate_full_kernel(vals_ref, tag_ref, ra_ref, rb_ref,
                                   loc_ref, pages_ref, ranks_ref,
                                   counts_ref, npages_ref, nhits_ref,
                                   hits_ref, *, cap: int, topk: int,
                                   paged: bool = False):
    """FULL-RESULT twin of _sorted_and_locate_kernel: additionally emits
    the kept hit stream (INF-masked, compacted OUTSIDE by one vmapped
    lax.sort — ascending order makes mask+sort a stable partition), the
    untruncated n_pages/n_hits totals (the rank-truncation flags, ref
    Search.cs:365-420).

    loc_ref: the [1, P] page bounds (compare-all locate), or with
    `paged` the [Q, n] precomputed page stream carried through the
    merge sort."""
    n = 2 * cap
    q = vals_ref.shape[0]
    lane = _iota((q, n), 1)
    vals = vals_ref[...]
    keep = _sorted_and_keep(vals, tag_ref[...], ra_ref, rb_ref, lane, n)
    nhits_ref[:, 0] = jnp.sum(keep.astype(jnp.int32), axis=-1)
    hits_ref[...] = jnp.where(keep, vals, INF32)
    _locate_rank_topk(
        vals, keep, lane, n, None if paged else loc_ref, pages_ref,
        ranks_ref, counts_ref, topk=topk, npages_ref=npages_ref,
        page=loc_ref[...] if paged else None,
    )


def _variants_and_locate_full_kernel(vals_ref, tag_ref, ra_ref, rb_ref,
                                     bpad_ref, loc_ref, pages_ref,
                                     ranks_ref, counts_ref, npages_ref,
                                     nhits_ref, hits_ref,
                                     *, n: int, topk: int,
                                     paged: bool = False):
    """FULL-RESULT kernel over a pre-merged VARIANT stream (W=2 words,
    each an OR of variants): run-dedupe + AND segmentation + the shared
    locate/rank/top-k tail + kept-hit stream and untruncated totals."""
    q = vals_ref.shape[0]
    lane = _iota((q, n), 1)
    vals = vals_ref[...]
    keep = _variants_and_keep(
        vals, tag_ref[...], ra_ref, rb_ref, bpad_ref, lane, n
    )
    nhits_ref[:, 0] = jnp.sum(keep.astype(jnp.int32), axis=-1)
    hits_ref[...] = jnp.where(keep, vals, INF32)
    _locate_rank_topk(
        vals, keep, lane, n, None if paged else loc_ref, pages_ref,
        ranks_ref, counts_ref, topk=topk, npages_ref=npages_ref,
        page=loc_ref[...] if paged else None,
    )


def _union_locate_full_kernel(vals_ref, loc_ref, pages_ref, ranks_ref,
                              counts_ref, npages_ref, nhits_ref, hits_ref,
                              *, n: int, topk: int, paged: bool = False):
    """FULL-RESULT kernel for ONE word's variant union (W=1, V>1): the
    sorted concatenation deduped by run starts IS the result stream
    (ops/seqops.or_variants_sorted), then the locate tail."""
    q = vals_ref.shape[0]
    lane = _iota((q, n), 1)
    vals = vals_ref[...]
    valid = vals < INF32
    prev_vals = _shift_right_fill(vals, np.int32(-1))
    keep = jnp.logical_and(valid, vals != prev_vals)
    nhits_ref[:, 0] = jnp.sum(keep.astype(jnp.int32), axis=-1)
    hits_ref[...] = jnp.where(keep, vals, INF32)
    _locate_rank_topk(
        vals, keep, lane, n, None if paged else loc_ref, pages_ref,
        ranks_ref, counts_ref, topk=topk, npages_ref=npages_ref,
        page=loc_ref[...] if paged else None,
    )


def _locate_rank_slots(vals, keep, lane, n, bounds_ref, page_ref,
                       rank_ref, cnt_ref, npages_ref, page=None,
                       kpad=None):
    """SLOT-MODE result tail: emits the per-slot (page, rank, count)
    streams instead of running the in-kernel top-k — ONE stable vmapped
    lax.sort outside the kernel (key = -rank) extracts the ordered
    top-k. Replacing topk sequential masked-argmax passes with a native
    TPU sort measured 18.4 -> ~12 ms on the dominant cap-64 W2 bucket
    (topk=64); the stable sort preserves the ascending-lane tie-break
    of the argmax loop exactly.

    kpad: when set, the streams COMPACT IN-KERNEL to their first kpad
    runs in slot order (_compact_left log-shifts) and the refs are
    [Q, kpad] — the external compare-all run compaction
    (locate_streams_topk's _compact_runs) disappears and the kernel
    writes shrink from 3x[B, n] to 3x[B, kpad]."""
    page, first, slot_rank, slot_count = _locate_rank_core(
        vals, keep, lane, n, bounds_ref, page=page
    )
    npages_ref[:, 0] = jnp.sum(first.astype(jnp.int32), axis=-1)
    if kpad is None:
        page_ref[...] = page
        rank_ref[...] = slot_rank
        cnt_ref[...] = slot_count
        return
    rc, pc, cc = _compact_left(
        (slot_rank, page, slot_count),
        (np.float32(0), np.int32(-1), np.float32(0)), first, lane, n
    )
    page_ref[...] = pc[:, :kpad]
    rank_ref[...] = rc[:, :kpad]
    cnt_ref[...] = cc[:, :kpad]


def _emit_hits(hits_ref, vals, keep, lane, n, hpad):
    """Kernel hit emission: the raw kept stream (hpad None), or the
    first-hpad kept values compacted in-kernel (_compact_left) so the
    external full-width hits lax.sort disappears."""
    hv = jnp.where(keep, vals, INF32)
    if hpad is None:
        hits_ref[...] = hv
        return
    (hc,) = _compact_left((hv,), (INF32,), keep, lane, n)
    hits_ref[...] = hc[:, :hpad]


def _sorted_and_locate_full_slots_kernel(vals_ref, tag_ref, ra_ref, rb_ref,
                                         loc_ref, page_ref, rank_ref,
                                         cnt_ref, npages_ref, nhits_ref,
                                         hits_ref, *, cap: int,
                                         paged: bool = False,
                                         kpad=None, hpad=None):
    """SLOT-MODE twin of _sorted_and_locate_full_kernel."""
    n = 2 * cap
    q = vals_ref.shape[0]
    lane = _iota((q, n), 1)
    vals = vals_ref[...]
    keep = _sorted_and_keep(vals, tag_ref[...], ra_ref, rb_ref, lane, n)
    nhits_ref[:, 0] = jnp.sum(keep.astype(jnp.int32), axis=-1)
    _emit_hits(hits_ref, vals, keep, lane, n, hpad)
    _locate_rank_slots(
        vals, keep, lane, n, None if paged else loc_ref, page_ref,
        rank_ref, cnt_ref, npages_ref,
        page=loc_ref[...] if paged else None, kpad=kpad,
    )


def _variants_and_locate_full_slots_kernel(vals_ref, tag_ref, ra_ref,
                                           rb_ref, bpad_ref, loc_ref,
                                           page_ref, rank_ref, cnt_ref,
                                           npages_ref, nhits_ref, hits_ref,
                                           *, n: int, paged: bool = False,
                                           kpad=None, hpad=None):
    """SLOT-MODE twin of _variants_and_locate_full_kernel."""
    q = vals_ref.shape[0]
    lane = _iota((q, n), 1)
    vals = vals_ref[...]
    keep = _variants_and_keep(
        vals, tag_ref[...], ra_ref, rb_ref, bpad_ref, lane, n
    )
    nhits_ref[:, 0] = jnp.sum(keep.astype(jnp.int32), axis=-1)
    _emit_hits(hits_ref, vals, keep, lane, n, hpad)
    _locate_rank_slots(
        vals, keep, lane, n, None if paged else loc_ref, page_ref,
        rank_ref, cnt_ref, npages_ref,
        page=loc_ref[...] if paged else None, kpad=kpad,
    )


def _union_locate_full_slots_kernel(vals_ref, loc_ref, page_ref,
                                    rank_ref, cnt_ref, npages_ref,
                                    nhits_ref, hits_ref, *, n: int,
                                    paged: bool = False,
                                    kpad=None, hpad=None):
    """SLOT-MODE twin of _union_locate_full_kernel."""
    q = vals_ref.shape[0]
    lane = _iota((q, n), 1)
    vals = vals_ref[...]
    valid = vals < INF32
    prev_vals = _shift_right_fill(vals, np.int32(-1))
    keep = jnp.logical_and(valid, vals != prev_vals)
    nhits_ref[:, 0] = jnp.sum(keep.astype(jnp.int32), axis=-1)
    _emit_hits(hits_ref, vals, keep, lane, n, hpad)
    _locate_rank_slots(
        vals, keep, lane, n, None if paged else loc_ref, page_ref,
        rank_ref, cnt_ref, npages_ref,
        page=loc_ref[...] if paged else None, kpad=kpad,
    )


def _union2_merge_locate_slots_kernel(x_ref, p_ref, page_ref, rank_ref,
                                      cnt_ref, npages_ref, nhits_ref,
                                      hits_ref, *, cap: int,
                                      kpad=None, hpad=None):
    """V=2 variant union with the bitonic two-stream merge IN-KERNEL:
    the input is the bitonic pre-arrangement concat(a asc, b reversed)
    with its page payload, the merge is log2(2cap) lane-rotation
    compare-exchange stages (no tag operand — equal coords across
    variants carry EQUAL pages since page is a function of the coord,
    so comparator instability cannot diverge the payload), then the
    union run-dedupe + locate + in-kernel tails. Replaces the vmapped
    2-op lax.sort the union route paid per V=2 bucket (the bitonic
    network measured 2.8x the sort on the W2 merge at [5000, 2048])."""
    n = 2 * cap
    q = x_ref.shape[0]
    lane = _iota((q, n), 1)
    x = x_ref[...]
    p = p_ref[...]
    d = n // 2
    while d >= 1:
        lo = (lane & d) == 0
        px = jnp.where(lo, _roll(x, -d), _roll(x, d))
        pp = jnp.where(lo, _roll(p, -d), _roll(p, d))
        p_less = px < x
        take = jnp.logical_or(
            jnp.logical_and(lo, p_less),
            jnp.logical_and(~lo, ~p_less),
        )
        x = jnp.where(take, px, x)
        p = jnp.where(take, pp, p)
        d //= 2
    valid = x < INF32
    prev_vals = _shift_right_fill(x, np.int32(-1))
    keep = jnp.logical_and(valid, x != prev_vals)
    nhits_ref[:, 0] = jnp.sum(keep.astype(jnp.int32), axis=-1)
    _emit_hits(hits_ref, x, keep, lane, n, hpad)
    _locate_rank_slots(
        x, keep, lane, n, None, page_ref, rank_ref, cnt_ref,
        npages_ref, page=p, kpad=kpad,
    )


def _single_word_full_slots_kernel(a_ref, na_ref, loc_ref, page_ref,
                                   rank_ref, cnt_ref, npages_ref,
                                   *, cap: int, paged: bool = False,
                                   kpad=None):
    """SLOT-MODE twin of _single_word_full_kernel (hits and n_hits come
    from the gathered block outside, as in the topk-mode wrapper)."""
    q = a_ref.shape[0]
    lane = _iota((q, cap), 1)
    na = na_ref[:, 0][:, None]
    keep = lane < na
    vals = jnp.where(keep, a_ref[...], INF32)
    _locate_rank_slots(
        vals, keep, lane, cap, None if paged else loc_ref, page_ref,
        rank_ref, cnt_ref, npages_ref,
        page=loc_ref[...] if paged else None, kpad=kpad,
    )


def _slots_topk_sort(page_s, rank_s, cnt_s, topk: int):
    """Extract the ordered top-k from per-slot streams: one stable
    vmapped lax.sort by descending rank (the payload columns ride the
    same sort). Equal ranks keep lane order = ascending page, exactly
    the in-kernel argmax loop's tie-break. The key is ~bitcast_i32 of
    the non-negative rank — monotone decreasing in rank, and TPU sort
    comparators over i32 run ~12x faster than over f32."""
    bsz, n = rank_s.shape
    nkey = ~jax.lax.bitcast_convert_type(rank_s, jnp.int32)
    nkey, pg, ct = jax.lax.sort(
        (nkey, page_s, cnt_s), num_keys=1
    )
    ranks_s = jax.lax.bitcast_convert_type(~nkey, jnp.float32)
    if topk <= n:
        ranks, pg, ct = ranks_s[:, :topk], pg[:, :topk], ct[:, :topk]
    else:
        pad = topk - n
        ranks = jnp.concatenate(
            [ranks_s, jnp.zeros((bsz, pad), jnp.float32)], axis=1)
        pg = jnp.concatenate(
            [pg, jnp.zeros((bsz, pad), jnp.int32)], axis=1)
        ct = jnp.concatenate(
            [ct, jnp.zeros((bsz, pad), jnp.float32)], axis=1)
    ok = ranks > 0
    ranks = jnp.where(ok, ranks, 0.0)
    pages = jnp.where(ok, pg, -1)
    counts = jnp.where(ok, ct, 0.0).astype(jnp.int32)
    return pages, ranks, counts


def q_for_stream(n: int) -> int:
    """Queries per program for a pre-merged [Q, n] stream kernel —
    same scoped-vmem rule as q_for_sorted_cap: Q*n <= 8192."""
    q = 8
    while q < 64 and (q * 2) * n <= 8192:
        q <<= 1
    return q


MAX_STREAM_WIDTH = 1024  # Q floors at 8; larger streams blow scoped vmem

# Plain W=1 full-result buckets past MAX_PALLAS_CAP ride the union
# kernel (V=1, merge sort skipped) only up to this cap — measured on
# TPU v5e: 1.21x over XLA locate_full at 256, 0.89x at 512, 0.98x at
# 1024 (vmapped-XLA wins the bandwidth-bound larger caps).
W1_FULL_STREAM_MAX = 256


def _full_stream_call(kernel, bsz: int, q: int, n: int, topk: int,
                      hit_cap: int, interpret: bool, inputs, in_specs):
    """Shared pallas_call plumbing for the full-result stream kernels +
    the outside hit compaction sort."""
    grid = (bsz // q,)
    pages, ranks, counts, n_pages, n_hits, hitvals = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, n), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, topk), jnp.int32),
            jax.ShapeDtypeStruct((bsz, topk), jnp.float32),
            jax.ShapeDtypeStruct((bsz, topk), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, n), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)
    hits = jax.lax.sort(hitvals)
    if hit_cap <= n:
        hits = hits[:, :hit_cap]
    else:
        hits = jnp.concatenate([
            hits, jnp.full((bsz, hit_cap - n), INF32, jnp.int32)
        ], axis=1)
    return pages, ranks, counts, n_pages[:, 0], n_hits[:, 0], hits


def _full_stream_call_slots(kernel, bsz: int, q: int, n: int, topk: int,
                            hit_cap: int, interpret: bool, inputs,
                            in_specs, tail: bool = True):
    """SLOT-MODE pallas_call plumbing with IN-KERNEL tails: the kernel
    compacts the run streams to their first min(topk, n) runs and the
    kept-hit stream to its first ~hit_cap values (_compact_left
    log-shifts over the VMEM-resident stream), so the external
    compare-all run compaction (locate_streams_topk) and the
    full-width hits lax.sort both disappear and the kernel writes
    shrink from 4x[B, n] to 3x[B, kpad] + [B, hpad]. The top-k
    finishes with the width-kpad streams_topk_tail."""
    grid = (bsz // q,)
    kpad = min(topk, n)
    hpad = min(n, -(-min(hit_cap, n) // 128) * 128)
    kernel = functools.partial(kernel, kpad=kpad, hpad=hpad)
    extra = {}
    if n >= 2048 and not interpret:
        # wide streams brush the default 16 MB scoped-vmem stack when
        # the page table is large (the locate compare-all's live
        # temporaries scale with P); the slots kernels have no unrolled
        # top-k so a raised limit compiles fine (v5e: 128 MB VMEM)
        from jax.experimental.pallas import tpu as pltpu

        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    pg_c, rk_c, ct_c, n_pages, n_hits, hits = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        **extra,
        out_specs=[
            pl.BlockSpec((q, kpad), lambda i: (i, 0)),
            pl.BlockSpec((q, kpad), lambda i: (i, 0)),
            pl.BlockSpec((q, kpad), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, hpad), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, kpad), jnp.int32),
            jax.ShapeDtypeStruct((bsz, kpad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, kpad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, hpad), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)
    if kpad < topk:
        zpad = topk - kpad
        pg_c = jnp.concatenate(
            [pg_c, jnp.full((bsz, zpad), -1, jnp.int32)], axis=1)
        rk_c = jnp.concatenate(
            [rk_c, jnp.zeros((bsz, zpad), jnp.float32)], axis=1)
        ct_c = jnp.concatenate(
            [ct_c, jnp.zeros((bsz, zpad), jnp.float32)], axis=1)
    if hit_cap <= hpad:
        hits = hits[:, :hit_cap]
    else:
        hits = jnp.concatenate([
            hits, jnp.full((bsz, hit_cap - hpad), INF32, jnp.int32)
        ], axis=1)
    if not tail:
        # DEFERRED-TAIL mode: return the compacted first-topk-runs
        # streams so the caller can batch ONE streams_topk_tail (+ one
        # doc grouping) across ALL buckets — the per-bucket tail is a
        # fixed ~dozen small thunks whose dispatch cost dominates the
        # fused multi-bucket program (PROFILE_r04: thunk-bound)
        return (pg_c, rk_c, ct_c, n_pages[:, 0], n_hits[:, 0], hits)
    pages, ranks, counts, _ = streams_topk_tail(
        pg_c, rk_c, ct_c, n_pages[:, 0], topk, bsz
    )
    return pages, ranks, counts, n_pages[:, 0], n_hits[:, 0], hits


@functools.partial(jax.jit, static_argnames=(
    "topk", "hit_cap", "interpret", "sort_topk", "shared_pg", "tail"))
def pallas_variants_and_locate_full(a, na, ra, b, nb, rb, b_pad, bounds,
                                    topk: int, hit_cap: int,
                                    interpret: bool = False,
                                    sort_topk: bool = True,
                                    a_pg=None, b_pg=None,
                                    shared_pg: bool = False,
                                    tail: bool = True):
    """Hybrid FULL-RESULT variant AND: a [B, Va, cap] / [B, Vb, cap]
    pair of variant posting blocks merges in ONE vmapped lax.sort of
    the word-tagged concatenation; the Pallas kernel run-dedupes and
    evaluates the AND + locate (the kernel twin of the XLA
    and_variants_sorted path, numerically identical). a_pg/b_pg:
    optional precomputed page streams (see pallas_sorted_and_locate_full)."""
    bsz, va, cap = a.shape
    vb = b.shape[1]
    n = (va + vb) * cap
    q = min(q_for_stream(n), bsz)
    assert bsz % q == 0, f"batch {bsz} must be a multiple of {q}"
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (bsz, va, cap), 2)
    av = jnp.where(lane_c < na[:, :, None], a, INF32).reshape(bsz, -1)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (bsz, vb, cap), 2)
    bv = jnp.where(lane_c < nb[:, :, None], b, INF32).reshape(bsz, -1)
    tag = jnp.concatenate([
        jnp.where(av < INF32, 0, 2), jnp.where(bv < INF32, 1, 2)
    ], axis=1).astype(jnp.int32)
    cat = jnp.concatenate([av, bv], axis=1)
    if a_pg is not None:
        pgc = jnp.concatenate([
            a_pg.reshape(bsz, -1), b_pg.reshape(bsz, -1)
        ], axis=1)
        vals, tag, pg = jax.vmap(
            lambda v2, t, p: jax.lax.sort((v2, t, p), num_keys=2)
        )(cat, tag, pgc)
    else:
        vals, tag = jax.vmap(
            lambda v2, t: jax.lax.sort((v2, t), num_keys=2)
        )(cat, tag)
        pg = _shared_pg(vals, bounds) if shared_pg else None
    paged = pg is not None
    if paged:
        loc = pg
        loc_spec = pl.BlockSpec((q, n), lambda i: (i, 0))
    else:
        loc = bounds.reshape(1, -1)
        loc_spec = pl.BlockSpec((1, bounds.shape[0]), lambda i: (0, 0))
    in_specs = [
        pl.BlockSpec((q, n), lambda i: (i, 0)),
        pl.BlockSpec((q, n), lambda i: (i, 0)),
        pl.BlockSpec((q, 1), lambda i: (i, 0)),
        pl.BlockSpec((q, 1), lambda i: (i, 0)),
        pl.BlockSpec((q, 1), lambda i: (i, 0)),
        loc_spec,
    ]
    inputs = (vals, tag, ra.reshape(bsz, 1), rb.reshape(bsz, 1),
              b_pad.astype(jnp.int32).reshape(bsz, 1), loc)
    if sort_topk:
        kernel = functools.partial(
            _variants_and_locate_full_slots_kernel, n=n, paged=paged
        )
        return _full_stream_call_slots(
            kernel, bsz, q, n, topk, hit_cap, interpret, inputs,
            in_specs, tail=tail,
        )
    kernel = functools.partial(
        _variants_and_locate_full_kernel, n=n, topk=topk, paged=paged
    )
    return _full_stream_call(
        kernel, bsz, q, n, topk, hit_cap, interpret, inputs, in_specs
    )


@functools.partial(jax.jit, static_argnames=(
    "topk", "hit_cap", "interpret", "sort_topk", "shared_pg", "tail"))
def pallas_union_locate_full(a, na, bounds, topk: int, hit_cap: int,
                             interpret: bool = False,
                             sort_topk: bool = True, a_pg=None,
                             shared_pg: bool = False,
                             tail: bool = True):
    """FULL-RESULT W=1 variant union: one vmapped lax.sort of the
    [B, V, cap] variant blocks, run-dedupe + locate in the kernel
    (the kernel twin of or_variants_sorted). a_pg: optional precomputed
    page stream (see pallas_sorted_and_locate_full)."""
    bsz, v, cap = a.shape
    n = v * cap
    q = min(q_for_stream(n), bsz)
    assert bsz % q == 0, f"batch {bsz} must be a multiple of {q}"
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (bsz, v, cap), 2)
    av = jnp.where(lane_c < na[:, :, None], a, INF32).reshape(bsz, -1)
    if v == 2 and a_pg is not None and sort_topk:
        # V=2 carried: the two variant blocks are each sorted — merge
        # them IN-KERNEL via the bitonic network instead of paying the
        # vmapped 2-op lax.sort (_union2_merge_locate_slots_kernel);
        # pages mask to INF beyond na like the values so padding lanes
        # carry deterministic payloads
        pgm = jnp.where(lane_c < na[:, :, None], a_pg, INF32)
        x0 = jnp.concatenate(
            [av[:, :cap], jnp.flip(av[:, cap:], axis=1)], axis=1)
        p0 = jnp.concatenate(
            [pgm[:, 0], jnp.flip(pgm[:, 1], axis=1)], axis=1)
        kernel = functools.partial(
            _union2_merge_locate_slots_kernel, cap=cap
        )
        in_specs = [
            pl.BlockSpec((q, n), lambda i: (i, 0)),
            pl.BlockSpec((q, n), lambda i: (i, 0)),
        ]
        return _full_stream_call_slots(
            kernel, bsz, q, n, topk, hit_cap, interpret, (x0, p0),
            in_specs, tail=tail,
        )
    # V=1: a single posting block is already ascending + INF-padded —
    # no merge sort needed (this also serves plain W=1 queries at caps
    # beyond the in-kernel-merge kernel's budget)
    if a_pg is not None:
        pgc = a_pg.reshape(bsz, -1)
        if v == 1:
            vals, pg = av, pgc
        else:
            vals, pg = jax.vmap(
                lambda v2, p: jax.lax.sort((v2, p), num_keys=1)
            )(av, pgc)
    else:
        vals = av if v == 1 else jax.vmap(jax.lax.sort)(av)
        pg = _shared_pg(vals, bounds) if shared_pg else None
    paged = pg is not None
    if paged:
        loc = pg
        loc_spec = pl.BlockSpec((q, n), lambda i: (i, 0))
    else:
        loc = bounds.reshape(1, -1)
        loc_spec = pl.BlockSpec((1, bounds.shape[0]), lambda i: (0, 0))
    in_specs = [
        pl.BlockSpec((q, n), lambda i: (i, 0)),
        loc_spec,
    ]
    inputs = (vals, loc)
    if sort_topk:
        kernel = functools.partial(
            _union_locate_full_slots_kernel, n=n, paged=paged
        )
        return _full_stream_call_slots(
            kernel, bsz, q, n, topk, hit_cap, interpret, inputs,
            in_specs, tail=tail,
        )
    kernel = functools.partial(
        _union_locate_full_kernel, n=n, topk=topk, paged=paged
    )
    return _full_stream_call(
        kernel, bsz, q, n, topk, hit_cap, interpret, inputs, in_specs,
    )


def q_for_sorted_cap(cap: int) -> int:
    """Queries per program for the sorted-stream kernel. Empirical
    Mosaic scoped-vmem cost: ~1 KB per (query, lane) unit (the scan
    pipeline keeps ~tens of [Q, 2cap] temporaries live on the stack;
    measured: Q64 x 2cap256 needed 16.14 MB) — keep Q*2cap <= 8192."""
    q = 8
    while q < 64 and (q * 2) * 2 * cap <= 8192:
        q <<= 1
    return q


MAX_SORTED_PALLAS_CAP = 512  # Q floors at 8; larger caps blow scoped vmem

# Slots-mode (no unrolled top-k loop) COMPILES beyond the kernel-topk
# budget — cap 1024 (n=2048, Q=8) builds in ~90 s with
# vmem_limit_bytes=64M and runs correctly — but measured 0.89-0.95x vs
# the XLA sort path on v5e (B=32/512), so routing keeps wide W2 buckets
# on XLA (MAX_SORTED_PALLAS_CAP). Kept as the measured admission
# ceiling should future hardware shift the crossover.
MAX_SORTED_SLOTS_CAP = 1024


@functools.partial(jax.jit, static_argnames=(
    "cap", "topk", "interpret", "shared_pg"))
def pallas_sorted_and_locate(a, na, ra, b, nb, rb, bounds,
                             cap: int, topk: int, interpret: bool = False,
                             a_pg=None, b_pg=None,
                             shared_pg: bool = False):
    """Hybrid AND: ONE vmapped lax.sort merges the tagged operand
    concatenation (TPU-native sort), then the Pallas kernel runs the
    scan-only segmentation/locate/rank/top-k. Numerically identical to
    pallas_batched_and_locate / the XLA path. a_pg/b_pg/shared_pg: the
    page-stream options of pallas_sorted_and_locate_full."""
    bsz = a.shape[0]
    q = min(q_for_sorted_cap(cap), bsz)
    assert bsz % q == 0, f"batch {bsz} must be a multiple of {q}"
    n = 2 * cap
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (bsz, cap), 1)
    av = jnp.where(lane_c < na[:, None], a, INF32)
    bv = jnp.where(lane_c < nb[:, None], b, INF32)
    tag = jnp.concatenate([
        jnp.where(lane_c < na[:, None], 0, 2),
        jnp.where(lane_c < nb[:, None], 1, 2),
    ], axis=1).astype(jnp.int32)
    cat = jnp.concatenate([av, bv], axis=1)
    if a_pg is not None:
        vals, tag, pg = jax.vmap(
            lambda v, t, p: jax.lax.sort((v, t, p), num_keys=2)
        )(cat, tag, jnp.concatenate([a_pg, b_pg], axis=1))
    else:
        vals, tag = jax.vmap(
            lambda v, t: jax.lax.sort((v, t), num_keys=2)
        )(cat, tag)
        pg = _shared_pg(vals, bounds) if shared_pg else None
    paged = pg is not None
    if paged:
        loc = pg
        loc_spec = pl.BlockSpec((q, n), lambda i: (i, 0))
    else:
        loc = bounds.reshape(1, -1)
        loc_spec = pl.BlockSpec((1, bounds.shape[0]), lambda i: (0, 0))
    ra2 = ra.reshape(bsz, 1)
    rb2 = rb.reshape(bsz, 1)
    kernel = functools.partial(
        _sorted_and_locate_kernel, cap=cap, topk=topk, paged=paged
    )
    grid = (bsz // q,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, 2 * cap), lambda i: (i, 0)),
            pl.BlockSpec((q, 2 * cap), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            loc_spec,
        ],
        out_specs=[
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, topk), jnp.int32),
            jax.ShapeDtypeStruct((bsz, topk), jnp.float32),
            jax.ShapeDtypeStruct((bsz, topk), jnp.int32),
        ],
        interpret=interpret,
    )(vals, tag, ra2, rb2, loc)


def _shared_pg(vals, bounds):
    """Per-slot page stream via ONE XLA compare-all over an (already
    merged) stream — the shared-lookup leg of the paged kernels for
    buckets whose posting fetch has no combined small table (carrying
    pages through a block-DMA fetch doubles its row count, measured a
    22% LOSS on the ru mix; the XLA lookup is free of that)."""
    from docodo_tpu.ops.seqops import _rank_in_sorted

    pg = jax.vmap(
        lambda row: _rank_in_sorted(row, bounds, strict=False)
    )(vals)
    return jnp.minimum(pg, bounds.shape[0] - 1)


@functools.partial(jax.jit, static_argnames=(
    "cap", "topk", "hit_cap", "interpret", "sort_topk", "shared_pg",
    "tail"))
def pallas_sorted_and_locate_full(a, na, ra, b, nb, rb, bounds,
                                  cap: int, topk: int, hit_cap: int,
                                  interpret: bool = False,
                                  sort_topk: bool = True,
                                  a_pg=None, b_pg=None,
                                  shared_pg: bool = False,
                                  tail: bool = True):
    """Hybrid FULL-RESULT AND: one vmapped lax.sort merges the tagged
    operand concatenation, the Pallas kernel runs the scan-only
    segmentation/locate/rank/top-k AND emits the kept hit stream +
    untruncated totals, and one more lax.sort compacts the INF-masked
    (still ascending) hit stream into the first hit_cap slots.

    a_pg/b_pg: optional precomputed page streams (page_of[coord],
    fetched beside the postings) — they ride the merge sort as a
    payload (page is a pure function of the coord, so sort ties cannot
    diverge) and replace the in-kernel compare-all locate, which
    measured ~65%% of this kernel's time at P=578 pages.

    Returns (pages, ranks, counts, n_pages, n_hits, hits[B, hit_cap])."""
    bsz = a.shape[0]
    q = min(q_for_sorted_cap(cap), bsz)
    assert bsz % q == 0, f"batch {bsz} must be a multiple of {q}"
    n = 2 * cap
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (bsz, cap), 1)
    av = jnp.where(lane_c < na[:, None], a, INF32)
    bv = jnp.where(lane_c < nb[:, None], b, INF32)
    tag = jnp.concatenate([
        jnp.where(lane_c < na[:, None], 0, 2),
        jnp.where(lane_c < nb[:, None], 1, 2),
    ], axis=1).astype(jnp.int32)
    cat = jnp.concatenate([av, bv], axis=1)
    if a_pg is not None:
        pgc = jnp.concatenate([a_pg, b_pg], axis=1)
        vals, tag, pg = jax.vmap(
            lambda v, t, p: jax.lax.sort((v, t, p), num_keys=2)
        )(cat, tag, pgc)
    else:
        vals, tag = jax.vmap(
            lambda v, t: jax.lax.sort((v, t), num_keys=2)
        )(cat, tag)
        # shared-lookup mode: one XLA compare-all over the merged
        # stream (measured ~5x the Mosaic in-kernel compare) — used
        # when the fetch has no combined table to carry pages for free
        pg = _shared_pg(vals, bounds) if shared_pg else None
    paged = pg is not None
    if paged:
        loc = pg
        loc_spec = pl.BlockSpec((q, n), lambda i: (i, 0))
    else:
        loc = bounds.reshape(1, -1)
        loc_spec = pl.BlockSpec((1, bounds.shape[0]), lambda i: (0, 0))
    in_specs = [
        pl.BlockSpec((q, n), lambda i: (i, 0)),
        pl.BlockSpec((q, n), lambda i: (i, 0)),
        pl.BlockSpec((q, 1), lambda i: (i, 0)),
        pl.BlockSpec((q, 1), lambda i: (i, 0)),
        loc_spec,
    ]
    inputs = (vals, tag, ra.reshape(bsz, 1), rb.reshape(bsz, 1), loc)
    if sort_topk:
        kernel = functools.partial(
            _sorted_and_locate_full_slots_kernel, cap=cap, paged=paged
        )
        return _full_stream_call_slots(
            kernel, bsz, q, n, topk, hit_cap, interpret, inputs,
            in_specs, tail=tail,
        )
    kernel = functools.partial(
        _sorted_and_locate_full_kernel, cap=cap, topk=topk, paged=paged
    )
    return _full_stream_call(
        kernel, bsz, q, n, topk, hit_cap, interpret, inputs, in_specs
    )


@functools.partial(jax.jit, static_argnames=(
    "cap", "topk", "hit_cap", "interpret", "sort_topk", "shared_pg",
    "tail"))
def pallas_single_locate_full(a, na, bounds, cap: int, topk: int,
                              hit_cap: int, interpret: bool = False,
                              sort_topk: bool = True, a_pg=None,
                              shared_pg: bool = False,
                              tail: bool = True):
    """FULL-RESULT W=1: the gathered posting block IS the compacted hit
    stream — the kernel only adds the locate/rank/top-k tail + n_pages.
    a_pg: optional precomputed page stream (no sort here — it aligns
    with the posting block as fetched).

    Returns (pages, ranks, counts, n_pages, n_hits, hits[B, hit_cap])."""
    bsz = a.shape[0]
    q = min(64, q_for_cap(cap) * 2, bsz)
    assert bsz % q == 0, f"batch {bsz} must be a multiple of {q}"
    na2 = na.reshape(bsz, 1)
    pg = a_pg
    if pg is None and shared_pg:
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (bsz, cap), 1)
        pg = _shared_pg(
            jnp.where(lane_s < na[:, None], a, INF32), bounds)
    paged = pg is not None
    if paged:
        loc = pg
        loc_spec = pl.BlockSpec((q, cap), lambda i: (i, 0))
    else:
        loc = bounds.reshape(1, -1)
        loc_spec = pl.BlockSpec((1, bounds.shape[0]), lambda i: (0, 0))
    grid = (bsz // q,)
    in_specs = [
        pl.BlockSpec((q, cap), lambda i: (i, 0)),
        pl.BlockSpec((q, 1), lambda i: (i, 0)),
        loc_spec,
    ]
    if sort_topk:
        kpad = min(topk, cap)
        kernel = functools.partial(
            _single_word_full_slots_kernel, cap=cap, paged=paged,
            kpad=kpad)
        pg_c, rk_c, ct_c, n_pages = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((q, kpad), lambda i: (i, 0)),
                pl.BlockSpec((q, kpad), lambda i: (i, 0)),
                pl.BlockSpec((q, kpad), lambda i: (i, 0)),
                pl.BlockSpec((q, 1), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bsz, kpad), jnp.int32),
                jax.ShapeDtypeStruct((bsz, kpad), jnp.float32),
                jax.ShapeDtypeStruct((bsz, kpad), jnp.float32),
                jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
            ],
            interpret=interpret,
        )(a, na2, loc)
        if kpad < topk:
            zpad = topk - kpad
            pg_c = jnp.concatenate(
                [pg_c, jnp.full((bsz, zpad), -1, jnp.int32)], axis=1)
            rk_c = jnp.concatenate(
                [rk_c, jnp.zeros((bsz, zpad), jnp.float32)], axis=1)
            ct_c = jnp.concatenate(
                [ct_c, jnp.zeros((bsz, zpad), jnp.float32)], axis=1)
        if not tail:
            lane_c = jax.lax.broadcasted_iota(jnp.int32, (bsz, cap), 1)
            block = jnp.where(lane_c < na[:, None], a, INF32)
            if hit_cap <= cap:
                hits = block[:, :hit_cap]
            else:
                hits = jnp.concatenate([
                    block,
                    jnp.full((bsz, hit_cap - cap), INF32, jnp.int32)
                ], axis=1)
            return (pg_c, rk_c, ct_c, n_pages[:, 0], na, hits)
        pages, ranks, counts, _ = streams_topk_tail(
            pg_c, rk_c, ct_c, n_pages[:, 0], topk, bsz
        )
    else:
        kernel = functools.partial(
            _single_word_full_kernel, cap=cap, topk=topk, paged=paged
        )
        pages, ranks, counts, n_pages = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((q, topk), lambda i: (i, 0)),
                pl.BlockSpec((q, topk), lambda i: (i, 0)),
                pl.BlockSpec((q, topk), lambda i: (i, 0)),
                pl.BlockSpec((q, 1), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bsz, topk), jnp.int32),
                jax.ShapeDtypeStruct((bsz, topk), jnp.float32),
                jax.ShapeDtypeStruct((bsz, topk), jnp.int32),
                jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
            ],
            interpret=interpret,
        )(a, na2, loc)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (bsz, cap), 1)
    block = jnp.where(lane_c < na[:, None], a, INF32)
    if hit_cap <= cap:
        hits = block[:, :hit_cap]
    else:
        hits = jnp.concatenate([
            block, jnp.full((bsz, hit_cap - cap), INF32, jnp.int32)
        ], axis=1)
    return pages, ranks, counts, n_pages[:, 0], na, hits


@functools.partial(jax.jit, static_argnames=("cap", "topk", "interpret"))
def pallas_batched_and_locate(a, na, ra, b, nb, rb, bounds,
                              cap: int, topk: int, interpret: bool = False):
    """Batched fused AND+locate+rank+topk.

    a, b    : int32[B, cap] padded posting blocks (ascending + INF pad)
    na, nb  : int32[B] lengths;  ra, rb: int32[B] per-word R windows
    bounds  : int32[P] page end coordinates
    B must be a multiple of q_for_cap(cap) (callers pad with empties).
    Returns (pages int32[B, topk], ranks f32[B, topk], counts int32[B, topk]).
    """
    bsz = a.shape[0]
    q = min(q_for_cap(cap), bsz)
    assert bsz % q == 0, f"batch {bsz} must be a multiple of {q}"
    na2 = na.reshape(bsz, 1)
    nb2 = nb.reshape(bsz, 1)
    ra2 = ra.reshape(bsz, 1)
    rb2 = rb.reshape(bsz, 1)
    bounds2 = bounds.reshape(1, -1)
    kernel = functools.partial(_and_locate_kernel, cap=cap, topk=topk)
    grid = (bsz // q,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, cap), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, cap), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, bounds.shape[0]), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, topk), jnp.int32),
            jax.ShapeDtypeStruct((bsz, topk), jnp.float32),
            jax.ShapeDtypeStruct((bsz, topk), jnp.int32),
        ],
        interpret=interpret,
    )(a, na2, ra2, b, nb2, rb2, bounds2)


@functools.partial(jax.jit, static_argnames=(
    "cap", "topk", "interpret", "shared_pg"))
def pallas_batched_single_locate(a, na, bounds, cap: int, topk: int,
                                 interpret: bool = False, a_pg=None,
                                 shared_pg: bool = False):
    """Batched fused single-word locate+rank+topk (W=1 queries skip the
    merge entirely — the posting block is the result stream). a_pg /
    shared_pg: the page-stream options of pallas_single_locate_full."""
    bsz = a.shape[0]
    q = min(64, q_for_cap(cap) * 2, bsz)  # no merge one-hots: [q, cap] VMEM
    assert bsz % q == 0, f"batch {bsz} must be a multiple of {q}"
    na2 = na.reshape(bsz, 1)
    pg = a_pg
    if pg is None and shared_pg:
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (bsz, cap), 1)
        pg = _shared_pg(
            jnp.where(lane_s < na[:, None], a, INF32), bounds)
    paged = pg is not None
    if paged:
        loc = pg
        loc_spec = pl.BlockSpec((q, cap), lambda i: (i, 0))
    else:
        loc = bounds.reshape(1, -1)
        loc_spec = pl.BlockSpec((1, bounds.shape[0]), lambda i: (0, 0))
    kernel = functools.partial(
        _single_word_kernel, cap=cap, topk=topk, paged=paged)
    grid = (bsz // q,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, cap), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            loc_spec,
        ],
        out_specs=[
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
            pl.BlockSpec((q, topk), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, topk), jnp.int32),
            jax.ShapeDtypeStruct((bsz, topk), jnp.float32),
            jax.ShapeDtypeStruct((bsz, topk), jnp.int32),
        ],
        interpret=interpret,
    )(a, na2, loc)


# ---------------------------------------------------------------------------
# CHUNKED locate: streams past the 1024-lane scoped-vmem budget
# ---------------------------------------------------------------------------
#
# The big-cap buckets (n = 2cap up to 65536) cannot hold a whole query
# row in VMEM, and Mosaic compilation of the unrolled log-step scans
# explodes past ~1024 lanes (measured round 3: >10 min at 2048). The
# chunked kernels iterate a SEQUENTIAL grid over fixed-width chunks of
# the stream, carrying per-row scalar state (previous kept value, open
# page run) in VMEM scratch across grid steps — Blelloch-style scan
# decomposition of ops/device_index._locate_core. One kernel launch
# replaces the XLA path's ~90 log-step scan launches per bucket
# (measured: the cap-1024 W2 bucket spent 1.2 of its 1.33 ms there).
#
# Page-run rank emission is START-anchored like _locate_core, with two
# twists that keep every decision chunk-local:
#  * a run still OPEN at chunk end is never emitted locally — it rides
#    the carry and is emitted by the chunk that closes it (side column,
#    ordered BEFORE that chunk's own slots: run starts ascend, so the
#    assembled slot order preserves _locate_core's tie-break order);
#  * the globally-last run flushes into a final side column.
# The assembled [B, K*(C+1) + 1] slot streams feed the same outside
# top-k extraction as the XLA path (lax.top_k picks lowest slot among
# rank ties — identical ordering).
#
# f32 prefix sums here are EXACT (counts and 30//gap bonuses are small
# integers, far below 2^24), so chunked accumulation is bit-identical
# to _locate_core's whole-stream cumsum.


def _chunked_locate_kernel(hv_ref, pg_ref, page_ref, rank_ref, cnt_ref,
                           sp_ref, sr_ref, sc_ref, ival_ref, fval_ref,
                           *, n_chunks: int):
    """One grid step: chunk c of the INF-masked kept stream.

    hv_ref: (Q, C) kept coordinate block (INF32 at dropped slots);
    pg_ref: (Q, C) page index per slot (computed OUTSIDE by one shared
    compare-all — in-kernel page lookup re-paid the [Q, C, P] compare
    per chunk and dominated at large n, measured 0.21x at n=65536).
    Outputs: per-slot (page, rank, count) for runs that start AND close
    in this chunk; side block (Q, 128): col 0 = carried-run close,
    col 1 = final flush (last chunk only).
    Scratch: ival (Q, 128) i32 [col 0 = prev kept val, col 1 = open
    page]; fval (Q, 128) f32 [col 0 = open count, col 1 = open bonus].
    """
    c = pl.program_id(1)
    q, C = hv_ref.shape
    lane = _iota((q, C), 1)

    @pl.when(c == 0)
    def _init():
        ival_ref[...] = jnp.full(ival_ref.shape, -1, jnp.int32)
        fval_ref[...] = jnp.zeros(fval_ref.shape, jnp.float32)

    hv = hv_ref[...]
    keep = hv < INF32
    page = pg_ref[...]

    carry_pv = ival_ref[:, 0][:, None]
    carry_op = ival_ref[:, 1][:, None]
    carry_cnt = fval_ref[:, 0][:, None]
    carry_bon = fval_ref[:, 1][:, None]

    # previous kept value/page (carry fills until the first local kept)
    pv_l = _shift_right_fill(_cummax(jnp.where(keep, hv, -1)),
                             np.int32(-1))
    has_l = pv_l >= 0
    pv = jnp.where(has_l, pv_l, carry_pv)
    pp_l = _shift_right_fill(_cummax(jnp.where(keep, page, -1)),
                             np.int32(-1))
    pp = jnp.where(has_l, pp_l, carry_op)

    first = jnp.logical_and(keep, page != pp)
    gap = jnp.where(pv >= 0, hv - pv, 0)
    bonus = jnp.where(
        jnp.logical_and(keep, ~first), 30 // jnp.maximum(5, gap), 0
    )
    # (bonus, count) prefix sums PACKED into one i32 scan set (both
    # non-decreasing; bonus <= 6*C, count <= C; count can reach EXACTLY
    # C on a fully-kept chunk, so the base must exceed C: 1<<13 holds
    # any chunk <= 4096 with max packed = 6*4096*8192 + 4096 < 2^31).
    # The reverse min at terminals picks the FIRST terminal's packed
    # value — both components at once. Values are small exact integers,
    # so the f32 conversions below are bit-identical to the f32 scans
    # they replace.
    _LPK = 1 << 13
    pk = _cumsum(bonus * _LPK + keep.astype(jnp.int32))
    cbon = (pk // _LPK).astype(jnp.float32)
    ccnt = (pk % _LPK).astype(jnp.float32)
    pk_prev = _shift_right_fill(pk, np.int32(0))
    cbon_prev = (pk_prev // _LPK).astype(jnp.float32)
    ccnt_prev = (pk_prev % _LPK).astype(jnp.float32)

    nf = _cumsum(first.astype(jnp.int32))
    # row tails of non-decreasing cumsums read as row maxes (a [:, -1]
    # column read lowers to an unsupported dynamic_slice in Mosaic)
    total_f = jnp.max(nf, axis=1, keepdims=True)
    f1 = jnp.logical_and(first, nf == 1)
    fl = jnp.logical_and(first, nf == total_f)

    # local terminals: slot before the next run start (the lane C-1
    # wrap is masked; the open run never emits locally anyway)
    term = _roll(first.astype(jnp.int32), -1) > 0
    term = jnp.logical_and(term, lane < C - 1)
    bigi = jnp.int32(np.iinfo(np.int32).max)
    pk_end = _rev_cummin(jnp.where(term, pk, bigi), bigi)
    cbon_end = jnp.where(
        pk_end < bigi, (pk_end // _LPK).astype(jnp.float32), 3.4e38)
    ccnt_end = jnp.where(
        pk_end < bigi, (pk_end % _LPK).astype(jnp.float32), 3.4e38)

    emit = jnp.logical_and(first, nf < total_f)
    run_bon = cbon_end - cbon
    run_cnt = ccnt_end - ccnt_prev
    page_ref[...] = jnp.where(emit, page, -1)
    rank_ref[...] = jnp.where(
        emit, 1.0 + run_bon + jnp.log(jnp.maximum(run_cnt, 1.0)), 0.0
    )
    cnt_ref[...] = jnp.where(emit, run_cnt, 0.0)

    # side col 0: the carried-in run closes at the first local start
    has_first = total_f > 0
    close_ok = jnp.logical_and(carry_op >= 0, has_first)
    cb1 = jnp.sum(jnp.where(f1, cbon_prev, 0.0), axis=1, keepdims=True)
    cc1 = jnp.sum(jnp.where(f1, ccnt_prev, 0.0), axis=1, keepdims=True)
    close_cnt = carry_cnt + cc1
    close_bon = carry_bon + cb1
    close_page = jnp.where(close_ok, carry_op, -1)
    close_rank = jnp.where(
        close_ok,
        1.0 + close_bon + jnp.log(jnp.maximum(close_cnt, 1.0)), 0.0
    )
    close_cnt_o = jnp.where(close_ok, close_cnt, 0.0)

    # carry update: the open run = last locally-started run, or the
    # incoming run extended (no local starts)
    cb_end = jnp.max(cbon, axis=1, keepdims=True)
    cc_end = jnp.max(ccnt, axis=1, keepdims=True)
    cb_l = jnp.sum(jnp.where(fl, cbon, 0.0), axis=1, keepdims=True)
    ccp_l = jnp.sum(jnp.where(fl, ccnt_prev, 0.0), axis=1, keepdims=True)
    pg_l = jnp.sum(jnp.where(fl, page, 0), axis=1, keepdims=True)
    new_op = jnp.where(has_first, pg_l, carry_op)
    new_cnt = jnp.where(has_first, cc_end - ccp_l, carry_cnt + cc_end)
    new_bon = jnp.where(has_first, cb_end - cb_l, carry_bon + cb_end)
    new_pv = jnp.maximum(
        carry_pv, jnp.max(jnp.where(keep, hv, -1), axis=1, keepdims=True)
    )
    ival_ref[:, 0] = new_pv[:, 0]
    ival_ref[:, 1] = new_op[:, 0]
    fval_ref[:, 0] = new_cnt[:, 0]
    fval_ref[:, 1] = new_bon[:, 0]

    # side col 1: final flush of the globally-last run. The side block
    # is (Q, 128) — Mosaic requires 128-lane output blocks — with only
    # cols 0 (carry close) and 1 (flush) meaningful
    is_last = c == n_chunks - 1
    flush_ok = jnp.logical_and(is_last, new_op >= 0)
    flush_page = jnp.where(flush_ok, new_op, -1)
    flush_rank = jnp.where(
        flush_ok,
        1.0 + new_bon + jnp.log(jnp.maximum(new_cnt, 1.0)), 0.0
    )
    flush_cnt = jnp.where(flush_ok, new_cnt, 0.0)
    slane = _iota((q, 128), 1)
    sp_ref[...] = jnp.where(
        slane == 0, close_page, jnp.where(slane == 1, flush_page, -1)
    )
    sr_ref[...] = jnp.where(
        slane == 0, close_rank, jnp.where(slane == 1, flush_rank, 0.0)
    )
    sc_ref[...] = jnp.where(
        slane == 0, close_cnt_o, jnp.where(slane == 1, flush_cnt, 0.0)
    )


import os as _os

CHUNK_LANES = int(_os.environ.get("DOCODO_CHUNK_LANES", "1024"))
CHUNK_Q = 8         # rows per program (sublane tile)


def _locate_rank_resident(hv, page, lane, C):
    """Resident locate body shared by _resident_locate_kernel and the
    fused merge+AND+locate kernel: the whole kept stream is resident,
    so the globally-last run terminates at a VIRTUAL terminal after the
    last lane (the fused AND's trick) and EVERY run emits in-stream at
    its start slot — exactly _locate_core's slot order, no side
    columns, no carries, no weave. Returns (page_s, rank_s, cnt_s)."""
    keep = hv < INF32
    pv = _shift_right_fill(_cummax(jnp.where(keep, hv, -1)),
                           np.int32(-1))
    pp = _shift_right_fill(_cummax(jnp.where(keep, page, -1)),
                           np.int32(-1))
    first = jnp.logical_and(keep, page != pp)
    gap = jnp.where(pv >= 0, hv - pv, 0)
    bonus = jnp.where(
        jnp.logical_and(keep, ~first), 30 // jnp.maximum(5, gap), 0
    )
    # (bonus, count) packed scans — see _chunked_locate_kernel. Base
    # 1<<13 > FUSED_AND_MAX: a fully-kept 4096-lane stream's final run
    # count reaches exactly 4096 and would wrap a 4096 base (count -> 0,
    # bonus +1)
    _LPK = 1 << 13
    pk = _cumsum(bonus * _LPK + keep.astype(jnp.int32))
    cbon = (pk // _LPK).astype(jnp.float32)
    pk_prev = _shift_right_fill(pk, np.int32(0))
    ccnt_prev = (pk_prev % _LPK).astype(jnp.float32)

    bigi = jnp.int32(np.iinfo(np.int32).max)
    nxt_first = _roll(first.astype(jnp.int32), -1)
    term = jnp.where(lane == C - 1, 1, nxt_first) > 0
    # a terminal always follows (virtual at C-1): pk_end < bigi
    pk_end = _rev_cummin(jnp.where(term, pk, bigi), bigi)
    cbon_end = (pk_end // _LPK).astype(jnp.float32)
    ccnt_end = (pk_end % _LPK).astype(jnp.float32)

    run_bon = cbon_end - cbon
    run_cnt = ccnt_end - ccnt_prev
    page_s = jnp.where(first, page, -1)
    rank_s = jnp.where(
        first, 1.0 + run_bon + jnp.log(jnp.maximum(run_cnt, 1.0)), 0.0
    )
    cnt_s = jnp.where(first, run_cnt, 0.0)
    return page_s, rank_s, cnt_s


def _resident_locate_kernel(hv_ref, pg_ref, page_ref, rank_ref,
                            cnt_ref):
    """ONE-chunk locate over an INF-masked kept stream (see
    _locate_rank_resident; the weave's 1-lane-offset concats defeated
    XLA's top_k operand fusion at k=1 — over this kernel's pow2 output
    it fuses clean)."""
    q, C = hv_ref.shape
    lane = _iota((q, C), 1)
    page_ref[...], rank_ref[...], cnt_ref[...] = _locate_rank_resident(
        hv_ref[...], pg_ref[...], lane, C
    )


def _compact_runs(stream, run_sel, kcap: int, chunk: int = 512):
    """Compact a sparse in-slot stream to its first `kcap` runs in slot
    order via chunked compare-all one-hots (no gathers — they serialize
    on TPU). run_sel[b, lane] = run ordinal at run starts, -1 elsewhere;
    each ordinal < kcap occurs at most once per row, so the one-hot sum
    picks exactly that run's value (0 where the row has fewer runs)."""
    b, n = stream.shape
    j = jnp.arange(kcap, dtype=jnp.int32)
    acc = jnp.zeros((b, kcap), dtype=stream.dtype)
    for c0 in range(0, n, chunk):
        c1 = min(c0 + chunk, n)
        sel = run_sel[:, None, c0:c1] == j[None, :, None]
        acc = acc + jnp.sum(
            jnp.where(sel, stream[:, None, c0:c1],
                      jnp.zeros((), dtype=stream.dtype)),
            axis=2,
        )
    return acc


def locate_streams_topk(page_s, rank_s, cnt_s, topk: int, bsz: int):
    """Top-k tail over in-slot locate streams (page/rank/count per run
    start, zeros elsewhere). Shared by the resident locate branch and
    the fused merge+AND+locate pipeline.

    The index-bearing lax.top_k over the FULL stream width was the
    single biggest stage of the dominant ru bucket (values-only top_k
    measured 1.08 ms at [5000, 2048] but its INDEX payload 4.46 ms —
    a sort with an iota operand). Runs are sparse and a SERVED row has
    n_pages <= topk by the truncation contract, so the streams first
    COMPACT to their first `topk` runs (chunked compare-all one-hots,
    slot order preserved), and the index-bearing top-k runs at width
    `topk`. Rows with more runs lose later runs here, but their exact
    full-width n_pages exceeds topk, so they always re-serve host-side.
    Tie-break parity: compacted run order IS slot order, so equal ranks
    resolve to the lowest slot exactly as the full-width top_k did."""
    pg_c, rk_c, ct_c, n_pages = compact_streams_topk(
        page_s, rank_s, cnt_s, topk
    )
    return streams_topk_tail(pg_c, rk_c, ct_c, n_pages, topk, bsz)


def compact_streams_topk(page_s, rank_s, cnt_s, topk: int):
    """The compaction half of locate_streams_topk: first-topk runs in
    slot order (chunked compare-all) + exact full-width n_pages,
    WITHOUT the top-k tail — deferred-tail callers batch ONE
    streams_topk_tail across all buckets."""
    start = rank_s > 0
    run_sel = jnp.where(
        start, jnp.cumsum(start.astype(jnp.int32), axis=1) - 1, -1
    )
    rk_c = _compact_runs(rank_s, run_sel, topk)
    pg_c = _compact_runs(page_s, run_sel, topk)
    ct_c = _compact_runs(cnt_s, run_sel, topk)
    n_pages = jnp.sum(start.astype(jnp.int32), axis=1)
    return pg_c, rk_c, ct_c, n_pages


def streams_topk_tail(pg_c, rk_c, ct_c, n_pages, topk: int, bsz: int):
    """Rank top-k over ALREADY-COMPACTED first-k run streams
    ([B, >=topk], slot order): the tiny index-bearing top_k + width-k
    slot selects shared by locate_streams_topk and the in-kernel
    compaction path (pallas_merge_and_locate_topk)."""
    top_rank, top_slot = topk_nonneg(rk_c[:, :topk], topk)
    valid_top = top_rank > 0
    top_page = jnp.where(
        valid_top, select_slots(pg_c[:, :topk], top_slot, chunk=topk),
        -1
    )
    top_cnt = jnp.where(
        valid_top, select_slots(ct_c[:, :topk], top_slot, chunk=topk),
        0.0
    ).astype(jnp.int32)
    return (top_page[:bsz], top_rank[:bsz], top_cnt[:bsz],
            n_pages[:bsz])


@functools.partial(jax.jit,
                   static_argnames=("topk", "chunk", "interpret", "raw",
                                    "resident", "tail"))
def pallas_chunked_locate(hv, bounds, *, topk: int,
                          chunk: int = CHUNK_LANES,
                          interpret: bool = False, pg=None,
                          raw: bool = False, resident=None,
                          tail: bool = True):
    """Locate+rank+topk over an INF-masked kept stream of ANY width
    (chunked sequential grid). Returns (pages, ranks, counts, n_pages)
    — the caller owns hits/n_hits (for a dense W=1 stream they are the
    stream itself; for an AND output the caller compacts).

    pg: optional per-slot page stream carried from the posting fetch
    (build_page_of) — skips the shared compare-all page lookup.

    raw: return the kernel's six output streams before the weave/top-k
    tail (stage profiling only).

    tail=False: return the COMPACTED first-topk-runs streams
    (pg_c, rk_c, ct_c, n_pages) instead of running streams_topk_tail —
    deferred-tail callers batch one tail across all buckets.
    """
    from jax.experimental.pallas import tpu as pltpu

    from docodo_tpu.ops.seqops import _rank_in_sorted

    bsz, n = hv.shape
    # RESIDENT mode: streams that fit the fused-AND budget run as ONE
    # chunk with more rows per program (q=32 at 2048 lanes) — the
    # chunked grid's per-program overhead (q=8, k chunks = b*k/8
    # programs) dominated the kernel at production widths (packing the
    # bonus/count scans measured ZERO full-pipeline change; widening
    # the programs is what moved the fused AND 4.53 -> 1.26 ms)
    if resident is None:
        resident = n <= FUSED_AND_MAX
    if resident:
        chunk = n + ((-n) % 128)
    cpad = (-n) % chunk  # asymmetric-cap streams are not pow2 sums
    if cpad:
        hv = jnp.concatenate(
            [hv, jnp.full((bsz, cpad), INF32, jnp.int32)], axis=1
        )
        if pg is not None:
            pg = jnp.concatenate(
                [pg, jnp.full((bsz, cpad), 0, jnp.int32)], axis=1
            )
        n += cpad
    k = n // chunk
    if pg is None:
        # page per slot: ONE shared compare-all over the un-padded rows
        pg = jax.vmap(
            lambda row: _rank_in_sorted(row, bounds, strict=False)
        )(hv)
        pg = jnp.minimum(pg, bounds.shape[0] - 1)
    else:
        # non-kept slots' pages are never read (the kernel gates every
        # use on keep), but clamp them anyway so padding carries a
        # valid page id
        pg = jnp.where(hv < INF32, pg, bounds.shape[0] - 1)
    if resident:
        q = max(8, min(32, (8192 // chunk) * 8))
        if bsz < q:
            q = max(8, ((bsz + 7) // 8) * 8)
    else:
        q = CHUNK_Q
    pad = (-bsz) % q
    if pad:
        hv = jnp.concatenate(
            [hv, jnp.full((pad, n), INF32, jnp.int32)]
        )
        pg = jnp.concatenate(
            [pg, jnp.full((pad, n), bounds.shape[0] - 1, jnp.int32)]
        )
    b = hv.shape[0]
    if resident:
        page_s, rank_s, cnt_s = pl.pallas_call(
            _resident_locate_kernel,
            grid=(b // q,),
            in_specs=[
                pl.BlockSpec((q, chunk), lambda i: (i, 0)),
                pl.BlockSpec((q, chunk), lambda i: (i, 0)),
            ],
            out_specs=[pl.BlockSpec((q, chunk), lambda i: (i, 0))] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((b, n), jnp.int32),
                jax.ShapeDtypeStruct((b, n), jnp.float32),
                jax.ShapeDtypeStruct((b, n), jnp.float32),
            ],
            interpret=interpret,
        )(hv, pg)
        if raw:
            return page_s, rank_s, cnt_s, None, None, None
        if not tail:
            pg_c, rk_c, ct_c, n_pages = compact_streams_topk(
                page_s, rank_s, cnt_s, topk
            )
            return pg_c[:bsz], rk_c[:bsz], ct_c[:bsz], n_pages[:bsz]
        return locate_streams_topk(page_s, rank_s, cnt_s, topk, bsz)
    grid = (b // q, k)
    kernel = functools.partial(_chunked_locate_kernel, n_chunks=k)
    page_s, rank_s, cnt_s, sp, sr, sc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, chunk), lambda i, c: (i, c)),
            pl.BlockSpec((q, chunk), lambda i, c: (i, c)),
        ],
        out_specs=[
            pl.BlockSpec((q, chunk), lambda i, c: (i, c)),
            pl.BlockSpec((q, chunk), lambda i, c: (i, c)),
            pl.BlockSpec((q, chunk), lambda i, c: (i, c)),
            pl.BlockSpec((q, 128), lambda i, c: (i, c)),
            pl.BlockSpec((q, 128), lambda i, c: (i, c)),
            pl.BlockSpec((q, 128), lambda i, c: (i, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n), jnp.int32),
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 128 * k), jnp.int32),
            jax.ShapeDtypeStruct((b, 128 * k), jnp.float32),
            jax.ShapeDtypeStruct((b, 128 * k), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q, 128), jnp.int32),
            pltpu.VMEM((q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(hv, pg)
    if raw:
        return page_s, rank_s, cnt_s, sp, sr, sc

    # assemble in _locate_core slot order: [carry-close_c | chunk_c]...
    # then the final flush — run starts ascend, so rank ties break
    # identically to the XLA stream order
    def weave(main, side, fillv):
        m = main.reshape(b, k, chunk)
        s = side[:, 0::128].reshape(b, k, 1)
        out = jnp.concatenate([s, m], axis=2).reshape(b, k * (chunk + 1))
        flush = side[:, (k - 1) * 128 + 1:(k - 1) * 128 + 2]
        return jnp.concatenate([out, flush], axis=1)

    pages_all = weave(page_s, sp, -1)
    ranks_all = weave(rank_s, sr, 0.0)
    cnts_all = weave(cnt_s, sc, 0.0)
    if not tail:
        pg_c, rk_c, ct_c, n_pages = compact_streams_topk(
            pages_all, ranks_all, cnts_all, topk
        )
        return pg_c[:bsz], rk_c[:bsz], ct_c[:bsz], n_pages[:bsz]
    # shared run-compacting top-k tail (narrow index-bearing top_k)
    return locate_streams_topk(pages_all, ranks_all, cnts_all, topk, bsz)


# ---------------------------------------------------------------------------
# CHUNKED proximity-AND: the _sorted_and_keep scans, chunk-streamed
# ---------------------------------------------------------------------------
#
# The keep decision for a segment needs the WHOLE segment (has_a & has_b
# at its end), so the chunked AND is two passes: a FORWARD kernel
# computing the prefix quantities (dup folding, gap + ordered-cut
# segmentation, operand-count prefixes and their values at segment
# starts) with per-row carries, and a BACKWARD kernel (reverse chunk
# order) resolving the value-at-next-terminal reverse mins and emitting
# the kept-hit stream. Mirrors ops/seqops.and_masked's sort branch +
# _segment_and bit-for-bit (prefix sums of 0/1 flags are exact in i32).


def _chunked_and_fwd_kernel(vals_ref, tag_ref, vals_r_ref, tag_r_ref,
                            ra_ref, rb_ref, flags_ref, cum_a_ref,
                            cum_b_ref, bef_a_ref, bef_b_ref, icar_ref,
                            *, n_total: int):
    """Forward pass over chunk c: emits per-slot flags (bit0 seg_start2,
    bit1 eff = valid & ~ghost), operand-count prefixes cum_a/cum_b and
    the prefix values at the enclosing segment start bef_a/bef_b.

    vals_r/tag_r: the stream rolled LEFT one lane (outside), giving the
    next-slot value without cross-block reads.
    icar scratch (Q, 128) i32: col 0 last val, 1 cum_a, 2 cum_b,
    3 before_at_start (ordered cut), 4 bef_a, 5 bef_b, 6 start idx."""
    c = pl.program_id(1)
    q, C = vals_ref.shape
    lane = _iota((q, C), 1)
    glane = lane + c * C

    @pl.when(c == 0)
    def _init():
        sl = _iota(icar_ref.shape, 1)
        icar_ref[...] = jnp.where(sl < 3, 0, -1)

    vals = vals_ref[...]
    tag = tag_ref[...]
    valid = vals < INF32
    isa = jnp.logical_and(tag == 0, valid)
    isb = jnp.logical_and(tag == 1, valid)

    carry_lv = icar_ref[:, 0][:, None]
    carry_ca = icar_ref[:, 1][:, None]
    carry_cb = icar_ref[:, 2][:, None]
    carry_bas = icar_ref[:, 3][:, None]
    carry_ba = icar_ref[:, 4][:, None]
    carry_bb = icar_ref[:, 5][:, None]
    carry_si = icar_ref[:, 6][:, None]

    prev_vals = _shift_right_fill(vals, np.int32(0))
    prev_vals = jnp.where(lane == 0, carry_lv, prev_vals)
    nxt_vals = vals_r_ref[...]
    nxt_vals = jnp.where(glane == n_total - 1, INF32, nxt_vals)
    nxt_tag = tag_r_ref[...]

    # cross-operand duplicate folding onto the first of the pair
    dup_prev = jnp.logical_and(vals == prev_vals, valid)
    dup_prev = jnp.logical_and(dup_prev, glane > 0)
    dup_next = jnp.logical_and(vals == nxt_vals, valid)
    nxt_valid = nxt_vals < INF32
    isa_next = jnp.logical_and(nxt_tag == 0, nxt_valid)
    isb_next = jnp.logical_and(nxt_tag == 1, nxt_valid)
    isa2 = jnp.logical_and(
        jnp.logical_or(isa, jnp.logical_and(dup_next, isa_next)),
        ~dup_prev,
    )
    isb2 = jnp.logical_and(
        jnp.logical_or(isb, jnp.logical_and(dup_next, isb_next)),
        ~dup_prev,
    )

    r1 = ra_ref[:, 0][:, None]
    r2 = rb_ref[:, 0][:, None]
    abs_r = jnp.maximum(jnp.abs(r1), jnp.abs(r2))
    ordered = jnp.logical_and(r1 < 0, r2 < 0)

    gap_prev = vals - jnp.where(glane == 0, 0, prev_vals)
    gap_cut = jnp.logical_and(abs_r != 0, gap_prev > abs_r)
    seg_start = jnp.logical_or(
        glane == 0, jnp.logical_and(gap_cut, valid)
    )

    cum_a = _cumsum(isa2.astype(jnp.int32)) + carry_ca
    cum_b = _cumsum(isb2.astype(jnp.int32)) + carry_cb

    # ordered-mode extra cut at the first A of each gap segment
    start_idx = jnp.maximum(
        _cummax(jnp.where(seg_start, glane, -1)), carry_si
    )
    before = cum_a - isa2.astype(jnp.int32)
    before_at_start = jnp.maximum(
        _cummax(jnp.where(seg_start, before, -1)), carry_bas
    )
    ordered_cut = jnp.logical_and(
        jnp.logical_and(isa2, (before - before_at_start) == 0),
        glane != start_idx,
    )
    seg_start2 = jnp.logical_or(
        seg_start, jnp.logical_and(ordered, ordered_cut)
    )

    prev_cum_a = _shift_right_fill(cum_a, np.int32(0))
    prev_cum_a = jnp.where(lane == 0, carry_ca, prev_cum_a)
    prev_cum_b = _shift_right_fill(cum_b, np.int32(0))
    prev_cum_b = jnp.where(lane == 0, carry_cb, prev_cum_b)
    bef_a = jnp.maximum(
        _cummax(jnp.where(seg_start2, prev_cum_a, -1)), carry_ba
    )
    bef_b = jnp.maximum(
        _cummax(jnp.where(seg_start2, prev_cum_b, -1)), carry_bb
    )

    eff = jnp.logical_and(valid, ~dup_prev)
    flags_ref[...] = (
        seg_start2.astype(jnp.int32) + 2 * eff.astype(jnp.int32)
    )
    cum_a_ref[...] = cum_a
    cum_b_ref[...] = cum_b
    bef_a_ref[...] = bef_a
    bef_b_ref[...] = bef_b

    slane = _iota((q, 128), 1)
    new = jnp.where(
        slane == 0,
        jnp.max(jnp.where(lane == C - 1, vals, np.int32(-(2 ** 31))),
                axis=1, keepdims=True),
        jnp.where(
            slane == 1, jnp.max(cum_a, axis=1, keepdims=True),
            jnp.where(
                slane == 2, jnp.max(cum_b, axis=1, keepdims=True),
                jnp.where(
                    slane == 3,
                    jnp.max(before_at_start, axis=1, keepdims=True),
                    jnp.where(
                        slane == 4,
                        jnp.max(bef_a, axis=1, keepdims=True),
                        jnp.where(
                            slane == 5,
                            jnp.max(bef_b, axis=1, keepdims=True),
                            jnp.max(start_idx, axis=1, keepdims=True),
                        ),
                    ),
                ),
            ),
        ),
    )
    icar_ref[...] = new


def _chunked_variants_fwd_kernel(vals_ref, tag_ref, ra_ref, rb_ref,
                                 bpad_ref, flags_ref, cum_a_ref,
                                 cum_b_ref, bef_a_ref, bef_b_ref,
                                 icar_ref, *, n_total: int):
    """Forward pass of the CHUNKED variants AND (W=2 words, each an OR
    of variants) — the chunk-streamed twin of _variants_and_keep for
    streams past FUSED_AND_MAX (ref Search.cs:226-247 variant sets).

    The resident kernel resolves "does this equal-coord run contain
    word A / word B" with span queries (prefix + reverse running min —
    a backward data dependency). Chunked forward needs those marks
    WITHOUT the reverse pass, and the merge sort makes that possible:
    the stream is sorted 2-key (coord, tag), so tags ASCEND within
    each run — "run contains A" is simply `run start opens with tag
    0`, and "run contains B" marks the run's FIRST tag-1 lane. Both
    are one-lane-local. A run never spans a gap-segment cut (equal
    coords have gap 0) and the ordered cut only fires at A marks (run
    starts), so moving the B increment inside its run never crosses a
    segment boundary and the per-segment (end - before) counts are
    unchanged — bit-parity with ops/seqops.and_variants_sorted.

    Word-B-padded rows (bpad: the AND is the identity on word A's
    deduped union) alias the B marks onto the A marks: every segment's
    has_a & has_b collapses to has_a and exactly the run starts keep.

    icar scratch (Q, 128) i32: col 0 last val, 1 cum_a, 2 cum_b,
    3 before_at_start (ordered cut), 4 bef_a, 5 bef_b, 6 start idx,
    7 last lane's tag (cross-chunk A->B transition detection)."""
    c = pl.program_id(1)
    q, C = vals_ref.shape
    lane = _iota((q, C), 1)
    glane = lane + c * C

    @pl.when(c == 0)
    def _init():
        sl = _iota(icar_ref.shape, 1)
        icar_ref[...] = jnp.where(
            sl < 3, 0, jnp.where(sl == 7, 2, -1)
        )

    vals = vals_ref[...]
    tag = tag_ref[...]
    valid = vals < INF32

    carry_lv = icar_ref[:, 0][:, None]
    carry_ca = icar_ref[:, 1][:, None]
    carry_cb = icar_ref[:, 2][:, None]
    carry_bas = icar_ref[:, 3][:, None]
    carry_ba = icar_ref[:, 4][:, None]
    carry_bb = icar_ref[:, 5][:, None]
    carry_si = icar_ref[:, 6][:, None]
    carry_lt = icar_ref[:, 7][:, None]

    prev_vals = _shift_right_fill(vals, np.int32(0))
    prev_vals = jnp.where(lane == 0, carry_lv, prev_vals)
    prev_tag = _shift_right_fill(tag, np.int32(2))
    prev_tag = jnp.where(lane == 0, carry_lt, prev_tag)

    new_coord = jnp.logical_or(vals != prev_vals, glane == 0)
    run_start = jnp.logical_and(valid, new_coord)
    isa2 = jnp.logical_and(run_start, tag == 0)
    isb2 = jnp.logical_and(
        jnp.logical_and(valid, tag == 1),
        jnp.logical_or(new_coord, prev_tag == 0),
    )
    # (broadcast select over i1 vectors trips Mosaic — select in i32)
    b_pad = bpad_ref[:, 0][:, None] > 0
    isb2 = jnp.where(
        b_pad, isa2.astype(jnp.int32), isb2.astype(jnp.int32)
    ) > 0

    r1 = ra_ref[:, 0][:, None]
    r2 = rb_ref[:, 0][:, None]
    abs_r = jnp.maximum(jnp.abs(r1), jnp.abs(r2))
    ordered = jnp.logical_and(r1 < 0, r2 < 0)

    gap_prev = vals - jnp.where(glane == 0, 0, prev_vals)
    gap_cut = jnp.logical_and(abs_r != 0, gap_prev > abs_r)
    seg_start = jnp.logical_or(
        glane == 0, jnp.logical_and(gap_cut, valid)
    )

    cum_a = _cumsum(isa2.astype(jnp.int32)) + carry_ca
    cum_b = _cumsum(isb2.astype(jnp.int32)) + carry_cb

    start_idx = jnp.maximum(
        _cummax(jnp.where(seg_start, glane, -1)), carry_si
    )
    before = cum_a - isa2.astype(jnp.int32)
    before_at_start = jnp.maximum(
        _cummax(jnp.where(seg_start, before, -1)), carry_bas
    )
    ordered_cut = jnp.logical_and(
        jnp.logical_and(isa2, (before - before_at_start) == 0),
        glane != start_idx,
    )
    seg_start2 = jnp.logical_or(
        seg_start, jnp.logical_and(ordered, ordered_cut)
    )

    prev_cum_a = _shift_right_fill(cum_a, np.int32(0))
    prev_cum_a = jnp.where(lane == 0, carry_ca, prev_cum_a)
    prev_cum_b = _shift_right_fill(cum_b, np.int32(0))
    prev_cum_b = jnp.where(lane == 0, carry_cb, prev_cum_b)
    bef_a = jnp.maximum(
        _cummax(jnp.where(seg_start2, prev_cum_a, -1)), carry_ba
    )
    bef_b = jnp.maximum(
        _cummax(jnp.where(seg_start2, prev_cum_b, -1)), carry_bb
    )

    # run starts are the representative (dedupe) slots
    flags_ref[...] = (
        seg_start2.astype(jnp.int32) + 2 * run_start.astype(jnp.int32)
    )
    cum_a_ref[...] = cum_a
    cum_b_ref[...] = cum_b
    bef_a_ref[...] = bef_a
    bef_b_ref[...] = bef_b

    nbig = np.int32(-(2 ** 31))
    slane = _iota((q, 128), 1)
    new = jnp.where(
        slane == 0,
        jnp.max(jnp.where(lane == C - 1, vals, nbig),
                axis=1, keepdims=True),
        jnp.where(
            slane == 1, jnp.max(cum_a, axis=1, keepdims=True),
            jnp.where(
                slane == 2, jnp.max(cum_b, axis=1, keepdims=True),
                jnp.where(
                    slane == 3,
                    jnp.max(before_at_start, axis=1, keepdims=True),
                    jnp.where(
                        slane == 4,
                        jnp.max(bef_a, axis=1, keepdims=True),
                        jnp.where(
                            slane == 5,
                            jnp.max(bef_b, axis=1, keepdims=True),
                            jnp.where(
                                slane == 6,
                                jnp.max(start_idx, axis=1,
                                        keepdims=True),
                                jnp.max(
                                    jnp.where(lane == C - 1, tag, nbig),
                                    axis=1, keepdims=True),
                            ),
                        ),
                    ),
                ),
            ),
        ),
    )
    icar_ref[...] = new


def _chunked_and_bwd_kernel(vals_ref, flags_ref, cum_a_ref, cum_b_ref,
                            bef_a_ref, bef_b_ref, hits_ref, icar_ref,
                            *, n_chunks: int):
    """Backward pass (chunks visited right-to-left): resolves the
    value-at-next-terminal reverse mins for cum_a/cum_b and emits the
    kept-hit stream (INF at dropped slots).
    icar scratch (Q, 128) i32: col 0 end_a-from-right, 1 end_b,
    2 seg_start2 of the right neighbour chunk's first lane."""
    g = pl.program_id(1)
    q, C = vals_ref.shape
    lane = _iota((q, C), 1)
    bigi = jnp.int32(np.iinfo(np.int32).max)

    @pl.when(g == 0)
    def _init():
        sl = _iota(icar_ref.shape, 1)
        # col 2 = 1: a virtual terminal after the global last lane
        icar_ref[...] = jnp.where(sl == 2, 1, bigi)

    carry_ea = icar_ref[:, 0][:, None]
    carry_eb = icar_ref[:, 1][:, None]
    carry_ss = icar_ref[:, 2][:, None]

    vals = vals_ref[...]
    flags = flags_ref[...]
    seg_start2 = (flags & 1) > 0
    eff = (flags & 2) > 0
    cum_a = cum_a_ref[...]
    cum_b = cum_b_ref[...]

    # terminal(i) = next slot is a segment start (right-carry at C-1;
    # selected in i32 — an i1-valued where trips Mosaic's truncation)
    nxt_ss = _roll(seg_start2.astype(jnp.int32), -1)
    terminal = jnp.where(lane == C - 1, carry_ss, nxt_ss) > 0
    end_a = jnp.minimum(
        _rev_cummin(jnp.where(terminal, cum_a, bigi), bigi), carry_ea
    )
    end_b = jnp.minimum(
        _rev_cummin(jnp.where(terminal, cum_b, bigi), bigi), carry_eb
    )
    keep = jnp.logical_and(
        jnp.logical_and(end_a - bef_a_ref[...] > 0,
                        end_b - bef_b_ref[...] > 0),
        eff,
    )
    hits_ref[...] = jnp.where(keep, vals, INF32)

    slane = _iota((q, 128), 1)
    ea0 = jnp.min(
        jnp.where(lane == 0, end_a, bigi), axis=1, keepdims=True
    )
    eb0 = jnp.min(
        jnp.where(lane == 0, end_b, bigi), axis=1, keepdims=True
    )
    ss0 = jnp.max(
        jnp.where(lane == 0, seg_start2.astype(jnp.int32), 0),
        axis=1, keepdims=True,
    )
    icar_ref[...] = jnp.where(
        slane == 0, ea0, jnp.where(slane == 1, eb0, ss0)
    )


def _bitonic_merge_kernel(x_ref, t_ref_in, p_ref_in,
                          v_ref, t_ref, p_ref, *, cap: int):
    """Merge one BITONIC (val, tag, pg) row — concat(a asc, b
    reversed), built OUTSIDE by XLA (Mosaic has no `rev` lowering) —
    into a stream sorted by (val, tag): log2(2cap) compare-exchange
    stages on resident rows, each one lane rotation + a lexicographic
    (val, tag) compare — no scans, no gathers. Equal (val, tag) keys
    carry equal page payloads (page is a function of the coordinate),
    so the bitonic network's instability cannot diverge from the
    stable lax.sort it replaces."""
    n = 2 * cap
    q = x_ref.shape[0]
    x = x_ref[...]
    t = t_ref_in[...]
    p = p_ref_in[...]
    lane = _iota((q, n), 1)
    d = n // 2
    while d >= 1:
        lo = (lane & d) == 0
        px_u, pt_u, pp_u = _roll(x, -d), _roll(t, -d), _roll(p, -d)
        px_d, pt_d, pp_d = _roll(x, d), _roll(t, d), _roll(p, d)
        px = jnp.where(lo, px_u, px_d)
        pt = jnp.where(lo, pt_u, pt_d)
        pp = jnp.where(lo, pp_u, pp_d)
        p_less = jnp.logical_or(
            px < x, jnp.logical_and(px == x, pt < t)
        )
        # (an i1-valued `where` trips Mosaic's truncation — logical ops)
        take = jnp.logical_or(
            jnp.logical_and(lo, p_less),
            jnp.logical_and(~lo, ~p_less),
        )
        x = jnp.where(take, px, x)
        t = jnp.where(take, pt, t)
        p = jnp.where(take, pp, p)
        d //= 2
    v_ref[...] = x
    t_ref[...] = t
    p_ref[...] = p


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def pallas_bitonic_merge(a, na, b, nb, apg, bpg, *, cap: int,
                         interpret: bool = False):
    """Tagged two-stream merge with page payloads: the Pallas twin of
    `lax.sort((concat, tag, pg), num_keys=2)` over per-word posting
    blocks (measured ~5 ms of the ru cap-1024 W2 bucket's 17 ms at
    [5000, 2048]; the bitonic network runs resident). Returns
    (vals, tag, pg) each [B, 2cap]."""
    bsz = a.shape[0]
    n = 2 * cap
    q = max(8, min(64, 8192 // n * 8))
    q = min(q, bsz)
    pad = (-bsz) % q
    if pad:
        a = jnp.concatenate([a, jnp.full((pad, cap), INF32, jnp.int32)])
        b = jnp.concatenate([b, jnp.full((pad, cap), INF32, jnp.int32)])
        na = jnp.concatenate([na, jnp.zeros((pad,), jnp.int32)])
        nb = jnp.concatenate([nb, jnp.zeros((pad,), jnp.int32)])
        apg = jnp.concatenate(
            [apg, jnp.full((pad, cap), INF32, jnp.int32)])
        bpg = jnp.concatenate(
            [bpg, jnp.full((pad, cap), INF32, jnp.int32)])
    bp = a.shape[0]
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (bp, cap), 1)
    nac = na[:, None]
    nbc = nb[:, None]
    av = jnp.where(lane_c < nac, a, INF32)
    bv = jnp.where(lane_c < nbc, b, INF32)
    ta = jnp.where(lane_c < nac, 0, 2).astype(jnp.int32)
    tb = jnp.where(lane_c < nbc, 1, 2).astype(jnp.int32)
    x0 = jnp.concatenate([av, jnp.flip(bv, axis=1)], axis=1)
    t0 = jnp.concatenate([ta, jnp.flip(tb, axis=1)], axis=1)
    p0 = jnp.concatenate([apg, jnp.flip(bpg, axis=1)], axis=1)
    grid = (bp // q,)
    kernel = functools.partial(_bitonic_merge_kernel, cap=cap)
    blk = lambda i: (i, 0)
    extra = {}
    if n >= 8192 and not interpret:
        from jax.experimental.pallas import tpu as pltpu

        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    v, t, p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((q, n), blk)] * 3,
        out_specs=[pl.BlockSpec((q, n), blk)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((bp, n), jnp.int32),
            jax.ShapeDtypeStruct((bp, n), jnp.int32),
            jax.ShapeDtypeStruct((bp, n), jnp.int32),
        ],
        interpret=interpret,
        **extra,
    )(x0, t0, p0)
    return v[:bsz], t[:bsz], p[:bsz]


def _fused_and_kernel(vals_ref, tag_ref, ra_ref, rb_ref, hits_ref):
    """ONE-pass full-width proximity-AND: the whole tagged stream is
    resident, so the forward prefix quantities and the backward
    value-at-next-terminal reverse mins of the two-pass chunked kernels
    resolve in the same program — no inter-chunk carries, no rolled
    input copies, no intermediate flag/prefix streams through HBM (the
    two-pass pipeline at the ru mix's [5000, 2048] spent 4.53 ms; the
    fwd alone re-reads 4 streams and writes 5). The body IS the
    resident kernels' _sorted_and_keep — packed scans with base 1<<15
    (counts <= 4096 < 2^15; lane*pack + before < 2^27), which matches
    _chunked_and_fwd_kernel + _chunked_and_bwd_kernel bit-for-bit with
    every carry at its init value (ref IndexSequence.cs:218-284 AND
    with dup folding, gap + ordered-cut segmentation)."""
    q, n = vals_ref.shape
    lane = _iota((q, n), 1)
    vals = vals_ref[...]
    keep = _sorted_and_keep(
        vals, tag_ref[...], ra_ref, rb_ref, lane, n, pack=1 << 15
    )
    hits_ref[...] = jnp.where(keep, vals, INF32)


def _fused_variants_and_kernel(vals_ref, tag_ref, ra_ref, rb_ref,
                               bpad_ref, hits_ref):
    """ONE-pass full-width VARIANTS proximity-AND: the word-tagged
    merged variant stream resident, run-dedupe + both-word span
    queries + the shared AND segmentation in one program — the fused
    (<=4096-lane) twin of the <=1024-lane variant slots kernels, for
    the oversize variant buckets that otherwise fall to the per-query
    XLA scan chains (PROFILE_WIDE_r05: the XLA group was 82% of the
    wide batch). Packed scans at base 1<<15 (prefix counts <= 4096)."""
    q, n = vals_ref.shape
    lane = _iota((q, n), 1)
    vals = vals_ref[...]
    keep = _variants_and_keep(
        vals, tag_ref[...], ra_ref, rb_ref, bpad_ref, lane, n,
        pack=1 << 15,
    )
    hits_ref[...] = jnp.where(keep, vals, INF32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_fused_variants_and(vals, tag, ra, rb, bpad, *,
                              interpret: bool = False):
    """One-pass full-width variants AND for word-tagged merged variant
    streams that fit resident (n <= FUSED_AND_MAX). vals/tag [B, n]
    (INF / tag-2 padded), ra/rb [B, 1] per-word windows, bpad [B, 1]
    word-B-padding flags. Returns the kept-hit stream (INF32 at
    dropped slots) — same contract as pallas_fused_and."""
    bsz, n = vals.shape
    lpad = (-n) % 128
    if lpad:
        vals = jnp.concatenate(
            [vals, jnp.full((bsz, lpad), INF32, jnp.int32)], axis=1
        )
        tag = jnp.concatenate(
            [tag, jnp.full((bsz, lpad), 2, jnp.int32)], axis=1
        )
        n += lpad
    q = max(8, min(32, (8192 // n) * 8))
    if bsz < q:
        q = max(8, ((bsz + 7) // 8) * 8)
    pad = (-bsz) % q
    if pad:
        vals = jnp.concatenate(
            [vals, jnp.full((pad, n), INF32, jnp.int32)]
        )
        tag = jnp.concatenate([tag, jnp.full((pad, n), 2, jnp.int32)])
        ra = jnp.concatenate([ra, jnp.ones((pad, 1), jnp.int32)])
        rb = jnp.concatenate([rb, jnp.ones((pad, 1), jnp.int32)])
        bpad = jnp.concatenate([bpad, jnp.zeros((pad, 1), jnp.int32)])
    b = vals.shape[0]
    hits = pl.pallas_call(
        _fused_variants_and_kernel,
        grid=(b // q,),
        in_specs=[
            pl.BlockSpec((q, n), lambda i: (i, 0)),
            pl.BlockSpec((q, n), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((q, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        interpret=interpret,
    )(vals, tag, ra, rb, bpad)
    return hits[:bsz, :n - lpad] if lpad else hits[:bsz]


FUSED_AND_MAX = int(_os.environ.get("DOCODO_FUSED_AND_MAX", "4096"))
# the resident kernels' packing invariants are sized for 4096-lane
# streams (_locate_rank_resident's 1<<13 run-count base, the fused
# AND's 1<<15 scan pack) — an env override past that must fail loudly,
# not corrupt ranks
if FUSED_AND_MAX > 4096:  # not assert: python -O must not strip this
    raise ValueError(
        f"DOCODO_FUSED_AND_MAX={FUSED_AND_MAX} exceeds the resident "
        "kernels' packed-scan bounds (max 4096)"
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_fused_and(vals, tag, ra, rb, *, interpret: bool = False):
    """One-pass full-width twin of pallas_chunked_and for streams that
    fit resident (n <= FUSED_AND_MAX; VMEM at q=32, n=2048 is ~3 MB of
    a ~16 MB core budget). Lane-pads to 128; INF padding cannot start
    segments or keep slots, and the virtual terminal propagates the
    final totals across it."""
    bsz, n = vals.shape
    lpad = (-n) % 128
    if lpad:
        vals = jnp.concatenate(
            [vals, jnp.full((bsz, lpad), INF32, jnp.int32)], axis=1
        )
        tag = jnp.concatenate(
            [tag, jnp.full((bsz, lpad), 2, jnp.int32)], axis=1
        )
        n += lpad
    q = max(8, min(32, (8192 // n) * 8))
    if bsz < q:
        q = max(8, ((bsz + 7) // 8) * 8)
    pad = (-bsz) % q
    if pad:
        vals = jnp.concatenate(
            [vals, jnp.full((pad, n), INF32, jnp.int32)]
        )
        tag = jnp.concatenate([tag, jnp.full((pad, n), 2, jnp.int32)])
        ra = jnp.concatenate([ra, jnp.ones((pad, 1), jnp.int32)])
        rb = jnp.concatenate([rb, jnp.ones((pad, 1), jnp.int32)])
    b = vals.shape[0]
    grid = (b // q,)
    hits = pl.pallas_call(
        _fused_and_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, n), lambda i: (i, 0)),
            pl.BlockSpec((q, n), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
            pl.BlockSpec((q, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((q, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        interpret=interpret,
    )(vals, tag, ra, rb)
    return hits[:bsz, :n - lpad] if lpad else hits[:bsz]


def _compact_left(payloads, fills, kp, lane, n):
    """In-kernel EXACT stream compaction: kept lanes move to the front
    in order via LSB-first masked log-shifts — O(log n) roll/select
    stages, no sort, no gathers, no compare-all. Each kept lane's
    distance d = #dropped lanes before it; processing bit b of d
    (computed ONCE) with a left-shift by 2^b is collision-free because
    for kept i < j, d[j] - d[i] <= j - i - 1 (lane i itself is kept),
    so intermediate positions l - (d & (2^(b+1)-1)) stay STRICTLY
    increasing. Measured vs the alternatives at the dominant ru shape
    [5000, 2048] (probe_compact_shift.py): as an XLA-level op this
    LOSES (6.2 vs 4.9 ms hits / 11.4 vs 2.9 ms runs — XLA materializes
    every stage through HBM), but resident in VMEM the stages are pure
    VPU rolls, replacing the 3.7 ms external hits sort and the 2.8 ms
    compare-all run compaction of the full-result tails."""
    ki = kp.astype(jnp.int32)  # Mosaic cannot rotate i1 vectors
    c = _cumsum(ki)
    # meta packs (d << 1 | kept): one rolled array carries both the
    # remaining shift distance and the kept flag
    meta = jnp.where(kp, ((lane - (c - 1)) << 1) | 1, 0)
    outs = list(payloads)
    s = 1
    while s < n:
        edge = lane < n - s
        sm = jnp.where(edge, _roll(meta, -s), 0)
        sbit = (s << 1) | 1
        inc = (sm & sbit) == sbit
        stay = (meta & sbit) == 1
        for i in range(len(outs)):
            sv = _roll(outs[i], -s)
            fl = jnp.full((), fills[i], outs[i].dtype)
            outs[i] = jnp.where(inc, sv, jnp.where(stay, outs[i], fl))
        meta = jnp.where(inc, sm, jnp.where(stay, meta, 0))
        s <<= 1
    return outs


def _merge_and_body(x, t, p, ra_ref, rb_ref, lane, n):
    """Shared body of the fused W=2 resident kernels: the bitonic
    two-stream merge (log2(n) lane-rotation compare-exchange stages
    over a concat(a asc, b reversed) row — _bitonic_merge_kernel's
    body) + the one-pass proximity-AND (_sorted_and_keep, packed
    scans). Returns (merged x, merged pages, keep flags)."""
    d = n // 2
    while d >= 1:
        lo = (lane & d) == 0
        px_u, pt_u, pp_u = _roll(x, -d), _roll(t, -d), _roll(p, -d)
        px_d, pt_d, pp_d = _roll(x, d), _roll(t, d), _roll(p, d)
        px = jnp.where(lo, px_u, px_d)
        pt = jnp.where(lo, pt_u, pt_d)
        pp = jnp.where(lo, pp_u, pp_d)
        p_less = jnp.logical_or(
            px < x, jnp.logical_and(px == x, pt < t)
        )
        take = jnp.logical_or(
            jnp.logical_and(lo, p_less),
            jnp.logical_and(~lo, ~p_less),
        )
        x = jnp.where(take, px, x)
        t = jnp.where(take, pt, t)
        p = jnp.where(take, pp, p)
        d //= 2
    keep = _sorted_and_keep(x, t, ra_ref, rb_ref, lane, n, pack=1 << 15)
    return x, p, keep


def _merge_and_locate_kernel(x_ref, t_ref_in, p_ref_in, ra_ref, rb_ref,
                             hits_ref, page_ref, rank_ref, cnt_ref,
                             *, cap: int):
    """Whole W=2 resident pipeline in ONE program: the bitonic
    two-stream merge, the one-pass proximity-AND, and the resident
    locate (_locate_rank_resident) — the merged stream, the kept-hit
    stream, and the locate inputs never leave VMEM (the three-kernel
    pipeline wrote and re-read each of them through HBM)."""
    n = 2 * cap
    q = x_ref.shape[0]
    lane = _iota((q, n), 1)
    x, p, keep = _merge_and_body(
        x_ref[...], t_ref_in[...], p_ref_in[...], ra_ref, rb_ref,
        lane, n
    )
    hv = jnp.where(keep, x, INF32)
    hits_ref[...] = hv
    page_ref[...], rank_ref[...], cnt_ref[...] = _locate_rank_resident(
        hv, p, lane, n
    )


def _merge_and_locate_topk_kernel(x_ref, t_ref_in, p_ref_in, ra_ref,
                                  rb_ref, hits_ref, page_ref, rank_ref,
                                  cnt_ref, nn_ref, *, cap: int,
                                  hpad: int, kpad: int):
    """The fused W=2 resident pipeline with IN-KERNEL tails: after
    merge+AND+locate, the kept-hit stream compacts to its first `hpad`
    kept values and the in-slot run streams compact to their first
    `kpad` runs (both via _compact_left — the full-width streams never
    reach HBM), and n_pages/n_hits reduce in-kernel (lanes 0/1 of
    nn_ref). Replaces the external full-width hits lax.sort (3.7 ms at
    [5000, 2048]) and locate_streams_topk's chunked compare-all run
    compaction (2.8 ms) AND shrinks the kernel's HBM writes from
    4x[B, n] to [B, hpad] + 3x[B, kpad] + [B, 128]. Output contracts
    match _locate_full_chunked + locate_streams_topk bit-for-bit:
    first-hpad kept hits (rows with more re-serve via exact n_hits),
    first-kpad runs in slot order (rows with more re-serve via exact
    n_pages)."""
    n = 2 * cap
    q = x_ref.shape[0]
    lane = _iota((q, n), 1)
    x, p, keep = _merge_and_body(
        x_ref[...], t_ref_in[...], p_ref_in[...], ra_ref, rb_ref,
        lane, n
    )
    hv = jnp.where(keep, x, INF32)
    page_s, rank_s, cnt_s = _locate_rank_resident(hv, p, lane, n)
    (hc,) = _compact_left((hv,), (INF32,), keep, lane, n)
    hits_ref[...] = hc[:, :hpad]
    first = rank_s > 0
    rc, pc, cc = _compact_left(
        (rank_s, page_s, cnt_s),
        (np.float32(0), np.int32(-1), np.float32(0)), first, lane, n
    )
    page_ref[...] = pc[:, :kpad]
    rank_ref[...] = rc[:, :kpad]
    cnt_ref[...] = cc[:, :kpad]
    npg = jnp.sum(first.astype(jnp.int32), axis=1, keepdims=True)
    nht = jnp.sum(keep.astype(jnp.int32), axis=1, keepdims=True)
    sl = _iota((q, 128), 1)
    nn_ref[...] = jnp.where(sl == 0, npg, jnp.where(sl == 1, nht, 0))


def _fused_prearrange(a, na, b, nb, apg, bpg, ra, rb, cap: int):
    """Shared input staging for the fused W=2 resident kernels: the
    bitonic pre-arrangement (concat(a asc, b reversed) — Mosaic has no
    `rev` lowering; XLA fuses the flip/concat into the kernel's input
    copy) plus row padding to the program height q."""
    bsz = a.shape[0]
    n = 2 * cap
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (bsz, cap), 1)
    nac, nbc = na[:, None], nb[:, None]
    av = jnp.where(lane_c < nac, a, INF32)
    bv = jnp.where(lane_c < nbc, b, INF32)
    ta = jnp.where(lane_c < nac, 0, 2).astype(jnp.int32)
    tb = jnp.where(lane_c < nbc, 1, 2).astype(jnp.int32)
    x0 = jnp.concatenate([av, jnp.flip(bv, axis=1)], axis=1)
    t0 = jnp.concatenate([ta, jnp.flip(tb, axis=1)], axis=1)
    p0 = jnp.concatenate([apg, jnp.flip(bpg, axis=1)], axis=1)
    q = max(8, min(32, (8192 // n) * 8))
    if bsz < q:
        q = max(8, ((bsz + 7) // 8) * 8)
    pad = (-bsz) % q
    if pad:
        x0 = jnp.concatenate([x0, jnp.full((pad, n), INF32, jnp.int32)])
        t0 = jnp.concatenate([t0, jnp.full((pad, n), 2, jnp.int32)])
        p0 = jnp.concatenate([p0, jnp.full((pad, n), INF32, jnp.int32)])
        ra = jnp.concatenate([ra, jnp.ones((pad, 1), jnp.int32)])
        rb = jnp.concatenate([rb, jnp.ones((pad, 1), jnp.int32)])
    return x0, t0, p0, ra, rb, q


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def pallas_merge_and_locate(a, na, b, nb, apg, bpg, ra, rb, *, cap: int,
                            interpret: bool = False):
    """Fused merge+AND+locate for carried equal-cap W=2 streams that
    fit resident (2*cap <= FUSED_AND_MAX). Takes the two per-word
    posting blocks with their carried page streams; returns
    (hits, page_s, rank_s, cnt_s) each [B, 2cap] — the kept-hit stream
    (INF32 at dropped slots, callers compact with one lax.sort) and the
    in-slot locate streams for locate_streams_topk. Bit-identical to
    pallas_bitonic_merge -> pallas_fused_and -> the resident chunked
    locate, without the three HBM round-trips between them
    (ref IndexSequence.cs:218-284 + Search.cs:365-420 semantics)."""
    bsz = a.shape[0]
    n = 2 * cap
    x0, t0, p0, ra, rb, q = _fused_prearrange(
        a, na, b, nb, apg, bpg, ra, rb, cap
    )
    bp = x0.shape[0]
    kernel = functools.partial(_merge_and_locate_kernel, cap=cap)
    blk = lambda i: (i, 0)
    hits, page_s, rank_s, cnt_s = pl.pallas_call(
        kernel,
        grid=(bp // q,),
        in_specs=[
            pl.BlockSpec((q, n), blk),
            pl.BlockSpec((q, n), blk),
            pl.BlockSpec((q, n), blk),
            pl.BlockSpec((q, 1), blk),
            pl.BlockSpec((q, 1), blk),
        ],
        out_specs=[pl.BlockSpec((q, n), blk)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((bp, n), jnp.int32),
            jax.ShapeDtypeStruct((bp, n), jnp.int32),
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
        ],
        interpret=interpret,
    )(x0, t0, p0, ra, rb)
    return hits[:bsz], page_s[:bsz], rank_s[:bsz], cnt_s[:bsz]


@functools.partial(jax.jit,
                   static_argnames=("cap", "hit_cap", "topk",
                                    "interpret"))
def pallas_merge_and_locate_topk(a, na, b, nb, apg, bpg, ra, rb, *,
                                 cap: int, hit_cap: int, topk: int = 128,
                                 interpret: bool = False):
    """Fused merge+AND+locate WITH in-kernel tails for carried
    equal-cap W=2 resident streams (2*cap <= FUSED_AND_MAX): the
    kept-hit compaction (first hit_cap kept values — replaces the
    external full-width lax.sort) and the first-k-runs compaction
    (replaces locate_streams_topk's chunked compare-all) both run as
    log-shift stages over the VMEM-resident stream (_compact_left),
    and n_pages/n_hits reduce in-kernel. Returns
    (hits [B, >=min(hit_cap, 2cap)], pg_c/rk_c/ct_c [B, >=topk],
    n_pages [B], n_hits [B]); the caller finishes with
    streams_topk_tail (a width-topk top-k) and crops/pads hits to
    hit_cap. The run streams compact to the first min(topk, 2cap) runs
    and pad to topk outside (escalated budgets reach topk=2048 — a
    hardcoded 128 here broke lax.top_k in streams_topk_tail, exactly
    the shape _full_stream_call_slots already handles). Bit-identical
    to pallas_merge_and_locate + lax.sort + locate_streams_topk for
    every served row
    (ref IndexSequence.cs:218-284 + Search.cs:365-420 semantics)."""
    bsz = a.shape[0]
    n = 2 * cap
    hpad = min(-(-hit_cap // 128) * 128, n)
    kpad = min(topk, n)
    x0, t0, p0, ra, rb, q = _fused_prearrange(
        a, na, b, nb, apg, bpg, ra, rb, cap
    )
    bp = x0.shape[0]
    kernel = functools.partial(
        _merge_and_locate_topk_kernel, cap=cap, hpad=hpad, kpad=kpad
    )
    blk = lambda i: (i, 0)
    hits, pg_c, rk_c, ct_c, nn = pl.pallas_call(
        kernel,
        grid=(bp // q,),
        in_specs=[
            pl.BlockSpec((q, n), blk),
            pl.BlockSpec((q, n), blk),
            pl.BlockSpec((q, n), blk),
            pl.BlockSpec((q, 1), blk),
            pl.BlockSpec((q, 1), blk),
        ],
        out_specs=[
            pl.BlockSpec((q, hpad), blk),
            pl.BlockSpec((q, kpad), blk),
            pl.BlockSpec((q, kpad), blk),
            pl.BlockSpec((q, kpad), blk),
            pl.BlockSpec((q, 128), blk),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, hpad), jnp.int32),
            jax.ShapeDtypeStruct((bp, kpad), jnp.int32),
            jax.ShapeDtypeStruct((bp, kpad), jnp.float32),
            jax.ShapeDtypeStruct((bp, kpad), jnp.float32),
            jax.ShapeDtypeStruct((bp, 128), jnp.int32),
        ],
        interpret=interpret,
    )(x0, t0, p0, ra, rb)
    hits, pg_c, rk_c, ct_c = hits[:bsz], pg_c[:bsz], rk_c[:bsz], ct_c[:bsz]
    if kpad < topk:
        zpad = topk - kpad
        pg_c = jnp.concatenate(
            [pg_c, jnp.full((bsz, zpad), -1, jnp.int32)], axis=1)
        rk_c = jnp.concatenate(
            [rk_c, jnp.zeros((bsz, zpad), jnp.float32)], axis=1)
        ct_c = jnp.concatenate(
            [ct_c, jnp.zeros((bsz, zpad), jnp.float32)], axis=1)
    return (hits, pg_c, rk_c, ct_c, nn[:bsz, 0], nn[:bsz, 1])


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def pallas_chunked_and(vals, tag, ra, rb, *, chunk: int = CHUNK_LANES,
                       interpret: bool = False):
    """Proximity-AND keep over a PRE-MERGED tagged stream of any width.
    Streams up to FUSED_AND_MAX lanes take the ONE-pass resident kernel
    (pallas_fused_and — measured 2.52 ms even as two single-chunk
    passes vs 4.53 chunked at [5000, 2048]); wider streams take the two
    chunk-streamed kernel passes. Returns the kept-hit stream (INF32 at
    dropped slots) — the input to pallas_chunked_locate and the hits
    compaction."""
    from jax.experimental.pallas import tpu as pltpu

    bsz, n = vals.shape
    if n <= FUSED_AND_MAX:
        return pallas_fused_and(vals, tag, ra, rb, interpret=interpret)
    cpad = (-n) % chunk
    if cpad:
        vals = jnp.concatenate(
            [vals, jnp.full((bsz, cpad), INF32, jnp.int32)], axis=1
        )
        tag = jnp.concatenate(
            [tag, jnp.full((bsz, cpad), 2, jnp.int32)], axis=1
        )
        n += cpad
    k = n // chunk
    q = CHUNK_Q
    pad = (-bsz) % q
    if pad:
        vals = jnp.concatenate(
            [vals, jnp.full((pad, n), INF32, jnp.int32)]
        )
        tag = jnp.concatenate([tag, jnp.full((pad, n), 2, jnp.int32)])
        ra = jnp.concatenate([ra, jnp.ones((pad, 1), jnp.int32)])
        rb = jnp.concatenate([rb, jnp.ones((pad, 1), jnp.int32)])
    b = vals.shape[0]
    vals_r = jnp.roll(vals, -1, axis=1)
    tag_r = jnp.roll(tag, -1, axis=1)
    grid = (b // q, k)
    fwd = functools.partial(_chunked_and_fwd_kernel, n_total=n)
    blk = lambda i, c: (i, c)
    flags, cum_a, cum_b, bef_a, bef_b = pl.pallas_call(
        fwd,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, chunk), blk),
            pl.BlockSpec((q, chunk), blk),
            pl.BlockSpec((q, chunk), blk),
            pl.BlockSpec((q, chunk), blk),
            pl.BlockSpec((q, 1), lambda i, c: (i, 0)),
            pl.BlockSpec((q, 1), lambda i, c: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((q, chunk), blk)] * 5,
        out_shape=[jax.ShapeDtypeStruct((b, n), jnp.int32)] * 5,
        scratch_shapes=[pltpu.VMEM((q, 128), jnp.int32)],
        interpret=interpret,
    )(vals, tag, vals_r, tag_r, ra, rb)

    bwd = functools.partial(_chunked_and_bwd_kernel, n_chunks=k)
    rblk = lambda i, c: (i, k - 1 - c)
    hits = pl.pallas_call(
        bwd,
        grid=grid,
        in_specs=[pl.BlockSpec((q, chunk), rblk)] * 6,
        out_specs=pl.BlockSpec((q, chunk), rblk),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((q, 128), jnp.int32)],
        interpret=interpret,
    )(vals, flags, cum_a, cum_b, bef_a, bef_b)
    return hits[:bsz]


def pallas_chunked_variants_and(vals, tag, ra, rb, bpad, *,
                                chunk: int = CHUNK_LANES,
                                interpret: bool = False):
    """Variants proximity-AND keep (W=2 words, each an OR of variants)
    over a PRE-MERGED word-tagged stream of ANY width: streams up to
    FUSED_AND_MAX lanes take the resident one-pass kernel
    (pallas_fused_variants_and); wider streams run the two
    chunk-streamed passes — the variants forward kernel (run-local
    representative marks, see _chunked_variants_fwd_kernel) and the
    SAME backward kernel as the plain chunked AND (the per-segment
    end-count resolution is mark-agnostic). Covers the giant V>1
    buckets (2*V*cap past 4096) that previously rode the XLA
    and_variants_sorted scan chains — PROFILE_WIDE_r05's dominant
    remaining cost (~34 ms of the 49.8 ms wide batch). Returns the
    kept-hit stream (INF32 at dropped slots), possibly chunk-padded
    wider than the input (padding lanes are INF)."""
    from jax.experimental.pallas import tpu as pltpu

    bsz, n = vals.shape
    if n <= FUSED_AND_MAX:
        return pallas_fused_variants_and(
            vals, tag, ra, rb, bpad, interpret=interpret)
    cpad = (-n) % chunk
    if cpad:
        vals = jnp.concatenate(
            [vals, jnp.full((bsz, cpad), INF32, jnp.int32)], axis=1
        )
        tag = jnp.concatenate(
            [tag, jnp.full((bsz, cpad), 2, jnp.int32)], axis=1
        )
        n += cpad
    k = n // chunk
    q = CHUNK_Q
    pad = (-bsz) % q
    if pad:
        vals = jnp.concatenate(
            [vals, jnp.full((pad, n), INF32, jnp.int32)]
        )
        tag = jnp.concatenate([tag, jnp.full((pad, n), 2, jnp.int32)])
        ra = jnp.concatenate([ra, jnp.ones((pad, 1), jnp.int32)])
        rb = jnp.concatenate([rb, jnp.ones((pad, 1), jnp.int32)])
        bpad = jnp.concatenate([bpad, jnp.zeros((pad, 1), jnp.int32)])
    b = vals.shape[0]
    grid = (b // q, k)
    fwd = functools.partial(_chunked_variants_fwd_kernel, n_total=n)
    blk = lambda i, c: (i, c)
    flags, cum_a, cum_b, bef_a, bef_b = pl.pallas_call(
        fwd,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, chunk), blk),
            pl.BlockSpec((q, chunk), blk),
            pl.BlockSpec((q, 1), lambda i, c: (i, 0)),
            pl.BlockSpec((q, 1), lambda i, c: (i, 0)),
            pl.BlockSpec((q, 1), lambda i, c: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((q, chunk), blk)] * 5,
        out_shape=[jax.ShapeDtypeStruct((b, n), jnp.int32)] * 5,
        scratch_shapes=[pltpu.VMEM((q, 128), jnp.int32)],
        interpret=interpret,
    )(vals, tag, ra, rb, bpad)

    bwd = functools.partial(_chunked_and_bwd_kernel, n_chunks=k)
    rblk = lambda i, c: (i, k - 1 - c)
    hits = pl.pallas_call(
        bwd,
        grid=grid,
        in_specs=[pl.BlockSpec((q, chunk), rblk)] * 6,
        out_specs=pl.BlockSpec((q, chunk), rblk),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((q, 128), jnp.int32)],
        interpret=interpret,
    )(vals, flags, cum_a, cum_b, bef_a, bef_b)
    return hits[:bsz]
