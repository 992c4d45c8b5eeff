"""Device posting algebra: jit-compiled twins of core/postings.py.

The host algebra is sequential-looking; here the same semantics run as
fixed-shape array programs that XLA fuses and vmaps:

* a posting operand is (coords int32[P] padded with INT32_MAX, n, R);
* AND = sort-merge + gap segmentation (cumsum/cummax scans) + per-segment
  both-operands test (segment_max) + compaction (second sort);
* OR  = sort-merge + cross-operand dedupe + compaction.

Device lists are assumed strictly ascending (true for any real index term:
one coordinate per occurrence) — the host oracle covers the general
multiset case. All shapes are static: shapes come from bucketized posting
capacities, so each (P1, P2) pair compiles once and is reused.

Semantics match ref Docodo.NET/IndexSequence.cs:218-322; see
core/postings.py for the derivation of the closed-form ordered-mode cut.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INF32 = np.int32(np.iinfo(np.int32).max)


def topk_nonneg(ranks, k: int):
    """lax.top_k keyed on the i32 BITCAST of non-negative f32 ranks —
    order-preserving (sign bit clear, IEEE magnitude order = integer
    order) and ~12x faster on TPU, where top_k/sort comparators over
    f32 dominate (measured 4.92 -> 0.39 ms over a [5000, 2048] rank
    stream). Tie-break (lowest slot) and values are bit-identical."""
    bits, slot = jax.lax.top_k(
        jax.lax.bitcast_convert_type(ranks, jnp.int32), k)
    return jax.lax.bitcast_convert_type(bits, jnp.float32), slot


def select_slots(stream, slots, chunk: int = 512):
    """stream[B, n] read at slots[B, k] -> [B, k] WITHOUT per-element
    gathers: batched take_along_axis serializes on TPU (measured ~5 ms
    for two k=16 extractions over a [5000, 2048] stream — it was the
    single biggest stage of the dominant ru bucket); the chunked
    compare-all one-hot reduce runs vectorized on the VPU (~1e9 lane
    ops here, sub-ms). Each slot index must occur once per row — the
    sum over the one-hot picks exactly that element."""
    b, n = stream.shape
    k = slots.shape[1]
    acc = jnp.zeros((b, k), dtype=stream.dtype)
    for c0 in range(0, n, chunk):
        c1 = min(c0 + chunk, n)
        lane = jnp.arange(c0, c1, dtype=jnp.int32)
        eq = slots[:, :, None] == lane[None, None, :]
        acc = acc + jnp.sum(
            jnp.where(eq, stream[:, None, c0:c1],
                      jnp.zeros((), dtype=stream.dtype)),
            axis=2,
        )
    return acc


def pad_to(coords, cap: int):
    """Pad an ascending int array to `cap` with INF sentinels."""
    coords = np.asarray(coords, dtype=np.int64)
    n = min(coords.size, cap)
    out = np.full(cap, INF32, dtype=np.int32)
    out[:n] = coords[:n]
    return out, np.int32(n)


def _compare_all_max() -> int:
    """Operand size up to which chunked compare-all ranks beat the
    sort-merge (measured crossover on TPU v5e; DOCODO_COMPARE_ALL_MAX
    overrides for tuning)."""
    import os

    return int(os.environ.get("DOCODO_COMPARE_ALL_MAX", _COMPARE_ALL_MAX))


_COMPARE_ALL_MAX = 4096   # up to here, chunked compare-all beats gathers
_COMPARE_CHUNK = 512


def _use_compare_all() -> bool:
    """Compare-all ranks are a TPU win (gathers serialize there) but a
    CPU/GPU loss — XLA materializes the [n, m] broadcast on those
    backends (measured: a CPU-mesh query phase went 5s -> 534s/25 GB).
    DOCODO_COMPARE_ALL=1/0 overrides for testing."""
    import os

    env = os.environ.get("DOCODO_COMPARE_ALL")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def _rank_in_sorted(queries, sorted_vals, strict: bool,
                    ca_max: int = None):
    """#{j: sorted_vals[j] < queries[i]} (strict) or <= (not strict).

    For small/mid arrays on TPU this is a CHUNKED COMPARE-ALL (broadcast
    compare + reduce — pure VPU work); binary-search gathers serialize
    badly on TPU, so they are reserved for large arrays where the
    O(n^2) compare would dominate. Non-TPU backends always take the
    binary-search path (see _use_compare_all).
    """
    m = sorted_vals.shape[-1]
    if m <= (ca_max if ca_max is not None else _compare_all_max()) and _use_compare_all():
        acc = jnp.zeros(queries.shape, jnp.int32)
        for j0 in range(0, m, _COMPARE_CHUNK):
            block = sorted_vals[j0: j0 + _COMPARE_CHUNK]
            cmp = (
                block[None, :] < queries[:, None] if strict
                else block[None, :] <= queries[:, None]
            )
            acc = acc + jnp.sum(cmp, axis=-1).astype(jnp.int32)
        return acc
    side = "left" if strict else "right"
    return jnp.searchsorted(
        sorted_vals, queries, side=side, method="scan_unrolled"
    ).astype(jnp.int32)


def _place_by_rank(rank, src, tag, n: int):
    """Gather-free placement: out[k] = sum_i src[i] * (rank[i]==k),
    chunked over the output axis. `rank` values are unique.

    Returns ((vals int32[n], placed int32[n]), tagged bool[n])."""
    vals_parts, placed_parts, tag_parts = [], [], []
    tag_i = tag.astype(jnp.int32)
    for k0 in range(0, n, _COMPARE_CHUNK):
        w = min(_COMPARE_CHUNK, n - k0)
        kk = jnp.arange(k0, k0 + w, dtype=jnp.int32)
        oh = rank[:, None] == kk[None, :]
        vals_parts.append(jnp.sum(jnp.where(oh, src[:, None], 0), axis=0))
        placed_parts.append(jnp.sum(oh, axis=0).astype(jnp.int32))
        tag_parts.append(
            jnp.sum(jnp.where(oh, tag_i[:, None], 0), axis=0)
        )
    return (
        (jnp.concatenate(vals_parts), jnp.concatenate(placed_parts)),
        jnp.concatenate(tag_parts) > 0,
    )


def compact_mask(vals, mask, out_cap: int, ca_max: int = None):
    """Stable compaction of an ASCENDING masked stream into the first
    `out_cap` slots (INF32-padded): out[k] = k-th masked value.

    On TPU (small/mid streams) this is the chunked one-hot placement —
    the rank of each kept slot is a prefix sum, placement is a broadcast
    compare + reduce, no gathers/scatters/sorts. Elsewhere (or for large
    streams) one `lax.sort` of the INF-masked stream compacts it, since
    ascending order makes masking + sorting a stable partition.

    (A p x out_cap one-hot for long-stream/small-buffer shapes measured
    NEUTRAL on TPU v5e — the sort path stays for p > 2*ca_max.)
    """
    p = vals.shape[0]
    if p <= 2 * (ca_max if ca_max is not None else _compare_all_max()) and _use_compare_all():
        rank = jnp.where(
            mask, jnp.cumsum(mask.astype(jnp.int32)) - 1, out_cap
        )
        (out, placed), _ = _place_by_rank(rank, vals, mask, out_cap)
        return jnp.where(placed > 0, out, INF32)
    out = jax.lax.sort(jnp.where(mask, vals, INF32))[:out_cap]
    if out_cap > p:
        out = jnp.concatenate(
            [out, jnp.full(out_cap - p, INF32, dtype=vals.dtype)]
        )
    return out


def combine_r(r1, r2):
    """Result window: max magnitude; ordered only if both ordered."""
    abs_r = jnp.maximum(jnp.abs(r1), jnp.abs(r2))
    return jnp.where((r1 < 0) & (r2 < 0), -abs_r, abs_r)


def _merge_sorted_tagged(a, na, b, nb, ca_max: int = None):
    """Merge two padded ascending lists; returns (vals, isa, isb, ghost,
    valid) with cross-operand duplicates merged onto their first element
    and the second marked ghost.

    TPU-shaped and SCATTER-FREE (vmapped scatters serialize on TPU):
    each a-element's merged rank is its index plus its binary-search rank
    in b (ties: a first); a second binary search inverts that rank list
    so every merged slot GATHERS its value — two log-depth searches plus
    gathers, no bitonic sort, no scatter.
    """
    p1, p2 = a.shape[0], b.shape[0]
    n = p1 + p2
    ia = jnp.arange(p1, dtype=jnp.int32) < na
    ib = jnp.arange(p2, dtype=jnp.int32) < nb
    av = jnp.where(ia, a, INF32)
    bv = jnp.where(ib, b, INF32)
    if n <= 2 * (ca_max if ca_max is not None else _compare_all_max()) and _use_compare_all():
        # place both operands at their merged ranks by chunked one-hot
        # reduction — fully gather-free (rb mirrors ra with <= ties)
        ra = jnp.arange(p1, dtype=jnp.int32) + _rank_in_sorted(
            av, bv, strict=True
        )
        rb = jnp.arange(p2, dtype=jnp.int32) + _rank_in_sorted(
            bv, av, strict=False
        )
        (va, pa), isa = _place_by_rank(ra, av, ia, n)
        (vb, pb), isb = _place_by_rank(rb, bv, ib, n)
        placed = pa + pb
        vals = jnp.where(placed > 0, va + vb, INF32)
        valid = vals < INF32
    elif _use_compare_all():
        # LARGE operands on TPU: one lax.sort of the tagged
        # concatenation IS the merge. The log-depth searchsorted scan
        # costs ~10 ms/query at 16-32k postings (measured) while the
        # native sort runs at GB/s; ties sort a (tag 0) before b,
        # matching the compare-all tie rule
        tag = jnp.concatenate([
            jnp.zeros(p1, jnp.int32), jnp.ones(p2, jnp.int32)
        ])
        vals, tag_s = jax.lax.sort(
            (jnp.concatenate([av, bv]), tag), num_keys=2
        )
        valid = vals < INF32
        isa = (tag_s == 0) & valid
        isb = (tag_s == 1) & valid
    else:
        ra = jnp.arange(p1, dtype=jnp.int32) + _rank_in_sorted(
            av, bv, strict=True
        )
        k = jnp.arange(n, dtype=jnp.int32)
        # ca[k] = #a-elements at merged rank <= k (ra is ascending)
        ca = _rank_in_sorted(k, ra, strict=False)
        ai = jnp.clip(ca - 1, 0, p1 - 1)
        from_a = (ca > 0) & (ra[ai] == k)
        bi = jnp.clip(k - ca, 0, p2 - 1)
        vals = jnp.where(from_a, av[ai], bv[bi])
        isa = from_a & ia[ai]
        isb = (~from_a) & ib[bi]
        valid = vals < INF32
    prev = jnp.concatenate([jnp.array([-1], dtype=vals.dtype), vals[:-1]])
    nxt = jnp.concatenate([vals[1:], jnp.array([INF32], dtype=vals.dtype)])
    dup_prev = (vals == prev) & valid
    dup_next = (vals == nxt) & valid
    # merge tags of the pair onto the first element
    isa_next = jnp.concatenate([isa[1:], jnp.array([False])])
    isb_next = jnp.concatenate([isb[1:], jnp.array([False])])
    isa = (isa | (dup_next & isa_next)) & ~dup_prev
    isb = (isb | (dup_next & isb_next)) & ~dup_prev
    return vals, isa, isb, dup_prev, valid


def _compact(vals, keep, out_cap=None):
    """Move kept values to the front (ascending), count them.

    With `out_cap` < len(vals) the result is truncated to the `out_cap`
    lowest coordinates (the reference analogously caps result streams,
    ref Index.cs:101-102 MAX_FOUND_PAGES/DOCS).
    """
    out = jnp.where(keep, vals, INF32)
    out = jax.lax.sort(out)
    n = jnp.sum(keep).astype(jnp.int32)
    if out_cap is not None and out_cap < out.shape[0]:
        out = out[:out_cap]
        n = jnp.minimum(n, out_cap)
    return out, n


def _span_contains(marks, starts, terminals):
    """For every slot, whether its enclosing [start..terminal] span
    contains a marked slot. Spans are CONTIGUOUS and the prefix sum
    NON-DECREASING, so "prefix before the span" is a running max of the
    shifted prefix at starts and "prefix at the span end" a reverse
    running min over terminals — no gathers, no scatters, no segment
    ops. Shared by the gap-segment containment test and the run-dedupe
    tag union."""
    bigi = jnp.int32(np.iinfo(np.int32).max)
    cum = jnp.cumsum(marks.astype(jnp.int32))
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), cum[:-1]])
    before = jax.lax.cummax(jnp.where(starts, prev, -1))
    end = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(terminals, cum, bigi))
    ))
    return end - before > 0


def _segment_and(vals, isa, isb, ghost, valid, r):
    """Group segmentation + both-operands containment over a MERGED
    tagged stream (the algorithmic half of and_masked, shared by the
    pairwise merge path and the flat tagged-sort variant path)."""
    abs_r = jnp.abs(r)
    n = vals.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    prev = jnp.concatenate([jnp.array([0], dtype=vals.dtype), vals[:-1]])
    gap_cut = jnp.where(abs_r != 0, (vals - prev) > abs_r, False)
    seg_start = (idx == 0) | (gap_cut & valid)

    # ordered-mode extra cut: first A-tagged element of each gap segment,
    # unless it already starts the segment (ghosts carry no tags).
    # `before` is NON-DECREASING, so its value at the latest segment
    # start propagates via a running max — no gather.
    def with_ordered_cuts():
        start_idx = jax.lax.cummax(jnp.where(seg_start, idx, -1))
        cum_a = jnp.cumsum(isa.astype(jnp.int32))
        before = cum_a - isa.astype(jnp.int32)
        before_at_start = jax.lax.cummax(
            jnp.where(seg_start, before, -1)
        )
        prev_a_in_seg = before - before_at_start
        ordered_cut = isa & (prev_a_in_seg == 0) & (idx != start_idx)
        return seg_start | ordered_cut

    seg_start2 = jnp.where(r < 0, with_ordered_cuts(), seg_start)

    terminal = jnp.concatenate(
        [seg_start2[1:], jnp.ones(1, dtype=bool)]
    )
    seg_has_a = _span_contains(isa, seg_start2, terminal)
    seg_has_b = _span_contains(isb, seg_start2, terminal)
    keep = seg_has_a & seg_has_b & valid & ~ghost
    return vals, keep, r


def and_masked(a, na, ra, b, nb, rb, ca_max: int = None):
    """Proximity-AND core without compaction.

    Returns (vals int32[P1+P2] ascending incl. dropped slots, keep mask,
    r). `vals` is the full merged stream; downstream consumers either
    compact (device_and) or run the masked locate/rank pipeline directly
    (locate_topk_masked) — skipping the compaction sort entirely.
    """
    r = combine_r(ra, rb)
    vals, isa, isb, ghost, valid = _merge_sorted_tagged(
        a, na, b, nb, ca_max
    )
    return _segment_and(vals, isa, isb, ghost, valid, r)


def and_variants_sorted(streams_a, na, ra, streams_b, nb, rb,
                        b_pad=False):
    """Proximity-AND of two VARIANT-OR operands in one shot: instead of
    per-word OR-merge + compaction + pairwise AND (three merge-class
    stages), ONE lax.sort of every variant stream tagged by word, then a
    run-dedupe that folds all same-coordinate entries (across variants
    AND across words) onto one representative carrying the union of
    word tags — exactly the host fold's semantics, where each word's
    variant OR dedupes first and the AND then ghosts cross-word pairs.

    streams_a: int32[Va, cap] INF-padded variant postings of word A
    na:        int32[Va] lengths (a padded variant row has length 0)
    streams_b / nb: same for word B;  ra/rb: per-word windows.
    b_pad: traced bool — word B's slot is QUERY PADDING (all ids -1), in
    which case the AND is the identity and the result is word A's union
    (the padded word's streams are empty, so the deduped union stream IS
    word A). Mirrors eval_and_query_variants' skip semantics.
    Returns (vals [cap*(Va+Vb)] ascending, keep, r).
    """
    va, cap = streams_a.shape
    vb = streams_b.shape[0]
    lane = jnp.arange(cap, dtype=jnp.int32)
    av = jnp.where(lane[None, :] < na[:, None], streams_a, INF32)
    bv = jnp.where(lane[None, :] < nb[:, None], streams_b, INF32)
    vals_cat = jnp.concatenate([av.reshape(-1), bv.reshape(-1)])
    tag = jnp.concatenate([
        jnp.zeros(va * cap, jnp.int32), jnp.ones(vb * cap, jnp.int32)
    ])
    # ties sort word A (tag 0) first, mirroring the pairwise tie rule
    vals, tag = jax.lax.sort((vals_cat, tag), num_keys=2)
    valid = vals < INF32
    is0 = (tag == 0) & valid
    is1 = (tag == 1) & valid

    # run-dedupe: a COORDINATE may appear in several variants of one
    # word and in both words; the first slot of each equal-value run
    # becomes the representative, tagged with every word present in
    # the run (prefix-difference over run boundaries — no gathers)
    prev = jnp.concatenate([jnp.full(1, -1, vals.dtype), vals[:-1]])
    run_start = valid & (vals != prev)
    terminal = jnp.concatenate([run_start[1:] | ~valid[1:],
                                jnp.ones(1, dtype=bool)])
    isa = run_start & _span_contains(is0, run_start, terminal)
    isb = run_start & _span_contains(is1, run_start, terminal)
    ghost = valid & ~run_start
    r = combine_r(ra, rb)
    vals_o, keep_o, r_o = _segment_and(vals, isa, isb, ghost, valid, r)
    # padded word B: identity fold — keep word A's deduped union
    keep_o = jnp.where(jnp.asarray(b_pad), run_start & valid, keep_o)
    r_o = jnp.where(jnp.asarray(b_pad), ra, r_o)
    return vals_o, keep_o, r_o


def or_variants_sorted(streams, ns):
    """Union of V variant posting streams of ONE word: one lax.sort of
    the concatenation, keep the first slot of each equal-value run
    (variants share coordinates whenever a token carries several codes).
    Returns (vals [V*cap] ascending, keep)."""
    v, cap = streams.shape
    lane = jnp.arange(cap, dtype=jnp.int32)
    sv = jnp.where(lane[None, :] < ns[:, None], streams, INF32)
    vals = jax.lax.sort(sv.reshape(-1))
    valid = vals < INF32
    prev = jnp.concatenate([jnp.full(1, -1, vals.dtype), vals[:-1]])
    keep = valid & (vals != prev)
    return vals, keep


@functools.partial(jax.jit, static_argnames=("out_cap",))
def device_and(a, na, ra, b, nb, rb, out_cap=None):
    """Proximity-AND with group emission (both operands' coordinates).

    Returns (coords int32[out_cap or P1+P2] padded, n, r).
    """
    vals, keep, r = and_masked(a, na, ra, b, nb, rb)
    out, cnt = _compact(vals, keep, out_cap)
    return out, cnt, r


def or_masked(a, na, ra, b, nb, rb, ca_max: int = None):
    """OR-merge core without compaction: (vals ascending, keep, r)."""
    r = combine_r(ra, rb)
    vals, isa, isb, ghost, valid = _merge_sorted_tagged(
        a, na, b, nb, ca_max
    )
    keep = valid & ~ghost
    return vals, keep, r


@functools.partial(jax.jit, static_argnames=("out_cap",))
def device_or(a, na, ra, b, nb, rb, out_cap=None):
    """OR-merge with cross-operand dedupe. Returns (coords, n, r)."""
    vals, keep, r = or_masked(a, na, ra, b, nb, rb)
    out, cnt = _compact(vals, keep, out_cap)
    return out, cnt, r


# vmapped batch forms: operands stacked on a leading query axis
batch_and = jax.jit(jax.vmap(device_and, in_axes=(0, 0, 0, 0, 0, 0)))
batch_or = jax.jit(jax.vmap(device_or, in_axes=(0, 0, 0, 0, 0, 0)))


@functools.partial(jax.jit, static_argnames=("max_pages",))
def device_locate_rank(coords, n, bounds, page_doc, max_pages: int):
    """Device result pipeline: coordinate stream -> per-page hit stats.

    For each hit: page = searchsorted(bounds, coord, 'right'); position =
    coord - page base. Page rank = 1 + sum(30 // max(5, gap)) + ln(count)
    over the page's hit run (integer division, matching the reference,
    ref Search.cs:99-111).

    Returns (page_idx[P], pos[P], first_hit_mask[P], page_rank[P]) where
    page_rank is nonzero only at each page run's first hit.
    """
    p = coords.shape[0]
    valid = jnp.arange(p, dtype=jnp.int32) < n
    page = jnp.searchsorted(bounds, coords, side="right").astype(jnp.int32)
    page = jnp.minimum(page, bounds.shape[0] - 1)
    base = jnp.where(page > 0, bounds[jnp.maximum(page - 1, 0)], 0)
    pos = jnp.where(valid, coords - base, 0)

    prev_page = jnp.concatenate([jnp.array([-1], jnp.int32), page[:-1]])
    first = (page != prev_page) & valid
    run_id = jnp.cumsum(first.astype(jnp.int32)) - 1

    prev_coord = jnp.concatenate([jnp.array([0], coords.dtype), coords[:-1]])
    gap = coords - prev_coord
    bonus = jnp.where(
        valid & ~first, 30 // jnp.maximum(5, gap), 0
    ).astype(jnp.float32)
    run_bonus = jax.ops.segment_sum(
        bonus, run_id, num_segments=max_pages, indices_are_sorted=True
    )
    run_count = jax.ops.segment_sum(
        valid.astype(jnp.float32), run_id, num_segments=max_pages,
        indices_are_sorted=True,
    )
    run_rank = jnp.where(
        run_count > 0, 1.0 + run_bonus + jnp.log(jnp.maximum(run_count, 1.0)), 0.0
    )
    page_rank = jnp.where(first, run_rank[run_id], 0.0)
    return page, pos, first, page_rank
