"""HBM-resident device index and batched query evaluation.

The whole inverted index lives on device as a structure-of-arrays (the
TPU-native redesign of the reference's SortedList<string, IndexSequence>,
ref Docodo.NET/Index.cs:142-151):

  term_offsets : int32[T+1]  CSR offsets into `coords`
  coords       : int32[N]    posting coordinates, per-term ascending
  bounds       : int32[P]    page END coordinates (exclusive), ascending
  page_doc     : int32[P]    doc ordinal per page

Index construction is a device sort (`build_postings`): the tokenizer's
(term_id, coord) tuple stream is radix-sorted by (term, coord) with
`jax.lax.sort` and segmented into CSR with `searchsorted` — this replaces
the reference's thread-local builders, tmpind spills and k-way merges
(ref Build.cs:258-437, Index.cs:536-752) with one XLA program.

Query evaluation is a fixed-shape fold of the seqops AND kernel over the
query's terms followed by the locate/rank pipeline and an on-device top-k
(ref Search.cs hot path). Everything vmaps over a query batch, so a 10k
query workload is one device program.

Coordinates are int32: a single index shard addresses up to 2^31-1 chars
(~2 GB of text); larger corpora shard by document ranges across devices
(see parallel/), which is also the multi-chip layout.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from docodo_tpu.ops.seqops import (
    INF32,
    _compact,
    _rank_in_sorted,
    and_masked,
    and_variants_sorted,
    compact_mask,
    or_masked,
    or_variants_sorted,
    topk_nonneg,
)

INT32_MAX = int(INF32)

# compare-all/sort-merge crossover for the FULL-RESULT path: it stacks
# more merge/compact stages per query (variant ORs, hit compaction), so
# the lax.sort merge pays off far earlier than on the page-level path
# (measured on TPU v5e: caps 1024/2048 W2V2 run 2.1-2.8x faster at 512
# than at the page-level path's 4096 crossover, identical checksums).
# DOCODO_FULL_CA_MAX overrides for tuning.
import os as _os

FULL_CA_MAX = int(_os.environ.get("DOCODO_FULL_CA_MAX", "512"))

# posting-fetch strategy crossover (gather_term): element-index gather
# below, one dynamic_slice block DMA per row at/above
GATHER_SLICE_MIN = int(_os.environ.get("DOCODO_GATHER_SLICE_MIN", "256"))

# SMALL-TERM POSTING TABLES: padded [Ts, width] per-term posting rows
# staged next to the CSR for every term whose posting count fits the
# width. Fetching a row from such a table is a ROW gather (contiguous
# minor dim) which the TPU runs ~10x faster than the per-element gather
# the CSR fetch lowers to below GATHER_SLICE_MIN (measured on v5e:
# 11904 rows x 64 = 0.59 ms vs 6.2 ms — the dominant cap-64 W2 bucket
# of the 10k mix spent 6.9 of its 8.8 ms in the fetch). Widths cover
# exactly the element-gather regime; caps >= GATHER_SLICE_MIN already
# ride the block-DMA path.
SMALL_TAB_WIDTHS = (64, 128)

# ASYMMETRIC W=2 buckets: a phrase pairing a frequent word (cap >= this)
# with a much rarer one (cap_lo <= cap_hi/4) fetches each word at its
# own pow2 cap instead of padding both to cap_hi — the tagged merge
# sort and the whole locate tail shrink from 2*cap_hi toward cap_hi.
# Applies past the Pallas W2 kernel budget (symmetric cap 512 = 1024
# lanes rides the kernels). DEFAULT OFF: measured NEUTRAL-to-slightly-
# negative on the 10k mix (v5e, min-of-4 interleaved: 12.57 vs 12.42 ms
# with the chunked locate, 12.75 vs 12.89 without) — the tail buckets
# are launch/chain-bound, not width-bound, and the extra bucket keys
# fragment the program. Kept behind DOCODO_ASYM=1 with bit-parity tests
# for workloads where width dominates (huge single-shard indexes).
ASYM_CAP_MIN = int(_os.environ.get("DOCODO_ASYM_CAP_MIN", "1024"))


def _asym_enabled() -> bool:
    return _os.environ.get("DOCODO_ASYM", "0") == "1"


def _bucket_sort_key(kv):
    """Deterministic bucket ordering when cap keys mix ints and
    asymmetric (c0, c1) tuples."""
    qcap = kv[0][0]
    return ((qcap,) if isinstance(qcap, int) else qcap, kv[0][1:])


def build_page_of(bounds_np, coords_np):
    """page_of[i] = page index of posting coordinate i (the device
    twin of the kernels' compare-all right-bisect: #bounds <= coord,
    clamped to P-1). Staged ONCE per index generation and carried
    through the posting fetch + merge sorts, it removes the in-kernel
    page locate entirely (measured ~65% of the dominant full-result
    kernel at P=578 pages)."""
    bounds_np = np.asarray(bounds_np, dtype=np.int64)
    pages = np.searchsorted(
        bounds_np, np.asarray(coords_np, dtype=np.int64), side="right"
    )
    p = max(int(bounds_np.shape[0]), 1)
    return np.minimum(pages, p - 1).astype(np.int32)


@jax.tree_util.register_pytree_node_class
class SmallTab:
    """One posting table: `w` is the width it serves (STATIC jit
    metadata — jit args must not trace it), `tab` is [rows, w] (coords)
    or [rows, 2w] (coords || page_of).

    `band`: a CUMULATIVE table (band=False) holds every term with
    count <= w — one gather serves any cap == w. A BANDED table holds
    only terms with count in (w/2, w], so big widths stay proportional
    to the postings they cover (~2-4x total postings across all bands)
    instead of exploding; a cap-C fetch above 128 selects across the
    cum-128 table plus every band in (128, C]."""

    def __init__(self, w: int, row_map, tab, band: bool = False):
        self.w = w
        self.row_map = row_map
        self.tab = tab
        self.band = band

    def __iter__(self):  # (w, row_map, tab) unpacking convenience
        return iter((self.w, self.row_map, self.tab))

    def tree_flatten(self):
        return (self.row_map, self.tab), (self.w, self.band)

    @classmethod
    def tree_unflatten(cls, aux, children):
        w, band = aux if isinstance(aux, tuple) else (aux, False)
        return cls(w, *children, band=band)


def build_small_tables(offsets_np, coords_np,
                       widths: Sequence[int] = SMALL_TAB_WIDTHS,
                       max_bytes: Optional[int] = None, pages_np=None,
                       as_numpy: bool = False):
    """Build the small-term posting tables host-side and upload them.

    offsets_np: int64[T+1] CSR offsets; coords_np: the HOST mirror of
    the device coords array (per-term ascending). Returns a tuple of
    (width, row_map int32[T] device, tab device) triples — the `small`
    argument threaded through the query entry points — or None when
    disabled/over budget (DOCODO_SMALL_TAB=0 disables,
    DOCODO_SMALL_TAB_MB caps the total bytes, default 128 MB: large
    vocabularies fall back to the element gather rather than ballooning
    HBM).

    With `pages_np` (build_page_of), tab is [Ts, 2*width]: the coords
    row followed by its page_of twin — ONE row gather fetches both
    (row gathers measured latency-bound, so the doubled width is free).

    Row-count shapes are padded to powers of two so repeated stagings
    (tests, re-stage on index generation bump) reuse compiled programs.
    """
    if _os.environ.get("DOCODO_SMALL_TAB", "1") == "0":
        return None
    if max_bytes is None:
        max_bytes = int(
            _os.environ.get("DOCODO_SMALL_TAB_MB", "128")
        ) * 1024 * 1024
    counts = np.diff(np.asarray(offsets_np, dtype=np.int64))
    t = counts.size
    if t == 0:
        return None
    coords_np = np.asarray(coords_np)
    n = coords_np.shape[0]
    budget = max_bytes
    out = []

    def emit(w: int, tids, band: bool) -> bool:
        nonlocal budget
        if tids.size == 0:
            # an EMPTY band still needs a marker so coverage checks can
            # tell "no terms in this band" from "band skipped by
            # budget" — emit a zero-row table (row_map all -1)
            if band:
                xp = np if as_numpy else jnp
                out.append(SmallTab(
                    w,
                    xp.asarray(np.full(t, -1, dtype=np.int32)),
                    xp.zeros(
                        (0, 2 * w if pages_np is not None else w),
                        dtype=np.int32),
                    band=True,
                ))
                return True
            return True
        rows = _bucket(int(tids.size), lo=8)
        nbytes = rows * w * 4 * (2 if pages_np is not None else 1)
        if nbytes > budget:
            return False
        budget -= nbytes
        row_map = np.full(t, -1, dtype=np.int32)
        row_map[tids] = np.arange(tids.size, dtype=np.int32)
        starts = np.asarray(offsets_np, dtype=np.int64)[tids]
        cnts = counts[tids].astype(np.int32)
        idx = np.minimum(
            starts[:, None] + np.arange(w, dtype=np.int64)[None, :], n - 1
        )
        lane = np.arange(w, dtype=np.int32)[None, :]
        cols = 2 * w if pages_np is not None else w
        tab = np.full((rows, cols), INT32_MAX, dtype=np.int32)
        vals = coords_np[idx].astype(np.int32) if n else tab[: tids.size, :w]
        tab[: tids.size, :w] = np.where(
            lane < cnts[:, None], vals, INT32_MAX)
        if pages_np is not None and n:
            pgs = np.asarray(pages_np)[idx].astype(np.int32)
            tab[: tids.size, w:] = np.where(
                lane < cnts[:, None], pgs, INT32_MAX)
        if as_numpy:
            out.append(SmallTab(w, row_map, tab, band=band))
        else:
            out.append(SmallTab(
                w, jnp.asarray(row_map), jnp.asarray(tab), band=band))
        return True

    for w in widths:
        emit(w, np.flatnonzero(counts <= w).astype(np.int64), band=False)
    # BANDED tables above the cumulative widths: width w holds terms
    # with count in (w/2, w] — total banded bytes stay within ~2-4x the
    # postings they cover, so block-DMA caps get latency-bound row
    # gathers too (measured 24 ns/row vs ~1.3 us/row dynamic_slice)
    # 32768 (r5): band 32768 makes cap-32768 buckets CARRIED, unlocking
    # the chunked kernel routes (w1_chunked / chunked_multi /
    # chunked_variants) for the wide mix's giant-cap tail — the band
    # holds counts in (16384, 32768], a handful of stopword-class terms
    # per corpus (~2 MB combined on Pickwick), still within the ~2-4x
    # postings-covered envelope
    band_max = int(_os.environ.get("DOCODO_SMALL_TAB_BAND_MAX", "32768"))
    w = max(widths) * 2 if widths else 0
    while w and w <= band_max and budget > 0:
        tids = np.flatnonzero(
            (counts > w // 2) & (counts <= w)).astype(np.int64)
        if not emit(w, tids, band=True):
            break  # budget exhausted: larger bands only get bigger
        w *= 2
    return tuple(out) or None


def _fold_select(skip, acc, keep_acc, n_acc, vals, keep):
    """Select between the previous fold state (padded up to the new
    size) and a fresh AND/OR result — the `skip` branch is the identity
    for -1 padded query slots."""
    pad = vals.shape[0] - acc.shape[0]
    acc_w = jnp.concatenate([acc, jnp.full(pad, INF32, dtype=acc.dtype)])
    keep_w = jnp.concatenate([keep_acc, jnp.zeros(pad, dtype=bool)])
    return (
        jnp.where(skip, acc_w, vals),
        jnp.where(skip, keep_w, keep),
        jnp.where(skip, n_acc, jnp.sum(keep).astype(jnp.int32)),
    )


# ---------------------------------------------------------------------------
# build: (term_id, coord) tuples -> CSR postings, entirely on device
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_terms",))
def build_postings(term_ids, coords, num_terms: int):
    """Sort the tuple stream by (term, coord) and emit CSR offsets.

    Padding slots must carry term_id == INT32_MAX; they sort to the end
    and fall outside every term's CSR range. Replaces the reference merge
    machinery (ref Index.cs:577-689) — a sort IS the merge.
    """
    st, sc = jax.lax.sort((term_ids, coords), num_keys=2)
    offsets = jnp.searchsorted(
        st, jnp.arange(num_terms + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return st, sc, offsets


# ---------------------------------------------------------------------------
# packed token transfer: ONE uint32 per token (12-bit coord delta |
# 20-bit term id) HALVES host->device bytes for the build stream — the
# pipelined build over a remote device link is transfer-bound, and
# token starts are ascending so deltas are tiny (median gap < 16 chars).
# Rows whose term field is PACK_SENTINEL carry no posting: escape rows
# advance the coordinate cursor by their delta (gaps >= PACK_DELTA_MAX),
# padding rows have delta 0. Device-side reconstruction is one cumsum.
# ---------------------------------------------------------------------------

PACK_TERM_BITS = 20
PACK_SENTINEL = (1 << PACK_TERM_BITS) - 1          # term ids must stay below
PACK_DELTA_MAX = (1 << (32 - PACK_TERM_BITS)) - 1  # 4095


def pack_tokens(ids: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Pack a (term_id, start) token stream into uint32 rows (host-side
    numpy). `starts` must be ascending; `ids` must be < PACK_SENTINEL
    (callers with >1M-term vocabularies use the unpacked path). Returns
    the packed row array — len(ids) rows plus one escape row per
    PACK_DELTA_MAX of gap overflow."""
    n = ids.size
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    assert int(ids.max()) < PACK_SENTINEL
    deltas = np.diff(starts.astype(np.int64), prepend=np.int64(0))
    if int(deltas.max()) < PACK_DELTA_MAX:
        # no escape rows: one vectorized expression
        return (deltas.astype(np.uint32) << np.uint32(PACK_TERM_BITS)
                ) | ids.astype(np.uint32)
    n_esc = deltas // PACK_DELTA_MAX
    rem = (deltas - n_esc * PACK_DELTA_MAX).astype(np.uint32)
    token_pos = np.arange(n, dtype=np.int64) + np.cumsum(n_esc)
    total = int(token_pos[-1]) + 1
    esc_row = np.uint32((PACK_DELTA_MAX << PACK_TERM_BITS) | PACK_SENTINEL)
    out = np.full(total, esc_row, dtype=np.uint32)
    out[token_pos] = (rem << np.uint32(PACK_TERM_BITS)) | ids.astype(
        np.uint32
    )
    return out


PACK_PAD_ROW = np.uint32(PACK_SENTINEL)  # delta 0, no posting


def split_packed(packed: np.ndarray, max_rows: int) -> List[np.ndarray]:
    """Split an ALREADY-PACKED stream into parts of <= max_rows rows.
    Later parts keep ABSOLUTE coordinates by prepending escape rows that
    advance the cursor across everything the earlier parts covered (the
    cut coordinate base = sum of the cut rows' delta fields)."""
    esc_row = np.uint32((PACK_DELTA_MAX << PACK_TERM_BITS) | PACK_SENTINEL)
    out = []
    while packed.size > max_rows:
        part = packed[:max_rows]
        out.append(part)
        base = int((part >> np.uint32(PACK_TERM_BITS))
                   .astype(np.int64).sum())
        n_esc, rem = divmod(base, PACK_DELTA_MAX)
        assert n_esc + 1 < max_rows, \
            "max_rows too small for the escape prefix (would not converge)"
        prefix = np.full(n_esc + (1 if rem else 0), esc_row,
                         dtype=np.uint32)
        if rem:
            prefix[-1] = np.uint32(
                (rem << PACK_TERM_BITS) | PACK_SENTINEL
            )
        packed = np.concatenate([prefix, packed[max_rows:]])
    out.append(packed)
    return out


def pack_tokens_split(ids: np.ndarray, starts: np.ndarray,
                      max_rows: int) -> List[np.ndarray]:
    """pack_tokens, split into parts of <= max_rows packed rows. Each
    part packs ABSOLUTE starts (the part's first delta escapes across
    the preceding text), so parts build independently."""
    out = []
    while ids.size:
        deltas = np.diff(starts.astype(np.int64), prepend=np.int64(0))
        token_pos = (np.arange(ids.size, dtype=np.int64)
                     + np.cumsum(deltas // PACK_DELTA_MAX))
        if token_pos[-1] < max_rows:
            out.append(pack_tokens(ids, starts))
            break
        k = int(np.searchsorted(token_pos, max_rows, side="left"))
        out.append(pack_tokens(ids[:k], starts[:k]))
        ids, starts = ids[k:], starts[k:]
    return out


def build_postings_packed(packed, num_terms: int):
    """build_postings over a pack_tokens stream: unpack (mask + shift +
    one cumsum, pure VPU work) then the same device sort. Padding rows
    (PACK_PAD_ROW) and escape rows sort past every real term."""
    v = packed.astype(jnp.uint32)
    tid = (v & jnp.uint32(PACK_SENTINEL)).astype(jnp.int32)
    delta = (v >> jnp.uint32(PACK_TERM_BITS)).astype(jnp.int32)
    coords = jnp.cumsum(delta)
    is_pad = tid == PACK_SENTINEL
    tid = jnp.where(is_pad, INF32, tid)
    coords = jnp.where(is_pad, INF32, coords)
    return build_postings(tid, coords, num_terms)


# ---------------------------------------------------------------------------
# query: gather -> AND fold -> locate/rank -> top-k
# ---------------------------------------------------------------------------

def gather_term(coords, term_offsets, term, cap: int, small=None):
    """Fetch one term's postings into a fixed [cap] buffer.

    term < 0 (query padding) yields an empty list. Lists longer than
    `cap` are truncated to their first `cap` coords (callers pick the
    bucket cap from real lengths, so truncation only guards compile-time
    shape reuse).

    `small`: optional small-term posting tables (build_small_tables).
    When a table of width == cap exists, the fetch is ONE row gather
    from it (~10x the element gather below GATHER_SLICE_MIN, measured).
    CONTRACT: callers may pass `small` only when every real term in the
    batch has posting count <= cap (true for all bucketed entry points,
    whose caps round UP from real posting counts) — a wider term has no
    table row and would silently fetch garbage.
    """
    term = jnp.asarray(term, dtype=jnp.int32)
    safe = jnp.maximum(term, 0)
    start = term_offsets[safe]
    ln = term_offsets[safe + 1] - start
    ln = jnp.where(term >= 0, ln, 0)
    ln = jnp.minimum(ln, cap).astype(jnp.int32)
    tabs = _fetch_tables(small, cap)
    if tabs is not None:
        lane = jnp.arange(cap, dtype=jnp.int32)
        vals = jnp.full((cap,), INF32, jnp.int32)
        for st in tabs:
            row = st.row_map[safe]
            g = st.tab[jnp.maximum(row, 0)][: st.w]
            if st.w < cap:
                g = jnp.concatenate(
                    [g, jnp.full((cap - st.w,), INF32, jnp.int32)]
                )
            vals = jnp.where(row >= 0, g, vals)
        return jnp.where(lane < ln, vals, INF32), ln
    # Cap-adaptive fetch (measured on TPU v5e, min-of-3 chained):
    # * cap >= 256: ONE contiguous dynamic_slice per term, NOT
    #   coords[start + arange] — explicit per-element indices lower to
    #   a general gather (~8 ns PER ELEMENT; the ru cap-1024 bucket
    #   spent 76 of 94 ms just fetching postings). A vmapped
    #   dynamic_slice keeps block-contiguity visible and fetches each
    #   row as one DMA (5.5x at cap 1024, 1.5-2.4x at 256-512). The
    #   INF32 tail pad makes every in-range start exact (start <= N, so
    #   the slice never clamp-shifts); it hoists out of vmap.
    # * cap <= 128: the element gather — the block-DMA row cost
    #   (~1.3 us/row) exceeds 8 ns x cap there (2.3x at cap 64).
    if cap >= GATHER_SLICE_MIN:
        ext = jnp.concatenate(
            [coords, jnp.full((cap,), INF32, coords.dtype)]
        )
        vals = jax.lax.dynamic_slice_in_dim(ext, start, cap)
    else:
        idx = start + jnp.arange(cap, dtype=jnp.int32)
        vals = coords[jnp.minimum(idx, coords.shape[0] - 1)]
    vals = jnp.where(jnp.arange(cap, dtype=jnp.int32) < ln, vals, INF32)
    return vals, ln


def _fetch_tables(small, cap: int):
    """The table set that covers a cap-`cap` fetch, or None.

    cap <= the widest cumulative width: the one CUMULATIVE table of
    width == cap. Above: the widest cumulative table plus every BANDED
    table in (cum_w, cap] — together they hold every term with
    count <= cap exactly once. Any missing band (budget-skipped) means
    no coverage -> block-DMA."""
    if small is None:
        return None
    cums = [st for st in small if not st.band]
    for st in cums:
        if st.w == cap and st.tab.shape[0] > 0:
            return (st,)
    if not cums or cap <= max(st.w for st in cums):
        return None
    base = max(cums, key=lambda st: st.w)
    if base.tab.shape[0] == 0:
        return None
    tabs = [base]
    w = base.w * 2
    bands = {st.w: st for st in small if st.band}
    while w <= cap:
        st = bands.get(w)
        if st is None:
            return None
        if st.tab.shape[0] > 0:
            tabs.append(st)
        w *= 2
    return tuple(tabs)


def _tab_serves(small, cap: int) -> bool:
    """Whether COMBINED (coords||pages) tables fully serve this cap —
    the only case where carrying pages through the fetch is free (row
    gathers are latency-bound at ~24 ns/row). Uncovered caps fall back
    to block-DMA + the shared XLA page lookup (a paged block-DMA fetch
    doubles its row count: measured a 22% LOSS on the ru mix)."""
    tabs = _fetch_tables(small, cap)
    return tabs is not None and all(
        st.tab.shape[1] == 2 * st.w for st in tabs
    )


def gather_term_paged(coords, page_of, term_offsets, term, cap: int,
                      small=None):
    """gather_term plus the term's page_of stream (build_page_of),
    aligned lane-for-lane with the coords. With a combined small table
    (build_small_tables(..., pages_np=...)) both halves come from the
    SAME row gather; otherwise page_of is fetched with the coords'
    own cap-adaptive strategy. Padding lanes carry INF32 in both."""
    term = jnp.asarray(term, dtype=jnp.int32)
    safe = jnp.maximum(term, 0)
    start = term_offsets[safe]
    ln = term_offsets[safe + 1] - start
    ln = jnp.where(term >= 0, ln, 0)
    ln = jnp.minimum(ln, cap).astype(jnp.int32)
    lane = jnp.arange(cap, dtype=jnp.int32)
    tabs = _fetch_tables(small, cap)
    if tabs is not None and all(
            st.tab.shape[1] == 2 * st.w for st in tabs):
        vals = jnp.full((cap,), INF32, jnp.int32)
        pgs = jnp.full((cap,), INF32, jnp.int32)
        for st in tabs:
            row = st.row_map[safe]
            both = st.tab[jnp.maximum(row, 0)]
            gv, gp = both[: st.w], both[st.w: 2 * st.w]
            if st.w < cap:
                pad = jnp.full((cap - st.w,), INF32, jnp.int32)
                gv = jnp.concatenate([gv, pad])
                gp = jnp.concatenate([gp, pad])
            vals = jnp.where(row >= 0, gv, vals)
            pgs = jnp.where(row >= 0, gp, pgs)
        return (jnp.where(lane < ln, vals, INF32),
                jnp.where(lane < ln, pgs, INF32), ln)
    if cap >= GATHER_SLICE_MIN:
        ext = jnp.concatenate(
            [coords, jnp.full((cap,), INF32, coords.dtype)]
        )
        vals = jax.lax.dynamic_slice_in_dim(ext, start, cap)
        extp = jnp.concatenate(
            [page_of, jnp.full((cap,), INF32, page_of.dtype)]
        )
        pgs = jax.lax.dynamic_slice_in_dim(extp, start, cap)
    else:
        idx = jnp.minimum(start + lane, coords.shape[0] - 1)
        vals = coords[idx]
        pgs = page_of[idx]
    vals = jnp.where(lane < ln, vals, INF32)
    pgs = jnp.where(lane < ln, pgs, INF32)
    return vals, pgs, ln


def eval_and_query(coords, term_offsets, terms, rs, cap: int,
                   ca_max: int = None, small=None):
    """Left-fold proximity-AND over a query's terms (padded with -1).

    Mirrors the reference expression fold A*B*C (ref Search.cs:501 via
    IndexSequence.operator*). A padded term is the identity: the fold
    keeps the running (vals, keep, r) unchanged.

    Returns a MASKED stream (vals ascending incl. dropped slots, keep):
    the final compaction sort is skipped — locate_topk_masked consumes
    the mask directly. Intermediate folds (w >= 3) pay one compaction
    each to restore sortedness.

    `cap` may be a TUPLE of per-word caps (the ASYMMETRIC buckets: a
    phrase pairing a frequent word with a rare one fetches each at its
    own width, halving the merge/locate stream vs padding both to the
    larger cap — the merge machinery is width-agnostic).
    """
    w = terms.shape[0]
    caps = cap if isinstance(cap, tuple) else (cap,) * w
    acc, n_acc = gather_term(coords, term_offsets, terms[0], caps[0], small)
    keep_acc = jnp.arange(caps[0], dtype=jnp.int32) < n_acc
    r_acc = rs[0]
    for q in range(1, w):
        if q > 1:  # re-sort the masked stream into a dense operand; the
            # mask must be recomputed — compaction reorders slots
            acc, n_acc = _compact(acc, keep_acc, out_cap=acc.shape[0])
            keep_acc = jnp.arange(acc.shape[0], dtype=jnp.int32) < n_acc
        b, nb = gather_term(coords, term_offsets, terms[q], caps[q], small)
        vals, keep, r_out = and_masked(
            acc, n_acc, r_acc, b, nb, rs[q], ca_max
        )
        skip = terms[q] < 0
        acc, keep_acc, n_acc = _fold_select(
            skip, acc, keep_acc, n_acc, vals, keep
        )
        r_acc = jnp.where(skip, r_acc, r_out)
    return acc, keep_acc, r_acc


def gather_word_variants(coords, term_offsets, variants, cap: int,
                         ca_max: int = None, small=None):
    """OR-combine a word's term-id variants (voc group code + raw form +
    stem code, ref Search.cs:226-247) into one dense posting operand.

    variants: int32[V], -1 padded. Returns (coords int32[cap*V... dense
    ascending], n). V=1 short-circuits to a plain gather.
    """
    v = variants.shape[0]
    acc, n_acc = gather_term(coords, term_offsets, variants[0], cap, small)
    if v == 1:
        return acc, n_acc
    keep_acc = jnp.arange(cap, dtype=jnp.int32) < n_acc
    for q in range(1, v):
        if q > 1:  # first operand is already dense
            acc, n_acc = _compact(acc, keep_acc, out_cap=acc.shape[0])
            keep_acc = jnp.arange(acc.shape[0], dtype=jnp.int32) < n_acc
        b, nb = gather_term(coords, term_offsets, variants[q], cap, small)
        vals, keep, _ = or_masked(
            acc, n_acc, jnp.int32(1), b, nb, jnp.int32(1), ca_max
        )
        acc, keep_acc, n_acc = _fold_select(
            variants[q] < 0, acc, keep_acc, n_acc, vals, keep
        )
    acc, n_acc = _compact(acc, keep_acc, out_cap=acc.shape[0])
    return acc, n_acc


def eval_and_query_variants(coords, term_offsets, terms, rs, cap: int,
                            ca_max: int = None, small=None):
    """AND fold where each word is an OR of term variants.

    terms: int32[W, V] (-1 padded both ways); rs: int32[W].
    """
    w = terms.shape[0]
    acc, n_acc = gather_word_variants(
        coords, term_offsets, terms[0], cap, ca_max, small
    )
    keep_acc = jnp.arange(acc.shape[0], dtype=jnp.int32) < n_acc
    r_acc = rs[0]
    for q in range(1, w):
        b, nb = gather_word_variants(
            coords, term_offsets, terms[q], cap, ca_max, small
        )
        vals, keep, r_out = and_masked(
            acc, n_acc, r_acc, b, nb, rs[q], ca_max
        )
        skip = terms[q, 0] < 0
        acc, keep_acc, n_acc = _fold_select(
            skip, acc, keep_acc, n_acc, vals, keep
        )
        r_acc = jnp.where(skip, r_acc, r_out)
        if q < w - 1:
            acc, n_acc = _compact(acc, keep_acc, out_cap=acc.shape[0])
            keep_acc = jnp.arange(acc.shape[0], dtype=jnp.int32) < n_acc
    return acc, keep_acc, r_acc


@functools.partial(jax.jit, static_argnames=("cap", "topk"))
def batched_query_step_variants(term_offsets, coords, bounds, page_doc,
                                terms, rs, cap: int, topk: int,
                                small=None):
    """Variant-aware batch step: terms int32[B, W, V], rs int32[B, W]."""

    def one(tq, rq):
        vals, keep, _ = eval_and_query_variants(
            coords, term_offsets, tq, rq, cap, small=small
        )
        return locate_topk_masked(vals, keep, bounds, topk)

    return jax.vmap(one)(terms, rs)


def _locate_core(vals, keep, bounds):
    """Shared rank pipeline: masked ascending stream -> per-slot page
    index, first-of-page-run mask, run rank at first slots, run counts.

    Page rank = 1 + sum(30 // max(5, gap)) + ln(hits) over each page's
    kept run (ref Search.cs:99-111, integer division preserved). Runs and
    gaps are computed via a cummax previous-kept-slot scan, so no
    compaction of the stream is ever needed.
    """
    p = vals.shape[0]
    idx = jnp.arange(p, dtype=jnp.int32)
    page = _rank_in_sorted(vals, bounds, strict=False)
    page = jnp.minimum(page, bounds.shape[0] - 1)

    # GATHER-FREE previous-kept values: vals (and thus page) are
    # non-decreasing over kept slots, so "value at the previous kept
    # slot" is a shifted running max of the masked stream
    prev_val = jnp.concatenate([
        jnp.full(1, -1, vals.dtype),
        jax.lax.cummax(jnp.where(keep, vals, -1))[:-1],
    ])
    prev_page = jnp.concatenate([
        jnp.full(1, -1, jnp.int32),
        jax.lax.cummax(jnp.where(keep, page, -1))[:-1],
    ])
    has_prev = prev_val >= 0
    first = keep & (page != prev_page)
    gap = jnp.where(has_prev, vals - prev_val, 0)
    bonus = jnp.where(keep & ~first, 30 // jnp.maximum(5, gap), 0)
    bonus = bonus.astype(jnp.float32)

    # page runs are CONTIGUOUS and prefix sums NON-DECREASING, so the
    # prefix value at each run's terminal slot is a reverse running min
    # over terminals — no gathers, no scatters, no segment ops
    big = jnp.float32(3.4e38)
    terminal = jnp.concatenate([first[1:], jnp.ones(1, dtype=bool)])
    cbon = jnp.cumsum(bonus)
    ccnt = jnp.cumsum(keep.astype(jnp.float32))
    cbon_end = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(terminal, cbon, big))
    ))
    ccnt_end = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(terminal, ccnt, big))
    ))
    ccnt_prev = jnp.concatenate([jnp.zeros(1, jnp.float32), ccnt[:-1]])
    run_bonus = cbon_end - cbon  # bonus at the first slot is 0
    run_count = ccnt_end - ccnt_prev
    slot_rank = jnp.where(
        first, 1.0 + run_bonus + jnp.log(jnp.maximum(run_count, 1.0)), 0.0
    )
    slot_count = jnp.where(first, run_count, 0.0)
    return page, first, slot_rank, slot_count


def locate_topk_masked(vals, keep, bounds, topk: int):
    """Masked coordinate stream -> (top-k page idx, ranks, counts)."""
    page, first, slot_rank, slot_count = _locate_core(vals, keep, bounds)
    top_rank, top_slot = topk_nonneg(slot_rank, topk)
    top_page = jnp.where(top_rank > 0, page[top_slot], -1)
    top_count = jnp.where(
        top_rank > 0, slot_count[top_slot].astype(jnp.int32), 0
    )
    return top_page, top_rank, top_count


class LocateFull(NamedTuple):
    """Full per-query device result (ref Search.cs:365-420, 552-557).

    pages/ranks/counts are rank-ordered top-k; `hits` is the ascending
    kept coordinate stream (INF-padded), so the host can materialize
    exact per-page `ResultDocPage.pos` (ref Search.cs:381) by running
    the normal prepare_search_result pipeline over it. Whenever a result
    is actually SERVED (n_pages <= topk), every result page is a top-k
    page, so the kept stream IS exactly the hits of the top-k pages;
    rank-truncated results (n_pages > topk or n_hits > hit_cap) always
    re-serve host-side, so their hit buffers are never consumed.
    n_pages/n_hits are the UNtruncated totals used for that check.
    docs/doc_ranks are None when the caller asked with_docs=False (full
    materialization recomputes them host-side — reading them back would
    be wasted bytes)."""

    pages: jax.Array      # int32[topk] page idx, -1 padded
    ranks: jax.Array      # f32[topk]
    counts: jax.Array     # int32[topk]
    n_pages: jax.Array    # int32[] total pages with hits
    docs: Optional[jax.Array]       # int32[topk] doc ordinal per top page
    doc_ranks: Optional[jax.Array]  # f32[topk] doc rank at first slots
    hits: jax.Array       # int32[hit_cap] kept coords, INF pad
    n_hits: jax.Array     # int32[] total kept hits


class PreFull(NamedTuple):
    """Deferred-tail bucket result: the compacted first-topk-runs
    streams of a full-result bucket BEFORE the rank top-k and doc
    grouping. The multi-bucket dispatcher concatenates every bucket's
    PreFull and runs ONE streams_topk_tail + ONE doc grouping for the
    whole batch — the per-bucket tail is a fixed ~dozen tiny thunks
    whose dispatch cost dominates the fused program (PROFILE_r04:
    thunk-bound, ~0.3-0.4 ms/bucket nearly independent of B)."""

    pg_c: jax.Array       # int32[B, topk] first-topk run pages (slot order)
    rk_c: jax.Array       # f32[B, topk] their ranks (0 pad)
    ct_c: jax.Array       # f32[B, topk] their counts
    n_pages: jax.Array    # int32[B] exact full-width totals
    n_hits: jax.Array     # int32[B]
    hits: jax.Array       # int32[B, hit_cap]


# page-table size bound for the gather-free doc/header lookups in
# doc_group_topk: beyond it the [topk, P] compare-all would dominate
# and the plain table gathers take over (same crossover doctrine as
# seqops' compare-all vs sort-merge)
DOC_CA_MAX = int(_os.environ.get("DOCODO_DOC_CA_MAX", "4096"))
_DOC_CA_CHUNK = 512


def doc_group_topk(top_page, top_rank, page_doc, is_header):
    """Device doc grouping/ranking over a top-k page row: doc ordinal
    per slot, and doc rank = 1 + ln(sum of the doc's top-k page ranks),
    x10 when the doc's header page "0" is among them, emitted at each
    doc's FIRST top-k slot (ref Search.cs:552-557).

    Formulated as ONE [topk] sort by (doc, k) + per-run prefix scans +
    a [topk] un-sort by k — O(topk log topk) lanes. The naive same-doc
    [topk, topk] mask costs 16-32x the lane area of an entire small-cap
    query (at topk 64 it measured ~9 ms of the 35 ms 10k-mix batch);
    this sort form removes that."""
    topk = top_page.shape[0]
    valid_top = top_rank > 0
    P = page_doc.shape[0]
    if P <= DOC_CA_MAX:
        # GATHER-FREE table lookups: page_doc is non-decreasing (docs
        # occupy contiguous page ranges), so doc(page) = #{doc-start
        # pages <= page} - 1 — a chunked compare-all against the
        # doc-start page list (vmapped gathers serialize on TPU: the
        # two [B, topk] table gathers measured 4.5 ms of the 10k-mix
        # batch; this form 3.3x faster, identical results). The start
        # list derives from page_doc with ONE [P] sort — unmapped under
        # vmap, so it runs once per program.
        pidx = jnp.arange(P, dtype=jnp.int32)
        start_mask = jnp.concatenate(
            [jnp.ones(1, bool), page_doc[1:] != page_doc[:-1]]
        )
        skey = jnp.where(start_mask, pidx, jnp.int32(INT32_MAX))
        hpay = (start_mask & is_header).astype(jnp.int32)
        starts_p, start_hdr = jax.lax.sort((skey, hpay), num_keys=1)
        acc = jnp.zeros(top_page.shape, jnp.int32)
        hdr = jnp.zeros(top_page.shape, bool)
        for j0 in range(0, P, _DOC_CA_CHUNK):
            blk = starts_p[j0: j0 + _DOC_CA_CHUNK]
            bh = start_hdr[j0: j0 + _DOC_CA_CHUNK]
            acc = acc + jnp.sum(
                (blk[None, :] <= top_page[:, None]), axis=-1
            ).astype(jnp.int32)
            hdr = hdr | jnp.any(
                (blk[None, :] == top_page[:, None]) & (bh[None, :] > 0),
                axis=-1,
            )
        docs = jnp.where(valid_top, acc - 1, -1)
        hdr = hdr & valid_top
    else:
        safe_page = jnp.maximum(top_page, 0)
        docs = jnp.where(valid_top, page_doc[safe_page], -1)
        hdr = jnp.where(valid_top, is_header[safe_page], False)

    big = jnp.int32(INT32_MAX)
    key = jnp.where(valid_top, docs, big)
    kidx = jnp.arange(topk, dtype=jnp.int32)
    skey, skidx, srank, shdr = jax.lax.sort(
        (key, kidx, top_rank, hdr.astype(jnp.int32)), num_keys=2
    )
    start = jnp.concatenate(
        [jnp.ones(1, bool), skey[1:] != skey[:-1]]
    )
    # per-run totals at the run START via a reverse SEGMENTED
    # Hillis-Steele sum: additions stay strictly within each run (tree-
    # structured direct summation — prefix-sum DIFFERENCES lose a ulp
    # and break the exact rank ties brief-mode ordering relies on)
    run_sum, run_hdr = srank, shdr
    d = 1
    while d < topk:
        same = jnp.concatenate(
            [skey[d:], jnp.full(d, -7, jnp.int32)]
        ) == skey
        run_sum = run_sum + jnp.where(
            same,
            jnp.concatenate([run_sum[d:], jnp.zeros(d, jnp.float32)]),
            0.0,
        )
        run_hdr = run_hdr + jnp.where(
            same,
            jnp.concatenate([run_hdr[d:], jnp.zeros(d, jnp.int32)]),
            0,
        )
        d <<= 1
    doc_rank = 1.0 + jnp.log(jnp.maximum(run_sum, 1e-30))
    doc_rank = jnp.where(run_hdr > 0, doc_rank * 10.0, doc_rank)
    # the secondary k key makes each run's first slot the doc's FIRST
    # top-k slot; emit there, then un-sort the values back to k order
    sval = jnp.where(start & (skey < big), doc_rank, 0.0)
    _, out = jax.lax.sort((skidx, sval), num_keys=1)
    return docs, out


def locate_full(vals, keep, bounds, page_doc, is_header, topk: int,
                hit_cap: int, with_docs: bool = True, tail: bool = True):
    """locate_topk_masked plus hit-stream compaction and (with_docs)
    device-side doc ranking (ref Search.cs:552-557).

    tail=False: return the compacted pre-top-k streams (PreFull fields,
    per query) for the dispatcher's batched shared tail."""
    page, first, slot_rank, slot_count = _locate_core(vals, keep, bounds)
    n_pages = jnp.sum(first.astype(jnp.int32))
    # first-topk-runs contract (matches the Pallas locate_streams_topk
    # tail): compact the page runs to the first `topk` in slot order —
    # the index-bearing full-width top_k paid a ~3.4 ms iota-payload
    # sort at [5000, 2048] — then top-k at width `topk`. Exact for every
    # SERVED row (n_pages <= topk means ALL runs were compacted); rows
    # with more runs always re-serve host-side (n_pages stays exact).
    run_sel = jnp.where(
        first, jnp.cumsum(first.astype(jnp.int32)) - 1, -1
    )
    j_arr = jnp.arange(topk, dtype=jnp.int32)
    onehot = run_sel[None, :] == j_arr[:, None]
    rk_c = jnp.sum(jnp.where(onehot, slot_rank[None, :], 0.0), axis=1)
    pg_c = jnp.sum(jnp.where(onehot, page[None, :], 0), axis=1)
    ct_c = jnp.sum(jnp.where(onehot, slot_count[None, :], 0.0), axis=1)

    # hits: the kept stream compacted. For every SERVED result this
    # equals "hits restricted to the top-k pages" (n_pages <= topk means
    # all pages are top pages); truncated results re-serve host-side
    n_hits = jnp.sum(keep.astype(jnp.int32))
    hits = compact_mask(vals, keep, hit_cap, ca_max=FULL_CA_MAX)

    if not tail:
        # parity detail vs the Pallas compaction: runs past topk leave
        # pg_c at the one-hot sum's 0 fill here vs -1 there — both are
        # masked to -1 by streams_topk_tail's valid_top, and such rows
        # re-serve host-side anyway (n_pages > topk)
        return PreFull(
            pg_c=pg_c, rk_c=rk_c, ct_c=ct_c, n_pages=n_pages,
            n_hits=n_hits, hits=hits,
        )
    top_rank, top_slot = topk_nonneg(rk_c, topk)
    valid_top = top_rank > 0
    top_page = jnp.where(valid_top, pg_c[top_slot], -1)
    top_count = jnp.where(
        valid_top, ct_c[top_slot].astype(jnp.int32), 0
    )

    docs = doc_ranks = None
    if with_docs:
        docs, doc_ranks = doc_group_topk(
            top_page, top_rank, page_doc, is_header
        )
    return LocateFull(
        pages=top_page, ranks=top_rank, counts=top_count, n_pages=n_pages,
        docs=docs, doc_ranks=doc_ranks, hits=hits, n_hits=n_hits,
    )


def locate_topk(coords, n, bounds, page_doc, topk: int):
    """Dense-stream wrapper over locate_topk_masked (page_doc unused in
    the page-level result; kept for call-site compatibility)."""
    keep = (jnp.arange(coords.shape[0], dtype=jnp.int32) < n) & (
        coords < INF32
    )
    return locate_topk_masked(coords, keep, bounds, topk)


def query_step(term_offsets, coords, bounds, page_doc, terms, rs,
               cap: int, topk: int, small=None):
    """One query end-to-end on device: AND fold -> top-k ranked pages.
    Zero sorts for 1- and 2-term queries (rank-scatter merge + masked
    locate)."""
    vals, keep, _ = eval_and_query(
        coords, term_offsets, terms, rs, cap, small=small
    )
    return locate_topk_masked(vals, keep, bounds, topk)


def eval_query_masked(coords, term_offsets, terms, rs, cap: int,
                      ca_max: int = None, small=None):
    """Evaluate one query to a masked coordinate stream, dispatching on
    the terms layout: int32[W] = plain AND fold; int32[W, V] = AND fold
    of per-word variant ORs (the reference's multi-code words and
    `a|b` alternations, ref Search.cs:226-247, 351)."""
    if terms.ndim == 1 or terms.shape[1] == 1:
        t = terms if terms.ndim == 1 else terms[:, 0]
        vals, keep, _ = eval_and_query(
            coords, term_offsets, t, rs, cap, ca_max, small
        )
        return vals, keep
    if isinstance(cap, tuple):  # asymmetric caps are a V=1 feature;
        cap = max(cap)          # variant shapes fall back to the max
    gather_v = jax.vmap(
        lambda t: gather_term(coords, term_offsets, t, cap, small)
    )
    if terms.shape[0] == 1:
        # one word, V variants: the union IS the result (empty AND fold)
        sa, na = gather_v(terms[0])
        return or_variants_sorted(sa, na)
    if terms.shape[0] == 2:
        # two variant-OR words: ONE tagged sort + run-dedupe + shared
        # segmentation replaces per-word OR + compaction + pairwise AND
        # (three merge-class stages -> one; measured 2x on the variant
        # buckets that dominate morphological workloads)
        sa, na = gather_v(terms[0])
        sb, nb = gather_v(terms[1])
        vals, keep, _ = and_variants_sorted(
            sa, na, rs[0], sb, nb, rs[1],
            b_pad=terms[1, 0] < 0,  # W-padded slot folds as identity
        )
        return vals, keep
    vals, keep, _ = eval_and_query_variants(
        coords, term_offsets, terms, rs, cap, ca_max, small
    )
    return vals, keep


def query_step_full(term_offsets, coords, bounds, page_doc, is_header,
                    terms, rs, cap: int, topk: int,
                    hit_cap: int, with_docs: bool = True,
                    small=None) -> LocateFull:
    """One query end-to-end with full result extraction: top-k pages,
    hit coordinate stream, device doc ranks. Variant-aware."""
    vals, keep = eval_query_masked(
        coords, term_offsets, terms, rs, cap, ca_max=FULL_CA_MAX,
        small=small,
    )
    return locate_full(vals, keep, bounds, page_doc, is_header, topk,
                       hit_cap, with_docs=with_docs)


def _chunk_min_b() -> int:
    """DOCODO_CHUNK_MIN_B: smallest bucket batch admitted to the chunked
    kernel pipeline. r3 measured B>=4 (admitting every B lost 813 vs
    890k against the then-external tails); with the r4 IN-KERNEL tails
    the trade inverted — sparse wide XLA-routed buckets were the top
    remaining EN cost (a single cap-4096 query measured 2.6 ms adj on
    the per-query scan chain) and B>=1 admission measured 954.3 ->
    981.5k on the 10k mix (checksum identical). ru unaffected (all its
    buckets are B>=419). Rows pad to CHUNK_Q=8 inside, so tiny batches
    pay 8-row kernel work — but the XLA scan chain they replace pays
    ~90 launches."""
    return int(_os.environ.get("DOCODO_CHUNK_MIN_B", "1"))


def _chunked_mode() -> str:
    """DOCODO_CHUNKED: "1" (default — chunked locate on real TPU),
    "0" (off), "force" (on with interpret=True — CPU tests)."""
    return _os.environ.get("DOCODO_CHUNKED", "1")


def _locate_full_chunked(hv, bounds, page_doc, is_header,
                         topk: int, hit_cap: int, with_docs: bool,
                         interpret: bool = False, pg=None,
                         located=None, hits_pre=None, tail: bool = True):
    """Batched locate_full over an INF-masked kept stream whose
    page/rank/top-k leg rides the CHUNKED Pallas locate kernel
    (ops/pallas_query.pallas_chunked_locate): one sequential-grid
    kernel launch replaces the ~40 log-step scan launches of the
    vmapped XLA _locate_core on streams past the resident-kernel budget
    (measured 1.3-1.8x on v5e at n>=2048, B>=4). Hit compaction is one
    lax.sort (ascending kept stream: mask+sort = stable partition, the
    same branch compact_mask takes at these widths); doc grouping stays
    on its XLA leg.

    `located`: optional precomputed (pages, ranks, counts, n_pages) —
    the fused merge+AND+locate pipeline already owns them.
    `hits_pre`: optional (compacted_hits, n_hits) from an in-kernel
    hit compaction (pallas_merge_and_locate_topk) — skips the
    full-width sort (hv may then be None)."""
    from docodo_tpu.ops.pallas_query import pallas_chunked_locate

    if located is not None:
        pages, ranks, counts, n_pages = located
    else:
        res = pallas_chunked_locate(
            hv, bounds, topk=topk, interpret=interpret, pg=pg,
            tail=tail,
        )
        if not tail:
            pg_c, rk_c, ct_c, n_pages = res
        else:
            pages, ranks, counts, n_pages = res
    if hits_pre is not None:
        hits, n_hits = hits_pre
    else:
        n_hits = jnp.sum((hv < INF32).astype(jnp.int32), axis=1)
        hits = jax.lax.sort(hv)
    if hit_cap <= hits.shape[1]:
        hits = hits[:, :hit_cap]
    else:
        hits = jnp.concatenate([
            hits,
            jnp.full((hits.shape[0], hit_cap - hits.shape[1]), INF32,
                     jnp.int32),
        ], axis=1)
    if not tail:
        assert located is None, "deferred tail excludes located"
        return PreFull(
            pg_c=pg_c, rk_c=rk_c, ct_c=ct_c, n_pages=n_pages,
            n_hits=n_hits, hits=hits,
        )
    docs = doc_ranks = None
    if with_docs:
        docs, doc_ranks = jax.vmap(
            doc_group_topk, in_axes=(0, 0, None, None)
        )(pages, ranks, page_doc, is_header)
    return LocateFull(
        pages=pages, ranks=ranks, counts=counts, n_pages=n_pages,
        docs=docs, doc_ranks=doc_ranks, hits=hits, n_hits=n_hits,
    )


def _chunked_and_full(term_offsets, coords, bounds, page_doc, is_header,
                      tq, rq, caps, topk: int, hit_cap: int,
                      with_docs: bool, small=None,
                      interpret: bool = False,
                      page_of=None, tail: bool = True):
    """W=2 V=1 big-bucket pipeline, fully chunk-streamed: per-word
    gathers -> ONE vmapped tagged lax.sort (the merge) -> the two-pass
    chunked AND (keep resolution) -> the chunked locate. Replaces the
    ~90-launch XLA scan chain per bucket with 3 kernel launches + the
    sort (ref IndexSequence.cs:218-284 + Search.cs:365-420 semantics,
    bit-identical to ops/seqops.and_masked + locate_full).

    When the BANDED combined tables cover both caps, the fetch is row
    gathers (latency-bound) carrying the page streams through the
    merge sort — the AND kernel masks lanes in place, so alignment
    survives it and the chunked locate skips its shared page lookup.
    Uncovered caps stay on block-DMA + shared lookup (a paged
    block-DMA fetch measured a 22% ru loss before the banded tables)."""
    from docodo_tpu.ops.pallas_query import pallas_chunked_and

    c0, c1 = caps
    bsz = tq.shape[0]
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (bsz, c0), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (bsz, c1), 1)
    carried = (page_of is not None and _tab_serves(small, c0)
               and _tab_serves(small, c1))
    if carried:
        g0 = jax.vmap(lambda t: gather_term_paged(
            coords, page_of, term_offsets, t, c0, small))
        g1 = jax.vmap(lambda t: gather_term_paged(
            coords, page_of, term_offsets, t, c1, small))
        a, apg, na = g0(tq[:, 0])
        b, bpg, nb = g1(tq[:, 1])
    else:
        g0 = jax.vmap(lambda t: gather_term(coords, term_offsets, t, c0,
                                            small))
        g1 = jax.vmap(lambda t: gather_term(coords, term_offsets, t, c1,
                                            small))
        a, na = g0(tq[:, 0])
        b, nb = g1(tq[:, 1])
    pg = None
    if carried and c0 == c1:
        from docodo_tpu.ops.pallas_query import (
            FUSED_AND_MAX,
            pallas_bitonic_merge,
        )

        if 2 * c0 <= FUSED_AND_MAX:
            # the whole W=2 pipeline in ONE kernel: bitonic merge +
            # one-pass AND + resident locate + IN-KERNEL tails (hit
            # compaction + first-k-runs compaction + counts) — no HBM
            # round-trips between the stages and no full-width streams
            # written at all (pallas_merge_and_locate_topk; the
            # external hits lax.sort and the compare-all run
            # compaction were 3.7 + 2.8 ms of the dominant ru bucket)
            from docodo_tpu.ops.pallas_query import (
                pallas_merge_and_locate_topk,
                streams_topk_tail,
            )

            hits_c, pg_c, rk_c, ct_c, npg, nht = (
                pallas_merge_and_locate_topk(
                    a, na, b, nb, apg, bpg, rq[:, :1], rq[:, 1:2],
                    cap=c0, hit_cap=hit_cap, topk=topk,
                    interpret=interpret
                )
            )
            if hit_cap <= hits_c.shape[1]:
                hits_c = hits_c[:, :hit_cap]
            else:
                hits_c = jnp.concatenate([
                    hits_c,
                    jnp.full((hits_c.shape[0],
                              hit_cap - hits_c.shape[1]), INF32,
                             jnp.int32),
                ], axis=1)
            if not tail:
                return PreFull(
                    pg_c=pg_c[:, :topk], rk_c=rk_c[:, :topk],
                    ct_c=ct_c[:, :topk], n_pages=npg, n_hits=nht,
                    hits=hits_c,
                )
            located = streams_topk_tail(
                pg_c, rk_c, ct_c, npg, topk, hits_c.shape[0]
            )
            return _locate_full_chunked(
                None, bounds, page_doc, is_header, topk=topk,
                hit_cap=hit_cap, with_docs=with_docs,
                interpret=interpret, located=located,
                hits_pre=(hits_c, nht),
            )
        # bitonic two-stream merge kernel: one lane-rotation network
        # replaces the vmapped 3-op lax.sort (5.9 -> 2.1 ms at the ru
        # mix's [5000, 2048], checksum-identical)
        vals, tag, pg = pallas_bitonic_merge(
            a, na, b, nb, apg, bpg, cap=c0, interpret=interpret
        )
    else:
        av = jnp.where(lane0 < na[:, None], a, INF32)
        bv = jnp.where(lane1 < nb[:, None], b, INF32)
        tag = jnp.concatenate([
            jnp.where(lane0 < na[:, None], 0, 2),
            jnp.where(lane1 < nb[:, None], 1, 2),
        ], axis=1).astype(jnp.int32)
        cat = jnp.concatenate([av, bv], axis=1)
        if carried:
            vals, tag, pg = jax.vmap(
                lambda v, t, p: jax.lax.sort((v, t, p), num_keys=2)
            )(cat, tag, jnp.concatenate([apg, bpg], axis=1))
        else:
            vals, tag = jax.vmap(
                lambda v, t: jax.lax.sort((v, t), num_keys=2)
            )(cat, tag)
    hv = pallas_chunked_and(
        vals, tag, rq[:, :1], rq[:, 1:2], interpret=interpret
    )
    return _locate_full_chunked(
        hv, bounds, page_doc, is_header, topk=topk, hit_cap=hit_cap,
        with_docs=with_docs, interpret=interpret, pg=pg, tail=tail,
    )


def _chunked_and_full_multi(term_offsets, coords, bounds, page_doc,
                            is_header, tq, rq, cap: int, topk: int,
                            hit_cap: int, with_docs: bool, small=None,
                            interpret: bool = False, page_of=None,
                            tail: bool = True):
    """W>=3 V=1 carried left fold through the chunked kernel pipeline
    (ref Search.cs:501 expression fold over IndexSequence.cs:218-284):
    each fold step is ONE vmapped tagged lax.sort of the kept stream
    (tag 0, INF at dropped lanes — the sort doubles as the compaction)
    concatenated with the next word's carried block (tag 1), feeding
    pallas_chunked_and (one-pass resident under FUSED_AND_MAX, two-pass
    chunked above). Page streams ride the sort payload so the final
    locate skips its page lookup. Replaces the per-query XLA scan-chain
    fold that PROFILE_WIDE_r05's ablation priced at 47.2 ms of the
    57.7 ms wide batch (16 us/row over 2,930 W>2 rows); bit-identical
    to vmapped eval_and_query + locate_full (the tagged-sort merge is
    the W2 chunked pipeline's proven-equivalent form, and the fold's
    window combines exactly as seqops.combine_r)."""
    from docodo_tpu.ops.pallas_query import pallas_chunked_and
    from docodo_tpu.ops.seqops import combine_r

    bsz, w = tq.shape[0], tq.shape[1]
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (bsz, cap), 1)
    g = jax.vmap(lambda t: gather_term_paged(
        coords, page_of, term_offsets, t, cap, small))
    a, apg, na = g(tq[:, 0])
    hv = jnp.where(lane_c < na[:, None], a, INF32)
    pg = apg
    r_acc = rq[:, 0:1]
    for q in range(1, w):
        b, bpg, nb = g(tq[:, q])
        bv = jnp.where(lane_c < nb[:, None], b, INF32)
        tag = jnp.concatenate([
            jnp.where(hv < INF32, 0, 2),
            jnp.where(lane_c < nb[:, None], 1, 2),
        ], axis=1).astype(jnp.int32)
        cat = jnp.concatenate([hv, bv], axis=1)
        pcat = jnp.concatenate([pg, bpg], axis=1)
        vals, tag, pgs = jax.vmap(
            lambda v, t, p: jax.lax.sort((v, t, p), num_keys=2)
        )(cat, tag, pcat)
        rb_col = rq[:, q:q + 1]
        hv = pallas_chunked_and(
            vals, tag, r_acc, rb_col, interpret=interpret
        )
        pg = pgs
        r_acc = combine_r(r_acc, rb_col)
    return _locate_full_chunked(
        hv, bounds, page_doc, is_header, topk=topk, hit_cap=hit_cap,
        with_docs=with_docs, interpret=interpret, pg=pg, tail=tail,
    )


def _chunked_variants_full(term_offsets, coords, bounds, page_doc,
                           is_header, tq, rq, cap: int, topk: int,
                           hit_cap: int, with_docs: bool, small=None,
                           interpret: bool = False, page_of=None,
                           tail: bool = True):
    """W=2 V>1 carried OVERSIZE variant route (streams past the slots
    kernels' MAX_STREAM_WIDTH): ONE vmapped word-tagged lax.sort of
    every variant block feeds the variants AND (run-dedupe + both-word
    spans + AND segmentation — the resident one-pass kernel within
    FUSED_AND_MAX, the two-pass chunk-streamed form above it), page
    streams riding the sort payload into the chunked locate. The XLA
    and_variants_sorted scan chains these buckets previously rode were
    the wide mix's dominant remaining cost both times it was profiled
    (PROFILE_WIDE_r05: first the <=4096-lane V=4 buckets, then the
    giant cap>=1024 ones at ~34 ms of the 49.8 ms batch). Ref
    Search.cs:226-247 variant sets + 351 alternations; bit-parity
    with eval_query_masked."""
    from docodo_tpu.ops.pallas_query import pallas_chunked_variants_and

    bsz, _w, v = tq.shape
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (bsz, v, cap), 2)
    g = jax.vmap(jax.vmap(lambda t: gather_term_paged(
        coords, page_of, term_offsets, t, cap, small)))
    a3, apg3, na2 = g(tq[:, 0])
    b3, bpg3, nb2 = g(tq[:, 1])
    va = lane3 < na2[:, :, None]
    vb = lane3 < nb2[:, :, None]
    av = jnp.where(va, a3, INF32).reshape(bsz, v * cap)
    bv = jnp.where(vb, b3, INF32).reshape(bsz, v * cap)
    ta = jnp.where(va, 0, 2).astype(jnp.int32).reshape(bsz, v * cap)
    tb = jnp.where(vb, 1, 2).astype(jnp.int32).reshape(bsz, v * cap)
    cat = jnp.concatenate([av, bv], axis=1)
    tag = jnp.concatenate([ta, tb], axis=1)
    pcat = jnp.concatenate([
        apg3.reshape(bsz, v * cap), bpg3.reshape(bsz, v * cap)
    ], axis=1)
    vals, tags, pgs = jax.vmap(
        lambda vv, tt, pp: jax.lax.sort((vv, tt, pp), num_keys=2)
    )(cat, tag, pcat)
    bpad = (tq[:, 1, 0] < 0).astype(jnp.int32)[:, None]
    hv = pallas_chunked_variants_and(
        vals, tags, rq[:, 0:1], rq[:, 1:2], bpad, interpret=interpret
    )
    hv = hv[:, :pgs.shape[1]]  # crop any chunk padding (INF lanes)
    return _locate_full_chunked(
        hv, bounds, page_doc, is_header, topk=topk, hit_cap=hit_cap,
        with_docs=with_docs, interpret=interpret, pg=pgs, tail=tail,
    )


def _bucket_full(term_offsets, coords, bounds, page_doc, is_header,
                 tq, rq, cap: int, topk: int, hit_cap: int,
                 with_docs: bool, use_pallas: bool, small=None,
                 chunked: Optional[str] = None, page_of=None,
                 tail: bool = True):
    """One full-result bucket, routed to the hybrid Pallas kernels when
    the shape qualifies (W<=2, V=1, cap within the kernel budget), else
    the vmapped XLA program (whose locate leg rides the chunked Pallas
    kernel for big streams with enough rows).

    `chunked`: the DOCODO_CHUNKED mode, threaded as a STATIC arg by
    jitted callers so the jit cache keys on it (None = read the env at
    trace time).

    tail=False: return a PreFull (compacted pre-top-k streams) where
    the route supports deferral, so the multi-bucket dispatcher can
    batch ONE shared tail + doc grouping across all buckets; routes
    without deferral (the per-query query_step_full fallback) still
    return a finished LocateFull — callers handle both."""
    if use_pallas:
        out = _pallas_bucket_full(
            term_offsets, coords, bounds, page_doc, is_header, tq, rq,
            cap=cap, topk=topk, hit_cap=hit_cap, with_docs=with_docs,
            small=small, page_of=page_of, tail=tail,
        )
        if out is not None:
            return out
        mode = chunked if chunked is not None else _chunked_mode()
        chunked_ok = (
            mode == "force"
            or (mode == "1" and jax.default_backend() == "tpu")
        )
        if chunked_ok and tq.shape[0] >= _chunk_min_b():
            interp = mode == "force"
            w = tq.shape[1]
            v = tq.shape[2] if tq.ndim == 3 else 1
            caps = cap if isinstance(cap, tuple) else (cap,) * w
            if w == 2 and v == 1 and sum(caps) >= 2048:
                t2 = tq if tq.ndim == 2 else tq[:, :, 0]
                return _chunked_and_full(
                    term_offsets, coords, bounds, page_doc, is_header,
                    t2, rq, caps, topk=topk, hit_cap=hit_cap,
                    with_docs=with_docs, small=small, interpret=interp,
                    page_of=page_of, tail=tail,
                )
            if (w == 2 and v > 1 and not isinstance(cap, tuple)
                    and page_of is not None and _tab_serves(small, cap)):
                # oversize variant bucket: resident fused kernel within
                # FUSED_AND_MAX, two-pass chunked variants AND above it
                # (PROFILE_WIDE_r05's dominant remaining cost both ways)
                return _chunked_variants_full(
                    term_offsets, coords, bounds, page_doc,
                    is_header, tq, rq, cap=cap, topk=topk,
                    hit_cap=hit_cap, with_docs=with_docs,
                    small=small, interpret=interp,
                    page_of=page_of, tail=tail,
                )
            if (w >= 3 and v == 1 and not isinstance(cap, tuple)
                    and page_of is not None
                    and _tab_serves(small, cap)):
                # W>=3 carried fold (PROFILE_WIDE_r05: the XLA W>2
                # fold was 82% of the wide batch)
                t3 = tq if tq.ndim == 2 else tq[:, :, 0]
                return _chunked_and_full_multi(
                    term_offsets, coords, bounds, page_doc, is_header,
                    t3, rq, cap=cap, topk=topk, hit_cap=hit_cap,
                    with_docs=with_docs, small=small, interpret=interp,
                    page_of=page_of, tail=tail,
                )
            if (w == 1 and v == 1 and caps[0] >= 2048
                    and page_of is not None
                    and _tab_serves(small, caps[0])):
                # single-word big cap with banded-table coverage: the
                # gathered block IS the kept stream, its page stream
                # comes with the same row gathers
                t1 = tq[:, 0] if tq.ndim == 2 else tq[:, 0, 0]
                a1, apg1, _na1 = jax.vmap(
                    lambda t: gather_term_paged(
                        coords, page_of, term_offsets, t, caps[0], small)
                )(t1)
                return _locate_full_chunked(
                    a1, bounds, page_doc, is_header, topk=topk,
                    hit_cap=hit_cap, with_docs=with_docs,
                    interpret=interp, pg=apg1, tail=tail,
                )
            gm = functools.partial(
                eval_query_masked, ca_max=FULL_CA_MAX, small=small
            )
            vals, keep = jax.vmap(
                lambda t, r: gm(coords, term_offsets, t, r, cap)
            )(tq, rq)
            if vals.shape[1] >= 2048:
                return _locate_full_chunked(
                    jnp.where(keep, vals, INF32), bounds, page_doc,
                    is_header, topk=topk, hit_cap=hit_cap,
                    with_docs=with_docs, interpret=interp, tail=tail,
                )
            lf = functools.partial(
                locate_full, topk=topk, hit_cap=hit_cap,
                with_docs=with_docs, tail=tail,
            )
            return jax.vmap(lf, in_axes=(0, 0, None, None, None))(
                vals, keep, bounds, page_doc, is_header
            )
    fn = functools.partial(
        query_step_full, cap=cap, topk=topk, hit_cap=hit_cap,
        with_docs=with_docs, small=small,
    )
    return jax.vmap(fn, in_axes=(None, None, None, None, None, 0, 0))(
        term_offsets, coords, bounds, page_doc, is_header, tq, rq
    )


@functools.partial(jax.jit, static_argnames=(
    "cap", "topk", "hit_cap", "with_docs", "use_pallas", "chunked"))
def batched_query_full(term_offsets, coords, bounds, page_doc, is_header,
                       terms, rs, cap: int, topk: int, hit_cap: int,
                       with_docs: bool = True, use_pallas: bool = False,
                       small=None, chunked: Optional[str] = None,
                       page_of=None):
    """One bucket of full-result queries ([B, W] or [B, W, V] terms) as
    its own cached jit — serving uses this instead of the fused
    multi-bucket program because batch COMPOSITIONS churn per request
    wave: a fused program recompiles per composition tuple (minutes over
    a remote-tunnel device), while per-bucket shapes recur and hit this
    cache."""
    return _bucket_full(
        term_offsets, coords, bounds, page_doc, is_header, terms, rs,
        cap=cap, topk=topk, hit_cap=hit_cap, with_docs=with_docs,
        use_pallas=use_pallas, small=small, chunked=chunked,
        page_of=page_of,
    )


@functools.partial(jax.jit, static_argnames=(
    "caps", "topk", "hit_cap", "with_docs", "use_pallas", "chunked"))
def multi_bucket_query_full(term_offsets, coords, bounds, page_doc,
                            is_header, terms_list, rs_list, caps,
                            topk: int, hit_cap,
                            with_docs: bool = True,
                            use_pallas: bool = False, small=None,
                            chunked: Optional[str] = None, page_of=None):
    """Full-result twin of multi_bucket_query_step: every shape bucket
    (variant-aware, [Bi, Wi] or [Bi, Wi, Vi] terms) evaluates in ONE
    device program; each bucket yields a batched LocateFull.

    hit_cap: one int, or a per-bucket tuple — small-result buckets read
    back small hit buffers (the hits stream dominates device->host
    bytes).

    DEFERRED TAILS (use_pallas): each bucket returns its compacted
    pre-top-k streams (PreFull) and the rank top-k + doc grouping run
    ONCE over the concatenation of all buckets — the per-bucket tail
    is a fixed ~dozen tiny thunks (top_k, slot selects, the doc
    grouping's sort/scan chain) whose DISPATCH cost dominates the
    fused multi-bucket program (PROFILE_r04: ~0.3-0.4 ms/bucket nearly
    independent of B; the EN mix has ~29 buckets). Row-wise math is
    identical, so outputs are bit-equal to the per-bucket tails."""
    if isinstance(hit_cap, int):
        hit_cap = (hit_cap,) * len(caps)
    outs = []
    for tq, rq, cap, hb in zip(terms_list, rs_list, caps, hit_cap):
        outs.append(_bucket_full(
            term_offsets, coords, bounds, page_doc, is_header, tq, rq,
            cap=cap, topk=topk, hit_cap=hb, with_docs=with_docs,
            use_pallas=use_pallas, small=small, chunked=chunked,
            page_of=page_of, tail=not use_pallas,
        ))
    idxs = [i for i, o in enumerate(outs) if isinstance(o, PreFull)]
    if idxs:
        pre = [outs[i] for i in idxs]
        pg_cat = jnp.concatenate([p.pg_c for p in pre])
        rk_cat = jnp.concatenate([p.rk_c for p in pre])
        ct_cat = jnp.concatenate([p.ct_c for p in pre])
        npg_cat = jnp.concatenate([p.n_pages for p in pre])
        from docodo_tpu.ops.pallas_query import streams_topk_tail

        pages, ranks, counts, npg_cat = streams_topk_tail(
            pg_cat, rk_cat, ct_cat, npg_cat, topk, pg_cat.shape[0]
        )
        docs_cat = doc_ranks_cat = None
        if with_docs:
            docs_cat, doc_ranks_cat = jax.vmap(
                doc_group_topk, in_axes=(0, 0, None, None)
            )(pages, ranks, page_doc, is_header)
        off = 0
        for i, p in zip(idxs, pre):
            b = p.pg_c.shape[0]
            sl = slice(off, off + b)
            outs[i] = LocateFull(
                pages=pages[sl], ranks=ranks[sl], counts=counts[sl],
                n_pages=p.n_pages,
                docs=None if docs_cat is None else docs_cat[sl],
                doc_ranks=(None if doc_ranks_cat is None
                           else doc_ranks_cat[sl]),
                hits=p.hits, n_hits=p.n_hits,
            )
            off += b
    return tuple(outs)


@functools.partial(jax.jit, static_argnames=(
    "caps", "topk", "hit_cap", "with_docs", "use_pallas", "chunked"))
def multi_bucket_query_full_chained(term_offsets, coords, bounds, page_doc,
                                    is_header, terms_list, rs_list, chain,
                                    caps, topk: int, hit_cap,
                                    with_docs: bool = True,
                                    use_pallas: bool = False, small=None,
                                    chunked: Optional[str] = None,
                                    page_of=None):
    """multi_bucket_query_full with the dependency-chain scalar trick of
    multi_bucket_query_step_chained (one final readback bounds the wall
    time of a rep sequence on async/tunnelled dispatch layers)."""
    zero = (chain * 0).astype(jnp.int32)
    terms_list = tuple(t + zero for t in terms_list)
    outs = multi_bucket_query_full(
        term_offsets, coords, bounds, page_doc, is_header,
        terms_list, rs_list, caps, topk, hit_cap,
        with_docs=with_docs, use_pallas=use_pallas, small=small,
        chunked=chunked, page_of=page_of,
    )
    s = jnp.float32(0)
    for o in outs:
        s = s + jnp.sum(o.ranks) + jnp.sum(o.n_hits.astype(jnp.float32))
    return outs, s


def _pallas_bucket(term_offsets, coords, bounds, tq, rq, cap: int,
                   topk: int, small=None, page_of=None):
    """Route one (cap, W<=2) bucket through the fused Pallas kernels
    (ops/pallas_query): gather the posting blocks, evaluate the whole
    bucket as ONE kernel launch. Single-word buckets take the merge-free
    locate-only kernel; pairs take the hybrid sort-merge kernel (one
    vmapped lax.sort feeds a scan-only Pallas locate). Page streams are
    sourced by fetch strategy, as in _pallas_bucket_full."""
    from docodo_tpu.ops.pallas_query import (
        pallas_batched_single_locate,
        pallas_sorted_and_locate,
        q_for_cap,
        q_for_sorted_cap,
    )

    single = tq.shape[1] == 1
    pq = min(64, q_for_cap(cap) * 2) if single else q_for_sorted_cap(cap)
    bsz = tq.shape[0]
    pad = (-bsz) % pq
    if pad:
        tq = jnp.concatenate(
            [tq, jnp.full((pad, tq.shape[1]), -1, jnp.int32)]
        )
        rq = jnp.concatenate([rq, jnp.ones((pad, rq.shape[1]), jnp.int32)])
    carried = page_of is not None and _tab_serves(small, cap)
    if carried:
        gather = jax.vmap(
            lambda t: gather_term_paged(
                coords, page_of, term_offsets, t, cap, small)
        )
        a, apg, na = gather(tq[:, 0])
    else:
        gather = jax.vmap(
            lambda t: gather_term(coords, term_offsets, t, cap, small)
        )
        a, na = gather(tq[:, 0])
        apg = None
    shared = page_of is not None and not carried
    interpret = jax.default_backend() != "tpu"
    if single:
        pg, rk, ct = pallas_batched_single_locate(
            a, na, bounds, cap=cap, topk=topk, interpret=interpret,
            a_pg=apg, shared_pg=shared,
        )
        return pg[:bsz], rk[:bsz], ct[:bsz]
    if carried:
        b, bpg, nb = gather(tq[:, 1])
    else:
        b, nb = gather(tq[:, 1])
        bpg = None
    pg, rk, ct = pallas_sorted_and_locate(
        a, na, rq[:, 0], b, nb, rq[:, 1], bounds, cap=cap, topk=topk,
        interpret=interpret, a_pg=apg, b_pg=bpg, shared_pg=shared,
    )
    return pg[:bsz], rk[:bsz], ct[:bsz]


def _pallas_bucket_full(term_offsets, coords, bounds, page_doc, is_header,
                        tq, rq, *, cap: int, topk: int, hit_cap: int,
                        with_docs: bool, small=None, page_of=None,
                        tail: bool = True):
    """Full-result Pallas routing for one bucket: W<=2, V=1 shapes
    within the kernel cap budget evaluate through the hybrid kernels
    (pallas_query.pallas_single_locate_full / pallas_sorted_and_locate_
    full); other shapes return None and stay on the XLA program. Doc
    grouping (tiny [topk, topk] work) runs as vmapped XLA either way.

    With `page_of` (build_page_of), the posting fetch also carries the
    precomputed page stream into the kernels, replacing their in-kernel
    compare-all locate (~65% of the dominant kernel's time)."""
    from docodo_tpu.ops.pallas_query import (
        MAX_PALLAS_CAP,
        MAX_SORTED_PALLAS_CAP,
        MAX_STREAM_WIDTH,
        W1_FULL_STREAM_MAX,
        pallas_single_locate_full,
        pallas_sorted_and_locate_full,
        pallas_union_locate_full,
        pallas_variants_and_locate_full,
        q_for_cap,
        q_for_sorted_cap,
        q_for_stream,
    )

    if isinstance(cap, tuple):
        # asymmetric per-word caps: the XLA sort path (tuple caps are
        # only built for buckets past the kernel budget)
        return None
    interpret = jax.default_backend() != "tpu"
    if tq.ndim == 3 and tq.shape[2] > 1:
        # VARIANT-OR shapes (morphological code sets, a|b alternations,
        # wildcard expansions): one lax.sort of the word-tagged variant
        # concatenation feeds the run-dedupe kernels — the Pallas twin
        # of the XLA and_variants_sorted / or_variants_sorted path
        w, v = tq.shape[1], tq.shape[2]
        if w > 2:
            return None
        # Mosaic landmine: odd variant counts fail to compile on real
        # TPU ("Unsupported target bitwidth for truncation", r5) —
        # production bucketing always rounds V to a power of two
        # (_bucket(v, lo=1)), so pad non-pow2 V the same way here
        # (padded variant slots are -1 = identity in the union fold)
        vp = 1
        while vp < v:
            vp <<= 1
        if vp != v:
            tq = jnp.concatenate([
                tq, jnp.full((tq.shape[0], w, vp - v), -1, jnp.int32)
            ], axis=2)
            v = vp
        n = w * v * cap
        if n > MAX_STREAM_WIDTH:
            return None
        pq = q_for_stream(n)
        bsz = tq.shape[0]
        pad = (-bsz) % pq
        if pad:
            tq = jnp.concatenate(
                [tq, jnp.full((pad, w, v), -1, jnp.int32)]
            )
            rq = jnp.concatenate(
                [rq, jnp.ones((pad, rq.shape[1]), jnp.int32)]
            )
        carried = page_of is not None and _tab_serves(small, cap)
        if carried:
            gather_v = jax.vmap(jax.vmap(
                lambda t: gather_term_paged(
                    coords, page_of, term_offsets, t, cap, small)
            ))
            a3, apg3, na2 = gather_v(tq[:, 0])
        else:
            gather_v = jax.vmap(jax.vmap(
                lambda t: gather_term(coords, term_offsets, t, cap, small)
            ))
            a3, na2 = gather_v(tq[:, 0])
            apg3 = None
        shared = page_of is not None and not carried
        # slots mode EVERYWHERE on the full path (r4): all full-result
        # tails share the first-topk-runs contract (Pallas on/off
        # checksum parity), and the run-compacting tail replaced the
        # full-width sort that made slots mode a loss here in r3
        if w == 1:
            pg, rk, ct, npg, nht, hits = pallas_union_locate_full(
                a3, na2, bounds, topk=topk, hit_cap=hit_cap,
                interpret=interpret, sort_topk=True, a_pg=apg3,
                shared_pg=shared, tail=tail,
            )
        else:
            if carried:
                b3, bpg3, nb2 = gather_v(tq[:, 1])
            else:
                b3, nb2 = gather_v(tq[:, 1])
                bpg3 = None
            pg, rk, ct, npg, nht, hits = pallas_variants_and_locate_full(
                a3, na2, rq[:, 0], b3, nb2, rq[:, 1],
                tq[:, 1, 0] < 0, bounds, topk=topk, hit_cap=hit_cap,
                interpret=interpret, sort_topk=True,
                a_pg=apg3, b_pg=bpg3, shared_pg=shared, tail=tail,
            )
        if not tail:
            # deferred order: (pg_c, rk_c, ct_c, npg, nht, hits)
            return PreFull(
                pg_c=pg[:bsz], rk_c=rk[:bsz], ct_c=ct[:bsz],
                n_pages=npg[:bsz], n_hits=nht[:bsz], hits=hits[:bsz],
            )
        docs = doc_ranks = None
        if with_docs:
            docs, doc_ranks = jax.vmap(
                doc_group_topk, in_axes=(0, 0, None, None)
            )(pg, rk, page_doc, is_header)
            docs, doc_ranks = docs[:bsz], doc_ranks[:bsz]
        return LocateFull(
            pages=pg[:bsz], ranks=rk[:bsz], counts=ct[:bsz],
            n_pages=npg[:bsz], docs=docs, doc_ranks=doc_ranks,
            hits=hits[:bsz], n_hits=nht[:bsz],
        )

    if tq.ndim == 3:
        tq = tq[:, :, 0]
    w = tq.shape[1]
    if w > 2:
        return None
    single = w == 1
    # W=1 full buckets beyond the merge-free kernel's cap ride the
    # union kernel with V=1 (its merge sort is skipped) — measured
    # 1.21x over the XLA locate_full at cap 256; pre-paged-kernel
    # measurements had a LOSS at 512 (0.89x) and a wash at 1024, but
    # with CARRIED page streams (no in-kernel compare-all) the whole
    # stream budget wins (ru cap-1024 W1 bucket: 3.8 -> measured below)
    # W2 cap 1024 (n=2048) COMPILES in slots mode (MAX_SORTED_SLOTS_CAP)
    # but measured 0.89-0.95x vs the XLA sort path on v5e — stays off
    w1_limit = (
        MAX_STREAM_WIDTH
        if page_of is not None and _tab_serves(small, cap)
        else W1_FULL_STREAM_MAX
    ) if not isinstance(cap, tuple) else W1_FULL_STREAM_MAX
    limit = w1_limit if single else MAX_SORTED_PALLAS_CAP
    if cap > limit or (single and topk > cap):
        return None
    if single and cap > MAX_PALLAS_CAP:
        pq = q_for_stream(cap)
    elif single:
        pq = min(64, q_for_cap(cap) * 2)
    else:
        pq = q_for_sorted_cap(cap)
    bsz = tq.shape[0]
    pad = (-bsz) % pq
    if pad:
        tq = jnp.concatenate(
            [tq, jnp.full((pad, tq.shape[1]), -1, jnp.int32)]
        )
        rq = jnp.concatenate([rq, jnp.ones((pad, rq.shape[1]), jnp.int32)])
    carried = page_of is not None and _tab_serves(small, cap)
    if carried:
        gather = jax.vmap(
            lambda t: gather_term_paged(
                coords, page_of, term_offsets, t, cap, small)
        )
        a, apg, na = gather(tq[:, 0])
    else:
        gather = jax.vmap(
            lambda t: gather_term(coords, term_offsets, t, cap, small)
        )
        a, na = gather(tq[:, 0])
        apg = None
    shared = page_of is not None and not carried
    interpret = jax.default_backend() != "tpu"
    # slots mode EVERYWHERE on the full path (r4): one shared
    # run-compacting first-topk-runs tail (narrow index-bearing top_k
    # replaced the full-width one whose iota payload cost ~3.4 ms at
    # [5000, 2048]); the r3 per-route kernel-topk wins were measured
    # against the OLD full-width sort tail
    if single and cap > MAX_PALLAS_CAP:
        pg, rk, ct, npg, nht, hits = pallas_union_locate_full(
            a[:, None, :], na[:, None], bounds, topk=topk,
            hit_cap=hit_cap, interpret=interpret, sort_topk=True,
            a_pg=None if apg is None else apg[:, None, :],
            shared_pg=shared, tail=tail,
        )
    elif single:
        pg, rk, ct, npg, nht, hits = pallas_single_locate_full(
            a, na, bounds, cap=cap, topk=topk, hit_cap=hit_cap,
            interpret=interpret, sort_topk=True, a_pg=apg,
            shared_pg=shared, tail=tail,
        )
    else:
        if carried:
            b, bpg, nb = gather(tq[:, 1])
        else:
            b, nb = gather(tq[:, 1])
            bpg = None
        pg, rk, ct, npg, nht, hits = pallas_sorted_and_locate_full(
            a, na, rq[:, 0], b, nb, rq[:, 1], bounds, cap=cap, topk=topk,
            hit_cap=hit_cap, interpret=interpret, sort_topk=True,
            a_pg=apg, b_pg=bpg, shared_pg=shared, tail=tail,
        )
    if not tail:
        return PreFull(
            pg_c=pg[:bsz], rk_c=rk[:bsz], ct_c=ct[:bsz],
            n_pages=npg[:bsz], n_hits=nht[:bsz], hits=hits[:bsz],
        )
    docs = doc_ranks = None
    if with_docs:
        docs, doc_ranks = jax.vmap(
            doc_group_topk, in_axes=(0, 0, None, None)
        )(pg, rk, page_doc, is_header)
        docs, doc_ranks = docs[:bsz], doc_ranks[:bsz]
    return LocateFull(
        pages=pg[:bsz], ranks=rk[:bsz], counts=ct[:bsz],
        n_pages=npg[:bsz], docs=docs, doc_ranks=doc_ranks,
        hits=hits[:bsz], n_hits=nht[:bsz],
    )


@functools.partial(jax.jit, static_argnames=("caps", "topk", "use_pallas"))
def multi_bucket_query_step(term_offsets, coords, bounds, page_doc,
                            terms_list, rs_list, caps, topk: int,
                            use_pallas: bool = False, small=None,
                            page_of=None):
    """Evaluate EVERY shape bucket in one device program (one dispatch,
    one launch RTT): terms_list/rs_list are tuples of [Bi, Wi] arrays,
    caps the matching static posting caps. Returns a tuple of
    (pages, ranks, counts) triples, one per bucket.

    With use_pallas, W=1 buckets up to MAX_PALLAS_CAP take the
    merge-free locate kernel and W=2 buckets up to MAX_SORTED_PALLAS_CAP
    take the hybrid sort-merge kernel (collapsing the XLA path's deep
    chains of small scan kernels); the rest stay on XLA."""
    from docodo_tpu.ops.pallas_query import (
        MAX_PALLAS_CAP,
        MAX_SORTED_PALLAS_CAP,
    )

    outs = []
    for tq, rq, cap in zip(terms_list, rs_list, caps):
        limit = MAX_PALLAS_CAP if tq.shape[1] == 1 else MAX_SORTED_PALLAS_CAP
        if use_pallas and cap <= limit and tq.shape[1] <= 2:
            outs.append(_pallas_bucket(
                term_offsets, coords, bounds, tq, rq, cap, topk,
                small=small, page_of=page_of,
            ))
            continue
        fn = functools.partial(query_step, cap=cap, topk=topk, small=small)
        outs.append(jax.vmap(fn, in_axes=(None, None, None, None, 0, 0))(
            term_offsets, coords, bounds, page_doc, tq, rq
        ))
    return tuple(outs)


@functools.partial(
    jax.jit, static_argnames=("caps", "topk", "use_pallas")
)
def multi_bucket_query_step_chained(term_offsets, coords, bounds, page_doc,
                                    terms_list, rs_list, chain, caps,
                                    topk: int, use_pallas: bool = False,
                                    small=None, page_of=None):
    """multi_bucket_query_step plus a dependency-chain scalar: `chain`
    (f32[]) is mixed (x0) into the inputs and a ranks checksum is
    returned, so successive calls chained through it execute strictly
    in order — a single final readback then bounds the wall time of the
    whole sequence even on async dispatch layers whose block_until_ready
    is unreliable (e.g. remote-tunnel devices)."""
    zero = (chain * 0).astype(jnp.int32)
    terms_list = tuple(t + zero for t in terms_list)
    outs = multi_bucket_query_step(
        term_offsets, coords, bounds, page_doc, terms_list, rs_list,
        caps, topk, use_pallas=use_pallas, small=small, page_of=page_of,
    )
    s = jnp.float32(0)
    for _, ranks, _ in outs:
        s = s + jnp.sum(ranks)
    return outs, s


@functools.partial(jax.jit, static_argnames=("cap", "topk"))
def batched_query_step(term_offsets, coords, bounds, page_doc,
                       terms, rs, cap: int, topk: int, small=None):
    """The flagship device program: a [B, W] batch of proximity/phrase
    queries evaluated in one XLA computation.

    terms : int32[B, W] term ids, -1 padded
    rs    : int32[B, W] per-term windows (negative = ordered/exact)
    Returns (pages int32[B, topk], ranks f32[B, topk], counts int32[B, topk]).
    """
    fn = functools.partial(query_step, cap=cap, topk=topk, small=small)
    return jax.vmap(fn, in_axes=(None, None, None, None, 0, 0))(
        term_offsets, coords, bounds, page_doc, terms, rs
    )


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def _bucket(n: int, lo: int = 64) -> int:
    """Power-of-two shape bucket: bounds compile count to log2 variants."""
    c = lo
    while c < n:
        c <<= 1
    return c


def _bucket4(n: int, lo: int = 8) -> int:
    """Power-of-FOUR bucket: serving row counts churn per request wave,
    and every distinct row shape is a compile (minutes over a tunnelled
    device) — a x4 ladder caps the shape count at the cost of <4x row
    padding (padding rows are empty -1 queries, micro-seconds each)."""
    c = lo
    while c < n:
        c <<= 2
    return c


@dataclass
class DeviceIndex:
    """Device arrays + host dictionaries for query compilation."""

    term_offsets: jax.Array
    coords: jax.Array
    bounds: jax.Array
    page_doc: jax.Array
    terms: List[str]
    page_ids: List[str]
    doc_names: List[str]
    _tmap: dict
    # host mirrors (device->host readbacks can stall on remote devices)
    offsets_np: np.ndarray
    page_doc_np: np.ndarray
    bounds_np: np.ndarray
    # compile_group_query memo (immutable per staged index)
    _cgq_cache: dict = dataclasses.field(default_factory=dict)
    # header-page ("0") mask for the device doc-rank boost; derived from
    # page_ids when absent (ref Search.cs:554-557)
    is_header: Optional[jax.Array] = None
    # small-term posting tables (build_small_tables): row-gather fetch
    # for caps below GATHER_SLICE_MIN — ~10x the element gather
    small: Optional[tuple] = None
    # per-posting page indices (build_page_of): carried through the
    # fetch + merge sorts so kernels skip the compare-all page locate
    page_of: Optional[jax.Array] = None

    def header_mask(self) -> jax.Array:
        if self.is_header is None:
            self.is_header = jnp.asarray(np.fromiter(
                (pid == "0" for pid in self.page_ids), dtype=bool,
                count=len(self.page_ids),
            ))
        return self.is_header

    @classmethod
    def from_index(cls, ind) -> "DeviceIndex":
        """Upload a host Index (ArrayIndex CSR + PageTable) to device."""
        arr = ind.arr
        if arr.coords is None:
            raise ValueError("device upload requires an in-memory index")
        # >=: INF32 == 2^31-1 is the padding sentinel, and page bounds
        # (exclusive ends >= max_coord) overflow even earlier
        if arr.max_coord >= INT32_MAX:
            raise ValueError(
                f"corpus spans {arr.max_coord} chars >= 2^31-1: a single "
                f"device shard's int32 coordinate space is full — serve "
                f"it document-sharded over a mesh instead "
                f"(parallel.serving.ShardedDeviceIndex)"
            )
        pt = ind.pages
        offsets_np = np.asarray(arr.offsets, dtype=np.int64)
        page_doc_np = np.asarray(pt.page_doc, dtype=np.int32)
        # doc_group_topk's gather-free doc lookup derives doc-start
        # pages from page_doc transitions — docs must occupy contiguous
        # page ranges (PageTable appends per doc, so this always holds)
        assert np.all(np.diff(page_doc_np) >= 0), \
            "page_doc must be non-decreasing (contiguous doc page runs)"
        bounds_np = pt.bounds.astype(np.int64)
        # header pages (id "0") drive the x10 doc-rank boost on device
        # (ref Search.cs:554-557, Index.cs:115)
        header_np = np.fromiter(
            (pid == "0" for pid in pt.page_ids), dtype=bool,
            count=len(pt.page_ids),
        )
        coords64 = arr.coords.astype(np.int64)
        pages_np = build_page_of(bounds_np, coords64)
        return cls(
            term_offsets=jnp.asarray(arr.offsets, dtype=jnp.int32),
            coords=jnp.asarray(coords64, dtype=jnp.int32),
            bounds=jnp.asarray(bounds_np, dtype=jnp.int32),
            page_doc=jnp.asarray(page_doc_np),
            is_header=jnp.asarray(header_np),
            terms=list(arr.terms),
            page_ids=list(pt.page_ids),
            doc_names=list(pt.doc_names),
            _tmap=dict(arr._tmap),
            offsets_np=offsets_np,
            page_doc_np=page_doc_np,
            bounds_np=bounds_np,
            small=build_small_tables(
                offsets_np, coords64, pages_np=pages_np
            ),
            page_of=jnp.asarray(pages_np),
        )

    def term_id(self, term: str) -> int:
        return self._tmap.get(term, -1)

    def posting_count(self, term: str) -> int:
        tid = self.term_id(term)
        if tid < 0:
            return 0
        return int(self.offsets_np[tid + 1] - self.offsets_np[tid])

    def compile_queries(
        self, queries: Sequence[Sequence[Tuple[str, int]]], pad_w: int = 0
    ):
        """Host query compilation: [(word, R), ...] per query -> padded
        (terms, rs) arrays plus the (cap, W) shape bucket."""
        w = max((len(q) for q in queries), default=1)
        w = max(w, pad_w, 1)
        b = len(queries)
        terms = np.full((b, w), -1, dtype=np.int32)
        rs = np.ones((b, w), dtype=np.int32)
        max_len = 1
        for i, q in enumerate(queries):
            if any(self.term_id(word) < 0 for word, _ in q):
                # unknown word: the query matches NOTHING (host parity).
                # An all -1 row evaluates empty — the fold starts from an
                # empty accumulator, unlike a -1 at position >= 1, which
                # would mean "padding/identity"
                continue
            for j, (word, r) in enumerate(q):
                terms[i, j] = self.term_id(word)
                rs[i, j] = r
                max_len = max(max_len, self.posting_count(word))
        return terms, rs, _bucket(max_len)

    def search_batch(
        self, queries: Sequence[Sequence[Tuple[str, int]]],
        topk: int = 16, cap: Optional[int] = None,
        use_pallas: Optional[bool] = None,
        cap_ladder: Optional[Sequence[int]] = None,
    ):
        """Evaluate a batch of AND/phrase queries; returns numpy
        (pages, ranks, counts) with -1/-0 padding in rank order.

        Queries are grouped into (posting-cap, term-count) buckets so a
        query over rare terms never pays a frequent term's padding and
        single-word queries skip the AND fold entirely — the bucket count
        (and thus compile count) is O(log max_posting x max_w).
        """
        b = len(queries)
        pages = np.full((b, topk), -1, dtype=np.int32)
        ranks = np.zeros((b, topk), dtype=np.float32)
        counts = np.zeros((b, topk), dtype=np.int32)
        def round_cap(need: int) -> int:
            if cap:
                return cap
            if cap_ladder:  # coarse ladder bounds the compile-shape count
                for c in cap_ladder:
                    if need <= c:
                        return c
                return _bucket(need)
            return _bucket(need)

        buckets = {}
        for i, q in enumerate(queries):
            # a query containing an UNKNOWN word matches nothing (host
            # parity: empty PostingSeq annihilates the AND) — it must
            # not reach the device, where id -1 means "padding/identity"
            if any(self.term_id(word) < 0 for word, _ in q):
                continue
            w = max(len(q), 1)
            need = 1
            for word, _ in q:
                need = max(need, self.posting_count(word))
            buckets.setdefault((round_cap(need), w), []).append(i)
        terms_list, rs_list, caps_list, idx_list = [], [], [], []
        for (qcap, w), idxs in sorted(buckets.items()):
            # pad the batch dim to a power of two: batch compositions vary
            # per call, and every new shape tuple would otherwise compile a
            # new fused program (padding rows are empty queries: terms -1)
            brows = _bucket(len(idxs), lo=8)
            terms = np.full((brows, w), -1, dtype=np.int32)
            rs = np.ones((brows, w), dtype=np.int32)
            for row, i in enumerate(idxs):
                for j, (word, r) in enumerate(queries[i]):
                    terms[row, j] = self.term_id(word)
                    rs[row, j] = r
            terms_list.append(jnp.asarray(terms))
            rs_list.append(jnp.asarray(rs))
            caps_list.append(qcap)
            idx_list.append(idxs)
        if use_pallas is None:
            import os

            # default ON for TPU: the hybrid sort+scan W2 kernel and
            # merge-free W=1 kernel beat the XLA path on the 10k mixed
            # bench (379k vs 339k QPS, TPU v5e); DOCODO_PALLAS=0/1
            # overrides
            env = os.environ.get("DOCODO_PALLAS")
            if env is not None:
                use_pallas = env == "1"
            else:
                use_pallas = jax.default_backend() == "tpu"
        outs = multi_bucket_query_step(
            self.term_offsets, self.coords, self.bounds, self.page_doc,
            tuple(terms_list), tuple(rs_list), tuple(caps_list), topk,
            use_pallas=use_pallas,
            # an explicit cap override may TRUNCATE long posting lists,
            # which the small tables cannot serve (no row for count>cap)
            small=self.small if cap is None else None,
            page_of=self.page_of if cap is None else None,
        )
        for idxs, (p, r_, c) in zip(idx_list, outs):
            n = len(idxs)
            pages[idxs] = np.asarray(p)[:n]
            ranks[idxs] = np.asarray(r_)[:n]
            counts[idxs] = np.asarray(c)[:n]
        return pages, ranks, counts

    def compile_group_query(self, query):
        """Normalize one group query [(codes, r), ...] (codes a str or a
        sequence of variant code strings) into (id rows, rs, w, v, cap
        need, min_need). Returns None when some group resolves to NO
        known terms — the query then matches nothing (host parity: an
        empty PostingSeq annihilates the AND, and unknown OR branches
        contribute nothing).

        min_need is the smallest group's posting volume (variant counts
        summed) — an a-priori scale for the RESULT size used to tier the
        hit-stream readback buffer (the result is not strictly bounded
        by it, so overflow is still detected via n_hits).

        Compilations cache per query shape: production query streams
        repeat heavily (the compile is pure dict/count lookups over this
        immutable index), and the per-query Python otherwise dominates
        the host-API batch path.
        """
        try:
            key = tuple(
                (codes if isinstance(codes, str) else tuple(codes), r)
                for codes, r in query
            )
        except TypeError:
            key = None
        if key is not None:
            cached = self._cgq_cache.get(key)
            if cached is not None or key in self._cgq_cache:
                return cached
        out = self._compile_group_query_uncached(query)
        if key is not None and len(self._cgq_cache) < 200_000:
            self._cgq_cache[key] = out
        return out

    def _compile_group_query_uncached(self, query):
        rows, rvals, needs = [], [], []
        need = 1
        min_need = None
        for codes, r in query:
            if isinstance(codes, str):
                codes = (codes,)
            ids = []
            group_vol = 0
            group_max = 1
            for c in codes:
                tid = self.term_id(c)
                if tid >= 0:
                    ids.append(tid)
                    cnt = self.posting_count(c)
                    need = max(need, cnt)
                    group_max = max(group_max, cnt)
                    group_vol += cnt
            if not ids:
                return None
            min_need = group_vol if min_need is None else min(
                min_need, group_vol
            )
            rows.append(ids)
            rvals.append(r)
            needs.append(group_max)
        w = max(len(rows), 1)
        v = max((len(ids) for ids in rows), default=1)
        return rows, rvals, w, v, need, min_need or 1, tuple(needs)

    def search_batch_full(
        self, queries, topk: int = 64, hit_cap: int = 512,
        cap: Optional[int] = None,
        cap_ladder: Optional[Sequence[int]] = None,
        fused: bool = True, deferred: bool = False,
        want_docs: bool = True, use_pallas: Optional[bool] = None,
        clamp_budgets: bool = False,
    ):
        """Full-result batch evaluation with per-word variant ORs.

        queries: per query a list of (codes, r) groups; codes is a term
        key or a sequence of OR'd variant keys (the reference's voc-code
        sets and `a|b` alternations, ref Search.cs:226-247).

        Returns a dict of numpy arrays: pages/ranks/counts [B, topk],
        n_pages/n_hits [B], hits [B, hit_cap] (the ascending kept
        coordinate stream, INT32_MAX padded — exactly the top-k pages'
        hits whenever the result is served, see LocateFull), and — only
        with want_docs — docs/doc_ranks [B, topk]. Callers that
        recompute doc ranks host-side (full materialization) pass
        want_docs=False and skip those readback bytes.
        n_pages > topk or n_hits > hit_cap flags rank truncation.

        clamp_budgets (the ESCALATION mode): per bucket, topk clamps to
        the bucket cap (lax.top_k needs k <= the stream length) and the
        hit buffer to the merged-stream bound (so hits can never
        truncate); the per-row effective budgets come back in
        out["topk_eff"]/out["hit_cap_eff"] for the caller's truncation
        check.
        """
        if use_pallas is None:
            import os

            env = os.environ.get("DOCODO_PALLAS")
            if env is not None:
                use_pallas = env == "1"
            else:
                use_pallas = jax.default_backend() == "tpu"
        b = len(queries)
        out = {
            "pages": np.full((b, topk), -1, dtype=np.int32),
            "ranks": np.zeros((b, topk), dtype=np.float32),
            "counts": np.zeros((b, topk), dtype=np.int32),
            "n_pages": np.zeros(b, dtype=np.int32),
            "n_hits": np.zeros(b, dtype=np.int32),
            "hits": np.full((b, hit_cap), INT32_MAX, dtype=np.int32),
        }
        if want_docs:
            out["docs"] = np.full((b, topk), -1, dtype=np.int32)
            out["doc_ranks"] = np.zeros((b, topk), dtype=np.float32)
        if clamp_budgets:
            out["topk_eff"] = np.full(b, topk, dtype=np.int64)
            out["hit_cap_eff"] = np.full(b, hit_cap, dtype=np.int64)

        def round_cap(need: int) -> int:
            if cap:
                return cap
            if cap_ladder:
                for c in cap_ladder:
                    if need <= c:
                        return c
            return _bucket(need)

        # hit-stream readback tiers: the hits buffer dominates the
        # device->host bytes (measured: the full-result TPU bench is
        # READBACK-bound over a tunnel), so queries whose smallest
        # operand bounds the expected result small read back a small
        # buffer; overflow still flags via n_hits and re-serves.
        # FUSED path only: in per-bucket serving mode extra tiers
        # multiply the bucket count — each bucket is its own dispatch
        # and compile shape, which costs more than the bytes save
        # (measured: serving QPS halved with tiers on)
        hit_tiers = sorted({
            min(hit_cap, t) for t in (128, 512, hit_cap)
        }) if fused else [hit_cap]

        def hit_tier(min_need: int) -> int:
            want = 4 * min_need + 16
            for t in hit_tiers:
                if want <= t:
                    return t
            return hit_cap

        compiled = []
        buckets = {}
        for i, q in enumerate(queries):
            cg = self.compile_group_query(q)
            compiled.append(cg)
            if cg is None:
                continue
            rows, rvals, w, v, need, min_need, needs = cg
            vb = _bucket(v, lo=1)
            qcap = round_cap(need)
            if (w == 2 and vb == 1 and cap is None
                    and isinstance(qcap, int) and qcap >= ASYM_CAP_MIN
                    and _asym_enabled()):
                # ASYMMETRIC bucket: a skewed W=2 pair (frequent word x
                # rare word) fetches each word at its own cap — the
                # merged stream shrinks from 2*cap_hi toward cap_hi,
                # halving the tagged sort and the whole locate tail
                c0, c1 = round_cap(needs[0]), round_cap(needs[1])
                if min(c0, c1) <= max(c0, c1) // 4:
                    qcap = (c0, c1)
            buckets.setdefault(
                (qcap, w, vb, hit_tier(min_need)), []
            ).append(i)

        # SMALL-BUCKET MERGING (fused path, measured NEGATIVE — default
        # OFF): buckets sharing (W, V, hit tier) that differ only in
        # small caps can merge into one bucket at the largest member
        # cap (readback bytes unchanged — same hit tier; hcap merging
        # would grow the readback this tunnel-bound path exists to
        # avoid). A/B on the 10k EN mix (back-to-back, final r4 kernel
        # set): OFF 995.4k / ON 975.0k QPS — the padded kernel work
        # exceeds the saved per-bucket thunk cost, consistent with the
        # refreshed PROFILE_r04 where the small-B per-bucket "fixed
        # cost" turned out to be isolated-measurement noise, not real
        # fused-program time. Kept env-gated (DOCODO_MERGE_SMALL_B=n
        # admits buckets with B<=n) for future hardware re-tests.
        merge_b = int(_os.environ.get("DOCODO_MERGE_SMALL_B", "0"))
        merge_cap = int(_os.environ.get("DOCODO_MERGE_CAP_MAX", "512"))
        if fused and cap is None and merge_b:
            mgroups = {}
            for key in list(buckets):
                qc, w, vb, hb = key
                if (isinstance(qc, int) and qc <= merge_cap
                        and len(buckets[key]) <= merge_b):
                    mgroups.setdefault((w, vb, hb), []).append(key)
            for (w, vb, hb), keys in mgroups.items():
                if len(keys) < 2:
                    continue
                tkey = (max(k[0] for k in keys), w, vb, hb)
                merged = []
                for k in keys:
                    merged.extend(buckets.pop(k))
                buckets.setdefault(tkey, []).extend(merged)

        terms_list, rs_list, caps_list, hcaps_list, idx_list = (
            [], [], [], [], []
        )
        topks_list = []
        for (qcap, w, vb, hb), idxs in sorted(
                buckets.items(), key=_bucket_sort_key):
            topk_b = topk
            if clamp_budgets:
                stream_n = (sum(qcap) if isinstance(qcap, tuple)
                            else qcap * max(2, 2 * vb))
                topk_b = min(
                    topk, qcap if isinstance(qcap, int) else stream_n
                )
                hb = min(hit_cap, stream_n)
                out["topk_eff"][idxs] = topk_b
                out["hit_cap_eff"][idxs] = hb
            topks_list.append(topk_b)
            brows = _bucket4(len(idxs)) if not fused else _bucket(
                len(idxs), lo=8
            )
            if vb == 1:
                terms = np.full((brows, w), -1, dtype=np.int32)
            else:
                terms = np.full((brows, w, vb), -1, dtype=np.int32)
            rs = np.ones((brows, w), dtype=np.int32)
            for row, i in enumerate(idxs):
                rows_i, rvals_i = compiled[i][0], compiled[i][1]
                for j, (ids, r) in enumerate(zip(rows_i, rvals_i)):
                    if vb == 1:
                        terms[row, j] = ids[0]
                    else:
                        terms[row, j, : len(ids)] = ids
                    rs[row, j] = r
            terms_list.append(jnp.asarray(terms))
            rs_list.append(jnp.asarray(rs))
            caps_list.append(qcap)
            hcaps_list.append(hb)
            idx_list.append(idxs)

        if not idx_list:
            return (lambda: out) if deferred else out
        # an explicit cap override may TRUNCATE long posting lists,
        # which the small tables cannot serve (no row for count>cap)
        small = self.small if cap is None else None
        page_of = self.page_of if cap is None else None
        chunked = _chunked_mode()
        if fused and not clamp_budgets:
            outs = multi_bucket_query_full(
                self.term_offsets, self.coords, self.bounds, self.page_doc,
                self.header_mask(), tuple(terms_list), tuple(rs_list),
                tuple(caps_list), topk, tuple(hcaps_list),
                with_docs=want_docs, use_pallas=use_pallas, small=small,
                chunked=chunked, page_of=page_of,
            )
        else:
            # per-bucket cached jits: serving batch compositions churn,
            # so one fused program per composition would recompile
            # endlessly — individual bucket shapes recur and cache
            outs = [
                batched_query_full(
                    self.term_offsets, self.coords, self.bounds,
                    self.page_doc, self.header_mask(), tq, rq,
                    cap=qcap, topk=tk, hit_cap=hb,
                    with_docs=want_docs, use_pallas=use_pallas,
                    small=small, chunked=chunked, page_of=page_of,
                )
                for tq, rq, qcap, hb, tk in zip(
                    terms_list, rs_list, caps_list, hcaps_list,
                    topks_list
                )
            ]
        def finish():
            # ONE coalesced transfer for the whole result pytree:
            # per-array np.asarray readbacks are separate device->host
            # round trips, and remote-tunnel devices stall intermittently
            # under many small readbacks (see CLAUDE.md)
            outs_h = jax.device_get(outs)
            for idxs, hb, tk, o in zip(idx_list, hcaps_list, topks_list,
                                       outs_h):
                n = len(idxs)
                out["pages"][np.ix_(idxs, range(tk))] = o.pages[:n]
                out["ranks"][np.ix_(idxs, range(tk))] = o.ranks[:n]
                out["counts"][np.ix_(idxs, range(tk))] = o.counts[:n]
                if want_docs:
                    out["docs"][np.ix_(idxs, range(tk))] = o.docs[:n]
                    out["doc_ranks"][np.ix_(idxs, range(tk))] = \
                        o.doc_ranks[:n]
                out["n_pages"][idxs] = o.n_pages[:n]
                # a query overflowing its TIER (within the global budget)
                # must flag truncation: n_hits > hits columns delivered
                out["n_hits"][idxs] = np.where(
                    o.n_hits[:n] > hb, np.int32(hit_cap + 1), o.n_hits[:n]
                ) if hb < hit_cap else o.n_hits[:n]
                out["hits"][idxs, :hb] = o.hits[:n]
            return out

        # deferred: the device work is DISPATCHED (async) — the caller
        # collects the next batch while this one's readback is in flight
        # and calls finish() from a completion thread
        return finish if deferred else finish()
