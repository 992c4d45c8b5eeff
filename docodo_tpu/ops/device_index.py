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

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from docodo_tpu.ops.seqops import INF32, combine_r, device_and, pad_to

INT32_MAX = int(INF32)


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
# query: gather -> AND fold -> locate/rank -> top-k
# ---------------------------------------------------------------------------

def gather_term(coords, term_offsets, term, cap: int):
    """Fetch one term's postings into a fixed [cap] buffer.

    term < 0 (query padding) yields an empty list. Lists longer than
    `cap` are truncated to their first `cap` coords (callers pick the
    bucket cap from real lengths, so truncation only guards compile-time
    shape reuse).
    """
    term = jnp.asarray(term, dtype=jnp.int32)
    safe = jnp.maximum(term, 0)
    start = term_offsets[safe]
    ln = term_offsets[safe + 1] - start
    ln = jnp.where(term >= 0, ln, 0)
    ln = jnp.minimum(ln, cap).astype(jnp.int32)
    idx = start + jnp.arange(cap, dtype=jnp.int32)
    vals = coords[jnp.minimum(idx, coords.shape[0] - 1)]
    vals = jnp.where(jnp.arange(cap, dtype=jnp.int32) < ln, vals, INF32)
    return vals, ln


def eval_and_query(coords, term_offsets, terms, rs, cap: int):
    """Left-fold proximity-AND over a query's terms (padded with -1).

    Mirrors the reference expression fold A*B*C (ref Search.cs:501 via
    IndexSequence.operator*). A padded term is the identity: the fold
    keeps the running (coords, n, r) unchanged. Result buffer is fixed at
    2*cap coords (group emission of the final pair).
    """
    w = terms.shape[0]
    acc, n_acc = gather_term(coords, term_offsets, terms[0], cap)
    acc = jnp.concatenate([acc, jnp.full(cap, INF32, dtype=acc.dtype)])
    r_acc = rs[0]
    for q in range(1, w):
        b, nb = gather_term(coords, term_offsets, terms[q], cap)
        out, n_out, r_out = device_and(
            acc, n_acc, r_acc, b, nb, rs[q], out_cap=2 * cap
        )
        skip = terms[q] < 0
        acc = jnp.where(skip, acc, out)
        n_acc = jnp.where(skip, n_acc, n_out)
        r_acc = jnp.where(skip, r_acc, r_out)
    return acc, n_acc, r_acc


def locate_topk(coords, n, bounds, page_doc, topk: int):
    """Coordinate stream -> (top-k page indices, ranks, per-page counts).

    Page rank = 1 + sum(30 // max(5, gap)) + ln(hits) over each page's
    hit run (ref Search.cs:99-111, integer division preserved).
    """
    p = coords.shape[0]
    valid = (jnp.arange(p, dtype=jnp.int32) < n) & (coords < INF32)
    page = jnp.searchsorted(bounds, coords, side="right").astype(jnp.int32)
    page = jnp.minimum(page, bounds.shape[0] - 1)

    first = jnp.concatenate(
        [jnp.ones(1, dtype=bool), page[1:] != page[:-1]]
    ) & valid
    run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    prev_coord = jnp.concatenate([jnp.zeros(1, coords.dtype), coords[:-1]])
    gap = jnp.maximum(coords - prev_coord, 0)
    bonus = jnp.where(valid & ~first, 30 // jnp.maximum(5, gap), 0)
    bonus = bonus.astype(jnp.float32)
    nseg = p
    run_bonus = jax.ops.segment_sum(
        bonus, run_id, num_segments=nseg, indices_are_sorted=True
    )
    run_count = jax.ops.segment_sum(
        valid.astype(jnp.float32), run_id, num_segments=nseg,
        indices_are_sorted=True,
    )
    run_rank = jnp.where(
        run_count > 0,
        1.0 + run_bonus + jnp.log(jnp.maximum(run_count, 1.0)),
        0.0,
    )
    # scatter rank back to the first slot of each run, then top-k over slots
    slot_rank = jnp.where(first, run_rank[run_id], 0.0)
    top_rank, top_slot = jax.lax.top_k(slot_rank, topk)
    top_page = jnp.where(top_rank > 0, page[top_slot], -1)
    top_count = jnp.where(
        top_rank > 0, run_count[run_id[top_slot]].astype(jnp.int32), 0
    )
    return top_page, top_rank, top_count


def query_step(term_offsets, coords, bounds, page_doc, terms, rs,
               cap: int, topk: int):
    """One query end-to-end on device: AND fold -> top-k ranked pages."""
    hit, n, _ = eval_and_query(coords, term_offsets, terms, rs, cap)
    return locate_topk(hit, n, bounds, page_doc, topk)


@functools.partial(jax.jit, static_argnames=("cap", "topk"))
def batched_query_step(term_offsets, coords, bounds, page_doc,
                       terms, rs, cap: int, topk: int):
    """The flagship device program: a [B, W] batch of proximity/phrase
    queries evaluated in one XLA computation.

    terms : int32[B, W] term ids, -1 padded
    rs    : int32[B, W] per-term windows (negative = ordered/exact)
    Returns (pages int32[B, topk], ranks f32[B, topk], counts int32[B, topk]).
    """
    fn = functools.partial(query_step, cap=cap, topk=topk)
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

    @classmethod
    def from_index(cls, ind) -> "DeviceIndex":
        """Upload a host Index (ArrayIndex CSR + PageTable) to device."""
        arr = ind.arr
        if arr.coords is None:
            raise ValueError("device upload requires an in-memory index")
        pt = ind.pages
        return cls(
            term_offsets=jnp.asarray(arr.offsets, dtype=jnp.int32),
            coords=jnp.asarray(arr.coords.astype(np.int64), dtype=jnp.int32),
            bounds=jnp.asarray(pt.bounds.astype(np.int64), dtype=jnp.int32),
            page_doc=jnp.asarray(pt.page_doc, dtype=jnp.int32),
            terms=list(arr.terms),
            page_ids=list(pt.page_ids),
            doc_names=list(pt.doc_names),
            _tmap=dict(arr._tmap),
        )

    def term_id(self, term: str) -> int:
        return self._tmap.get(term, -1)

    def posting_count(self, term: str) -> int:
        tid = self.term_id(term)
        if tid < 0:
            return 0
        off = np.asarray(self.term_offsets[tid: tid + 2])
        return int(off[1] - off[0])

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
            for j, (word, r) in enumerate(q):
                tid = self.term_id(word)
                terms[i, j] = tid
                rs[i, j] = r
                if tid >= 0:
                    max_len = max(max_len, self.posting_count(word))
        return terms, rs, _bucket(max_len)

    def search_batch(
        self, queries: Sequence[Sequence[Tuple[str, int]]],
        topk: int = 16, cap: Optional[int] = None,
    ):
        """Evaluate a batch of AND/phrase queries; returns numpy
        (pages, ranks, counts) with -1/-0 padding in rank order."""
        terms, rs, auto_cap = self.compile_queries(queries)
        pages, ranks, counts = batched_query_step(
            self.term_offsets, self.coords, self.bounds, self.page_doc,
            jnp.asarray(terms), jnp.asarray(rs),
            cap=cap or auto_cap, topk=topk,
        )
        return np.asarray(pages), np.asarray(ranks), np.asarray(counts)
