"""Device index build + batched query vs the host engine, single-shard
and over an 8-virtual-device mesh."""

import numpy as np
import pytest

from docodo_tpu.lang.tokenizer import tokenize
from docodo_tpu.ops import device_index as di
from docodo_tpu.ops.seqops import INF32

TEXTS = [
    "the pickwick club met at noon and the club adjourned",
    "mr pickwick spoke to the club about travels and adventures",
    "travels through kent were recounted by the club members",
    "noon came and went while pickwick pondered the club rules",
]


def build_tiny():
    """Tokenize TEXTS as one doc per text, one page per doc, global
    coordinate space (single shard)."""
    term_to_id = {}
    tids, coords, bounds, page_doc = [], [], [], []
    base = 0
    for d, text in enumerate(TEXTS):
        words, starts = tokenize(text)
        for word, pos in zip(words, starts):
            tid = term_to_id.setdefault(word, len(term_to_id))
            tids.append(tid)
            coords.append(base + int(pos))
        base += len(text)
        bounds.append(base)
        page_doc.append(d)
    return (
        term_to_id,
        np.asarray(tids, dtype=np.int32),
        np.asarray(coords, dtype=np.int32),
        np.asarray(bounds, dtype=np.int32),
        np.asarray(page_doc, dtype=np.int32),
    )


def test_build_postings_matches_host():
    term_to_id, tids, coords, bounds, page_doc = build_tiny()
    T = len(term_to_id)
    # shuffle the stream; device sort must restore (term, coord) order
    rng = np.random.default_rng(7)
    perm = rng.permutation(tids.size)
    cap = 256
    pt = np.full(cap, int(INF32), dtype=np.int32)
    pc = np.full(cap, int(INF32), dtype=np.int32)
    pt[: tids.size] = tids[perm]
    pc[: tids.size] = coords[perm]
    st, sc, off = di.build_postings(pt, pc, T)
    st, sc, off = np.asarray(st), np.asarray(sc), np.asarray(off)
    for word, tid in term_to_id.items():
        want = np.sort(coords[tids == tid])
        got = sc[off[tid]: off[tid + 1]]
        np.testing.assert_array_equal(got, want, err_msg=word)


def test_batched_query_matches_brute_force():
    term_to_id, tids, coords, bounds, page_doc = build_tiny()
    T = len(term_to_id)
    st, sc, off = di.build_postings(tids.copy(), coords.copy(), T)
    queries = [
        [(term_to_id["club"], 200)],
        [(term_to_id["pickwick"], -12), (term_to_id["club"], -8)],
        # window must stay below the ~55-char doc length: coordinates are
        # global, so a wide window chains hits across these tiny docs
        # (reference semantics — coords are corpus-global char offsets)
        [(term_to_id["noon"], 30), (term_to_id["club"], 30)],
    ]
    terms = np.full((3, 2), -1, dtype=np.int32)
    rs = np.ones((3, 2), dtype=np.int32)
    for i, q in enumerate(queries):
        for j, (t, r) in enumerate(q):
            terms[i, j] = t
            rs[i, j] = r
    import jax.numpy as jnp

    pages, ranks, counts = di.batched_query_step(
        off, sc, jnp.asarray(bounds), jnp.asarray(page_doc),
        jnp.asarray(terms), jnp.asarray(rs), cap=32, topk=4,
    )
    pages = np.asarray(pages)
    # q0: single word "club" appears in all 4 docs
    assert sorted(p for p in pages[0] if p >= 0) == [0, 1, 2, 3]
    # q1: ordered phrase "pickwick club" only doc 0 has pickwick<club adjacency
    hit_pages = {p for p in pages[1] if p >= 0}
    assert hit_pages == {0}
    # q2: noon & club within 30 chars: doc 0 (noon@25/club@38), plus the
    # cross-document group club@end-of-doc2 + noon@start-of-doc3 (11
    # apart in the global coordinate space) -> pages 2 and 3. Doc 3's
    # own noon..club gap is 47, so page 3 only hits via that chain.
    assert {int(p) for p in pages[2] if p >= 0} == {0, 2, 3}


def test_sharded_build_and_query_8dev():
    import jax

    from docodo_tpu.parallel import sharding as sh

    assert len(jax.devices()) >= 8
    mesh = sh.make_mesh(8)

    term_to_id = {}
    docs, doc_pages = [], []
    for text in TEXTS * 2:  # 8 docs over 8 devices
        toks = []
        words, starts = tokenize(text)
        for word, pos in zip(words, starts):
            tid = term_to_id.setdefault(word, len(term_to_id))
            toks.append((tid, int(pos)))
        docs.append(toks)
        doc_pages.append([len(text)])
    corpus = sh.stage_shards(docs, doc_pages, term_to_id, num_shards=8)
    T = len(term_to_id)

    queries = [
        [(term_to_id["pickwick"], -12), (term_to_id["club"], -8)],
        [(term_to_id["travels"], 300)],
    ]
    terms = np.full((2, 2), -1, dtype=np.int32)
    rs = np.ones((2, 2), dtype=np.int32)
    for i, q in enumerate(queries):
        for j, (t, r) in enumerate(q):
            terms[i, j] = t
            rs[i, j] = r

    pages, ranks, counts = sh.full_step(
        mesh, corpus, terms, rs, num_terms=T, cap=16, topk=8
    )
    pages = np.asarray(pages)
    # doc0 text appears twice (docs 0 and 4) -> phrase hits on 2 global pages
    assert sum(1 for p in pages[0] if p >= 0) == 2
    # "travels" in texts 1 and 2, duplicated -> 4 pages
    assert sum(1 for p in pages[1] if p >= 0) == 4


def test_variants_or_then_and():
    """Morphological variant expansion: word = OR of term ids, then AND."""
    import jax.numpy as jnp

    term_to_id, tids, coords, bounds, page_doc = build_tiny()
    T = len(term_to_id)
    st, sc, off = di.build_postings(tids.copy(), coords.copy(), T)
    # word1 = {pickwick}; word2 = {club, members?}  (members not in TEXTS
    # vocabulary, so use variants {club, rules})
    v = np.full((1, 2, 2), -1, dtype=np.int32)
    v[0, 0, 0] = term_to_id["pickwick"]
    v[0, 1, 0] = term_to_id["club"]
    v[0, 1, 1] = term_to_id["rules"]
    rs = np.full((1, 2), 60, dtype=np.int32)
    pages, ranks, counts = di.batched_query_step_variants(
        off, sc, jnp.asarray(bounds), jnp.asarray(page_doc),
        jnp.asarray(v), jnp.asarray(rs), cap=32, topk=8,
    )
    got = {int(p) for p in np.asarray(pages)[0] if p >= 0}
    # oracle: host algebra with OR variants
    from docodo_tpu.core.postings import group_and, or_merge

    def plist(w):
        return np.sort(coords[tids == term_to_id[w]]).astype(np.uint64)

    orred, _ = or_merge(plist("club"), plist("rules"), 60, 60)
    want_coords, _ = group_and(plist("pickwick"), orred, 60, 60)
    import numpy as _np

    want_pages = set(
        _np.searchsorted(bounds, _np.asarray(want_coords, dtype=np.int64),
                         side="right").tolist()
    )
    assert got == want_pages


def test_unknown_word_annihilates_query():
    """A query containing an out-of-vocabulary word matches NOTHING
    (host parity) — it must not be confused with -1 query padding."""
    import jax.numpy as jnp

    from docodo_tpu.ops.device_index import DeviceIndex

    term_to_id, tids, coords, bounds, page_doc = build_tiny()
    T = len(term_to_id)
    st, sc, off = di.build_postings(tids.copy(), coords.copy(), T)
    dix = DeviceIndex(
        term_offsets=off, coords=sc, bounds=jnp.asarray(bounds),
        page_doc=jnp.asarray(page_doc),
        terms=list(term_to_id), page_ids=[str(i) for i in range(4)],
        doc_names=[f"d{i}" for i in range(4)], _tmap=dict(term_to_id),
        offsets_np=np.asarray(off), page_doc_np=page_doc,
        bounds_np=bounds.astype(np.int64),
    )
    pages, ranks, counts = dix.search_batch(
        [[("club", 200), ("qqqqzzzz", 200)], [("club", 200)]], topk=4
    )
    assert (pages[0] == -1).all()          # unknown word -> no results
    assert (pages[1] >= 0).any()           # known word still works


def test_padded_query_width_parity():
    """The same 2-term query must give identical results at any padded
    width (regression: stale keep mask after mid-fold compaction)."""
    import jax.numpy as jnp

    term_to_id, tids, coords, bounds, page_doc = build_tiny()
    T = len(term_to_id)
    st, sc, off = di.build_postings(tids.copy(), coords.copy(), T)
    base = [term_to_id["pickwick"], term_to_id["club"]]
    for w in (2, 3, 4):
        terms = np.full((1, w), -1, dtype=np.int32)
        rs = np.full((1, w), 60, dtype=np.int32)
        terms[0, :2] = base
        pages, _, _ = di.batched_query_step(
            off, sc, jnp.asarray(bounds), jnp.asarray(page_doc),
            jnp.asarray(terms), jnp.asarray(rs), cap=32, topk=4,
        )
        got = sorted(int(p) for p in np.asarray(pages)[0] if p >= 0)
        if w == 2:
            want = got
        assert got == want, f"width {w}: {got} != {want}"


def test_variants_v3_post_compact_mask():
    """Three OR'd variants per word exercise the mid-fold compaction in
    gather_word_variants (regression: stale keep mask after compact)."""
    import jax.numpy as jnp

    term_to_id, tids, coords, bounds, page_doc = build_tiny()
    T = len(term_to_id)
    st, sc, off = di.build_postings(tids.copy(), coords.copy(), T)
    v = np.full((1, 2, 3), -1, dtype=np.int32)
    v[0, 0, 0] = term_to_id["pickwick"]
    v[0, 1, :] = [term_to_id["club"], term_to_id["rules"],
                  term_to_id["travels"]]
    rs = np.full((1, 2), 60, dtype=np.int32)
    pages, ranks, counts = di.batched_query_step_variants(
        off, sc, jnp.asarray(bounds), jnp.asarray(page_doc),
        jnp.asarray(v), jnp.asarray(rs), cap=32, topk=8,
    )
    got = {int(p) for p in np.asarray(pages)[0] if p >= 0}

    from docodo_tpu.core.postings import group_and, or_merge

    def plist(w):
        return np.sort(coords[tids == term_to_id[w]]).astype(np.uint64)

    orred, _ = or_merge(plist("club"), plist("rules"), 60, 60)
    orred, _ = or_merge(orred, plist("travels"), 60, 60)
    want_coords, _ = group_and(plist("pickwick"), orred, 60, 60)
    want = set(np.searchsorted(
        bounds, np.asarray(want_coords, dtype=np.int64), side="right"
    ).tolist())
    assert got == want


def test_sharded_equals_single_device():
    """The mesh-sharded build+query must return the same global page
    hits as evaluating each shard's documents on a single device."""
    import jax
    import jax.numpy as jnp

    from docodo_tpu.parallel import sharding as sh

    term_to_id = {}
    docs, doc_pages = [], []
    rng = np.random.default_rng(21)
    vocab = [f"w{chr(97 + i)}{chr(97 + j)}" for i in range(8) for j in range(8)]
    for _ in range(8):
        words = rng.choice(vocab, size=40)
        text = " ".join(words)
        toks = []
        pos = 0
        for w in words:
            toks.append((term_to_id.setdefault(w, len(term_to_id)), pos))
            pos += len(w) + 1
        docs.append(toks)
        doc_pages.append([len(text)])
    T = len(term_to_id)
    corpus = sh.stage_shards(docs, doc_pages, term_to_id, num_shards=8)
    mesh = sh.make_mesh(8)

    qwords = rng.choice(len(vocab), size=(6, 2)).astype(np.int32) % T
    terms = qwords.copy()
    terms[::3, 1] = -1
    rs = np.full((6, 2), 50, dtype=np.int32)

    pages, ranks, counts = sh.full_step(
        mesh, corpus, terms, rs, num_terms=T, cap=64, topk=16
    )
    pages = np.asarray(pages)

    # single-device oracle: evaluate each shard separately, same kernels
    import jax.numpy as jnp

    all_hits = [set() for _ in range(6)]
    for s in range(8):
        st, sc, off = di.build_postings(
            corpus.term_ids[s].copy(), corpus.coords[s].copy(), T
        )
        p1, r1, c1 = di.batched_query_step(
            off, sc, jnp.asarray(corpus.bounds[s]),
            jnp.asarray(corpus.page_doc[s]),
            jnp.asarray(terms), jnp.asarray(rs), cap=64, topk=16,
        )
        p1 = np.asarray(p1)
        for qi in range(6):
            for p in p1[qi]:
                if p >= 0:
                    all_hits[qi].add(int(p) + int(corpus.page_base[s]))
    for qi in range(6):
        got = {int(p) for p in pages[qi] if p >= 0}
        want = all_hits[qi]
        if len(want) > 16:
            assert got <= want and len(got) == 16
        else:
            assert got == want, qi


def _tiny_device_index():
    import jax.numpy as jnp

    from docodo_tpu.ops.device_index import DeviceIndex

    term_to_id, tids, coords, bounds, page_doc = build_tiny()
    T = len(term_to_id)
    st, sc, off = di.build_postings(tids.copy(), coords.copy(), T)
    dix = DeviceIndex(
        term_offsets=off, coords=sc, bounds=jnp.asarray(bounds),
        page_doc=jnp.asarray(page_doc),
        # ids start at "1": id "0" means a HEADER page (x10 doc boost)
        terms=list(term_to_id), page_ids=[str(i + 1) for i in range(4)],
        doc_names=[f"d{i}" for i in range(4)], _tmap=dict(term_to_id),
        offsets_np=np.asarray(off), page_doc_np=page_doc,
        bounds_np=bounds.astype(np.int64),
    )
    return dix, term_to_id, tids, coords, bounds


def test_search_batch_full_hits_and_positions():
    """locate_full must return the exact ascending hit-coordinate stream
    of the top-k pages (the device source of ResultDocPage.pos,
    ref Search.cs:381)."""
    dix, term_to_id, tids, coords, bounds = _tiny_device_index()
    out = dix.search_batch_full(
        [
            [("club", 200)],
            [("pickwick", -12), ("club", -8)],
            [(("club", "rules"), 60), ("pickwick", 60)],
        ],
        topk=8, hit_cap=64,
    )

    def oracle_coords(words, r):
        from docodo_tpu.core.postings import group_and, or_merge

        def plist(w):
            return np.sort(coords[tids == term_to_id[w]]).astype(np.uint64)

        acc = None
        for w in words:
            if isinstance(w, tuple):
                cur = plist(w[0])
                for w2 in w[1:]:
                    cur, _ = or_merge(cur, plist(w2), r, r)
            else:
                cur = plist(w)
            acc = cur if acc is None else group_and(acc, cur, r, r)[0]
        return np.asarray(acc, dtype=np.int64)

    # q0: single word -> hits are exactly the posting list
    want = oracle_coords(["club"], 200)
    got = out["hits"][0][: out["n_hits"][0]]
    np.testing.assert_array_equal(got, want)
    assert out["n_pages"][0] == 4

    # q2: variant OR then AND
    want = oracle_coords([("club", "rules"), "pickwick"], 60)
    got = out["hits"][2][: out["n_hits"][2]]
    np.testing.assert_array_equal(got, want)


def test_search_batch_full_truncation_flags():
    """n_pages / n_hits report UNtruncated totals so callers can detect
    rank truncation and fall back for exactness. n_hits is the TOTAL
    kept-hit count (for served results — n_pages <= topk — this equals
    the top-k pages' hit count; truncated results always re-serve
    host-side, so only the flags matter)."""
    dix, term_to_id, tids, *_ = _tiny_device_index()
    out = dix.search_batch_full([[("club", 200)]], topk=2, hit_cap=2)
    assert out["n_pages"][0] == 4 > 2       # more pages than topk
    n_club = int((tids == term_to_id["club"]).sum())
    assert out["n_hits"][0] == n_club > 2   # total hits overflow hit_cap
    # the hit buffer still carries the LOWEST hit_cap kept coords
    hits = out["hits"][0]
    assert (hits[:2] < np.iinfo(np.int32).max).all()


def test_search_batch_full_doc_ranks_match_host_formula():
    """Device doc ranks = 1 + ln(sum page ranks) at each doc's first
    top-k slot (ref Search.cs:552-557)."""
    dix, term_to_id, *_ = _tiny_device_index()
    out = dix.search_batch_full([[("club", 200)]], topk=8, hit_cap=64)
    ranks = out["ranks"][0]
    docs = out["docs"][0]
    doc_ranks = out["doc_ranks"][0]
    seen = {}
    for k in range(8):
        if docs[k] < 0:
            continue
        seen.setdefault(int(docs[k]), 0.0)
        seen[int(docs[k])] += float(ranks[k])
    first_slots = {}
    for k in range(8):
        if docs[k] >= 0 and int(docs[k]) not in first_slots:
            first_slots[int(docs[k])] = k
    for d, k in first_slots.items():
        want = 1.0 + np.log(seen[d])
        assert abs(float(doc_ranks[k]) - want) < 1e-4
    # non-first slots carry zero
    for k in range(8):
        if docs[k] >= 0 and first_slots[int(docs[k])] != k:
            assert doc_ranks[k] == 0.0


def test_stage_shards_int32_coordinate_guard():
    """Oversized coordinate spaces must split across shards by document
    or raise clearly — never silently wrap int32 (device contract,
    ops/device_index.py:23-25)."""
    from docodo_tpu.parallel import sharding as sh

    big = int(sh.INT32_COORD_LIMIT * 0.6)  # two fit nowhere together
    doc_tids = [np.zeros(4, dtype=np.int32) for _ in range(3)]
    doc_coords = [np.arange(4, dtype=np.int32) for _ in range(3)]
    doc_pages = [[big], [big], [big]]

    # 3 docs x 0.6 * 2^31 chars over 2 shards: one shard would need two
    # docs -> overflow must raise, not wrap
    with pytest.raises(sh.ShardCoordinateOverflow):
        sh.stage_shards_arrays(doc_tids, doc_coords, doc_pages, num_shards=2)

    # with 3 shards each doc gets its own coordinate space: fine
    corpus = sh.stage_shards_arrays(
        doc_tids, doc_coords, doc_pages, num_shards=3
    )
    assert (corpus.n_tokens == 4).all()

    # a single document beyond 2^31-1 chars can never be staged
    with pytest.raises(sh.ShardCoordinateOverflow):
        sh.stage_shards_arrays(
            doc_tids[:1], doc_coords[:1],
            [[sh.INT32_COORD_LIMIT + 1]], num_shards=8,
        )


def test_stage_shards_arrays_equals_tuples():
    """Array-native staging must produce the same shards as the
    tuple-based reference implementation."""
    from docodo_tpu.parallel import sharding as sh

    term_to_id = {}
    docs, doc_pages, doc_tids, doc_coords = [], [], [], []
    for text in TEXTS:
        words, starts = tokenize(text)
        toks = []
        tids, cs = [], []
        for word, pos in zip(words, starts):
            tid = term_to_id.setdefault(word, len(term_to_id))
            toks.append((tid, int(pos)))
            tids.append(tid)
            cs.append(int(pos))
        docs.append(toks)
        doc_tids.append(np.asarray(tids, dtype=np.int32))
        doc_coords.append(np.asarray(cs, dtype=np.int32))
        doc_pages.append([len(text)])
    a = sh.stage_shards(docs, doc_pages, term_to_id, num_shards=4)
    b = sh.stage_shards_arrays(doc_tids, doc_coords, doc_pages, num_shards=4)
    np.testing.assert_array_equal(a.term_ids, b.term_ids)
    np.testing.assert_array_equal(a.coords, b.coords)
    np.testing.assert_array_equal(a.bounds, b.bounds)
    np.testing.assert_array_equal(a.page_doc, b.page_doc)
    np.testing.assert_array_equal(a.page_base, b.page_base)


def test_from_index_rejects_int32_coordinate_overflow():
    """A corpus beyond 2^31-1 chars cannot fit one device shard's int32
    coordinate space: from_index must raise (pointing at the sharded
    path) instead of silently wrapping coordinates."""
    import docodo_tpu
    from docodo_tpu.ops.device_index import DeviceIndex

    class _FakeArr:
        coords = np.zeros(1, dtype=np.uint64)
        max_coord = (1 << 31) + 5

    ind = docodo_tpu.Index(path=None, in_memory=True)
    ind.arr = _FakeArr()
    with pytest.raises(ValueError, match="2\\^31-1"):
        DeviceIndex.from_index(ind)


def test_packed_build_equals_plain():
    """pack_tokens -> build_postings_packed reproduces build_postings on
    the raw (term_id, start) stream: escape rows (gaps beyond
    PACK_DELTA_MAX), padding rows, and split parts all reconstruct the
    exact coordinates."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n, T = 5000, 700
    ids = rng.integers(0, T, size=n).astype(np.int32)
    gaps = rng.integers(1, 40, size=n).astype(np.int64)
    # sprinkle huge gaps to force escape rows (incl. multi-escape)
    big = rng.choice(n, size=12, replace=False)
    gaps[big] = rng.integers(di.PACK_DELTA_MAX, 40 * di.PACK_DELTA_MAX,
                             size=12)
    starts = np.cumsum(gaps).astype(np.int64)

    packed = di.pack_tokens(ids, starts)
    assert packed.size >= n
    # pad to a static cap like the pipelined build does
    cap = 1 << (int(packed.size - 1).bit_length() + 1)
    pt = np.full(cap, di.PACK_PAD_ROW, dtype=np.uint32)
    pt[: packed.size] = packed
    st_p, sc_p, off_p = di.build_postings_packed(
        jnp.asarray(pt), num_terms=T
    )

    ref_ids = np.full(cap, int(INF32), dtype=np.int32)
    ref_cs = np.full(cap, int(INF32), dtype=np.int32)
    ref_ids[:n] = ids
    ref_cs[:n] = starts.astype(np.int32)
    st_r, sc_r, off_r = di.build_postings(
        jnp.asarray(ref_ids), jnp.asarray(ref_cs), num_terms=T
    )
    assert int(off_p[T]) == n
    np.testing.assert_array_equal(np.asarray(off_p), np.asarray(off_r))
    np.testing.assert_array_equal(
        np.asarray(st_p)[:n], np.asarray(st_r)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(sc_p)[:n], np.asarray(sc_r)[:n]
    )


def test_pack_tokens_split_parts_rebuild_absolute_coords():
    """pack_tokens_split parts stay under max_rows and each part's
    coordinates are ABSOLUTE (the first delta of a later part escapes
    across all preceding text)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n, T = 4000, 300
    ids = rng.integers(0, T, size=n).astype(np.int32)
    starts = np.cumsum(rng.integers(1, 30, size=n)).astype(np.int64)
    max_rows = 1024
    parts = di.pack_tokens_split(ids, starts, max_rows)
    assert len(parts) > 1
    got_coords = []
    for p in parts:
        assert p.size <= max_rows
        pt = np.full(max_rows, di.PACK_PAD_ROW, dtype=np.uint32)
        pt[: p.size] = p
        st, sc, off = di.build_postings_packed(jnp.asarray(pt),
                                               num_terms=T)
        k = int(off[T])
        got_coords.append(np.sort(np.asarray(sc)[:k]))
    got = np.concatenate(got_coords)
    np.testing.assert_array_equal(np.sort(got), np.sort(starts))


def test_gather_term_strategies_agree():
    """gather_term's two fetch strategies (element gather below
    GATHER_SLICE_MIN, dynamic_slice block DMA at/above) return identical
    padded blocks — including terms at the very end of the coords array
    and query-padding terms (-1)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    T = 50
    counts = rng.integers(1, 700, size=T)
    coords_np = np.sort(rng.integers(0, 1 << 20, size=int(counts.sum()))
                        ).astype(np.int32)
    off_np = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    coords = jnp.asarray(coords_np)
    off = jnp.asarray(off_np)
    import docodo_tpu.ops.device_index as di_mod

    orig = di_mod.GATHER_SLICE_MIN
    try:
        for term in [0, T - 1, 17, -1]:
            for cap in (64, 256, 1024):
                di_mod.GATHER_SLICE_MIN = 1  # force slice
                v1, n1 = di_mod.gather_term(coords, off, term, cap)
                di_mod.GATHER_SLICE_MIN = 1 << 30  # force element
                v2, n2 = di_mod.gather_term(coords, off, term, cap)
                assert int(n1) == int(n2)
                np.testing.assert_array_equal(
                    np.asarray(v1), np.asarray(v2)
                )
    finally:
        di_mod.GATHER_SLICE_MIN = orig


def test_doc_group_lookup_paths_agree():
    """doc_group_topk's compare-all doc/header lookup (P <= DOC_CA_MAX)
    and the table-gather fallback (huge page tables) produce identical
    docs/doc_ranks."""
    import jax.numpy as jnp
    import docodo_tpu.ops.device_index as di_mod

    rng = np.random.default_rng(9)
    P, topk = 300, 32
    # 40 docs with contiguous page runs; doc starts are header pages
    # for even docs
    doc_sizes = rng.integers(1, 15, size=40)
    doc_sizes = doc_sizes[np.cumsum(doc_sizes) <= P]
    page_doc_np = np.repeat(np.arange(doc_sizes.size), doc_sizes)
    page_doc_np = np.pad(page_doc_np, (0, P - page_doc_np.size),
                         constant_values=doc_sizes.size - 1)
    starts = np.concatenate([[0], np.cumsum(doc_sizes)[:-1]])
    hdr_np = np.zeros(P, dtype=bool)
    hdr_np[starts[::2]] = True
    page_doc = jnp.asarray(page_doc_np.astype(np.int32))
    is_header = jnp.asarray(hdr_np)
    top_page = jnp.asarray(rng.integers(-1, P, size=topk).astype(np.int32))
    top_rank = jnp.asarray(
        np.where(np.asarray(top_page) >= 0,
                 rng.random(topk).astype(np.float32) + 0.1, 0.0))

    orig = di_mod.DOC_CA_MAX
    try:
        di_mod.DOC_CA_MAX = 1 << 20
        d1, r1 = di_mod.doc_group_topk(top_page, top_rank, page_doc,
                                       is_header)
        di_mod.DOC_CA_MAX = 0  # force the gather fallback
        d2, r2 = di_mod.doc_group_topk(top_page, top_rank, page_doc,
                                       is_header)
    finally:
        di_mod.DOC_CA_MAX = orig
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-6)


def test_small_table_fetch_parity():
    """The small-term posting tables (row-gather fetch for caps below
    GATHER_SLICE_MIN) return exactly the CSR element-gather results —
    per term and through the bucketed full-result path."""
    import jax.numpy as jnp
    import docodo_tpu.ops.device_index as di_mod

    rng = np.random.default_rng(21)
    T = 60
    counts = rng.integers(0, 200, size=T)
    counts[5] = 0       # empty term
    counts[7] = 64      # exactly at the narrow width
    counts[9] = 128     # exactly at the wide width
    off_np = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    coords_np = np.empty(off_np[-1], dtype=np.int32)
    for t in range(T):
        coords_np[off_np[t]:off_np[t + 1]] = np.sort(
            rng.choice(10 ** 6, counts[t], replace=False)
        ).astype(np.int32)
    coords = jnp.asarray(coords_np)
    off = jnp.asarray(off_np.astype(np.int32))

    small = di_mod.build_small_tables(off_np, coords_np)
    assert small is not None
    cums = [st for st in small if not st.band]
    bands = [st for st in small if st.band]
    assert sorted(st.w for st in cums) == [64, 128]
    assert all(st.tab.shape[1] == st.w for st in small)
    # banded widths cover (128, count_max]; counts here are < 256, so
    # only the 256 band holds rows and the rest are empty markers
    assert bands and bands[0].w == 256
    assert all(st.tab.shape[0] == 0 for st in bands[1:])
    # multi-band fetch parity at a cap above the cumulative widths
    for term in [t for t in range(T) if counts[t] <= 256][:8] + [
            int(np.argmax(counts)), -1]:
        v1, n1 = di_mod.gather_term(coords, off, term, 256)
        v2, n2 = di_mod.gather_term(coords, off, term, 256, small)
        assert int(n1) == int(n2), term
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    # combined coords||pages tables: same coords half, page half matches
    # build_page_of at every real lane
    bounds_np = np.arange(3000, 10 ** 6 + 3000, 3000, dtype=np.int64)
    pages_np = di_mod.build_page_of(bounds_np, coords_np)
    np.testing.assert_array_equal(
        pages_np,
        np.minimum(
            np.searchsorted(bounds_np, coords_np, side="right"),
            len(bounds_np) - 1,
        ).astype(np.int32),
    )
    small_pg = di_mod.build_small_tables(
        off_np, coords_np, pages_np=pages_np)
    assert all(t.shape[1] == 2 * w for w, _, t in small_pg)
    page_arr = jnp.asarray(pages_np)
    for cap in (64, 128):
        for term in [t for t in range(T) if counts[t] <= cap][:8] + [-1]:
            v1, n1 = di_mod.gather_term(coords, off, term, cap, small_pg)
            v2, p2, n2 = di_mod.gather_term_paged(
                coords, page_arr, off, term, cap, small_pg)
            v3, p3, n3 = di_mod.gather_term_paged(
                coords, page_arr, off, term, cap, None)
            assert int(n1) == int(n2) == int(n3)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            np.testing.assert_array_equal(np.asarray(v2), np.asarray(v3))
            np.testing.assert_array_equal(np.asarray(p2), np.asarray(p3))
            nn = int(n1)
            if term >= 0 and nn:
                exp = pages_np[off_np[term]:off_np[term] + nn]
                np.testing.assert_array_equal(np.asarray(p2)[:nn], exp)

    for cap in (64, 128):
        for term in [t for t in range(T) if counts[t] <= cap][:12] + [-1]:
            v1, n1 = di_mod.gather_term(coords, off, term, cap)
            v2, n2 = di_mod.gather_term(coords, off, term, cap, small)
            assert int(n1) == int(n2), (term, cap)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    # bucketed full-result program: identical outputs with tables on/off
    ok = [t for t in range(T) if 0 < counts[t] <= 64]
    terms = np.array(
        [[a, b] for a in ok[:6] for b in ok[6:12]], np.int32
    )
    rs = np.full(terms.shape, 400, np.int32)
    rs[::3] = -400  # some ordered/phrase rows
    bounds = jnp.asarray(
        np.arange(3000, 10 ** 6 + 3000, 3000, dtype=np.int32))
    pd = jnp.zeros(bounds.shape[0], jnp.int32)
    hdr = jnp.zeros(bounds.shape[0], dtype=bool)
    kw = dict(cap=64, topk=16, hit_cap=128, with_docs=True)
    o1 = di_mod.batched_query_full(
        off, coords, bounds, pd, hdr, jnp.asarray(terms),
        jnp.asarray(rs), **kw)
    o2 = di_mod.batched_query_full(
        off, coords, bounds, pd, hdr, jnp.asarray(terms),
        jnp.asarray(rs), small=small, **kw)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # paged Pallas kernels (carried page streams, interpret mode on CPU)
    # are bit-identical too — with combined tables, and with the raw
    # page_of fetch
    o2p = di_mod.batched_query_full(
        off, coords, bounds, pd, hdr, jnp.asarray(terms),
        jnp.asarray(rs), small=small, use_pallas=True, **kw)
    o3 = di_mod.batched_query_full(
        off, coords, bounds, pd, hdr, jnp.asarray(terms),
        jnp.asarray(rs), small=small_pg, page_of=page_arr,
        use_pallas=True, **kw)
    o4 = di_mod.batched_query_full(
        off, coords, bounds, pd, hdr, jnp.asarray(terms),
        jnp.asarray(rs), page_of=page_arr, use_pallas=True, **kw)
    for a, b in zip(o1, o2p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(o1, o3):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(o1, o4):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_small_table_budget_and_disable():
    """DOCODO_SMALL_TAB=0 disables the tables; a zero byte budget skips
    every width."""
    import docodo_tpu.ops.device_index as di_mod

    off_np = np.array([0, 3, 10], dtype=np.int64)
    coords_np = np.arange(10, dtype=np.int32)
    assert di_mod.build_small_tables(off_np, coords_np, max_bytes=0) is None
    import os
    os.environ["DOCODO_SMALL_TAB"] = "0"
    try:
        assert di_mod.build_small_tables(off_np, coords_np) is None
    finally:
        del os.environ["DOCODO_SMALL_TAB"]
    tabs = di_mod.build_small_tables(off_np, coords_np)
    assert tabs is not None


def test_asymmetric_caps_equal_symmetric():
    """Asymmetric per-word-cap W=2 buckets (frequent x rare pairs fetch
    each word at its own pow2 cap) return bit-identical results to the
    symmetric padding path — proximity AND ordered-phrase modes, every
    full-result field."""
    import os

    import jax.numpy as jnp

    import docodo_tpu.ops.device_index as di_mod
    from docodo_tpu.ops.device_index import DeviceIndex

    rng = np.random.default_rng(17)
    # term 0: frequent (600 postings); terms 1..6: rare (3..40)
    counts = np.array([600, 3, 7, 12, 25, 40, 33])
    T = counts.size
    tids = np.repeat(np.arange(T), counts).astype(np.int32)
    coords = np.sort(rng.choice(90_000, size=counts.sum(), replace=False)
                     ).astype(np.int32)
    rng.shuffle(tids)
    st, sc, off = di.build_postings(
        jnp.asarray(tids), jnp.asarray(coords), T)
    bounds = np.arange(3000, 93_000 + 3000, 3000, dtype=np.int32)
    page_doc = np.zeros(bounds.size, dtype=np.int32)
    names = [f"t{i}" for i in range(T)]
    dix = DeviceIndex(
        term_offsets=off, coords=sc, bounds=jnp.asarray(bounds),
        page_doc=jnp.asarray(page_doc),
        terms=names, page_ids=[str(i + 1) for i in range(bounds.size)],
        doc_names=["d0"], _tmap={n: i for i, n in enumerate(names)},
        offsets_np=np.asarray(off, dtype=np.int64), page_doc_np=page_doc,
        bounds_np=bounds.astype(np.int64),
    )
    queries = []
    for t in range(1, T):
        queries.append([(names[0], 300), (names[t], 300)])   # proximity
        queries.append([(names[t], -300), (names[0], -300)]) # ordered
        queries.append([(names[0], -300), (names[t], -300)]) # ordered rev

    seen_caps = []
    orig_mb = di_mod.multi_bucket_query_full

    def spy(*a, **kw):
        seen_caps.append(a[7])  # caps tuple
        return orig_mb(*a, **kw)

    orig_min = di_mod.ASYM_CAP_MIN
    try:
        di_mod.ASYM_CAP_MIN = 256  # the frequent term caps at 1024 -> 1024>=256
        di_mod.multi_bucket_query_full = spy
        os.environ["DOCODO_ASYM"] = "1"
        asym = dix.search_batch_full(queries, topk=8, hit_cap=256)
        os.environ["DOCODO_ASYM"] = "0"
        sym = dix.search_batch_full(queries, topk=8, hit_cap=256)
    finally:
        di_mod.ASYM_CAP_MIN = orig_min
        di_mod.multi_bucket_query_full = orig_mb
        os.environ.pop("DOCODO_ASYM", None)
    # the asym run really bucketed (1024, 64); the control stayed int
    assert any(isinstance(c, tuple) for c in seen_caps[0])
    assert all(isinstance(c, int) for c in seen_caps[1])
    assert set(asym) == set(sym)
    for k in asym:
        np.testing.assert_array_equal(
            np.asarray(asym[k]), np.asarray(sym[k]), err_msg=k
        )
