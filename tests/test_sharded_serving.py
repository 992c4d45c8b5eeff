"""Mesh-sharded full-result serving: ShardedDeviceIndex results must
equal the host engine's (docs, pages, positions, doc order) on an
8-virtual-device mesh — documents never span shards, so per-shard
materialization composes exactly."""

import numpy as np
import pytest

import docodo_tpu
from docodo_tpu.parallel import sharding as sh
from docodo_tpu.parallel.serving import ShardedDeviceIndex
from docodo_tpu.query.batcher import compile_request
from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

_BODIES = [
    "the pickwick club met at noon and the club adjourned for dinner",
    "mr pickwick spoke to the club about travels and adventures abroad",
    "travels through kent were recounted by the club members at length",
    "noon came and went while pickwick pondered the proposed club rules",
    "the lady smiled at the club members who wandered through the town",
    "dinner was served at noon and the members of the club were pleased",
    "kent roads carried the club carriage through villages and fields",
    "adventures abroad were rare but the club pondered them at dinner",
    "a quiet dinner for the club closed the adventures of the evening",
    "pickwick and the club wandered through kent before dinner at noon",
]
# pad each doc past the default proximity window (255+len chars) with
# doc-UNIQUE filler so no query word pair spans a document boundary —
# the host engine's corpus-global windows would otherwise produce
# cross-document groups the sharded layout can only reproduce within a
# shard (see parallel/serving.py boundary contract)
TEXTS = [
    b + " " + " ".join(f"filler{i}x{j}" for j in range(60))
    for i, b in enumerate(_BODIES)
]


@pytest.fixture(scope="module")
def ind(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("shsrv")
    ind = docodo_tpu.Index(path=str(tmp), in_memory=True)
    # one build thread: global doc order (and thus cross-document
    # proximity groups) is thread-scheduling-dependent otherwise — the
    # reference's own deterministic tests pin this too (VocabTest:237)
    ind.max_degree_of_parallelism = 1
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(f"d{i}", t, "") for i, t in enumerate(TEXTS)
    ]))
    ind.create()
    yield ind
    ind.dispose()


@pytest.fixture(scope="module")
def sdi(ind):
    mesh = sh.make_mesh(8)
    return ShardedDeviceIndex.from_index(ind, mesh)


def _doc_view(res):
    return [
        (d.name, [(p.id, list(p.pos)) for p in d.pages], round(d.rank, 5))
        for d in res.found_docs
    ]


REQS = [
    "club",
    "pickwick club",
    '"pickwick club"',
    "dinner noon",
    "adventures abroad",
    "club kent",
    "wandered through",
    '"the club"',
]


def test_sharded_serving_matches_host(ind, sdi):
    compiled = [compile_request(ind, r) for r in REQS]
    assert all(c is not None for c in compiled)
    results = sdi.search_batch(compiled, topk=32, hit_cap=256)
    for req, res in zip(REQS, results):
        assert res is not None, f"unexpected truncation for {req}"
        host = ind.search(req)
        assert _doc_view(res) == _doc_view(host), req


def test_sharded_serving_unknown_word_matches_nothing(ind, sdi):
    compiled = [compile_request(ind, "club zzzzqqq")]
    # unknown word annihilates the query via the empty-group sentinel
    [res] = sdi.search_batch(compiled, topk=8, hit_cap=64)
    assert res is not None and res.found_docs == []


def test_sharded_serving_truncation_flags(ind, sdi):
    # 'club' appears in every doc; a tiny budget must flag truncation
    compiled = [compile_request(ind, "club")]
    [res] = sdi.search_batch(compiled, topk=1, hit_cap=2)
    assert res is None  # caller re-serves host-side


def test_sharded_staging_covers_all_docs(ind, sdi):
    names = sorted(
        n for t in sdi.shard_tables for n in t.doc_names
    )
    assert names == sorted(ind.pages.doc_names)
    total_pages = sum(len(t.page_ids) for t in sdi.shard_tables)
    assert total_pages == len(ind.pages.page_ids)


def test_cross_document_groups_match_within_shard(tmp_path):
    """The reference's proximity windows span document boundaries
    (corpus-global coordinates). Contiguous shard assignment reproduces
    those cross-document groups whenever both docs land on one shard."""
    docs = [
        "members gathered and talked about dinner",   # ends with 'dinner'
        "pickwick arrived late to the gathering",     # starts with 'pickwick'
        "kent was quiet that particular evening",
        "travels resumed when the morning came",
    ]
    ind = docodo_tpu.Index(path=str(tmp_path), in_memory=True)
    ind.max_degree_of_parallelism = 1
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(f"c{i}", t, "") for i, t in enumerate(docs)
    ]))
    ind.create()
    mesh = sh.make_mesh(2)
    sdi = ShardedDeviceIndex.from_index(ind, mesh)
    assert sdi.corpus.doc_assign == [[0, 1], [2, 3]]
    req = "dinner pickwick"  # group spans the d0/d1 boundary (same shard)
    host = ind.search(req)
    assert host.found_docs, "host must produce the cross-document group"
    [res] = sdi.search_batch([compile_request(ind, req)], topk=8,
                             hit_cap=64)
    assert _doc_view(res) == _doc_view(host)


def test_batcher_serves_from_mesh(ind):
    """BatchExecutor(mesh=...) serves device batches from the sharded
    index with host-parity results and the truncation contract."""
    from docodo_tpu.query.batcher import BatchExecutor

    ex = BatchExecutor(ind, max_wait_ms=1.0, mesh=sh.make_mesh(8),
                       topk=32, hit_cap=256)
    try:
        for req in ["club", '"pickwick club"', "dinner noon"]:
            dev = ex.search(req)
            host = ind.search(req)
            assert _doc_view(dev) == _doc_view(host), req
            assert [(w.word, w.n_found) for w in dev.words] == \
                [(w.word, w.n_found) for w in host.words], req
        assert ex.stats["device_queries"] >= 3
        # wildcards ride the mesh path too (variant-OR expansion)
        res = ex.search("clu?")
        host = ind.search("clu?")
        assert res.success and _doc_view(res) == _doc_view(host)
        # field queries row-split on the mesh now too
        hq_before = ex.stats["host_queries"]
        res = ex.search("{name=x} club")
        host = ind.search("{name=x} club")
        assert res.success and _doc_view(res) == _doc_view(host)
        assert ex.stats["host_queries"] == hq_before
        # -filter: rides the mesh too (per-shard name filtering —
        # shard doc names ARE the parent index names)
        res = ex.search("club -filter:d[0-2]")
        host = ind.search("club -filter:d[0-2]")
        assert res.success and ex.stats["host_queries"] == hq_before
        assert [d.name for d in res.found_docs] == \
            [d.name for d in host.found_docs]
        assert res.found_docs  # the filter actually matched docs
    finally:
        ex.close()


def test_sharded_brief_ranks_match_host_order(ind, sdi):
    """materialize=False must still produce host doc ranks/order
    (1 + ln(sum page ranks), ascending) — regression: the sharded brief
    path once returned raw page-rank sums in ordinal order."""
    compiled = [compile_request(ind, "club dinner")]
    [res] = sdi.search_batch(compiled, topk=32, hit_cap=256,
                             materialize=False)
    host = ind.search("club dinner")
    assert [d.name for d in res.found_docs] == \
        [d.name for d in host.found_docs]
    assert [round(d.rank, 5) for d in res.found_docs] == \
        [round(d.rank, 5) for d in host.found_docs]


def test_mixed_batch_one_word_queries_not_annihilated(ind, sdi):
    """Regression: a batch mixing a 1-word query with multi-word/
    multi-variant ones pads terms to [B, W, V]; the padded word slot
    must fold as IDENTITY, not annihilate (the flat tagged-sort path
    once returned [] for every 1-word query in such batches)."""
    reqs = ["noon", "dinner | travels", "pickwick club", '"the club"']
    compiled = [compile_request(ind, r) for r in reqs]
    assert all(c is not None for c in compiled)
    results = sdi.search_batch(compiled, topk=32, hit_cap=256)
    for req, res in zip(reqs, results):
        host = ind.search(req)
        assert res is not None, req
        assert _doc_view(res) == _doc_view(host), req
        assert res.found_docs or not host.found_docs, req


def test_boundary_queries_reserve_to_exact_host_results(tmp_path):
    """A query whose proximity window could cross a shard boundary
    re-serves EXACTLY through the parent host engine under the default
    boundary="reserve" policy: the mesh result EQUALS the single-chip
    host result, cross-boundary matches included, and carries
    boundary_reserved=True. boundary="flag" preserves the measurable
    old behavior (flagged, cross-boundary match dropped)."""
    import docodo_tpu
    from docodo_tpu.parallel import sharding as sh
    from docodo_tpu.parallel.serving import ShardedDeviceIndex
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    # two docs split across two shards; "tail head" spans the boundary
    ind = docodo_tpu.Index(path=str(tmp_path / "bd"), in_memory=True)
    ind.stemmers.clear()
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(
            "d0", "alpha filler words lead up to the ending tail", ""
        ),
        IndexPagedTextFile(
            "d1", "head starts the second document with omega words", ""
        ),
    ]))
    ind.create()
    sdi = ShardedDeviceIndex.from_index(ind, sh.make_mesh(2))
    assert sdi.boundaries.size == 1

    queries = [
        [("tail", 259), ("head", 259)],   # window spans the boundary
        [("alpha", 260)],                  # far from the boundary
    ]
    # the host engine FINDS the cross-boundary match
    host = ind.search("tail head")
    assert host.found_pages

    # default policy: exact parity, reserve recorded
    res = sdi.search_batch(queries, topk=8, hit_cap=64)
    assert res[0] is not None and res[0].boundary_reserved
    assert not res[0].boundary_risk  # exact — no risk remains
    assert _doc_view(res[0]) == _doc_view(host)
    host_a = ind.search("alpha")
    assert res[1] is not None
    assert _doc_view(res[1]) == _doc_view(host_a)

    # flag mode: mesh serves the flagged query, dropping the match
    res_f = sdi.search_batch(queries, topk=8, hit_cap=64,
                             boundary="flag")
    assert res_f[0] is not None and res_f[0].boundary_risk
    assert not res_f[0].found_docs  # the cross-boundary match is lost
    if not res_f[1].boundary_risk:
        assert _doc_view(res_f[1]) == _doc_view(host_a)


def test_boundary_reserve_straddling_windows_fuzz(tmp_path):
    """Fuzz the reserve policy where it matters: corpora whose query
    words sit AT shard boundaries so proximity windows genuinely
    straddle them. Every mesh result must EQUAL the single-chip host
    result (the reference evaluates one global coordinate space,
    ref IndexSequence.cs:218-284) — not merely carry a flag."""
    import random

    import docodo_tpu
    from docodo_tpu.parallel import sharding as sh
    from docodo_tpu.parallel.serving import ShardedDeviceIndex
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    rng = random.Random(4242)
    vocab = ("tail head alpha omega club dinner noon kent "
             "pickwick travels").split()
    for trial in range(4):
        # short docs (far below the 255-char window) force nearly every
        # multi-word window across document — and thus shard — bounds
        docs = [
            " ".join(rng.choice(vocab)
                     for _ in range(rng.randrange(3, 9)))
            for _ in range(rng.randrange(4, 10))
        ]
        ind = docodo_tpu.Index(
            path=str(tmp_path / f"t{trial}"), in_memory=True
        )
        ind.max_degree_of_parallelism = 1
        ind.stemmers.clear()
        ind.add_data_source(ListDataSource("docs", [
            IndexPagedTextFile(f"d{i}", t, "")
            for i, t in enumerate(docs)
        ]))
        ind.create()
        sdi = ShardedDeviceIndex.from_index(
            ind, sh.make_mesh(2 if trial % 2 else 4)
        )
        reqs = [
            f"{rng.choice(vocab)} {rng.choice(vocab)}",
            f'"{rng.choice(vocab)} {rng.choice(vocab)}"',
            f"{rng.choice(vocab)} | {rng.choice(vocab)}",
            rng.choice(vocab),
        ]
        compiled = [compile_request(ind, r) for r in reqs]
        assert all(c is not None for c in compiled)
        results = sdi.search_batch(compiled, topk=64, hit_cap=1024)
        for req, res in zip(reqs, results):
            host = ind.search(req)
            assert res is not None, (trial, req)
            assert _doc_view(res) == _doc_view(host), (trial, req)


def test_sharded_serving_pallas_kernels_match_host(ind, sdi, monkeypatch):
    """DOCODO_PALLAS=1 routes each shard's local evaluation through the
    hybrid Pallas kernels (interpret mode on CPU) INSIDE the shard_map —
    the TPU mesh serving path — with exact host parity. Exercises the
    stacked combined small tables and per-shard page_of streams too."""
    monkeypatch.setenv("DOCODO_PALLAS", "1")
    compiled = [compile_request(ind, r) for r in REQS]
    assert all(c is not None for c in compiled)
    results = sdi.search_batch(compiled, topk=32, hit_cap=256)
    for req, res in zip(REQS, results):
        assert res is not None, f"unexpected truncation for {req}"
        host = ind.search(req)
        assert _doc_view(res) == _doc_view(host), req


def test_mesh_reserve_rate_bounds_at_corpus_scale():
    """Serving-shape mix over a REAL corpus slice on an 8-shard mesh:
    the boundary-reserve policy must re-serve a bounded minority —
    reserves exist (phrase windows straddle some of the 7 boundaries)
    but stay rare (a window-width sliver per boundary), and every
    result equals the host engine (MESH_SCALE artifact's contract,
    ref IndexSequence.cs:218-284 global-space windows)."""
    import random
    import tempfile

    raw = open(
        "/root/reference/Test/Dickens Charles. The Pickwick Papers"
        " - royallib.ru.txt", encoding="cp1251").read()[:200_000]
    ind = docodo_tpu.Index(path=tempfile.mkdtemp(), in_memory=True)
    ind.max_degree_of_parallelism = 1
    n_docs = 16
    step = len(raw) // n_docs
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(f"d{i:02d}", raw[i * step: (i + 1) * step], "")
        for i in range(n_docs)
    ]))
    ind.create()
    sdi = ShardedDeviceIndex.from_index(ind, sh.make_mesh(8))
    assert sdi.boundaries.size == 7

    hist = docodo_tpu.Index.calc_histogram(ind, 400)
    words = [w for w in hist if w[0].isalpha() and len(w) >= 4][20:120]
    rng = random.Random(11)
    reqs = []
    for i in range(120):
        kind = i % 3
        if kind == 0:
            reqs.append(rng.choice(words))
        elif kind == 1:
            reqs.append(f'"{rng.choice(words)} {rng.choice(words)}"')
        else:
            reqs.append(f"{rng.choice(words)} {rng.choice(words)}")
    compiled = [compile_request(ind, r) for r in reqs]
    assert all(c is not None for c in compiled)
    results = sdi.search_batch(compiled, topk=64, hit_cap=1024)

    reserved = sum(
        1 for r in results
        if r is not None and getattr(r, "boundary_reserved", False)
    )
    served = sum(1 for r in results if r is not None)
    # singles never reserve; pairs reserve only when a term posting
    # falls within a window of one of the 7 boundaries
    assert served >= 100, served
    assert 0 < reserved <= served // 3, (reserved, served)

    # exact parity for a sample incl. every reserved query
    sample = [i for i, r in enumerate(results)
              if r is not None and getattr(r, "boundary_reserved", False)]
    sample += [i for i in range(0, len(reqs), 7)
               if results[i] is not None]
    for i in set(sample):
        host = ind.search(reqs[i])
        assert _doc_view(results[i]) == _doc_view(host), reqs[i]
    ind.dispose()
