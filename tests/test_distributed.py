"""Multi-host DCN layout validated on the 8-virtual-device CPU mesh
treated as 2 hosts x 4 local devices: per-process staging materializes
only each 'host's' shard rows, the 2-D build+query combine must equal a
single-device evaluation of every shard."""

import numpy as np
import pytest

from docodo_tpu.lang.tokenizer import tokenize
from docodo_tpu.ops import device_index as di
from docodo_tpu.parallel import distributed as dd


def _corpus(n_docs=16, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"w{chr(97 + i)}{chr(97 + j)}" for i in range(7) for j in range(7)]
    term_to_id = {}
    doc_tids, doc_coords, doc_pages = [], [], []
    for _ in range(n_docs):
        words = rng.choice(vocab, size=int(rng.integers(20, 60)))
        tids, cs = [], []
        pos = 0
        for w in words:
            tids.append(term_to_id.setdefault(w, len(term_to_id)))
            cs.append(pos)
            pos += len(w) + 1
        doc_tids.append(np.asarray(tids, dtype=np.int32))
        doc_coords.append(np.asarray(cs, dtype=np.int32))
        doc_pages.append([pos])
    return term_to_id, doc_tids, doc_coords, doc_pages


def test_process_local_staging_covers_all_docs():
    term_to_id, doc_tids, doc_coords, doc_pages = _corpus()
    H, D = 2, 4
    assign = dd.plan_document_assignment(
        [t.size for t in doc_tids], [p[-1] for p in doc_pages], H * D
    )
    assert sorted(i for a in assign for i in a) == list(range(len(doc_tids)))

    nloc = max(sum(doc_tids[i].size for i in a) for a in assign)
    ploc = max(sum(len(doc_pages[i]) for i in a) for a in assign)
    rows = []
    for p in range(H):
        own_docs = {
            i for s in range(p * D, (p + 1) * D) for i in assign[s]
        }
        # a real process only loads ITS documents' tokens
        tids_p = [t if i in own_docs else None
                  for i, t in enumerate(doc_tids)]
        coords_p = [c if i in own_docs else None
                    for i, c in enumerate(doc_coords)]
        rows.append(dd.stage_for_process(
            tids_p, coords_p, doc_pages, assign, H, D, p,
            nloc=nloc, ploc=ploc,
        ))
    corpus = dd.assemble_global(rows)
    assert corpus.term_ids.shape[0] == H * D
    # global page_base offsets are consistent and strictly increasing
    assert (np.diff(corpus.page_base) > 0).all()
    assert int(corpus.n_tokens.sum()) == sum(t.size for t in doc_tids)


def test_distributed_build_query_equals_single_device():
    import jax

    assert len(jax.devices()) >= 8
    term_to_id, doc_tids, doc_coords, doc_pages = _corpus()
    T = len(term_to_id)
    H, D = 2, 4
    assign = dd.plan_document_assignment(
        [t.size for t in doc_tids], [p[-1] for p in doc_pages], H * D
    )
    nloc = max(sum(doc_tids[i].size for i in a) for a in assign)
    ploc = max(sum(len(doc_pages[i]) for i in a) for a in assign)
    rows = [
        dd.stage_for_process(doc_tids, doc_coords, doc_pages, assign,
                             H, D, p, nloc=nloc, ploc=ploc)
        for p in range(H)
    ]
    corpus = dd.assemble_global(rows)
    mesh = dd.make_global_mesh(jax.devices()[:8], num_hosts=H)

    import jax.numpy as jnp

    st, sc, off = dd.distributed_build(
        mesh, jnp.asarray(corpus.term_ids), jnp.asarray(corpus.coords), T
    )

    rng = np.random.default_rng(9)
    terms = rng.integers(0, T, size=(5, 2)).astype(np.int32)
    terms[::2, 1] = -1
    rs = np.full((5, 2), 40, dtype=np.int32)
    pages, ranks, counts = dd.distributed_query(
        mesh, off, sc, jnp.asarray(corpus.bounds),
        jnp.asarray(corpus.page_doc), jnp.asarray(corpus.page_base),
        jnp.asarray(terms), jnp.asarray(rs), cap=64, topk=16,
    )
    pages = np.asarray(pages)

    # single-device oracle over each shard separately
    want = [set() for _ in range(5)]
    for s in range(H * D):
        st1, sc1, off1 = di.build_postings(
            corpus.term_ids[s].copy(), corpus.coords[s].copy(), T
        )
        p1, _, _ = di.batched_query_step(
            off1, sc1, jnp.asarray(corpus.bounds[s]),
            jnp.asarray(corpus.page_doc[s]),
            jnp.asarray(terms), jnp.asarray(rs), cap=64, topk=16,
        )
        p1 = np.asarray(p1)
        for q in range(5):
            for p in p1[q]:
                if p >= 0:
                    want[q].add(int(p) + int(corpus.page_base[s]))
    for q in range(5):
        got = {int(p) for p in pages[q] if p >= 0}
        if len(want[q]) > 16:
            assert got <= want[q] and len(got) == 16
        else:
            assert got == want[q], q


def test_distributed_full_result_serving_matches_host(tmp_path):
    """Full-result (positions) serving over the 2-D hosts x devices
    mesh: ShardedDeviceIndex on a ("h", "d") = (2, 4) mesh must return
    docs, pages, in-page POSITIONS and ranks equal to the host engine
    for every query — the VERDICT r4 gap (the 2-D layout was page-level
    only; ref Search.cs:365-420 serves ResultDocPage.pos everywhere)."""
    import jax

    import docodo_tpu
    from docodo_tpu.parallel.serving import ShardedDeviceIndex
    from docodo_tpu.query.batcher import compile_request
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    assert len(jax.devices()) >= 8
    bodies = [
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
    texts = [
        b + " " + " ".join(f"filler{i}x{j}" for j in range(60))
        for i, b in enumerate(bodies)
    ]
    ind = docodo_tpu.Index(path=str(tmp_path), in_memory=True)
    ind.max_degree_of_parallelism = 1
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(f"d{i}", t, "") for i, t in enumerate(texts)
    ]))
    ind.create()
    try:
        mesh = dd.make_global_mesh(jax.devices()[:8], num_hosts=2)
        sdi = ShardedDeviceIndex.from_index(ind, mesh)
        assert sdi._is2d
        reqs = [
            "club", "pickwick club", '"pickwick club"', "dinner noon",
            "adventures abroad", '"the club"',
        ]
        compiled = [compile_request(ind, r) for r in reqs]
        assert all(c is not None for c in compiled)
        got = sdi.search_batch(compiled, topk=64, hit_cap=1024)
        for r, res in zip(reqs, got):
            want = ind.search(r)
            want_view = [
                (d.name, [(p.id, list(p.pos)) for p in d.pages],
                 round(d.rank, 5))
                for d in want.found_docs
            ]
            got_view = [
                (d.name, [(p.id, list(p.pos)) for p in d.pages],
                 round(d.rank, 5))
                for d in res.found_docs
            ]
            assert got_view == want_view, r
    finally:
        ind.dispose()


def test_distributed_query_full_equals_1d_leg():
    """distributed_query_full over a (2, 4) mesh returns the same
    [S, B, ...] LocateFull fields as sharded_query_full over the
    8-shard 1-D mesh on the identical staged corpus (the shard order
    s = h*D + d matches the 1-D shard numbering)."""
    import jax
    import jax.numpy as jnp

    from docodo_tpu.parallel import sharding as sh

    assert len(jax.devices()) >= 8
    term_to_id, doc_tids, doc_coords, doc_pages = _corpus(n_docs=12, seed=7)
    T = len(term_to_id)
    corpus = sh.stage_shards_arrays(doc_tids, doc_coords, doc_pages, 8)
    mesh1 = sh.make_mesh(8)
    mesh2 = dd.make_global_mesh(jax.devices()[:8], num_hosts=2)
    _, sc1, off1 = sh.sharded_build(
        mesh1, jnp.asarray(corpus.term_ids), jnp.asarray(corpus.coords), T)
    _, sc2, off2 = dd.distributed_build(
        mesh2, jnp.asarray(corpus.term_ids), jnp.asarray(corpus.coords), T)
    np.testing.assert_array_equal(np.asarray(sc1), np.asarray(sc2))
    np.testing.assert_array_equal(np.asarray(off1), np.asarray(off2))

    rng = np.random.default_rng(11)
    terms = rng.integers(0, T, size=(6, 2)).astype(np.int32)
    rs = np.full((6, 2), 60, dtype=np.int32)
    bo = jnp.asarray(corpus.bounds)
    pd = jnp.asarray(corpus.page_doc)
    hd = jnp.zeros(corpus.bounds.shape, dtype=bool)
    kw = dict(cap=64, topk=16, hit_cap=128, with_docs=False)
    w1 = sh.sharded_query_full(
        mesh1, off1, sc1, bo, pd, hd, jnp.asarray(terms),
        jnp.asarray(rs), **kw)
    w2 = dd.distributed_query_full(
        mesh2, off2, sc2, bo, pd, hd, jnp.asarray(terms),
        jnp.asarray(rs), **kw)
    names = ["pages", "ranks", "counts", "n_pages", "docs", "doc_ranks",
             "hits", "n_hits"]
    for a, b, name in zip(w1, w2, names):
        if a is None or b is None:
            assert a is None and b is None, name
            continue
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name)


def test_real_multiprocess_dryrun():
    """REAL 2-process jax.distributed run (Gloo over loopback): process-
    local staging -> make_array_from_process_local_data -> 2-D sharded
    build + ICI-first top-k combine; both processes must compute the
    identical replicated result. ~30-60 s (spawns fresh interpreters)."""
    import os
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "multihost_dryrun.py",
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    res = subprocess.run(
        [sys.executable, script], capture_output=True, text=True,
        timeout=240, env=env,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "multihost dryrun OK" in res.stdout
