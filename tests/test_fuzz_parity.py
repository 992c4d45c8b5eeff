"""Property fuzz: device-served results equal the host engine on random
corpora and random request strings — single-chip batcher and sharded
mesh both. DOCODO_FUZZ_ROUNDS raises the round count for long runs."""

import os
import random

import pytest

import docodo_tpu
from docodo_tpu.parallel import sharding as sh
from docodo_tpu.parallel.serving import ShardedDeviceIndex
from docodo_tpu.query.batcher import BatchExecutor, compile_request
from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

ROUNDS = int(os.environ.get("DOCODO_FUZZ_ROUNDS", "3"))

VOCAB = (
    "alpha beta gamma delta epsilon zeta kappa lambda sigma omega "
    "running walking jumped talked quiet quickly slowly house houses "
    "mouse mice banana apple apples grape тихий громкий дом дома "
    "pickwick club dinner"
).split()


def _corpus(rng, n_docs):
    docs = []
    for d in range(n_docs):
        n = rng.randrange(5, 120)
        words = [rng.choice(VOCAB) for _ in range(n)]
        docs.append(" ".join(words))
    return docs


def _requests(rng, n):
    reqs = []
    for _ in range(n):
        kind = rng.randrange(7)
        w = lambda: rng.choice(VOCAB)
        if kind == 0:
            reqs.append(w())
        elif kind == 1:
            reqs.append(f"{w()} {w()}")
        elif kind == 2:
            reqs.append(f'"{w()} {w()}"')
        elif kind == 3:
            reqs.append(f"{w()} | {w()}")
        elif kind == 4:
            reqs.append(f"{w()} {w()} {w()}")
        elif kind == 5:
            # '?' wildcard: replace one interior char of a vocab word
            word = w()
            i = rng.randrange(1, max(2, len(word) - 1))
            reqs.append(word[:i] + "?" + word[i + 1:])
        else:
            reqs.append(f"{w()}? {w()}")
    return reqs


def _view(res):
    return [
        (d.name, round(d.rank, 4),
         [(p.id, list(p.pos)) for p in d.pages])
        for d in res.found_docs
    ]


@pytest.fixture(autouse=True)
def _bound_compile_cache():
    """Every fuzz round compiles fresh shapes; after ~30 accumulated
    rounds the XLA CPU compiler segfaulted in one long process (round
    31 passes in isolation — upstream cache-pressure issue, not a
    parity failure). Clearing per round keeps long hunts stable."""
    yield
    import jax

    jax.clear_caches()


@pytest.mark.parametrize("round_i", range(ROUNDS))
def test_fuzz_device_vs_host(tmp_path, round_i):
    rng = random.Random(1000 + round_i)
    docs = _corpus(rng, rng.randrange(2, 9))
    ind = docodo_tpu.Index(
        path=str(tmp_path / f"r{round_i}"), in_memory=True
    )
    ind.max_degree_of_parallelism = 1
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(f"d{i}", t, "") for i, t in enumerate(docs)
    ]))
    ind.create()
    reqs = _requests(rng, 24)

    # single-chip batcher (full materialization)
    ex = BatchExecutor(ind, max_wait_ms=1.0, topk=64, hit_cap=1024)
    try:
        for req in reqs:
            dev = ex.search(req)
            host = ind.search(req)
            assert _view(dev) == _view(host), (round_i, req)
    finally:
        ex.close()

    # sharded mesh: the default boundary="reserve" policy re-serves
    # boundary-risk queries exactly through the parent host engine, so
    # EVERY served mesh result equals the host result — windows that
    # straddle shard boundaries included
    sdi = ShardedDeviceIndex.from_index(ind, sh.make_mesh(2))
    compiled = [compile_request(ind, r) for r in reqs]
    results = sdi.search_batch(
        [c for c in compiled if c is not None], topk=64, hit_cap=1024
    )
    it = iter(results)
    for req, c in zip(reqs, compiled):
        if c is None:
            continue
        res = next(it)
        host = ind.search(req)
        if res is None:  # truncated: host re-serve contract
            continue
        assert _view(res) == _view(host), (round_i, req)


def _make_fuzz_voc():
    """Morphological groups over the fuzz vocabulary: multiple forms
    share one 24-bit group id, so queries compile to '#' voc codes and
    exercise the device variant paths."""
    from docodo_tpu.lang.vocab import Vocab

    voc = Vocab()
    voc.name = "en"
    groups = [
        ["house", "houses"],
        ["mouse", "mice"],
        ["apple", "apples"],
        ["quick", "quickly"],
        ["slow", "slowly"],
        ["run", "running"],
        ["walk", "walking"],
    ]
    for g, words in enumerate(groups, start=1):
        for w in words:
            voc.add(w, g)
    voc.range = ("a", "z")
    return voc


@pytest.mark.parametrize("round_i", range(max(2, ROUNDS // 2)))
def test_fuzz_morphological_device_vs_host(tmp_path, round_i):
    """Same property fuzz with a vocabulary loaded: words resolve to
    '#' group codes (multi-variant device evaluation, ref
    Search.cs:226-247) and device-served results must still equal the
    host engine's."""
    rng = random.Random(7000 + round_i)
    docs = _corpus(rng, rng.randrange(2, 7))
    ind = docodo_tpu.Index(
        path=str(tmp_path / f"v{round_i}"), in_memory=True,
        vocs=[_make_fuzz_voc()],
    )
    ind.max_degree_of_parallelism = 1
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(f"d{i}", t, "") for i, t in enumerate(docs)
    ]))
    ind.create()
    reqs = _requests(rng, 20)
    ex = BatchExecutor(ind, max_wait_ms=1.0, topk=64, hit_cap=1024)
    try:
        for req in reqs:
            dev = ex.search(req)
            host = ind.search(req)
            assert _view(dev) == _view(host), (round_i, req)
        assert ex.stats["device_queries"] > 0
    finally:
        ex.close()


@pytest.mark.parametrize("round_i", range(max(2, ROUNDS // 2)))
def test_fuzz_lazy_mode_matches_in_memory(tmp_path, round_i):
    """The lazy (on-disk stub) index must serve identical results to the
    in-memory index built from the same corpus (ref Index.cs:346-348
    lazy stubs vs full load)."""
    rng = random.Random(5000 + round_i)
    docs = _corpus(rng, rng.randrange(2, 7))
    path = str(tmp_path / f"l{round_i}")
    ind = docodo_tpu.Index(path=path, in_memory=True)
    ind.max_degree_of_parallelism = 1
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(f"d{i}", t, "") for i, t in enumerate(docs)
    ]))
    ind.create()
    lazy = docodo_tpu.Index(path=path, in_memory=False)
    assert lazy.can_search
    for req in _requests(rng, 16):
        a = ind.search(req)
        b = lazy.search(req)
        assert _view(a) == _view(b), (round_i, req)
    lazy.dispose()
    ind.dispose()


@pytest.mark.parametrize("round_i", range(max(2, ROUNDS // 2)))
def test_fuzz_mesh_pallas_kernels(tmp_path, round_i, monkeypatch):
    """Mesh-path fuzz WITH the Pallas kernels on (interpret mode on
    CPU): random corpora and requests served through ShardedDeviceIndex
    route each shard's local evaluation through the kernel stack inside
    the shard_map, and every result must equal the host engine —
    multi-chip correctness at the same fuzz depth as single-chip."""
    monkeypatch.setenv("DOCODO_PALLAS", "1")
    rng = random.Random(8800 + round_i)
    docs = _corpus(rng, rng.randrange(3, 9))
    ind = docodo_tpu.Index(
        path=str(tmp_path / f"mp{round_i}"), in_memory=True
    )
    ind.max_degree_of_parallelism = 1
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(f"d{i}", t, "") for i, t in enumerate(docs)
    ]))
    ind.create()
    sdi = ShardedDeviceIndex.from_index(
        ind, sh.make_mesh(2 if round_i % 2 else 4)
    )
    reqs = _requests(rng, 16)
    compiled = [compile_request(ind, r) for r in reqs]
    results = sdi.search_batch(
        [c for c in compiled if c is not None], topk=64, hit_cap=1024
    )
    it = iter(results)
    for req, c in zip(reqs, compiled):
        if c is None:
            continue
        res = next(it)
        host = ind.search(req)
        if res is None:  # truncated: host re-serve contract
            continue
        assert _view(res) == _view(host), (round_i, req)


@pytest.mark.parametrize("round_i", range(2))
def test_fuzz_block_dma_fetch_leg(tmp_path, round_i, monkeypatch):
    """Device-vs-host fuzz with the dynamic_slice block-DMA posting
    fetch forced for EVERY cap (GATHER_SLICE_MIN=1): the cap-adaptive
    gather strategy must be invisible to results."""
    from docodo_tpu.ops import device_index as di_mod

    monkeypatch.setattr(di_mod, "GATHER_SLICE_MIN", 1)
    rng = random.Random(7700 + round_i)
    docs = _corpus(rng, rng.randrange(2, 7))
    ind = docodo_tpu.Index(
        path=str(tmp_path / f"g{round_i}"), in_memory=True
    )
    ind.max_degree_of_parallelism = 1
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(f"d{i}", t, "") for i, t in enumerate(docs)
    ]))
    ind.create()
    ex = BatchExecutor(ind, max_wait_ms=1.0, topk=64, hit_cap=1024)
    try:
        for req in _requests(rng, 16):
            dev = ex.search(req)
            host = ind.search(req)
            assert _view(dev) == _view(host), (round_i, req)
    finally:
        ex.close()
