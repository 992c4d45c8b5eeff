"""Micro-batched device serving: parity with the host engine on the
covered query subset, host fallback elsewhere."""

import numpy as np
import pytest

import docodo_tpu
from docodo_tpu.query.batcher import BatchExecutor, compile_request
from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource


@pytest.fixture(scope="module")
def ind(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bidx")
    ind = docodo_tpu.Index(path=str(tmp), in_memory=True)
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(
            "alpha", "the pickwick club met at noon near the old tavern", ""
        ),
        IndexPagedTextFile(
            "beta", "the club adjourned after dinner and wandered home", ""
        ),
        IndexPagedTextFile(
            "gamma", "dinner at the tavern started well before noon", ""
        ),
    ]))
    ind.create()
    yield ind
    ind.dispose()


def test_compile_request_forms(ind):
    c = compile_request(ind, "pickwick club")
    assert c is not None and len(c) == 2
    assert all(r > 0 for _, r in c)
    c = compile_request(ind, '"pickwick club"')
    assert all(r < 0 for _, r in c)
    # wildcards now compile to an exact-mode variant OR of raw keys
    c = compile_request(ind, "pick?ick")
    assert c is not None and len(c) == 1
    codes, r = c[0]
    assert "pickwick" in codes and r == -(len("pick_ick") + 4)
    # field queries compile only when the caller opts into field rows
    assert compile_request(ind, "{Name=x} word") is None
    fields = []
    c = compile_request(ind, "{Name=alpha} club", field_out=fields)
    assert c is not None and len(fields) == 1
    fkey_group, value_group = fields[0]
    assert fkey_group[0][0].startswith("&name") and fkey_group[1] == -1
    # unsupported constructs still fall back
    assert compile_request(ind, "a | b") is None
    assert compile_request(ind, "club -filter:xyz") is None
    assert compile_request(ind, "xy") is None  # all-short -> host


def test_batch_executor_matches_host_docs(ind):
    ex = BatchExecutor(ind, max_wait_ms=1.0)
    try:
        for req in ["club", '"pickwick club"', "dinner tavern"]:
            dev = ex.search(req)
            host = ind.search(req)
            assert {d.name for d in dev.found_docs} == \
                {d.name for d in host.found_docs}, req
        assert ex.stats["device_queries"] >= 3
        # -filter: doc regexes serve on device too (delivery-side
        # filtering, ref Search.cs:456-466)
        res = ex.search("club -filter:al.*")
        host = ind.search("club -filter:al.*")
        assert res == host
        assert [d.name for d in res.found_docs] == \
            [d.name for d in host.found_docs] == ["docs:alpha"]
        # host fallback path still serves (~ = host parity with the
        # reference's syntax-error path)
        res = ex.search("club ~tavern")
        assert ex.stats["host_queries"] >= 1
    finally:
        ex.close()


def test_batch_executor_concurrent(ind):
    import threading

    ex = BatchExecutor(ind, max_wait_ms=5.0, max_batch=64)
    results = {}

    def worker(i):
        results[i] = ex.search("club" if i % 2 else "dinner")

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(32)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert len(results) == 32
        assert all(r is not None and r.success for r in results.values())
        assert ex.stats["batches"] < 32  # actually batched
    finally:
        ex.close()


def test_partial_quotes_compile_with_fold_reorder(ind):
    # a quoted phrase inside a free query compiles: the phrase moves to
    # the fold front (unordered-AND commutativity keeps host semantics)
    c = compile_request(ind, 'apple "bank account"')
    assert c is not None
    assert [r < 0 for _, r in c] == [True, True, False]
    c = compile_request(ind, '"bank account" apple')
    assert [r < 0 for _, r in c] == [True, True, False]
    assert compile_request(ind, '"bank account"') is not None
    # two quoted phrases exceed the linear fold -> host engine
    assert compile_request(ind, '"bank account" "old tavern"') is None


def test_or_and_morphology_compile(ind):
    c = compile_request(ind, "club | tavern")
    assert c is not None and len(c) == 1
    codes, r = c[0]
    assert set(codes) >= {"club", "tavern"} and r > 0
    c = compile_request(ind, "dinner (club|tavern)")
    assert c is not None and len(c) == 2 and len(c[1][0]) >= 2
    # wandered stems to $wander -> still a single-variant group (known
    # codes preferred over raw form, ref Search.cs:230-233)
    c = compile_request(ind, "wandered")
    assert c is not None and c[0][0] == ("$wander",)


def test_batch_executor_or_parity(ind):
    ex = BatchExecutor(ind, max_wait_ms=1.0)
    try:
        for req in ["club | tavern", "dinner (club|tavern)",
                    'noon "the tavern"', "wandered"]:
            dev = ex.search(req)
            host = ind.search(req)
            assert dev == host, req  # foundPages equal incl. positions
            assert {d.name for d in dev.found_docs} == \
                {d.name for d in host.found_docs}, req
    finally:
        ex.close()


def test_batch_executor_real_positions_and_snippets(ind):
    ex = BatchExecutor(ind, max_wait_ms=1.0)
    try:
        dev = ex.search("dinner tavern")
        host = ind.search("dinner tavern")
        assert dev == host
        assert dev.found_pages and all(
            p.pos and all(x >= 0 for x in p.pos) for p in dev.found_pages
        )
        # snippets materialize from device-served results
        assert any("`" in (d.summary or "") or d.summary
                   for d in dev.found_docs)
        assert [d.summary for d in dev.found_docs] == \
            [d.summary for d in host.found_docs]
    finally:
        ex.close()


def test_deep_crawl_chain_no_recursion_error():
    from docodo_tpu.sources import WebDataSource

    n = 1500  # far beyond the default recursion limit if crawls recursed
    site = {
        f"http://deep.local/p{i}.html": (
            "text/html",
            f"<html><body>page {i}"
            f"<a href='p{i+1}.html'>next</a></body></html>".encode(),
        )
        for i in range(n)
    }
    site["http://deep.local/"] = site["http://deep.local/p0.html"]

    def fetch(url):
        if url not in site:
            raise OSError("404")
        return site[url]

    src = WebDataSource("deep", "http://deep.local", fetcher=fetch,
                        politeness_s=0.0)
    src.reset()
    count = 0
    while src.next_document() is not None:
        count += 1
    assert count >= n - 2


def test_batch_executor_fills_words_info(ind):
    """Device-served results carry result.words like the host path
    (ref Search.cs:599-601): same words, same resolved posting counts."""
    ex = BatchExecutor(ind, max_wait_ms=1.0)
    try:
        for req in ["club", "dinner tavern", '"pickwick club"', "club zzqq"]:
            dev = ex.search(req)
            host = ind.search(req)
            dw = [(w.word, w.n_found) for w in dev.words]
            hw = [(w.word, w.n_found) for w in host.words]
            assert dw == hw, (req, dw, hw)
    finally:
        ex.close()


def test_batcher_restages_after_rebuild(tmp_path):
    """A BatchExecutor built before any index exists serves host-side,
    then stages on first build, then RE-stages when the index rebuilds
    (generation bump) — the CLI's `server -batch` flow."""
    ind = docodo_tpu.Index(path=str(tmp_path), in_memory=True)
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile("a", "alpha words appear here today", "")
    ]))
    ex = BatchExecutor(ind, max_wait_ms=1.0)
    try:
        assert ex.search("alpha").found_docs == []  # no index yet
        ind.create()
        res = ex.search("alpha words")
        assert [d.name for d in res.found_docs] == ["docs:a"]
        # rebuild with different content: the executor must re-stage
        ind.sources = []
        ind.add_data_source(ListDataSource("docs", [
            IndexPagedTextFile("b", "omega tokens appear here instead", "")
        ]))
        ind.status = "Idle"
        ind.create()
        res = ex.search("omega tokens")
        assert [d.name for d in res.found_docs] == ["docs:b"]
        assert ex.search("alpha").found_docs == []
    finally:
        ex.close()


def test_batcher_pipelined_mode(ind):
    """pipeline=True: dispatch and readback run on separate threads with
    a bounded completion queue — results must be identical to the host
    engine under concurrency."""
    import concurrent.futures as cf

    ex = BatchExecutor(ind, max_wait_ms=1.0, pipeline=True)
    try:
        reqs = ["club", '"pickwick club"', "dinner tavern", "noon"] * 8
        with cf.ThreadPoolExecutor(8) as pool:
            dev = list(pool.map(ex.search, reqs))
        for req, d in zip(reqs, dev):
            host = ind.search(req)
            assert {x.name for x in d.found_docs} == \
                {x.name for x in host.found_docs}, req
        assert ex.stats["device_queries"] >= len(reqs) - 4
    finally:
        ex.close()


def test_brief_mode_device_doc_ranks_order_parity(ind):
    """Brief serving (materialize=False) orders docs straight from the
    DEVICE doc ranks (locate_full's 1+ln(sum page ranks) with the x10
    header boost) — names, order, and rank values must match the host
    finalize pass (ref Search.cs:552-557, 599)."""
    ex = BatchExecutor(ind, max_wait_ms=1.0, materialize=False)
    try:
        for req in ["club", "dinner tavern", "noon", '"pickwick club"',
                    "the club"]:
            dev = ex.search(req)
            # the host engine's materialized result carries the same doc
            # rank formula — its order and rank values are the oracle
            host = ind.search(req)
            assert dev == host, req  # found_pages incl. positions
            assert ex.stats["host_queries"] == 0
            assert [d.name for d in dev.found_docs] == \
                [d.name for d in host.found_docs], req
            for d_dev, d_host in zip(dev.found_docs, host.found_docs):
                assert abs(d_dev.rank - d_host.rank) < 1e-4 * max(
                    1.0, abs(d_host.rank)), (req, d_dev.name)
    finally:
        ex.close()


def test_fallback_reason_counters(ind):
    """stats must say WHY a query bypassed the device."""
    ex = BatchExecutor(ind, max_wait_ms=1.0)
    try:
        ex.search("club ~tavren")      # correction -> unsupported
        ex.search("xy")                # all-short -> shape
        assert ex.stats["fallback_unsupported"] >= 1
        assert ex.stats["fallback_shape"] >= 1
        assert ex.stats["host_queries"] == \
            ex.stats["fallback_unsupported"] + ex.stats["fallback_shape"] \
            + ex.stats["fallback_no_index"]
    finally:
        ex.close()


def test_wildcard_queries_ride_device(ind):
    """`?` wildcards expand to variant-OR groups and serve on device
    with exact host parity (ref Search.cs:158-167, 206-217)."""
    ex = BatchExecutor(ind, max_wait_ms=1.0)
    try:
        for req in ["clu?", "?avern", "d?nner", "club ?avern",
                    "?zzzzz?"]:
            dev = ex.search(req)
            host = ind.search(req)
            assert dev == host, req
            assert {d.name for d in dev.found_docs} == \
                {d.name for d in host.found_docs}, req
        assert ex.stats["host_queries"] == 0, ex.stats
        assert ex.stats["device_queries"] >= 5
    finally:
        ex.close()


def test_field_queries_ride_device(tmp_path):
    """{field=value} evaluates as its own device row, doc-intersected
    with the main expression (ref Search.cs:126-155, 423-428)."""
    import docodo_tpu

    ind = docodo_tpu.Index(path=str(tmp_path / "f"), in_memory=True)
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile("alpha", "the pickwick club met at noon",
                           "name=alpha\nauthor=dickens"),
        IndexPagedTextFile("beta", "the club adjourned after dinner",
                           "name=beta\nauthor=trollope"),
    ]))
    ind.create()
    ex = BatchExecutor(ind, max_wait_ms=1.0)
    try:
        for req in ["club {author=dickens}", "{author=dickens}",
                    "{author=trollope} club", "dinner {name=beta}",
                    "{author=nobody} club"]:
            dev = ex.search(req)
            host = ind.search(req)
            assert dev == host, req
            assert [d.name for d in dev.found_docs] == \
                [d.name for d in host.found_docs], req
        assert ex.stats["host_queries"] == 0, ex.stats
        assert ex.stats["device_queries"] >= 5
        # multi-word values nest pair-evaluations -> host fallback
        ex.search("{author=charles dickens}")
        assert ex.stats["fallback_shape"] >= 1
    finally:
        ex.close()
        ind.dispose()


def test_pipelined_mode_serves_fields_and_wildcards(tmp_path):
    """The pipelined dispatch path must carry the main/field row split
    through the completion thread."""
    import docodo_tpu

    ind = docodo_tpu.Index(path=str(tmp_path / "pf"), in_memory=True)
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile("alpha", "the pickwick club met at noon",
                           "name=alpha\nauthor=dickens"),
        IndexPagedTextFile("beta", "the club adjourned after dinner",
                           "name=beta\nauthor=trollope"),
    ]))
    ind.create()
    ex = BatchExecutor(ind, max_wait_ms=1.0, pipeline=True)
    try:
        for req in ["club {author=dickens}", "{author=trollope}",
                    "clu?", "dinner"]:
            dev = ex.search(req)
            host = ind.search(req)
            assert dev == host, req
            assert [d.name for d in dev.found_docs] == \
                [d.name for d in host.found_docs], req
        assert ex.stats["host_queries"] == 0, ex.stats
    finally:
        ex.close()


def test_truncated_queries_escalate_on_device(tmp_path):
    """A query whose result overflows the batch top-k budget must be
    RE-SERVED ON DEVICE with an escalated budget (not punted to the
    host), with exact host parity — frequent words are the expensive
    queries, exactly where the device matters."""
    import docodo_tpu

    # 40 docs all containing 'common' -> n_pages(40) > topk(8)
    ind = docodo_tpu.Index(path=str(tmp_path / "esc"), in_memory=True)
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile(
            f"d{i}", f"common words appear here plus unique{i} token", ""
        )
        for i in range(40)
    ]))
    ind.create()
    ex = BatchExecutor(ind, max_wait_ms=1.0, topk=8, hit_cap=16,
                       escalate=True)
    try:
        dev = ex.search("common")
        host = ind.search("common")
        assert dev == host
        assert [d.name for d in dev.found_docs] == \
            [d.name for d in host.found_docs]
        assert ex.stats["escalations"] == 1, ex.stats
        assert ex.stats["host_queries"] == 0, ex.stats
        # brief mode escalates too (device doc ranks at the bigger topk)
    finally:
        ex.close()
    ex2 = BatchExecutor(ind, max_wait_ms=1.0, topk=8, hit_cap=16,
                        materialize=False, escalate=True)
    try:
        dev = ex2.search("common")
        host = ind.search("common")
        assert dev == host
        assert [d.name for d in dev.found_docs] == \
            [d.name for d in host.found_docs]
        assert ex2.stats["escalations"] == 1, ex2.stats
    finally:
        ex2.close()
