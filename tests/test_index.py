"""End-to-end index tests mirroring the reference xUnit suite
(ref XUnitDocodoTest/IndexTest.cs). The oracle is regex positions over the
raw text, exactly as in the reference tests."""

import re

import pytest

from docodo_tpu.index import Index, IndexBuilder, SearchOptions
from docodo_tpu.lang.vocab import Vocab

from fixtures import TEST_TEXT_1, SamePageDataSource, TestDataSource


def make_index(tmp_path, n_pages=50, vocs=None, clear_stemmers=True,
               parallel=2):
    index = Index(path=None)
    index.work_path = str(tmp_path / "idx")
    if vocs:
        for v in vocs:
            index.add_voc(v)
    if clear_stemmers:
        index.stemmers.clear()
    index.max_degree_of_parallelism = parallel
    index.add_data_source(TestDataSource(n_pages))
    index.create()
    return index


def test_coord_parity(tmp_path):
    """CoordTest (ref IndexTest.cs:126-162): positions equal regex oracle."""
    n = 100
    index = make_index(tmp_path, n_pages=n)
    assert not index.is_creating
    assert index.can_search

    for word in ["and", "tupman", "everybody", "old"]:
        pos = [m.start() for m in re.finditer(r"\b%s\b" % word, TEST_TEXT_1.lower())]
        res = index.search(word)
        assert len(res.found_pages) == 2 * n, word
        assert len(res.found_pages[0].pos) == len(pos), word
        for p in res.found_pages:
            assert p.pos == pos, word


def test_request_syntax(tmp_path):
    """RequestSyntaxTest (ref IndexTest.cs:164-226)."""
    n_pages = 50
    index = make_index(tmp_path, n_pages=n_pages, clear_stemmers=False)

    res = index.search("and (tupman|old)")
    assert len(res.found_docs) == 2
    assert len(res.found_docs[0].pages) == n_pages
    assert len(res.found_docs[1].pages) == n_pages

    res = index.search("and (tupman|old) {Name=Dump}")
    assert len(res.found_docs) == 1
    assert len(res.found_docs[0].pages) == n_pages
    assert len(res.found_pages[0].pos) == len(res.found_pages[1].pos)
    for q in range(2 * n_pages):
        assert len(res.found_pages[q].pos) == 42
    assert res.found_pages[0].pos == res.found_pages[1].pos

    res = index.search("lady old", SearchOptions(dist=40))
    assert len(res.found_pages[0].pos) == 10

    res = index.search('"lady" old', SearchOptions(dist=40))
    assert len(res.found_pages[0].pos) == 8

    res = index.search('"old lady"', SearchOptions(dist=40))
    assert len(res.found_pages[0].pos) == 8

    res = index.search('"lady old"', SearchOptions(dist=40))
    assert len(res.found_pages) == 0

    assert (
        len(index.search("lady (old | young)", SearchOptions(dist=40))
            .found_pages[0].pos) == 12
    )
    assert (
        len(index.search('"old ladies were"', SearchOptions(dist=40))
            .found_pages[0].pos) == 3
    )
    res = index.search('"old lady were"', SearchOptions(dist=40))
    assert len(res.found_pages) == 0

    res = index.search('"old (lady|ladies) (who|were|looked)"', SearchOptions(dist=40))
    assert len(res.found_pages[0].pos) == 9

    res = index.search("?an?", SearchOptions(dist=40))
    assert len(res.found_pages[0].pos) == len(
        re.findall(r"\w*an\w*", TEST_TEXT_1.lower())
    )


def make_voc():
    voc = Vocab()
    voc.name = "en"
    for w, g in [("and", 1), ("end", 3), ("old", 2), ("the", 6),
                 ("them", 5), ("then", 4)]:
        voc.add(w, g)
    voc.range = ("a", "z")
    return voc


def test_vocab(tmp_path):
    """VocabTest (ref IndexTest.cs:228-270)."""
    n_pages = 50
    index = Index()
    index.work_path = str(tmp_path / "plain")
    ds = TestDataSource(n_pages)
    index.add_data_source(ds)
    index.max_degree_of_parallelism = 1
    index.create()
    assert index.can_search

    vocindex = Index(path=str(tmp_path / "vocidx"))
    vocindex.add_data_source(ds)
    vocindex.add_voc(make_voc())
    vocindex.create()
    assert vocindex.status == "Idle"
    assert vocindex.can_search

    n_and = len(re.findall(r"\band\b", TEST_TEXT_1.lower()))
    assert len(vocindex["#1"]) == n_and * 2 * n_pages

    assert vocindex.search("Tupman") == index.search("Tupman")
    assert vocindex.search("and") == index.search("and")
    assert vocindex.search("Tupman and") == index.search("Tupman and")


def test_builder_standalone(tmp_path):
    """BuilderTest (ref IndexTest.cs:272-319)."""
    bldr = IndexBuilder(path=str(tmp_path / "bt")).add_voc(make_voc())
    bldr.add_doc("A", "")
    words = ["and", "tupman", "everybody", "old"]
    pos = {w: [] for w in words}
    for m in re.finditer(r"\b\w+\b", TEST_TEXT_1.lower()):
        if m.group() in pos:
            pos[m.group()].append(m.start())
        bldr.add_word(m.group(), m.start())
    bldr.end_page("1")
    index = bldr.build()
    for w in words:
        res = index.search(w)
        assert len(res.found_pages) == 1
        assert res.found_pages[0].pos == pos[w]


def test_page_text(tmp_path):
    """PageTextTest (ref IndexTest.cs:321-338): highlight markers present."""
    from docodo_tpu.constants import BEGIN_MATCHED_SYMBOL, END_MATCHED_SYMBOL

    index = Index()
    index.work_path = str(tmp_path / "ptt")
    index.add_data_source(SamePageDataSource(10))
    index.create()

    res = index.search('"old lady"')
    assert BEGIN_MATCHED_SYMBOL + "old" + END_MATCHED_SYMBOL in res.found_pages[0].text
    res = index.search("Test")
    assert (
        BEGIN_MATCHED_SYMBOL + "Test" + END_MATCHED_SYMBOL
        in res.found_docs[0].headers["Name"]
    )


def test_spill_and_merge(tmp_path):
    """MemUseTest analog: small spill threshold forces the tmpind/merge
    path; results must be identical to the unspilled build."""
    a = make_index(tmp_path / "a", n_pages=20)
    b = Index()
    b.work_path = str(tmp_path / "b" / "idx")
    b.stemmers.clear()
    b.max_tmp_index_items = 500  # force many spills
    b.add_data_source(TestDataSource(20))
    b.create()
    for req in ["and", "tupman", "old lady", '"old lady"']:
        ra, rb = a.search(req), b.search(req)
        assert ra == rb, req


def test_index_save_load_roundtrip(tmp_path):
    index = make_index(tmp_path, n_pages=5)
    res1 = index.search("tupman")
    # reload from disk
    index2 = Index(path=index.work_path)
    res2 = index2.search("tupman")
    assert res1 == res2
    assert index2.count == index.count


def test_suggestions(tmp_path):
    index = make_index(tmp_path, n_pages=5)
    sugg = index.get_suggestions("lau", 10)
    assert any("ghed" in s for s in sugg)


def test_histogram(tmp_path):
    index = make_index(tmp_path, n_pages=5)
    hist = Index.calc_histogram(index)
    assert hist
    top = max(hist.values())
    assert list(hist.values())[0] == top


def test_mem_use_bounded_by_spill(tmp_path):
    """During a 1000-page build with a tiny spill threshold, Python heap
    growth must stay bounded — validates the spill-to-disk design
    (analog of reference MemUseTest, ref IndexTest.cs:340-365)."""
    import gc
    import tracemalloc

    index = Index(path=None, in_memory=False)  # lazy load, like the ref
    index.work_path = str(tmp_path / "idx")
    index.stemmers.clear()
    index.max_degree_of_parallelism = 1
    index.max_tmp_index_items = 50_000  # force spills
    index.add_data_source(TestDataSource(1000))
    gc.collect()
    tracemalloc.start()
    base, _ = tracemalloc.get_traced_memory()
    index.create()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # in-RAM builder state is capped by the spill threshold; final index
    # load is ~2 MB for this corpus. 10 MB bound matches the reference.
    growth_mb = (peak - base) / 1e6
    assert growth_mb < 10, f"peak heap growth {growth_mb:.1f} MB"
    assert index.count > 0
    res = index.search("pickwick")
    assert res.found_pages


class _ExplodingDoc:
    """Doc whose page iteration raises mid-way (ref Build.cs:537-540:
    per-doc errors are caught, logged, and the build continues)."""

    name = "boom"

    def __iter__(self):
        yield __import__("docodo_tpu.sources.base", fromlist=["IndexPage"]).IndexPage("1", "alpha beta words")
        raise RuntimeError("injected source failure")

    def close(self):
        pass


def test_build_survives_failing_document(tmp_path):
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    index = Index(path=None)
    index.work_path = str(tmp_path / "idx")
    index.stemmers.clear()
    index.max_degree_of_parallelism = 1
    index.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile("good1", "gamma delta words here", ""),
        _ExplodingDoc(),
        IndexPagedTextFile("good2", "epsilon zeta words too", ""),
    ]))
    index.create()  # must not raise
    assert index.can_search
    assert len(index.search("gamma").found_docs) == 1
    assert len(index.search("epsilon").found_docs) == 1
    # the failing doc's first page WAS indexed before the error (parity:
    # the reference logs and moves on, keeping earlier pages)
    assert len(index.search("alpha").found_docs) == 1


def test_cancel_stops_build(tmp_path):
    """Cooperative cancellation (ref Index.cs:382-389, 434-435)."""
    import threading
    import time as _t

    from fixtures import TestDataSource

    index = Index(path=None)
    index.work_path = str(tmp_path / "idx")
    index.stemmers.clear()
    index.max_degree_of_parallelism = 1
    index.add_data_source(TestDataSource(100000))  # would take minutes
    t = index.create_async()
    _t.sleep(0.5)
    index.cancel()
    t.join(timeout=60)
    assert not t.is_alive()


def test_close_words_and_group_names(tmp_path):
    """GetCloseWords (Levenshtein top-10, ref Search.cs:169-174) and
    GetWordsGroup (group code -> display word, ref Index.cs:270-281)."""
    index = make_index(tmp_path, n_pages=3, vocs=[make_voc()],
                       clear_stemmers=False)
    close = index.get_close_words("tupnan")
    assert close and close[0] == "tupman"
    # '#<hex>' voc group code resolves to a member word of group 1 ('and')
    name = index.get_words_group("#1")
    assert isinstance(name, str) and name


def test_corrupted_index_files_fail_gracefully(tmp_path):
    """A truncated/garbage .index must not crash: load reports failure,
    search returns an error result (ref Load catch, Index.cs:357-359)."""
    (tmp_path / ".index").write_bytes(
        (12345).to_bytes(8, "little") + b"\x05hello"
    )
    (tmp_path / ".index.list").write_bytes(b"\x01\x02")
    ind = Index(path=str(tmp_path), in_memory=True)
    assert not ind.can_search
    res = ind.search("hello")
    assert not res.success


def test_astral_chars_highlight_correctly(tmp_path):
    """Coordinates are UTF-16 units; snippets index Python strings by
    code point — positions after an astral char must translate
    (regression for the unit/codepoint mismatch)."""
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource
    from docodo_tpu.constants import BEGIN_MATCHED_SYMBOL

    text = "intro \U0001F600\U0001F600 target word here"
    index = Index(path=None)
    index.work_path = str(tmp_path / "ast")
    index.stemmers.clear()
    index.add_data_source(
        ListDataSource("d", [IndexPagedTextFile("a", text, "")])
    )
    index.create()
    res = index.search("target")
    assert res.found_pages
    assert BEGIN_MATCHED_SYMBOL + "target" in (res.found_pages[0].text or "")


def test_lazy_posting_count_is_stored_word_count(tmp_path):
    """Lazy mode: posting_count/enc_count come from the stored u16 word
    counts (reference lazy-stub parity, ref Index.cs:346-348)."""
    index = make_index(tmp_path, n_pages=3)
    lazy = Index(path=index.work_path, in_memory=False)
    tid = lazy.arr.term_id("tupman")
    assert tid >= 0
    assert lazy.arr.posting_count(tid) > 0
    assert lazy.arr.enc_count(tid) > 0
    # suggestions path (uses enc_count ordering) still works lazily
    assert lazy.get_suggestions("tupm", 5)
