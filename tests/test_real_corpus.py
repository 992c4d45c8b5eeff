"""Tests against the reference's real Test/ corpus (mirror of
DataSourceTest.cs) plus engine-level robustness checks."""

import os
import threading

import numpy as np
import pytest

import docodo_tpu
from docodo_tpu.sources import DocumentsDataSource

REF_TEST = "/root/reference/Test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TEST), reason="reference corpus not mounted"
)


def test_documents_source_real_folder():
    """Walk the reference Test/ folder (ref DataSourceTest.cs:14-48):
    both text corpora must appear with >10 pages each."""
    src = DocumentsDataSource("doc", REF_TEST + os.sep)
    src.reset()
    names = {}
    while True:
        doc = src.next_document()
        if doc is None:
            break
        pages = 0
        for page in doc:
            pages += 1
        names[doc.name] = pages
        doc.close()
    assert any("Pickwick" in n for n in names)
    assert any("voyna-i-mir" in n for n in names)
    assert all(p > 10 for p in names.values()), names


@pytest.fixture(scope="module")
def war_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("waridx")
    ind = docodo_tpu.Index(path=str(tmp), in_memory=True)
    ind.add_data_source(
        DocumentsDataSource("doc", REF_TEST + os.sep, mod="voyna*.txt")
    )
    ind.create()
    yield ind, str(tmp)
    ind.dispose()


def test_lazy_mode_search_equals_in_memory(war_index):
    """in_memory=False (disk-stub postings hydrated per lookup, ref
    Index.cs:198-216, 346-348) must return identical results."""
    ind, path = war_index
    lazy = docodo_tpu.Index(path=path, in_memory=False)
    try:
        for req in ["наполеон", '"князь андрей"', "пьер безухов"]:
            a = ind.search(req)
            b = lazy.search(req)
            assert a == b, req  # SearchResult equality = foundPages equal
        assert lazy.count == ind.count
    finally:
        lazy.dispose()


def test_search_during_rebuild(war_index):
    """Searches must stay consistent while a rebuild runs concurrently —
    the index swap is atomic under the search lock (ref Index.cs:399,
    493; Search.cs:448)."""
    ind, path = war_index
    baseline = len(ind.search("наполеон").found_pages)
    errors = []
    results = []

    def hammer():
        try:
            for _ in range(40):
                r = ind.search("наполеон")
                if r.success:
                    results.append(len(r.found_pages))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t = threading.Thread(target=hammer)
    t.start()
    ind.create()  # full rebuild while searching
    t.join(timeout=120)
    assert not errors
    # every successful search saw either the old or the new (equal) index
    assert set(results) <= {baseline}
    assert len(ind.search("наполеон").found_pages) == baseline


def test_device_batch_fuzz_parity_real_corpus(tmp_path):
    """Fuzz: random word pairs from the real Pickwick corpus — the
    device batch path's page sets must equal the host engine's for
    proximity AND, ordered phrase, and single-word queries."""
    import random

    import docodo_tpu
    from docodo_tpu.ops.device_index import DeviceIndex

    path = os.path.join(REF_TEST,
                        "Dickens Charles. The Pickwick Papers - royallib.ru.txt")
    raw = open(path, encoding="cp1251", errors="replace").read()[:600_000]
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    ind = docodo_tpu.Index(path=str(tmp_path / "fz"), in_memory=True)
    ind.stemmers.clear()  # raw-form keys only: the device fast path's domain
    ind.add_data_source(
        ListDataSource("docs", [IndexPagedTextFile("pick", raw, "")])
    )
    ind.create()
    di = DeviceIndex.from_index(ind)

    # mid-frequency plain words (no #/$/& special keys)
    words = [t for t in di.terms
             if t[0].isalpha() and 4 <= len(t) <= 10
             and 4 <= di.posting_count(t) <= 400]
    rng = random.Random(11)
    queries = []
    host_sets = []
    for _ in range(30):
        w1, w2 = rng.sample(words, 2)
        kind = rng.randrange(3)
        if kind == 0:
            q = [(w1, 255 + len(w1))]
            req = w1
        elif kind == 1:
            q = [(w1, 255 + len(w1)), (w2, 255 + len(w2))]
            req = f"{w1} {w2}"
        else:
            q = [(w1, -(len(w1) + 4)), (w2, -(len(w2) + 4))]
            req = f'"{w1} {w2}"'
        queries.append(q)
        res = ind.search(req)
        host_sets.append({p.id for p in res.found_pages})
    pages, ranks, counts = di.search_batch(queries, topk=16)
    for i, hs in enumerate(host_sets):
        got = {di.page_ids[int(p)] for p in pages[i] if p >= 0}
        if len(hs) > 16:  # device truncates at topk
            assert got <= hs and len(got) == 16, queries[i]
        else:
            assert got == hs, (queries[i], got, hs)


def test_device_positions_parity_real_corpus(tmp_path):
    """Device-served positions must equal the host engine's
    ResultDocPage.pos exactly (the parity north star, ref
    Search.cs:365-420 esp. :381) — checked through the full serving
    stack (BatchExecutor) on the real Pickwick corpus."""
    import random

    import docodo_tpu
    from docodo_tpu.query.batcher import BatchExecutor
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    path = os.path.join(REF_TEST,
                        "Dickens Charles. The Pickwick Papers - royallib.ru.txt")
    raw = open(path, encoding="cp1251", errors="replace").read()[:400_000]
    ind = docodo_tpu.Index(path=str(tmp_path / "pp"), in_memory=True)
    ind.stemmers.clear()
    ind.add_data_source(
        ListDataSource("docs", [IndexPagedTextFile("pick", raw, "")])
    )
    ind.create()

    from docodo_tpu.ops.device_index import DeviceIndex

    di = DeviceIndex.from_index(ind)
    words = [t for t in di.terms
             if t[0].isalpha() and 4 <= len(t) <= 10
             and 4 <= di.posting_count(t) <= 200]
    rng = random.Random(5)
    ex = BatchExecutor(ind, device_index=di, max_wait_ms=1.0)
    try:
        served_device = 0
        for _ in range(25):
            w1, w2 = rng.sample(words, 2)
            req = rng.choice([
                w1, f"{w1} {w2}", f'"{w1} {w2}"', f"{w1} | {w2}",
                f'{w1} "{w2} {w1}"',
            ])
            dev = ex.search(req)
            host = ind.search(req)
            # SearchResult __eq__ = foundPages sequence equal (id + pos)
            assert dev == host, req
        served_device = ex.stats["device_queries"]
        # most of these must actually ride the device path
        assert served_device >= 15, ex.stats
    finally:
        ex.close()


def test_russian_morphology_end_to_end(tmp_path):
    """BASELINE.md workload 3: ru.voc rebuilt offline from the bundled
    OpenCorpora-format extract (Dict/ru/dict.opcorpora.xml), then
    morphological + quoted-exact search over the real War&Peace corpus
    with position parity (ref Dict.cs:216-257, Search.cs:226-247)."""
    import re

    import docodo_tpu
    from docodo_tpu.lang.vocab import Vocab, build_opencorpora_voc
    from docodo_tpu.query.batcher import BatchExecutor, compile_request
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    dump = os.path.join(os.path.dirname(__file__), "..", "Dict", "ru",
                        "dict.opcorpora.xml")
    voc_path = str(tmp_path / "ru.voc")
    build_opencorpora_voc(dump, voc_path)
    voc = Vocab(voc_path)
    assert len(voc) > 100

    raw = open(os.path.join(REF_TEST, "voyna-i-mir-tom-1.txt"),
               encoding="cp1251", errors="replace").read()[:400_000]
    ind = docodo_tpu.Index(path=str(tmp_path / "ru"), in_memory=True,
                           vocs=[voc])
    ind.add_data_source(
        ListDataSource("docs", [IndexPagedTextFile("vim", raw, "")])
    )
    ind.create()

    # morphological: query in one inflection finds ALL forms that stem
    # into the same voc group — oracle computed independently by
    # stemming every regex token of the raw text
    low = raw.lower()
    grp = voc.search(voc.stem("войну"))
    assert grp != 0
    oracle = sorted(
        m.start() for m in re.finditer(r"[^\W\d_]+", low)
        if 3 <= len(m.group()) <= 32
        and voc.search(voc.stem(m.group())) == grp
    )
    res = ind.search("войну")
    got = []
    pt = ind.pages
    for p in res.found_pages:
        pg = pt.page_ids.index(p.id)
        base = int(pt.bounds[pg - 1]) if pg > 0 else 0
        got.extend(base + x for x in p.pos)
    assert sorted(got) == oracle, (len(got), len(oracle))
    assert len({m for m in re.finditer(r"\bвойну\b", low)}) < len(oracle), \
        "morphology must widen beyond the literal form"

    # the voc-group key resolves through the device path too
    c = compile_request(ind, "войну")
    assert c is not None and c[0][0][0].startswith("#"), c

    # quoted exact: only the literal phrase, positions vs regex oracle
    phrase_oracle = [m.start() for m in
                     re.finditer(r"\bкнязь\W{1,4}андрей\b", low)]
    res = ind.search('"князь андрей"')
    firsts = []
    for p in res.found_pages:
        pg = pt.page_ids.index(p.id)
        base = int(pt.bounds[pg - 1]) if pg > 0 else 0
        firsts.extend(base + x for x in p.pos)
    assert set(phrase_oracle) <= set(firsts)
    # exact mode must NOT morphologically widen: every emitted first
    # coord is a literal form boundary of one of the two words
    lits = {m.start() for m in re.finditer(r"\bкнязь\b|\bандрей\b", low)}
    assert set(firsts) <= lits

    # device serving parity on the morphological + exact mix
    ex = BatchExecutor(ind, max_wait_ms=1.0)
    try:
        for req in ["войну", "князья", '"князь андрей"',
                    "наполеон | кутузов", "сказала княжна"]:
            dev = ex.search(req)
            host = ind.search(req)
            assert dev == host, req
        # a regression truncating EVERY morphological query to the host
        # must fail: most of the mix has small results and must actually
        # ride the device
        assert ex.stats["device_queries"] >= 3, ex.stats
        assert ex.stats["device_queries"] + \
            ex.stats["truncated_fallbacks"] >= 5
    finally:
        ex.close()
        ind.dispose()


def test_morphological_serving_en_voc(tmp_path):
    """With en.voc loaded every real word carries a voc-group code; the
    device path must evaluate those morphological queries (variant ORs)
    with exact host parity (ref Search.cs:226-247)."""
    import docodo_tpu
    from docodo_tpu.lang.vocab import Vocab
    from docodo_tpu.query.batcher import BatchExecutor, compile_request
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    voc_path = "/root/reference/Dict/en.voc"
    if not os.path.exists(voc_path):
        pytest.skip("en.voc not mounted")
    path = os.path.join(REF_TEST,
                        "Dickens Charles. The Pickwick Papers - royallib.ru.txt")
    raw = open(path, encoding="cp1251", errors="replace").read()[:300_000]
    voc = Vocab(voc_path)
    ind = docodo_tpu.Index(path=str(tmp_path / "mv"), in_memory=True,
                           vocs=[voc])
    ind.add_data_source(
        ListDataSource("docs", [IndexPagedTextFile("pick", raw, "")])
    )
    ind.create()

    # morphological check at the engine level first: plural query form
    # finds the singular occurrences through the shared voc group
    reqs = ["travelling companions", "member", '"pickwick club"',
            "friends | enemies", "said observed"]
    compiled = [compile_request(ind, r) for r in reqs]
    assert all(c is not None for c in compiled), compiled
    # voc-group '#' codes actually flow to the device groups
    assert any(
        any(code.startswith("#") for codes, _ in c for code in codes)
        for c in compiled
    )
    ex = BatchExecutor(ind, max_wait_ms=1.0)
    try:
        for req in reqs:
            dev = ex.search(req)
            host = ind.search(req)
            assert dev == host, req
        # device-served fraction must stay >1/2 — an all-truncated
        # regression is a serving-path failure, not a tolerable fallback
        assert ex.stats["device_queries"] >= (len(reqs) + 1) // 2, ex.stats
        assert ex.stats["device_queries"] + \
            ex.stats["truncated_fallbacks"] >= len(reqs)
    finally:
        ex.close()


def test_wildcard_and_field_serving_real_corpus(tmp_path):
    """Wildcards (`?an?`, ref IndexTest.cs RequestSyntaxTest) and
    {field=value} queries serve on DEVICE with exact host parity on the
    real Pickwick corpus; the wildcard hit set equals the regex oracle
    over the raw text (ref Search.cs:158-167)."""
    import re

    import docodo_tpu
    from docodo_tpu.query.batcher import BatchExecutor
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource

    path = os.path.join(REF_TEST,
                        "Dickens Charles. The Pickwick Papers - royallib.ru.txt")
    raw = open(path, encoding="cp1251", errors="replace").read()[:200_000]
    ind = docodo_tpu.Index(path=str(tmp_path / "wf"), in_memory=True)
    ind.stemmers.clear()
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile("pick", raw, "name=pick\nauthor=dickens"),
    ]))
    ind.create()
    ex = BatchExecutor(ind, max_wait_ms=1.0)
    try:
        for req in ["pickw?ck", "?ather", "d?nner club",
                    "{author=dickens} pickwick", "{author=dickens}",
                    "{author=nobody} pickwick"]:
            dev = ex.search(req)
            host = ind.search(req)
            assert dev == host, req
            assert [d.name for d in dev.found_docs] == \
                [d.name for d in host.found_docs], req
        assert ex.stats["host_queries"] == 0, ex.stats
        assert ex.stats["device_queries"] >= 6, ex.stats

        # regex oracle: every served `?ather` position is a token
        # matching \w*ather\w* — and every such token (len 3..32,
        # bounded by the expansion cap) is served
        low = raw.lower()
        res = ex.search("?ather")
        got = set()
        pt = ind.pages
        for p in res.found_pages:
            pg = pt.page_ids.index(p.id)
            base = int(pt.bounds[pg - 1]) if pg > 0 else 0
            got.update(base + x for x in p.pos)
        # body coordinates start after the header page "0" (the header
        # fields occupy the doc's first coordinates, ref Build.cs:485-524)
        assert pt.page_ids[0] == "0"
        body_base = int(pt.bounds[0])
        want = {
            body_base + m.start() for m in re.finditer(r"[^\W\d_]+", low)
            if re.fullmatch(r"\w*ather\w*", m.group())
            and 3 <= len(m.group()) <= 32
        }
        assert got == want, (len(got), len(want))
    finally:
        ex.close()
        ind.dispose()
