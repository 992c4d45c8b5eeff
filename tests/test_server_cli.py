"""REST server and CLI surface tests (ref /server.cs, /Program.cs)."""

import json
import urllib.request

import pytest

import docodo_tpu
from docodo_tpu.server import DocodoServer
from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource


@pytest.fixture
def small_index(tmp_path):
    ind = docodo_tpu.Index(path=str(tmp_path / "idx"), in_memory=True)
    ind.add_data_source(ListDataSource("docs", [
        IndexPagedTextFile("alpha", "the pickwick club met at noon", "Name=alpha\n"),
        IndexPagedTextFile("beta", "the club adjourned after dinner", "Name=beta\n"),
    ]))
    ind.create()
    yield ind
    ind.dispose()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.read().decode("utf-8")


def test_server_search_json(small_index):
    srv = DocodoServer(small_index, port=0)
    srv.start(background=True)
    try:
        code, body = _get(srv.port, "/search?req=club")
        assert code == 200
        data = json.loads(body)
        assert data["found"] == 2
        names = {d["Name"] for d in data["result"]}
        assert names == {"docs:alpha", "docs:beta"}  # source:doc naming
        doc = data["result"][0]
        assert doc["pages"] and "pos" in doc["pages"][0]

        # quoted exact phrase -> only alpha (unquoted AND at dist=255
        # would chain across these tiny adjacent docs — global coords)
        code, body = _get(srv.port, "/search?req=%22pickwick%20club%22")
        assert json.loads(body)["found"] == 1

        code, body = _get(srv.port, "/suggest?req=pick")
        assert json.loads(body) == ["wick"]

        code, body = _get(srv.port, "/status")
        st = json.loads(body)
        assert st["canSearch"] is True and st["words"] > 0

        code, body = _get(srv.port, "/")
        assert "DOCODO" in body
    finally:
        srv.stop()


def test_cli_noninteractive(tmp_path, monkeypatch, capsys):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "a.txt").write_text("interactive pickwick text")
    from docodo_tpu import cli

    inputs = iter(["I", "S", "pickwick", "e", "E"])
    monkeypatch.setattr("builtins.input", lambda: next(inputs))
    rc = cli.main([
        f"-i:{tmp_path / 'idx'}",
        f"-source:files,{corpus}/",
        f"-dict:{tmp_path / 'nodict'}",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Found 1 pages in 1 docs" in out
    assert "a.txt" in out


def test_cli_live_suggestions_per_keystroke(small_index):
    """read_search_request renders completions on EVERY keystroke, under
    the input line (ref Program.cs:268-307): after typing 'pick' the
    dimmed suggestion line must already show 'pickwick', before Enter."""
    from docodo_tpu import cli

    keys = iter(list("pick") + ["\t", "\n"])
    frames = []

    req = cli.read_search_request(
        small_index, getch=lambda: next(keys),
        write=frames.append, is_tty=True,
    )
    # Tab accepted the first completion of 'pick' -> 'pickwick'
    assert req == "pickwick"
    live = [f for f in frames if "req:pick\n" in f]
    assert live and any("pickwick" in f for f in live), frames
    # suggestions rendered BELOW the input line, dimmed, cursor restored
    assert all("\x1b[2m" in f and "\x1b[A" in f for f in live)


def test_cli_backspace_and_empty(small_index):
    from docodo_tpu import cli

    keys = iter(["c", "l", "x", "\x7f", "u", "b", "\n"])
    req = cli.read_search_request(
        small_index, getch=lambda: next(keys),
        write=lambda s: None, is_tty=True,
    )
    assert req == "club"


def test_server_error_returns_502(small_index, monkeypatch):
    """Handler exceptions surface as a 502 response (ref server.cs:96-99)
    instead of a dropped connection."""
    import urllib.error

    srv = DocodoServer(small_index, port=0)
    srv.start(background=True)
    try:
        def boom(req, opt=None):
            raise RuntimeError("injected")

        monkeypatch.setattr(small_index, "search", boom)
        try:
            _get(srv.port, "/search?req=club")
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 502
            assert "injected" in e.read().decode()
    finally:
        srv.stop()
