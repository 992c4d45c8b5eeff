"""Native C++ host pipeline: bit-parity with the Python reference paths."""

import numpy as np
import pytest

from docodo_tpu.core import varint
from docodo_tpu.lang.tokenizer import tokenize
from docodo_tpu.native import available
from docodo_tpu.native import pipeline as npipe

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable (no g++?)"
)

SAMPLE = (
    "The QUICK brown fox; Пьер Безухов шёл 1812 годом к Наташе!  "
    "mixed CaSe words, caffè città, x y zz abc"
)


def test_tokenize_intern_matches_python():
    it = npipe.make_interner()
    ids, starts = npipe.tokenize_intern(SAMPLE, it)
    words, pstarts = tokenize(SAMPLE)
    d = {}
    pids, pst = [], []
    for w, s in zip(words, pstarts.tolist()):
        if 3 <= len(w) <= 32:
            pids.append(d.setdefault(w, len(d)))
            pst.append(s)
    np.testing.assert_array_equal(ids, pids)
    np.testing.assert_array_equal(starts, pst)
    assert it.terms() == list(d)


def test_interner_incremental_across_docs():
    it = npipe.make_interner()
    ids1, _ = npipe.tokenize_intern("alpha beta gamma", it)
    ids2, _ = npipe.tokenize_intern("beta delta alpha", it)
    assert it.terms() == ["alpha", "beta", "gamma", "delta"]
    np.testing.assert_array_equal(ids1, [0, 1, 2])
    np.testing.assert_array_equal(ids2, [1, 3, 0])


def _word(i: int) -> str:
    out = []
    for _ in range(5):  # base-26 letters only (digits would split the token)
        out.append(chr(ord("a") + i % 26))
        i //= 26
    return "".join(out)


def test_interner_many_terms_rehash():
    it = npipe.make_interner()
    text = " ".join(_word(i) for i in range(50_000))
    ids, _ = npipe.tokenize_intern(text, it)
    assert len(it) == 50_000
    assert ids.tolist() == list(range(50_000))
    # repeat: same ids back
    ids2, _ = npipe.tokenize_intern(text, it)
    assert np.array_equal(ids, ids2)


def test_varint_roundtrip_parity(rng):
    deltas = rng.integers(0, 1 << 40, size=5000, dtype=np.uint64)
    coords = np.cumsum(deltas, dtype=np.uint64)
    enc_native = npipe.varint_encode(coords)
    np.testing.assert_array_equal(enc_native, varint.encode(coords))
    np.testing.assert_array_equal(npipe.varint_decode(enc_native), coords)


def test_parallel_tokenize_intern_matches_serial():
    texts = [
        "alpha beta gamma delta words",
        "beta epsilon alpha zeta words",
        "gamma eta theta words beta",
        "delta iota alpha kappa words",
    ] * 3
    ids_p, starts_p, terms_p = npipe.parallel_tokenize_intern(texts, workers=3)
    it = npipe.make_interner()
    serial = [npipe.tokenize_intern(t, it) for t in texts]
    # same tokens per doc, same starts; term ids map through dictionaries
    t_ser = it.terms()
    for (pi, ps), (si, ss) in zip(zip(ids_p, starts_p), serial):
        np.testing.assert_array_equal(ps, ss)
        assert [terms_p[k] for k in pi] == [t_ser[k] for k in si]
    assert sorted(terms_p) == sorted(t_ser)


def test_tokenize_intern_packed_matches_numpy_pack():
    """The C packed emitter reproduces pack_tokens(tokenize_intern(...))
    bit-for-bit, including escape rows across long token gaps."""
    from docodo_tpu.ops.device_index import pack_tokens

    text = ("The Pickwick Papers, " * 50
            + " " * 9000                       # > 2 escape rows of gap
            + "posthumous papers of the club " * 30)
    i1 = npipe.make_interner()
    ids, starts = npipe.tokenize_intern(text, i1)
    want = pack_tokens(ids, starts)
    i2 = npipe.make_interner()
    got = npipe.tokenize_intern_packed(text, i2)
    np.testing.assert_array_equal(got, want)
    i1.close()
    i2.close()


def test_split_packed_equals_pack_tokens_split():
    """split_packed (escape-prefix splitting of an already-packed
    stream) rebuilds the same absolute coordinates as packing token
    slices directly."""
    import jax.numpy as jnp

    from docodo_tpu.ops import device_index as di

    rng = np.random.default_rng(5)
    n, T = 3000, 200
    ids = rng.integers(0, T, size=n).astype(np.int32)
    starts = np.cumsum(rng.integers(1, 60, size=n)).astype(np.int64)
    packed = di.pack_tokens(ids, starts)
    parts = di.split_packed(packed, 1024)
    assert len(parts) > 1 and all(p.size <= 1024 for p in parts)
    got = []
    for p in parts:
        pt = np.full(1024, di.PACK_PAD_ROW, dtype=np.uint32)
        pt[: p.size] = p
        st, sc, off = di.build_postings_packed(jnp.asarray(pt),
                                               num_terms=T)
        got.append(np.sort(np.asarray(sc)[: int(off[T])]))
    np.testing.assert_array_equal(
        np.sort(np.concatenate(got)), np.sort(starts)
    )


def test_tokenize_intern_packed_python_fallback():
    """tokenize_intern_packed's non-native path (pure-Python interner)
    equals pack_tokens over the unpacked outputs."""
    from docodo_tpu.native.pipeline import _PyInterner
    from docodo_tpu.ops.device_index import pack_tokens

    text = "alpha beta gamma " * 40 + " " * 5000 + "delta epsilon " * 20
    i1, i2 = _PyInterner(), _PyInterner()
    ids, starts = npipe.tokenize_intern(text, i1)
    got = npipe.tokenize_intern_packed(text, i2)
    np.testing.assert_array_equal(got, pack_tokens(ids, starts))
