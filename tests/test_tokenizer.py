"""Tokenizer and word-coding tests. Oracle: Python `re` positions over the
lowercased text (the same oracle style the reference tests use,
ref XUnitDocodoTest/IndexTest.cs:126-162)."""

import re

import numpy as np
import pytest

from docodo_tpu.lang.tokenizer import char_len, tokenize
from docodo_tpu.lang.wordcodes import WordCoder, from_int


def re_oracle(text):
    low = text.lower()
    # \p{L}+|\p{N}+ equivalent: letter runs / number runs via unicodedata
    out = []
    for m in re.finditer(r"[^\W\d_]+|\d+", low):
        out.append((m.group(), m.start()))
    return out


def test_simple_text():
    text = "Hello, world! This is DOCODO 2024."
    words, starts = tokenize(text)
    assert words == ["hello", "world", "this", "is", "docodo", "2024"]
    oracle = re_oracle(text)
    assert [(w, s) for w, s in zip(words, starts.tolist())] == oracle


def test_mixed_alnum_splits():
    words, starts = tokenize("abc123def")
    assert words == ["abc", "123", "def"]
    assert starts.tolist() == [0, 3, 6]


def test_russian_cp1251_content():
    text = "Война и мир. Том 1"
    words, starts = tokenize(text)
    assert words == ["война", "и", "мир", "том", "1"]
    for w, s in zip(words, starts.tolist()):
        assert text.lower()[s: s + len(w)] == w


def test_pickwick_sample_against_re():
    text = (
        "Another game, with a similar result, was followed by a revoke "
        "from the unlucky Miller; Mr. Pickwick's 42nd snuff-box!"
    )
    words, starts = tokenize(text)
    assert [(w, s) for w, s in zip(words, starts.tolist())] == re_oracle(text)


def test_astral_chars_are_utf16_aware():
    # astral char = 2 UTF-16 units, and is NOT a letter for the tokenizer
    text = "ab \U0001F600 cd"
    words, starts = tokenize(text)
    assert words == ["ab", "cd"]
    # 'cd' offset counts the emoji as two units: a,b,space,2 units,space -> 6
    assert starts.tolist() == [0, 6]
    assert char_len(text) == 8


def test_empty():
    words, starts = tokenize("")
    assert words == [] and starts.size == 0


# --- word coding -------------------------------------------------------------

class FakeVoc:
    def __init__(self, words, rng=("a", "z"), stemfn=None):
        self.words = words
        self.range = rng
        self._stem = stemfn or (lambda w: w)

    def stem(self, w):
        return self._stem(w)

    def search(self, w):
        return self.words.get(w, 0)


def test_digit_words_pass_through():
    wc = WordCoder()
    assert wc.codes("2024") == ("2024",)
    assert wc.codes("42nd") == ("42nd",)  # starts with digit


def test_stopwords_produce_no_keys():
    wc = WordCoder(stop_words={"and"})
    assert wc.codes("and") == ()


def test_vocab_group_key():
    voc = FakeVoc({"and": 1, "old": 2})
    wc = WordCoder(vocs=[voc])
    assert wc.codes("and") == ("and", "#1")
    assert wc.codes("old") == ("old", "#2")


def test_vocab_group_key_second_voc_index():
    voc2 = FakeVoc({"старый": 3}, rng=("а", "я"))
    wc = WordCoder(vocs=[None, voc2])
    assert wc.codes("старый") == ("старый", from_int((1 << 24) | 3))
    assert from_int((1 << 24) | 3) == "#1000003"


def test_unknown_word_with_voc_gets_stem_fallback():
    voc = FakeVoc({}, stemfn=lambda w: w[:-1] if w.endswith("s") else w)
    wc = WordCoder(vocs=[voc])
    assert wc.codes("cats") == ("cats", "$cat")
    assert wc.codes("cat") == ("cat",)  # stem == word: no fallback


def test_stemmer_table_only_when_no_vocs():
    wc = WordCoder()  # default table: en porter2
    assert wc.codes("laughed") == ("laughed", "$laugh")
    assert wc.codes("old") == ("old",)
    # word with chars outside every range: no stemmer applies
    assert wc.codes("ab9cd") == ("ab9cd",)


def test_russian_word_uses_ru_stemmer():
    wc = WordCoder()
    assert wc.codes("книгами") == ("книгами", "$книг")


def test_last_voc_lookup_wins_quirk():
    # voc1 knows the word, voc2's range also covers it but misses:
    # nG ends 0 -> fallback '$stem' appended (stem from FIRST voc)
    voc1 = FakeVoc({"run": 7}, stemfn=lambda w: "run")
    voc2 = FakeVoc({}, stemfn=lambda w: w)
    wc = WordCoder(vocs=[voc1, voc2])
    assert wc.codes("running") == ("running", "#7", "$run")
