"""Word -> index-key coding.

Behavioral match of the reference's GetWordCodes fold (ref
Docodo.NET/Build.cs:175-247), including its quirks:

* a word starting with an ASCII digit maps to itself only;
* stop words map to no keys at all;
* the full form is always a key; every vocab whose first-letter range
  covers the word and knows its stem contributes a '#HEX' group key
  (hex of (voc_index << 24) | (group & 0xFFFFFF), uppercase, no padding);
* `nG` carries the LAST evaluated vocab lookup: if a later vocab's range
  matches but lookup misses, the word is treated as unknown and gets the
  '$stem' fallback key (stem from the FIRST vocab iteration);
* the stemmer table is consulted only when NO vocabs are loaded, choosing
  the first stemmer whose character range covers the whole word.

Codes are cached per unique word — the device build pipeline only calls
this once per distinct token.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Sequence, Tuple

from docodo_tpu.constants import GROUP_NUMBER_MASK, KNOWN_WORD_CHAR, WORD_STEM_CHAR
from docodo_tpu.lang import stemmers


def from_int(i: int) -> str:
    """'#' + uppercase hex, no leading zeros (ref Index.cs:196)."""
    return KNOWN_WORD_CHAR + format(i, "X")


class WordCoder:
    def __init__(
        self,
        vocs: Sequence = (),
        stop_words: Optional[set] = None,
        stemmer_table: Optional[Sequence] = None,
    ):
        self.vocs = list(vocs)
        self.stop_words = stop_words if stop_words is not None else set()
        table = (
            stemmer_table if stemmer_table is not None else stemmers.KNOWN_STEMMERS
        )
        self.stemmer_table = [
            (lang, fn, re.compile(f"[^{rng}]")) for lang, fn, rng in table
        ]
        # the ASCII fast path in prime() is derived from the DEFAULT
        # table's order/ranges; custom tables take the regex loop
        self._is_default_table = list(table) == list(stemmers.KNOWN_STEMMERS)
        self._cache: dict[str, Tuple[str, ...]] = {}

    def clear_cache(self) -> None:
        self._cache.clear()

    def codes(self, word: str) -> Tuple[str, ...]:
        """Index keys for a (lowercase) word. Empty tuple = stop word."""
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        out = self._codes_uncached(word)
        if len(self._cache) < 1_000_000:
            self._cache[word] = out
        return out

    def prime(self, words: Iterable[str]) -> None:
        """Bulk-populate the codes cache for NEW words: the English
        stems run as ONE native call (stemmers.stem_en_bulk) instead of
        one per word — the per-word ctypes round trip dominated the
        facade build's word-coding phase. Only the no-vocab stemmer-
        table path batches; everything else falls through to the normal
        per-word logic (and vocab stems are dict lookups anyway)."""
        todo = [
            w for w in words
            if w and w not in self._cache
            and not ("0" <= w[0] <= "9") and w not in self.stop_words
        ]
        if not todo:
            return
        if self.vocs:
            # vocab path: the heavy per-word cost is voc.stem (the
            # language Snowball) inside _codes_uncached — pre-fill each
            # voc's stem cache with ONE native bulk call; the rest of
            # the coding (group search, key assembly) stays per word
            for voc in self.vocs:
                if voc is not None:
                    voc.prime_stems(todo)
            return
        fns = []
        en_words = []
        ru_words = []
        # fast path: a pure-ASCII lowercase-alpha word is all [a-z]; the
        # table's only range it can match is "en" (digit-start excluded
        # above, "ru" needs Cyrillic, "de"/"fr" come after "en"). Any
        # other ASCII word matches no range at all. str.isascii/isalpha
        # are C-speed vs 4 regex searches per word.
        default_table = self._is_default_table
        for w in todo:
            if default_table and w.isascii():
                fn = (
                    stemmers.stem_en
                    if w.isalpha() and w.islower() else None
                )
            else:
                fn = None
                for _lang, f, neg_re in self.stemmer_table:
                    if not neg_re.search(w):
                        fn = f
                        break
            fns.append(fn)
            if fn is stemmers.stem_en:
                en_words.append(w)
            elif fn is stemmers.stem_ru:
                ru_words.append(w)
        stems = dict(zip(en_words, stemmers.stem_en_bulk(en_words)))
        stems.update(zip(ru_words, stemmers.stem_ru_bulk(ru_words)))
        if len(self._cache) + len(todo) > 1_000_000:
            return
        for w, fn in zip(todo, fns):
            if fn is stemmers.stem_en or fn is stemmers.stem_ru:
                stemmed = stems[w]
            elif fn is not None:
                stemmed = fn(w)
            else:
                stemmed = w
            if stemmed and stemmed != w:
                self._cache[w] = (w, WORD_STEM_CHAR + stemmed)
            else:
                self._cache[w] = (w,)

    def _codes_uncached(self, word: str) -> Tuple[str, ...]:
        if not word:
            return ()
        if "0" <= word[0] <= "9":
            return (word,)
        if word in self.stop_words:
            return ()
        keys: List[str] = [word]
        stemmed = word
        first_stemmed = ""
        n_g = 0
        for n_voc, voc in enumerate(self.vocs):
            if (
                voc is not None
                and voc.range[0] <= word[0] <= voc.range[1]
            ):
                stemmed = voc.stem(word)
                n_g = voc.search(stemmed)
                if n_g != 0:
                    keys.append(from_int((n_voc << 24) | (n_g & GROUP_NUMBER_MASK)))
            if not first_stemmed:
                first_stemmed = stemmed
        if n_g == 0:
            stemmed = first_stemmed
            if not self.vocs:
                for _lang, fn, neg_re in self.stemmer_table:
                    if not neg_re.search(word):
                        if fn is not None:
                            stemmed = fn(word)
                        break
            if stemmed and stemmed != word:
                keys.append(WORD_STEM_CHAR + stemmed)
        return tuple(keys)
