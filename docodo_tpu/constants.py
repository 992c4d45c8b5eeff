"""Engine-wide constants.

Values mirror the reference engine's capacity knobs so that result sets,
caps and key prefixes are behavior-compatible (ref: Docodo.NET/Index.cs:96-115).
"""

MAX_WORD_LENGTH = 32          # maximum word length indexed (ref Index.cs:97)
MIN_WORD_LENGTH = 3           # minimum word length indexed (ref Index.cs:113)
MAX_FILE_SIZE = 200_000_000   # maximum indexable text file size (ref Index.cs:98)
MAX_FOUND_PAGES = 30_000      # maximum output found pages (ref Index.cs:101)
MAX_FOUND_DOCS = 500          # maximum output found docs (ref Index.cs:102)
MAX_FOUND_PAGE_TEXT = 320     # snippet display length (ref Index.cs:103)
MAX_FOUND_PAGES_IN_DOC = 1000 # ref Index.cs:104
DOC_RANK_MULTIPLY = 10.0      # rank boost when found in header page "0" (ref Index.cs:115)
MAX_TMP_INDEX_ITEMS = 1_000_001  # in-RAM postings before spill (ref Index.cs:96)
MAX_LIKE_WORDS = 100          # wildcard expansion cap (ref Search.cs:158)

# key prefixes in the term dictionary (ref Index.cs:105-112)
WORD_SUFFIX_CHAR = "$"        # prefix of stem-fallback keys
WORD_STEM_CHAR = "$"
SUFFIX_DEVIDER_CHAR = ":"
DOC_SEP = ":"                 # document-name-from-source separator in the page list
KNOWN_WORD_CHAR = "#"         # prefix of vocab-group keys (#HEX)
FIELD_NAME_CHAR = "&"         # prefix of header-field-name keys

# snippet highlight markers (ref Search.cs:26-27)
BEGIN_MATCHED_SYMBOL = "ˋ"  # ˋ
END_MATCHED_SYMBOL = "ˊ"    # ˊ

# vocab group flags (ref Dict.cs:15-16)
GROUP_NOT_EXACT_WORD_MASK = 0x01000000
GROUP_NUMBER_MASK = 0x00FFFFFF

# text-file pagination (ref DataSources.cs:308)
PAGE_SIZE = 3000

DEFAULT_SEARCH_DIST = 255     # default proximity window (ref Search.cs:472)
