"""Test fixtures mirroring the reference's in-memory data sources
(ref XUnitDocodoTest/IndexTest.cs:19-124)."""

import threading

from docodo_tpu.sources.base import IndexPage, IndexPagedTextFile

TEST_TEXT_1 = (
    "Another game, with a similar result, was followed by a revoke from the unlucky Miller;"
    " on which the fat gentleman burst into a state of high personal excitement which lasted until the conclusion of the game, when he retired into a corner, and remained perfectly mute for one hour and twentyseven minutes; "
    "at the end of which time he emerged from his retirement, and offered Mr. Pickwick a pinch of snuff with the air of a man who had made up his mind to a Christian forgiveness of injuries sustained. "
    "The old lady's hearing decidedly improved and the unlucky Miller felt as much out of his element as a dolphin in a sentrybox. "
    "Meanwhile the round game proceeded right merrily.Isabella Wardle and Mr.Trundle went partners, and Emily Wardle and Mr.Snodgrass did the same; "
    "and even Mr.Tupman and the spinster aunt established a jointstock company of fish and flattery.Old Mr.Wardle was in the very height of his jollity; "
    "and he was so funny in his management of the board, and the old ladies were so sharp after their winnings, that the whole table was in a perpetual roar "
    "of merriment and laughter.There was one old lady who always had about half a dozen cards to pay for, at which everybody laughed, regularly every round; "
    "and when the old lady looked cross at having to pay, they laughed louder than ever; on which the old lady's face gradually brightened up, "
    "till at last she laughed louder than any of them, Then, when the spinster aunt got matrimony, the young ladies laughed afresh, and the "
    "Spinster aunt seemed disposed to be pettish; till, feeling Mr.Tupman squeezing her hand under the table, she brightened up too, and looked rather knowing,"
    " as if matrimony in reality were not quite so far off as some people thought for; whereupon everybody laughed again, and especially old Mr.Wardle, "
    "who enjoyed a joke as much as the youngest.As to Mr. Snodgrass, he did nothing but whisper poetical sentiments into his partners ear, which made one "
    "old gentleman facetiously sly, about partnerships at cards and partnerships for life, and caused the aforesaid old gentleman to make some remarks thereupon,"
    " accompanied with divers winks and chuckles, which made the company very merry and the old gentlemans wife especially so. "
    "And Mr. Winkle came out with jokes which are very well known in town, but are not all known in the country; and as everybody laughed at them very "
    "heartily, and said they were very capital, Mr.Winkle was in a state of great honour and glory.And the benevolent clergyman looked pleasantly on; for "
    "the happy faces which surrounded the table made the good old man feel happy too; "
    "and though the merriment was rather boisterous, still it came from the heart and not from the lips; and this is the right sort of merriment, after all."
)
TEST_HEADERS_1 = "Size=190\nSource=Test\nTitle=Charles Diskense Pickwick Club\n"


class SamePageDataSource:
    """One document of repeated pages (the reference fixture re-appends the
    header page, ref IndexTest.cs:41-56 — matched exactly)."""

    __test__ = False

    def __init__(self, n_pages):
        self.name = "Test"
        self.path = "Test"
        self.pages = [IndexPage("0", "Name=Test"), IndexPage("1", TEST_TEXT_1)]
        for _ in range(n_pages - 1):
            self.pages.append(self.pages[0])
        self._has_next = True

    def reset(self):
        self._has_next = True

    def estimate(self):
        return 0.0

    def next_document(self, wait=True):
        if self._has_next:
            self._has_next = False
            return self
        return None

    def __iter__(self):
        return iter(self.pages)

    def close(self):
        pass


class TestDataSource:
    """Two documents ('Sample', 'Dump') of n_pages identical body pages."""

    __test__ = False

    def __init__(self, n_pages):
        self.name = "Test"
        self.path = "Test"
        self.n_pages = n_pages
        self._next = 0
        self._lock = threading.Lock()

    def reset(self):
        self._next = 0

    def estimate(self):
        return 0.0

    def next_document(self, wait=True):
        with self._lock:
            if self._next >= 2:
                return None
            name = "Sample" if self._next == 0 else "Dump"
            doc = IndexPagedTextFile(
                name, TEST_TEXT_1, TEST_HEADERS_1 + f"Name={name}\n"
            )
            for q in range(self.n_pages - 1):
                doc.pages.append(IndexPage(str(q + 2), TEST_TEXT_1))
            self._next += 1
            return doc

    def close(self):
        pass
