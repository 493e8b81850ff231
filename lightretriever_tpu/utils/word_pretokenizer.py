"""Unicode word pre-tokenizer with stopword removal.

Replacement of the reference's Rust ``ICUWordPreTokenizer`` (ICU4X word
segmentation + stopword filtering; reference: utils/data_utils.py:283-298).
This Python implementation uses Unicode-category segmentation via regex:
alphanumeric runs form words, CJK ideographs split per character (the
behavior ICU's dictionary segmenter approximates for retrieval purposes).
A faster native implementation can be slotted in behind the same interface.
"""
from __future__ import annotations

import re
from typing import Iterable, Optional

from .stopwords import get_stopword_set

# Words: runs of letters/digits/underscore-free alnum; CJK: single ideographs
_WORD_RE = re.compile(
    r"[一-鿿㐀-䶿豈-﫿]"   # CJK ideograph -> one "word"
    r"|[぀-ヿ]+"                            # kana runs
    r"|[가-힯]+"                            # hangul runs
    r"|[^\W_]+",                                    # general unicode word chars
    re.UNICODE,
)


class WordPreTokenizer:
    """Callable word segmenter (interface parity: ICUWordPreTokenizer).

    ``tokenizer(texts, remove_stopwords=True)`` -> list of word lists,
    whitespace and punctuation removed.
    """

    def __init__(self, stopwords: Optional[set[str]] = None):
        self.stopwords = stopwords if stopwords is not None else get_stopword_set()

    def tokenize(self, text: str, remove_stopwords: bool = True) -> list[str]:
        words = _WORD_RE.findall(text)
        if remove_stopwords:
            sw = self.stopwords
            words = [w for w in words if w.lower() not in sw]
        return words

    def __call__(
        self, texts: str | Iterable[str], remove_stopwords: bool = True
    ) -> list[list[str]] | list[str]:
        if isinstance(texts, str):
            return self.tokenize(texts, remove_stopwords)
        return [self.tokenize(t, remove_stopwords) for t in texts]


def get_word_pretokenizer() -> WordPreTokenizer:
    """Parity: get_icu_word_pretokenizer (data_utils.py:283-298) — stopwords =
    Lucene list + NLTK list + Unicode punctuation."""
    return WordPreTokenizer()
