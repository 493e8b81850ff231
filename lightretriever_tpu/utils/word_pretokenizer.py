"""Unicode word pre-tokenizer with stopword removal.

Replacement of the reference's Rust ``ICUWordPreTokenizer`` (ICU4X word
segmentation + stopword filtering; reference: utils/data_utils.py:283-298).

Two implementations behind one interface:

* ``ICUWordPreTokenizer`` — the real thing: ICU4C word break iteration via
  the native wrapper (``native/icu_segmenter.cpp``), including
  dictionary-based segmentation for Thai/Lao/Khmer/Burmese and
  frequency-dictionary CJK — the same segmentation family the reference's
  ICU4X tokenizer performs.
* ``WordPreTokenizer`` — pure-Python regex fallback: alphanumeric runs form
  words, CJK ideographs split per character. Used when the native toolchain
  or the system ICU runtime is unavailable.

``get_word_pretokenizer()`` prefers ICU and falls back to regex.
"""
from __future__ import annotations

import logging
import re
from typing import Iterable, Optional

from .stopwords import get_stopword_set

logger = logging.getLogger(__name__)

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


class ICUWordPreTokenizer(WordPreTokenizer):
    """ICU4C word segmentation (dictionary-based for Thai/Lao/Khmer/CJK).

    Interface parity with the reference's Rust ``ICUWordPreTokenizer``
    (utils/data_utils.py:283-298): call with text(s), get word lists with
    whitespace/punctuation dropped and stopwords removed.
    """

    def __init__(self, stopwords: Optional[set[str]] = None, locale: str = ""):
        super().__init__(stopwords)
        from ..native import get_icu_lib

        lib = get_icu_lib()
        if lib is None:
            raise RuntimeError("ICU runtime unavailable")
        self._lib = lib
        self._seg = lib.lr_icu_open(locale.encode("utf-8"))
        if not self._seg:
            raise RuntimeError(f"ubrk_open failed for locale {locale!r}")

    def __del__(self):
        seg = getattr(self, "_seg", None)
        if seg:
            self._lib.lr_icu_close(seg)
            self._seg = None

    def tokenize(self, text: str, remove_stopwords: bool = True) -> list[str]:
        import ctypes

        raw = text.encode("utf-8")
        ptr = self._lib.lr_icu_segment(self._seg, raw, len(raw))
        if not ptr:
            return super().tokenize(text, remove_stopwords)  # regex fallback
        try:
            joined = ctypes.string_at(ptr).decode("utf-8")
        finally:
            self._lib.lr_icu_free(ptr)
        words = joined.split("\n") if joined else []
        if remove_stopwords:
            sw = self.stopwords
            words = [w for w in words if w.lower() not in sw]
        return words


def get_word_pretokenizer(prefer_icu: bool = True) -> WordPreTokenizer:
    """Parity: get_icu_word_pretokenizer (data_utils.py:283-298) — stopwords =
    Lucene list + NLTK list + Unicode punctuation. Returns the ICU-backed
    segmenter when the native wrapper + system ICU are available, else the
    regex fallback."""
    if prefer_icu:
        try:
            return ICUWordPreTokenizer()
        except Exception as e:  # toolchain or ICU runtime missing
            logger.warning("ICU pretokenizer unavailable (%s); regex fallback", e)
    return WordPreTokenizer()
