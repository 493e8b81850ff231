"""Stopword lists + Unicode punctuation (parity: utils/stopwords/util.py).

The reference ships NLTK/Lucene stopword data files per language and an
enumeration of Unicode punctuation (stopwords/util.py:56-61). Here the two
standard English lists are embedded (both are public-domain standard lists)
and punctuation is enumerated from unicodedata at call time; other languages
can be registered at runtime.
"""
from __future__ import annotations

import functools
import sys
import unicodedata

# Lucene EnglishAnalyzer ENGLISH_STOP_WORDS_SET
LUCENE_ENGLISH_STOPWORDS: list[str] = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()

# NLTK english stopword corpus (standard list)
NLTK_ENGLISH_STOPWORDS: list[str] = """
i me my myself we our ours ourselves you you're you've you'll you'd your yours
yourself yourselves he him his himself she she's her hers herself it it's its
itself they them their theirs themselves what which who whom this that that'll
these those am is are was were be been being have has had having do does did
doing a an the and but if or because as until while of at by for with about
against between into through during before after above below to from up down
in out on off over under again further then once here there when where why how
all any both each few more most other some such no nor not only own same so
than too very s t can will just don don't should should've now d ll m o re ve
y ain aren aren't couldn couldn't didn didn't doesn doesn't hadn hadn't hasn
hasn't haven haven't isn isn't ma mightn mightn't mustn mustn't needn needn't
shan shan't shouldn shouldn't wasn wasn't weren weren't won won't wouldn
wouldn't
""".split()

_EXTRA_LANG_STOPWORDS: dict[str, list[str]] = {}


def register_stopwords(lang: str, words: list[str]) -> None:
    _EXTRA_LANG_STOPWORDS[lang] = words


def get_lucene_stopword_list(lang: str = "en") -> list[str]:
    if lang == "en":
        return list(LUCENE_ENGLISH_STOPWORDS)
    return list(_EXTRA_LANG_STOPWORDS.get(lang, []))


def get_nltk_stopword_list(lang: str = "en") -> list[str]:
    if lang == "en":
        return list(NLTK_ENGLISH_STOPWORDS)
    return list(_EXTRA_LANG_STOPWORDS.get(lang, []))


@functools.lru_cache(maxsize=1)
def get_unicode_punctuation_list() -> list[str]:
    """All Unicode punctuation + symbol chars (parity: stopwords/util.py:56-61)."""
    out = []
    for cp in range(sys.maxunicode + 1):
        ch = chr(cp)
        cat = unicodedata.category(ch)
        if cat.startswith("P") or cat.startswith("S"):
            out.append(ch)
    return out


def get_stopword_set(lang: str = "en", include_punctuation: bool = True) -> set[str]:
    s = set(get_lucene_stopword_list(lang)) | set(get_nltk_stopword_list(lang))
    if include_punctuation:
        s |= set(get_unicode_punctuation_list())
    return s
