"""Multilingual stopword lists + Unicode punctuation (parity: utils/stopwords/util.py).

The reference ships per-language data files under ``stopwords/lucene/`` (26
languages) and ``stopwords/nltk/`` (29 languages) and feeds the *union* of
all languages' stopwords into the ICU word pretokenizer
(reference stopwords/util.py:18-52, data_utils.py:283-298). The same layout
lives here under ``stopwords_data/``: one file per language, one word per
line (standard public Snowball/Lucene/NLTK function-word lists). Punctuation
is enumerated from unicodedata at call time instead of being shipped as data.
"""
from __future__ import annotations

import functools
import os
import sys
import unicodedata

_DATA_DIR = os.path.join(os.path.dirname(__file__), "stopwords_data")

_EXTRA_LANG_STOPWORDS: dict[str, list[str]] = {}


def register_stopwords(lang: str, words: list[str]) -> None:
    """Register/override a runtime stopword list for ``lang``."""
    _EXTRA_LANG_STOPWORDS[lang] = words


def _read_list(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        return [ln.strip() for ln in f
                if ln.strip() and not ln.startswith("#")]


@functools.lru_cache(maxsize=2)
def _load_family(family: str) -> dict[str, list[str]]:
    """family: 'lucene' | 'nltk' -> {lang: [words]} (parity: util.py:6-44)."""
    out: dict[str, list[str]] = {}
    d = os.path.join(_DATA_DIR, family)
    if os.path.isdir(d):
        for name in sorted(os.listdir(d)):
            path = os.path.join(d, name)
            if os.path.isfile(path):
                out[os.path.splitext(name)[0]] = _read_list(path)
    return out


def get_lucene_stopwords() -> dict[str, list[str]]:
    return dict(_load_family("lucene"))


def get_nltk_stopwords() -> dict[str, list[str]]:
    return dict(_load_family("nltk"))


def get_lucene_stopword_list(lang: str | None = None) -> list[str]:
    """One language's Lucene list; None -> union over all languages
    (parity: util.py:50-52). Language keys are ISO codes (``en``, ``tr``...)."""
    fam = _load_family("lucene")
    if lang is None:
        return sorted({w for ws in fam.values() for w in ws})
    return list(fam.get(lang, _EXTRA_LANG_STOPWORDS.get(lang, [])))


_NLTK_ALIASES = {  # ISO code -> nltk corpus file name
    "en": "english", "fr": "french", "de": "german", "es": "spanish",
    "it": "italian", "pt": "portuguese", "nl": "dutch", "ru": "russian",
    "da": "danish", "no": "norwegian", "sv": "swedish", "fi": "finnish",
    "hu": "hungarian", "el": "greek", "ar": "arabic", "he": "hebrew",
    "tr": "turkish", "az": "azerbaijani", "eu": "basque", "ca": "catalan",
    "ro": "romanian", "id": "indonesian", "zh": "chinese", "kk": "kazakh",
    "ne": "nepali", "sl": "slovene", "tg": "tajik", "bn": "bengali",
}


def get_nltk_stopword_list(lang: str | None = None) -> list[str]:
    """One language's NLTK list; None -> union over all languages
    (parity: util.py:18-28). Accepts ISO codes or nltk corpus names."""
    fam = _load_family("nltk")
    if lang is None:
        return sorted({w for ws in fam.values() for w in ws})
    key = _NLTK_ALIASES.get(lang, lang)
    return list(fam.get(key, _EXTRA_LANG_STOPWORDS.get(lang, [])))


# Back-compat English constants (the round-1 API)
def __getattr__(name):
    if name == "LUCENE_ENGLISH_STOPWORDS":
        return get_lucene_stopword_list("en")
    if name == "NLTK_ENGLISH_STOPWORDS":
        return get_nltk_stopword_list("en")
    raise AttributeError(name)


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


def get_stopword_set(lang: str | None = None, include_punctuation: bool = True) -> set[str]:
    """Stopword set for the pretokenizer. ``lang=None`` (the default used by
    sparse-rep extraction) is the all-languages union, matching the
    reference's get_icu_word_pretokenizer (data_utils.py:283-298)."""
    s = set(get_lucene_stopword_list(lang)) | set(get_nltk_stopword_list(lang))
    for extra_lang, words in _EXTRA_LANG_STOPWORDS.items():
        if lang is None or lang == extra_lang:
            s |= set(words)
    if include_punctuation:
        s |= set(get_unicode_punctuation_list())
    return s
