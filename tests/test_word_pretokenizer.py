"""ICU word segmentation + multilingual stopwords (VERDICT round-1 #6).

The reference delegates word segmentation to a Rust ICU4X tokenizer
(utils/data_utils.py:283-298) which is not installed here, so the oracle is
known-good ICU segmentations of scriptio-continua scripts (Thai has no
spaces — only a dictionary segmenter can split it) rather than a live
reference run.
"""
import pytest

from lightretriever_tpu.utils.stopwords import (
    get_lucene_stopword_list,
    get_lucene_stopwords,
    get_nltk_stopword_list,
    get_nltk_stopwords,
    get_stopword_set,
)
from lightretriever_tpu.utils.word_pretokenizer import (
    WordPreTokenizer,
    get_word_pretokenizer,
)


def _icu_or_skip():
    try:
        from lightretriever_tpu.utils.word_pretokenizer import ICUWordPreTokenizer

        return ICUWordPreTokenizer()
    except Exception:
        pytest.skip("ICU runtime unavailable")


def test_icu_thai_dictionary_segmentation():
    t = _icu_or_skip()
    # "hello" + polite particle: no whitespace in the input, so only a
    # dictionary-based segmenter can find this boundary.
    assert t.tokenize("สวัสดีครับ", remove_stopwords=False) == ["สวัสดี", "ครับ"]


def test_icu_chinese_dictionary_words():
    t = _icu_or_skip()
    words = t.tokenize("我爱北京天安门", remove_stopwords=False)
    # ICU's frequency dictionary yields multi-char words, not per-char splits
    assert "北京" in words and "天安门" in words


def test_icu_drops_punctuation_and_whitespace():
    t = _icu_or_skip()
    assert t.tokenize("Hello, world! 123", remove_stopwords=False) == \
        ["Hello", "world", "123"]


def test_icu_stopword_removal_matches_regex_on_english():
    icu = _icu_or_skip()
    regex = WordPreTokenizer()
    text = "The quick brown fox jumps over the lazy dog"
    assert icu.tokenize(text) == regex.tokenize(text)


def test_icu_batch_call():
    t = _icu_or_skip()
    out = t(["a quick test", "สวัสดีครับ"], remove_stopwords=False)
    assert out == [["a", "quick", "test"], ["สวัสดี", "ครับ"]]


def test_factory_prefers_icu_with_fallback():
    t = get_word_pretokenizer()
    # whatever backend we got, the interface contract holds
    assert t.tokenize("hello the world") == ["hello", "world"]


def test_multilingual_stopword_coverage():
    lucene = get_lucene_stopwords()
    nltk = get_nltk_stopwords()
    # the reference ships 26 lucene + 29 nltk language files
    assert len(lucene) >= 26, sorted(lucene)
    assert len(nltk) >= 29, sorted(nltk)
    # spot-check canonical members
    assert "the" in lucene["en"] and "ve" in lucene["tr"]
    assert "und" in nltk["german"] and "и" in nltk["russian"]
    assert "的" in nltk["chinese"] and "ใน" in lucene["th"]


def test_stopword_union_semantics():
    # default set = union over all languages + punctuation, matching the
    # reference's get_icu_word_pretokenizer stopword construction
    s = get_stopword_set()
    for w in ("the", "und", "и", "的", "ในいません".split()[0][:0] or "ใน"):
        assert w in s, w
    assert "," in s and "？" in s
    # per-language accessors stay narrow
    assert "und" not in get_stopword_set("en")


def test_per_language_lists_accessible_by_iso_code():
    assert "le" in get_nltk_stopword_list("fr")
    assert "من" in get_lucene_stopword_list("ar")
    assert get_lucene_stopword_list("xx") == []


def test_multilingual_stopwords_filter_in_tokenizer():
    t = get_word_pretokenizer()
    # German stopwords removed even though text language is not declared
    words = t.tokenize("und der Hund läuft")
    assert "und" not in words and "der" not in words
    assert any("Hund" == w for w in words)


# --- multilingual prompt registry (VERDICT #6 / reference utils/prompts.py:31-50) ---

def test_multilingual_marco_prompt_keys():
    from lightretriever_tpu.utils.prompts import E5_INSTRUCTIONS, get_prompt

    for key in ("mmarco-ar", "mmarco-de", "mmarco-es", "mmarco-fr", "mmarco-hi",
                "mmarco-id", "mmarco-it", "mmarco-ja", "mmarco-nl", "mmarco-pt",
                "mmarco-ru", "mmarco-vi", "mmarco-zh", "mmarco-en",
                "indicmarco-bn", "indicmarco-te", "neumarco-fa", "marco-ko"):
        assert key in E5_INSTRUCTIONS, key
        p = get_prompt("e5", key)
        assert p.startswith("Instruct: ") and p.endswith("\nQuery: ")
    # non-English entries are written in the query language, not English
    assert "检索" in get_prompt("e5", "mmarco-zh")
    assert "Websuchanfrage" in get_prompt("e5", "mmarco-de")


def test_mteb_multilingual_task_families():
    from lightretriever_tpu.utils.prompts import get_mteb_prompt

    for task in ("MIRACLRetrieval-th", "MKQA-zh_cn", "T2Retrieval",
                 "EcomRetrieval", "CovidRetrieval"):
        assert get_mteb_prompt("e5", task).startswith("Instruct: ")


def test_mteb_prompt_pair_parity():
    from lightretriever_tpu.utils.prompts import get_mteb_prompt_pair

    assert get_mteb_prompt_pair("MSMARCO", "Retrieval", "e5_ori") == \
        ("query: ", "passage: ")
    assert get_mteb_prompt_pair("STSBenchmark", "STS", "e5_ori") == \
        ("query: ", "query: ")
    qp, cp = get_mteb_prompt_pair("MSMARCO", "Retrieval", "e5")
    assert qp.startswith("Instruct: ") and cp == ""
    qp, cp = get_mteb_prompt_pair("NFCorpus", "Retrieval",
                                  "llm2vec-e5-Meta-Llama-3-8B-Instruct")
    assert qp.startswith("<|start_header_id|>user<|end_header_id|>")
    assert cp == "<|start_header_id|>user<|end_header_id|>\n\n"
    assert get_mteb_prompt_pair("X", "Retrieval", "bge-zh")[0] == \
        "为这个句子生成表示以用于检索相关文章："
