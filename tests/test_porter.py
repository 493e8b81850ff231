"""Porter stemmer unit tests.

Expected values are FULL-algorithm outputs (all steps applied), matching
Lucene's PorterStemFilter / the official Porter voc.txt→output.txt pairs —
not the paper's per-step examples (e.g. step 2 alone maps relational→relate,
but step 4 then strips -ate, so the full output is "relat").
"""
from lightretriever_tpu.retriever.sparse_scorer import (
    lucene_analyze,
    lucene_analyze_nostem,
)
from lightretriever_tpu.utils.porter import porter_stem

FULL_RUN_VECTORS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat",
    # step 1b (+cleanup)
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # steps 2-4 chains
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "digitizer": "digit", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # retrieval-domain sanity
    "retrieval": "retriev", "retrieving": "retriev", "retrieved": "retriev",
    "searches": "search", "searching": "search", "documents": "document",
    "running": "run", "indexes": "index",
}


def test_porter_full_run_vectors():
    bad = {w: (porter_stem(w), want)
           for w, want in FULL_RUN_VECTORS.items() if porter_stem(w) != want}
    assert not bad, bad


def test_porter_short_words_unchanged():
    for w in ("a", "is", "by", "go"):
        assert porter_stem(w) == w


def test_lucene_analyze_stems_by_default():
    assert lucene_analyze("retrieving documents by searching indexes") == [
        "retriev", "document", "search", "index"]


def test_lucene_analyze_nostem_ablation():
    assert lucene_analyze_nostem("retrieving documents") == [
        "retrieving", "documents"]


def test_stemming_conflates_query_and_doc_forms():
    # The practical win: "searching" (query) now matches "searched" (doc).
    assert porter_stem("searching") == porter_stem("searched")
    assert porter_stem("retrieval") == porter_stem("retrieving")
