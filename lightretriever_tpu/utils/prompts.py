"""Prompt / instruction registry for training and evaluation.

Parity with the reference's two registries (reference: utils/prompts.py:4-226
for training, eval/prompts.py:4-226 for MTEB eval): per-dataset instruction
lists rendered into an ``e5``-style prefix (``Instruct: {}\nQuery: ``),
``instructor`` style (instruction embedded, passage-side too), ``bge`` style
(fixed query prefix for retrieval tasks), or reranker format.

The registry is data: entries cover the common BEIR/MTEB retrieval tasks and
the standard training mixtures; unknown tasks fall back to a generic web
search instruction (matching the reference's e5 default behavior for
retrieval-style tasks). Users extend via :func:`register_prompt`.
"""
from __future__ import annotations

from random import Random
from typing import Optional

DEFAULT_RETRIEVAL_INSTRUCTION = "Given a web search query, retrieve relevant passages that answer the query"

# Training-side instruction registry (e5 format), keyed by dataset/domain name.
E5_INSTRUCTIONS: dict[str, list[str]] = {
    "": [""],
    "msmarco_passage": ["Given a web search query, retrieve relevant passages that answer the query"],
    "msmarco_document": ["Given a web search query, retrieve relevant documents that answer the query"],
    "nq": ["Given a question, retrieve Wikipedia passages that answer the question"],
    "trivia_qa": ["Retrieve Wikipedia passages that answer the question"],
    "squad": ["Retrieve Wikipedia passages that answer the question"],
    "hotpot_qa": ["Given a multi-hop question, retrieve documents that can help answer the question"],
    "fever": ["Given a claim, retrieve documents that support or refute the claim"],
    "eli5": ["Provided a user question, retrieve the highest voted answers on Reddit ELI5 forum"],
    "fiqa": ["Given a financial question, retrieve user replies that best answer the question"],
    "scifact": ["Given a scientific claim, retrieve documents that support or refute the claim"],
    "nfcorpus": ["Given a question, retrieve relevant documents that best answer the question"],
    "arguana": ["Given a claim, find documents that refute the claim"],
    "scidocs": ["Given a scientific paper title, retrieve paper abstracts that are cited by the given paper"],
    "quora": ["Given a question, retrieve questions that are semantically equivalent to the given question"],
    "dbpedia": ["Given a query, retrieve relevant entity descriptions from DBPedia"],
    "webis_touche2020": ["Given a question, retrieve detailed and persuasive arguments that answer the question"],
    "climate_fever": ["Given a claim about climate change, retrieve documents that support or refute the claim"],
    "cqadupstack": ["Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question"],
    "trec_covid": ["Given a query on COVID-19, retrieve documents that answer the query"],
    "natural_questions": ["Given a question, retrieve Wikipedia passages that answer the question"],
    "mr_tydi": ["Given a question, retrieve Wikipedia passages that answer the question"],
    "miracl": ["Given a question, retrieve Wikipedia passages that answer the question"],
    "nli": ["Given a premise, retrieve a hypothesis that is entailed by the premise",
            "Retrieve semantically similar text"],
    "sts": ["Retrieve semantically similar text"],
    # Additional training mixtures (e5-family instruction set)
    "dureader": ["Given a Chinese search query, retrieve web passages that answer the question"],
    "t2ranking": ["Given a Chinese search query, retrieve web passages that answer the question"],
    "mmarco": ["Given a web search query, retrieve relevant passages that answer the query"],
    "squad_v2": ["Retrieve Wikipedia passages that answer the question"],
    "natural_language_inference": ["Given a premise, retrieve a hypothesis that is entailed by the premise"],
    "amazon_reviews": ["Given a title, retrieve reviews that discuss the same product"],
    "amazon_qa": ["Given a question about a product, retrieve answers from other users"],
    "gooaq": ["Given a web search query, retrieve the best answering passage"],
    "yahoo_answers": ["Given a question, retrieve the most helpful answers"],
    "stackexchange": ["Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question"],
    "stackexchange_qa": ["Given a question posted on Stackexchange, retrieve answers that solve it"],
    "wikihow": ["Given a summary, retrieve the corresponding article"],
    "simple_wiki": ["Retrieve semantically similar text"],
    "altlex": ["Retrieve semantically similar text"],
    "specter": ["Given a scientific paper title, retrieve paper abstracts that are cited by the given paper"],
    "s2orc": ["Given a paper title, retrieve the paper's abstract"],
    "codesearchnet": ["Given a code comment, retrieve the implementing code"],
    "xsum": ["Given a news summary, retrieve the source article"],
    "cnn_dailymail": ["Given highlights of a news story, retrieve the article"],
    "sentence_compression": ["Retrieve semantically similar text"],
    "paq": ["Given a question, retrieve Wikipedia passages that answer the question"],
    "ccnews": ["Given a news title, retrieve the article body"],
    "npr": ["Given a news title, retrieve the article body"],
    "agnews": ["Given a news title, retrieve the article body"],
    "quora_duplicates": ["Given a question, retrieve questions that are semantically equivalent to the given question"],
    "wikianswers": ["Retrieve duplicate questions from the WikiAnswers forum"],
    "reddit": ["Given a post title, retrieve the post body"],
    "medi": ["Judge whether the media content is relevant"],
    # Clustering / classification style tasks (trained with only_hn masking)
    "clustering_arxiv": ["Judge whether the passage is relevant to the cluster"],
    "clustering_biorxiv": ["Judge whether the passage is relevant to the cluster"],
    "clustering_medrxiv": ["Judge whether the passage is relevant to the cluster"],
    "classification_amazon_polarity": ["Classify the sentiment of the review"],
    "classification_emotion": ["Classify the emotion expressed in the text"],
    "AllArxiv_clustering": ["Identify the category of the given scientific paper"],
    "All_classification": ["Classify the given text into its category"],
    # Remaining reference training-mixture keys (utils/prompts.py:4-205)
    "AllNLI": ["Given a premise, retrieve a hypothesis that is entailed by the premise",
               "Retrieve semantically similar text."],
    "MKQA": ["Given a question, retrieve Wikipedia passages that answer the question"],
    "MLDR": ["Given a question, retrieve documents that answer the question",
             "Retrieve documents that answer the question"],
    "PAQ_pairs": ["Given a question, retrieve Wikipedia passages that answer the question"],
    "PAQ_pairs_100k": ["Given a question, retrieve Wikipedia passages that answer the question"],
    "S2ORC_title_abstract": ["Given a title, retrieve the abstract from scientific papers"],
    "S2ORC_title_abstract_100k": ["Given a title, retrieve the abstract from scientific papers"],
    "SimpleWiki": ["Retrieve semantically similar text"],
    "WikiAnswers": ["Retrieve duplicate questions from the WikiAnswers forum"],
    "WikiAnswers_100k": ["Retrieve duplicate questions from the WikiAnswers forum"],
    "amazon-qa": ["Given a question, retrieve an Amazon answer that solves the question"],
    "amazon_review_2018": ["Given a title, retrieve the corresponding reviews from Amazon"],
    "amazon_review_2018_1m": ["Given a title, retrieve the corresponding reviews from Amazon"],
    "cMedQA2": ["Given a Chinese community medical question, retrieve replies that best answer the question"],
    "ccnews_title_text": ["Given a news title, retrieve articles that match the title"],
    "cnn_dailymail_splitted": ["Given a news article, retrieve its highlight sentences"],
    "coco_captions": ["Given a caption, retrieve a caption that describes the same image"],
    "flickr30k_captions": ["Given a caption, retrieve a caption that describes the same image"],
    "eli5_question_answer": ["Provided a user question, retrieve the highest voted answers on Reddit ELI5 forum"],
    "gooaq_pairs": ["Given a web search query, retrieve the corresponding answers from Google"],
    "medmcqa": ["Given a medical question, retrieve passages that answer the question"],
    "mr_tydi_combined": ["Given a question, retrieve Wikipedia passages that answer the question"],
    "others": ["Given a web search query, retrieve relevant passages that answer the query"],
    "quora_duplicates_triplets": ["Given a question, retrieve questions that are semantically equivalent to the given question"],
    "searchQA_top5_snippets": ["Given a question, retrieve the top answer snippets from a search engine"],
    "sentence-compression": ["Retrieve semantically similar text"],
    "specter_train_triples": ["Given a scientific paper title, retrieve paper abstracts that are cited by the given paper"],
    "squad_pairs": ["Retrieve Wikipedia passages that answer the question"],
    "stackexchange_duplicate_questions_body_body": ["Retrieve duplicate question bodies from StackExchange"],
    "stackexchange_duplicate_questions_title-body_title-body": ["Retrieve duplicate questions from StackExchange"],
    "stackexchange_duplicate_questions_title_title": ["Retrieve duplicate question titles from StackExchange"],
    "trivia": ["Retrieve Wikipedia passages that answer the question"],
    "yahoo_answers_question_answer": ["Given a question, retrieve the most helpful answers"],
    "yahoo_answers_title_answer": ["Given a question title, retrieve the most helpful answers"],
    "yahoo_answers_title_question": ["Given a question title, retrieve question bodies that match the title"],
    # Multilingual MS MARCO families (parity: utils/prompts.py:31-50 — each is
    # the msmarco instruction in the query language; translations are our own)
    "mmarco-en": ["Given a web search query, retrieve relevant passages that answer the query"],
    "mmarco-ar": ["بالنظر إلى استعلام بحث على الويب، استرجع المقاطع ذات الصلة التي تجيب عن الاستعلام"],
    "mmarco-de": ["Gegeben eine Websuchanfrage, finde relevante Passagen, die die Anfrage beantworten"],
    "mmarco-es": ["Dada una consulta de búsqueda web, recupera pasajes relevantes que respondan a la consulta"],
    "mmarco-fr": ["Étant donné une requête de recherche web, récupérez les passages pertinents qui y répondent"],
    "mmarco-hi": ["वेब खोज क्वेरी दिए जाने पर, क्वेरी का उत्तर देने वाले प्रासंगिक अनुच्छेद खोजें"],
    "mmarco-id": ["Diberikan kueri pencarian web, temukan bagian teks relevan yang menjawab kueri tersebut"],
    "mmarco-it": ["Data una query di ricerca web, recupera i passaggi rilevanti che rispondono alla query"],
    "mmarco-ja": ["ウェブ検索クエリに対して、そのクエリに答える関連パッセージを検索してください"],
    "mmarco-nl": ["Gegeven een webzoekopdracht, vind relevante passages die de zoekopdracht beantwoorden"],
    "mmarco-pt": ["Dada uma consulta de pesquisa na web, recupere passagens relevantes que respondem à consulta"],
    "mmarco-ru": ["По заданному поисковому запросу найдите релевантные фрагменты текста, отвечающие на запрос"],
    "mmarco-vi": ["Cho một truy vấn tìm kiếm web, hãy truy xuất những đoạn văn liên quan trả lời truy vấn đó"],
    "mmarco-zh": ["给定一个网络搜索查询，检索能回答该查询的相关段落"],
    "indicmarco-bn": ["একটি ওয়েব অনুসন্ধান প্রশ্ন দেওয়া হলে, প্রশ্নের উত্তর দেয় এমন প্রাসঙ্গিক অনুচ্ছেদগুলি খুঁজে বের করুন"],
    "indicmarco-te": ["వెబ్ శోధన ప్రశ్న ఇచ్చినప్పుడు, ప్రశ్నకు జవాబిచ్చే సంబంధిత భాగాలను వెలికితీయండి"],
    "neumarco-fa": ["با داشتن یک پرس‌وجوی جستجوی وب، قطعات مرتبطی را که به پرس‌وجو پاسخ می‌دهند بازیابی کنید"],
    "marco-ko": ["웹 검색 질의가 주어지면 질의에 답하는 관련 단락을 검색하세요"],
}

# MTEB/BEIR eval-side task -> instruction (e5 format), lowercase task keys.
MTEB_TASK_INSTRUCTIONS: dict[str, str] = {
    "arguana": "Given a claim, find documents that refute the claim",
    "climatefever": "Given a claim about climate change, retrieve documents that support or refute the claim",
    "cqadupstackretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "dbpedia": "Given a query, retrieve relevant entity descriptions from DBPedia",
    "fever": "Given a claim, retrieve documents that support or refute the claim",
    "fiqa2018": "Given a financial question, retrieve user replies that best answer the question",
    "hotpotqa": "Given a multi-hop question, retrieve documents that can help answer the question",
    "msmarco": "Given a web search query, retrieve relevant passages that answer the query",
    "nfcorpus": "Given a question, retrieve relevant documents that best answer the question",
    "nq": "Given a question, retrieve Wikipedia passages that answer the question",
    "quoraretrieval": "Given a question, retrieve questions that are semantically equivalent to the given question",
    "scidocs": "Given a scientific paper title, retrieve paper abstracts that are cited by the given paper",
    "scifact": "Given a scientific claim, retrieve documents that support or refute the claim",
    "touche2020": "Given a question, retrieve detailed and persuasive arguments that answer the question",
    "trec-covid": "Given a query on COVID-19, retrieve documents that answer the query",
    "treccovid": "Given a query on COVID-19, retrieve documents that answer the query",
    # Non-retrieval MTEB task families (classification/clustering/STS prompts)
    "banking77classification": "Given an online banking query, find the corresponding intent",
    "emotionclassification": "Classify the emotion expressed in the given Twitter message",
    "imdbclassification": "Classify the sentiment expressed in the given movie review",
    "amazonreviewsclassification": "Classify the given Amazon review into its appropriate rating category",
    "arxivclusteringp2p": "Identify the main and secondary category of Arxiv papers based on the titles and abstracts",
    "arxivclusterings2s": "Identify the main and secondary category of Arxiv papers based on the titles",
    "redditclustering": "Identify the topic or theme of Reddit posts based on the titles",
    "stackexchangeclustering": "Identify the topic or theme of StackExchange posts based on the titles",
    "twentynewsgroupsclustering": "Identify the topic or theme of the given news articles",
    "stsbenchmark": "Retrieve semantically similar text",
    "sts12": "Retrieve semantically similar text",
    "sts22": "Retrieve semantically similar text",
    "sickr": "Retrieve semantically similar text",
    "biosses": "Retrieve semantically similar text",
    "askubuntudupquestions": "Retrieve duplicate questions from AskUbuntu forum",
    "cqadupstackandroidretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "cqadupstackenglishretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "cqadupstackgamingretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "cqadupstackgisretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "cqadupstackmathematicaretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "cqadupstackphysicsretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "cqadupstackprogrammersretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "cqadupstackstatsretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "cqadupstacktexretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "cqadupstackunixretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "cqadupstackwebmastersretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "cqadupstackwordpressretrieval": "Given a question, retrieve detailed question descriptions from Stackexchange that are duplicates to the given question",
    "mindsmallreranking": "Retrieve relevant news articles based on user browsing history",
    "scidocsrr": "Given a title of a scientific paper, retrieve the titles of other relevant papers",
    "stackoverflowdupquestions": "Retrieve duplicate questions from StackOverflow forum",
}

# Multilingual eval task families (parity: eval/prompts.py — per-language
# MIRACL/MKQA entries; e5-convention instructions are English regardless of
# the task language).
_MIRACL_LANGS = ("ar", "bn", "de", "en", "es", "fa", "fi", "fr", "hi", "id",
                 "ja", "ko", "ru", "sw", "te", "th", "yo", "zh")
_MKQA_LANGS = ("ar", "da", "de", "en", "es", "fi", "fr", "he", "hu", "it",
               "ja", "km", "ko", "ms", "nl", "no", "pl", "pt", "ru", "sv",
               "th", "tr", "vi", "zh_cn", "zh_hk", "zh_tw")
for _lang in _MIRACL_LANGS:
    MTEB_TASK_INSTRUCTIONS[f"miraclretrieval-{_lang}"] = \
        "Given a question, retrieve Wikipedia passages that answer the question"
MTEB_TASK_INSTRUCTIONS["mkqa"] = \
    "Given a question, retrieve Wikipedia passages that answer the question"
for _lang in _MKQA_LANGS:
    MTEB_TASK_INSTRUCTIONS[f"mkqa-{_lang}"] = \
        "Given a question, retrieve Wikipedia passages that answer the question"
# C-MTEB retrieval family (Chinese)
MTEB_TASK_INSTRUCTIONS.update({
    "t2retrieval": "Given a Chinese search query, retrieve web passages that answer the question",
    "mmarcoretrieval": "Given a web search query, retrieve relevant passages that answer the query",
    "dureaderretrieval": "Given a Chinese search query, retrieve web passages that answer the question",
    "covidretrieval": "Given a question on COVID-19, retrieve news articles that answer the question",
    "cmedqaretrieval": "Given a Chinese community medical question, retrieve replies that best answer the question",
    "ecomretrieval": "Given a user query from an e-commerce website, retrieve description sentences of relevant products",
    "medicalretrieval": "Given a medical question, retrieve user replies that best answer the question",
    "videoretrieval": "Given a video search query, retrieve the titles of relevant videos",
})


def register_prompt(task_name: str, instructions: list[str], registry: Optional[dict] = None):
    (registry if registry is not None else E5_INSTRUCTIONS)[task_name] = instructions


def _lookup(task_name: str) -> list[str]:
    if task_name in E5_INSTRUCTIONS:
        return E5_INSTRUCTIONS[task_name]
    key = task_name.lower().replace("-", "_")
    if key in E5_INSTRUCTIONS:
        return E5_INSTRUCTIONS[key]
    return [DEFAULT_RETRIEVAL_INSTRUCTION]


def get_prompt(prompt_type: str, task_name: str, rng: Optional[Random] = None) -> str:
    """Render the query-side prompt (parity: utils/prompts.py:207-260).

    e5:          ``Instruct: {instruction}\nQuery: ``
    e5_reranker: same query prefix (passage side adds ``\nPassage: `` in the
                 rerank collator)
    instructor:  ``Represent this {instruction} ``-style embedded instruction
    bge:         fixed retrieval prefix
    none/'':     empty
    """
    if rng is None:
        rng = Random(42)
    if not prompt_type or prompt_type == "none":
        return ""
    if prompt_type in ("e5", "e5_reranker"):
        insts = _lookup(task_name)
        inst = insts[0] if len(insts) == 1 else rng.choice(insts)
        return f"Instruct: {inst}\nQuery: " if inst else ""
    if prompt_type == "instructor":
        insts = _lookup(task_name)
        inst = insts[0] if len(insts) == 1 else rng.choice(insts)
        return f"Represent the query for retrieving evidence: {inst}. " if inst else ""
    if prompt_type == "bge":
        return "Represent this sentence for searching relevant passages: "
    raise NotImplementedError(f"Unknown prompt_type: {prompt_type}")


def get_mteb_prompt(prompt_type: str, task_name: str) -> str:
    """Eval-side query prompt for an MTEB task (parity: eval/prompts.py)."""
    if not prompt_type or prompt_type == "none":
        return ""
    key = task_name.lower()
    inst = MTEB_TASK_INSTRUCTIONS.get(key, DEFAULT_RETRIEVAL_INSTRUCTION)
    if prompt_type == "e5":
        return f"Instruct: {inst}\nQuery: "
    if prompt_type == "bge":
        return "Represent this sentence for searching relevant passages: "
    if prompt_type == "instructor":
        return f"Represent the query for retrieving evidence: {inst}. "
    raise NotImplementedError(f"Unknown prompt_type: {prompt_type}")


def get_mteb_prompt_pair(
    task_name: str, task_type: str, prompt_type: str
) -> tuple[str, str]:
    """(query_prompt, corpus_prompt) for an MTEB task — full parity with the
    reference's ``get_mteb_prompt`` (eval/prompts.py:185-226), including the
    non-instruct families:

    e5_ori:   plain ``query: ``/``passage: `` dual prefixes
    e5:       instructed query, bare corpus for Retrieval/Reranking
    llm2vec:  Llama-3-instruct chat-header wrapping
    bge-en / bge-zh: fixed retrieval query prefix (EN / ZH)
    """
    sym = task_type not in ("Reranking", "Retrieval")
    if prompt_type == "e5_ori":
        return ("query: ", "query: " if sym else "passage: ")
    if prompt_type == "e5":
        qp = get_mteb_prompt("e5", task_name)
        return (qp, qp if sym else "")
    if prompt_type.startswith("llm2vec"):
        inst = MTEB_TASK_INSTRUCTIONS.get(task_name.lower(),
                                          DEFAULT_RETRIEVAL_INSTRUCTION)
        hdr = "<|start_header_id|>user<|end_header_id|>\n\n"
        qp = hdr + inst + ": "
        return (qp, qp if sym else hdr)
    if prompt_type == "bge-en":
        qp = ("Represent this sentence for searching relevant passages: "
              if task_type == "Retrieval" else "")
        return (qp, "")
    if prompt_type == "bge-zh":
        qp = "为这个句子生成表示以用于检索相关文章：" if task_type == "Retrieval" else ""
        return (qp, "")
    if not prompt_type or prompt_type == "none":
        return ("", "")
    raise NotImplementedError(f"Unknown prompt_type: {prompt_type}")
