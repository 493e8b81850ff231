"""MTEB driver + predictions save/load round trip.

Exercises call_evaluate_mteb against a faithful mteb API stub
(tests/mteb_stub) — the reference path this pins: eval/evaluate_mteb.py:53-139
(per-task run loop, prompt injection, save_predictions, pred_load_folder)
and eval/eval_arguments.py:64-78 (prediction reuse flags).
"""
import json
import os
import sys

import pytest

from lightretriever_tpu.arguments import EvalArguments
from lightretriever_tpu.evaluation.harness import launch_eval
from lightretriever_tpu.inference.encode import DummyModel

_STUB_DIR = os.path.join(os.path.dirname(__file__), "mteb_stub")


@pytest.fixture()
def mteb_stub(beir_dir):
    sys.path.insert(0, _STUB_DIR)
    for mod in list(sys.modules):
        if mod == "mteb" or mod.startswith("mteb."):
            del sys.modules[mod]
    import mteb

    mteb.register_beir_task("TinyTask", beir_dir)
    yield mteb
    sys.path.remove(_STUB_DIR)
    del sys.modules["mteb"]


@pytest.fixture()
def beir_dir(tmp_path):
    d = tmp_path / "beir"
    d.mkdir()
    corpus = [
        {"_id": "d1", "title": "animals", "text": "zebra giraffe elephant safari wildlife"},
        {"_id": "d2", "title": "baking", "text": "chocolate cake recipe cocoa butter"},
        {"_id": "d3", "title": "hardware", "text": "tpu chips interconnect bandwidth links"},
    ]
    queries = [
        {"_id": "q1", "text": "elephant safari wildlife"},
        {"_id": "q2", "text": "chocolate cocoa cake"},
    ]
    with open(d / "corpus.jsonl", "w") as f:
        for r in corpus:
            f.write(json.dumps(r) + "\n")
    with open(d / "queries.jsonl", "w") as f:
        for r in queries:
            f.write(json.dumps(r) + "\n")
    (d / "qrels").mkdir()
    with open(d / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q1\td1\t1\nq2\td2\t1\n")
    return str(d)


def test_call_evaluate_mteb_end_to_end(mteb_stub, tmp_path):
    from lightretriever_tpu.evaluation.harness import call_evaluate_mteb

    args = EvalArguments(
        task_names=("TinyTask",), output_dir=str(tmp_path / "out"),
        top_k=3, k_values=(1, 3), save_predictions=True,
        overwrite_results=True,
    )
    results = call_evaluate_mteb(args, DummyModel())
    assert results[0].task_name == "TinyTask"
    assert results[0].scores["ndcg_at_10"] == 1.0  # BM25 nails the tiny task
    pred = tmp_path / "out" / "TinyTask_default_predictions.json"
    assert pred.exists()


def test_call_evaluate_mteb_pred_load_skips_search(mteb_stub, tmp_path):
    from lightretriever_tpu.evaluation.harness import call_evaluate_mteb

    out = str(tmp_path / "out")
    args = EvalArguments(task_names=("TinyTask",), output_dir=out,
                         top_k=3, save_predictions=True, overwrite_results=True)
    call_evaluate_mteb(args, DummyModel())
    calls_after_first = mteb_stub.SEARCH_CALLS

    args2 = EvalArguments(task_names=("TinyTask",),
                          output_dir=str(tmp_path / "out2"),
                          top_k=3, pred_load_folder=out, overwrite_results=True)
    results = call_evaluate_mteb(args2, DummyModel())
    assert mteb_stub.SEARCH_CALLS == calls_after_first  # no new searches
    assert results[0].scores["ndcg_at_10"] == 1.0


def test_call_evaluate_mteb_prompt_injection(mteb_stub, tmp_path):
    from lightretriever_tpu.evaluation.harness import call_evaluate_mteb

    model = DummyModel()
    args = EvalArguments(task_names=("TinyTask",),
                         output_dir=str(tmp_path / "out"),
                         top_k=3, add_prompt=True, prompt_type="e5_ori",
                         overwrite_results=True)
    call_evaluate_mteb(args, model)
    assert model.query_prompt == "query: "
    assert model.corpus_prompt == "passage: "


def test_launch_eval_prediction_roundtrip(beir_dir, tmp_path):
    """save_predictions then pred_load_folder must reproduce identical
    metrics without searching (the reference's reuse path)."""
    out1 = str(tmp_path / "r1")
    args1 = EvalArguments(output_dir=out1, top_k=3, k_values=(1, 3),
                          save_predictions=True)
    m1 = launch_eval(args1, DummyModel(), {"tiny": beir_dir})

    class ExplodingEncoder(DummyModel):
        def encode_queries(self, *a, **k):
            raise AssertionError("search ran despite pred_load_folder")

        encode_corpus = encode = encode_queries

    out2 = str(tmp_path / "r2")
    args2 = EvalArguments(output_dir=out2, top_k=3, k_values=(1, 3),
                          pred_load_folder=out1, overwrite_results=True)
    m2 = launch_eval(args2, ExplodingEncoder(), {"tiny": beir_dir})
    assert m1["tiny"]["NDCG@1"] == m2["tiny"]["NDCG@1"]
    assert m1["tiny"]["Recall@3"] == m2["tiny"]["Recall@3"]


def test_launch_eval_overwrite_results_skip(beir_dir, tmp_path):
    out = str(tmp_path / "r")
    args = EvalArguments(output_dir=out, top_k=3, k_values=(1, 3))
    m1 = launch_eval(args, DummyModel(), {"tiny": beir_dir})
    # Second run with overwrite_results=False must not re-search: break the
    # encoder and expect cached metrics back.
    class ExplodingEncoder(DummyModel):
        def encode_queries(self, *a, **k):
            raise AssertionError("task re-ran despite existing results")

        encode_corpus = encode = encode_queries

    m2 = launch_eval(args, ExplodingEncoder(), {"tiny": beir_dir})
    assert m1 == m2
