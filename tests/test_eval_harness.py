"""Eval harness tests: BEIR loading, end-to-end BM25 eval, searcher mapping."""
import json
import os

import numpy as np
import pytest

from lightretriever_tpu.arguments import EvalArguments
from lightretriever_tpu.evaluation.harness import (
    evaluate_task,
    init_searcher,
    launch_eval,
    load_beir_dataset,
)
from lightretriever_tpu.inference.encode import DummyModel


@pytest.fixture()
def beir_dir(tmp_path):
    d = tmp_path / "scifact_tiny"
    d.mkdir()
    corpus = [
        {"_id": "d1", "title": "animals", "text": "zebra giraffe elephant safari wildlife"},
        {"_id": "d2", "title": "baking", "text": "chocolate cake recipe cocoa butter"},
        {"_id": "d3", "title": "hardware", "text": "tpu chips interconnect bandwidth links"},
        {"_id": "d4", "title": "physics", "text": "quantum computing superconducting qubits"},
    ]
    queries = [
        {"_id": "q1", "text": "elephant safari wildlife"},
        {"_id": "q2", "text": "chocolate cocoa cake"},
        {"_id": "q3", "text": "unused query"},
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
        f.write("q1\td1\t1\n")
        f.write("q2\td2\t1\n")
    return str(d)


def test_load_beir_dataset(beir_dir):
    corpus, queries, qrels = load_beir_dataset(beir_dir)
    assert len(corpus) == 4
    assert set(queries) == {"q1", "q2"}  # q3 dropped: no qrels
    assert qrels["q1"] == {"d1": 1}


def test_bm25_eval_end_to_end(beir_dir):
    corpus, queries, qrels = load_beir_dataset(beir_dir)
    searcher = init_searcher(DummyModel(), EvalArguments())
    out = evaluate_task(searcher, corpus, queries, qrels, top_k=4,
                        k_values=(1, 3))
    m = out["metrics"]
    assert m["NDCG@1"] == 1.0
    assert m["Recall@3"] == 1.0
    assert out["timing"]["qps"] > 0


def test_launch_eval_writes_outputs(beir_dir, tmp_path):
    args = EvalArguments(output_dir=str(tmp_path / "results"),
                         top_k=4, k_values=(1, 3), save_predictions=True)
    metrics = launch_eval(args, DummyModel(), {"tinytask": beir_dir})
    assert "tinytask" in metrics
    assert os.path.exists(tmp_path / "results" / "tinytask.json")
    assert os.path.exists(tmp_path / "results" / "summary.json")
    assert os.path.exists(tmp_path / "results" / "tinytask_predictions.json")
