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


def test_nauc_metrics():
    from lightretriever_tpu.evaluation.metrics import nauc_at_k, per_query_ndcg_at_k

    qrels = {"q1": {"d1": 1}, "q2": {"d2": 1}, "q3": {"d3": 1}}
    results = {
        "q1": {"d1": 0.9, "dx": 0.1},   # perfect, confident
        "q2": {"dx": 0.5, "d2": 0.45},  # imperfect, low margin
        "q3": {"d3": 0.3, "dx": 0.29},  # perfect, low confidence
    }
    pq = per_query_ndcg_at_k(qrels, results, 10)
    assert pq["q1"] == 1.0 and pq["q3"] == 1.0 and 0 < pq["q2"] < 1
    naucs = nauc_at_k(qrels, results, k=10)
    assert set(naucs) == {"nAUC_NDCG@10_max", "nAUC_NDCG@10_std", "nAUC_NDCG@10_P1"}
    for v in naucs.values():
        assert -1.5 <= v <= 1.5


def test_mrl_dim_sweep(beir_dir):
    import jax
    from lightretriever_tpu.evaluation.harness import mrl_dim_sweep
    from lightretriever_tpu.arguments import InferenceArguments, ModelArguments, TrainingArguments
    from lightretriever_tpu.inference.encode import SpmdEncoder
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.encoder import EncoderModel
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from tokenizer_fixture import make_tiny_tokenizer
    from lightretriever_tpu.evaluation.harness import load_beir_dataset

    tiny = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=True)
    tok = make_tiny_tokenizer()
    ma = ModelArguments(pooling_strategy="lasttoken", attn_implementation="xla")
    model = EncoderModel(ma, TrainingArguments(), tiny, eos_token_id=tok.eos_token_id)
    params = model.init_params(jax.random.key(0))
    enc = SpmdEncoder(model, params, tok, args=InferenceArguments(
        encode_batch_size=4, pooling_strategy="lasttoken", attn_implementation="xla"))
    corpus, queries, qrels = load_beir_dataset(beir_dir)
    sweep = mrl_dim_sweep(enc, corpus, queries, qrels, dims=(8, 16, None),
                          top_k=4, k_values=(1, 3))
    assert set(sweep) == {"dim=8", "dim=16", "dim=full"}
    for m in sweep.values():
        assert "NDCG@1" in m
