"""Fusion + metrics tests against hand-computed oracles."""
import math

import numpy as np

from lightretriever_tpu.retriever.fusion import fuse_scores_rrf, fuse_scores_linear
from lightretriever_tpu.evaluation.metrics import (
    evaluate_retrieval,
    ndcg_at_k,
    mrr_at_k,
    in_batch_metrics,
)


def test_rrf():
    dense = {"q1": {"a": 3.0, "b": 2.0, "c": 1.0}}
    sparse = {"q1": {"b": 9.0, "a": 1.0}}
    fused = fuse_scores_rrf([dense, sparse], k=60)
    assert math.isclose(fused["q1"]["a"], 1 / 61 + 1 / 62)
    assert math.isclose(fused["q1"]["b"], 1 / 62 + 1 / 61)
    assert math.isclose(fused["q1"]["c"], 1 / 63)


def test_linear_fusion():
    dense = {"q1": {"a": 2.0, "b": 1.0}}
    sparse = {"q1": {"a": 5.0, "b": 10.0}}
    fused = fuse_scores_linear([dense, sparse], weights=[0.7, 0.3])
    # dense normed: a=1, b=0; sparse normed: a=0, b=1
    assert math.isclose(fused["q1"]["a"], 0.7, rel_tol=1e-6)
    assert math.isclose(fused["q1"]["b"], 0.3, rel_tol=1e-6)


def test_ndcg_perfect_and_worst():
    qrels = {"q1": {"a": 1, "b": 0}}
    perfect = {"q1": {"a": 2.0, "b": 1.0}}
    worst = {"q1": {"a": 1.0, "b": 2.0}}
    assert ndcg_at_k(qrels, perfect, [2])["NDCG@2"] == 1.0
    np.testing.assert_allclose(ndcg_at_k(qrels, worst, [2])["NDCG@2"], 1 / math.log2(3), rtol=1e-4)


def test_mrr():
    qrels = {"q1": {"a": 1}, "q2": {"z": 1}}
    results = {
        "q1": {"x": 3.0, "a": 2.0},   # positive at rank 2
        "q2": {"z": 5.0, "y": 1.0},   # positive at rank 1
    }
    got = mrr_at_k(qrels, results, [10])["MRR@10"]
    np.testing.assert_allclose(got, (0.5 + 1.0) / 2, rtol=1e-6)


def test_evaluate_retrieval_keys():
    qrels = {"q1": {"a": 1}}
    results = {"q1": {"a": 1.0}}
    m = evaluate_retrieval(qrels, results, k_values=[1, 10])
    for prefix in ["NDCG", "MAP", "Recall", "P", "MRR", "R_cap", "Hole", "Accuracy"]:
        assert any(k.startswith(prefix) for k in m), prefix
    assert m["NDCG@1"] == 1.0 and m["Recall@1"] == 1.0


def test_skip_queries_without_positives():
    qrels = {"q1": {"a": 1}, "q2": {"b": 0}}  # q2 has no positive -> skipped
    results = {"q1": {"a": 1.0}, "q2": {"b": 1.0}}
    assert ndcg_at_k(qrels, results, [1])["NDCG@1"] == 1.0


def test_in_batch_metrics():
    # 2 queries, 2 passages each; positives on the diagonal blocks
    scores = np.array([
        [5.0, 1.0, 0.0, 0.0],   # positive col 0 -> rank 1
        [9.0, 0.0, 1.0, 0.0],   # positive col 2 -> rank 2
    ])
    m = in_batch_metrics(scores, n_psg=2)
    np.testing.assert_allclose(m["mrr"], (1.0 + 0.5) / 2)
    np.testing.assert_allclose(m["recall@1"], 0.5)
