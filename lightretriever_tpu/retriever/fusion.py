"""Hybrid score fusion: Reciprocal Rank Fusion and min-max linear interpolation.

Behavioral parity with the reference (reference:
src/lightretriever/retriever/score_fuse_utils.py:3-91). Host-side numpy —
fusion operates on small per-query top-k result dicts, not device tensors.
"""
from __future__ import annotations

import numpy as np

ResultDict = dict[str, dict[str, float]]


def fuse_scores_rrf(results_list: list[ResultDict], k: int = 60) -> ResultDict:
    """Reciprocal Rank Fusion: score = sum over systems of 1 / (k + rank)."""
    fused: ResultDict = {}
    for system_results in results_list:
        for query_id, passages in system_results.items():
            query_id = str(query_id)
            bucket = fused.setdefault(query_id, {})
            pids = list(passages.keys())
            scores = np.array([float(passages[p]) for p in pids])
            order = np.argsort(-scores)
            for rank, idx in enumerate(order, start=1):
                pid = str(pids[idx])
                bucket[pid] = bucket.get(pid, 0.0) + 1.0 / (k + rank)
    return fused


def fuse_scores_linear(
    results_list: list[ResultDict],
    weights: list[float] = (0.7, 0.3),
    eps: float = 1e-8,
) -> ResultDict:
    """Min-max normalize each system's per-query scores, then weighted sum."""
    assert len(results_list) == len(weights)
    fused: ResultDict = {}
    for system_results, weight in zip(results_list, weights):
        for query_id, passages in system_results.items():
            query_id = str(query_id)
            bucket = fused.setdefault(query_id, {})
            pids = list(passages.keys())
            if not pids:
                continue
            scores = np.array([float(passages[p]) for p in pids])
            lo, hi = scores.min(), scores.max()
            normed = (scores - lo) / (hi - lo + eps) * weight
            for pid, sc in zip(pids, normed):
                pid = str(pid)
                bucket[pid] = bucket.get(pid, 0.0) + float(sc)
    return fused


def fuse(results_list: list[ResultDict], method: str = "linear", **kwargs) -> ResultDict:
    if method == "linear":
        return fuse_scores_linear(results_list, **kwargs)
    if method == "rrf":
        return fuse_scores_rrf(results_list, **kwargs)
    raise NotImplementedError(f"Unknown fusion method: {method}")
