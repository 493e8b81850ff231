"""Retrieval evaluation metrics, implemented from scratch (numpy only).

Metric definitions match the reference's pytrec_eval-based harness
(reference: eval/mteb_metrics.py:13-505): ndcg@k, map@k, recall@k,
precision@k, mrr@k, recall_cap@k, hole@k, top_k_accuracy@k. Scores use
binary/graded relevance from a qrels dict; queries present in qrels but with
no positive judgments are skipped, matching trec_eval conventions.
"""
from __future__ import annotations

import math

import numpy as np
from collections import defaultdict

Qrels = dict[str, dict[str, int]]
Results = dict[str, dict[str, float]]


def _ranked_pids(results_for_query: dict[str, float]) -> list[str]:
    return [p for p, _ in sorted(results_for_query.items(), key=lambda kv: (-kv[1], kv[0]))]


def ndcg_at_k(qrels: Qrels, results: Results, k_values: list[int]) -> dict[str, float]:
    out = {f"NDCG@{k}": 0.0 for k in k_values}
    n = 0
    for qid, rels in qrels.items():
        pos = {p: g for p, g in rels.items() if g > 0}
        if not pos:
            continue
        n += 1
        ranked = _ranked_pids(results.get(qid, {}))
        ideal = sorted(pos.values(), reverse=True)
        for k in k_values:
            dcg = sum(
                (2 ** pos.get(p, 0) - 1) / math.log2(i + 2)
                for i, p in enumerate(ranked[:k])
            )
            idcg = sum((2 ** g - 1) / math.log2(i + 2) for i, g in enumerate(ideal[:k]))
            out[f"NDCG@{k}"] += dcg / idcg if idcg > 0 else 0.0
    for key in out:
        out[key] = round(out[key] / n, 5) if n else 0.0
    return out


def map_at_k(qrels: Qrels, results: Results, k_values: list[int]) -> dict[str, float]:
    out = {f"MAP@{k}": 0.0 for k in k_values}
    n = 0
    for qid, rels in qrels.items():
        pos = {p for p, g in rels.items() if g > 0}
        if not pos:
            continue
        n += 1
        ranked = _ranked_pids(results.get(qid, {}))
        for k in k_values:
            hits = 0
            ap = 0.0
            for i, p in enumerate(ranked[:k]):
                if p in pos:
                    hits += 1
                    ap += hits / (i + 1)
            out[f"MAP@{k}"] += ap / min(len(pos), k) if pos else 0.0
    for key in out:
        out[key] = round(out[key] / n, 5) if n else 0.0
    return out


def recall_at_k(qrels: Qrels, results: Results, k_values: list[int]) -> dict[str, float]:
    out = {f"Recall@{k}": 0.0 for k in k_values}
    n = 0
    for qid, rels in qrels.items():
        pos = {p for p, g in rels.items() if g > 0}
        if not pos:
            continue
        n += 1
        ranked = _ranked_pids(results.get(qid, {}))
        for k in k_values:
            hit = len(pos & set(ranked[:k]))
            out[f"Recall@{k}"] += hit / len(pos)
    for key in out:
        out[key] = round(out[key] / n, 5) if n else 0.0
    return out


def precision_at_k(qrels: Qrels, results: Results, k_values: list[int]) -> dict[str, float]:
    out = {f"P@{k}": 0.0 for k in k_values}
    n = 0
    for qid, rels in qrels.items():
        pos = {p for p, g in rels.items() if g > 0}
        if not pos:
            continue
        n += 1
        ranked = _ranked_pids(results.get(qid, {}))
        for k in k_values:
            hit = len(pos & set(ranked[:k]))
            out[f"P@{k}"] += hit / k
    for key in out:
        out[key] = round(out[key] / n, 5) if n else 0.0
    return out


def mrr_at_k(qrels: Qrels, results: Results, k_values: list[int]) -> dict[str, float]:
    out = {f"MRR@{k}": 0.0 for k in k_values}
    n = 0
    for qid, rels in qrels.items():
        pos = {p for p, g in rels.items() if g > 0}
        if not pos:
            continue
        n += 1
        ranked = _ranked_pids(results.get(qid, {}))
        for k in k_values:
            for i, p in enumerate(ranked[:k]):
                if p in pos:
                    out[f"MRR@{k}"] += 1.0 / (i + 1)
                    break
    for key in out:
        out[key] = round(out[key] / n, 5) if n else 0.0
    return out


def recall_cap_at_k(qrels: Qrels, results: Results, k_values: list[int]) -> dict[str, float]:
    """Capped recall: denominator min(n_pos, k) (reference: mteb_metrics.py)."""
    out = {f"R_cap@{k}": 0.0 for k in k_values}
    n = 0
    for qid, rels in qrels.items():
        pos = {p for p, g in rels.items() if g > 0}
        if not pos:
            continue
        n += 1
        ranked = _ranked_pids(results.get(qid, {}))
        for k in k_values:
            hit = len(pos & set(ranked[:k]))
            out[f"R_cap@{k}"] += hit / min(len(pos), k)
    for key in out:
        out[key] = round(out[key] / n, 5) if n else 0.0
    return out


def hole_at_k(qrels: Qrels, results: Results, k_values: list[int]) -> dict[str, float]:
    """Fraction of retrieved@k docs with NO judgment at all (unjudged holes)."""
    out = {f"Hole@{k}": 0.0 for k in k_values}
    n = 0
    for qid, rels in qrels.items():
        judged = set(rels.keys())
        if not any(g > 0 for g in rels.values()):
            continue
        n += 1
        ranked = _ranked_pids(results.get(qid, {}))
        for k in k_values:
            topk = ranked[:k]
            unjudged = sum(1 for p in topk if p not in judged)
            out[f"Hole@{k}"] += unjudged / k
    for key in out:
        out[key] = round(out[key] / n, 5) if n else 0.0
    return out


def top_k_accuracy(qrels: Qrels, results: Results, k_values: list[int]) -> dict[str, float]:
    out = {f"Accuracy@{k}": 0.0 for k in k_values}
    n = 0
    for qid, rels in qrels.items():
        pos = {p for p, g in rels.items() if g > 0}
        if not pos:
            continue
        n += 1
        ranked = _ranked_pids(results.get(qid, {}))
        for k in k_values:
            out[f"Accuracy@{k}"] += 1.0 if pos & set(ranked[:k]) else 0.0
    for key in out:
        out[key] = round(out[key] / n, 5) if n else 0.0
    return out


def evaluate_retrieval(
    qrels: Qrels,
    results: Results,
    k_values: list[int] = (1, 3, 5, 10, 100, 1000),
) -> dict[str, float]:
    """All retrieval metrics in one call (parity: mteb_metrics.py:473-505)."""
    k_values = list(k_values)
    metrics: dict[str, float] = {}
    metrics.update(ndcg_at_k(qrels, results, k_values))
    metrics.update(map_at_k(qrels, results, k_values))
    metrics.update(recall_at_k(qrels, results, k_values))
    metrics.update(precision_at_k(qrels, results, k_values))
    metrics.update(mrr_at_k(qrels, results, k_values))
    metrics.update(recall_cap_at_k(qrels, results, k_values))
    metrics.update(hole_at_k(qrels, results, k_values))
    metrics.update(top_k_accuracy(qrels, results, k_values))
    return metrics


def in_batch_metrics(scores, n_psg: int) -> dict[str, float]:
    """Dev metrics over an in-batch score matrix [B, B*n_psg]
    (parity: finetune/metrics.py:6-63): target for row i is column i*n_psg."""
    import numpy as np

    scores = np.asarray(scores)
    bsz = scores.shape[0]
    targets = np.arange(bsz) * n_psg
    order = np.argsort(-scores, axis=1)
    ranks = np.argmax(order == targets[:, None], axis=1)  # 0-based rank of positive

    def dcg_at(k):
        return np.mean(np.where(ranks < k, 1.0 / np.log2(ranks + 2), 0.0))

    return {
        "mrr": float(np.mean(1.0 / (ranks + 1))),
        "ndcg@10": float(dcg_at(10)),  # single positive => idcg == 1
        "recall@1": float(np.mean(ranks < 1)),
        "recall@5": float(np.mean(ranks < 5)),
        "recall@10": float(np.mean(ranks < 10)),
    }


# ---------------------------------------------------------------------------
# nAUC abstention metrics (parity: eval/mteb_metrics.py nAUC block — the
# normalized area under the metric-vs-abstention curve, per confidence fn)
# ---------------------------------------------------------------------------
def per_query_ndcg_at_k(qrels: Qrels, results: Results, k: int) -> dict[str, float]:
    out = {}
    for qid, rels in qrels.items():
        ranked = _ranked_pids(results.get(qid, {}))[:k]
        dcg = sum(rel / np.log2(r + 2) for r, pid in enumerate(ranked)
                  for rel in [rels.get(pid, 0)] if rel > 0)
        ideal = sorted(rels.values(), reverse=True)[:k]
        idcg = sum(rel / np.log2(r + 2) for r, rel in enumerate(ideal) if rel > 0)
        out[qid] = dcg / idcg if idcg > 0 else 0.0
    return out


def _confidence_scores(scores: list[float]) -> dict[str, float]:
    """Per-query retrieval-confidence functions (mteb convention):
    max score, score std, and the top-1/top-2 margin."""
    arr = np.asarray(scores, np.float64)
    if arr.size == 0:
        return {"max": 0.0, "std": 0.0, "P1": 0.0}
    srt = -np.sort(-arr)
    return {
        "max": float(srt[0]),
        "std": float(arr.std()),
        "P1": float(srt[0] - srt[1]) if arr.size > 1 else float(srt[0]),
    }


def _abstention_auc(metric: np.ndarray, conf: np.ndarray,
                    rates=np.linspace(0.0, 0.9, 10)) -> float:
    order = np.argsort(-conf, kind="stable")
    m = metric[order]
    vals = []
    for r in rates:
        keep = max(int(round(len(m) * (1 - r))), 1)
        vals.append(m[:keep].mean())
    return float(np.trapezoid(vals, rates))


def nauc_at_k(qrels: Qrels, results: Results, k: int = 10) -> dict[str, float]:
    """nAUC_{ndcg@k}_{conf}: (auc - auc_random) / (auc_oracle - auc_random)."""
    pq = per_query_ndcg_at_k(qrels, results, k)
    qids = [q for q in qrels if q in pq]
    metric = np.asarray([pq[q] for q in qids])
    if len(qids) == 0:
        return {}
    out = {}
    auc_rand = float(np.trapezoid([metric.mean()] * 10, np.linspace(0.0, 0.9, 10)))
    auc_oracle = _abstention_auc(metric, metric)
    for name in ("max", "std", "P1"):
        conf = np.asarray([
            _confidence_scores(list(results.get(q, {}).values()))[name] for q in qids
        ])
        auc = _abstention_auc(metric, conf)
        denom = auc_oracle - auc_rand
        out[f"nAUC_NDCG@{k}_{name}"] = round(
            (auc - auc_rand) / denom, 5) if abs(denom) > 1e-12 else 0.0
    return out
