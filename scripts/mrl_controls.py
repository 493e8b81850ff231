"""MRL dim-64 controls: is the prefix special, or is ANY 64-dim view enough?

Loads the dense embeddings saved by the q_mrl_r4 stage
(``quality_study.py --save-embs``) and scores three 64-dim views of the
same embedding space against the full-dim run:

  prefix-64   the MRL-trained slice (what serving actually truncates to;
              reference: modeling_hybrid.py:605-622 trains coordinate
              prefixes)
  random-64   mean over N random 64-coordinate subsets — the low-rank-only
              control: if the space were isotropically redundant, this
              would match the prefix
  pca-64      top-64 PCA projection (fit on corpus) — the oracle rotation
              upper bound for ANY 64-dim linear view

Writes results/mrl_controls.json. CPU-only (1500x43601 GEMMs at d=64).

Usage: python scripts/mrl_controls.py [--embs .artifacts/q_mrl_r4/dense_embs.npz]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _search_ndcg(c, q, cids, qids, qrels, k=10):
    from lightretriever_tpu.evaluation.metrics import evaluate_retrieval

    c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-9)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-9)
    scores = q @ c.T                                   # [Q, N]
    top = np.argpartition(-scores, 100, axis=1)[:, :100]
    res = {}
    for i, qid in enumerate(qids):
        cols = top[i][np.argsort(-scores[i, top[i]])]
        res[qid] = {cids[j]: float(scores[i, j]) for j in cols}
    m = evaluate_retrieval(qrels, res, k_values=[10, 100])
    return {"NDCG@10": m["NDCG@10"], "Recall@100": m["Recall@100"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--embs", default=".artifacts/q_mrl_r4/dense_embs.npz")
    ap.add_argument("--data", default=".artifacts/docstring_beir")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--n-random", type=int, default=5)
    ap.add_argument("--out", default="results/mrl_controls.json")
    args = ap.parse_args()

    from lightretriever_tpu.evaluation.harness import load_beir_dataset

    _, _, qrels = load_beir_dataset(args.data)
    z = np.load(args.embs, allow_pickle=False)
    c, q = z["corpus"].astype(np.float32), z["queries"].astype(np.float32)
    cids = [str(x) for x in z["corpus_ids"]]
    qids = [str(x) for x in z["query_ids"]]
    d = args.dim

    out = {"dim": d, "full_dim": int(c.shape[1])}
    out["full"] = _search_ndcg(c, q, cids, qids, qrels)
    out["prefix"] = _search_ndcg(c[:, :d], q[:, :d], cids, qids, qrels)

    rng = np.random.default_rng(0)
    rand_runs = []
    for _ in range(args.n_random):
        # exclude-the-prefix draw: what a non-MRL-trained 64-dim view sees
        cols = rng.choice(np.arange(d, c.shape[1]), size=d, replace=False)
        rand_runs.append(_search_ndcg(c[:, cols], q[:, cols], cids, qids, qrels))
    out["random"] = {
        "NDCG@10_mean": round(float(np.mean([r["NDCG@10"] for r in rand_runs])), 4),
        "NDCG@10_min": round(float(np.min([r["NDCG@10"] for r in rand_runs])), 4),
        "NDCG@10_max": round(float(np.max([r["NDCG@10"] for r in rand_runs])), 4),
        "runs": rand_runs,
    }

    mu = c.mean(0)
    sample = c[rng.permutation(len(c))[:16384]] - mu
    _, _, vt = np.linalg.svd(sample, full_matrices=False)
    w = vt[:d].T                                       # [D, d]
    out["pca"] = _search_ndcg((c - mu) @ w, (q - mu) @ w, cids, qids, qrels)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    for k in ("full", "prefix", "pca"):
        print(f"{k:>8}: NDCG@10 {out[k]['NDCG@10']:.4f} "
              f"R@100 {out[k]['Recall@100']:.4f}")
    print(f"  random: NDCG@10 {out['random']['NDCG@10_mean']:.4f} "
          f"[{out['random']['NDCG@10_min']:.4f}..{out['random']['NDCG@10_max']:.4f}] "
          f"({args.n_random} draws)")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
