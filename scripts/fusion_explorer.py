"""Offline fusion study over saved per-system predictions (CPU only).

`quality_study.py` persists every system's raw top-k results to
`<out>/predictions.json.gz`; this script explores the fusion space without
retraining or re-encoding anything:

  * 2-way min-max linear sweeps (each neural system x BM25, fine 0.05 grid)
  * 3-way simplex grid den x spr x BM25 (the full hybrid the reference's
    linear fusion family generalizes to, score_fuse_utils.py:48-91)
  * rank-RRF comparisons

Protocol matches the study: weights picked by NDCG@10 on the 1/3 query-id-
hash dev split, reported on the full set AND the held-out 2/3.

Usage:
  python scripts/fusion_explorer.py --preds .artifacts/q_r3a/predictions.json.gz \
      --data .artifacts/docstring_beir
"""
from __future__ import annotations

import argparse
import gzip
import hashlib
import itertools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from lightretriever_tpu.evaluation.harness import _score, load_beir_dataset
from lightretriever_tpu.retriever.fusion import fuse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preds", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--dev-frac", type=float, default=1 / 3)
    ap.add_argument("--out", default=None,
                    help="write the result JSON here (default: alongside preds)")
    args = ap.parse_args()

    _, _, qrels = load_beir_dataset(args.data)
    with gzip.open(args.preds, "rt") as f:
        preds = json.load(f)
    systems = sorted(preds)
    qids = sorted({q for s in preds.values() for q in s})
    qrels = {q: qrels[q] for q in qids if q in qrels}
    print(f"systems={systems} queries={len(qids)}", flush=True)

    def is_dev(qid):
        h = int(hashlib.sha1(str(qid).encode()).hexdigest(), 16)
        return (h % 1000) < args.dev_frac * 1000

    dev_q = {q for q in qids if is_dev(q)}
    hold_q = set(qids) - dev_q
    sub = lambda res, qs: {q: r for q, r in res.items() if q in qs}
    qrels_dev = {q: qrels[q] for q in dev_q if q in qrels}
    qrels_hold = {q: qrels[q] for q in hold_q if q in qrels}

    def score_combo(members, weights):
        f_dev = fuse([sub(preds[m], dev_q) for m in members], weights=weights)
        return _score(qrels_dev, f_dev, (10,))["NDCG@10"]

    def full_row(members, weights):
        fused = fuse([preds[m] for m in members], weights=weights)
        m_all = _score(qrels, fused, (1, 10, 100))
        m_hold = _score(qrels_hold, sub(fused, hold_q), (10, 100))
        return {"weights": [round(float(w), 3) for w in weights],
                "NDCG@10": round(m_all["NDCG@10"], 4),
                "Recall@100": round(m_all["Recall@100"], 4),
                "NDCG@1": round(m_all["NDCG@1"], 4),
                "NDCG@10_holdout": round(m_hold["NDCG@10"], 4),
                "Recall@100_holdout": round(m_hold["Recall@100"], 4)}

    report = {"singles": {}, "pairs": {}, "triples": {}, "rrf": {}}
    for s in systems:
        m = _score(qrels, preds[s], (1, 10, 100))
        report["singles"][s] = {k: round(v, 4) for k, v in m.items()}

    # --- 2-way fine sweeps: each system vs bm25, plus the pure-neural pairs ---
    grid = [round(w, 2) for w in np.arange(0.05, 1.0, 0.05)]
    pair_list = []
    if "bm25" in preds:
        pair_list += [(s, "bm25") for s in systems if s != "bm25"]
    pair_list += [p for p in (("den", "spr"), ("emb", "tok"), ("den", "emb"))
                  if all(m in preds for m in p)]
    for pair in pair_list:
        best_w = max(grid, key=lambda w: score_combo(pair, [w, 1 - w]))
        report["pairs"]["+".join(pair)] = full_row(pair, [best_w, 1 - best_w])
        report["rrf"]["+".join(pair)] = _score(
            qrels, fuse([preds[m] for m in pair], method="rrf"), (10, 100))

    # --- 3-way simplex grids ---------------------------------------------------
    for members in (("den", "spr", "bm25"), ("den", "emb", "bm25"),
                    ("emb", "tok", "bm25"), ("den", "spr", "emb", "bm25")):
        if not all(m in preds for m in members):
            continue
        k = len(members)
        best, best_nd = None, -1.0
        for ws in itertools.product(np.arange(0.0, 1.01, 0.1), repeat=k - 1):
            if sum(ws) > 1.0 + 1e-9:
                continue
            weights = list(ws) + [1.0 - sum(ws)]
            nd = score_combo(members, weights)
            if nd > best_nd:
                best, best_nd = weights, nd
        report["triples"]["+".join(members)] = full_row(members, best)

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.preds)), "fusion_explorer.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)

    print("\n| Fusion | weights | NDCG@10 | holdout | Recall@100 |")
    print("|---|---|---|---|---|")
    for section in ("pairs", "triples"):
        for name, r in report[section].items():
            print(f"| {name} | {r['weights']} | {r['NDCG@10']:.4f} "
                  f"| {r['NDCG@10_holdout']:.4f} | {r['Recall@100']:.4f} |")
    print(json.dumps({k: report[k] for k in ("pairs", "triples")}))


if __name__ == "__main__":
    main()
