"""Annotate a train jsonl with BM25 teacher scores (`ce_score`) — round 3.

VERDICT r2 next #1(c): the ce_scores KL-distillation path
(models/encoder.py compute_loss) accepts any teacher, and BM25 scores are
free in-image. This computes, for every (query, passage) pair in the
training file, the exact BM25 score the baseline engine would assign
(same lucene_analyze analysis incl. Porter stemming, same k1/b, Lucene
idf, corpus statistics from the FULL benchmark corpus — matching
retriever/sparse_scorer.py:BM25Index._finalize), and writes it as
``ce_score`` on each positive/negative passage. Pure host-side: ~170k
pair scores, no accelerator needed.

Usage:
  python scripts/bm25_teacher.py --data /tmp/docstring_beir \
      --out /tmp/docstring_beir/train/docstrings_bm25.jsonl
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lightretriever_tpu.inference.collator import format_text
from lightretriever_tpu.retriever.sparse_scorer import lucene_analyze


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="BEIR benchmark dir")
    ap.add_argument("--train-file", default=None,
                    help="default: <data>/train/docstrings.jsonl")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k1", type=float, default=0.9)
    ap.add_argument("--b", type=float, default=0.4)
    args = ap.parse_args()
    train_file = args.train_file or os.path.join(
        args.data, "train", "docstrings.jsonl")

    # --- corpus statistics (identical to BM25Index._finalize) ---------------
    t0 = time.perf_counter()
    df: Counter = Counter()
    n_docs = 0
    total_len = 0
    with open(os.path.join(args.data, "corpus.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            toks = lucene_analyze(format_text(d))
            n_docs += 1
            total_len += len(toks)
            df.update(set(toks))
    avdl = max(total_len / max(n_docs, 1), 1e-9)
    idf = {t: math.log(1.0 + (n_docs - c + 0.5) / (c + 0.5))
           for t, c in df.items()}
    print(f"corpus stats: {n_docs} docs, avdl={avdl:.1f}, "
          f"{len(idf)} terms in {time.perf_counter()-t0:.0f}s", flush=True)

    k1, b = args.k1, args.b

    def score(query_toks: list[str], passage: dict) -> float:
        doc_toks = lucene_analyze(format_text(passage))
        tf = Counter(doc_toks)
        norm = k1 * (1.0 - b + b * len(doc_toks) / avdl)
        s = 0.0
        for t in query_toks:
            c = tf.get(t)
            if c:
                s += idf.get(t, 0.0) * (c * (k1 + 1.0)) / (c + norm)
        return s

    t0 = time.perf_counter()
    n_rows = n_pairs = 0
    with open(train_file) as fin, open(args.out, "w") as fout:
        for line in fin:
            row = json.loads(line)
            q_toks = lucene_analyze(row["query"])
            for p in row["positive_passages"]:
                p["ce_score"] = round(score(q_toks, p), 4)
                n_pairs += 1
            for p in row["negative_passages"]:
                p["ce_score"] = round(score(q_toks, p), 4)
                n_pairs += 1
            fout.write(json.dumps(row) + "\n")
            n_rows += 1
    print(json.dumps({"rows": n_rows, "pairs": n_pairs,
                      "seconds": round(time.perf_counter() - t0, 1)}))


if __name__ == "__main__":
    main()
