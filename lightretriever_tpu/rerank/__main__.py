"""Offline rerank CLI (parity: rerank/__main__.py:47-211).

Rescores the top-k of a first-stage trec run with a cross-encoder and writes
a reranked run. The reference shards the dataset per rank and merges pickles
on rank0; here one SPMD process drives the mesh.

Usage:
  python -m lightretriever_tpu.rerank MODEL_DIR RUN_TSV QUERIES_JSONL \
      CORPUS_JSONL OUT_TSV [--top-k 100] [--batch-size 64] [--max-len 1024]
"""
from __future__ import annotations

import argparse
import logging

import jax

from ..arguments import TrainingArguments
from ..models.config import DecoderConfig
from ..utils.io import read_corpus
from ..utils.tokenizer_utils import load_tokenizer
from .fit import RerankerArguments, build_reranker
from .inference import RerankerEncoder, offline_rerank


def main():
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("run_tsv")
    ap.add_argument("queries_jsonl")
    ap.add_argument("corpus_jsonl")
    ap.add_argument("out_tsv")
    ap.add_argument("--top-k", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--reranker-type", default="cross_encoder",
                    choices=["cross_encoder", "cross_encoder_logits"])
    ap.add_argument("--query-prompt", default="")
    args = ap.parse_args()

    tok = load_tokenizer(args.model_dir)
    ma = RerankerArguments(model_name_or_path=args.model_dir,
                           pooling_strategy="lasttoken",
                           reranker_type=args.reranker_type)
    model, params = build_reranker(ma, TrainingArguments(), tokenizer=tok)
    from ..parallel.mesh import create_mesh

    mesh = create_mesh((-1,), ("data",)) if jax.device_count() > 1 else None
    reranker = RerankerEncoder(model, params, tok, mesh=mesh,
                               batch_size=args.batch_size, max_len=args.max_len)
    queries = {str(r.get("_id", r.get("id"))): r["text"]
               for r in read_corpus(args.queries_jsonl)}
    corpus = {str(r.get("_id", r.get("id"))): r
              for r in read_corpus(args.corpus_jsonl)}
    offline_rerank(reranker, args.run_tsv, queries, corpus, args.out_tsv,
                   top_k=args.top_k, query_prompt=args.query_prompt)


if __name__ == "__main__":
    main()
