"""Serve-distribution negative mining from a NEURAL first stage.

Round-4 fixed the CE's train/serve candidate mismatch for the BM25
deployment (rerank_study.py --mine-negatives-depth: negatives drawn from the
live BM25 top-N). The fully-neural deployment still trains its CE on
BM25-mined candidates — the exact mismatch VERDICT r4 next #4 flags. This
script mines the neural equivalent: for every training query, retrieve the
den_spr top-N with a TRAINED HybridModel (the exact first-stage scorer the
fully-neural stack serves: linear min-max fusion 0.7 dense / 0.3 sparse,
retriever/search.py:HybridSearch) and rewrite the training file with those
candidates as negatives, ce_score = the fused serve score. Positives get an
exactly-comparable teacher score via a targeted second pass (their raw
dense/sparse scores pushed through the same per-query min-max constants the
fusion used), so --distill sees one consistent scale per group.

Parity surface: the reference mines hard negatives offline from its own
dual-encoder runs (rerank/__main__.py:90-211 reranks dual-encoder tsv runs;
finetune data ships ce_score teacher annotations, finetune/data_utils.py:
224-233). Fused scores span ~[0,1] -> pass --distill-temp ~0.1 to
rerank_study (BM25's 0-40 span used 4.0).

Usage:
  python scripts/mine_neural_negatives.py --stage .artifacts/q_proj \
      --data .artifacts/docstring_beir \
      --train-file .artifacts/docstring_beir/train/docstrings_bm25.jsonl \
      --out .artifacts/docstring_beir/train/docstrings_neural_s0.jsonl \
      --depth 100
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import numpy as np

from lightretriever_tpu.inference.utils import ensure_device_alive

ensure_device_alive()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    help="quality_study --out dir holding model/ + tokenizer/")
    ap.add_argument("--data", required=True)
    ap.add_argument("--train-file", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--depth", type=int, default=100)
    ap.add_argument("--encode-batch", type=int, default=256)
    ap.add_argument("--max-rows", type=int, default=0, help="debug cap")
    ap.add_argument("--max-corpus", type=int, default=0,
                    help="debug cap on the retrieval corpus (CPU smoke test)")
    ap.add_argument("--fuse-weights", default="0.7,0.3",
                    help="must match the serve-time HybridSearch fusion")
    args = ap.parse_args()

    import jax.numpy as jnp
    from transformers import PreTrainedTokenizerFast

    from lightretriever_tpu.arguments import InferenceArguments
    from lightretriever_tpu.evaluation.harness import load_beir_dataset
    from lightretriever_tpu.inference.encode import SpmdEncoder
    from lightretriever_tpu.models.hybrid import HybridModel
    from lightretriever_tpu.retriever.search import HybridSearch

    w_den, w_spr = (float(w) for w in args.fuse_weights.split(","))
    tok = PreTrainedTokenizerFast.from_pretrained(
        os.path.join(args.stage, "tokenizer"))
    corpus, _, _ = load_beir_dataset(args.data)
    if args.max_corpus:
        corpus = dict(list(corpus.items())[: args.max_corpus])
    rows = []
    with open(args.train_file) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
            if args.max_rows and len(rows) >= args.max_rows:
                break
    print(f"corpus={len(corpus)} train rows={len(rows)}", flush=True)

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, params = HybridModel.load(
        os.path.join(args.stage, "model"), dtype=dtype,
        eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id)
    # Mining needs den + spr only; emb/tok would force an EmbeddingBag build.
    model.model_args = dataclasses.replace(
        model.model_args, hybrid_use_emb_vector=False,
        hybrid_use_token_id_vector=False,
        noncontextual_query_embedding=False)
    enc = SpmdEncoder(model, params, tok, args=InferenceArguments(
        encode_batch_size=args.encode_batch,
        pooling_strategy=model.model_args.pooling_strategy,
        attn_implementation=model.model_args.attn_implementation))

    # --- pass A: den_spr top-N over the full corpus for every train query ----
    queries = {f"t{i}": r["query"] for i, r in enumerate(rows)}
    hs = HybridSearch(enc, vocab_size=len(tok), return_all_results=True,
                      batch_size=args.encode_batch,
                      fuse_weights=(w_den, w_spr))
    t0 = time.perf_counter()
    results = hs.search(corpus, queries, top_k=args.depth)
    print(f"searched {len(queries)} train queries in "
          f"{time.perf_counter()-t0:.0f}s", flush=True)
    den, spr, fused = results["den"], results["spr"], results["den_spr"]

    # --- pass B: exact teacher scores for the positives ----------------------
    # Raw dense/sparse scores of every (query, positive) pair, pushed through
    # the SAME per-query min-max constants fuse_scores_linear used on the
    # retrieved sets (fusion.py:30-51). Positives below the retrieved min
    # land below 0 on the fused scale — honest "teacher ranks it low".
    from lightretriever_tpu.retriever.search import _parse_sparse_query

    pairs = [(i, p) for i, r in enumerate(rows)
             for p in r["positive_passages"]]
    t0 = time.perf_counter()
    pos_den = np.zeros(len(pairs), np.float32)
    pos_spr = np.zeros(len(pairs), np.float32)
    chunk = 4096
    for lo in range(0, len(pairs), chunk):
        sub = pairs[lo:lo + chunk]
        q_reps = enc.encode_queries([rows[i]["query"] for i, _ in sub],
                                    batch_size=args.encode_batch)
        p_reps = enc.encode_corpus([p for _, p in sub],
                                   batch_size=args.encode_batch)
        qd = np.asarray(q_reps["dense_reps"], np.float32)
        pd = np.asarray(p_reps["dense_reps"], np.float32)
        pos_den[lo:lo + len(sub)] = (qd * pd).sum(-1)
        # Sparse reps come back converter-quantized (query: impact-repeated
        # pseudo-text; doc: json impact vector) — score them the way the
        # impact engine does, so the positives land on the IDENTICAL scale
        # as the retrieved candidates' scores.
        for j, (qs, ps) in enumerate(zip(q_reps["sparse_reps"],
                                         p_reps["sparse_reps"])):
            qv = _parse_sparse_query(qs)
            pv = _parse_sparse_query(ps)
            pos_spr[lo + j] = float(sum(
                c * pv.get(t, 0) for t, c in qv.items()))
    print(f"scored {len(pairs)} positives in {time.perf_counter()-t0:.0f}s",
          flush=True)

    eps = 1e-8

    def _minmax(run_q):
        vals = np.array(list(run_q.values()), np.float32)
        return (float(vals.min()), float(vals.max())) if len(vals) else (0.0, 1.0)

    # --- rewrite rows ---------------------------------------------------------
    pos_score = {}
    for (i, p), sd, ss in zip(pairs, pos_den, pos_spr):
        qid = f"t{i}"
        lo_d, hi_d = _minmax(den.get(qid, {}))
        lo_s, hi_s = _minmax(spr.get(qid, {}))
        pos_score.setdefault(i, {})[p["docid"]] = (
            w_den * (float(sd) - lo_d) / (hi_d - lo_d + eps)
            + w_spr * (float(ss) - lo_s) / (hi_s - lo_s + eps))

    n_out = 0
    skipped = 0
    with open(args.out, "w") as f:
        for i, r in enumerate(rows):
            qid = f"t{i}"
            cand = sorted(fused.get(qid, {}).items(), key=lambda kv: -kv[1])
            pos_ids = {p["docid"] for p in r["positive_passages"]}
            negs = [{**corpus[pid], "docid": pid, "ce_score": round(s, 6)}
                    for pid, s in cand[: args.depth] if pid not in pos_ids
                    and pid in corpus]
            if not negs:
                skipped += 1
                continue
            out_row = dict(r)
            out_row["positive_passages"] = [
                {**p, "ce_score": round(pos_score[i][p["docid"]], 6)}
                for p in r["positive_passages"]]
            out_row["negative_passages"] = negs
            f.write(json.dumps(out_row) + "\n")
            n_out += 1
    # Mining provenance for the summary / docs
    meta = {"rows": n_out, "skipped_no_candidates": skipped,
            "depth": args.depth, "stage": args.stage,
            "fuse_weights": [w_den, w_spr],
            "pos_below_retrieved_min_frac": round(float(np.mean([
                min(s.values()) < 0 for s in pos_score.values()])), 4)}
    with open(args.out + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta), flush=True)


if __name__ == "__main__":
    main()
