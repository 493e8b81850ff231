"""Validate InvertedImpactIndex recall on REAL trained sparse outputs.

VERDICT r1 weak #7: the inverted engine's 0.997 recall was measured on
synthetic impacts; real SPLADE-style weight distributions are heavier-tailed
and the postings cap (postings_cap/term) could hurt. This script loads the
quality-study model (scripts/quality_study.py --out dir), encodes real
corpus/query sparse reps through the production SpmdEncoder path, and
compares the inverted engine against the exact exhaustive engine on
recall@k and QPS — the evidence behind SparseSearch's engine defaults.

Usage:
  python scripts/sparse_engine_real_check.py --model /tmp/q_tpu_full \
      --data /tmp/docstring_beir [--docs 20000] [--queries 512]
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--model", required=True, help="quality_study --out dir")
    ap.add_argument("--data", required=True, help="BEIR data dir")
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--out", default=None,
                    help="also write the summary JSON here (docs-lockstep: "
                         "PERFORMANCE.md cites committed results/*.json)")
    args = ap.parse_args()

    from transformers import PreTrainedTokenizerFast

    from lightretriever_tpu.arguments import InferenceArguments
    from lightretriever_tpu.evaluation.harness import load_beir_dataset
    from lightretriever_tpu.inference.encode import SpmdEncoder
    from lightretriever_tpu.models.hybrid import HybridModel
    from lightretriever_tpu.retriever.sparse_scorer import (
        InvertedImpactIndex,
        SparseImpactIndex,
    )

    tok = PreTrainedTokenizerFast.from_pretrained(
        os.path.join(args.model, "tokenizer"))
    model, params = HybridModel.load(os.path.join(args.model, "model"))
    vocab = model.config_qry.vocab_size

    corpus, queries, _ = load_beir_dataset(args.data)
    docs = [v for v in list(corpus.values())[: args.docs]]
    qs = list(queries.values())[: args.queries]

    enc = SpmdEncoder(model, params, tok, args=InferenceArguments(
        encode_batch_size=256, pooling_strategy="lasttoken",
        attn_implementation="xla"))
    if getattr(model.model_args, "hybrid_use_emb_vector", False):
        enc.cache_emb_bag()  # query encode requires the table when enabled
    t0 = time.perf_counter()
    d_emb = enc.encode_corpus(docs, batch_size=256)
    q_emb = enc.encode_queries(qs, batch_size=256)

    def to_vecs(rep):
        # SpmdEncoder returns converter output: {token_id: quantized_impact}
        # dicts (the Anserini-json form); keys may be str after json round
        # trips. Dense [N, V] arrays are also accepted.
        if isinstance(rep, np.ndarray):
            return [{int(t): float(row[t]) for t in np.nonzero(row > 0)[0]}
                    for row in rep]
        out = []
        for vec in rep:
            if isinstance(vec, str):
                try:  # converter json-string form
                    vec = json.loads(vec)
                except json.JSONDecodeError:
                    # pseudo-text form: "id id id ..." repeated by impact
                    from collections import Counter

                    vec = dict(Counter(int(t) for t in vec.split()))
            out.append({int(t): float(x) for t, x in vec.items()})
        return out

    d_vecs = to_vecs(d_emb["sparse_reps"])
    q_vecs = to_vecs(q_emb["sparse_reps"])
    print(f"encoded {len(docs)} docs / {len(qs)} queries "
          f"in {time.perf_counter()-t0:.0f}s; "
          f"doc L0={np.mean([len(v) for v in d_vecs]):.1f} "
          f"query L0={np.mean([len(v) for v in q_vecs]):.1f}", flush=True)

    exact = SparseImpactIndex(vocab_size=vocab)
    exact.add(d_vecs, quantize=False)  # converter already quantized
    exact.search(q_vecs[:8], args.k)
    t0 = time.perf_counter()
    _, i_ex = exact.search(q_vecs, args.k)
    t_ex = time.perf_counter() - t0
    i_ex = np.asarray(i_ex)

    results = {"exhaustive": {"qps": len(qs) / t_ex, "recall": 1.0}}
    for cap in (256, 1024, 4096):
        inv = InvertedImpactIndex(vocab_size=vocab, postings_cap=cap)
        inv.add(d_vecs, quantize=False)
        inv.search(q_vecs[:8], args.k)
        t0 = time.perf_counter()
        _, i_in = inv.search(q_vecs, args.k)
        t_in = time.perf_counter() - t0
        i_in = np.asarray(i_in)
        rec = float(np.mean([
            len(np.intersect1d(a[a >= 0], b[b >= 0])) / max((b >= 0).sum(), 1)
            for a, b in zip(i_in, i_ex)]))
        results[f"inverted cap={cap}"] = {
            "qps": len(qs) / t_in, "recall": round(rec, 4)}
        print(f"cap={cap}: recall@{args.k}={rec:.4f} "
              f"qps={len(qs)/t_in:.0f} (exact {len(qs)/t_ex:.0f})", flush=True)

    # --- pruned fast engines (round 3, VERDICT r2 next #2) -------------------
    from lightretriever_tpu.retriever.block_max import (
        BlockMaxImpactIndex,
        ImpactOrderedIndex,
    )

    def run_fast(name, idx, full_warm=False):
        idx.add(d_vecs, quantize=False)
        # tiered compiles per (bucket-profile, block) shape: warm at the
        # measured shapes so the timed pass is compile-free
        idx.search(q_vecs if full_warm else q_vecs[:8], args.k)
        t0 = time.perf_counter()
        _, i_f = idx.search(q_vecs, args.k)
        t_f = time.perf_counter() - t0
        i_f = np.asarray(i_f)
        rec = float(np.mean([
            len(np.intersect1d(a[a >= 0], b[b >= 0])) / max((b >= 0).sum(), 1)
            for a, b in zip(i_f, i_ex)]))
        results[name] = {
            "qps": len(qs) / t_f, "recall": round(rec, 4),
            "certified": round(idx.last_certified_frac, 4)}
        print(f"{name}: recall@{args.k}={rec:.4f} "
              f"certified={idx.last_certified_frac:.3f} qps={len(qs)/t_f:.0f}",
              flush=True)

    for cap in (128, 256, 1024):
        run_fast(f"impact cap={cap}",
                 ImpactOrderedIndex(vocab_size=vocab, postings_cap=cap))
    for probe in (32, 128):
        run_fast(f"blockmax probe={probe}",
                 BlockMaxImpactIndex(vocab_size=vocab, block_docs=128,
                                     probe_blocks=probe))

    from lightretriever_tpu.retriever.tiered_impact import TieredImpactIndex

    run_fast("tiered (exact)", TieredImpactIndex(vocab_size=vocab),
             full_warm=True)

    # --- dense ANN engines on the SAME real embeddings -----------------------
    # (the IVF-vs-approx question is geometry-dependent; synthetic corpora
    # answer it unfairly — scripts/ann_frontier.py discussion)
    import jax.numpy as jnp

    from lightretriever_tpu.retriever.ann import IVFIndex
    from lightretriever_tpu.retriever.knn import FlatIPIndex

    d_den = np.asarray(d_emb["dense_reps"], np.float32)
    q_den = np.asarray(q_emb["dense_reps"], np.float32)
    flat = FlatIPIndex(mesh=None, dtype=jnp.bfloat16, topk_method="exact")
    flat.add(d_den)
    flat.search(q_den[:8], args.k)
    t0 = time.perf_counter()
    _, i_ref = flat.search(q_den, args.k)
    t_flat = time.perf_counter() - t0
    i_ref = np.asarray(i_ref)
    dense_rows = {"exact": {"qps": len(qs) / t_flat, "recall": 1.0}}
    ap = FlatIPIndex(mesh=None, dtype=jnp.bfloat16, topk_method="approx",
                     recall_target=0.99)
    ap.add(d_den)
    ap.search(q_den[:8], args.k)
    t0 = time.perf_counter()
    _, i_ap = ap.search(q_den, args.k)
    t_ap = time.perf_counter() - t0
    rec_ap = float(np.mean([len(np.intersect1d(a, b)) / args.k
                            for a, b in zip(np.asarray(i_ap), i_ref)]))
    dense_rows["approx rt=0.99"] = {"qps": len(qs) / t_ap,
                                    "recall": round(rec_ap, 4)}
    ivf = IVFIndex(nprobe=32)
    ivf.add(d_den)
    for nprobe in (8, 32, 64):
        t0 = time.perf_counter()
        _, i_iv = ivf.search(q_den, args.k, nprobe=nprobe)
        t_iv = time.perf_counter() - t0
        rec_iv = float(np.mean([len(np.intersect1d(a[a >= 0], b)) / args.k
                                for a, b in zip(np.asarray(i_iv), i_ref)]))
        dense_rows[f"IVF nprobe={nprobe}"] = {"qps": len(qs) / t_iv,
                                              "recall": round(rec_iv, 4)}
        print(f"dense ivf nprobe={nprobe}: recall={rec_iv:.4f} "
              f"qps={len(qs)/t_iv:.0f}", flush=True)

    summary = {"docs": len(docs), "queries": len(qs), "k": args.k,
               "model": args.model, "engines": results,
               "dense_engines": dense_rows}
    print(json.dumps(summary))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
