"""Recall-vs-QPS frontier of every ANN engine on a 1M-doc corpus (one chip).

VERDICT r1 #8: the HNSW capability slot is argued to be covered by
IVF probing + approx_max_k (retriever/ann.py docstring), but the claim was
evidence-free. This script measures the full frontier — exact fused-scan,
approx_max_k (recall_target x oversample), IVF (nprobe sweep), PQ
(+fp rerank) — against exact ground truth on >=1M synthetic docs, matching
the reference's Faiss families (faiss_search.py:296-476).

Usage: python scripts/ann_frontier.py [--n 1000000] [--q 2048] [--k 100]
Prints one markdown table + one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:  # sitecustomize pins the TPU tunnel; flip explicitly
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from lightretriever_tpu.inference.utils import ensure_device_alive

ensure_device_alive()


def timed_pipelined(idx, queries_dev, k, n_iter):
    s = i = None
    t0 = time.perf_counter()
    for _ in range(n_iter):
        s, i = idx.search(queries_dev, k, return_device=True)
    s, i = np.asarray(s), np.asarray(i)
    return s, i, (time.perf_counter() - t0) / n_iter


def timed_single(fn, n_iter=3):
    out = fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn()
    return out, (time.perf_counter() - t0) / n_iter


def recall_vs(i_ref: np.ndarray, i_test: np.ndarray, k: int) -> float:
    return float(np.mean([
        len(np.intersect1d(a[:k], b[:k])) / k for a, b in zip(i_test, i_ref)]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--q", type=int, default=2048)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--skip-hnsw", action="store_true")
    ap.add_argument("--only-hnsw", action="store_true",
                    help="exact ground truth + HNSW rows only (skip "
                         "approx/IVF/PQ — they have 1M rows already)")
    ap.add_argument("--hnsw-docs", type=int, default=100_000,
                    help="HNSW corpus cap (single-threaded host build)")
    args = ap.parse_args()
    if jax.default_backend() != "tpu":  # cap, don't override explicit values
        args.n, args.q = min(args.n, 100_000), min(args.q, 256)

    rng = np.random.default_rng(0)
    # Clustered corpus (not iid gaussian): IVF/graph methods live off cluster
    # structure, so give them a realistic embedding geometry — 1024 centers
    # with within-cluster noise, like encoder output manifolds.
    n_centers = 1024
    centers = rng.standard_normal((n_centers, args.d), dtype=np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_centers, args.n)
    corpus = centers[assign] + 0.35 * rng.standard_normal(
        (args.n, args.d), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = centers[rng.integers(0, n_centers, args.q)] + \
        0.35 * rng.standard_normal((args.q, args.d), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    from lightretriever_tpu.retriever.ann import IVFIndex, PQIndex
    from lightretriever_tpu.retriever.knn import FlatIPIndex

    rows = []

    # --- exact ground truth ---------------------------------------------------
    idx_exact = FlatIPIndex(mesh=None, dtype=jnp.bfloat16, topk_method="exact")
    idx_exact.add(corpus)
    idx_exact.search(queries[:8], args.k)  # build + compile
    q_dev = jnp.asarray(queries, jnp.bfloat16)
    _, i_ref, t = timed_pipelined(idx_exact, q_dev, args.k, 3)
    rows.append(("exact fused-scan", args.q / t, 1.0, "ground truth"))
    print(f"exact: {args.q / t:.0f} QPS", flush=True)

    # --- approx_max_k frontier -------------------------------------------------
    for rt, ov in [] if args.only_hnsw else \
            [(0.99, 1), (0.99, 2), (0.95, 1), (0.95, 4), (0.9, 1)]:
        idx = FlatIPIndex(mesh=None, dtype=jnp.bfloat16, topk_method="approx",
                          recall_target=rt, oversample=ov)
        idx._host_chunks, idx._n = idx_exact._host_chunks, idx_exact._n
        idx.search(q_dev[:8], args.k)
        _, i_ap, t = timed_pipelined(idx, q_dev, args.k, 5)
        r = recall_vs(i_ref, i_ap, args.k)
        rows.append((f"approx rt={rt} ov={ov}", args.q / t, r, "flat, fused top-k"))
        print(f"approx rt={rt} ov={ov}: {args.q / t:.0f} QPS r={r:.4f}", flush=True)

    # --- IVF nprobe sweep --------------------------------------------------------
    if not args.only_hnsw:
        n_clusters = max(int(np.sqrt(args.n)) * 2, 64)
        ivf = IVFIndex(n_clusters=n_clusters, dtype=jnp.bfloat16, query_chunk=256)
        ivf.add(corpus)
        ivf._finalize()
        for nprobe in (4, 8, 16, 32, 64):
            if nprobe > n_clusters:
                continue
            (s, i), t = timed_single(
                lambda np_=nprobe: ivf.search(queries, args.k, nprobe=np_))
            r = recall_vs(i_ref, i, args.k)
            rows.append((f"IVF C={n_clusters} nprobe={nprobe}", args.q / t, r,
                         "k-means coarse quantizer"))
            print(f"ivf nprobe={nprobe}: {args.q / t:.0f} QPS r={r:.4f}",
                  flush=True)

    # --- HNSW (native host graph; optional — build is host-CPU bound) -----------
    if not args.skip_hnsw:
        from lightretriever_tpu.retriever.hnsw import HNSWIndex

        n_h = min(args.n, args.hnsw_docs)
        hnsw = HNSWIndex(hnsw_store_n=32, hnsw_ef_construction=100)
        hnsw.add(corpus[:n_h])
        hnsw._finalize()
        if n_h == args.n:
            i_ref_h = i_ref
        else:  # ground truth on the subset
            sub = FlatIPIndex(mesh=None, dtype=jnp.bfloat16, topk_method="exact")
            sub.add(corpus[:n_h])
            sub.search(queries[:8], args.k)
            _, i_ref_h, _ = timed_pipelined(sub, q_dev, args.k, 1)
        for ef in (64, 128, 512):
            (s, i), t = timed_single(
                lambda ef_=ef: hnsw.search(queries, args.k, ef_search=ef_),
                n_iter=1)
            r = recall_vs(i_ref_h, i, args.k)
            rows.append((f"HNSW M=32 ef={ef} (n={n_h}, host CPU)",
                         args.q / t, r,
                         f"native graph walk; build {hnsw.build_seconds:.0f}s"))
            print(f"hnsw ef={ef} (n={n_h}): {args.q / t:.0f} QPS r={r:.4f}",
                  flush=True)

    # --- PQ ± rerank -------------------------------------------------------------
    if not args.only_hnsw:
        _pq_rows(args, rows, corpus, queries, i_ref)

    print(f"\n| Engine | QPS | recall@{args.k} | notes |")
    print("|---|---|---|---|")
    for name, qps, r, note in rows:
        print(f"| {name} | {qps:,.0f} | {r:.4f} | {note} |")
    print(json.dumps({
        "n_docs": args.n, "n_queries": args.q, "k": args.k,
        "backend": jax.default_backend(),
        "rows": [{"engine": n, "qps": round(q, 1), "recall": round(r, 4)}
                 for n, q, r, _ in rows],
    }))


def _pq_rows(args, rows, corpus, queries, i_ref):
    pq = PQIndex(n_subspaces=32, keep_fp=True)
    pq.add(corpus)
    pq._finalize()
    for rerank in (False, True):
        (s, i), t = timed_single(
            lambda rr=rerank: pq.search(queries, args.k, rerank_with_fp=rr),
            n_iter=2)
        r = recall_vs(i_ref, i, args.k)
        rows.append((f"PQ m=32 rerank={rerank}", args.q / t, r,
                     "32 B/doc ADC-as-GEMM"))
        print(f"pq rerank={rerank}: {args.q / t:.0f} QPS r={r:.4f}", flush=True)


if __name__ == "__main__":
    main()
