"""Driver benchmark: exact-kNN query throughput on TPU vs CPU brute force.

Measures the north-star serving path (BASELINE.md: ">10x query QPS vs CPU
Faiss exact search"): top-k inner-product search over a synthetic corpus,
TPU MXU bf16 matmul + on-chip top-k vs numpy fp32 brute force on the host
CPU (Faiss is not available in this image; numpy GEMM+argpartition is the
same exact-search algorithm).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "qps", "vs_baseline": tpu_qps/cpu_qps}
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

N_DOCS = 500_000
DIM = 1024
N_QUERIES = 2048
TOP_K = 100


def main():
    global N_DOCS, N_QUERIES
    backend = jax.default_backend()
    if backend != "tpu":  # debug runs off-TPU: shrink to stay tractable
        N_DOCS, N_QUERIES = 50_000, 256
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N_DOCS, DIM), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((N_QUERIES, DIM), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    # --- TPU (device) exact search -----------------------------------------
    from lightretriever_tpu.retriever.knn import FlatIPIndex

    idx = FlatIPIndex(mesh=None, dtype=jnp.bfloat16)
    idx.add(corpus)
    s, i = idx.search(queries, TOP_K)  # build + compile warmup at full shape
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        s, i = idx.search(queries, TOP_K)
    t_tpu = (time.perf_counter() - t0) / n_iter
    tpu_qps = N_QUERIES / t_tpu

    # --- CPU brute-force baseline (same exact algorithm) --------------------
    nq_cpu = 64
    t0 = time.perf_counter()
    scores = queries[:nq_cpu] @ corpus.T
    part = np.argpartition(-scores, TOP_K - 1, axis=1)[:, :TOP_K]
    np.take_along_axis(scores, part, axis=1)
    t_cpu = time.perf_counter() - t0
    cpu_qps = nq_cpu / t_cpu

    # Sanity: TPU top-1 agrees with CPU exact on the measured queries
    cpu_top1 = scores.argmax(axis=1)
    agree = float((i[:nq_cpu, 0] == cpu_top1).mean())

    print(json.dumps({
        "metric": f"exact_knn_query_qps_{N_DOCS // 1000}k_d{DIM}_top{TOP_K}_{backend}",
        "value": round(tpu_qps, 1),
        "unit": "qps",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
        "cpu_baseline_qps": round(cpu_qps, 1),
        "top1_agreement_vs_fp32_cpu": agree,
    }))


if __name__ == "__main__":
    main()
