"""Driver benchmark: exact-kNN query throughput on TPU vs CPU brute force.

Measures the north-star serving path (BASELINE.md: ">10x query QPS vs CPU
Faiss exact search"): top-k inner-product search over a synthetic corpus on
one chip. Two engine modes are timed:

  exact   — fused scan (matmul + running lax.top_k carry), bitwise top-k
  approx  — lax.approx_max_k fused into the matmul epilogue (XLA
            PartialReduce, the TPU-native top-k primitive), recall_target
            0.99; recall vs the exact engine is measured and reported

The headline number is the serving configuration (approx @ measured recall);
``exact_qps`` and the CPU fp32 brute-force baseline ride along in the same
JSON line. CPU baseline = numpy GEMM+argpartition, the same exact-search
algorithm Faiss-CPU runs (Faiss itself is not in this image).

Timing notes (CLAUDE.md): the axon tunnel adds ~30ms per host round trip and
block_until_ready is unreliable — so each timed region dispatches n_iter
searches and forces one materialization at the end.
"""
import json
import sys
import time

import numpy as np

import jax

if "--cpu" in sys.argv:  # debug runs off-TPU (sitecustomize pins the tunnel)
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

N_DOCS = 500_000
DIM = 1024
N_QUERIES = 2048
TOP_K = 100


def _time_search(idx, queries, k, n_iter, n_reps=3):
    """Pipelined throughput, median of n_reps repetitions: each rep
    dispatches n_iter searches on-device and forces one materialization at
    the end (per-call sync through the axon tunnel would otherwise dominate:
    ~30ms round trip + result transfer per call). Median-of-3 damps tunnel
    run-to-run variance so the driver number matches the documented one
    (VERDICT r2 weak #6)."""
    s = i = None
    times = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            s, i = idx.search(queries, k, return_device=True)
        s, i = np.asarray(s), np.asarray(i)
        times.append((time.perf_counter() - t0) / n_iter)
    return s, i, float(np.median(times))


def main():
    global N_DOCS, N_QUERIES
    if jax.config.jax_platforms != "cpu":
        # The driver runs bench.py at round end while a study chain may still
        # hold the single tunnel slot; claim it BEFORE backend init (which
        # would otherwise wedge on a futex — CLAUDE.md one-client rule).
        from lightretriever_tpu.utils.chip_claim import claim_chip
        claim_chip()
    backend = jax.default_backend()
    if backend != "tpu":  # debug runs off-TPU: shrink to stay tractable
        N_DOCS, N_QUERIES = 50_000, 256
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N_DOCS, DIM), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((N_QUERIES, DIM), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    from lightretriever_tpu.retriever.knn import FlatIPIndex

    # --- exact engine (fused scan) ------------------------------------------
    idx_exact = FlatIPIndex(mesh=None, dtype=jnp.bfloat16, topk_method="exact")
    idx_exact.add(corpus)
    idx_exact.search(queries, TOP_K)  # build + compile warmup
    s_ex, i_ex, t_exact = _time_search(idx_exact, queries, TOP_K, n_iter=5)
    exact_qps = N_QUERIES / t_exact

    # --- serving engine (fused approx_max_k, rt=0.99) -----------------------
    # queries device-resident, as in the fused server (query embeddings are
    # produced on device by the EmbeddingBag lookup / encoder forward)
    idx_ap = FlatIPIndex(mesh=None, dtype=jnp.bfloat16, topk_method="approx",
                         recall_target=0.99)
    idx_ap._host_chunks, idx_ap._n = idx_exact._host_chunks, idx_exact._n
    q_dev = jnp.asarray(queries, jnp.bfloat16)
    idx_ap.search(q_dev, TOP_K)  # compile warmup
    s_ap, i_ap, t_ap = _time_search(idx_ap, q_dev, TOP_K, n_iter=10)
    tpu_qps = N_QUERIES / t_ap
    recall = float(np.mean([
        len(np.intersect1d(a, b)) / TOP_K for a, b in zip(i_ap, i_ex)]))

    # --- CPU brute-force baseline (same exact algorithm) --------------------
    # Pinned for cross-round comparability (VERDICT r3 next #7: r1/r2/r3
    # measured 42/17/65 QPS from BLAS thread-count + ambient-load variance):
    # exactly ONE BLAS thread via threadpoolctl (deterministic on any
    # machine), median of 5 reps after a warmup rep. Raw per-query ms is
    # reported for both sides; the multiplier is derived, not primary.
    nq_cpu = 64
    cpu_times = []
    try:
        from threadpoolctl import threadpool_limits
        _limit = threadpool_limits(limits=1)
        cpu_threads = 1
    except ImportError:  # fall back to ambient BLAS config
        _limit, cpu_threads = None, -1
    try:
        for rep in range(6):
            t0 = time.perf_counter()
            scores = queries[:nq_cpu] @ corpus.T
            part = np.argpartition(-scores, TOP_K - 1, axis=1)[:, :TOP_K]
            np.take_along_axis(scores, part, axis=1)
            if rep:  # rep 0 = cache/allocator warmup
                cpu_times.append(time.perf_counter() - t0)
    finally:
        if _limit is not None:
            _limit.unregister()
    t_cpu = float(np.median(cpu_times))
    cpu_qps = nq_cpu / t_cpu

    # Sanity: exact engine top-1 agrees with CPU fp32 exact
    cpu_top1 = scores.argmax(axis=1)
    agree = float((i_ex[:nq_cpu, 0] == cpu_top1).mean())

    print(json.dumps({
        "metric": f"knn_query_qps_{N_DOCS // 1000}k_d{DIM}_top{TOP_K}_{backend}",
        "value": round(tpu_qps, 1),
        "unit": "qps",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
        "serving_recall_vs_exact": round(recall, 4),
        "exact_qps": round(exact_qps, 1),
        "exact_vs_cpu": round(exact_qps / cpu_qps, 2),
        "cpu_baseline_qps": round(cpu_qps, 1),
        "cpu_baseline_threads": cpu_threads,
        "cpu_ms_per_query": round(t_cpu / nq_cpu * 1000, 3),
        "tpu_ms_per_query": round(t_ap / N_QUERIES * 1000, 4),
        "exact_tpu_ms_per_query": round(t_exact / N_QUERIES * 1000, 4),
        "exact_top1_agreement_vs_fp32_cpu": agree,
    }))


if __name__ == "__main__":
    main()
