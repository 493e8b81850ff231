"""Block-max engine scaling study: 1M synthetic docs (VERDICT r2 next #2).

Generates SPLADE-shaped synthetic impact vectors (Zipf-heavy term use, one
dominant topic term — the distribution real trained outputs show in
scripts/sparse_engine_real_check.py) at corpus sizes up to 1M and measures
exhaustive vs block-max QPS and recall@100 on the real chip.

Usage:
  python scripts/with_tpu.sh python scripts/blockmax_scale.py [--max-docs 1000000]
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

from lightretriever_tpu.retriever.block_max import (
    BlockMaxImpactIndex,
    ImpactOrderedIndex,
)
from lightretriever_tpu.retriever.sparse_scorer import SparseImpactIndex
from lightretriever_tpu.retriever.tiered_impact import TieredImpactIndex


_TOPIC_POOL = 24   # terms per topic vocabulary


def _topic_terms(vocab, n_topics, rng):
    """Each topic owns a pool of related terms (SPLADE expansion shape:
    relevant docs/queries share SEVERAL heavy terms, not one)."""
    return rng.integers(0, vocab, size=(n_topics, _TOPIC_POOL))


def gen_vecs(rng, n, vocab, nnz, pools, heavy):
    """``heavy`` terms drawn from the doc's topic pool (weights 100-400),
    the rest Zipf-tail background (weights 10-120)."""
    n_topics = pools.shape[0]
    topic = rng.integers(0, n_topics, size=n)
    pick = rng.random((n, _TOPIC_POOL)).argsort(1)[:, :heavy]
    heavy_t = pools[topic[:, None], pick]
    heavy_w = rng.uniform(100, 400, size=(n, heavy))
    n_tail = max(nnz - heavy, 0)
    u = rng.random((n, n_tail))
    tail_t = np.minimum((vocab - 1) * u ** 3.0, vocab - 1).astype(np.int64)
    tail_w = rng.integers(10, 120, size=(n, n_tail)).astype(np.float64)
    vecs = []
    for i in range(n):
        v = {int(t): float(w) for t, w in zip(tail_t[i], tail_w[i])}
        for t, w in zip(heavy_t[i], heavy_w[i]):
            v[int(t)] = max(float(w), v.get(int(t), 0.0))
        vecs.append(v)
    return vecs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-docs", type=int, default=1_000_000)
    ap.add_argument("--sizes", type=str, default=None,
                    help="comma-separated corpus sizes (overrides the default ladder)")
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--nnz", type=int, default=48)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--probe", type=int, default=64)
    ap.add_argument("--tiered-only", action="store_true",
                    help="skip the slow round-2 pruned engines")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = [s for s in (100_000, 300_000, 1_000_000) if s <= args.max_docs]
    pools = _topic_terms(args.vocab, 2000, rng)
    q_vecs = gen_vecs(rng, args.queries, args.vocab, 8, pools, heavy=4)
    rows = {}
    for n in sizes:
        t0 = time.perf_counter()
        d_vecs = gen_vecs(rng, n, args.vocab, args.nnz, pools, heavy=8)
        print(f"n={n}: generated in {time.perf_counter()-t0:.0f}s", flush=True)

        exact = SparseImpactIndex(vocab_size=args.vocab)
        exact.add(d_vecs, quantize=False)
        exact.search(q_vecs[:8], args.k)   # compile + build
        t0 = time.perf_counter()
        _, i_ex = exact.search(q_vecs, args.k)
        t_ex = time.perf_counter() - t0
        i_ex = np.asarray(i_ex)
        del exact

        rows[n] = {"exhaustive_qps": round(args.queries / t_ex, 1)}

        def run(name, idx):
            idx.add(d_vecs, quantize=False)
            t0 = time.perf_counter()
            idx._finalize()
            t_build = time.perf_counter() - t0
            idx.search(q_vecs, args.k)      # compile at the measured shapes
            t0 = time.perf_counter()
            _, i_f = idx.search(q_vecs, args.k)
            t_f = time.perf_counter() - t0
            i_f = np.asarray(i_f)
            rec = float(np.mean([
                len(np.intersect1d(a[a >= 0], b[b >= 0]))
                / max((b >= 0).sum(), 1)
                for a, b in zip(i_f, i_ex)]))
            rows[n][name] = {
                "qps": round(args.queries / t_f, 1),
                "speedup": round(t_ex / t_f, 1),
                "recall": round(rec, 4),
                "certified": round(idx.last_certified_frac, 4),
                "build_s": round(t_build, 1),
            }
            print(f"n={n} {name}: {json.dumps(rows[n][name])}", flush=True)

        run("tiered (exact)", TieredImpactIndex(vocab_size=args.vocab))
        if not args.tiered_only:
            run("blockmax", BlockMaxImpactIndex(
                vocab_size=args.vocab, block_docs=128, probe_blocks=args.probe))
            for cap in (256, 1024):
                run(f"impact cap={cap}", ImpactOrderedIndex(
                    vocab_size=args.vocab, postings_cap=cap))
        del d_vecs

    print(json.dumps({"probe": args.probe, "k": args.k, "rows": rows}))


if __name__ == "__main__":
    main()
