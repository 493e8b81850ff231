"""Tiered sparse engine phase profile + q_block sweep (round 3).

The tiered engine's QPS was measured ~flat in corpus size (927/999/745 at
100k/300k/1M, PERFORMANCE.md) — the signature of a dispatch-bound loop, not
a compute-bound one. This script attributes the time: host query prep,
block dispatch, device fetch, heavy scan, host certify — using the
engine's own `last_timing` instrumentation — and sweeps the query block
size, which controls the number of host<->device round trips per search
(under the axon tunnel each round trip costs ~30ms).

Usage:
  bash scripts/with_tpu.sh python scripts/profile_tiered.py \
      [--docs 1000000] [--queries 1024] [--q-blocks 64,128,256,512]
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

from lightretriever_tpu.retriever.sparse_scorer import SparseImpactIndex
from lightretriever_tpu.retriever.tiered_impact import TieredImpactIndex

sys.path.insert(0, os.path.dirname(__file__))
from blockmax_scale import _topic_terms, gen_vecs  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--nnz", type=int, default=48)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--q-blocks", default="64,128,256,512")
    ap.add_argument("--exhaustive", action="store_true",
                    help="also time the exhaustive engine at this query "
                         "count (the amortized-ratio denominator)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    pools = _topic_terms(args.vocab, 2000, rng)
    q_vecs = gen_vecs(rng, args.queries, args.vocab, 8, pools, heavy=4)
    t0 = time.perf_counter()
    d_vecs = gen_vecs(rng, args.docs, args.vocab, args.nnz, pools, heavy=8)
    print(f"generated {args.docs} docs in {time.perf_counter()-t0:.0f}s",
          flush=True)

    out = {"docs": args.docs, "queries": args.queries, "rows": {}}
    if args.exhaustive:
        ex = SparseImpactIndex(vocab_size=args.vocab)
        ex.add(d_vecs, quantize=False)
        ex.search(q_vecs[:8], args.k)
        t0 = time.perf_counter()
        ex.search(q_vecs, args.k)
        t_ex = time.perf_counter() - t0
        out["exhaustive_qps"] = round(args.queries / t_ex, 1)
        print(f"exhaustive: {out['exhaustive_qps']} qps", flush=True)
        del ex

    for qb in (int(s) for s in args.q_blocks.split(",")):
        idx = TieredImpactIndex(vocab_size=args.vocab, q_block=qb)
        idx.add(d_vecs, quantize=False)
        idx._finalize()
        idx.search(q_vecs, args.k)         # compile at the measured shapes
        t0 = time.perf_counter()
        idx.search(q_vecs, args.k)
        dt = time.perf_counter() - t0
        row = {"qps": round(args.queries / dt, 1),
               "certified": idx.last_certified_frac,
               "scan_frac": idx.last_scan_frac,
               "retry_frac": idx.last_retry_frac,
               **{k: (round(v, 4) if isinstance(v, float) else v)
                  for k, v in idx.last_timing.items()}}
        out["rows"][qb] = row
        print(f"q_block={qb}: {json.dumps(row)}", flush=True)
        del idx

    print(json.dumps(out))


if __name__ == "__main__":
    main()
