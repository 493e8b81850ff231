"""SPMD reranker inference + offline rerank tool.

Replaces the reference's RPC reranker farm (reference: inference/rerank.py:
44-299 producer/consumer dispatch) and the offline rerank CLI
(rerank/__main__.py:47-211, per-rank dataset sharding + pickle merge):
on TPU both collapse to one jit-compiled scoring step over a mesh — the host
feeds batch-sharded pair arrays, no queues, no pickles.
"""
from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import numpy as np

from .data_utils import PairCollator, read_trec_run, write_trec_run

logger = logging.getLogger(__name__)


class RerankerEncoder:
    """Batch scorer over a CrossEncoder[Logits] (parity surface:
    inference/rerank.py RerankerModel.predict)."""

    def __init__(self, model, params, tokenizer, mesh=None,
                 batch_size: int = 64, max_len: int = 1024,
                 query_prompt: str = ""):
        self.model = model
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.batch_size = batch_size
        self.collator = PairCollator(tokenizer=tokenizer, max_len=max_len,
                                     query_prompt=query_prompt)
        if isinstance(params, dict) and isinstance(params.get("lm"), dict):
            # One wide QKV / gate-up GEMM per layer on the scoring hot path
            # (models/decoder.py:fuse_decoder_params).
            from ..models.decoder import fuse_decoder_params

            params = dict(params)
            params["lm"] = fuse_decoder_params(params["lm"])
        if mesh is not None:
            from ..parallel.mesh import replicated_sharding

            params = jax.device_put(params, replicated_sharding(mesh))
        else:
            # Pin params device-resident up front: host arrays would be
            # re-transferred on EVERY score call (~140MB/call for a 70M
            # bf16 model — measured 10.5 pairs/s through the tunnel vs
            # device-resident throughput).
            params = jax.device_put(params)
        self.params = params
        self._score_fn = jax.jit(lambda p, b: self.model.score(p, b))

    def predict(self, pairs: list[tuple[str, Any]]) -> np.ndarray:
        """[N] scores for (query, passage) pairs."""
        bs = self.batch_size
        if self.mesh is not None:
            n_dev = int(np.prod(list(self.mesh.shape.values())))
            bs = max(bs // n_dev, 1) * n_dev
        out = np.zeros(len(pairs), np.float32)
        pending = None  # pipelined dispatch: collect batch i-1 while the
        # device runs batch i (a per-batch sync costs a full tunnel round
        # trip; overlapped, host tokenization rides under device compute)
        # Mid-run wedge guard (LR_STEP_WATCHDOG_S; inference.utils
        # .StepWatchdog): a wedged tunnel blocks the next readback forever.
        from ..inference.utils import StepWatchdog

        wd = StepWatchdog.from_env(name="rerank-predict")
        try:
            for lo in range(0, len(pairs), bs):
                chunk = pairs[lo: lo + bs]
                n_valid = len(chunk)
                if n_valid < bs:
                    chunk = chunk + [chunk[-1]] * (bs - n_valid)
                batch = self.collator(chunk)
                if self.mesh is not None:
                    from ..parallel.mesh import shard_batch

                    batch = shard_batch(self.mesh, batch)
                scores = self._score_fn(self.params, batch)
                if pending is not None:
                    plo, pvalid, ps = pending
                    out[plo: plo + pvalid] = np.asarray(ps, np.float32)[:pvalid]
                pending = (lo, n_valid, scores)
                if wd is not None:
                    wd.beat()
            if pending is not None:
                plo, pvalid, ps = pending
                out[plo: plo + pvalid] = np.asarray(ps, np.float32)[:pvalid]
        finally:
            if wd is not None:
                wd.stop()
        return out


def offline_rerank(
    reranker: RerankerEncoder,
    run_path: str,
    queries: dict[str, str],
    corpus: dict[str, dict | str],
    output_path: str,
    top_k: int = 100,
    query_prompt: str = "",
) -> dict[str, dict[str, float]]:
    """Rescore the top-k of a first-stage trec run and write a reranked run
    (parity: rerank/__main__.py end-to-end flow, minus the rank sharding)."""
    runs = read_trec_run(run_path, top_k=top_k)
    pairs: list[tuple[str, Any]] = []
    keys: list[tuple[str, str]] = []
    for qid, items in runs.items():
        if qid not in queries:
            continue
        for pid, _ in items:
            if pid in corpus:
                pairs.append((query_prompt + queries[qid], corpus[pid]))
                keys.append((qid, pid))
    logger.info("offline rerank: %d pairs", len(pairs))
    scores = reranker.predict(pairs)
    results: dict[str, dict[str, float]] = {}
    for (qid, pid), s in zip(keys, scores):
        results.setdefault(qid, {})[pid] = float(s)
    write_trec_run(output_path, results)
    return results
