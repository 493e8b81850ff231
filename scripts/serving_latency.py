"""Serving latency study: p50/p99 per-request, not amortized QPS
(VERDICT r2 next #8).

Per-call synchronous latency of the asymmetric-dense serving path vs the
full-LLM query tower at B=1/4/16 (what an SLO sees, tunnel included), plus
an open-loop Poisson load test through DynamicBatchingServer — the
micro-batching front end that replaces the reference's RPC feeder threads
(inference/exact_search_torchrpc.py:73-81) on TPU.

Usage: python scripts/serving_latency.py [--cpu] [--corpus N] ...
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from lightretriever_tpu.inference.utils import ensure_device_alive

ensure_device_alive()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--tower-layers", type=int, default=16)
    ap.add_argument("--corpus", type=int, default=200_000)
    ap.add_argument("--q-len", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-calls", type=int, default=100)
    ap.add_argument("--loads", default="50,200,500,1000,2000,4000",
                    help="offered QPS points for the dynamic-batching sweep")
    ap.add_argument("--max-batch", type=int, default=64,
                    help="DynamicBatchingServer micro-batch cap: the r4 "
                         "saturation study attributed the ~1.9k-QPS knee "
                         "to max_batch x tunnel-RTT round trips, so the "
                         "knee scales with this")
    ap.add_argument("--depths", default="1,2,4",
                    help="pipeline_depth values to sweep")
    ap.add_argument("--out", default=None,
                    help="also write the summary JSON here (docs-lockstep: "
                         "PERFORMANCE.md cites committed results/*.json)")
    args = ap.parse_args()
    if jax.default_backend() != "tpu":
        args.corpus, args.tower_layers, args.n_calls = 5000, 2, 20

    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    from lightretriever_tpu.inference.serving import (
        AsymmetricDenseServer,
        DynamicBatchingServer,
        measure_dynamic_batching,
        measure_latency_percentiles,
        summarize_batch_log,
    )
    from lightretriever_tpu.models import decoder
    from lightretriever_tpu.models.config import DecoderConfig

    vocab = {"<pad>": 0, "<unk>": 1}
    for i in range(args.vocab - 2):
        vocab[f"w{i}"] = len(vocab)
    tk = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    tok = PreTrainedTokenizerFast(tokenizer_object=tk, pad_token="<pad>",
                                  unk_token="<unk>")

    rng = np.random.default_rng(0)
    table = rng.standard_normal((args.vocab, args.hidden)).astype(np.float32)
    corpus = rng.standard_normal((args.corpus, args.hidden)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    server = AsymmetricDenseServer(table, corpus, tok, topk_method="approx")

    cfg = DecoderConfig(
        vocab_size=args.vocab, hidden_size=args.hidden,
        intermediate_size=args.hidden * 27 // 10 // 128 * 128,
        num_hidden_layers=args.tower_layers,
        num_attention_heads=max(args.hidden // 64, 2),
        num_key_value_heads=max(args.hidden // 256, 1),
        max_position_embeddings=args.q_len, tie_word_embeddings=True)
    params = decoder.init_params(cfg, jax.random.key(0), jnp.bfloat16)

    @jax.jit
    def tower_fwd(params, ids, mask):
        out = decoder.forward(params, ids, mask, config=cfg,
                              attn_impl="xla", right_padded=True)
        return out["last_hidden_state"][:, -1, :]

    def full_encode_fn(texts, k=None):
        ids, mask = server.tokenize(texts)
        return tower_fwd(params, jnp.asarray(ids), jnp.asarray(mask))

    texts = [" ".join(f"w{rng.integers(0, args.vocab - 2)}"
                      for _ in range(args.q_len // 2))
             for _ in range(256)]

    out = {"backend": jax.default_backend(), "corpus": args.corpus,
           "tower_layers": args.tower_layers}
    # Asym path does encode+search in one call; the tower does encode ONLY —
    # the asym numbers therefore understate the true end-to-end advantage.
    out["asym_encode_search"] = measure_latency_percentiles(
        lambda t, k: server.query(t, k), texts, (1, 4, 16), args.n_calls,
        args.k)
    out["full_tower_encode_only"] = measure_latency_percentiles(
        full_encode_fn, texts, (1, 4, 16), args.n_calls, args.k)

    # pipeline_depth bounds the dispatch->completion hand-off queue; even
    # depth=1 overlaps one in-flight batch with the next batch's formation
    # (the pre-pipelining server had zero overlap). instrument=True logs
    # per-batch queue-wait / dispatch / device-round-trip so the saturation
    # knee can be attributed (VERDICT r3 next #6).
    for depth in (int(d) for d in args.depths.split(",")):
        batcher = DynamicBatchingServer(server, k=args.k,
                                        max_batch=args.max_batch,
                                        max_wait_ms=2.0, pipeline_depth=depth,
                                        instrument=True)
        try:
            rows = []
            for q in args.loads.split(","):
                batcher.batch_log.clear()
                row = measure_dynamic_batching(
                    batcher, texts, float(q),
                    n_requests=min(4 * int(float(q)), 1200))
                row["breakdown"] = summarize_batch_log(batcher.batch_log)
                rows.append(row)
            out[f"dynamic_batching_depth{depth}"] = rows
        finally:
            batcher.close()

    def rnd(o):
        if isinstance(o, dict):
            return {k: rnd(v) for k, v in o.items()}
        if isinstance(o, list):
            return [rnd(v) for v in o]
        return round(o, 2) if isinstance(o, float) else o

    print(json.dumps(rnd(out), indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rnd(out), f, indent=2)


if __name__ == "__main__":
    main()
