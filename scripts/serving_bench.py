"""Asymmetric-serving benchmark: EmbeddingBag queries vs a full LLM tower.

Reproducible analogue of the reference paper's headline claims
(README.md:2 abstract: ~1000x query encoding, ~20x end-to-end): measures on
one chip
  * end-to-end asymmetric serving QPS (tokenize -> lookup -> L2 -> exact
    search over a resident corpus -> top-k, one fused jit),
  * the full-LLM query tower encode QPS at the same batch,
  * the pure encode-only comparison (lookup vs tower, no search on either
    side) — the number the paper's ~1000x refers to.

Usage: python scripts/serving_bench.py [--tower-layers 16 --tower-hidden 2048]
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
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--q-len", type=int, default=64)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    if jax.default_backend() != "tpu":
        args.corpus, args.batch, args.tower_layers = 5000, 32, 2

    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    from lightretriever_tpu.inference.serving import (
        AsymmetricDenseServer,
        bench_vs_full_encoder,
    )
    from lightretriever_tpu.models import decoder
    from lightretriever_tpu.models.config import DecoderConfig

    # Word-level tokenizer over a synthetic vocab (host-side cost is real)
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
    server = AsymmetricDenseServer(table, corpus, tok)

    # Full LLM query tower (the symmetric baseline the paper compares against)
    cfg = DecoderConfig(
        vocab_size=args.vocab, hidden_size=args.hidden,
        intermediate_size=args.hidden * 27 // 10 // 128 * 128,
        num_hidden_layers=args.tower_layers,
        num_attention_heads=max(args.hidden // 64, 2),
        num_key_value_heads=max(args.hidden // 256, 1),
        max_position_embeddings=args.q_len, tie_word_embeddings=True)
    params = decoder.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))

    @jax.jit
    def tower_fwd(params, ids, mask):
        out = decoder.forward(params, ids, mask, config=cfg,
                              attn_impl="xla", right_padded=True)
        return out["last_hidden_state"][:, -1, :]

    def full_encode_fn(texts):
        ids, mask = server.tokenize(texts)
        return tower_fwd(params, jnp.asarray(ids), jnp.asarray(mask))

    texts = [" ".join(f"w{rng.integers(0, args.vocab - 2)}"
                      for _ in range(args.q_len // 2))
             for _ in range(args.batch)]
    res = bench_vs_full_encoder(server, full_encode_fn, texts, k=args.k,
                                n_iter=args.iters)
    res.update(tower_params_b=round(n_params / 1e9, 3),
               corpus=args.corpus, batch=args.batch,
               backend=jax.default_backend())
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in res.items()}, indent=2))


if __name__ == "__main__":
    main()
