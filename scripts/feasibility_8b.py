"""8B-recipe feasibility at shape (VERDICT r2 next #6).

The canonical reference recipe is Llama-3.1-8B + LoRA r16 with all four
rep systems (reference: scripts/finetune_example.sh:18,83-157; our
config/finetune_llama8b.json). No 8B weights exist in this image, so
feasibility is established without them, in two parts:

1. ``--shapes`` (default, CPU ok): ``jax.eval_shape`` the full
   ``HybridModel.init_params`` at Llama-3.1-8B dimensions, then account
   per-device bytes for params / grads / Adam state under the exact
   NamedShardings the trainer uses (fsdp_param_sharding /
   hybrid_param_sharding over virtual meshes), and assert each
   configuration fits a v5e per-chip HBM budget. Optimizer state covers
   ONLY the trainable (LoRA + projector) subtree — the trainer freezes
   the base trunks under LoRA (TrainingArguments.lora_freeze_base).

2. ``--real-step`` (one real TPU chip): run ONE real optimizer step at
   full 8B layer dimensions (hidden 4096, intermediate 14336, GQA 32/8,
   vocab 128256) with a 2-layer trunk + LoRA, measure the steady step
   time, and extrapolate linearly in layer count (the scanned decoder
   layers dominate; embedding/lm-head cost is counted once).

Output: a markdown feasibility table (PERFORMANCE.md "8B feasibility").
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

HBM_PER_CHIP = 16 * 1024**3          # v5e
HBM_BUDGET = 0.90 * HBM_PER_CHIP     # leave 10% for XLA scratch


def llama31_8b_config():
    from lightretriever_tpu.models.config import DecoderConfig

    return DecoderConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=8192, rms_norm_eps=1e-5, rope_theta=500000.0,
        tie_word_embeddings=False)


def build_model(cfg, grad_cache: bool = False):
    from lightretriever_tpu.arguments import ModelArguments, TrainingArguments
    from lightretriever_tpu.models.hybrid import HybridModel

    ma = ModelArguments(
        pooling_strategy="lasttoken", attn_implementation="auto",
        lora=True, lora_r=16, lora_alpha=32,
        hybrid_use_dense_vector=True, hybrid_use_sparse_vector=True,
        hybrid_use_emb_vector=True, hybrid_use_token_id_vector=True,
        noncontextual_query_embedding=True,
        sparse_use_relu=True, sparse_use_log_saturation=True,
        sparse_top_k_qry=64, sparse_top_k_psg=256)
    ta = TrainingArguments(
        learning_rate=2e-5, max_steps=12000, temperature=0.02,
        bf16=True, add_flops=True, use_reg_scheduler=True,
        reg_t=4000, reg_max=4000,
        emb_den_scores_distillation=True, tok_den_scores_distillation=True,
        grad_cache=grad_cache, gc_q_chunk_size=8, gc_p_chunk_size=2)
    return HybridModel(ma, ta, cfg, eos_token_id=128001, pad_token_id=128002)


def _bytes(sds) -> int:
    return int(np.prod(sds.shape)) * jnp.dtype(sds.dtype).itemsize


def _shard_divisor(sharding) -> int:
    spec = sharding.spec
    mesh = sharding.mesh
    div = 1
    for axes in spec:
        if axes is None:
            continue
        for a in (axes if isinstance(axes, tuple) else (axes,)):
            div *= mesh.shape[a]
    return div


def account(mesh, params_sds, frozen_keys, placement) -> dict:
    """Per-device byte accounting under the trainer's actual shardings."""
    from lightretriever_tpu.parallel.mesh import (
        fsdp_param_sharding, hybrid_param_sharding)

    place = (hybrid_param_sharding if placement == "hybrid"
             else fsdp_param_sharding)
    out = {"params": 0, "grads": 0, "adam": 0}
    for key, tree in params_sds.items():
        trainable = key not in frozen_keys
        for leaf in jax.tree_util.tree_leaves(tree):
            per_dev = _bytes(leaf) / _shard_divisor(place(mesh, leaf))
            out["params"] += per_dev
            if trainable:
                out["grads"] += per_dev
                # Adam m+v in fp32 regardless of param dtype
                fp32 = per_dev * 4 / jnp.dtype(leaf.dtype).itemsize
                out["adam"] += 2 * fp32
    return out


def activation_estimate(cfg, b_q, b_p, s_q, s_p, n_dev_data,
                        gc_chunks=None) -> float:
    """Rematerialized-activation upper bound, bytes/device (bf16).

    The decoder checkpoints per scanned layer: live memory = per-layer
    boundary activations for all L layers ([B,S,H] each) + one layer's
    internals (qkv/gate/up, [B,S,H+2I]) + attention running state (flash:
    O(B*S*H), no S^2) + the lm-head sparse head's top-k workspace. Batch
    dims shard over data.

    ``gc_chunks=(q_rows, p_rows)`` models GradCache (trainer
    ``_chunked_encode``): rep forwards run per micro-chunk under
    ``lax.map`` + remat, so live activations scale with the CHUNK rows,
    not the batch; only the [B, H] reps + [B, B*n] score matrix persist
    at full batch size."""
    L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    if gc_chunks is not None:
        gq, gp = gc_chunks
        toks = (gq * s_q + gp * s_p) / n_dev_data
        persist = (b_q + b_p) / n_dev_data * H * 2 + b_q * b_p * 4
    else:
        toks = (b_q * s_q + b_p * s_p) / n_dev_data
        persist = 0.0
    boundaries = L * toks * H * 2
    layer_internals = toks * (4 * H + 2 * I) * 2
    # max-linear-map streams vocab tiles: workspace ~ toks * tile(8192)
    sparse_ws = toks * 8192 * 2
    return boundaries + layer_internals + sparse_ws + persist


def run_shapes() -> None:
    from lightretriever_tpu.parallel.mesh import create_mesh

    cfg = llama31_8b_config()
    model = build_model(cfg)
    params_sds = jax.eval_shape(
        lambda: model.init_params(jax.random.key(0), dtype=jnp.bfloat16))
    frozen = {"qry", "psg"} & set(params_sds)
    n_total = sum(_bytes(x) // 2 for x in jax.tree_util.tree_leaves(params_sds))
    n_train = sum(
        _bytes(x) // 2 for k, t in params_sds.items() if k not in frozen
        for x in jax.tree_util.tree_leaves(t))
    print(f"8B recipe at shape: {n_total/1e9:.2f}B params total, "
          f"{n_train/1e6:.1f}M trainable (LoRA r16 + projectors), "
          f"frozen keys={sorted(frozen)}")

    # Canonical global batch 128 q (finetune_example.sh:96) x 8 passages
    B_Q, N_PSG, S = 128, 8, 512
    rows = []
    for shape, names, placement in [
        ((4,), ("data",), "fsdp"),
        ((8,), ("data",), "fsdp"),
        ((16,), ("data",), "fsdp"),
        ((4, 2), ("data", "model"), "hybrid"),
        ((8, 2), ("data", "model"), "hybrid"),
    ]:
        mesh = create_mesh(shape, names)
        acc = account(mesh, params_sds, frozen, placement)
        n_data = mesh.shape["data"]
        act_plain = activation_estimate(cfg, B_Q, B_Q * N_PSG, S, S, n_data)
        act_gc = activation_estimate(cfg, B_Q, B_Q * N_PSG, S, S, n_data,
                                     gc_chunks=(8, 16))
        fixed = sum(acc.values())
        rows.append({
            "mesh": "x".join(map(str, shape)) + f" ({placement})",
            "params_gb": acc["params"] / 1024**3,
            "grads_gb": acc["grads"] / 1024**3,
            "adam_gb": acc["adam"] / 1024**3,
            "act_plain_gb": act_plain / 1024**3,
            "act_gc_gb": act_gc / 1024**3,
            "total_plain_gb": (fixed + act_plain) / 1024**3,
            "total_gc_gb": (fixed + act_gc) / 1024**3,
            "fits_plain": fixed + act_plain < HBM_BUDGET,
            "fits_gc": fixed + act_gc < HBM_BUDGET,
        })

    print("\nGlobal batch 128 q x 8 passages x S=512 (canonical recipe). "
          "GradCache chunks: 8 q rows / 16 p rows (lax.map + remat).")
    print("| Mesh | params/dev | Adam+grads/dev | acts plain | acts GC "
          "| total plain | total GC | fits 16GB v5e |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        fits = ("plain+GC" if r["fits_plain"] else
                "GC only" if r["fits_gc"] else "NO")
        print(f"| {r['mesh']} | {r['params_gb']:.2f} GB | "
              f"{r['grads_gb'] + r['adam_gb']:.3f} GB | "
              f"{r['act_plain_gb']:.2f} GB | {r['act_gc_gb']:.2f} GB | "
              f"{r['total_plain_gb']:.2f} GB | {r['total_gc_gb']:.2f} GB | "
              f"{fits} |")
    print(json.dumps({"feasibility_8b": rows}))
    # the 4-chip FSDP config is the minimum viable pod slice (with GradCache,
    # which the canonical recipe enables for exactly this reason)
    assert rows[0]["fits_gc"], "8B LoRA recipe + GradCache must fit 4x v5e"


def run_real_step(n_layers: int, b_q: int, n_psg: int, s: int) -> None:
    """One real optimizer step at 8B layer dims with a shallow trunk."""
    import dataclasses

    from lightretriever_tpu.training.trainer import ContrastiveTrainer

    cfg = dataclasses.replace(llama31_8b_config(), num_hidden_layers=n_layers)
    model = build_model(cfg, grad_cache=True)
    params = model.init_params(jax.random.key(0), dtype=jnp.bfloat16)
    n_total = sum(int(np.prod(p.shape))
                  for p in jax.tree_util.tree_leaves(params))
    print(f"real-step trunk: {n_layers} layers at 8B dims = "
          f"{n_total/1e9:.2f}B params on one chip")
    trainer = ContrastiveTrainer(model, params, model.train_args)

    rng = np.random.default_rng(0)

    def mk(n, sl):
        return {"input_ids": rng.integers(3, cfg.vocab_size, (n, sl)).astype(np.int32),
                "attention_mask": np.ones((n, sl), np.int32)}

    query = mk(b_q, 64)
    # blocked nonctx layout for the emb_reps path: [tok][eos] blocks, no
    # prompt (training/data.py:tokenize_nonctx_query contract)
    n_blk = 32
    ids = np.empty((b_q, 2 * n_blk), np.int32)
    ids[:, 0::2] = rng.integers(3, cfg.vocab_size, (b_q, n_blk))
    ids[:, 1::2] = 128001
    query.update({
        "nonctx_input_ids": ids,
        "nonctx_segment_ids": np.tile(np.repeat(np.arange(1, n_blk + 1), 2),
                                      (b_q, 1)).astype(np.int32),
        "nonctx_position_ids": np.tile(np.tile([0, 1], n_blk),
                                       (b_q, 1)).astype(np.int32),
        "nonctx_attention_mask_2d": np.ones((b_q, 2 * n_blk), np.int32),
        "nonctx_prompt_len": 0,
    })
    batch = {"query": query, "passage": mk(b_q * n_psg, s),
             "only_hn": np.zeros(b_q, bool)}
    t0 = time.perf_counter()
    logs = trainer.training_step(batch)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        logs = trainer.training_step(batch)
        _ = float(jax.device_get(logs["loss"]))
        times.append(time.perf_counter() - t0)
    step_s = float(np.median(times))
    # Layer-linear extrapolation + one-time embedding/lm-head share
    full_layers = 32
    per_layer = step_s / n_layers
    est_full = per_layer * full_layers
    print(json.dumps({
        "n_layers": n_layers, "b_q": b_q, "n_psg": n_psg, "s": s,
        "compile_s": round(compile_s, 1),
        "step_s_measured": round(step_s, 3),
        "est_full_8b_step_s_per_chip": round(est_full, 2),
        "loss_finite": bool(np.isfinite(float(jax.device_get(logs["loss"])))),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real-step", action="store_true",
                    help="run one real step at 8B layer dims (TPU)")
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--b-q", type=int, default=4)
    ap.add_argument("--n-psg", type=int, default=2)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu or not args.real_step:
        jax.config.update("jax_platforms", "cpu")
    if args.real_step:
        if jax.default_backend() == "tpu":
            from lightretriever_tpu.inference.utils import ensure_device_alive

            ensure_device_alive()
        run_real_step(args.layers, args.b_q, args.n_psg, args.seq)
    else:
        run_shapes()


if __name__ == "__main__":
    main()
