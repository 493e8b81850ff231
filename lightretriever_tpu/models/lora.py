"""LoRA adapters for the scanned decoder pytree.

Replaces the reference's peft integration (reference:
finetune/modeling_encoder.py:658-676 build/load, :616-625 merge-on-load).
Adapters live in a parallel pytree with the same stacked-[L] layout as the
base layers, so the train step can mark ONLY the adapter as trainable (the
JAX equivalent of peft's requires_grad surgery) and the whole pair shards
with the same NamedSharding specs.

Init matches peft defaults: A ~ kaiming-ish small normal, B = 0 (so the
adapted model starts exactly at the base model). Merge adds A @ B * alpha/r
into the base kernels for export, preserving the reference's
``merge_peft_when_save`` contract.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .config import DecoderConfig
from .decoder import Params

DEFAULT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
)


def _module_dims(config: DecoderConfig, name: str) -> tuple[int, int]:
    h, i = config.hidden_size, config.intermediate_size
    nh, nkv, dh = config.num_attention_heads, config.num_key_value_heads, config.head_dim_
    return {
        "q_proj": (h, nh * dh),
        "k_proj": (h, nkv * dh),
        "v_proj": (h, nkv * dh),
        "o_proj": (nh * dh, h),
        "gate_proj": (h, i),
        "up_proj": (h, i),
        "down_proj": (i, h),
    }[name]


def init_lora_params(
    config: DecoderConfig,
    key: jax.Array,
    r: int = 16,
    target_modules: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Params:
    L = config.num_hidden_layers
    out: Params = {"layers": {}}
    keys = jax.random.split(key, len(target_modules))
    for k, name in zip(keys, target_modules):
        d_in, d_out = _module_dims(config, name)
        out["layers"][name] = {
            "a": (jax.random.normal(k, (L, d_in, r), jnp.float32) * (1.0 / r)).astype(dtype),
            "b": jnp.zeros((L, r, d_out), dtype),
        }
    return out


def lora_scale(r: int, alpha: int) -> float:
    return alpha / r


def apply_lora_linear(x, base_p, lora_p, scale: float):
    """y = x @ W (+bias) + (x @ A) @ B * scale."""
    y = x @ base_p["kernel"]
    if "bias" in base_p:
        y = y + base_p["bias"]
    if lora_p is not None:
        y = y + (x @ lora_p["a"]) @ lora_p["b"] * scale
    return y


def merge_lora(params: Params, lora: Params, r: int, alpha: int) -> Params:
    """Fold adapters into base kernels: W += A @ B * alpha/r (export path)."""
    scale = lora_scale(r, alpha)
    merged_layers = dict(params["layers"])
    for name, lp in lora["layers"].items():
        base = dict(merged_layers[name])
        delta = jnp.einsum(
            "lir,lro->lio", lp["a"].astype(jnp.float32), lp["b"].astype(jnp.float32)
        ) * scale
        base["kernel"] = (base["kernel"].astype(jnp.float32) + delta).astype(
            params["layers"][name]["kernel"].dtype
        )
        merged_layers[name] = base
    out = dict(params)
    out["layers"] = merged_layers
    return out


# ---------------------------------------------------------------------------
# peft adapter interchange (reference loads/saves adapters via peft:
# modeling_encoder.py:616-625, 658-676)
# ---------------------------------------------------------------------------
def load_peft_adapter(path: str, config: DecoderConfig, dtype=jnp.float32):
    """Load a peft LoRA adapter dir (adapter_config.json +
    adapter_model.safetensors) into our stacked pytree.

    Returns (lora_params, r, alpha). peft stores per-layer
    ``...layers.{l}.self_attn.q_proj.lora_A.weight`` [r, in] and
    ``lora_B.weight`` [out, r]; ours are a=[L, in, r], b=[L, r, out].
    """
    import json
    import os

    import numpy as np
    from safetensors import safe_open

    with open(os.path.join(path, "adapter_config.json")) as f:
        acfg = json.load(f)
    r, alpha = acfg["r"], acfg["lora_alpha"]
    targets = acfg.get("target_modules") or list(DEFAULT_TARGETS)

    tensors: dict[str, "np.ndarray"] = {}
    fname = os.path.join(path, "adapter_model.safetensors")
    with safe_open(fname, framework="np") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k)

    def find(layer: int, module: str, ab: str):
        for k, v in tensors.items():
            if f"layers.{layer}." in k and f"{module}.lora_{ab}" in k:
                return np.asarray(v)
        raise KeyError(f"missing lora_{ab} for layer {layer} {module}")

    L = config.num_hidden_layers
    out: Params = {"layers": {}}
    for name in targets:
        if name not in DEFAULT_TARGETS:
            continue
        a = np.stack([find(l, name, "A").T for l in range(L)])  # [L, in, r]
        b = np.stack([find(l, name, "B").T for l in range(L)])  # [L, r, out]
        out["layers"][name] = {"a": jnp.asarray(a, dtype), "b": jnp.asarray(b, dtype)}
    return out, r, alpha


def save_peft_adapter(
    lora: Params,
    config: DecoderConfig,
    path: str,
    r: int,
    alpha: int,
    lora_dropout: float = 0.0,
    base_model_name_or_path: str = "",
) -> None:
    """Export our adapter tree as a peft-loadable LoRA directory."""
    import json
    import os

    import numpy as np
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    tensors: dict[str, np.ndarray] = {}
    targets = sorted(lora["layers"].keys())
    attn = {"q_proj", "k_proj", "v_proj", "o_proj"}
    for name, lp in lora["layers"].items():
        sub = "self_attn" if name in attn else "mlp"
        a = np.asarray(jnp.asarray(lp["a"], jnp.float32))
        b = np.asarray(jnp.asarray(lp["b"], jnp.float32))
        for l in range(a.shape[0]):
            prefix = f"base_model.model.model.layers.{l}.{sub}.{name}"
            tensors[f"{prefix}.lora_A.weight"] = np.ascontiguousarray(a[l].T)
            tensors[f"{prefix}.lora_B.weight"] = np.ascontiguousarray(b[l].T)
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({
            "peft_type": "LORA",
            "task_type": "FEATURE_EXTRACTION",
            "r": r,
            "lora_alpha": alpha,
            "lora_dropout": lora_dropout,
            "target_modules": targets,
            "bias": "none",
            "base_model_name_or_path": base_model_name_or_path,
        }, f, indent=2)
