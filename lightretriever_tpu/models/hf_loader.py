"""HF checkpoint <-> JAX pytree conversion (safetensors, no torch required).

Loads Llama/Qwen2/Qwen3/Mistral/Gemma ``*.safetensors`` checkpoints into the
scanned-layer pytree
used by ``models.decoder`` and saves back in HF layout, preserving the
reference's checkpoint interchange (reference: modeling_encoder.py:602-656
loads HF AutoModel checkpoints; save at :813-856).
"""
from __future__ import annotations

import json
import os
import re
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .config import DecoderConfig
from .decoder import Params


def _open_all_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return tensors


def _to_np(x) -> np.ndarray:
    # bf16 safetensors load as ml_dtypes bfloat16 numpy arrays — keep as-is
    return np.asarray(x)


def resolve_model_dir(path: str) -> str:
    """Resolve a user-supplied path to the directory holding ``config.json``.

    Accepts either an HF-layout model dir directly, or a training-output
    parent that nests it under ``model/`` (the ``scripts/lm_pretrain.py``
    save layout: ``<out>/model`` + ``<out>/tokenizer``).
    """
    for cand in (path, os.path.join(path, "model")):
        if os.path.isfile(os.path.join(cand, "config.json")):
            return cand
    raise FileNotFoundError(
        f"no config.json under {path} or {path}/model — expected an "
        "HF-layout checkpoint dir (or a lm_pretrain output parent)")


def load_decoder_checkpoint(
    path: str, dtype=jnp.bfloat16
) -> tuple[Params, DecoderConfig]:
    """Load checkpoint + config together."""
    config = DecoderConfig.from_pretrained(path)
    return load_decoder_params(path, config, dtype), config


def load_decoder_params(
    path: str,
    config: Optional[DecoderConfig] = None,
    dtype=jnp.bfloat16,
) -> Params:
    """Load an HF Llama/Qwen2 checkpoint dir into the scanned pytree."""
    if config is None:
        config = DecoderConfig.from_pretrained(path)
    raw = _open_all_safetensors(path)

    # HF variants prefix with or without "model."
    def get(name: str) -> np.ndarray:
        for cand in (name, f"model.{name}"):
            if cand in raw:
                return _to_np(raw[cand])
        raise KeyError(f"{name} not found in checkpoint (have {len(raw)} tensors)")

    L = config.num_hidden_layers

    def stack(fmt: str, transpose: bool) -> np.ndarray:
        mats = [get(fmt.format(l=l)) for l in range(L)]
        out = np.stack([m.T if transpose else m for m in mats])
        return out

    layers: dict = {
        "q_proj": {"kernel": stack("layers.{l}.self_attn.q_proj.weight", True)},
        "k_proj": {"kernel": stack("layers.{l}.self_attn.k_proj.weight", True)},
        "v_proj": {"kernel": stack("layers.{l}.self_attn.v_proj.weight", True)},
        "o_proj": {"kernel": stack("layers.{l}.self_attn.o_proj.weight", True)},
        "gate_proj": {"kernel": stack("layers.{l}.mlp.gate_proj.weight", True)},
        "up_proj": {"kernel": stack("layers.{l}.mlp.up_proj.weight", True)},
        "down_proj": {"kernel": stack("layers.{l}.mlp.down_proj.weight", True)},
        "input_layernorm": stack("layers.{l}.input_layernorm.weight", False),
        "post_attention_layernorm": stack("layers.{l}.post_attention_layernorm.weight", False),
    }
    if config.attention_bias:
        layers["q_proj"]["bias"] = stack("layers.{l}.self_attn.q_proj.bias", False)
        layers["k_proj"]["bias"] = stack("layers.{l}.self_attn.k_proj.bias", False)
        layers["v_proj"]["bias"] = stack("layers.{l}.self_attn.v_proj.bias", False)
    if config.use_qk_norm:
        layers["q_norm"] = stack("layers.{l}.self_attn.q_norm.weight", False)
        layers["k_norm"] = stack("layers.{l}.self_attn.k_norm.weight", False)

    params: Params = {
        "embed_tokens": _to_np(get("embed_tokens.weight")),
        "layers": layers,
        "norm": get("norm.weight"),
    }
    if not config.tie_word_embeddings:
        if "lm_head.weight" in raw:
            params["lm_head"] = _to_np(raw["lm_head.weight"]).T
        else:  # tied in file despite config
            pass

    import jax

    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
    return params


def save_decoder_params(params: Params, config: DecoderConfig, path: str) -> None:
    """Save the pytree back to HF layout (model.safetensors + config.json).

    Accepts either the unfused layout or the fused compute layout
    (qkv_proj/gate_up_proj, models/decoder.py:fuse_decoder_params) — fused
    params are split back so the on-disk interchange stays HF-exact."""
    from safetensors.numpy import save_file
    from .decoder import params_are_fused, unfuse_decoder_params

    if params_are_fused(params):
        params = unfuse_decoder_params(params, config)
    os.makedirs(path, exist_ok=True)
    tensors: dict[str, np.ndarray] = {}
    tensors["model.embed_tokens.weight"] = np.asarray(params["embed_tokens"], np.float32)
    tensors["model.norm.weight"] = np.asarray(params["norm"], np.float32)
    L = config.num_hidden_layers
    lp = params["layers"]
    for l in range(L):
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            tensors[f"model.layers.{l}.self_attn.{name}.weight"] = np.ascontiguousarray(
                np.asarray(lp[name]["kernel"][l], np.float32).T)
            if "bias" in lp[name]:
                tensors[f"model.layers.{l}.self_attn.{name}.bias"] = np.asarray(
                    lp[name]["bias"][l], np.float32)
        for name in ("gate_proj", "up_proj", "down_proj"):
            tensors[f"model.layers.{l}.mlp.{name}.weight"] = np.ascontiguousarray(
                np.asarray(lp[name]["kernel"][l], np.float32).T)
        tensors[f"model.layers.{l}.input_layernorm.weight"] = np.asarray(
            lp["input_layernorm"][l], np.float32)
        tensors[f"model.layers.{l}.post_attention_layernorm.weight"] = np.asarray(
            lp["post_attention_layernorm"][l], np.float32)
        for name in ("q_norm", "k_norm"):
            if name in lp:
                tensors[f"model.layers.{l}.self_attn.{name}.weight"] = np.asarray(
                    lp[name][l], np.float32)
    if "lm_head" in params:
        tensors["lm_head.weight"] = np.ascontiguousarray(np.asarray(params["lm_head"], np.float32).T)
    save_file(tensors, os.path.join(path, "model.safetensors"))

    _ARCH = {"llama": "LlamaForCausalLM", "qwen2": "Qwen2ForCausalLM",
             "qwen3": "Qwen3ForCausalLM", "mistral": "MistralForCausalLM",
             "gemma": "GemmaForCausalLM"}
    hf_cfg = {
        "architectures": [_ARCH.get(config.model_type, "LlamaForCausalLM")],
        "model_type": config.model_type,
        "vocab_size": config.vocab_size,
        "hidden_size": config.hidden_size,
        "intermediate_size": config.intermediate_size,
        "num_hidden_layers": config.num_hidden_layers,
        "num_attention_heads": config.num_attention_heads,
        "num_key_value_heads": config.num_key_value_heads,
        "rms_norm_eps": config.rms_norm_eps,
        "rope_theta": config.rope_theta,
        "max_position_embeddings": config.max_position_embeddings,
        "tie_word_embeddings": config.tie_word_embeddings,
        "attention_bias": config.attention_bias,
        "hidden_act": config.hidden_act,
    }
    if config.head_dim:
        hf_cfg["head_dim"] = config.head_dim
    if config.rope_scaling:
        hf_cfg["rope_scaling"] = config.rope_scaling
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
