"""BERT-family encoder as pure functions over a parameter pytree.

The reference supports BERT-architecture hybrids (``hybrid_model_architecture
= 'bert'``, reference: finetune/arguments.py:175 + modeling_hybrid.py BERT
branches; the SparseDownProjector exists for BGE-M3 reproduction,
sparse_projector.py:156-226). Same TPU design as the Llama decoder
(models/decoder.py): layers stacked on a leading axis + ``lax.scan``,
bidirectional attention through the shared flash kernel (segment ids, no
causal mask), post-LN residual blocks, learned position embeddings.
"""
from __future__ import annotations

import functools
import json
import os
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.flash_attention import attention_reference, flash_attention

Params = dict[str, Any]


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    model_type: str = "bert"

    # Interface shims so EncoderModel can treat both families uniformly
    @property
    def head_dim_(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_key_value_heads(self) -> int:
        return self.num_attention_heads

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "BertConfig":
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            max_position_embeddings=cfg.get("max_position_embeddings", 512),
            type_vocab_size=cfg.get("type_vocab_size", 2),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "BertConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def init_params(config: BertConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    h, i_sz = config.hidden_size, config.intermediate_size
    L = config.num_hidden_layers
    ks = jax.random.split(key, 16)

    def rnd(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    def dense(k, i, o):
        return {"kernel": rnd(k, (L, i, o)), "bias": jnp.zeros((L, o), dtype)}

    def ln(ndim=(h,)):
        return {"scale": jnp.ones((L, *ndim), dtype), "bias": jnp.zeros((L, *ndim), dtype)}

    return {
        "embeddings": {
            "word": rnd(ks[0], (config.vocab_size, h)),
            "position": rnd(ks[1], (config.max_position_embeddings, h)),
            "token_type": rnd(ks[2], (config.type_vocab_size, h)),
            "ln_scale": jnp.ones((h,), dtype),
            "ln_bias": jnp.zeros((h,), dtype),
        },
        "layers": {
            "q": dense(ks[3], h, h),
            "k": dense(ks[4], h, h),
            "v": dense(ks[5], h, h),
            "attn_out": dense(ks[6], h, h),
            "attn_ln": ln(),
            "ffn_in": dense(ks[7], h, i_sz),
            "ffn_out": dense(ks[8], i_sz, h),
            "ffn_ln": ln(),
        },
        "pooler": {"kernel": rnd(ks[9], (h, h)), "bias": jnp.zeros((h,), dtype)},
    }


def layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def _layer(hidden, lp, segment_ids, config: BertConfig, attn_impl: str):
    b, s, h = hidden.shape
    nh, dh = config.num_attention_heads, config.head_dim_
    q = _dense(hidden, lp["q"]).reshape(b, s, nh, dh)
    k = _dense(hidden, lp["k"]).reshape(b, s, nh, dh)
    v = _dense(hidden, lp["v"]).reshape(b, s, nh, dh)
    attn_fn = flash_attention if attn_impl == "pallas" else attention_reference
    attn = attn_fn(q, k, v, segment_ids=segment_ids, causal=False,
                   sm_scale=1.0 / (dh ** 0.5)).reshape(b, s, h)
    hidden = layer_norm(hidden + _dense(attn, lp["attn_out"]),
                        lp["attn_ln"]["scale"], lp["attn_ln"]["bias"],
                        config.layer_norm_eps)
    ffn = _dense(jax.nn.gelu(_dense(hidden, lp["ffn_in"]), approximate=False),
                 lp["ffn_out"])
    return layer_norm(hidden + ffn, lp["ffn_ln"]["scale"], lp["ffn_ln"]["bias"],
                      config.layer_norm_eps)


def forward(
    params: Params,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    *,
    config: BertConfig,
    attn_impl: str = "auto",
    output_hidden_states: bool = False,
    remat: bool = False,
    **_,
) -> dict[str, jnp.ndarray]:
    """BERT forward -> {'last_hidden_state', 'hidden_states'?}; accepts the
    same call surface as decoder.forward (causal/lora args ignored)."""
    if attn_impl == "auto":
        attn_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    b, s = input_ids.shape
    if segment_ids is None:
        segment_ids = (attention_mask if attention_mask is not None
                       else jnp.ones((b, s))).astype(jnp.int32)
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(s), (b, s))
    if token_type_ids is None:
        token_type_ids = jnp.zeros((b, s), jnp.int32)

    emb = params["embeddings"]
    hidden = (jnp.take(emb["word"], input_ids, axis=0)
              + jnp.take(emb["position"], position_ids, axis=0)
              + jnp.take(emb["token_type"], token_type_ids, axis=0))
    hidden = layer_norm(hidden, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps)

    layer_fn = functools.partial(_layer, config=config, attn_impl=attn_impl)
    if remat:
        layer_fn = jax.checkpoint(layer_fn, policy=jax.checkpoint_policies.nothing_saveable)

    def scan_body(h, lp):
        out = layer_fn(h, lp, segment_ids)
        return out, (h if output_hidden_states else None)

    last, collected = jax.lax.scan(scan_body, hidden, params["layers"])
    result = {"last_hidden_state": last}
    if output_hidden_states:
        result["hidden_states"] = jnp.concatenate([collected, last[None]], axis=0)
    return result


# ---------------------------------------------------------------------------
# HF interchange (bert-base naming)
# ---------------------------------------------------------------------------
def load_bert_params(path: str, config: BertConfig, dtype=jnp.float32) -> Params:
    from .hf_loader import _open_all_safetensors

    flat = _open_all_safetensors(path)

    def get(name):
        for prefix in ("bert.", ""):
            if prefix + name in flat:
                return np.asarray(flat[prefix + name])
        raise KeyError(name)

    L = config.num_hidden_layers

    def stack(fmt, transpose=False):
        ws = [get(fmt.format(i)) for i in range(L)]
        arr = np.stack([w.T if transpose else w for w in ws])
        return jnp.asarray(arr, dtype)

    def dense(name):
        return {
            "kernel": stack(f"encoder.layer.{{}}.{name}.weight", transpose=True),
            "bias": stack(f"encoder.layer.{{}}.{name}.bias"),
        }

    def ln(name):
        return {"scale": stack(f"encoder.layer.{{}}.{name}.weight"),
                "bias": stack(f"encoder.layer.{{}}.{name}.bias")}

    return {
        "embeddings": {
            "word": jnp.asarray(get("embeddings.word_embeddings.weight"), dtype),
            "position": jnp.asarray(get("embeddings.position_embeddings.weight"), dtype),
            "token_type": jnp.asarray(get("embeddings.token_type_embeddings.weight"), dtype),
            "ln_scale": jnp.asarray(get("embeddings.LayerNorm.weight"), dtype),
            "ln_bias": jnp.asarray(get("embeddings.LayerNorm.bias"), dtype),
        },
        "layers": {
            "q": dense("attention.self.query"),
            "k": dense("attention.self.key"),
            "v": dense("attention.self.value"),
            "attn_out": dense("attention.output.dense"),
            "attn_ln": ln("attention.output.LayerNorm"),
            "ffn_in": dense("intermediate.dense"),
            "ffn_out": dense("output.dense"),
            "ffn_ln": ln("output.LayerNorm"),
        },
        "pooler": {
            "kernel": jnp.asarray(get("pooler.dense.weight").T, dtype),
            "bias": jnp.asarray(get("pooler.dense.bias"), dtype),
        },
    }
