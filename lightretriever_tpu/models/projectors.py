"""Dense & sparse projector heads with the reference's on-disk contract.

Parity targets:
* DenseLinearProjector — 1-layer MLP on pooled embeddings, persisted as
  ``pooler_config.json`` + weights (reference: finetune/dense_projector.py:20-141).
* SparseLinearProjector — hidden -> vocab linear, optionally initialized from
  the LM head (reference: finetune/sparse_projector.py:145).
* SparseDownProjector — hidden -> scalar scattered to vocab with amax
  (BGE-m3 reproduction; reference: finetune/sparse_projector.py:156-226);
  the reference's ``scatter_reduce_(amax)`` becomes a jnp ``.at[].max``.

Weights are stored as ``pooler.safetensors`` (numpy) instead of torch ``.pt``.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

POOLER_CONFIG_NAME = "pooler_config.json"
POOLER_WEIGHTS_NAME = "pooler.safetensors"


def _save(path: str, cfg: dict, params: dict) -> None:
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, POOLER_CONFIG_NAME), "w") as f:
        json.dump(cfg, f, indent=2)
    save_file(
        {k: np.asarray(v, np.float32) for k, v in params.items()},
        os.path.join(path, POOLER_WEIGHTS_NAME),
    )


def _load(path: str) -> tuple[dict, dict]:
    from safetensors import safe_open

    with open(os.path.join(path, POOLER_CONFIG_NAME)) as f:
        cfg = json.load(f)
    params = {}
    with safe_open(os.path.join(path, POOLER_WEIGHTS_NAME), framework="np") as f:
        for k in f.keys():
            params[k] = jnp.asarray(f.get_tensor(k))
    return cfg, params


class DenseLinearProjector:
    """Linear projection of pooled dense reps: [B, in] -> [B, out]."""

    kind = "dense_linear"

    def __init__(self, params: dict, input_dim: int, output_dim: int):
        self.params = params
        self.input_dim = input_dim
        self.output_dim = output_dim

    @classmethod
    def init(cls, key: jax.Array, input_dim: int, output_dim: int, dtype=jnp.float32):
        k1, _ = jax.random.split(key)
        params = {
            "kernel": (jax.random.normal(k1, (input_dim, output_dim)) * 0.02).astype(dtype),
            "bias": jnp.zeros((output_dim,), dtype),
        }
        return cls(params, input_dim, output_dim)

    def __call__(self, x: jnp.ndarray, params: Optional[dict] = None) -> jnp.ndarray:
        p = params if params is not None else self.params
        return x @ p["kernel"] + p["bias"]

    def save_pooler(self, path: str):
        _save(path, {"kind": self.kind, "input_dim": self.input_dim,
                     "output_dim": self.output_dim}, self.params)

    @classmethod
    def load(cls, path: str):
        cfg, params = _load(path)
        return cls(params, cfg["input_dim"], cfg["output_dim"])


class SparseLinearProjector:
    """hidden -> vocab projection for sparse heads; init from LM head allowed."""

    kind = "sparse_linear"

    def __init__(self, params: dict, hidden_dim: int, vocab_size: int):
        self.params = params
        self.hidden_dim = hidden_dim
        self.vocab_size = vocab_size

    @classmethod
    def init(
        cls, key: jax.Array, hidden_dim: int, vocab_size: int,
        init_weight: Optional[jnp.ndarray] = None, dtype=jnp.float32,
    ):
        if init_weight is not None:
            kernel = jnp.asarray(init_weight, dtype)  # [H, V]
            assert kernel.shape == (hidden_dim, vocab_size)
        else:
            kernel = (jax.random.normal(key, (hidden_dim, vocab_size)) * 0.02).astype(dtype)
        return cls({"kernel": kernel, "bias": jnp.zeros((vocab_size,), dtype)},
                   hidden_dim, vocab_size)

    def __call__(self, x: jnp.ndarray, params: Optional[dict] = None, **_) -> jnp.ndarray:
        p = params if params is not None else self.params
        return x @ p["kernel"] + p["bias"]

    def weight_bias(self, params: Optional[dict] = None):
        p = params if params is not None else self.params
        return p["kernel"], p["bias"]

    def save_pooler(self, path: str):
        _save(path, {"kind": self.kind, "hidden_dim": self.hidden_dim,
                     "vocab_size": self.vocab_size}, self.params)

    @classmethod
    def load(cls, path: str):
        cfg, params = _load(path)
        return cls(params, cfg["hidden_dim"], cfg["vocab_size"])


class SparseDownProjector:
    """hidden -> scalar relevance per token, scattered to vocab with max.

    out[b, v] = max over valid positions s with input_ids[b, s] == v of
    relu(h[b, s] @ w + b). The scatter-amax becomes ``.at[rows, ids].max``.
    """

    kind = "sparse_down"

    def __init__(self, params: dict, hidden_dim: int, vocab_size: int):
        self.params = params
        self.hidden_dim = hidden_dim
        self.vocab_size = vocab_size

    @classmethod
    def init(cls, key: jax.Array, hidden_dim: int, vocab_size: int, dtype=jnp.float32):
        return cls(
            {"kernel": (jax.random.normal(key, (hidden_dim, 1)) * 0.02).astype(dtype),
             "bias": jnp.zeros((1,), dtype)},
            hidden_dim, vocab_size,
        )

    def __call__(
        self,
        hidden: jnp.ndarray,           # [B, S, H] token-level hidden states
        input_ids: jnp.ndarray,        # [B, S]
        attention_mask: Optional[jnp.ndarray] = None,
        params: Optional[dict] = None,
    ) -> jnp.ndarray:
        p = params if params is not None else self.params
        b, s, _ = hidden.shape
        scores = jax.nn.relu(
            (hidden @ p["kernel"] + p["bias"]).squeeze(-1).astype(jnp.float32)
        )  # [B, S]
        if attention_mask is not None:
            scores = jnp.where(attention_mask.astype(bool), scores, 0.0)
            safe_ids = jnp.where(attention_mask.astype(bool), input_ids, 0)
        else:
            safe_ids = input_ids
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, s))
        out = jnp.zeros((b, self.vocab_size), jnp.float32)
        return out.at[rows, safe_ids].max(scores)

    def save_pooler(self, path: str):
        _save(path, {"kind": self.kind, "hidden_dim": self.hidden_dim,
                     "vocab_size": self.vocab_size}, self.params)

    @classmethod
    def load(cls, path: str, vocab_size: Optional[int] = None):
        cfg, params = _load(path)
        return cls(params, cfg["hidden_dim"], vocab_size or cfg["vocab_size"])
