"""EmbeddingBag construction: per-vocab-token query embeddings -> [V, H] table.

Behavioral parity with the reference's ``construct_embedding_bag``
(reference: finetune/nonctx_emb_utils.py:239-313 and the RPC-parallel variant
:316-398): forward every vocab id as ``[bos] [prompt] [tok] [eos]`` and pool
the EOS hidden state into row ``tok`` of an EmbeddingBag weight matrix.

TPU-native redesign: all rows share one static shape (the prompt is fixed),
so the whole construction is a single jit-compiled forward executed over
vocab-id batches; with a mesh, the batch dim shards over chips — the SPMD
replacement of the reference's queue+RPC fan-out.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pooling import pooling
from ..models import decoder as dec
from ..models.lora import lora_scale

logger = logging.getLogger(__name__)


def construct_embedding_bag(
    model,
    params,
    tokenizer=None,
    prompt: str = "",
    batch_size: int = 1024,
    mesh=None,
    vocab_size: Optional[int] = None,
    bos_token_id: Optional[int] = None,
    eos_token_id: Optional[int] = None,
    prompt_ids: Optional[list[int]] = None,
    show_progress: bool = True,
) -> np.ndarray:
    """Build the [V, H] EmbeddingBag table.

    ``tokenizer`` supplies bos/eos ids + prompt tokenization; alternatively
    pass ``bos_token_id``/``eos_token_id``/``prompt_ids`` directly.
    """
    cfg = model.config_qry
    v = vocab_size or cfg.vocab_size
    if tokenizer is not None:
        if bos_token_id is None:
            # Infer the bos switch exactly like the reference
            # (nonctx_emb_utils.py:258-262) — and like tokenize_nonctx_query,
            # so the train-time blocked encoder and this table agree.
            bos = getattr(tokenizer, "bos_token_id", None)
            if bos is not None and bos in tokenizer.encode("", add_special_tokens=True):
                bos_token_id = bos
        eos_token_id = tokenizer.eos_token_id if eos_token_id is None else eos_token_id
        if prompt and prompt_ids is None:
            prompt_ids = tokenizer(prompt, add_special_tokens=False)["input_ids"]
    eos_token_id = eos_token_id if eos_token_id is not None else model.eos_token_id
    prompt_ids = prompt_ids or []

    prefix = ([bos_token_id] if bos_token_id is not None else []) + list(prompt_ids)
    seq_len = len(prefix) + 2  # [prefix] [tok] [eos]
    tower, lora, config = model._tower(params, True)

    @jax.jit
    def _encode_batch(tower_params, lora_params, tok_ids):
        b = tok_ids.shape[0]
        pre = jnp.tile(jnp.asarray(prefix, jnp.int32)[None, :], (b, 1)) \
            if prefix else jnp.zeros((b, 0), jnp.int32)
        ids = jnp.concatenate(
            [pre, tok_ids[:, None],
             jnp.full((b, 1), eos_token_id, jnp.int32)], axis=1
        )
        out = dec.forward(
            tower_params, ids,
            attention_mask=jnp.ones((b, seq_len), jnp.int32),
            config=config,
            causal=not model.model_args.enable_bidirectional_attention,
            lora=lora_params,
            lora_scale=lora_scale(model.model_args.lora_r, model.model_args.lora_alpha)
            if lora_params is not None else 1.0,
        )
        # EOS (= last) hidden state is the token's embedding
        return pooling(out["last_hidden_state"],
                       attention_mask=jnp.ones((b, seq_len), jnp.int32),
                       pooling_strategy="lasttoken")

    if mesh is not None:
        from ..parallel.mesh import data_sharding, replicated_sharding

        tower = jax.device_put(tower, replicated_sharding(mesh))
        if lora is not None:
            lora = jax.device_put(lora, replicated_sharding(mesh))
        n_dev = int(np.prod(list(mesh.shape.values())))
        batch_size = (batch_size + n_dev - 1) // n_dev * n_dev

    table = np.zeros((v, cfg.hidden_size), np.float32)
    n_batches = (v + batch_size - 1) // batch_size
    for bi in range(n_batches):
        lo = bi * batch_size
        hi = min(lo + batch_size, v)
        tok = np.arange(lo, lo + batch_size, dtype=np.int32)
        tok[hi - lo:] = 0  # pad tail batch with token 0 (discarded)
        tok_dev = jnp.asarray(tok)
        if mesh is not None:
            tok_dev = jax.device_put(tok, data_sharding(mesh, ndim=1))
        reps = _encode_batch(tower, lora, tok_dev)
        table[lo:hi] = np.asarray(reps[: hi - lo], np.float32)
        if show_progress and bi % max(n_batches // 10, 1) == 0:
            logger.info("EmbeddingBag: %d/%d batches", bi + 1, n_batches)
    return table
