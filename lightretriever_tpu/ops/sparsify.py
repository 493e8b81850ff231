"""Sparse-representation sparsification ops (static-shape jnp).

Behavioral parity with the reference's logits-sampling library
(reference: src/lightretriever/finetune/sparse_pooling.py:64-213), redesigned
for XLA: the reference's ragged ``unique_token_ids: list[list[int]]`` becomes a
padded int array (pad = -1) scattered into a dense [B, V] boolean mask, and all
top-p/top-k filters are expressed as sorts/thresholds with static shapes so
they compile once per (B, V).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def top_p_sampling(
    scores: jnp.ndarray,
    top_p: float,
    filter_value: float = 0.0,
    min_tokens_to_keep: int = 1,
) -> jnp.ndarray:
    """Nucleus filtering over vocab scores (parity: sparse_pooling.py:64-87).

    Sorts ascending, removes entries whose cumulative softmax mass is below
    ``1 - top_p``, always keeping the ``min_tokens_to_keep`` largest.
    ``top_p`` outside (0, 1) is a no-op, matching the reference safety check.
    """
    if top_p <= 0 or top_p >= 1:
        return scores

    sorted_logits = jnp.sort(scores, axis=-1)  # ascending
    sorted_idx = jnp.argsort(scores, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    remove_sorted = cum <= (1.0 - top_p)
    if min_tokens_to_keep > 0:
        keep_tail = jnp.arange(scores.shape[-1]) >= scores.shape[-1] - min_tokens_to_keep
        remove_sorted = remove_sorted & ~keep_tail[None, :]
    # Scatter back to original vocab order
    remove = jnp.zeros_like(remove_sorted).at[
        jnp.arange(scores.shape[0])[:, None], sorted_idx
    ].set(remove_sorted)
    return jnp.where(remove, filter_value, scores)


def top_k_sampling(
    scores: jnp.ndarray,
    top_k: int,
    filter_value: float = 0.0,
    min_tokens_to_keep: int = 1,
) -> jnp.ndarray:
    """Keep the k largest scores per row (parity: sparse_pooling.py:89-106).

    ``top_k <= 0`` is a no-op. Ties at the k-th value are kept (>= threshold),
    matching the reference's ``scores < kth`` masking.
    """
    if top_k <= 0:
        return scores
    top_k = max(top_k, min_tokens_to_keep)
    top_k = min(top_k, scores.shape[-1])
    kth = jax.lax.top_k(scores, top_k)[0][..., -1:]
    return jnp.where(scores < kth, filter_value, scores)


def count_unique(input_ids: jnp.ndarray) -> jnp.ndarray:
    """Number of distinct ids per row (parity: sparse_pooling.py:108-112)."""
    sorted_ids = jnp.sort(input_ids, axis=-1)
    diff = sorted_ids[:, 1:] != sorted_ids[:, :-1]
    return diff.sum(axis=-1) + 1


def adaptive_top_k_sampling(
    scores: jnp.ndarray,
    input_ids: jnp.ndarray,
    expansion_ratio: float,
    filter_value: float = 0.0,
    min_tokens_to_keep: int = 1,
) -> jnp.ndarray:
    """Per-row top-k where k = unique-token count x expansion ratio
    (parity: sparse_pooling.py:114-145). Static-shape: a full descending sort
    per row plus a dynamic threshold gather.
    """
    cnt = count_unique(input_ids)
    top_k = (cnt * expansion_ratio).astype(jnp.int32)
    top_k = jnp.clip(top_k, min_tokens_to_keep, scores.shape[-1])

    sorted_desc = -jnp.sort(-scores, axis=-1)
    kth = jnp.take_along_axis(sorted_desc, (top_k - 1)[:, None], axis=-1)
    return jnp.where(scores < kth, filter_value, scores)


def top_k_sampling_bidirection(
    scores: jnp.ndarray,
    top_k: int,
    use_largest: bool = True,
    use_smallest: bool = True,
    filter_value: float = 0.0,
    min_tokens_to_keep: int = 1,
) -> jnp.ndarray:
    """Keep top-k from the descending and/or ascending side
    (parity: sparse_pooling.py:181-213)."""
    if top_k <= 0:
        return scores
    top_k = max(top_k, min_tokens_to_keep)
    top_k = min(top_k, scores.shape[-1])

    if use_largest:
        kth_hi = jax.lax.top_k(scores, top_k)[0][..., -1:]
        remove_dsc = scores < kth_hi
    if use_smallest:
        kth_lo = -jax.lax.top_k(-scores, top_k)[0][..., -1:]
        remove_asc = scores > kth_lo

    if use_largest and use_smallest:
        remove = remove_dsc & remove_asc
    elif use_largest:
        remove = remove_dsc
    elif use_smallest:
        remove = remove_asc
    else:
        raise NotImplementedError("Set at least one of use_largest/use_smallest.")
    return jnp.where(remove, filter_value, scores)


# ---------------------------------------------------------------------------
# Unique-token-id masking: padded arrays instead of ragged lists
# ---------------------------------------------------------------------------
def unique_ids_to_mask(unique_token_ids: jnp.ndarray, vocab_size: int) -> jnp.ndarray:
    """Scatter padded unique-token-id rows into a dense [B, V] bool mask.

    ``unique_token_ids``: [B, K] int array, pad entries < 0 are ignored.
    TPU-native replacement for the reference's ragged list handling in
    ``get_scores_with_indices`` (sparse_pooling.py:158-179).
    """
    b, k = unique_token_ids.shape
    valid = unique_token_ids >= 0
    safe_ids = jnp.where(valid, unique_token_ids, 0)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, k))
    mask = jnp.zeros((b, vocab_size), dtype=bool)
    return mask.at[rows, safe_ids].max(valid)


def get_scores_with_indices(
    scores: jnp.ndarray,
    unique_token_ids: jnp.ndarray,
    filter_value: float = 0.0,
) -> jnp.ndarray:
    """Zero out scores for tokens not in the per-row id set
    (parity: sparse_pooling.py:158-179, padded-array form)."""
    mask = unique_ids_to_mask(unique_token_ids, scores.shape[-1])
    return jnp.where(mask, scores, filter_value)


def get_unique_token_ids_mask(
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    vocab_size: int,
) -> jnp.ndarray:
    """[B, V] bool mask of tokens present in each row's valid positions.

    Dense replacement of ``get_unique_token_ids`` (sparse_pooling.py:147-156):
    instead of materializing ragged unique-id lists on the host, scatter valid
    input ids straight into the vocab-sized mask on device.
    """
    b, s = input_ids.shape
    valid = attention_mask.astype(bool)
    safe_ids = jnp.where(valid, input_ids, 0)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, s))
    mask = jnp.zeros((b, vocab_size), dtype=bool)
    return mask.at[rows, safe_ids].max(valid)


# ---------------------------------------------------------------------------
# Full sparsify pipeline (parity: modeling_hybrid.py:142-203 `get_sparse_emb`)
# ---------------------------------------------------------------------------
def sparsify(
    logits: jnp.ndarray,
    *,
    is_query: bool,
    model_args,
    input_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    unique_token_ids: Optional[jnp.ndarray] = None,
    sep_token_id: Optional[int] = None,
) -> jnp.ndarray:
    """Sparsify aggregated vocab logits into the final sparse representation.

    Pipeline order matches the reference (modeling_hybrid.py:168-202):
    unique-token masking -> original-input-id masking -> ReLU -> log1p ->
    top-p -> top-k.
    """
    if logits.ndim == 1:
        logits = logits[None, :]

    if model_args.sparse_pool_from_unique_token_ids:
        assert unique_token_ids is not None
        logits = get_scores_with_indices(logits, unique_token_ids)

    pool_orig = (
        model_args.sparse_pool_from_original_input_ids_qry
        if is_query
        else model_args.sparse_pool_from_original_input_ids_psg
    )
    if pool_orig:
        from .pooling import get_sparse_attention_mask

        mask2d = get_sparse_attention_mask(
            input_ids, attention_mask, sep_token_id=sep_token_id,
            remove_prompt=model_args.add_sep_token,
        )
        id_mask = get_unique_token_ids_mask(input_ids, mask2d, logits.shape[-1])
        logits = jnp.where(id_mask, logits, 0.0)

    if model_args.sparse_use_relu:
        logits = jax.nn.relu(logits)
    if model_args.sparse_use_log_saturation:
        logits = jnp.log1p(logits)

    logits = top_p_sampling(
        logits,
        top_p=model_args.sparse_top_p_qry if is_query else model_args.sparse_top_p_psg,
        min_tokens_to_keep=model_args.sparse_min_tokens_to_keep,
    )
    logits = top_k_sampling(
        logits,
        top_k=model_args.sparse_top_k_qry if is_query else model_args.sparse_top_k_psg,
        min_tokens_to_keep=model_args.sparse_min_tokens_to_keep,
    )
    return logits


def token_count_vector(
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    vocab_size: int,
    vector_type: str = "sum",
) -> jnp.ndarray:
    """Parameter-free query representation from raw token ids.

    The "asymmetric sparse" query encoder (reference: finetune/data_utils.py
    token-id reps, scripts/asymmetric_sparse_infer.ipynb): ``sum`` counts
    occurrences, ``bow`` is the binarized set indicator.
    """
    b, s = input_ids.shape
    valid = attention_mask.astype(jnp.float32)
    safe_ids = jnp.where(attention_mask.astype(bool), input_ids, 0)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, s))
    counts = jnp.zeros((b, vocab_size), jnp.float32).at[rows, safe_ids].add(valid)
    if vector_type == "bow":
        return (counts > 0).astype(jnp.float32)
    if vector_type == "sum":
        return counts
    raise NotImplementedError(f"Unknown token_id_vector_type: {vector_type}")
