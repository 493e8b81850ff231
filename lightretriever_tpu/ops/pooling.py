"""Dense & sparse pooling ops (pure jnp, static shapes, trace-safe).

Behavioral parity with the reference's pooling library
(reference: src/lightretriever/finetune/dense_pooling.py:12-105 and
finetune/sparse_pooling.py:23-59), redesigned for XLA: no data-dependent
Python branching — the left-/right-padding distinction of ``lasttoken``
pooling is folded into a single index formula (position of the last valid
token), so one compiled program handles both.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _last_valid_index(attention_mask: jnp.ndarray, offset: int = 1) -> jnp.ndarray:
    """Index of the ``offset``-th-from-last valid (mask=1) position per row.

    Works for both right- and left-padded batches: finds the last position
    where mask is nonzero (S - 1 - argmax(reversed mask)) and steps back
    ``offset - 1``. Replaces the reference's left_padding branch
    (dense_pooling.py:48-55).
    """
    mask = attention_mask.astype(jnp.int32)
    seq_len = mask.shape[-1]
    rev = jnp.flip(mask, axis=-1)
    last = seq_len - 1 - jnp.argmax(rev, axis=-1)
    return jnp.maximum(last - (offset - 1), 0)


def pooling(
    last_hidden: jnp.ndarray,
    hidden_states: Optional[Sequence[jnp.ndarray]] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    pooling_strategy: str = "mean",
) -> jnp.ndarray:
    """Sentence-embedding pooling (parity: dense_pooling.py:12-82).

    Strategies: none | cls | mean | avg_first_last | avg_top2 | lasttoken |
    second_to_last | third_to_last.

    Args:
      last_hidden: [B, S, H] final-layer hidden states.
      hidden_states: optional tuple of per-layer hiddens (embeddings first),
        required by avg_first_last / avg_top2.
      attention_mask: [B, S] 1 for valid tokens.
    """
    if pooling_strategy == "none":
        return last_hidden

    if pooling_strategy == "cls":
        return last_hidden[:, 0]

    if pooling_strategy == "mean":
        m = attention_mask.astype(last_hidden.dtype)[..., None]
        return (last_hidden * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-9)

    if pooling_strategy == "avg_first_last":
        first_hidden = hidden_states[0]
        last = hidden_states[-1]
        m = attention_mask.astype(last.dtype)[..., None]
        avg = (first_hidden + last) / 2.0
        return (avg * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-9)

    if pooling_strategy == "avg_top2":
        second_last = hidden_states[-2]
        last = hidden_states[-1]
        m = attention_mask.astype(last.dtype)[..., None]
        avg = (last + second_last) / 2.0
        return (avg * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-9)

    if pooling_strategy in ("lasttoken", "second_to_last", "third_to_last"):
        offset = {"lasttoken": 1, "second_to_last": 2, "third_to_last": 3}[pooling_strategy]
        idx = _last_valid_index(attention_mask, offset=offset)
        return jnp.take_along_axis(last_hidden, idx[:, None, None], axis=1)[:, 0]

    raise NotImplementedError(f"Unknown pooling strategy: {pooling_strategy}")


def mean_eos_pooling(
    last_hidden_states: jnp.ndarray,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    eos_id: int,
) -> jnp.ndarray:
    """Mean of hidden states at EOS positions (parity: dense_pooling.py:85-105).

    Used by the non-contextual query-embedding training path: each query token
    is followed by an EOS whose hidden state represents that token; averaging
    the EOS states gives the query embedding.
    """
    eos_mask = (input_ids == eos_id) & attention_mask.astype(bool)
    m = eos_mask[..., None].astype(last_hidden_states.dtype)
    sum_eos = (last_hidden_states * m).sum(axis=1)
    counts = m.sum(axis=1)
    return sum_eos / jnp.maximum(counts, 1.0)


# ---------------------------------------------------------------------------
# Sparse attention masks (parity: sparse_pooling.py:23-59)
# ---------------------------------------------------------------------------
def get_prompt_mask(input_ids: jnp.ndarray, sep_token_id: int) -> jnp.ndarray:
    """True on the prompt region ``prompt + [SEP]`` (parity: sparse_pooling.py:43-59).

    Inputs are assumed ``prompt [SEP] text``. Rows with no SEP get an all-False
    mask; if every row's SEP is the final token (i.e. SEP used as EOS), the
    prompt mask is disabled — same semantics as the reference, but expressed
    with `jnp.where` so it stays trace-safe.
    """
    seq_len = input_ids.shape[-1]
    is_sep = input_ids == sep_token_id
    has_sep = is_sep.any(axis=-1)
    positions = jnp.argmax(is_sep.astype(jnp.int32), axis=-1)  # first SEP per row

    col = jnp.arange(seq_len)[None, :]
    mask = col <= positions[:, None]
    # Disable for rows without a SEP
    mask = mask & has_sep[:, None]
    # Reference's global check: if ALL rows place SEP at the last position,
    # treat SEP as EOS and return no prompt mask. (Done per-batch, matching
    # sparse_pooling.py:53-55; note `positions` is 0 for rows w/o SEP, so
    # restrict to rows that do have one.)
    all_last = jnp.all(jnp.where(has_sep, positions == seq_len - 1, True)) & has_sep.any()
    return jnp.where(all_last, False, mask)


def get_sparse_attention_mask(
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    sep_token_id: Optional[int] = None,
    remove_prompt: bool = False,
) -> jnp.ndarray:
    """Valid-position mask for sparse aggregation (parity: sparse_pooling.py:23-41).

    Masks out: padding, the first token (BOS/CLS), the last valid token
    (EOS/SEP), and (optionally) the prompt region before the separator.
    """
    mask = attention_mask.astype(bool)
    if remove_prompt:
        assert sep_token_id is not None
        mask = mask & ~get_prompt_mask(input_ids, sep_token_id)

    last_idx = _last_valid_index(attention_mask)
    col = jnp.arange(attention_mask.shape[-1])[None, :]
    mask = mask & (col != 0) & (col != last_idx[:, None])
    return mask
