"""Host-side encode collator: texts -> static-shape numpy batches.

Behavioral parity with the reference's ``EncodeCollator``
(reference: inference/exact_search_base.py:267-437), redesigned for XLA's
static-shape world:

* sequence lengths bucket to a fixed ladder (one compiled program per bucket,
  instead of torch's dynamic padding);
* EmbeddingBag inputs are padded ``[B, L]`` id/mask arrays, not flat
  ids+offsets (the reference's nn.EmbeddingBag layout, exact_search_base.py:
  362-369) — same math, static shape;
* unique token ids are a padded ``[B, K]`` int array (pad = -1) scattered to a
  dense mask on device (ops/sparsify.py), replacing ragged list[list[int]].
"""
from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import numpy as np


def bucket_length(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def format_text(item: dict[str, str], prepend_prompt=False, prepend_whitespace=False) -> str:
    """Title+text merge with optional prompt (parity: exact_search_base.py:289-310)."""
    text = item.get("text", "")
    if item.get("title"):
        text = item["title"] + " " + text
    if prepend_whitespace:
        text = " " + text
    if prepend_prompt and item.get("prompt"):
        text = item["prompt"] + text
    return text


def pad_ragged(rows: list[list[int]], pad_value: int, width: Optional[int] = None,
               multiple: int = 8) -> np.ndarray:
    w = max((len(r) for r in rows), default=1)
    w = max(w, 1)
    if width is not None:
        w = width
    else:
        w = (w + multiple - 1) // multiple * multiple
    out = np.full((len(rows), w), pad_value, np.int32)
    for i, r in enumerate(rows):
        out[i, : min(len(r), w)] = r[:w]
    return out


@dataclass
class EncodeCollator:
    """texts (list[dict]) -> numpy batch for SpmdEncoder."""

    tokenizer: Any
    encode_is_query: bool
    q_max_len: int = 512
    p_max_len: int = 512
    length_buckets: tuple[int, ...] = (64, 128, 256, 512)
    pad_to_max_length: bool = False

    # Asymmetric dense: EmbeddingBag inputs
    noncontextual_query_embedding: bool = False
    noncontextual_prompt_prefix: Optional[str] = None

    # Sparse: unique ids + parameter-free query reps
    return_unique_token_ids: bool = False
    token_id_vector_type: str = "sum"
    use_word_pretokenizer: bool = False
    sparse_remove_stopwords: bool = False
    word_tokenizer: Any = None

    def __post_init__(self):
        if self.use_word_pretokenizer and self.word_tokenizer is None:
            from ..utils.word_pretokenizer import get_word_pretokenizer

            self.word_tokenizer = get_word_pretokenizer()

    # -- helpers -------------------------------------------------------------
    def _tokenize_padded(self, texts: list[str], max_length: int) -> dict[str, np.ndarray]:
        enc = self.tokenizer(
            texts, max_length=max_length, truncation=True,
            padding=False, add_special_tokens=True,
        )
        ids = enc["input_ids"]
        longest = max((len(r) for r in ids), default=1)
        width = max_length if self.pad_to_max_length else min(
            bucket_length(longest, self.length_buckets), max_length
        )
        pad_id = self.tokenizer.pad_token_id or 0
        input_ids = pad_ragged(ids, pad_id, width=width)
        mask = pad_ragged([[1] * len(r) for r in ids], 0, width=width)
        return {"input_ids": input_ids, "attention_mask": mask}

    def __call__(self, texts: list[dict[str, str]]) -> dict[str, Any]:
        max_length = self.q_max_len if self.encode_is_query else self.p_max_len
        merged = [format_text(t, prepend_prompt=True) for t in texts]
        batch: dict[str, Any] = self._tokenize_padded(merged, max_length)

        if self.noncontextual_query_embedding and self.encode_is_query:
            # EmbeddingBag lookup ids: bare text tokens, no prompt/specials
            # (parity: tokenize_nonctx_qry_emb_bag, nonctx_emb_utils.py:197-220)
            bare = [format_text(t) for t in texts]
            ids = self.tokenizer(
                bare, max_length=max_length, truncation=True,
                add_special_tokens=False,
            )["input_ids"]
            batch["emb_bag_ids"] = pad_ragged(ids, 0)
            batch["emb_bag_mask"] = pad_ragged([[1] * len(r) for r in ids], 0)

        # Unique token ids (always computed, like the reference collator)
        if self.use_word_pretokenizer:
            word_lists = self.word_tokenizer(
                [format_text(t) for t in texts],
                remove_stopwords=self.sparse_remove_stopwords,
            )
            token_ids = self.tokenizer(
                word_lists, is_split_into_words=True, add_special_tokens=False
            )["input_ids"]
        else:
            neat = [format_text(t, prepend_whitespace=True) for t in texts]
            token_ids = self.tokenizer(
                neat, max_length=max_length, truncation=True,
                add_special_tokens=False,
            )["input_ids"]
        unique = [sorted(set(r)) for r in token_ids]
        batch["unique_token_ids"] = pad_ragged(unique, -1)

        # Parameter-free query reps (parity: exact_search_base.py:395-433)
        reps_str: list[str] = []
        reps_json: list[dict[str, int]] = []
        if self.token_id_vector_type == "bow":
            for u in unique:
                reps_str.append(" ".join(map(str, u)))
                reps_json.append({str(t): 1 for t in u})
        elif self.token_id_vector_type == "sum":
            for r in token_ids:
                reps_str.append(" ".join(map(str, r)))
                reps_json.append({str(k): v for k, v in Counter(r).items()})
        else:
            raise NotImplementedError(self.token_id_vector_type)
        batch["token_id_reps_str"] = reps_str
        batch["token_id_reps_json"] = reps_json
        return batch


def parse_texts(sentences, prompt: Optional[str] = None) -> list[dict[str, str]]:
    """Normalize input formats (parity: exact_search_base.py:58-92):
    [str] | [dict] | HF dataset -> list[{'text', 'title'?, 'prompt'?}]."""
    out = []
    for s in sentences:
        if isinstance(s, str):
            item = {"text": s}
        elif isinstance(s, dict):
            item = dict(s)
        else:
            raise TypeError(f"Unsupported sentence type: {type(s)}")
        if prompt and "prompt" not in item:
            item["prompt"] = prompt
        out.append(item)
    return out
