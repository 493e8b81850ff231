"""Sparse-representation converters: [B, V] arrays -> Lucene-style formats.

Replacement of the reference's Rust ``sparse_emb_util.Converter`` fast path
and its pure-torch fallback (reference: finetune/sparse_converter_mixin.py:
19-101 fast, 103-188 fallback): quantize reps by ``x * factor`` (floor) and
serialize as json ``{token: impact}`` or pseudo-text ``"tok tok tok ..."``.

Vectorized numpy implementation; token extraction touches only the nonzero
entries of each row (np.nonzero), so cost is O(nnz), not O(V).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def quantize_sparse_reps(
    reps: np.ndarray, quantization_factor: int = 100
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Per-row (token_ids, int impacts) of quantized nonzero entries."""
    reps = np.asarray(reps)
    q = np.floor(reps * quantization_factor).astype(np.int64)
    rows, cols = np.nonzero(q > 0)
    vals = q[rows, cols]
    splits = np.searchsorted(rows, np.arange(1, reps.shape[0]))
    return np.split(cols, splits), np.split(vals, splits)


def _names(ids: np.ndarray, vocab: Optional[Sequence[str]]) -> list[str]:
    if vocab is None:
        return [str(i) for i in ids]
    return [vocab[i] for i in ids]


def convert_sparse_reps_to_json(
    reps: np.ndarray,
    quantization_factor: int = 100,
    convert_id_to_token: bool = False,
    vocab: Optional[Sequence[str]] = None,
    use_native: bool = True,
) -> list[dict[str, int]]:
    """Impact-vector json docs (parity: sparse_converter_mixin.py:19-63).

    Fast path: the C++ converter (native/converter.cpp) serializes the whole
    batch in one pass; falls back to vectorized numpy."""
    if use_native and not convert_id_to_token:
        from ..native import native_sparse_convert

        lines = native_sparse_convert(np.asarray(reps), quantization_factor,
                                      pseudo_text=False)
        if lines is not None:
            import json

            return [json.loads(line) if line else {} for line in lines]
    ids_list, vals_list = quantize_sparse_reps(reps, quantization_factor)
    out = []
    for ids, vals in zip(ids_list, vals_list):
        keys = _names(ids, vocab if convert_id_to_token else None)
        out.append({k: int(v) for k, v in zip(keys, vals)})
    return out


def convert_sparse_reps_to_pseudo_text(
    reps: np.ndarray,
    quantization_factor: int = 100,
    convert_id_to_token: bool = False,
    vocab: Optional[Sequence[str]] = None,
    use_native: bool = True,
) -> list[str]:
    """Impact-repeated pseudo-text (parity: sparse_converter_mixin.py:65-101):
    each token repeated ``impact`` times, e.g. ``"5 5 5 12 12"``."""
    if use_native and not convert_id_to_token:
        from ..native import native_sparse_convert

        lines = native_sparse_convert(np.asarray(reps), quantization_factor,
                                      pseudo_text=True)
        if lines is not None:
            return lines
    ids_list, vals_list = quantize_sparse_reps(reps, quantization_factor)
    out = []
    for ids, vals in zip(ids_list, vals_list):
        keys = _names(ids, vocab if convert_id_to_token else None)
        out.append(" ".join(
            " ".join([k] * int(v)) for k, v in zip(keys, vals)
        ))
    return out


def sparse_dicts_to_index_format(
    dicts: Sequence[dict[str, float]]
) -> list[dict[int, float]]:
    """str-keyed json dicts -> int-keyed vectors for SparseImpactIndex."""
    return [{int(k): float(v) for k, v in d.items()} for d in dicts]
