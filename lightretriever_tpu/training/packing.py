"""Sequence packing: pad-free batches via segment ids (cumulative_seq).

TPU-native replacement of the reference's FA2-varlen pad-removal pipeline
(reference: utils/nested_input.py:15-181 — unpad [B,S]->[1,total] with
cu_seqlens, monkey-patched into the LM, repad after). XLA wants static
shapes, so instead of dynamic unpadding:

* the host greedily packs valid tokens into a fixed [rows, max_len] grid with
  1-indexed segment ids and per-sequence restarting position ids;
* the flash-attention kernel's segment masking keeps sequences isolated
  (ops/flash_attention.py) — no cu_seqlens plumbing;
* ``unpack_hidden`` scatters packed hidden states back to the original
  [B, S, H] layout with one gather, so pooling code is unchanged.

Row count is rounded up to ``row_multiple`` so a handful of shapes compile.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def pack_encode_batch(
    batch: dict,
    max_len: Optional[int] = None,
    row_multiple: int = 8,
) -> dict:
    """Pack a padded host batch. Returns the batch plus ``packed_input_ids``
    [R, L], ``packed_segment_ids`` (0 = empty), ``packed_position_ids``,
    and the scatter map ``unpack_row``/``unpack_col`` [B, S].
    """
    ids = np.asarray(batch["input_ids"])
    mask = np.asarray(batch["attention_mask"]).astype(bool)
    b, s = ids.shape
    L = max_len or s
    lengths = mask.sum(1)

    # First-fit-decreasing packing over fixed-width rows
    order = np.argsort(-lengths, kind="stable")
    rows: list[int] = []      # remaining space per row
    placement: list[tuple[int, int]] = [None] * b  # (row, start) per example
    for idx in order:
        n = int(lengths[idx])
        for r in range(len(rows)):
            if rows[r] >= n:
                placement[idx] = (r, L - rows[r])
                rows[r] -= n
                break
        else:
            placement[idx] = (len(rows), 0)
            rows.append(L - n)

    n_rows = max(len(rows), 1)
    n_rows = (n_rows + row_multiple - 1) // row_multiple * row_multiple
    packed_ids = np.zeros((n_rows, L), ids.dtype)
    seg = np.zeros((n_rows, L), np.int32)
    pos = np.zeros((n_rows, L), np.int32)
    unpack_row = np.zeros((b, s), np.int32)
    unpack_col = np.zeros((b, s), np.int32)

    seg_counter = np.zeros(n_rows, np.int32)
    for i in range(b):
        r, start = placement[i]
        n = int(lengths[i])
        valid_pos = np.nonzero(mask[i])[0]
        seg_counter[r] += 1
        packed_ids[r, start: start + n] = ids[i, valid_pos]
        seg[r, start: start + n] = seg_counter[r]
        pos[r, start: start + n] = np.arange(n)
        unpack_row[i, valid_pos] = r
        unpack_col[i, valid_pos] = start + np.arange(n)

    out = dict(batch)
    out["packed_input_ids"] = packed_ids
    out["packed_segment_ids"] = seg
    out["packed_position_ids"] = pos
    out["unpack_row"] = unpack_row
    out["unpack_col"] = unpack_col
    return out


def unpack_hidden(packed_hidden, unpack_row, unpack_col, attention_mask):
    """[R, L, H] packed hidden -> [B, S, H] original layout (pads zeroed)."""
    import jax.numpy as jnp

    gathered = packed_hidden[unpack_row, unpack_col]        # [B, S, H]
    return gathered * attention_mask[..., None].astype(gathered.dtype)
