"""EmbeddingBag lookup: the asymmetric-dense query encoder's entire compute.

The reference caches a [V, H] table of per-token query embeddings and encodes
a query as the mean of its tokens' rows via ``nn.EmbeddingBag`` with flat ids
+ offsets (reference: finetune/emb_bag_mixin.py:14-39,
finetune/modeling_hybrid.py:471-474, inference tokenization at
exact_search_base.py:362-369). TPU-native redesign:

* batched static shapes: ids arrive as [B, L] padded (pad id = any, masked),
  not flat+offsets — one compiled program per (B, L) bucket.
* `embedding_bag_lookup`: XLA take + masked mean (fine for most uses; XLA
  lowers to a dynamic-gather).
* `embedding_bag_lookup_pallas`: scalar-prefetch kernel that DMAs exactly the
  L needed rows HBM->VMEM per query with double buffering — the query path
  never touches the rest of the table, which is what makes asymmetric-dense
  ~1000x cheaper than an LLM forward (BASELINE.md).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def embedding_bag_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    mode: str = "mean",
    normalize: bool = False,
) -> jnp.ndarray:
    """XLA path: out[b] = mean/sum over valid l of table[ids[b, l]].

    table: [V, H]; ids: [B, L] int; mask: [B, L] (None = all valid).
    """
    if mask is None:
        mask = jnp.ones(ids.shape, jnp.float32)
    mask = mask.astype(table.dtype)
    rows = jnp.take(table, ids, axis=0)          # [B, L, H]
    summed = (rows * mask[..., None]).sum(axis=1)
    if mode == "mean":
        out = summed / jnp.maximum(mask.sum(axis=1)[:, None], 1.0)
    elif mode == "sum":
        out = summed
    else:
        raise NotImplementedError(f"Unknown mode: {mode}")
    if normalize:
        out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-9)
    return out


def _embag_kernel(
    ids_ref,      # scalar-prefetch: [B, L] int32
    counts_ref,   # scalar-prefetch: [B, 1] int32 (valid count per row)
    table_ref,    # HBM: [V, 1, H] (middle singleton keeps dim 0 untiled,
                  #  so single-row dynamic slices need no 8-row alignment)
    out_ref,      # VMEM: [1, 1, H]
    scratch,      # VMEM: [2, 1, 1, H]
    sems,         # DMA sems: [2]
    *, max_len: int, mode: str,
):
    b = pl.program_id(0)
    h = out_ref.shape[2]
    n_valid = counts_ref[b, 0]

    def get_dma(slot, li):
        row = ids_ref[b, li]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1), :, :],
            scratch.at[slot],
            sems.at[slot],
        )

    # Warm up: start first row fetch
    @pl.when(n_valid > 0)
    def _():
        get_dma(0, 0).start()

    def body(li, acc):
        slot = li % 2
        nxt = (li + 1) % 2

        @pl.when(li + 1 < n_valid)
        def _():
            get_dma(nxt, li + 1).start()

        get_dma(slot, li).wait()
        return acc + scratch[slot, 0, 0, :].astype(jnp.float32)

    acc = jax.lax.fori_loop(0, n_valid, body, jnp.zeros((h,), jnp.float32))
    if mode == "mean":
        denom = jnp.maximum(n_valid.astype(jnp.float32), 1.0)
        acc = acc / denom
    out_ref[0, 0, :] = acc.astype(out_ref.dtype)


def embedding_bag_lookup_pallas(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    mode: str = "mean",
    normalize: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Pallas path: per-query double-buffered row DMA from the HBM table.

    Valid ids must be left-packed per row (tokenizers produce this shape);
    `mask` gives the count of valid leading entries.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, L = ids.shape
    v, h = table.shape
    if mask is None:
        counts = jnp.full((b, 1), L, jnp.int32)
    else:
        counts = mask.astype(jnp.int32).sum(axis=1, keepdims=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 1, h), lambda bi, *_: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 1, 1, h), table.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_embag_kernel, max_len=L, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, h), table.dtype),
        interpret=interpret,
    )(ids.astype(jnp.int32), counts, table.reshape(v, 1, h))[:, 0, :]
    if normalize:
        out = out / jnp.maximum(jnp.linalg.norm(out.astype(jnp.float32), axis=-1, keepdims=True), 1e-9).astype(out.dtype)
    return out


def flat_ids_to_padded(flat_ids, offsets, max_len: int):
    """Convert the reference's flat ids + offsets layout to padded [B, L] + mask.

    Host-side utility (numpy) for compatibility with EmbeddingBag-style inputs
    (reference: exact_search_base.py:362-369 tokenizes queries to flat+offsets).
    """
    import numpy as np

    flat_ids = np.asarray(flat_ids)
    offsets = np.asarray(offsets)
    b = len(offsets)
    ends = np.append(offsets[1:], len(flat_ids))
    ids = np.zeros((b, max_len), np.int32)
    mask = np.zeros((b, max_len), np.int32)
    for i in range(b):
        seg = flat_ids[offsets[i]:ends[i]][:max_len]
        ids[i, :len(seg)] = seg
        mask[i, :len(seg)] = 1
    return ids, mask
