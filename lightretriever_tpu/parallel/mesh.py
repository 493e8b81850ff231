"""Device mesh + sharding spec helpers.

Replaces the reference's parallelism stack (accelerate FSDP/DeepSpeed YAMLs,
NCCL all_gather in finetune/modeling_encoder.py:475-570, torch-RPC encode farm
in inference/exact_search_torchrpc.py) with the JAX SPMD model: one Mesh,
NamedShardings, and pjit — collectives are inserted by XLA and ride ICI.

Axes convention:
  "data"  — batch / corpus sharding (DP; also FSDP param sharding axis)
  "model" — optional tensor-parallel axis for large doc encoders
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over available devices. A -1 dim absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    n = len(devices)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    assert total <= n, f"mesh shape {shape} needs {total} devices, have {n}"
    dev_array = np.array(devices[:total]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int = 2, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_sharding(mesh: Mesh, param, axis: str = "data", min_size: int = 2**16):
    """ZeRO-3-style parameter sharding as a plain NamedSharding.

    Shards the largest divisible dimension of each parameter over ``axis``;
    small params stay replicated. This is the TPU equivalent of the
    reference's FSDP full-shard config (config/fsdp_full_shard.yaml) — on TPU
    "FSDP" is just a sharding spec, XLA inserts the all-gathers.
    """
    n_shards = mesh.shape[axis]
    if param.size < min_size or n_shards == 1:
        return NamedSharding(mesh, P())
    # Choose the largest dim divisible by the axis size
    candidates = [(d, s) for d, s in enumerate(param.shape) if s % n_shards == 0]
    if not candidates:
        return NamedSharding(mesh, P())
    dim = max(candidates, key=lambda ds: ds[1])[0]
    spec = [None] * param.ndim
    spec[dim] = axis
    return NamedSharding(mesh, P(*spec))


def hybrid_param_sharding(
    mesh: Mesh,
    param,
    data_axis: str = "data",
    model_axis: str = "model",
    min_size: int = 2**14,
):
    """FSDP (data axis) + tensor-parallel (model axis) sharding spec.

    For a 2-axis mesh: the parameter's last dim divisible by the model-axis
    size is sharded over ``model`` (TP: column-parallel projections, vocab-dim
    embeddings), and one remaining dim divisible by the data-axis size is
    sharded over ``data`` (FSDP). Params too small or indivisible stay
    replicated. This is the whole of "FSDP + TP" on TPU — a spec per tensor,
    XLA inserts all-gathers/reduce-scatters (vs the reference's
    accelerate/DeepSpeed wrapper stack, config/*.yaml).
    """
    if model_axis not in mesh.shape:
        return fsdp_param_sharding(mesh, param, axis=data_axis, min_size=min_size)
    if param.size < min_size:
        return NamedSharding(mesh, P())
    n_model = mesh.shape[model_axis]
    n_data = mesh.shape[data_axis]
    spec = [None] * param.ndim
    # TP: prefer the last dim (output features / vocab)
    for d in range(param.ndim - 1, -1, -1):
        if param.shape[d] % n_model == 0 and param.shape[d] >= n_model:
            spec[d] = model_axis
            break
    # FSDP: largest remaining divisible dim
    cands = [(s, d) for d, s in enumerate(param.shape)
             if spec[d] is None and s % n_data == 0 and s >= n_data]
    if cands:
        spec[max(cands)[1]] = data_axis
    if all(s is None for s in spec):
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a host batch (pytree of arrays) sharded over the batch dim.

    This is the SPMD replacement of the reference's RPC chunk dispatch
    (exact_search_torchrpc.py:243-328): the host feeds one sharded array and
    every chip computes its slice.
    """
    def _put(x):
        arr = np.asarray(x)
        if arr.ndim == 0:
            return x  # python/0-d scalars stay host-side (jit statics etc.)
        sh = data_sharding(mesh, ndim=arr.ndim, axis=axis)
        return jax.device_put(arr, sh)

    return jax.tree_util.tree_map(_put, batch)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0, pad_value=0):
    """Pad ``axis`` up to a multiple (needed so batches divide the mesh)."""
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x, size
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, target - size)
    return np.pad(x, pad_width, constant_values=pad_value), size
