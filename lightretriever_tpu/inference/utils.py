"""Inference device utilities (parity: inference/utils.py:10-87).

The reference maintains a device->backend table (cuda->nccl, npu->hccl,
cpu/mps->gloo) plus move/empty-cache helpers. In JAX there is one runtime;
these helpers cover the same call sites: pytree device placement, a default-
device context, and buffer cleanup.
"""
from __future__ import annotations

import contextlib
import gc
from typing import Any, Iterator, Optional

import jax
import numpy as np


def move_to_device(batch: Any, device: Optional[jax.Device] = None,
                   sharding=None) -> Any:
    """Device-put a pytree of arrays (numeric leaves only; host-only leaves
    such as strings pass through untouched)."""
    target = sharding if sharding is not None else (device or jax.devices()[0])

    def _put(x):
        try:
            arr = np.asarray(x)
        except Exception:
            return x
        if arr.dtype.kind not in "bifu":
            return x
        return jax.device_put(arr, target)

    return jax.tree_util.tree_map(_put, batch)


@contextlib.contextmanager
def device_context(device: jax.Device) -> Iterator[None]:
    """Default-device scope (parity: device_context, inference/utils.py)."""
    with jax.default_device(device):
        yield


def empty_cache() -> None:
    """Release dead device buffers (parity: empty_cache — the torch
    cuda.empty_cache analogue; XLA frees on GC, so force a collection)."""
    gc.collect()


def device_count() -> int:
    return jax.device_count()


def local_device_count() -> int:
    return jax.local_device_count()
