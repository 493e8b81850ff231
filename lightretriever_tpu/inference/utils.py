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


def ensure_device_alive(timeout_s: Optional[float] = None,
                        exit_code: int = 17) -> None:
    """Fail fast if the accelerator client is wedged.

    A TPU client whose transport died at birth (observed with the tunnel
    runtime: async dispatches enqueue fine, the first synchronous readback
    blocks forever) cannot raise — it hangs. Run one tiny synchronous op
    under a watchdog; if it doesn't complete in ``timeout_s`` the process
    exits with ``exit_code`` so a launcher (scripts/with_tpu.sh) can retry
    with a fresh client. Call early, before expensive host-side setup.
    """
    import os
    import threading

    import jax.numpy as jnp

    if timeout_s is None:
        timeout_s = float(os.environ.get("LR_DEVICE_ALIVE_TIMEOUT", 120))
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            import sys

            print(f"ensure_device_alive: no response from "
                  f"{jax.default_backend()} in {timeout_s}s; exiting "
                  f"{exit_code} for relaunch", file=sys.stderr, flush=True)
            os._exit(exit_code)

    threading.Thread(target=watchdog, daemon=True).start()
    x = jnp.ones((128, 128))
    float(jnp.sum(x @ x))  # synchronous readback
    done.set()
