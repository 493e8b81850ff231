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


class StepWatchdog:
    """Exit the process if a long-running loop stops making progress.

    ``ensure_device_alive`` only guards client BIRTH; the tunnel runtime can
    also wedge MID-RUN (observed round 4: after ~2k healthy train steps the
    next dispatch blocked on a futex forever once the device queue filled
    behind a dead transport — zero CPU, no exception, no progress). No
    reference analogue: torch/NCCL raises on a dead link, the tunnel hangs.

    The owning loop calls :meth:`beat` whenever it makes progress; a daemon
    thread exits the process with ``exit_code`` (17, the with_tpu.sh
    relaunch contract) if no beat arrives for ``timeout_s``. Training jobs
    checkpoint + auto-resume, so a relaunch loses at most one checkpoint
    interval. Enable via ``LR_STEP_WATCHDOG_S`` (with_tpu.sh exports it);
    a zero/absent value disables the watchdog entirely.
    """

    def __init__(self, timeout_s: float, exit_code: int = 17,
                 exit_fn=None, name: str = "step"):
        import os as _os
        import threading
        import time as _time

        self._time = _time
        self.timeout_s = float(timeout_s)
        self._last = _time.monotonic()
        self._stopped = threading.Event()
        self._exit_code = exit_code
        self._exit_fn = exit_fn or _os._exit
        self._name = name
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    @classmethod
    def from_env(cls, var: str = "LR_STEP_WATCHDOG_S", **kw):
        """Watchdog if the env var is a positive float, else None."""
        import os as _os

        try:
            t = float(_os.environ.get(var, "0") or 0)
        except ValueError:
            t = 0.0
        return cls(t, **kw) if t > 0 else None

    def beat(self) -> None:
        self._last = self._time.monotonic()

    def stop(self) -> None:
        self._stopped.set()

    def _run(self) -> None:
        import sys

        poll = max(min(self.timeout_s / 4.0, 10.0), 0.01)
        while not self._stopped.wait(poll):
            if self._time.monotonic() - self._last > self.timeout_s:
                print(f"StepWatchdog[{self._name}]: no progress in "
                      f"{self.timeout_s:.0f}s; exiting {self._exit_code} "
                      f"for relaunch", file=sys.stderr, flush=True)
                self._exit_fn(self._exit_code)
                return
