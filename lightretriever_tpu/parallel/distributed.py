"""Multi-host (multi-slice) initialization — the DCN story.

The reference coordinates nodes with torchrun env vars + NCCL/TensorPipe
transport curation (reference: eval/call_evaluate_mteb.sh:29-34,
eval/eval_utils.py:127-167, inference/utils.py:10-22). On TPU pods the whole
of that collapses to ``jax.distributed.initialize``: every host sees the
global device set, one Mesh spans slices, XLA routes intra-slice collectives
over ICI and inter-slice over DCN.

Conventions:
* put the batch/corpus axis ("data") outermost so its collectives can cross
  DCN (all-gathers of k candidates and negatives are tiny);
* keep any "model" (TP) axis innermost so its heavy collectives stay on ICI
  within a slice — `create_multihost_mesh` lays devices out accordingly.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np

logger = logging.getLogger(__name__)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime (idempotent, env-var driven).

    On Cloud TPU pods all three args auto-detect; on other setups use
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env vars, mirroring the
    reference's MASTER_ADDR/WORLD_SIZE/RANK contract
    (inference/arguments.py:85-99).
    """
    from jax._src import distributed as _jax_distributed

    if _jax_distributed.global_state.client is not None:
        return  # already initialized (checking via jax.process_count() would
        # itself initialize the XLA backend and poison jax.distributed)
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES", "WORLD_SIZE")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID", "RANK")
    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    logger.info("jax.distributed: process %d/%d, %d global devices",
                jax.process_index(), jax.process_count(), jax.device_count())


def _int_env(*names: str) -> Optional[int]:
    for n in names:
        if n in os.environ:
            return int(os.environ[n])
    return None


def create_multihost_mesh(
    model_parallel: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
):
    """Global mesh over every process's devices: [data, model] with the model
    axis packed within hosts (ICI) and data spanning hosts (DCN-safe)."""
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = devices.size
    assert n % model_parallel == 0, (n, model_parallel)
    grid = devices.reshape(n // model_parallel, model_parallel)
    if model_parallel == 1:
        return Mesh(grid.reshape(-1), (axis_names[0],))
    return Mesh(grid, tuple(axis_names[:2]))
