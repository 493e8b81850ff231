"""Worker for the 2-process jax.distributed test (run via subprocess).

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id>
Prints one JSON line with what this process observed.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lightretriever_tpu.parallel.distributed import (
    create_multihost_mesh,
    initialize_multihost,
)


def main():
    coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    initialize_multihost(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=proc_id)
    mesh = create_multihost_mesh()

    # Each process contributes its own slice of a global batch; the jit-ed
    # global sum must see every host's data (the DCN cross-host collective).
    local = np.full((2, 4), float(proc_id + 1), np.float32)  # 2 local devices
    global_shape = (2 * num_procs, 4)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, global_shape)

    @jax.jit
    def global_sum(x):
        return jnp.sum(x)

    total = float(global_sum(arr))
    # sum over procs of (proc_id+1) * 2 rows * 4 cols
    expect = sum((i + 1) * 8 for i in range(num_procs))
    print(json.dumps({
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "mesh_axes": list(mesh.shape.keys()),
        "mesh_data": mesh.shape["data"],
        "global_sum": total,
        "expected_sum": expect,
        "ok": abs(total - expect) < 1e-6,
    }))


if __name__ == "__main__":
    main()
