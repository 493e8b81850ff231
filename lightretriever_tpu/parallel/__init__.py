"""Mesh/sharding helpers: the TPU-native replacement for the reference's
DDP/FSDP/DeepSpeed configs and NCCL/TensorPipe plumbing — parallelism here is
a `jax.sharding.Mesh` plus NamedSharding specs, with XLA collectives over ICI."""

from .mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    replicated_sharding,
    fsdp_param_sharding,
    shard_batch,
)
