"""Mesh/sharding helper tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from lightretriever_tpu.parallel import (
    create_mesh,
    data_sharding,
    fsdp_param_sharding,
    shard_batch,
)
from lightretriever_tpu.parallel.mesh import pad_to_multiple


def test_eight_devices():
    assert jax.device_count() == 8


def test_create_mesh_infers_size(mesh8):
    assert mesh8.shape["data"] == 8


def test_create_mesh_2d():
    mesh = create_mesh((2, -1), ("data", "model"))
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 4


def test_shard_batch(mesh8):
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    sharded = shard_batch(mesh8, {"x": x})["x"]
    assert sharded.sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_fsdp_sharding_large_vs_small(mesh8):
    big = np.zeros((1024, 256), np.float32)
    small = np.zeros((8,), np.float32)
    sh_big = fsdp_param_sharding(mesh8, big)
    sh_small = fsdp_param_sharding(mesh8, small)
    assert sh_big.spec != P()  # sharded
    assert sh_small.spec == P()  # replicated


def test_pad_to_multiple():
    x = np.ones((13, 3))
    padded, orig = pad_to_multiple(x, 8)
    assert padded.shape == (16, 3) and orig == 13
    assert padded[13:].sum() == 0
