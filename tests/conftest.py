"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

The TPU-world equivalent of a fake distributed backend (SURVEY.md §4): all
sharding/collective tests run on `--xla_force_host_platform_device_count=8`
CPU devices, so multi-chip semantics are exercised without TPU hardware.
"""
import os

# Hard override: the ambient environment pins JAX_PLATFORMS to the TPU tunnel
# ('axon') and sitecustomize pre-imports jax, so the env var alone is too late;
# tests must run on the deterministic multi-device CPU backend via config.update.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from lightretriever_tpu.parallel import create_mesh

    return create_mesh((-1,), ("data",))


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
