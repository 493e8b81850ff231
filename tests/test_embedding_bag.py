"""EmbeddingBag lookup parity: XLA path vs Pallas DMA kernel vs numpy oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from lightretriever_tpu.ops.embedding_bag import (
    embedding_bag_lookup,
    embedding_bag_lookup_pallas,
    flat_ids_to_padded,
)


def make(rng, v=50, h=16, b=4, L=6):
    table = rng.standard_normal((v, h)).astype(np.float32)
    ids = rng.integers(0, v, size=(b, L)).astype(np.int32)
    mask = np.zeros((b, L), np.int32)
    lengths = rng.integers(1, L + 1, size=b)
    for i, n in enumerate(lengths):
        mask[i, :n] = 1
    return table, ids, mask, lengths


def oracle(table, ids, mask, mode="mean"):
    out = np.zeros((ids.shape[0], table.shape[1]), np.float32)
    for i in range(ids.shape[0]):
        rows = table[ids[i][mask[i] > 0]]
        out[i] = rows.sum(0) if mode == "sum" else rows.mean(0)
    return out


@pytest.mark.parametrize("mode", ["mean", "sum"])
def test_xla_lookup(rng, mode):
    table, ids, mask, _ = make(rng)
    got = np.asarray(embedding_bag_lookup(jnp.asarray(table), jnp.asarray(ids), jnp.asarray(mask), mode=mode))
    np.testing.assert_allclose(got, oracle(table, ids, mask, mode), rtol=1e-5)


@pytest.mark.parametrize("mode", ["mean", "sum"])
def test_pallas_lookup(rng, mode):
    table, ids, mask, _ = make(rng)
    got = np.asarray(
        embedding_bag_lookup_pallas(
            jnp.asarray(table), jnp.asarray(ids), jnp.asarray(mask), mode=mode, interpret=True
        )
    )
    np.testing.assert_allclose(got, oracle(table, ids, mask, mode), rtol=1e-5)


def test_pallas_normalize(rng):
    table, ids, mask, _ = make(rng)
    got = np.asarray(
        embedding_bag_lookup_pallas(
            jnp.asarray(table), jnp.asarray(ids), jnp.asarray(mask), normalize=True, interpret=True
        )
    )
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, rtol=1e-5)


def test_flat_ids_roundtrip(rng):
    flat = np.array([5, 7, 9, 2, 3, 1])
    offsets = np.array([0, 3, 5])
    ids, mask = flat_ids_to_padded(flat, offsets, max_len=4)
    assert ids.shape == (3, 4)
    np.testing.assert_array_equal(ids[0][: 3], [5, 7, 9])
    np.testing.assert_array_equal(mask.sum(1), [3, 2, 1])

    table = rng.standard_normal((10, 8)).astype(np.float32)
    got = np.asarray(embedding_bag_lookup(jnp.asarray(table), jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got[0], table[[5, 7, 9]].mean(0), rtol=1e-5)
