"""Sparsify-pipeline parity tests vs torch oracles re-implementing the
reference semantics (sparse_pooling.py top-p/top-k/adaptive-top-k)."""
import numpy as np
import jax.numpy as jnp
import torch

from lightretriever_tpu.ops.sparsify import (
    top_p_sampling,
    top_k_sampling,
    adaptive_top_k_sampling,
    count_unique,
    top_k_sampling_bidirection,
    unique_ids_to_mask,
    get_scores_with_indices,
    get_unique_token_ids_mask,
    token_count_vector,
)


def torch_top_p(scores: torch.Tensor, top_p: float, min_keep: int = 1):
    """Oracle mirroring transformers TopPLogitsWarper semantics."""
    if top_p <= 0 or top_p >= 1:
        return scores
    sorted_logits, sorted_indices = torch.sort(scores, descending=False)
    cumulative_probs = sorted_logits.softmax(dim=-1).cumsum(dim=-1)
    remove = cumulative_probs <= (1 - top_p)
    remove[..., -min_keep:] = False
    indices_to_remove = remove.scatter(1, sorted_indices, remove)
    return scores.masked_fill(indices_to_remove, 0.0)


def test_top_p_matches_torch(rng):
    x = rng.standard_normal((4, 50)).astype(np.float32)
    for p in (0.3, 0.7, 0.95):
        got = np.asarray(top_p_sampling(jnp.asarray(x), p, min_tokens_to_keep=2))
        want = torch_top_p(torch.tensor(x), p, min_keep=2).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_top_p_noop_bounds(rng):
    x = rng.standard_normal((2, 10)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(top_p_sampling(jnp.asarray(x), 1.0)), x)
    np.testing.assert_array_equal(np.asarray(top_p_sampling(jnp.asarray(x), 0.0)), x)


def test_top_k(rng):
    x = rng.standard_normal((4, 30)).astype(np.float32)
    got = np.asarray(top_k_sampling(jnp.asarray(x), 5))
    kth = np.sort(x, axis=-1)[:, -5][:, None]
    want = np.where(x < kth, 0.0, x)
    np.testing.assert_allclose(got, want)
    assert (np.count_nonzero(got, axis=-1) >= 5).all()
    np.testing.assert_array_equal(np.asarray(top_k_sampling(jnp.asarray(x), 0)), x)


def test_count_unique(rng):
    ids = np.array([[1, 1, 2, 3], [4, 4, 4, 4], [9, 8, 7, 6]])
    got = np.asarray(count_unique(jnp.asarray(ids)))
    np.testing.assert_array_equal(got, [3, 1, 4])


def test_adaptive_top_k(rng):
    x = rng.standard_normal((3, 40)).astype(np.float32)
    ids = np.stack([
        np.array([1, 1, 2, 3, 3, 3, 4, 5]),     # 5 unique
        np.array([7, 7, 7, 7, 7, 7, 7, 7]),     # 1 unique
        np.arange(8),                           # 8 unique
    ])
    got = np.asarray(adaptive_top_k_sampling(jnp.asarray(x), jnp.asarray(ids), expansion_ratio=2.0, min_tokens_to_keep=2))
    for i, k in enumerate([10, 2, 16]):
        kth = np.sort(x[i])[-k]
        want = np.where(x[i] < kth, 0.0, x[i])
        np.testing.assert_allclose(got[i], want)


def test_top_k_bidirection(rng):
    x = rng.standard_normal((2, 20)).astype(np.float32)
    got = np.asarray(top_k_sampling_bidirection(jnp.asarray(x), 3))
    hi = np.sort(x, axis=-1)[:, -3][:, None]
    lo = np.sort(x, axis=-1)[:, 2][:, None]
    want = np.where((x < hi) & (x > lo), 0.0, x)
    np.testing.assert_allclose(got, want)


def test_unique_ids_to_mask():
    ids = np.array([[3, 5, -1], [0, -1, -1]])
    mask = np.asarray(unique_ids_to_mask(jnp.asarray(ids), 8))
    want = np.zeros((2, 8), bool)
    want[0, [3, 5]] = True
    want[1, 0] = True
    np.testing.assert_array_equal(mask, want)


def test_get_scores_with_indices(rng):
    x = rng.standard_normal((2, 8)).astype(np.float32)
    ids = np.array([[1, 2, -1], [7, -1, -1]])
    got = np.asarray(get_scores_with_indices(jnp.asarray(x), jnp.asarray(ids)))
    assert got[0, 1] == x[0, 1] and got[0, 2] == x[0, 2]
    assert got[0, [0, 3, 4, 5, 6, 7]].sum() == 0
    assert got[1, 7] == x[1, 7] and got[1, :7].sum() == 0


def test_unique_token_ids_mask():
    ids = np.array([[2, 2, 5, 0], [1, 3, 3, 3]])
    mask = np.array([[1, 1, 1, 0], [1, 1, 1, 0]])
    got = np.asarray(get_unique_token_ids_mask(jnp.asarray(ids), jnp.asarray(mask), 8))
    want = np.zeros((2, 8), bool)
    want[0, [2, 5]] = True
    want[1, [1, 3]] = True
    np.testing.assert_array_equal(got, want)


def test_token_count_vector():
    ids = np.array([[2, 2, 5, 0], [1, 1, 1, 9]])
    mask = np.array([[1, 1, 1, 0], [1, 1, 1, 1]])
    got_sum = np.asarray(token_count_vector(jnp.asarray(ids), jnp.asarray(mask), 10, "sum"))
    assert got_sum[0, 2] == 2 and got_sum[0, 5] == 1 and got_sum[0, 0] == 0
    assert got_sum[1, 1] == 3 and got_sum[1, 9] == 1
    got_bow = np.asarray(token_count_vector(jnp.asarray(ids), jnp.asarray(mask), 10, "bow"))
    assert got_bow[1, 1] == 1.0
