"""Pooling op parity tests vs independent numpy oracles (right & left padding)."""
import numpy as np
import jax.numpy as jnp

from lightretriever_tpu.ops.pooling import (
    pooling,
    mean_eos_pooling,
    get_prompt_mask,
    get_sparse_attention_mask,
)


def make_batch(rng, b=4, s=10, h=8, left_pad=False):
    hid = rng.standard_normal((b, s, h)).astype(np.float32)
    lengths = rng.integers(3, s + 1, size=b)
    mask = np.zeros((b, s), dtype=np.int32)
    for i, L in enumerate(lengths):
        if left_pad:
            mask[i, s - L:] = 1
        else:
            mask[i, :L] = 1
    return hid, mask, lengths


def test_mean_pooling(rng):
    hid, mask, _ = make_batch(rng)
    got = np.asarray(pooling(jnp.asarray(hid), attention_mask=jnp.asarray(mask), pooling_strategy="mean"))
    want = (hid * mask[..., None]).sum(1) / mask.sum(1)[:, None]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cls_pooling(rng):
    hid, mask, _ = make_batch(rng)
    got = np.asarray(pooling(jnp.asarray(hid), attention_mask=jnp.asarray(mask), pooling_strategy="cls"))
    np.testing.assert_allclose(got, hid[:, 0], rtol=1e-6)


def test_lasttoken_right_padding(rng):
    hid, mask, lengths = make_batch(rng, left_pad=False)
    got = np.asarray(pooling(jnp.asarray(hid), attention_mask=jnp.asarray(mask), pooling_strategy="lasttoken"))
    want = np.stack([hid[i, L - 1] for i, L in enumerate(lengths)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_lasttoken_left_padding(rng):
    hid, mask, _ = make_batch(rng, left_pad=True)
    got = np.asarray(pooling(jnp.asarray(hid), attention_mask=jnp.asarray(mask), pooling_strategy="lasttoken"))
    want = hid[:, -1]  # left padding: last position is always valid
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_second_third_to_last(rng):
    hid, mask, lengths = make_batch(rng, left_pad=False)
    got2 = np.asarray(pooling(jnp.asarray(hid), attention_mask=jnp.asarray(mask), pooling_strategy="second_to_last"))
    got3 = np.asarray(pooling(jnp.asarray(hid), attention_mask=jnp.asarray(mask), pooling_strategy="third_to_last"))
    want2 = np.stack([hid[i, L - 2] for i, L in enumerate(lengths)])
    want3 = np.stack([hid[i, L - 3] for i, L in enumerate(lengths)])
    np.testing.assert_allclose(got2, want2, rtol=1e-6)
    np.testing.assert_allclose(got3, want3, rtol=1e-6)


def test_avg_first_last_and_top2(rng):
    hid, mask, _ = make_batch(rng)
    layers = [rng.standard_normal(hid.shape).astype(np.float32) for _ in range(3)]
    jl = [jnp.asarray(x) for x in layers]
    got_fl = np.asarray(pooling(jl[-1], hidden_states=jl, attention_mask=jnp.asarray(mask), pooling_strategy="avg_first_last"))
    want_fl = (((layers[0] + layers[-1]) / 2) * mask[..., None]).sum(1) / mask.sum(1)[:, None]
    np.testing.assert_allclose(got_fl, want_fl, rtol=1e-5)
    got_t2 = np.asarray(pooling(jl[-1], hidden_states=jl, attention_mask=jnp.asarray(mask), pooling_strategy="avg_top2"))
    want_t2 = (((layers[-1] + layers[-2]) / 2) * mask[..., None]).sum(1) / mask.sum(1)[:, None]
    np.testing.assert_allclose(got_t2, want_t2, rtol=1e-5)


def test_mean_eos_pooling(rng):
    b, s, h = 3, 12, 4
    hid = rng.standard_normal((b, s, h)).astype(np.float32)
    eos_id = 99
    ids = rng.integers(1, 50, size=(b, s))
    ids[0, [2, 5]] = eos_id
    ids[1, [7]] = eos_id
    ids[2, [1, 3, 8]] = eos_id
    mask = np.ones((b, s), dtype=np.int32)
    mask[2, 8] = 0  # masked eos should not count
    got = np.asarray(mean_eos_pooling(jnp.asarray(hid), jnp.asarray(ids), jnp.asarray(mask), eos_id))
    for i in range(b):
        pos = [j for j in range(s) if ids[i, j] == eos_id and mask[i, j]]
        want = hid[i, pos].mean(0)
        np.testing.assert_allclose(got[i], want, rtol=1e-5)


def test_prompt_mask():
    sep = 7
    ids = np.array([
        [1, 2, sep, 4, 5],   # prompt = positions 0..2
        [1, 2, 3, 4, 5],     # no sep -> no prompt
    ])
    got = np.asarray(get_prompt_mask(jnp.asarray(ids), sep))
    want = np.array([
        [True, True, True, False, False],
        [False, False, False, False, False],
    ])
    np.testing.assert_array_equal(got, want)


def test_prompt_mask_sep_as_eos():
    sep = 7
    ids = np.array([[1, 2, 3, sep], [4, 5, 6, sep]])
    got = np.asarray(get_prompt_mask(jnp.asarray(ids), sep))
    assert not got.any()  # all SEPs at last position -> SEP acts as EOS


def test_sparse_attention_mask(rng):
    b, s = 3, 8
    ids = rng.integers(1, 50, size=(b, s))
    mask = np.ones((b, s), dtype=np.int32)
    mask[0, 5:] = 0  # length 5
    got = np.asarray(get_sparse_attention_mask(jnp.asarray(ids), jnp.asarray(mask)))
    # first token and last valid token masked
    assert not got[:, 0].any()
    assert not got[0, 4] and got[0, 3]
    assert not got[1, 7] and got[1, 6]
    assert not got[0, 5:].any()  # padding masked
