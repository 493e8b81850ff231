"""max_linear_mapping parity tests vs the naive oracle, in the style of the
reference's self-test (utils/max_linear_map.py:389-435): forward + backward
grads (hidden/weight/bias) with per-dtype tolerances."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightretriever_tpu.ops.max_linear_map import (
    max_linear_mapping,
    max_linear_map_reference,
    NEG_INF,
)


def make_inputs(rng, b=3, s=16, h=32, v=100, dtype=np.float32):
    hid = rng.standard_normal((b, s, h)).astype(dtype)
    w = rng.standard_normal((h, v)).astype(dtype) * 0.1
    bias = rng.standard_normal(v).astype(dtype) * 0.1
    mask = np.ones((b, s), np.int32)
    mask[0, 10:] = 0
    mask[1, 3:] = 0
    return jnp.asarray(hid), jnp.asarray(w), jnp.asarray(bias), jnp.asarray(mask)


def test_forward_parity(rng):
    hid, w, bias, mask = make_inputs(rng)
    got = max_linear_mapping(hid, w, bias, mask, vocab_tile=32, interpret=True, impl="pallas")
    want = max_linear_map_reference(hid, w, bias, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_forward_no_bias_no_mask(rng):
    hid, w, _, _ = make_inputs(rng)
    got = max_linear_mapping(hid, w, None, None, vocab_tile=32, interpret=True, impl="pallas")
    want = max_linear_map_reference(hid, w, None, jnp.ones(hid.shape[:2]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_forward_unaligned_vocab(rng):
    hid, w, bias, mask = make_inputs(rng, v=77)  # 77 % 32 != 0
    got = max_linear_mapping(hid, w, bias, mask, vocab_tile=32, interpret=True, impl="pallas")
    want = max_linear_map_reference(hid, w, bias, mask)
    assert got.shape == (3, 77)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_all_masked_row_returns_neg_inf(rng):
    hid, w, bias, mask = make_inputs(rng)
    mask = mask.at[2, :].set(0)
    got = max_linear_mapping(hid, w, bias, mask, vocab_tile=32, interpret=True, impl="pallas")
    assert float(np.asarray(got)[2].max()) <= NEG_INF / 2


def test_backward_parity(rng):
    hid, w, bias, mask = make_inputs(rng)

    def loss_kernel(hid, w, bias):
        out = max_linear_mapping(hid, w, bias, mask, vocab_tile=32, interpret=True, impl="pallas")
        return jnp.sum(jnp.tanh(out * 0.1))

    def loss_ref(hid, w, bias):
        out = max_linear_map_reference(hid, w, bias, mask)
        return jnp.sum(jnp.tanh(out * 0.1))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(hid, w, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(hid, w, bias)
    for a, b_, name in zip(gk, gr, ["hidden", "weight", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5, err_msg=name)


def test_backward_all_masked_row_zero_grad(rng):
    hid, w, bias, mask = make_inputs(rng)
    mask = mask.at[2, :].set(0)

    def loss(hid):
        out = max_linear_mapping(hid, w, bias, mask, vocab_tile=32, interpret=True, impl="pallas")
        # Use a bounded fn so the -1e30 row doesn't blow up the loss scale
        return jnp.sum(jnp.where(out > NEG_INF / 2, out, 0.0))

    g = jax.grad(loss)(hid)
    assert np.abs(np.asarray(g)[2]).max() == 0.0
    assert np.abs(np.asarray(g)[0, :10]).max() > 0.0  # valid rows get grads
    assert np.abs(np.asarray(g)[0, 10:]).max() == 0.0  # masked positions don't


def test_backward_no_bias(rng):
    hid, w, _, mask = make_inputs(rng)

    def loss(hid, w):
        return jnp.sum(max_linear_mapping(hid, w, None, mask, vocab_tile=32, interpret=True, impl="pallas"))

    def loss_ref(hid, w):
        return jnp.sum(max_linear_map_reference(hid, w, None, mask))

    gk = jax.grad(loss, argnums=(0, 1))(hid, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(hid, w)
    for a, b_, name in zip(gk, gr, ["hidden", "weight"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5, err_msg=name)


def test_bf16_forward(rng):
    hid, w, bias, mask = make_inputs(rng)
    got = max_linear_mapping(
        hid.astype(jnp.bfloat16), w.astype(jnp.bfloat16), bias.astype(jnp.bfloat16),
        mask, vocab_tile=32, interpret=True, impl="pallas",
    )
    want = max_linear_map_reference(hid, w, bias, mask)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=3e-2, atol=3e-2
    )


def test_jit_and_grad_composable(rng):
    hid, w, bias, mask = make_inputs(rng, v=64)

    @jax.jit
    def step(hid, w, bias):
        def loss(hid, w, bias):
            return jnp.mean(max_linear_mapping(hid, w, bias, mask, vocab_tile=32, interpret=True, impl="pallas") ** 2)
        return jax.value_and_grad(loss, argnums=(1, 2))(hid, w, bias)

    val, (gw, gb) = step(hid, w, bias)
    assert np.isfinite(float(val))
    assert gw.shape == w.shape and gb.shape == bias.shape


# ---------------------------------------------------------------------------
# XLA one-GEMM path (auto-dispatch for small logits footprints)
# ---------------------------------------------------------------------------
def test_xla_path_forward_parity(rng):
    hid, w, bias, mask = make_inputs(rng)
    got = max_linear_mapping(hid, w, bias, mask, impl="xla")
    want = max_linear_map_reference(hid, w, bias, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # fully-masked row -> NEG_INF everywhere
    mask0 = jnp.zeros_like(mask).at[1:].set(mask[1:])
    got0 = max_linear_mapping(hid, w, bias, mask0, impl="xla")
    assert np.all(np.asarray(got0[0]) == NEG_INF)


def test_xla_path_grad_parity(rng):
    hid, w, bias, mask = make_inputs(rng)

    def loss(impl):
        def f(hid_, w_, bias_):
            return jnp.mean(max_linear_mapping(
                hid_, w_, bias_, mask, vocab_tile=32, interpret=True,
                impl=impl) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(hid, w, bias)

    g_xla = loss("xla")
    g_pal = loss("pallas")
    for gx, gp, name in zip(g_xla, g_pal, ("dH", "dW", "db")):
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gp),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_auto_dispatch_threshold(rng):
    """Small problems route to XLA; both impls agree either way."""
    from lightretriever_tpu.ops import max_linear_map as mlm

    hid, w, bias, mask = make_inputs(rng)
    b, s, _ = hid.shape
    v = w.shape[1]
    assert b * s * v * 4 <= mlm.XLA_LOGITS_BYTES_LIMIT  # auto == xla here
    auto = max_linear_mapping(hid, w, bias, mask)
    forced = max_linear_mapping(hid, w, bias, mask, impl="xla")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(forced))
