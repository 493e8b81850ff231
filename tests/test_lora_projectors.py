"""LoRA + projector tests: zero-init equivalence, merge parity, save/load."""
import jax
import jax.numpy as jnp
import numpy as np

from lightretriever_tpu.models.config import TINY_LLAMA
from lightretriever_tpu.models import decoder as dec
from lightretriever_tpu.models.lora import init_lora_params, merge_lora, lora_scale
from lightretriever_tpu.models.projectors import (
    DenseLinearProjector,
    SparseLinearProjector,
    SparseDownProjector,
)


def test_lora_zero_init_is_identity(rng):
    params = dec.init_params(TINY_LLAMA, jax.random.PRNGKey(0))
    lora = init_lora_params(TINY_LLAMA, jax.random.PRNGKey(1), r=4)
    ids = jnp.asarray(rng.integers(0, 512, size=(2, 8)))
    base = dec.forward(params, ids, config=TINY_LLAMA, attn_impl="xla")["last_hidden_state"]
    with_lora = dec.forward(
        params, ids, config=TINY_LLAMA, attn_impl="xla", lora=lora,
        lora_scale=lora_scale(4, 8),
    )["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_lora_trains_and_merges(rng):
    params = dec.init_params(TINY_LLAMA, jax.random.PRNGKey(0))
    lora = init_lora_params(TINY_LLAMA, jax.random.PRNGKey(1), r=4, target_modules=("q_proj", "down_proj"))
    # Make adapters non-trivial
    lora = jax.tree_util.tree_map(lambda x: x + 0.01, lora)
    ids = jnp.asarray(rng.integers(0, 512, size=(2, 8)))
    scale = lora_scale(4, 8)
    adapted = dec.forward(params, ids, config=TINY_LLAMA, attn_impl="xla", lora=lora, lora_scale=scale)["last_hidden_state"]
    base = dec.forward(params, ids, config=TINY_LLAMA, attn_impl="xla")["last_hidden_state"]
    assert float(jnp.abs(adapted - base).max()) > 1e-5  # adapters active

    merged = merge_lora(params, lora, r=4, alpha=8)
    merged_out = dec.forward(merged, ids, config=TINY_LLAMA, attn_impl="xla")["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(adapted), np.asarray(merged_out), atol=1e-5)


def test_lora_grads_flow_only_to_adapter(rng):
    params = dec.init_params(TINY_LLAMA, jax.random.PRNGKey(0))
    lora = init_lora_params(TINY_LLAMA, jax.random.PRNGKey(1), r=2, target_modules=("q_proj",))
    ids = jnp.asarray(rng.integers(0, 512, size=(1, 6)))

    def loss(lora):
        out = dec.forward(params, ids, config=TINY_LLAMA, attn_impl="xla", lora=lora)["last_hidden_state"]
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(lora)
    ga = np.asarray(g["layers"]["q_proj"]["a"])
    gb = np.asarray(g["layers"]["q_proj"]["b"])
    # b is zero-init so dL/da = 0 at step 0, but dL/db must be nonzero
    assert np.abs(gb).max() > 0


def test_dense_projector_save_load(tmp_path, rng):
    proj = DenseLinearProjector.init(jax.random.PRNGKey(0), 16, 8)
    x = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    y = proj(x)
    assert y.shape == (3, 8)
    proj.save_pooler(str(tmp_path))
    loaded = DenseLinearProjector.load(str(tmp_path))
    np.testing.assert_allclose(np.asarray(loaded(x)), np.asarray(y), atol=1e-6)


def test_sparse_linear_projector_lm_head_init(rng):
    w = jnp.asarray(rng.standard_normal((16, 50)).astype(np.float32))
    proj = SparseLinearProjector.init(jax.random.PRNGKey(0), 16, 50, init_weight=w)
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(proj(x)), np.asarray(x @ w), atol=1e-5)


def test_sparse_down_projector_scatter_amax(rng):
    proj = SparseDownProjector.init(jax.random.PRNGKey(0), 8, 20)
    hidden = jnp.asarray(rng.standard_normal((1, 5, 8)).astype(np.float32))
    ids = jnp.asarray(np.array([[3, 7, 3, 2, 0]]))
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0]]))
    out = np.asarray(proj(hidden, ids, mask))
    scores = np.asarray(
        jax.nn.relu((hidden @ proj.params["kernel"] + proj.params["bias"]).squeeze(-1))
    )
    assert out.shape == (1, 20)
    np.testing.assert_allclose(out[0, 3], max(scores[0, 0], scores[0, 2]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 7], scores[0, 1], rtol=1e-6)
    assert out[0, 0] == 0.0  # masked position does not scatter
    assert out[0, 1] == 0.0  # absent token
