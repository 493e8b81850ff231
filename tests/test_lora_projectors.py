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


def test_encoder_model_with_lora_trains():
    """EncoderModel(lora=True): init, forward, grads flow ONLY to adapters
    when base is frozen, merged export matches adapted forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightretriever_tpu.arguments import ModelArguments, TrainingArguments
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.encoder import EncoderModel
    from lightretriever_tpu.models.lora import merge_lora

    cfg = DecoderConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, rope_theta=1e4,
                        tie_word_embeddings=True)
    ma = ModelArguments(pooling_strategy="lasttoken", attn_implementation="xla",
                        lora=True, lora_r=4, lora_alpha=8)
    model = EncoderModel(ma, TrainingArguments(), cfg)
    params = model.init_params(jax.random.key(0))
    assert "lora_qry" in params
    key = jax.random.key(1)
    q = {"input_ids": jax.random.randint(key, (2, 8), 3, 64),
         "attention_mask": jnp.ones((2, 8), jnp.int32)}
    p = {"input_ids": jax.random.randint(jax.random.fold_in(key, 1), (4, 8), 3, 64),
         "attention_mask": jnp.ones((4, 8), jnp.int32)}
    out = model.forward(params, q, p, training=True)
    assert jnp.isfinite(out.loss)
    g = jax.grad(lambda lp: model.forward({**params, "lora_qry": lp}, q, p).loss)(
        params["lora_qry"])
    gn = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert gn > 0  # grads reach the adapter

    # B=0 at init -> adapted == base; after perturbing B, merged == adapted
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 3 and x.shape[1] == 4 else x,
        params["lora_qry"])  # bump B matrices [L, r, out]
    adapted = model.encode_query({**params, "lora_qry": lora}, q)
    merged_tree = merge_lora(params["qry"], lora, r=4, alpha=8)
    plain = EncoderModel(
        ModelArguments(pooling_strategy="lasttoken", attn_implementation="xla"),
        TrainingArguments(), cfg)
    merged_out = plain.encode_query({"qry": merged_tree}, q)
    np.testing.assert_allclose(np.asarray(adapted), np.asarray(merged_out),
                               rtol=2e-3, atol=2e-3)
