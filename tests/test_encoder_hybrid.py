"""EncoderModel / HybridModel forward + loss tests (CPU, tiny configs)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightretriever_tpu.arguments import ModelArguments, TrainingArguments
from lightretriever_tpu.models.config import DecoderConfig
from lightretriever_tpu.models.encoder import (
    EncoderModel,
    cross_entropy_loss,
    kl_loss,
    local_negatives_mask,
    only_hn_mask,
)
from lightretriever_tpu.models.hybrid import HybridModel, aggregate, rowwise_nonzero_stats


TINY = DecoderConfig(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    tie_word_embeddings=True,
)


def _batch(key, b, s, vocab=128):
    ids = jax.random.randint(key, (b, s), 3, vocab)
    mask = jnp.ones((b, s), jnp.int32)
    return {"input_ids": ids, "attention_mask": mask}


def _margs(**kw):
    defaults = dict(pooling_strategy="lasttoken", score_function="cos_sim",
                    attn_implementation="xla")
    defaults.update(kw)
    return ModelArguments(**defaults)


def test_encoder_forward_loss():
    ma = _margs()
    ta = TrainingArguments(temperature=0.05)
    model = EncoderModel(ma, ta, TINY)
    params = model.init_params(jax.random.key(0))
    q = _batch(jax.random.key(1), 2, 8)
    p = _batch(jax.random.key(2), 4, 12)
    out = model.forward(params, q, p, training=True)
    assert out.scores.shape == (2, 4)
    assert jnp.isfinite(out.loss)
    # Normalized reps
    norms = jnp.linalg.norm(out.q_reps, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-4)


def test_encoder_loss_grad_flows():
    ma = _margs()
    ta = TrainingArguments()
    model = EncoderModel(ma, ta, TINY)
    params = model.init_params(jax.random.key(0))
    q = _batch(jax.random.key(1), 2, 8)
    p = _batch(jax.random.key(2), 4, 8)

    def loss_fn(pp):
        return model.forward(pp, q, p, training=True).loss

    g = jax.grad(loss_fn)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), g, 0.0
    )
    assert gnorm > 0


def test_only_hn_mask():
    scores = jnp.ones((2, 8))
    flags = jnp.array([True, False])
    masked = only_hn_mask(scores, flags, n_psg=4)
    # Row 0: only cols 0-3 survive
    assert (masked[0, :4] == 1).all()
    assert (masked[0, 4:] < -1e30).all()
    assert (masked[1] == 1).all()


def test_local_negatives_mask():
    scores = jnp.ones((4, 8))
    masked = local_negatives_mask(scores, group_q=2, n_psg=2)
    assert (masked[0, :4] == 1).all() and (masked[0, 4:] < -1e30).all()
    assert (masked[3, 4:] == 1).all() and (masked[3, :4] < -1e30).all()


def test_ce_kl_match_torch_semantics():
    scores = jnp.array([[2.0, 0.5, -1.0], [0.1, 3.0, 0.2]])
    tgt = jnp.array([0, 1])
    ce = cross_entropy_loss(scores, tgt)
    # Manual softmax CE
    expected = -np.mean(
        [np.log(np.exp(2.0) / np.exp([2.0, 0.5, -1.0]).sum()),
         np.log(np.exp(3.0) / np.exp([0.1, 3.0, 0.2]).sum())]
    )
    np.testing.assert_allclose(float(ce), expected, rtol=1e-5)

    kl = kl_loss(scores, scores)
    np.testing.assert_allclose(float(kl), 0.0, atol=1e-6)


def test_aggregate_mean_matches_naive():
    key = jax.random.key(0)
    h = jax.random.normal(key, (2, 6, 16))
    w = jax.random.normal(jax.random.fold_in(key, 1), (16, 40))
    b = jax.random.normal(jax.random.fold_in(key, 2), (40,))
    mask = jnp.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]])
    got = aggregate(h, w, b, mask, use_max=False)
    logits = jnp.einsum("bsh,hv->bsv", h, w) + b
    m = mask[..., None].astype(jnp.float32)
    want = (logits * m).sum(1) / m.sum(1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_aggregate_max_matches_naive():
    key = jax.random.key(3)
    h = jax.random.normal(key, (2, 6, 16))
    w = jax.random.normal(jax.random.fold_in(key, 1), (16, 40))
    mask = jnp.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]])
    got = aggregate(h, w, None, mask, use_max=True)
    logits = jnp.einsum("bsh,hv->bsv", h, w)
    masked = jnp.where(mask[..., None].astype(bool), logits, -jnp.inf)
    want = masked.max(1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_rowwise_nonzero_stats():
    x = jnp.array([[0.0, 0.5, 2.0, 0.0], [0.0, 0.0, 0.0, 0.0]])
    mx, mn, me, md, sc = rowwise_nonzero_stats(x)
    np.testing.assert_allclose(np.asarray(mx), [2.0, 0.0])
    np.testing.assert_allclose(np.asarray(mn), [0.5, 0.0])
    np.testing.assert_allclose(np.asarray(me), [1.25, 0.0])
    np.testing.assert_allclose(np.asarray(md), [0.5, 0.0])  # lower median
    np.testing.assert_allclose(np.asarray(sc), [2.0, 0.0])


@pytest.fixture(scope="module")
def hybrid_setup():
    ma = _margs(
        hybrid_use_dense_vector=True,
        hybrid_use_sparse_vector=True,
        hybrid_use_token_id_vector=True,
        sparse_use_relu=True,
        sparse_use_log_saturation=True,
    )
    ta = TrainingArguments(
        temperature=0.05,
        sparse_temperature=1.0,
        add_flops=True,
        matryoshka_dims=(None, 16),
        tok_den_scores_distillation=True,
    )
    model = HybridModel(ma, ta, TINY, eos_token_id=2)
    params = model.init_params(jax.random.key(0))
    return model, params


def test_hybrid_forward_all_reps(hybrid_setup):
    model, params = hybrid_setup
    q = _batch(jax.random.key(1), 2, 8)
    p = _batch(jax.random.key(2), 4, 12)
    out = model.forward(params, q, p, training=True)
    assert jnp.isfinite(out.loss)
    assert set(out.scores) == {"dense", "sparse", "imb_sparse"}
    assert "spr_stats/p_l0" in out.logs
    assert "q_flops_loss" in out.logs
    # Sparse reps nonneg after relu+log1p
    assert (out.q_reps["sparse_reps"] >= 0).all()


def test_hybrid_encode_inference_reps(hybrid_setup):
    model, params = hybrid_setup
    p = _batch(jax.random.key(2), 3, 10)
    p_reps = model.encode_passage(params, p)
    assert p_reps["dense_reps"].shape == (3, TINY.hidden_size)
    assert p_reps["sparse_reps"].shape == (3, TINY.vocab_size)


def test_hybrid_emb_bag_inference():
    ma = _margs(hybrid_use_emb_vector=True, noncontextual_query_embedding=True)
    ta = TrainingArguments()
    model = HybridModel(ma, ta, TINY, eos_token_id=2)
    params = model.init_params(jax.random.key(0))
    table = jax.random.normal(jax.random.key(5), (TINY.vocab_size, TINY.hidden_size))
    qry = {
        "emb_bag_ids": jnp.array([[3, 4, 5, 0], [6, 7, 0, 0]]),
        "emb_bag_mask": jnp.array([[1, 1, 1, 0], [1, 1, 0, 0]]),
    }
    reps = model.encode_query(params, qry, training=False, emb_bag=table,
                              encode_dense=False, encode_sparse=False)
    want0 = np.asarray(table[jnp.array([3, 4, 5])]).mean(0)
    want0 = want0 / np.linalg.norm(want0)
    np.testing.assert_allclose(np.asarray(reps["emb_reps"][0]), want0, rtol=1e-4, atol=1e-5)


def test_hybrid_nonctx_train_path():
    ma = _margs(hybrid_use_emb_vector=True, hybrid_use_dense_vector=True,
                noncontextual_query_embedding=True)
    ta = TrainingArguments(emb_den_scores_distillation=True)
    model = HybridModel(ma, ta, TINY, eos_token_id=2)
    params = model.init_params(jax.random.key(0))
    b, s = 2, 12
    # layout: [prompt(2)] [tok eos] x5
    ids = np.full((b, s), 2, np.int32)
    seg = np.zeros((b, s), np.int32)
    pos = np.zeros((b, s), np.int32)
    ids[:, :2] = [5, 6]
    seg[:, :2] = 1
    pos[:, :2] = [0, 1]
    for blk in range(5):
        st = 2 + blk * 2
        ids[:, st] = 10 + blk
        seg[:, st:st + 2] = blk + 2
        pos[:, st:st + 2] = [2, 3]
    qry = {
        "input_ids": jnp.arange(8)[None].repeat(b, 0) + 3,
        "attention_mask": jnp.ones((b, 8), jnp.int32),
        "nonctx_input_ids": jnp.asarray(ids),
        "nonctx_segment_ids": jnp.asarray(seg),
        "nonctx_position_ids": jnp.asarray(pos),
        "nonctx_attention_mask_2d": jnp.ones((b, s), jnp.int32),
        "nonctx_prompt_len": 2,
    }
    p = _batch(jax.random.key(2), 4, 10)
    out = model.forward(params, qry, p, training=True)
    assert jnp.isfinite(out.loss)
    assert "imb_dense" in out.scores


def test_bert_encoder_family():
    from lightretriever_tpu.models.bert import BertConfig

    cfg = BertConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     max_position_embeddings=64)
    ma = _margs(hybrid_model_architecture="bert", pooling_strategy="cls",
                enable_bidirectional_attention=True)
    ta = TrainingArguments(temperature=0.05)
    model = EncoderModel(ma, ta, cfg)
    params = model.init_params(jax.random.key(0))
    q = _batch(jax.random.key(1), 2, 8, vocab=96)
    p = _batch(jax.random.key(2), 4, 12, vocab=96)
    out = model.forward(params, q, p, training=True)
    assert out.scores.shape == (2, 4)
    assert jnp.isfinite(out.loss)
    g = jax.grad(lambda pp: model.forward(pp, q, p).loss)(params)
    gn = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert gn > 0


def test_bert_hybrid_with_down_projector():
    from lightretriever_tpu.models.bert import BertConfig

    cfg = BertConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     max_position_embeddings=64)
    ma = _margs(hybrid_model_architecture="bert", pooling_strategy="cls",
                hybrid_use_dense_vector=True, hybrid_use_sparse_vector=True,
                use_sparse_down_projector=True, sparse_pooling_strategy="none",
                sparse_use_relu=True)
    model = HybridModel(ma, TrainingArguments(), cfg, eos_token_id=2)
    params = model.init_params(jax.random.key(0))
    assert "spr_pooler_q" in params
    p = _batch(jax.random.key(2), 3, 10, vocab=96)
    reps = model.encode_passage(params, p)
    assert reps["dense_reps"].shape == (3, 32)
    assert reps["sparse_reps"].shape == (3, 96)


def test_hybrid_save_load_with_spr_pooler(tmp_path):
    ma = _margs(hybrid_use_dense_vector=True, hybrid_use_sparse_vector=True,
                use_sparse_linear_projector=True, sparse_use_relu=True)
    model = HybridModel(ma, TrainingArguments(), TINY, eos_token_id=2)
    params = model.init_params(jax.random.key(0))
    assert "spr_pooler_q" in params
    out_dir = str(tmp_path / "hyb")
    model.save(params, out_dir)

    model2, params2 = HybridModel.load(out_dir, dtype=jnp.float32)
    assert "spr_pooler_q" in params2
    np.testing.assert_allclose(
        np.asarray(params["spr_pooler_q"]["kernel"], np.float32),
        np.asarray(params2["spr_pooler_q"]["kernel"]), rtol=1e-6)
    # Loaded model reproduces sparse reps
    p = _batch(jax.random.key(2), 2, 8)
    a = model.encode_passage(params, p)["sparse_reps"]
    b = model2.encode_passage(params2, p)["sparse_reps"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3)


def test_matryoshka_weights_scale_prefix_losses():
    # Per-dim MRL loss weights (VERDICT r4 next #6): weighting dim-16 by w
    # must add exactly (w-1) x that sub-loss to the total; the reference
    # sums every dim unweighted (modeling_hybrid.py:664-672).
    ma = _margs(hybrid_use_dense_vector=True)
    q = _batch(jax.random.key(1), 2, 8)
    p = _batch(jax.random.key(2), 4, 12)

    ta0 = TrainingArguments(temperature=0.05, matryoshka_dims=(None, 16))
    model0 = HybridModel(ma, ta0, TINY, eos_token_id=2)
    params = model0.init_params(jax.random.key(0))
    out0 = model0.forward(params, q, p, training=True)

    ta1 = TrainingArguments(temperature=0.05, matryoshka_dims=(None, 16),
                            matryoshka_weights=(1.0, 3.0))
    model1 = HybridModel(ma, ta1, TINY, eos_token_id=2)
    out1 = model1.forward(params, q, p, training=True)

    sub = float(out0.logs["mrl_loss/den_clloss-dim16"])
    np.testing.assert_allclose(float(out1.loss),
                               float(out0.loss) + 2.0 * sub, rtol=1e-5)
