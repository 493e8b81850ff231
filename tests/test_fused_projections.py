"""Fused QKV / gate-up projection layout (VERDICT r2 weak #7).

The compute path may run with q/k/v concatenated into one GEMM and gate/up
into another (models/decoder.py:fuse_decoder_params). These tests pin:
  * fuse -> unfuse round trip is bitwise,
  * fused forward == unfused forward (same trace-level math, just one GEMM),
  * LoRA deltas still apply per-module on top of the fused GEMM,
  * save_decoder_params transparently un-fuses to the HF on-disk layout.
"""
import numpy as np
import jax
import jax.numpy as jnp

from lightretriever_tpu.models.config import DecoderConfig
from lightretriever_tpu.models import decoder as dec
from lightretriever_tpu.models.hf_loader import (
    load_decoder_params,
    save_decoder_params,
)
from lightretriever_tpu.models.lora import init_lora_params, lora_scale


def _cfg(attention_bias=False, tie=True):
    return DecoderConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=tie,
        attention_bias=attention_bias,
        model_type="qwen2" if attention_bias else "llama",
    )


def test_fuse_unfuse_roundtrip_bitwise():
    cfg = _cfg(attention_bias=True)
    params = dec.init_params(cfg, jax.random.key(0), jnp.float32)
    fused = dec.fuse_decoder_params(params)
    assert dec.params_are_fused(fused) and not dec.params_are_fused(params)
    assert "q_proj" not in fused["layers"] and "gate_proj" not in fused["layers"]
    back = dec.unfuse_decoder_params(fused, cfg)

    def flat(tree):
        return sorted(
            (jax.tree_util.keystr(p), x)
            for p, x in jax.tree_util.tree_flatten_with_path(tree)[0])

    for (pa, a), (pb, b) in zip(flat(params), flat(back)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_forward_matches_unfused(rng):
    for bias in (False, True):
        cfg = _cfg(attention_bias=bias)
        params = dec.init_params(cfg, jax.random.key(1), jnp.float32)
        fused = dec.fuse_decoder_params(params)
        ids = jnp.asarray(rng.integers(0, 128, size=(2, 10)))
        mask = np.ones((2, 10), np.int64)
        mask[1, 7:] = 0
        mask = jnp.asarray(mask)
        a = dec.forward(params, ids, mask, config=cfg, attn_impl="xla")
        b = dec.forward(fused, ids, mask, config=cfg, attn_impl="xla")
        np.testing.assert_allclose(
            np.asarray(a["last_hidden_state"]),
            np.asarray(b["last_hidden_state"]), atol=1e-5, rtol=1e-5)


def test_fused_forward_with_lora(rng):
    cfg = _cfg()
    params = dec.init_params(cfg, jax.random.key(2), jnp.float32)
    lora = init_lora_params(cfg, jax.random.key(3), r=4, dtype=jnp.float32)
    # make B nonzero so the delta actually matters
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 3 else x, lora)
    fused = dec.fuse_decoder_params(params)
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 9)))
    scale = lora_scale(4, 8)
    a = dec.forward(params, ids, config=cfg, attn_impl="xla",
                    lora=lora, lora_scale=scale)
    b = dec.forward(fused, ids, config=cfg, attn_impl="xla",
                    lora=lora, lora_scale=scale)
    base = dec.forward(fused, ids, config=cfg, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(a["last_hidden_state"]),
        np.asarray(b["last_hidden_state"]), atol=1e-5, rtol=1e-5)
    # and the adapters changed the output at all
    assert np.abs(np.asarray(a["last_hidden_state"]) -
                  np.asarray(base["last_hidden_state"])).max() > 1e-6


def test_save_unfuses_to_hf_layout(tmp_path, rng):
    cfg = _cfg(tie=False)
    params = dec.init_params(cfg, jax.random.key(4), jnp.float32)
    fused = dec.fuse_decoder_params(params)
    out = str(tmp_path / "ckpt")
    save_decoder_params(fused, cfg, out)
    loaded = load_decoder_params(out, cfg, dtype=jnp.float32)
    assert not dec.params_are_fused(loaded)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 8)))
    a = dec.forward(params, ids, config=cfg, attn_impl="xla")
    b = dec.forward(loaded, ids, config=cfg, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(a["last_hidden_state"]),
        np.asarray(b["last_hidden_state"]), atol=1e-5, rtol=1e-5)


def test_spmd_encoder_fuses_and_matches_unfused():
    """Production wiring: SpmdEncoder fuses the towers by default
    (fuse_projections=True) and the encode outputs are unchanged."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from tokenizer_fixture import make_tiny_tokenizer
    from lightretriever_tpu.arguments import (
        InferenceArguments, ModelArguments, TrainingArguments)
    from lightretriever_tpu.inference.encode import SpmdEncoder
    from lightretriever_tpu.models.hybrid import HybridModel

    tok = make_tiny_tokenizer()
    tiny = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=True)
    ma = ModelArguments(pooling_strategy="lasttoken", attn_implementation="xla",
                        hybrid_use_dense_vector=True,
                        hybrid_use_sparse_vector=True)
    model = HybridModel(ma, TrainingArguments(), tiny,
                        eos_token_id=tok.eos_token_id,
                        pad_token_id=tok.pad_token_id)
    params = model.init_params(jax.random.key(0))
    common = dict(encode_batch_size=4, pooling_strategy="lasttoken",
                  attn_implementation="xla")
    enc_f = SpmdEncoder(model, params, tok,
                        args=InferenceArguments(**common), mesh=None)
    enc_u = SpmdEncoder(model, params, tok,
                        args=InferenceArguments(fuse_projections=False, **common),
                        mesh=None)
    assert dec.params_are_fused(enc_f.params["qry"])
    assert not dec.params_are_fused(enc_u.params["qry"])
    qs = ["the quick fox", "lazy dog jumps", "cat sat on the mat"]
    a = enc_f.encode_queries(qs)
    b = enc_u.encode_queries(qs)
    np.testing.assert_allclose(np.asarray(a["dense_reps"]),
                               np.asarray(b["dense_reps"]), atol=2e-5, rtol=2e-5)
