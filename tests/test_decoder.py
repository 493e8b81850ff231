"""Decoder parity vs HF transformers (torch CPU) on tiny random checkpoints.

The strongest correctness oracle available: build a tiny HF Llama/Qwen2 with
random weights, save safetensors, load through our hf_loader, and compare
hidden states + logits for right- and left-padded batches.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lightretriever_tpu.models.config import DecoderConfig
from lightretriever_tpu.models import decoder as dec
from lightretriever_tpu.models.hf_loader import load_decoder_checkpoint


@pytest.fixture(scope="module")
def tiny_llama_dir(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True, max_position_embeddings=256,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_llama")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


@pytest.fixture(scope="module")
def tiny_qwen_dir(tmp_path_factory):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, max_position_embeddings=256,
    )
    torch.manual_seed(1)
    model = Qwen2ForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_qwen")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def hf_hidden_and_logits(model, ids, mask):
    import torch

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            output_hidden_states=True,
        )
    return (
        out.hidden_states[-1].numpy(),
        out.logits.numpy(),
        [h.numpy() for h in out.hidden_states],
    )


def test_llama_parity_right_padding(tiny_llama_dir, rng):
    path, hf_model = tiny_llama_dir
    params, config = load_decoder_checkpoint(path, dtype=jnp.float32)
    assert config.model_type == "llama" and config.tie_word_embeddings

    ids = rng.integers(0, 128, size=(2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0
    want_hidden, want_logits, want_all = hf_hidden_and_logits(hf_model, ids, mask)

    out = dec.forward(
        params, jnp.asarray(ids), jnp.asarray(mask), config=config,
        attn_impl="xla", output_hidden_states=True,
    )
    got_hidden = np.asarray(out["last_hidden_state"])
    got_logits = np.asarray(dec.logits(params, out["last_hidden_state"], config))

    valid = mask.astype(bool)
    np.testing.assert_allclose(got_hidden[valid], want_hidden[valid], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(got_logits[valid], want_logits[valid], atol=2e-4, rtol=2e-3)
    # hidden_states stack: embeddings first
    np.testing.assert_allclose(
        np.asarray(out["hidden_states"][0])[valid], want_all[0][valid], atol=1e-5, rtol=1e-4
    )
    assert out["hidden_states"].shape[0] == len(want_all)


def test_llama_parity_left_padding(tiny_llama_dir, rng):
    path, hf_model = tiny_llama_dir
    params, config = load_decoder_checkpoint(path, dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(2, 8))
    mask = np.ones((2, 8), np.int64)
    mask[0, :3] = 0  # left padding
    import torch

    with torch.no_grad():
        # HF needs explicit position ids for left padding to match our convention
        pos = np.clip(np.cumsum(mask, 1) - 1, 0, None)
        out_hf = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(pos),
        )
    out = dec.forward(params, jnp.asarray(ids), jnp.asarray(mask), config=config, attn_impl="xla")
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"])[valid],
        out_hf.last_hidden_state.numpy()[valid] if hasattr(out_hf, "last_hidden_state") else None,
        atol=2e-4, rtol=2e-3,
    ) if hasattr(out_hf, "last_hidden_state") else None
    got_logits = np.asarray(dec.logits(params, out["last_hidden_state"], config))
    np.testing.assert_allclose(got_logits[valid], out_hf.logits.numpy()[valid], atol=2e-4, rtol=2e-3)


def test_qwen2_parity(tiny_qwen_dir, rng):
    path, hf_model = tiny_qwen_dir
    params, config = load_decoder_checkpoint(path, dtype=jnp.float32)
    assert config.attention_bias and not config.tie_word_embeddings
    assert "lm_head" in params and "bias" in params["layers"]["q_proj"]

    ids = rng.integers(0, 128, size=(2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[0, 9:] = 0
    want_hidden, want_logits, _ = hf_hidden_and_logits(hf_model, ids, mask)
    out = dec.forward(params, jnp.asarray(ids), jnp.asarray(mask), config=config, attn_impl="xla")
    got_logits = np.asarray(dec.logits(params, out["last_hidden_state"], config))
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"])[valid], want_hidden[valid], atol=2e-4, rtol=2e-3
    )
    np.testing.assert_allclose(got_logits[valid], want_logits[valid], atol=2e-4, rtol=2e-3)


def test_bidirectional_attention_differs(tiny_llama_dir, rng):
    """causal=False must change outputs (monkey_patch.py:17-56 equivalent)."""
    path, _ = tiny_llama_dir
    params, config = load_decoder_checkpoint(path, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 8)))
    causal = dec.forward(params, ids, config=config, attn_impl="xla")["last_hidden_state"]
    bidir = dec.forward(params, ids, config=config, causal=False, attn_impl="xla")["last_hidden_state"]
    assert float(jnp.abs(causal - bidir).max()) > 1e-4
    # First token sees the future only in bidirectional mode
    assert not np.allclose(np.asarray(causal)[0, 0], np.asarray(bidir)[0, 0])


def test_packed_equals_separate(tiny_llama_dir, rng):
    """Packing two sequences with segment ids == running them separately."""
    path, _ = tiny_llama_dir
    params, config = load_decoder_checkpoint(path, dtype=jnp.float32)
    a = rng.integers(0, 128, size=6)
    b = rng.integers(0, 128, size=4)
    packed_ids = jnp.asarray(np.concatenate([a, b])[None, :])
    seg = jnp.asarray(np.array([1] * 6 + [2] * 4)[None, :])
    pos = jnp.asarray(np.array(list(range(6)) + list(range(4)))[None, :])
    packed = dec.forward(
        params, packed_ids, segment_ids=seg, position_ids=pos, config=config, attn_impl="xla"
    )["last_hidden_state"]
    out_a = dec.forward(params, jnp.asarray(a[None, :]), config=config, attn_impl="xla")["last_hidden_state"]
    out_b = dec.forward(params, jnp.asarray(b[None, :]), config=config, attn_impl="xla")["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(packed)[0, :6], np.asarray(out_a)[0], atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(packed)[0, 6:], np.asarray(out_b)[0], atol=1e-4, rtol=1e-3)


def test_pallas_attn_matches_xla(tiny_llama_dir, rng):
    path, _ = tiny_llama_dir
    params, config = load_decoder_checkpoint(path, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 16)))
    mask = jnp.asarray(np.ones((2, 16), np.int32))
    out_xla = dec.forward(params, ids, mask, config=config, attn_impl="xla")["last_hidden_state"]
    out_pl = dec.forward(params, ids, mask, config=config, attn_impl="pallas")["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_pl), atol=1e-4, rtol=1e-3)


def test_llama3_rope_scaling():
    """llama3 rope remapping changes long-wavelength frequencies only."""
    base = DecoderConfig(rope_theta=500000.0, hidden_size=64, num_attention_heads=4)
    scaled = DecoderConfig(
        rope_theta=500000.0, hidden_size=64, num_attention_heads=4,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 8192,
        },
    )
    from lightretriever_tpu.models.decoder import _rope_inv_freq

    f_base = _rope_inv_freq(base)
    f_scaled = _rope_inv_freq(scaled)
    assert np.allclose(f_base[0], f_scaled[0])  # high freq unchanged
    assert f_scaled[-1] < f_base[-1]  # low freq slowed by factor
    np.testing.assert_allclose(f_scaled[-1], f_base[-1] / 8.0, rtol=1e-6)


def test_save_load_roundtrip(tmp_path, rng):
    """save_decoder_params -> load_decoder_params must be exact (caught a
    real bug: transposed views serialized with stale strides)."""
    from lightretriever_tpu.models.config import TINY_QWEN2
    from lightretriever_tpu.models.hf_loader import save_decoder_params

    params = dec.init_params(TINY_QWEN2, jax.random.PRNGKey(3))
    save_decoder_params(params, TINY_QWEN2, str(tmp_path))
    reloaded, cfg = load_decoder_checkpoint(str(tmp_path), dtype=jnp.float32)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(reloaded)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_contiguous_segments_derivation(tiny_llama_dir, rng, monkeypatch):
    """ADVICE r1 #2: the interior-block mask skip must only engage when the
    caller vouches for right padding (or there is no mask at all) — a
    left-padded mask with the skip lets valid tokens attend to padding."""
    import lightretriever_tpu.models.decoder as dmod

    path, _ = tiny_llama_dir
    params, config = load_decoder_checkpoint(path, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 16)))
    captured = []
    orig = dmod.flash_attention

    def spy(*a, **kw):
        captured.append(kw.get("contiguous_segments"))
        return orig(*a, **kw)

    monkeypatch.setattr(dmod, "flash_attention", spy)

    mask_left = np.ones((2, 16), np.int32)
    mask_left[0, :5] = 0
    dmod.forward(params, ids, jnp.asarray(mask_left), config=config, attn_impl="pallas")
    assert captured and all(c is False for c in captured), \
        "left-capable mask must not enable the skip by default"

    captured.clear()
    mask_right = np.ones((2, 16), np.int32)
    mask_right[0, 11:] = 0
    dmod.forward(params, ids, jnp.asarray(mask_right), config=config,
                 attn_impl="pallas", right_padded=True)
    assert captured and all(c is True for c in captured)

    captured.clear()
    dmod.forward(params, ids, config=config, attn_impl="pallas")  # no mask
    assert captured and all(c is True for c in captured)


def test_pallas_left_padding_parity(tiny_llama_dir, rng):
    """Left-padded batches through the Pallas path (safe default) must match
    the XLA reference on valid rows."""
    path, _ = tiny_llama_dir
    params, config = load_decoder_checkpoint(path, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 16)))
    mask = np.ones((2, 16), np.int32)
    mask[0, :5] = 0  # left padding
    out_xla = dec.forward(params, ids, jnp.asarray(mask), config=config,
                          attn_impl="xla")["last_hidden_state"]
    out_pl = dec.forward(params, ids, jnp.asarray(mask), config=config,
                         attn_impl="pallas")["last_hidden_state"]
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(out_pl)[valid], np.asarray(out_xla)[valid],
                               atol=1e-4, rtol=1e-3)
