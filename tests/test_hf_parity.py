"""Numerical parity vs HF transformers (torch CPU): the strongest correctness
oracle for the model core — tiny random Llama/Qwen2/BERT checkpoints are
saved by transformers and loaded through our safetensors interchange, then
hidden states are compared elementwise."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _save_tiny_llama(tmp_path, qwen=False):
    if qwen:
        from transformers import Qwen2Config, Qwen2ForCausalLM

        cfg = Qwen2Config(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rope_theta=10000.0,
            tie_word_embeddings=True, attention_bias=True)
        model = Qwen2ForCausalLM(cfg)
    else:
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rope_theta=10000.0,
            tie_word_embeddings=True)
        model = LlamaForCausalLM(cfg)
    model.eval()
    path = str(tmp_path / ("qwen" if qwen else "llama"))
    model.save_pretrained(path, safe_serialization=True)
    return model, path


@pytest.mark.parametrize("qwen", [False, True])
def test_decoder_matches_transformers(tmp_path, qwen):
    from lightretriever_tpu.models import decoder as dec
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.hf_loader import load_decoder_params

    hf_model, path = _save_tiny_llama(tmp_path, qwen=qwen)
    cfg = DecoderConfig.from_pretrained(path)
    params = load_decoder_params(path, cfg, dtype=jnp.float32)

    ids = np.random.default_rng(0).integers(3, 128, (2, 10))
    mask = np.ones((2, 10), np.int64)
    with torch.no_grad():
        hf_out = hf_model.model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            output_hidden_states=True,
        )
    ours = dec.forward(
        params, jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(mask, jnp.int32),
        config=cfg, causal=True, attn_impl="xla", output_hidden_states=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]),
        hf_out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4,
    )
    # Embedding layer (hidden_states[0]) matches too
    np.testing.assert_allclose(
        np.asarray(ours["hidden_states"][0]),
        hf_out.hidden_states[0].numpy(), rtol=1e-5, atol=1e-5,
    )
    # LM head (tied) logits
    with torch.no_grad():
        hf_logits = hf_model(input_ids=torch.tensor(ids)).logits
    our_logits = dec.logits(params, ours["last_hidden_state"], cfg)
    np.testing.assert_allclose(
        np.asarray(our_logits), hf_logits.numpy(), rtol=2e-3, atol=2e-3,
    )


def test_llama3_rope_scaling_matches_transformers(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    from lightretriever_tpu.models import decoder as dec
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.hf_loader import load_decoder_params

    cfg_hf = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=500000.0,
        tie_word_embeddings=True,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
    )
    model = LlamaForCausalLM(cfg_hf).eval()
    path = str(tmp_path / "llama3")
    model.save_pretrained(path, safe_serialization=True)

    cfg = DecoderConfig.from_pretrained(path)
    params = load_decoder_params(path, cfg, dtype=jnp.float32)
    ids = np.random.default_rng(1).integers(3, 128, (2, 80))  # beyond orig_max/positions
    with torch.no_grad():
        hf_out = model.model(input_ids=torch.tensor(ids)).last_hidden_state
    ours = dec.forward(params, jnp.asarray(ids, jnp.int32), config=cfg,
                       causal=True, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]), hf_out.numpy(), rtol=3e-4, atol=3e-4,
    )


def test_bert_matches_transformers(tmp_path):
    from transformers import BertConfig as HFBertConfig, BertModel

    from lightretriever_tpu.models import bert as bert_mod
    from lightretriever_tpu.models.bert import BertConfig, load_bert_params

    cfg_hf = HFBertConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, type_vocab_size=2)
    model = BertModel(cfg_hf).eval()
    path = str(tmp_path / "bert")
    model.save_pretrained(path, safe_serialization=True)

    cfg = BertConfig.from_pretrained(path)
    params = load_bert_params(path, cfg, dtype=jnp.float32)
    ids = np.random.default_rng(2).integers(3, 128, (2, 12))
    mask = np.ones((2, 12), np.int64)
    with torch.no_grad():
        hf_out = model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask)).last_hidden_state
    ours = bert_mod.forward(
        params, jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(mask, jnp.int32), config=cfg, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]), hf_out.numpy(), rtol=3e-4, atol=3e-4,
    )


def test_save_roundtrip_through_transformers(tmp_path):
    """Our save_decoder_params output loads back in transformers."""
    from transformers import LlamaForCausalLM

    from lightretriever_tpu.models import decoder as dec
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.hf_loader import load_decoder_params, save_decoder_params

    _, path = _save_tiny_llama(tmp_path)
    cfg = DecoderConfig.from_pretrained(path)
    params = load_decoder_params(path, cfg, dtype=jnp.float32)
    out_dir = str(tmp_path / "exported")
    save_decoder_params(params, cfg, out_dir)
    reloaded = LlamaForCausalLM.from_pretrained(out_dir).eval()
    ids = np.random.default_rng(3).integers(3, 128, (1, 8))
    with torch.no_grad():
        a = reloaded.model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    ours = dec.forward(params, jnp.asarray(ids, jnp.int32), config=cfg,
                       causal=True, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours["last_hidden_state"]), a,
                               rtol=2e-4, atol=2e-4)


def test_encoder_model_save_load_roundtrip(tmp_path):
    """EncoderModel.save -> EncoderModel.load reproduces identical reps
    (would have caught the tuple-returning loader bug)."""
    from lightretriever_tpu.arguments import ModelArguments, TrainingArguments
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.encoder import EncoderModel

    cfg = DecoderConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=True)
    ma = ModelArguments(pooling_strategy="lasttoken", attn_implementation="xla")
    model = EncoderModel(ma, TrainingArguments(), cfg)
    params = model.init_params(jax.random.key(0))
    out_dir = str(tmp_path / "enc")
    model.save(params, out_dir)

    ma2 = ModelArguments(pooling_strategy="lasttoken", attn_implementation="xla")
    model2, params2 = EncoderModel.load(out_dir, ma2, dtype=jnp.float32)
    batch = {"input_ids": jnp.asarray(np.arange(8)[None] + 3),
             "attention_mask": jnp.ones((1, 8), jnp.int32)}
    a = model.encode_query(params, batch)
    b = model2.encode_query(params2, batch)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_peft_adapter_interchange(tmp_path):
    """peft-trained LoRA adapters load into our tree; adapted forwards match
    peft's own adapted model; our exported adapter loads back through peft."""
    peft = pytest.importorskip("peft")
    from lightretriever_tpu.models import decoder as dec
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.hf_loader import load_decoder_params
    from lightretriever_tpu.models.lora import (
        load_peft_adapter,
        lora_scale,
        save_peft_adapter,
    )

    hf_model, path = _save_tiny_llama(tmp_path)
    lcfg = peft.LoraConfig(r=4, lora_alpha=8, lora_dropout=0.0,
                           target_modules=["q_proj", "v_proj", "up_proj"],
                           init_lora_weights=False,  # random (nonzero) B
                           task_type=peft.TaskType.FEATURE_EXTRACTION)
    pmodel = peft.get_peft_model(hf_model, lcfg).eval()
    adapter_dir = str(tmp_path / "adapter")
    pmodel.save_pretrained(adapter_dir)

    cfg = DecoderConfig.from_pretrained(path)
    params = load_decoder_params(path, cfg, dtype=jnp.float32)
    lora, r, alpha = load_peft_adapter(adapter_dir, cfg)
    assert r == 4 and alpha == 8
    assert set(lora["layers"]) == {"q_proj", "v_proj", "up_proj"}

    ids = np.random.default_rng(0).integers(3, 128, (2, 10))
    with torch.no_grad():
        want = pmodel.base_model.model.model(
            input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    ours = dec.forward(params, jnp.asarray(ids, jnp.int32), config=cfg,
                       causal=True, attn_impl="xla",
                       lora=lora, lora_scale=lora_scale(r, alpha))
    np.testing.assert_allclose(np.asarray(ours["last_hidden_state"]), want,
                               rtol=3e-4, atol=3e-4)

    # Roundtrip: export ours, reload via our loader, identical trees
    export_dir = str(tmp_path / "exported_adapter")
    save_peft_adapter(lora, cfg, export_dir, r=r, alpha=alpha)
    lora2, r2, alpha2 = load_peft_adapter(export_dir, cfg)
    assert (r2, alpha2) == (r, alpha)
    for name in lora["layers"]:
        np.testing.assert_allclose(np.asarray(lora["layers"][name]["a"]),
                                   np.asarray(lora2["layers"][name]["a"]))


def test_resolve_model_dir(tmp_path):
    """resolve_model_dir accepts the HF dir itself or a parent nesting model/."""
    from lightretriever_tpu.models.hf_loader import resolve_model_dir

    nested = tmp_path / "model"
    nested.mkdir()
    (nested / "config.json").write_text("{}")
    assert resolve_model_dir(str(tmp_path)) == str(nested)
    assert resolve_model_dir(str(nested)) == str(nested)
    with pytest.raises(FileNotFoundError):
        resolve_model_dir(str(tmp_path / "missing"))


def test_unsupported_backbone_clear_error(tmp_path):
    """Unknown model_type fails loudly, naming the supported families
    (VERDICT r3 next #9; reference takes any AutoModel,
    modeling_encoder.py:677-744 — this port names its verified set)."""
    import json

    from lightretriever_tpu.models.config import DecoderConfig

    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "gpt2", "vocab_size": 128, "hidden_size": 32,
        "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4}))
    with pytest.raises(ValueError, match="gpt2.*llama, qwen2, qwen3"):
        DecoderConfig.from_pretrained(str(tmp_path))
    # absent model_type keeps the llama default (generic HF checkpoints)
    (tmp_path / "config.json").write_text(json.dumps({
        "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4}))
    assert DecoderConfig.from_pretrained(str(tmp_path)).model_type == "llama"


@pytest.mark.parametrize("family", ["gemma", "mistral", "qwen3"])
def test_gemma_mistral_match_transformers(tmp_path, family):
    """Gemma (sqrt(H) embedding scale, (1+w) RMSNorm, gelu_tanh, decoupled
    head_dim), Mistral (Llama-shaped; window >> our seq lengths) and Qwen3
    (per-head q/k RMSNorm before RoPE, decoupled head_dim, no QKV bias)
    parity vs transformers (reference backbone families:
    arguments.py:283-310; Qwen3 = the Qwen3-Embedding backbone family)."""
    from lightretriever_tpu.models import decoder as dec
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.hf_loader import load_decoder_params

    if family == "gemma":
        from transformers import GemmaConfig, GemmaForCausalLM

        cfg_hf = GemmaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
            hidden_act="gelu_pytorch_tanh", hidden_activation="gelu_pytorch_tanh")
        model = GemmaForCausalLM(cfg_hf)
    elif family == "qwen3":
        from transformers import Qwen3Config, Qwen3ForCausalLM

        cfg_hf = Qwen3Config(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
            tie_word_embeddings=True)
        model = Qwen3ForCausalLM(cfg_hf)
    else:
        from transformers import MistralConfig, MistralForCausalLM

        cfg_hf = MistralConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rope_theta=10000.0,
            sliding_window=4096, tie_word_embeddings=True)
        model = MistralForCausalLM(cfg_hf)
    model.eval()
    path = str(tmp_path / family)
    model.save_pretrained(path, safe_serialization=True)

    cfg = DecoderConfig.from_pretrained(path)
    assert cfg.model_type == family
    params = load_decoder_params(path, cfg, dtype=jnp.float32)

    ids = np.random.default_rng(2).integers(3, 128, (2, 12))
    mask = np.ones((2, 12), np.int64)
    with torch.no_grad():
        hf_out = model.model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    ours = dec.forward(
        params, jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(mask, jnp.int32),
        config=cfg, causal=True, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]),
        hf_out.last_hidden_state.numpy(), rtol=3e-4, atol=3e-4)

    # Save -> reload round trip preserves family semantics (hidden_act,
    # qk-norm tensors, architectures) — guards the HF-layout export path.
    from lightretriever_tpu.models.hf_loader import save_decoder_params

    export = str(tmp_path / f"{family}_export")
    save_decoder_params(params, cfg, export)
    cfg2 = DecoderConfig.from_pretrained(export)
    assert cfg2.hidden_act == cfg.hidden_act
    assert cfg2.use_qk_norm == cfg.use_qk_norm
    params2 = load_decoder_params(export, cfg2, dtype=jnp.float32)
    ours2 = dec.forward(
        params2, jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(mask, jnp.int32),
        config=cfg2, causal=True, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(ours2["last_hidden_state"]),
        np.asarray(ours["last_hidden_state"]), rtol=1e-5, atol=1e-5)
