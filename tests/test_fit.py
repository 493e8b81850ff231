"""End-to-end training entry test: jsonl domains -> fit.main -> checkpoints."""
import json
import os

import numpy as np
import pytest

from lightretriever_tpu.arguments import DataArguments, ModelArguments, TrainingArguments
from lightretriever_tpu.models.config import DecoderConfig
from lightretriever_tpu.training.fit import main

from tokenizer_fixture import make_tiny_tokenizer

TINY = DecoderConfig(
    vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
    rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=True,
)

TOPICS = ["fox dog", "chocolate cake", "tpu chips", "zebra safari",
          "quantum qubits", "recipe cocoa", "bandwidth links", "cat mat"]


@pytest.fixture()
def data_dir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    for domain in ("msmarco", "nli"):
        with open(d / f"{domain}.jsonl", "w") as f:
            for i, t in enumerate(TOPICS):
                f.write(json.dumps({
                    "query": f"question about {t}",
                    "positive_passages": [{"text": f"document about {t}"}],
                    "negative_passages": [
                        {"text": f"document about {TOPICS[(i + 1) % 8]}"},
                        {"text": f"document about {TOPICS[(i + 3) % 8]}"},
                    ],
                }) + "\n")
    cfg = {"domain_ids": {"msmarco": 0, "nli": 1},
           "domain_weights": {"msmarco": 0.7, "nli": 0.3},
           "size": {"msmarco": 8, "nli": 8}}
    cfg_path = tmp_path / "domains.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return str(d), str(cfg_path)


def test_fit_main_end_to_end(data_dir, tmp_path):
    train_dir, cfg_path = data_dir
    out_dir = str(tmp_path / "out")
    tok = make_tiny_tokenizer()
    ma = ModelArguments(pooling_strategy="lasttoken", attn_implementation="xla",
                        hybrid_use_dense_vector=True, hybrid_use_sparse_vector=True,
                        sparse_use_relu=True, sparse_use_log_saturation=True)
    da = DataArguments(domain_config_path=cfg_path, q_max_len=32, p_max_len=32,
                       train_n_passages=2, homogenous_batch=True,
                       pad_to_max_length=False)
    ta = TrainingArguments(output_dir=out_dir, max_steps=3, logging_steps=1,
                           save_steps=2, learning_rate=1e-3, bf16=False,
                           per_device_train_batch_size=1, temperature=0.05)
    logs = main(ma, da, ta, tokenizer=tok, config=TINY, train_data_dir=train_dir,
                resume=False)
    assert np.isfinite(logs["loss"])
    assert os.path.isdir(os.path.join(out_dir, "checkpoint-2"))
    assert os.path.isdir(os.path.join(out_dir, "final"))
    # HF-layout export with model_args.yaml (reference save contract)
    assert os.path.exists(os.path.join(out_dir, "model_args.yaml"))
    assert any(f.endswith(".safetensors") for f in os.listdir(out_dir))


def test_build_model_resizes_vocab_for_grown_tokenizer(tmp_path):
    """Checkpoint vocab < len(tokenizer) after surgery -> embeddings grow
    (parity: resize_emb, utils/data_utils.py:273-281), MXU-lane padded."""
    import jax
    import jax.numpy as jnp

    from lightretriever_tpu.arguments import ModelArguments, TrainingArguments
    from lightretriever_tpu.models import decoder as dec
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.hf_loader import save_decoder_params
    from lightretriever_tpu.training.fit import build_model

    tok = make_tiny_tokenizer()
    small_v = len(tok) - 8  # checkpoint predates the added tokens
    cfg = DecoderConfig(
        vocab_size=small_v, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=64, tie_word_embeddings=False)
    ckpt = str(tmp_path / "ckpt")
    params0 = dec.init_params(cfg, jax.random.key(0), jnp.float32)
    save_decoder_params(params0, cfg, ckpt)

    ma = ModelArguments(model_name_or_path=ckpt, attn_implementation="xla")
    ta = TrainingArguments(output_dir=str(tmp_path / "out"))
    model, params = build_model(ma, ta, tokenizer=tok, model_cls="hybrid",
                                dtype=jnp.float32)
    new_v = model.config_qry.vocab_size
    assert new_v >= len(tok) and new_v % 128 == 0
    assert params["qry"]["embed_tokens"].shape[0] == new_v
    assert params["qry"]["lm_head"].shape[1] == new_v
    # old rows preserved, forward runs with an added-token id
    np.testing.assert_allclose(
        np.asarray(params["qry"]["embed_tokens"][:small_v]),
        np.asarray(params0["embed_tokens"]), rtol=1e-6)
    ids = jnp.asarray([[1, len(tok) - 1, 2]], jnp.int32)
    out = dec.forward(params["qry"], ids, config=model.config_qry,
                      causal=True, attn_impl="xla")
    assert bool(jnp.all(jnp.isfinite(out["last_hidden_state"])))
