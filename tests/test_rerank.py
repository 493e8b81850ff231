"""Reranker tests: models, collators, SPMD predict, offline rerank, training."""
import numpy as np
import pytest

import jax

from lightretriever_tpu.arguments import ModelArguments, TrainingArguments
from lightretriever_tpu.models.config import DecoderConfig
from lightretriever_tpu.rerank.data_utils import (
    PairCollator,
    RerankTrainCollator,
    format_pair,
    read_trec_run,
    write_trec_run,
)
from lightretriever_tpu.rerank.inference import RerankerEncoder, offline_rerank
from lightretriever_tpu.rerank.modeling import CrossEncoder, CrossEncoderLogits
from lightretriever_tpu.rerank.trainer import RerankTrainer

from tokenizer_fixture import make_tiny_tokenizer

TINY = DecoderConfig(
    vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
    rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=True,
)


@pytest.fixture(scope="module")
def tok():
    return make_tiny_tokenizer()


def _margs():
    return ModelArguments(pooling_strategy="lasttoken", attn_implementation="xla")


def test_format_pair():
    q, p = format_pair("what is a fox", {"title": "animals", "text": "a fox"},
                       query_prompt="Q: ")
    assert q == "Q: what is a fox"
    assert p == "\nPassage: animals a fox"


def test_pair_collator(tok):
    col = PairCollator(tokenizer=tok, max_len=32)
    batch = col([("the fox", {"text": "quick brown fox"}), ("dog", "lazy dog")])
    assert batch["input_ids"].shape == batch["attention_mask"].shape
    assert batch["input_ids"].shape[0] == 2


def test_cross_encoder_forward_and_loss(tok):
    model = CrossEncoder(_margs(), TrainingArguments(temperature=1.0), TINY,
                         train_n_passages=3)
    params = model.init_params(jax.random.key(0))
    col = RerankTrainCollator(tokenizer=tok, max_len=32, train_n_passages=3)
    groups = [{
        "query": "question about fox",
        "positive_passages": [{"text": "document about fox"}],
        "negative_passages": [{"text": "document about cake"},
                              {"text": "document about qubits"},
                              {"text": "document about safari"}],
    } for _ in range(2)]
    batch = col(groups)
    assert batch["input_ids"].shape[0] == 6  # 2 queries x 3 passages
    out = model.forward(params, batch, training=True)
    assert np.isfinite(float(out.loss))
    g = jax.grad(lambda p: model.forward(p, batch).loss)(params)
    gn = jax.tree_util.tree_reduce(lambda a, x: a + float(np.abs(x).sum()), g, 0.0)
    assert gn > 0


def test_cross_encoder_logits_variant(tok):
    model = CrossEncoderLogits.with_tokenizer(
        _margs(), TrainingArguments(), TINY, tok, train_n_passages=2)
    params = model.init_params(jax.random.key(0))
    assert "score" not in params
    col = PairCollator(tokenizer=tok, max_len=32)
    batch = col([("fox", "quick fox"), ("dog", "lazy dog")])
    scores = model.score(params, batch)
    assert scores.shape == (2,)


def test_reranker_encoder_predict(tok, mesh8):
    model = CrossEncoder(_margs(), TrainingArguments(), TINY)
    params = model.init_params(jax.random.key(0))
    enc = RerankerEncoder(model, params, tok, mesh=mesh8, batch_size=8, max_len=32)
    pairs = [(f"query {i}", {"text": "document about fox"}) for i in range(11)]
    scores = enc.predict(pairs)
    assert scores.shape == (11,) and np.isfinite(scores).all()


def test_trec_run_roundtrip(tmp_path):
    path = str(tmp_path / "run.tsv")
    write_trec_run(path, {"q1": {"d1": 2.0, "d2": 1.0}, "q2": {"d3": 0.5}})
    runs = read_trec_run(path, top_k=1)
    assert runs["q1"] == [("d1", 2.0)]
    assert runs["q2"] == [("d3", 0.5)]


def test_offline_rerank(tok, tmp_path):
    model = CrossEncoder(_margs(), TrainingArguments(), TINY)
    params = model.init_params(jax.random.key(0))
    enc = RerankerEncoder(model, params, tok, batch_size=8, max_len=32)
    run_in = str(tmp_path / "in.tsv")
    write_trec_run(run_in, {"q1": {"d1": 1.0, "d2": 0.9, "d3": 0.8}})
    queries = {"q1": "question about fox"}
    corpus = {"d1": {"text": "fox document"}, "d2": {"text": "cake document"},
              "d3": {"text": "qubit document"}}
    out_path = str(tmp_path / "out.tsv")
    results = offline_rerank(enc, run_in, queries, corpus, out_path, top_k=3)
    assert set(results["q1"]) == {"d1", "d2", "d3"}
    reread = read_trec_run(out_path)
    assert len(reread["q1"]) == 3


def test_rerank_trainer_step(tok):
    ta = TrainingArguments(learning_rate=1e-3, max_steps=2, logging_steps=1,
                           save_steps=0)
    model = CrossEncoder(_margs(), ta, TINY, train_n_passages=2)
    params = model.init_params(jax.random.key(0))
    trainer = RerankTrainer(model, params, ta, mesh=None)
    col = RerankTrainCollator(tokenizer=tok, max_len=32, train_n_passages=2)
    groups = [{
        "query": f"question {i}",
        "positive_passages": [{"text": "document about fox"}],
        "negative_passages": [{"text": "document about cake"}],
    } for i in range(8)]
    logs = trainer.training_step({"pairs": col(groups)})
    assert np.isfinite(logs["loss"])


def test_rerank_collator_ce_scores_and_distill(tok):
    """Teacher ce_scores ride the collated batch and add a listwise KL to
    the CE loss (VERDICT r2 next #3: BM25-score distillation)."""
    col = RerankTrainCollator(tokenizer=tok, max_len=32, train_n_passages=2,
                              seed=0)
    groups = [{
        "query": "question about fox",
        "positive_passages": [{"text": "document about fox", "ce_score": 9.0}],
        "negative_passages": [{"text": "document about cake", "ce_score": 1.5}],
    } for _ in range(2)]
    batch = col(groups)
    assert batch["ce_scores"].shape == (2, 2)
    np.testing.assert_allclose(batch["ce_scores"][0], [9.0, 1.5])

    # No scores -> no ce_scores key
    plain = [{k: ([{"text": p["text"]} for p in v] if k.endswith("passages")
                  else v) for k, v in g.items()} for g in groups]
    assert "ce_scores" not in col(plain)

    ta = TrainingArguments(temperature=1.0, distillation=True,
                           distill_coef=1.0, distill_temperature=2.0)
    model = CrossEncoder(_margs(), ta, TINY, train_n_passages=2)
    params = model.init_params(jax.random.key(0))
    out = model.forward(params, batch, training=True)
    assert "distill_klloss" in out.logs
    assert float(out.logs["loss"]) > float(out.logs["ce_loss"]) - 1e-6

    # Without distillation flag the loss is pure CE
    model2 = CrossEncoder(_margs(), TrainingArguments(temperature=1.0), TINY,
                          train_n_passages=2)
    out2 = model2.forward(params, batch, training=True)
    assert "distill_klloss" not in out2.logs


def test_score_head_npy_roundtrip(tmp_path):
    """score_head.npy must load back as a numeric dtype even when params are
    bf16 (numpy round-trips raw bf16 as void "|V2", which jnp.asarray
    rejects — the eval-only reload path in rerank_study depends on this)."""
    import jax.numpy as jnp

    model = CrossEncoder(_margs(), TrainingArguments(), TINY,
                         train_n_passages=2)
    params = model.init_params(jax.random.key(0), dtype=jnp.bfloat16)
    model.save(params, str(tmp_path))
    head = np.load(tmp_path / "score_head.npy")
    assert head.dtype == np.float32
    ref = np.asarray(jax.device_get(params["score"]["kernel"])
                     ).astype(np.float32)
    np.testing.assert_allclose(head, ref)
    jnp.asarray(head)  # must not raise

    # legacy raw-bf16 saves: the documented view-cast recovers the values
    import ml_dtypes

    np.save(tmp_path / "legacy.npy",
            np.asarray(jax.device_get(params["score"]["kernel"])))
    raw = np.load(tmp_path / "legacy.npy")
    if raw.dtype.kind == "V":
        fixed = raw.view(ml_dtypes.bfloat16).astype(np.float32)
        np.testing.assert_allclose(fixed, ref)
