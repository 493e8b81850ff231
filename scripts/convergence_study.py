"""End-to-end convergence study: train the hybrid retriever on a synthetic
task and verify retrieval quality improves across rep systems.

Round-1 result (150 steps, tiny model): emb stalled at 0.465 while everything
else reached ~1.0. Root cause (fixed in round 2): the blocked train-time
tokenization omitted the bos token that EmbeddingBag construction prepended
([bos][prompt][tok][eos]) — training optimized a different query encoder
than eval used. With the bos contract aligned on both sides
(tokenize_nonctx_query / construct_embedding_bag, reference
nonctx_emb_utils.py:110-114/:258-262), round-2 result:
  den 1.0 -> 1.0, spr 0.985 -> 1.0, tok 0.831 -> 1.0,
  emb 0.193 -> 1.0, emb_tok 0.512 -> 1.0 — every system converges.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/convergence_study.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from lightretriever_tpu.arguments import InferenceArguments, ModelArguments, TrainingArguments
from lightretriever_tpu.evaluation.harness import evaluate_task
from lightretriever_tpu.inference.encode import SpmdEncoder
from lightretriever_tpu.models.config import DecoderConfig
from lightretriever_tpu.models.hybrid import HybridModel
from lightretriever_tpu.retriever.search import HybridSearch
from lightretriever_tpu.training.data import (
    IterableTrainCollator,
    interleave_domains,
    train_dataloader,
)
from lightretriever_tpu.training.trainer import ContrastiveTrainer
from tokenizer_fixture import WORDS, make_tiny_tokenizer


def main(max_steps: int = 150):
    tok = make_tiny_tokenizer()
    cfg = DecoderConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        rms_norm_eps=1e-6, rope_theta=1e4, tie_word_embeddings=True)
    ma = ModelArguments(
        pooling_strategy="lasttoken", attn_implementation="xla",
        hybrid_use_dense_vector=True, hybrid_use_sparse_vector=True,
        hybrid_use_emb_vector=True, hybrid_use_token_id_vector=True,
        noncontextual_query_embedding=True,
        sparse_use_relu=True, sparse_use_log_saturation=True)
    ta = TrainingArguments(
        learning_rate=2e-3, max_steps=max_steps, logging_steps=50, save_steps=0,
        temperature=0.05, emb_den_scores_distillation=True)
    model = HybridModel(ma, ta, cfg, eos_token_id=tok.eos_token_id)
    params0 = model.init_params(jax.random.key(0))

    content = [w for w in WORDS if len(w) > 2][:24]
    topics = [(content[i], content[(i + 7) % 24]) for i in range(24)]
    doc_text = lambda t: f"document about {t[0]} {t[1]}"
    q_text = lambda t: f"question {t[0]} {t[1]}"
    groups = [{
        "query": q_text(t),
        "positive_passages": [{"text": doc_text(t)}],
        "negative_passages": [
            {"text": doc_text(topics[(i + j + 1) % 24])} for j in range(3)],
        "domain_name": "synthetic", "domain_ids": 0,
    } for i, t in enumerate(topics)]
    corpus = {f"d{i}": {"text": doc_text(t)} for i, t in enumerate(topics)}
    queries = {f"q{i}": q_text(t) for i, t in enumerate(topics)}
    qrels = {f"q{i}": {f"d{i}": 1} for i in range(24)}

    def eval_model(params):
        enc = SpmdEncoder(model, params, tok, args=InferenceArguments(
            encode_batch_size=8, emb_bag_construct_batch_size=32,
            pooling_strategy="lasttoken", attn_implementation="xla"))
        enc.cache_emb_bag()
        hs = HybridSearch(enc, vocab_size=64, return_all_results=True)
        out = evaluate_task(hs, corpus, queries, qrels, top_k=5, k_values=(1, 5))
        return {k: round(v["NDCG@5"], 3) for k, v in out["metrics"].items()}

    before = eval_model(params0)
    col = IterableTrainCollator(
        tokenizer=tok, q_max_len=16, p_max_len=16, train_n_passages=2,
        emb_size=64, noncontextual_query_embedding=True)
    it = train_dataloader(
        interleave_domains({"synthetic": groups}, seed=0), col, 8)
    trainer = ContrastiveTrainer(model, params0, ta, train_iter=it)
    logs = trainer.train()
    after = eval_model(jax.device_get(trainer.state.params))

    print("final loss:", round(logs["loss"], 4))
    print("NDCG@5 before:", before)
    print("NDCG@5 after: ", after)
    for system in before:
        headroom = before[system] < 0.95
        if headroom:
            assert after[system] >= before[system], \
                f"{system} regressed: {before[system]} -> {after[system]}"
    assert after["emb"] > before["emb"] + 0.1, "asym-dense must improve"
    print("CONVERGENCE STUDY OK")


if __name__ == "__main__":
    main()
