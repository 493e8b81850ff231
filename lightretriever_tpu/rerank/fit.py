"""Reranker training entry (parity: rerank/fit.py + rerank/arguments.py).

Usage: python -m lightretriever_tpu.rerank.fit config.json
"""
from __future__ import annotations

import logging
import os
import sys
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..arguments import (
    DataArguments,
    DomainConfig,
    ModelArguments,
    TrainingArguments,
    parse_args_from_json,
)
from ..models.config import DecoderConfig
from ..training.data import interleave_domains, load_domain_datasets, train_dataloader
from ..training.trainer import find_last_checkpoint
from .modeling import CrossEncoder, CrossEncoderLogits
from .data_utils import RerankTrainCollator
from .trainer import RerankTrainer

logger = logging.getLogger(__name__)


@dataclass
class RerankerArguments(ModelArguments):
    """Reranker-specific knobs (parity: rerank/arguments.py:1-90)."""

    reranker_max_len: int = 1024
    reranker_type: str = "cross_encoder"   # cross_encoder | cross_encoder_logits
    sigmoid_normalize: bool = False


def build_reranker(
    model_args: RerankerArguments,
    train_args: TrainingArguments,
    tokenizer=None,
    config: Optional[DecoderConfig] = None,
    train_n_passages: int = 8,
    dtype=jnp.bfloat16,
):
    path = model_args.model_name_or_path
    kwargs = dict(train_n_passages=train_n_passages,
                  sigmoid_normalize=model_args.sigmoid_normalize)
    if tokenizer is not None:
        kwargs["eos_token_id"] = tokenizer.eos_token_id
    if path and os.path.isdir(path):
        from ..models.hf_loader import load_decoder_params

        cfg = config or DecoderConfig.from_pretrained(path)
    else:
        assert config is not None
        cfg = config
    if model_args.reranker_type == "cross_encoder_logits":
        assert tokenizer is not None, "logits reranker needs the tokenizer ('yes' id)"
        model = CrossEncoderLogits.with_tokenizer(
            model_args, train_args, cfg, tokenizer, **kwargs)
    else:
        model = CrossEncoder(model_args, train_args, cfg, **kwargs)
    params = model.init_params(jax.random.key(train_args.seed), dtype)
    if path and os.path.isdir(path):
        from ..models.hf_loader import load_decoder_params

        params["lm"] = load_decoder_params(path, cfg, dtype)
    return model, params


def main(
    model_args: RerankerArguments,
    data_args: DataArguments,
    train_args: TrainingArguments,
    tokenizer=None,
    config: Optional[DecoderConfig] = None,
    train_data_dir: Optional[str] = None,
    resume: bool = True,
):
    logging.basicConfig(level=logging.INFO)
    model, params = build_reranker(
        model_args, train_args, tokenizer, config,
        train_n_passages=data_args.train_n_passages,
        dtype=jnp.bfloat16 if train_args.bf16 else jnp.float32,
    )
    domain_config = DomainConfig.from_json(data_args.domain_config_path)
    domains = load_domain_datasets(domain_config, train_data_dir)
    batch_size = train_args.per_device_train_batch_size * max(jax.device_count(), 1)
    example_iter = interleave_domains(
        domains, weights=domain_config.normalized_weights(), seed=train_args.seed,
        homogenous_batch_size=batch_size if data_args.homogenous_batch else None,
    )
    collator = RerankTrainCollator(
        tokenizer=tokenizer, max_len=data_args.p_max_len,
        train_n_passages=data_args.train_n_passages, seed=train_args.seed,
    )
    batches = ({"pairs": b} for b in train_dataloader(example_iter, collator, batch_size))
    trainer = RerankTrainer(model, params, train_args, train_iter=batches)
    last = find_last_checkpoint(train_args.output_dir) if resume else None
    logs = trainer.train(resume_from=last)
    model.save(jax.device_get(trainer.state.params), train_args.output_dir)
    return logs


if __name__ == "__main__":
    ma, da, ta = parse_args_from_json(
        sys.argv[1], RerankerArguments, DataArguments, TrainingArguments)
    from ..utils.tokenizer_utils import load_tokenizer

    tok = load_tokenizer(ma.tokenizer_name or ma.model_name_or_path,
                         pad_token=ma.pad_token or "<|pad|>")
    import json as _json

    with open(sys.argv[1]) as _f:
        _raw = _json.load(_f)
    main(ma, da, ta, tokenizer=tok,
         train_data_dir=_raw.get("train_data_dir") or os.environ.get("TRAIN_DATA_DIR"))
