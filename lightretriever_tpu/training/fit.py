"""Training entry point (parity: finetune/fit.py:39-254 main()).

Flow: parse args -> build tokenizer (+surgery) -> build model + params (HF
checkpoint or random init) -> domain datasets -> interleaved collated loader
-> ContrastiveTrainer -> train -> save. The accelerate/torchrun launch matrix
disappears: one process drives the whole mesh.

Usage:
  python -m lightretriever_tpu.training.fit config.json
  (flat JSON with any ModelArguments/DataArguments/TrainingArguments fields
   plus optional "domain_config_path"/"train_data_dir")
"""
from __future__ import annotations

import logging
import os
import sys
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
from ..models.encoder import EncoderModel
from ..models.hybrid import HybridModel
from ..utils.prompts import get_prompt
from .data import IterableTrainCollator, interleave_domains, load_domain_datasets, train_dataloader
from .trainer import ContrastiveTrainer, find_last_checkpoint

logger = logging.getLogger(__name__)

_MODEL_CLS = {"encoder": EncoderModel, "hybrid": HybridModel}


def build_model(
    model_args: ModelArguments,
    train_args: TrainingArguments,
    tokenizer=None,
    model_cls: str = "hybrid",
    dtype=jnp.bfloat16,
    config: Optional[DecoderConfig] = None,
):
    """Model + params from an HF checkpoint dir (safetensors) or random init."""
    cls = _MODEL_CLS[model_cls]
    tok_ids = {}
    if tokenizer is not None:
        tok_ids = dict(
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id or 0,
            sep_token_id=getattr(tokenizer, "sep_token_id", None),
        )
    path = model_args.model_name_or_path
    if path and os.path.isdir(path):
        from ..models.hf_loader import load_decoder_params

        cfg = config or DecoderConfig.from_pretrained(path)
        params = {"qry": load_decoder_params(path, cfg, dtype)}
        if model_args.untie_encoder:
            params["psg"] = load_decoder_params(path, cfg, dtype)
        if tokenizer is not None and len(tokenizer) > cfg.vocab_size:
            # Tokenizer surgery grew the vocab (added pad/sep/pooling tokens
            # beyond reserved slots) — grow embeddings like the reference's
            # resize_emb (utils/data_utils.py:273-281), MXU-lane padded.
            from ..utils.tokenizer_utils import resize_vocab_for_tokenizer

            new_cfg = cfg
            for tower in list(params):
                params[tower], new_cfg = resize_vocab_for_tokenizer(
                    params[tower], cfg, tokenizer)
                params[tower] = jax.tree.map(
                    lambda x: jnp.asarray(x, dtype), params[tower])
            cfg = new_cfg
        model = cls(model_args, train_args, cfg, **tok_ids)
        # LoRA / projectors still need fresh init
        full = model.init_params(jax.random.key(train_args.seed), dtype)
        for k, v in full.items():
            params.setdefault(k, v)
        return model, params
    assert config is not None, "pass config= for random init (no checkpoint dir)"
    model = cls(model_args, train_args, config, **tok_ids)
    return model, model.init_params(jax.random.key(train_args.seed), dtype)


def main(
    model_args: ModelArguments,
    data_args: DataArguments,
    train_args: TrainingArguments,
    tokenizer=None,
    config: Optional[DecoderConfig] = None,
    train_data_dir: Optional[str] = None,
    model_cls: str = "hybrid",
    resume: bool = True,
):
    logging.basicConfig(level=logging.INFO)
    model, params = build_model(
        model_args, train_args, tokenizer, model_cls,
        dtype=jnp.bfloat16 if train_args.bf16 else jnp.float32, config=config,
    )

    domain_config = DomainConfig.from_json(data_args.domain_config_path) \
        if data_args.domain_config_path else None
    assert domain_config is not None and train_data_dir, \
        "training needs domain_config_path + train_data_dir"
    batch_size = train_args.per_device_train_batch_size * max(jax.device_count(), 1)
    hom = batch_size if data_args.homogenous_batch else None
    if data_args.streaming:
        # O(shuffle_buffer) memory per domain: web-scale mixtures
        # (reference: HF iterable datasets, utils/data_utils.py:500-597)
        from .streaming import interleave_streams, load_domain_streams

        streams = load_domain_streams(
            domain_config, train_data_dir,
            seed=train_args.seed,
            buffer_size=data_args.shuffle_buffer_size,
            shard_index=jax.process_index(), shard_count=jax.process_count(),
            instructions={name: get_prompt(data_args.prompt_type, name)
                          for name in domain_config.domain_ids},
        )
        example_iter = interleave_streams(
            streams,
            weights=domain_config.normalized_weights(),
            seed=train_args.seed,
            homogenous_batch_size=hom,
        )
    else:
        domains = load_domain_datasets(domain_config, train_data_dir)
        # Stamp instructions from the prompt registry where examples lack one
        for name, rows in domains.items():
            inst = get_prompt(data_args.prompt_type, name)
            for r in rows:
                r.setdefault("instruction", inst)
        example_iter = interleave_domains(
            domains,
            weights=domain_config.normalized_weights(),
            seed=train_args.seed,
            homogenous_batch_size=hom,
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
        )
    collator = IterableTrainCollator(
        tokenizer=tokenizer,
        q_max_len=data_args.q_max_len,
        p_max_len=data_args.p_max_len,
        length_buckets=data_args.length_buckets,
        pad_to_max_length=data_args.pad_to_max_length,
        train_n_passages=data_args.train_n_passages,
        seed=train_args.seed,
        positive_passage_no_shuffle=data_args.positive_passage_no_shuffle,
        negative_passage_no_shuffle=data_args.negative_passage_no_shuffle,
        add_prompt_prob=data_args.prompt_probability,
        prompt_type=data_args.prompt_type,
        append_prompt_sep=data_args.append_prompt_sep,
        noncontextual_query_embedding=model_args.noncontextual_query_embedding,
        noncontextual_prompt_prefix=model_args.noncontextual_prompt_prefix,
        token_id_vector_type=model_args.token_id_vector_type,
        use_word_pretokenizer=model_args.use_icu_word_pretokenizer,
        sparse_remove_stopwords=model_args.sparse_remove_stopwords,
        emb_size=model.config_qry.vocab_size,
    )
    trainer = ContrastiveTrainer(
        model, params, train_args,
        train_iter=train_dataloader(
            example_iter, collator, batch_size,
            workers=max(data_args.preprocessing_num_workers, 1)),
    )
    last = find_last_checkpoint(train_args.output_dir) if resume else None
    logs = trainer.train(resume_from=last)
    trainer.save_checkpoint(os.path.join(train_args.output_dir, "final"))
    model.save(jax.device_get(trainer.state.params), train_args.output_dir)
    return logs


def _mp_fn(index: int = 0, *args):  # noqa: ARG001
    """xla_spawn/torch-xla entry hook kept for parity (reference:
    finetune/fit.py:248-252). On native JAX each process just calls main()."""
    import json as _json

    ma, da, ta = parse_args_from_json(
        sys.argv[1], ModelArguments, DataArguments, TrainingArguments)
    with open(sys.argv[1]) as _f:
        _raw = _json.load(_f)
    from ..utils.tokenizer_utils import load_tokenizer

    tok = load_tokenizer(ma.tokenizer_name or ma.model_name_or_path)
    return main(ma, da, ta, tokenizer=tok,
                train_data_dir=_raw.get("train_data_dir"))


if __name__ == "__main__":
    import json as _json

    ma, da, ta = parse_args_from_json(
        sys.argv[1], ModelArguments, DataArguments, TrainingArguments)
    with open(sys.argv[1]) as _f:
        _raw = _json.load(_f)
    from ..utils.tokenizer_utils import load_tokenizer

    tok = load_tokenizer(
        ma.tokenizer_name or ma.model_name_or_path,
        use_fast=ma.use_fast_tokenizer,
        edit_tokenizer_normalizers=ma.edit_tokenizer_normalizers,
        lowercase=ma.lowercase,
        edit_tokenizer_post_processor=ma.edit_tokenizer_post_processor,
        add_bos_num=ma.add_bos_num,
        add_eos_num=ma.add_eos_num,
        add_pooling_token_num=ma.add_pooling_token_num,
        add_pad_token=ma.add_pad_token,
        pad_token=ma.pad_token or "<|pad|>",
        add_sep_token=ma.add_sep_token,
        sep_token=ma.sep_token or "<|sep|>",
    )
    main(
        ma, da, ta, tokenizer=tok,
        train_data_dir=_raw.get("train_data_dir") or os.environ.get("TRAIN_DATA_DIR"),
        model_cls=_raw.get("model_cls", "hybrid"),
    )
