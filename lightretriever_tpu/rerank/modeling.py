"""Cross-encoder reranker models.

Behavioral parity with the reference (reference: rerank/modeling.py:84-326):

* ``CrossEncoder`` — decoder backbone + scalar classification head over the
  last-token hidden state (the AutoModelForSequenceClassification shape for
  decoder-only LMs); listwise CE over ``train_n_passages`` scores per query
  with target index 0 (:148-166).
* ``CrossEncoderLogits`` — no extra head: pool last token, project through
  the LM head, read the "yes"-token logit as the relevance score (:286-326).

Functional style matches EncoderModel: static config on the class, state in a
params pytree, pure methods.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import yaml

from ..arguments import ModelArguments, TrainingArguments
from ..models import decoder as dec
from ..models.config import DecoderConfig
from ..models.encoder import cross_entropy_loss
from ..models.lora import init_lora_params, lora_scale, merge_lora
from ..ops.pooling import pooling

Params = dict[str, Any]


@dataclasses.dataclass
class RerankerOutput:
    loss: Any = 0.0
    logits: Any = None
    logs: dict[str, Any] = dataclasses.field(default_factory=dict)


class CrossEncoder:
    """Classification-head cross-encoder (parity: rerank/modeling.py:84-283)."""

    def __init__(
        self,
        model_args: ModelArguments,
        train_args: Optional[TrainingArguments],
        config: DecoderConfig,
        *,
        train_n_passages: int = 8,
        sigmoid_normalize: bool = False,
        eos_token_id: int = 2,
    ):
        self.model_args = model_args
        self.train_args = train_args or TrainingArguments()
        self.config = config
        self.train_n_passages = train_n_passages
        self.sigmoid_normalize = sigmoid_normalize
        self.eos_token_id = eos_token_id

    # -- params ---------------------------------------------------------------
    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        params: Params = {"lm": dec.init_params(self.config, k1, dtype)}
        params["score"] = {
            "kernel": (jax.random.normal(k2, (self.config.hidden_size, 1)) * 0.02
                       ).astype(dtype)
        }
        if self.model_args.lora:
            params["lora"] = init_lora_params(
                self.config, k3, r=self.model_args.lora_r,
                target_modules=self.model_args.lora_target_modules, dtype=dtype,
            )
        return params

    # -- scoring ---------------------------------------------------------------
    def _backbone(self, params: Params, batch: dict) -> jnp.ndarray:
        out = dec.forward(
            params["lm"],
            batch["input_ids"],
            attention_mask=batch.get("attention_mask"),
            config=self.config,
            causal=not self.model_args.enable_bidirectional_attention,
            attn_impl=self.model_args.attn_implementation
            if self.model_args.attn_implementation != "pallas" else "auto",
            remat=self.train_args.gradient_checkpointing,
            lora=params.get("lora"),
            lora_scale=lora_scale(self.model_args.lora_r, self.model_args.lora_alpha)
            if "lora" in params else 1.0,
        )
        return pooling(out["last_hidden_state"],
                       attention_mask=batch.get("attention_mask"),
                       pooling_strategy="lasttoken")

    def score(self, params: Params, batch: dict) -> jnp.ndarray:
        """[B] relevance scores for tokenized (query, passage) pairs."""
        pooled = self._backbone(params, batch)
        logits = (pooled @ params["score"]["kernel"])[:, 0]
        if self.sigmoid_normalize:
            logits = jax.nn.sigmoid(logits)
        return logits

    def forward(self, params: Params, batch: dict, training: bool = True) -> RerankerOutput:
        logits = self.score(params, batch)
        if not training:
            return RerankerOutput(logits=logits)
        scores = (logits / self.train_args.temperature).reshape(
            -1, self.train_n_passages)
        target = jnp.zeros(scores.shape[0], jnp.int32)  # positive is first
        loss = cross_entropy_loss(scores, target)
        logs = {"loss": loss, "ce_loss": loss}
        ce_scores = batch.get("ce_scores")
        if (training and self.train_args.distillation and ce_scores is not None):
            # Listwise KL from first-stage teacher scores onto the CE
            # logits (the distill path the retriever's KL uses,
            # modeling_encoder.py:188-290, applied to the reranker's
            # [B, n_psg] score lists).
            t = self.train_args.distill_temperature
            teacher = jax.nn.log_softmax(ce_scores / t, axis=-1)
            student = jax.nn.log_softmax(
                logits.reshape(-1, self.train_n_passages) / t, axis=-1)
            kl = jnp.sum(jnp.exp(teacher) * (teacher - student), axis=-1).mean()
            loss = loss + self.train_args.distill_coef * kl
            logs["distill_klloss"] = kl
            logs["loss"] = loss
        return RerankerOutput(loss=loss, logits=logits, logs=logs)

    # -- save / load -------------------------------------------------------------
    def save(self, params: Params, output_dir: str) -> None:
        from ..models.hf_loader import save_decoder_params

        os.makedirs(output_dir, exist_ok=True)
        lm = params["lm"]
        if "lora" in params and self.model_args.merge_peft_when_save:
            lm = merge_lora(lm, params["lora"],
                            self.model_args.lora_r, self.model_args.lora_alpha)
        save_decoder_params(lm, self.config, output_dir)
        with open(os.path.join(output_dir, "model_args.yaml"), "w") as f:
            yaml.safe_dump({
                k: (list(v) if isinstance(v, tuple) else v)
                for k, v in dataclasses.asdict(self.model_args).items()
            }, f)
        if "score" in params:
            import numpy as np

            # fp32 on disk: numpy round-trips bf16 as a void dtype ("|V2"),
            # which jnp.asarray rejects at load time.
            np.save(os.path.join(output_dir, "score_head.npy"),
                    np.asarray(jax.device_get(
                        params["score"]["kernel"])).astype(np.float32))


class CrossEncoderLogits(CrossEncoder):
    """Yes-logit cross-encoder (parity: rerank/modeling.py:286-326): score =
    lm_head(last hidden)[yes_token]."""

    def __init__(self, *args, identifier_token_id: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        self.identifier_token_id = identifier_token_id

    @classmethod
    def with_tokenizer(cls, model_args, train_args, config, tokenizer, **kwargs):
        tid = tokenizer.encode("yes", add_special_tokens=False)[-1]
        return cls(model_args, train_args, config,
                   identifier_token_id=tid, **kwargs)

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        params = super().init_params(key, dtype)
        params.pop("score", None)  # no classification head
        return params

    def score(self, params: Params, batch: dict) -> jnp.ndarray:
        pooled = self._backbone(params, batch)
        w = dec.lm_head_weight(params["lm"], self.config)
        logits = pooled.astype(jnp.float32) @ w.astype(jnp.float32)[:, self.identifier_token_id]
        if self.sigmoid_normalize:
            logits = jax.nn.sigmoid(logits)
        return logits
