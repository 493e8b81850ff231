"""Dense bi-encoder (EncoderModel) — TPU-native functional redesign.

Behavioral parity with the reference's ``EncoderModel``
(reference: src/lightretriever/finetune/modeling_encoder.py:54-590), but
structured the JAX way: the class holds only *static* configuration
(hashable, closed over by ``jit``); all state lives in a params pytree and
every method is a pure function of ``(params, batch)``.

Key redesigns vs the reference:
* ``_dist_gather_tensor`` (modeling_encoder.py:475-570) — the reference
  all-gathers with a local-grad splice because torch's all_gather is not
  differentiable. In JAX, the default train loop is *global-view* ``jit``
  over a sharded mesh, so cross-device negatives are simply the full batch —
  XLA inserts the collectives. An explicit ``axis_name`` path
  (``lax.all_gather``, natively differentiable) is provided for
  ``shard_map``-style loops.
* ``negatives_x_device=False`` (per-device negatives) becomes block-diagonal
  masking of the global score matrix by device group — same math, one
  compiled program.
* chunked similarity w/ grad ckpt (modeling_encoder.py:430-473) is
  unnecessary: XLA tiles the [B, B*n] matmul; ``jax.remat`` handles memory.

Params pytree layout::

    {"qry": <decoder params>,            # always present
     "psg": <decoder params>,            # only when untie_encoder
     "lora_qry": ..., "lora_psg": ...,   # optional LoRA trees
     "den_pooler_q": ..., "den_pooler_p": ...}  # optional projector params
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import yaml

from ..arguments import ModelArguments, TrainingArguments
from ..ops.pooling import pooling
from .config import DecoderConfig
from . import bert as bert_mod
from . import decoder as dec
from .lora import init_lora_params, lora_scale, merge_lora
from .projectors import DenseLinearProjector

Params = dict[str, Any]


def _is_bert(config) -> bool:
    return getattr(config, "model_type", "") == "bert"


def init_tower_params(config, key, dtype):
    """Dispatch tower init by model family (llama/qwen decoder vs BERT)."""
    return bert_mod.init_params(config, key, dtype) if _is_bert(config) \
        else dec.init_params(config, key, dtype)


@dataclasses.dataclass
class EncoderOutput:
    """Mirror of the reference's EncoderOutput (modeling_encoder.py:43-51)."""
    q_reps: Any = None
    p_reps: Any = None
    loss: Any = 0.0
    scores: Any = 0.0
    logs: dict[str, Any] = dataclasses.field(default_factory=dict)


# ---------------------------------------------------------------------------
# Pure loss helpers
# ---------------------------------------------------------------------------
def cross_entropy_loss(scores: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean"):
    """Softmax CE over rows (reference uses nn.CrossEntropyLoss, :109-117)."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
    return nll.mean() if reduction == "mean" else nll


def kl_loss(student_scores: jnp.ndarray, teacher_scores: jnp.ndarray):
    """Batchmean KL(teacher || student) (parity: modeling_encoder.py:572-577)."""
    logp_s = jax.nn.log_softmax(student_scores, axis=-1)
    p_t = jax.nn.softmax(teacher_scores, axis=-1)
    logp_t = jax.nn.log_softmax(teacher_scores, axis=-1)
    return jnp.sum(p_t * (logp_t - logp_s)) / student_scores.shape[0]


def only_hn_mask(scores: jnp.ndarray, only_hn: jnp.ndarray, n_psg: int) -> jnp.ndarray:
    """Mask in/cross-batch negatives for rows flagged only_hn
    (parity: modeling_encoder.py:238-252, vectorized instead of a Python loop).

    For query i with only_hn[i], only columns [i*n_psg, (i+1)*n_psg) survive.
    """
    qb = scores.shape[0]
    col = jnp.arange(scores.shape[1])[None, :]
    row = jnp.arange(qb)[:, None]
    own = (col >= row * n_psg) & (col < (row + 1) * n_psg)
    masked = only_hn[:, None] & ~own
    return jnp.where(masked, jnp.finfo(scores.dtype).min, scores)


def local_negatives_mask(scores: jnp.ndarray, group_q: int, n_psg: int) -> jnp.ndarray:
    """Restrict each query's negatives to its own device group.

    Global-view equivalent of the reference's ``negatives_x_device=False``
    (each rank scores only its local batch): queries in group g only see
    passage columns of group g.
    """
    row_g = jnp.arange(scores.shape[0])[:, None] // group_q
    col_g = jnp.arange(scores.shape[1])[None, :] // (group_q * n_psg)
    return jnp.where(row_g == col_g, scores, jnp.finfo(scores.dtype).min)


def shrink(reps: jnp.ndarray, dim: Optional[int], normalize: bool) -> jnp.ndarray:
    """MRL truncation + renormalize (parity: modeling_hybrid.py:605-622)."""
    if not dim:
        return reps
    assert dim <= reps.shape[-1], f"matryoshka dim {dim} > rep dim {reps.shape[-1]}"
    reps = reps[..., :dim]
    if normalize:
        reps = l2_normalize(reps)
    return reps


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


# ---------------------------------------------------------------------------
# EncoderModel
# ---------------------------------------------------------------------------
class EncoderModel:
    """Static-config holder; all compute methods are pure in (params, batch).

    Args mirror the reference's constructor surface
    (modeling_encoder.py:54-135) minus torch-isms.
    """

    def __init__(
        self,
        model_args: ModelArguments,
        train_args: TrainingArguments,
        config_qry: DecoderConfig,
        config_psg: Optional[DecoderConfig] = None,
        *,
        eos_token_id: int = 2,
        sep_token_id: Optional[int] = None,
        pad_token_id: int = 0,
    ):
        self.model_args = model_args
        self.train_args = train_args
        self.config_qry = config_qry
        self.config_psg = config_psg or config_qry
        self.eos_token_id = eos_token_id
        self.sep_token_id = sep_token_id
        self.pad_token_id = pad_token_id
        self.untied = model_args.untie_encoder

    # -- params ------------------------------------------------------------
    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        kq, kp, kl1, kl2, kd1, kd2 = jax.random.split(key, 6)
        params: Params = {"qry": init_tower_params(self.config_qry, kq, dtype)}
        if self.untied:
            params["psg"] = init_tower_params(self.config_psg, kp, dtype)
        ma = self.model_args
        if ma.lora:
            params["lora_qry"] = init_lora_params(
                self.config_qry, kl1, r=ma.lora_r, target_modules=ma.lora_target_modules, dtype=dtype
            )
            if self.untied:
                params["lora_psg"] = init_lora_params(
                    self.config_psg, kl2, r=ma.lora_r, target_modules=ma.lora_target_modules, dtype=dtype
                )
        if ma.add_pooler:
            h = self.config_qry.hidden_size
            out_q = ma.projection_out_dim_qry or h
            out_p = ma.projection_out_dim_psg or h
            params["den_pooler_q"] = DenseLinearProjector.init(kd1, h, out_q, dtype).params
            if self.untied:
                params["den_pooler_p"] = DenseLinearProjector.init(kd2, h, out_p, dtype).params
        return params

    def _tower(self, params: Params, is_query: bool):
        """(decoder params, lora params, config) for the requested tower."""
        if is_query or not self.untied:
            return params["qry"], params.get("lora_qry"), self.config_qry
        return params["psg"], params.get("lora_psg"), self.config_psg

    def _den_pooler(self, params: Params, is_query: bool):
        if is_query or not self.untied:
            return params.get("den_pooler_q")
        return params.get("den_pooler_p")

    # -- encoding ----------------------------------------------------------
    def _base_forward(self, params: Params, batch: dict, is_query: bool, pooling_strategy):
        tower, lora, config = self._tower(params, is_query)
        need_hs = pooling_strategy in ("avg_first_last", "avg_top2")
        common = dict(
            config=config,
            causal=not self.model_args.enable_bidirectional_attention,
            attn_impl=self.model_args.attn_implementation
            if self.model_args.attn_implementation != "pallas" else "auto",
            output_hidden_states=need_hs,
            remat=self.train_args.gradient_checkpointing,
            lora=lora,
            lora_scale=lora_scale(self.model_args.lora_r, self.model_args.lora_alpha)
            if lora is not None else 1.0,
        )
        if _is_bert(config):
            # BERT family (hybrid_model_architecture='bert'): same call
            # surface, bidirectional by construction (models/bert.py)
            return bert_mod.forward(
                tower,
                batch["input_ids"],
                attention_mask=batch.get("attention_mask"),
                token_type_ids=batch.get("token_type_ids"),
                position_ids=batch.get("position_ids"),
                segment_ids=batch.get("segment_ids"),
                config=config,
                attn_impl="auto" if self.model_args.attn_implementation == "pallas"
                else self.model_args.attn_implementation,
                output_hidden_states=need_hs,
                remat=self.train_args.gradient_checkpointing,
            )
        if "packed_input_ids" in batch:
            # cumulative_seq: pad-free packed forward + scatter back
            # (reference: utils/nested_input.py varlen path; here segment ids
            # in the flash kernel replace cu_seqlens — training/packing.py)
            from ..training.packing import unpack_hidden

            out = dec.forward(
                tower,
                batch["packed_input_ids"],
                position_ids=batch["packed_position_ids"],
                segment_ids=batch["packed_segment_ids"],
                **common,
            )
            unpacked = unpack_hidden(
                out["last_hidden_state"],
                batch["unpack_row"], batch["unpack_col"],
                batch["attention_mask"],
            )
            result = {"last_hidden_state": unpacked}
            if need_hs:
                result["hidden_states"] = jax.vmap(
                    lambda h: unpack_hidden(h, batch["unpack_row"],
                                            batch["unpack_col"],
                                            batch["attention_mask"])
                )(out["hidden_states"])
            return result
        out = dec.forward(
            tower,
            batch["input_ids"],
            attention_mask=batch.get("attention_mask"),
            position_ids=batch.get("position_ids"),
            segment_ids=batch.get("segment_ids"),
            # Collator batches are right-padded by the framework tokenizer
            # contract (utils/tokenizer_utils.py:88 forces padding_side=right),
            # so the kernel's interior-block mask skip is sound here.
            right_padded=True,
            **common,
        )
        return out

    def _dense_reps(self, params, batch, out, is_query: bool, normalize: Optional[bool]):
        ma = self.model_args
        strategy = ma.pooling_strategy_qry if is_query else ma.pooling_strategy_psg
        reps = pooling(
            out["last_hidden_state"],
            hidden_states=out.get("hidden_states"),
            attention_mask=batch.get("attention_mask"),
            pooling_strategy=strategy or "lasttoken",
        )
        pooler_params = self._den_pooler(params, is_query)
        if pooler_params is not None:
            reps = reps @ pooler_params["kernel"] + pooler_params["bias"]
        if ma.dense_shrink_dim:
            reps = reps[..., : ma.dense_shrink_dim]
        if normalize or (normalize is None and ma.normalize):
            reps = l2_normalize(reps)
        return reps

    def encode_query(self, params: Params, qry: Optional[dict], normalize=None):
        if qry is None:
            return None
        out = self._base_forward(params, qry, True, self.model_args.pooling_strategy_qry)
        return self._dense_reps(params, qry, out, True, normalize)

    def encode_passage(self, params: Params, psg: Optional[dict], normalize=None):
        if psg is None:
            return None
        out = self._base_forward(params, psg, False, self.model_args.pooling_strategy_psg)
        return self._dense_reps(params, psg, out, False, normalize)

    # -- similarity & loss ---------------------------------------------------
    @staticmethod
    def compute_similarity(q_reps: jnp.ndarray, p_reps: jnp.ndarray) -> jnp.ndarray:
        """fp32 dot-product score matrix (cos handled by normalization)."""
        return jnp.einsum(
            "qd,pd->qp", q_reps.astype(jnp.float32), p_reps.astype(jnp.float32)
        )

    def _gather(self, reps, axis_name):
        """Differentiable cross-device gather (shard_map path only)."""
        if axis_name is None or reps is None:
            return reps
        return jax.lax.all_gather(reps, axis_name, axis=0, tiled=True)

    def compute_loss(
        self,
        q_reps: jnp.ndarray,
        p_reps: jnp.ndarray,
        ce_scores: Optional[jnp.ndarray] = None,
        only_hn: Optional[jnp.ndarray] = None,
        *,
        temperature: Optional[float] = None,
        axis_name: Optional[str] = None,
        device_group_q: Optional[int] = None,
        **kwargs,
    ) -> EncoderOutput:
        """InfoNCE + optional KL distillation (parity: modeling_encoder.py:188-290).

        ``axis_name``: set inside ``shard_map`` for explicit all-gather of
        negatives; under global-view jit leave None (reps already global).
        ``device_group_q``: per-device query count; set to emulate
        ``negatives_x_device=False`` (local negatives) in global view.
        """
        ta = self.train_args
        q_bs, p_bs = q_reps.shape[0], p_reps.shape[0]
        n_psg = p_bs // q_bs
        temperature = temperature or ta.temperature

        loss = 0.0
        scores = None
        logs: dict[str, Any] = {}

        if ta.clloss_coef > 0:
            if ta.negatives_x_device and axis_name is not None:
                q_full = self._gather(q_reps, axis_name)
                p_full = self._gather(p_reps, axis_name)
                if only_hn is not None:
                    only_hn = self._gather(only_hn, axis_name)
            else:
                q_full, p_full = q_reps, p_reps

            scores = self.compute_similarity(q_full, p_full) / temperature

            if not ta.negatives_x_device and axis_name is None and device_group_q:
                scores = local_negatives_mask(scores, device_group_q, n_psg)
            if only_hn is not None:
                scores = only_hn_mask(scores, only_hn.astype(bool), n_psg)

            target = jnp.arange(scores.shape[0], dtype=jnp.int32) * n_psg
            clloss = cross_entropy_loss(scores, target, ta.loss_reduction) * ta.clloss_coef
            loss = loss + clloss
            logs["clloss"] = clloss if ta.loss_reduction == "mean" else clloss.mean()

        if ta.distillation and ce_scores is not None:
            student = jnp.einsum(
                "bd,bnd->bn",
                q_reps.astype(jnp.float32),
                p_reps.reshape(q_bs, n_psg, -1).astype(jnp.float32),
            ) / ta.distill_temperature
            teacher = ce_scores.reshape(q_bs, n_psg) / ta.distill_temperature
            klloss = kl_loss(student, teacher) * ta.distill_coef
            loss = loss + klloss
            logs["klloss"] = klloss

        return EncoderOutput(loss=loss, scores=scores, q_reps=q_reps, p_reps=p_reps, logs=logs)

    def forward(
        self,
        params: Params,
        query: Optional[dict] = None,
        passage: Optional[dict] = None,
        ce_scores=None,
        only_hn=None,
        training: bool = True,
        **kwargs,
    ) -> EncoderOutput:
        """Parity: modeling_encoder.py:136-186."""
        q_reps = self.encode_query(params, query)
        p_reps = self.encode_passage(params, passage)
        if q_reps is None or p_reps is None:
            return EncoderOutput(q_reps=q_reps, p_reps=p_reps)
        if training:
            return self.compute_loss(q_reps, p_reps, ce_scores, only_hn, **kwargs)
        scores = jnp.einsum(
            "bd,bnd->bn",
            q_reps.astype(jnp.float32),
            p_reps.reshape(q_reps.shape[0], -1, q_reps.shape[-1]).astype(jnp.float32),
        )
        return EncoderOutput(q_reps=q_reps, p_reps=p_reps, scores=scores)

    # -- save / load ---------------------------------------------------------
    def save(self, params: Params, output_dir: str) -> None:
        """model_args.yaml + safetensors, query_model/passage_model split when
        untied (parity: modeling_encoder.py:813-856)."""
        from .hf_loader import save_decoder_params

        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "model_args.yaml"), "w") as f:
            yaml.safe_dump(
                {k: _yamlable(v) for k, v in dataclasses.asdict(self.model_args).items()}, f
            )
        qry = params["qry"]
        if dec.params_are_fused(qry):
            # merge_lora addresses per-module q_proj/... names — restore the
            # unfused layout first (save_decoder_params would unfuse anyway)
            qry = dec.unfuse_decoder_params(qry, self.config_qry)
        if "lora_qry" in params and self.model_args.merge_peft_when_save:
            qry = merge_lora(qry, params["lora_qry"],
                             self.model_args.lora_r, self.model_args.lora_alpha)
        if self.untied:
            psg = params["psg"]
            if dec.params_are_fused(psg):
                psg = dec.unfuse_decoder_params(psg, self.config_psg)
            if "lora_psg" in params and self.model_args.merge_peft_when_save:
                psg = merge_lora(psg, params["lora_psg"],
                                 self.model_args.lora_r, self.model_args.lora_alpha)
            save_decoder_params(qry, self.config_qry, os.path.join(output_dir, "query_model"))
            save_decoder_params(psg, self.config_psg, os.path.join(output_dir, "passage_model"))
        else:
            save_decoder_params(qry, self.config_qry, output_dir)
        if "den_pooler_q" in params:
            proj = DenseLinearProjector(
                jax.tree_util.tree_map(lambda x: x, params["den_pooler_q"]),
                params["den_pooler_q"]["kernel"].shape[0],
                params["den_pooler_q"]["kernel"].shape[1],
            )
            proj.save_pooler(output_dir)

    @classmethod
    def load(
        cls,
        model_dir: str,
        model_args: Optional[ModelArguments] = None,
        train_args: Optional[TrainingArguments] = None,
        dtype=jnp.bfloat16,
        **tok_ids,
    ) -> tuple["EncoderModel", Params]:
        """Load from a save() directory (or plain HF checkpoint dir).

        When the directory carries a ``model_args.yaml`` (written by our
        save() AND by the reference's, modeling_encoder.py:813-856), its
        fields populate/override ModelArguments — so a checkpoint trained
        with the reference loads with its pooling/hybrid/sparsify settings
        intact. Unknown keys (torch-only knobs) are ignored.
        """
        from .hf_loader import load_decoder_params

        train_args = train_args or TrainingArguments()
        yaml_path = os.path.join(model_dir, "model_args.yaml")
        if os.path.exists(yaml_path):
            with open(yaml_path) as f:
                saved = yaml.safe_load(f) or {}
            known = {fld.name for fld in dataclasses.fields(ModelArguments)}
            overrides = {k: (tuple(v) if isinstance(v, list) else v)
                         for k, v in saved.items() if k in known}
            if model_args is not None:
                # explicit args win over the saved yaml
                defaults = ModelArguments(pooling_strategy="lasttoken")
                for k, v in dataclasses.asdict(model_args).items():
                    dv = getattr(defaults, k, None)
                    if v != dv and k in known:
                        overrides[k] = tuple(v) if isinstance(v, list) else v
            overrides.pop("model_name_or_path", None)
            overrides.setdefault("pooling_strategy", "lasttoken")
            model_args = ModelArguments(**overrides)
        elif model_args is None:
            model_args = ModelArguments(pooling_strategy="lasttoken")
        qry_dir = os.path.join(model_dir, "query_model")
        untied = os.path.isdir(qry_dir)
        params: Params = {}
        if untied:
            cfg_q = DecoderConfig.from_pretrained(qry_dir)
            cfg_p = DecoderConfig.from_pretrained(os.path.join(model_dir, "passage_model"))
            params["qry"] = load_decoder_params(qry_dir, cfg_q, dtype)
            params["psg"] = load_decoder_params(
                os.path.join(model_dir, "passage_model"), cfg_p, dtype
            )
            model_args.untie_encoder = True
        else:
            cfg_q = cfg_p = DecoderConfig.from_pretrained(model_dir)
            params["qry"] = load_decoder_params(model_dir, cfg_q, dtype)
        model = cls(model_args, train_args, cfg_q, cfg_p, **tok_ids)
        pooler_cfg = os.path.join(model_dir, "pooler_config.json")
        if os.path.exists(pooler_cfg):
            proj = DenseLinearProjector.load(model_dir)
            params["den_pooler_q"] = proj.params
        return model, params


def _yamlable(v):
    if isinstance(v, tuple):
        return list(v)
    return v
