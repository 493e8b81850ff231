"""Hybrid retriever model: dense + sparse + asymmetric query encoders.

Behavioral parity with the reference's ``HybridModel``
(reference: src/lightretriever/finetune/modeling_hybrid.py:91-987), redesigned
functional/TPU-native on top of :class:`EncoderModel`:

Representation types (reference :265-498):
  dense_reps    — pooled hidden state (+ optional projector, MRL shrink, L2 norm)
  sparse_reps   — lm-head projection -> max/mean aggregation over seq ->
                  sparsify pipeline (ReLU/log1p/top-p/top-k/unique-token mask)
  emb_reps      — non-contextual query embedding: training = blocked forward
                  (shared prompt + isolated [tok, eos] micro-segments, via the
                  Pallas kernel's prompt_len + segment_ids instead of the
                  reference's 4-D mask fallback, monkey_patch.py:59-77);
                  inference = cached EmbeddingBag lookup.
  token_id_reps — parameter-free token-count vector.

Loss composition (reference :624-829): MRL loop over dense dims, sparse CL
with its own temperature, asymmetric emb/token CL + KL distillation paths,
FLOPS/vector-norm regulators with scheduled scaling, sparse statistics logs.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.embedding_bag import embedding_bag_lookup
from ..ops.max_linear_map import max_linear_mapping
from ..ops.pooling import get_sparse_attention_mask, mean_eos_pooling, pooling
from ..ops.sparsify import sparsify, token_count_vector
from .decoder import forward as decoder_forward, lm_head_weight
from .encoder import (
    EncoderModel,
    EncoderOutput,
    Params,
    kl_loss,
    l2_normalize,
    shrink,
)
from .lora import lora_scale
from .projectors import SparseDownProjector

# ---------------------------------------------------------------------------
# Sparse aggregation (parity: finetune/sparse_pooling.py:244-278)
# ---------------------------------------------------------------------------
def aggregate(
    hidden: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    sparse_attention_mask: jnp.ndarray,
    use_max: bool = True,
) -> jnp.ndarray:
    """Vocab logits from hidden states: max- or mean-aggregated over seq.

    max: streaming Pallas max-linear-map (never materializes [B, S, V]).
    mean: exploits linearity — mean_s(h @ W + b) == mean_s(h) @ W + b — so the
    [B, S, V] tensor the reference materializes (sparse_pooling.py:269-277)
    never exists here either.
    """
    if use_max:
        return max_linear_mapping(hidden, weight, bias, mask=sparse_attention_mask)
    m = sparse_attention_mask.astype(jnp.float32)[..., None]
    pooled = (hidden.astype(jnp.float32) * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)
    out = pooled @ weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def rowwise_nonzero_stats(x: jnp.ndarray, scale_factor: float = 100.0):
    """Per-row stats over nonzero entries (parity: modeling_hybrid.py:832-848).

    Static-shape redesign: instead of ragged per-row nonzero lists, sort with
    +inf sentinels so nonzeros occupy a prefix in ascending order.
    """
    mask = x != 0
    count = mask.sum(-1)
    safe = jnp.maximum(count, 1)
    max_v = jnp.where(count > 0, jnp.where(mask, x, -jnp.inf).max(-1), 0.0)
    min_v = jnp.where(count > 0, jnp.where(mask, x, jnp.inf).min(-1), 0.0)
    mean_v = jnp.where(count > 0, (x * mask).sum(-1) / safe, 0.0)
    asc = jnp.sort(jnp.where(mask, x, jnp.inf), axis=-1)  # nonzeros first, ascending
    med_idx = (safe - 1) // 2  # lower median, matching torch.median
    median_v = jnp.where(
        count > 0, jnp.take_along_axis(asc, med_idx[:, None], axis=-1)[:, 0], 0.0
    )
    scaled_cnt = (jnp.floor(x * scale_factor) != 0).sum(-1).astype(jnp.float32)
    return max_v, min_v, mean_v, median_v, scaled_cnt


class HybridModel(EncoderModel):
    """Hybrid dense/sparse/asymmetric encoder (reference: modeling_hybrid.py:91)."""

    # -- params ------------------------------------------------------------
    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        params = super().init_params(key, dtype)
        ma = self.model_args
        if ma.use_sparse_linear_projector or ma.use_sparse_down_projector:
            k1, k2 = jax.random.split(jax.random.fold_in(key, 7))
            h = self.config_qry.hidden_size
            v = self.config_qry.vocab_size
            if ma.use_sparse_down_projector:
                params["spr_pooler_q"] = SparseDownProjector.init(k1, h, v, dtype).params
                if self.untied:
                    params["spr_pooler_p"] = SparseDownProjector.init(k2, h, v, dtype).params
            else:
                # Init from lm_head weights, the reference's default
                # (modeling_hybrid.py:879-905)
                w = lm_head_weight(params["qry"], self.config_qry).astype(dtype)
                params["spr_pooler_q"] = {"kernel": w, "bias": jnp.zeros((v,), dtype)}
                if self.untied:
                    wp = lm_head_weight(params["psg"], self.config_psg).astype(dtype)
                    params["spr_pooler_p"] = {"kernel": wp, "bias": jnp.zeros((v,), dtype)}
        return params

    def _spr_proj(self, params: Params, is_query: bool):
        """(weight [H, V], bias [V] | None) of the sparse projection."""
        key = "spr_pooler_q" if (is_query or not self.untied) else "spr_pooler_p"
        if key in params:
            p = params[key]
            return p["kernel"], p.get("bias")
        tower, _, config = self._tower(params, is_query)
        return lm_head_weight(tower, config), None

    # -- sparse ------------------------------------------------------------
    def _sparse_reps(self, params: Params, batch: dict, out: dict, is_query: bool):
        ma = self.model_args
        hidden = out["last_hidden_state"]
        weight, bias = self._spr_proj(params, is_query)
        if ma.sparse_pooling_strategy is not None:
            # Pool then project (reference :285-301)
            pooled = pooling(
                hidden,
                attention_mask=batch.get("attention_mask"),
                pooling_strategy=ma.sparse_pooling_strategy,
            )
            if ma.use_sparse_down_projector:
                key = "spr_pooler_q" if (is_query or not self.untied) else "spr_pooler_p"
                proj = SparseDownProjector(
                    params[key], self.config_qry.hidden_size, self.config_qry.vocab_size
                )
                logits = proj(pooled, input_ids=batch["input_ids"])
            else:
                logits = pooled.astype(jnp.float32) @ weight.astype(jnp.float32)
                if bias is not None:
                    logits = logits + bias.astype(jnp.float32)
        else:
            # Project then aggregate (reference :303-311)
            sam = get_sparse_attention_mask(
                batch["input_ids"],
                batch["attention_mask"],
                sep_token_id=self.sep_token_id,
                remove_prompt=ma.add_sep_token,
            )
            logits = aggregate(hidden, weight, bias, sam, ma.sparse_use_max_aggregation)
        return sparsify(
            logits.astype(jnp.float32),
            is_query=is_query,
            model_args=ma,
            input_ids=batch.get("input_ids"),
            attention_mask=batch.get("attention_mask"),
            unique_token_ids=batch.get("unique_token_ids"),
            sep_token_id=self.sep_token_id,
        )

    # -- encoding ----------------------------------------------------------
    def encode_passage(
        self,
        params: Params,
        psg: Optional[dict],
        normalize=None,
        encode_dense: Optional[bool] = None,
        encode_sparse: Optional[bool] = None,
    ):
        """Returns {'dense_reps'?, 'sparse_reps'?} (parity: modeling_hybrid.py:205-325)."""
        if psg is None:
            return None
        ma = self.model_args
        encode_dense = encode_dense if encode_dense is not None else (
            ma.hybrid_use_dense_vector or ma.hybrid_use_emb_vector
        )
        encode_sparse = encode_sparse if encode_sparse is not None else (
            ma.hybrid_use_sparse_vector or ma.hybrid_use_token_id_vector
        )
        out = self._base_forward(params, psg, False, ma.pooling_strategy_psg)
        reps: dict[str, jnp.ndarray] = {}
        if encode_dense:
            reps["dense_reps"] = self._dense_reps(params, psg, out, False, normalize)
        if encode_sparse:
            reps["sparse_reps"] = self._sparse_reps(params, psg, out, False)
        return reps

    def encode_query(
        self,
        params: Params,
        qry: Optional[dict],
        normalize=None,
        encode_dense: Optional[bool] = None,
        encode_sparse: Optional[bool] = None,
        encode_emb_reps: Optional[bool] = None,
        encode_token_id_reps: Optional[bool] = None,
        training: bool = True,
        emb_bag: Optional[jnp.ndarray] = None,
    ):
        """Returns a rep dict (parity: modeling_hybrid.py:327-498).

        Training emb_reps path expects collator-provided blocked inputs:
        ``nonctx_input_ids`` [B, S], ``nonctx_segment_ids`` [B, S] (prompt =
        segment 1, each [tok, eos] block its own segment), ``nonctx_position_ids``
        [B, S], ``nonctx_attention_mask_2d`` [B, S], plus static ``prompt_len``.
        Inference expects ``emb_bag_ids`` [B, L] (+ ``emb_bag_mask``) and the
        cached [V, H] ``emb_bag`` table.
        """
        if qry is None:
            return None
        ma = self.model_args
        encode_dense = encode_dense if encode_dense is not None else ma.hybrid_use_dense_vector
        encode_sparse = encode_sparse if encode_sparse is not None else ma.hybrid_use_sparse_vector
        encode_emb_reps = (
            encode_emb_reps if encode_emb_reps is not None else ma.hybrid_use_emb_vector
        )
        encode_token_id_reps = (
            encode_token_id_reps
            if encode_token_id_reps is not None
            else ma.hybrid_use_token_id_vector
        )
        normalize = normalize if normalize is not None else ma.normalize

        reps: dict[str, jnp.ndarray] = {}
        if encode_dense or encode_sparse:
            out = self._base_forward(params, qry, True, ma.pooling_strategy_qry)
            if encode_dense:
                reps["dense_reps"] = self._dense_reps(params, qry, out, True, normalize)
            if encode_sparse:
                reps["sparse_reps"] = self._sparse_reps(params, qry, out, True)

        if encode_emb_reps:
            if ma.noncontextual_query_embedding:
                if training:
                    emb_reps = self._nonctx_train_emb(params, qry)
                else:
                    assert emb_bag is not None, "cache an EmbeddingBag table for inference"
                    emb_reps = embedding_bag_lookup(
                        emb_bag, qry["emb_bag_ids"], qry.get("emb_bag_mask"), mode="mean"
                    )
            else:
                # Ablation: raw input-embedding mean (reference :476-487)
                tower, _, _ = self._tower(params, True)
                inputs_embeds = jnp.take(tower["embed_tokens"], qry["input_ids"], axis=0)
                emb_reps = pooling(
                    inputs_embeds,
                    attention_mask=qry.get("attention_mask"),
                    pooling_strategy="mean",
                )
            if ma.dense_shrink_dim:
                emb_reps = emb_reps[..., : ma.dense_shrink_dim]
            if normalize:
                emb_reps = l2_normalize(emb_reps)
            reps["emb_reps"] = emb_reps

        if encode_token_id_reps:
            if "token_id_reps" in qry:
                reps["token_id_reps"] = qry["token_id_reps"]
            else:
                reps["token_id_reps"] = token_count_vector(
                    qry["input_ids"],
                    qry["attention_mask"],
                    self.config_qry.vocab_size,
                    vector_type=ma.token_id_vector_type,
                )
        return reps

    def _nonctx_train_emb(self, params: Params, qry: dict) -> jnp.ndarray:
        """Blocked per-token query forward -> mean EOS pooling
        (reference: modeling_hybrid.py:453-470 + nonctx_emb_utils.py:27-194).

        The reference builds a 4-D block-diagonal mask and falls back to SDPA;
        here the same visibility pattern is expressed as segment ids plus a
        shared ``prompt_len`` prefix — native to the Pallas kernel.
        """
        assert "nonctx_input_ids" in qry, (
            "noncontextual_query_embedding training needs blocked inputs from "
            "the collator — set noncontextual_query_embedding=True on "
            "TrainCollator/EncodeCollator (training/data.py:tokenize_nonctx_query)"
        )
        tower, lora, config = self._tower(params, True)
        prompt_len = int(qry.get("nonctx_prompt_len", 0))
        out = decoder_forward(
            tower,
            qry["nonctx_input_ids"],
            attention_mask=qry.get("nonctx_attention_mask_2d"),
            position_ids=qry.get("nonctx_position_ids"),
            segment_ids=qry["nonctx_segment_ids"],
            config=config,
            causal=not self.model_args.enable_bidirectional_attention,
            prompt_len=prompt_len,
            remat=self.train_args.gradient_checkpointing,
            lora=lora,
            lora_scale=lora_scale(self.model_args.lora_r, self.model_args.lora_alpha)
            if lora is not None else 1.0,
        )
        return mean_eos_pooling(
            out["last_hidden_state"],
            input_ids=qry["nonctx_input_ids"],
            attention_mask=qry.get(
                "nonctx_attention_mask_2d",
                (qry["nonctx_segment_ids"] > 0).astype(jnp.int32),
            ),
            eos_id=self.eos_token_id,
        )

    # -- regulators (parity: modeling_hybrid.py:969-987) --------------------
    @staticmethod
    def flops(inputs: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(jnp.mean(jnp.abs(inputs), axis=0) ** 2)

    @staticmethod
    def norm_loss(inputs: jnp.ndarray, ord: int = 0) -> jnp.ndarray:
        if ord == 0:
            normed = (inputs != 0).sum(-1).astype(jnp.float32)
        else:
            normed = jnp.linalg.norm(jnp.abs(inputs), ord=ord, axis=-1)
        return jnp.mean(normed)

    # -- loss composition ----------------------------------------------------
    def compute_loss(
        self,
        q_reps: dict[str, jnp.ndarray],
        p_reps: dict[str, jnp.ndarray],
        ce_scores: Optional[jnp.ndarray] = None,
        only_hn: Optional[jnp.ndarray] = None,
        *,
        reg_scaling_factor: float = 1.0,
        axis_name: Optional[str] = None,
        device_group_q: Optional[int] = None,
        **kwargs,
    ) -> EncoderOutput:
        """Parity: modeling_hybrid.py:624-829."""
        ta, ma = self.train_args, self.model_args
        assert isinstance(q_reps, dict) and isinstance(p_reps, dict)
        q_dense = q_reps.get("dense_reps")
        q_sparse = q_reps.get("sparse_reps")
        q_emb = q_reps.get("emb_reps")
        q_tok = q_reps.get("token_id_reps")
        p_dense = p_reps.get("dense_reps")
        p_sparse = p_reps.get("sparse_reps")

        loss = 0.0
        logs: dict[str, Any] = {}
        scores: dict[str, jnp.ndarray] = {}
        base_kwargs = dict(axis_name=axis_name, device_group_q=device_group_q)

        # Optional per-dim MRL loss weights (VERDICT r4 next #6): the
        # reference sums the per-dim CL losses unweighted; a weight > 1 on a
        # short prefix trades full-dim quality for prefix quality.
        mrl_w = (dict(zip(ta.matryoshka_dims, ta.matryoshka_weights))
                 if ta.matryoshka_weights else {})

        def sub_loss(q, p, name, prefix, suffix="", temperature=None,
                     weight=1.0):
            nonlocal loss
            out = super(HybridModel, self).compute_loss(
                q, p, ce_scores=ce_scores, only_hn=only_hn,
                temperature=temperature, **base_kwargs,
            )
            loss = loss + weight * out.loss
            scores[name] = out.scores
            for k, v in out.logs.items():
                logs[f"{prefix}{k}{suffix}"] = v
            return out

        dense_out = None
        use_dense = q_dense is not None and p_dense is not None
        if use_dense:
            for mrl_dim in ta.matryoshka_dims:
                dense_out = sub_loss(
                    shrink(q_dense, mrl_dim, ma.normalize),
                    shrink(p_dense, mrl_dim, ma.normalize),
                    "dense", "mrl_loss/den_", f"-dim{mrl_dim}",
                    weight=mrl_w.get(mrl_dim, 1.0),
                )

        use_sparse = q_sparse is not None and p_sparse is not None
        if use_sparse:
            sub_loss(q_sparse, p_sparse, "sparse", "spr_",
                     temperature=ta.sparse_temperature)

        if q_emb is not None and p_dense is not None:
            for mrl_dim in ta.matryoshka_dims:
                emb_out = sub_loss(
                    shrink(q_emb, mrl_dim, ma.normalize),
                    shrink(p_dense, mrl_dim, ma.normalize),
                    "imb_dense", "mrl_loss/imbden_", f"-dim{mrl_dim}",
                    weight=mrl_w.get(mrl_dim, 1.0),
                )
                if ta.emb_den_reps_distillation:
                    assert use_dense
                    kl = kl_loss(
                        shrink(q_emb, mrl_dim, ma.normalize),
                        jax.lax.stop_gradient(shrink(q_dense, mrl_dim, ma.normalize)),
                    ) * ta.emb_reps_distill_coef
                    loss = loss + kl
                    logs[f"mrl_loss/emb_den_reps_klloss-dim{mrl_dim}"] = kl
                if ta.emb_den_scores_distillation:
                    assert use_dense
                    kl = kl_loss(
                        emb_out.scores, jax.lax.stop_gradient(dense_out.scores)
                    ) * ta.emb_reps_distill_coef
                    loss = loss + kl
                    logs[f"mrl_loss/emb_den_scores_klloss-dim{mrl_dim}"] = kl

        use_token_id = q_tok is not None and p_sparse is not None
        if use_token_id:
            tok_out = sub_loss(q_tok, p_sparse, "imb_sparse", "imbspr_",
                               temperature=ta.sparse_temperature)
            if ta.tok_den_scores_distillation:
                assert use_dense
                kl = kl_loss(
                    tok_out.scores, jax.lax.stop_gradient(dense_out.scores)
                ) * ta.tok_reps_distill_coef
                loss = loss + kl
                logs["tok_den_scores_klloss"] = kl

        # Regulators + sparse statistics (reference :736-826)
        apply_q_reg = use_sparse
        apply_p_reg = use_sparse or use_token_id
        if apply_q_reg or apply_p_reg:
            if ta.add_flops:
                if apply_q_reg:
                    ql = self.flops(q_sparse) * ta.q_norm_loss_factor * reg_scaling_factor
                    loss = loss + ql
                    logs["q_flops_loss"] = ql
                if apply_p_reg:
                    pl_ = self.flops(p_sparse) * ta.p_norm_loss_factor * reg_scaling_factor
                    loss = loss + pl_
                    logs["p_flops_loss"] = pl_
            if ta.add_vector_norm:
                if apply_q_reg:
                    ql = self.norm_loss(q_sparse, ord=ta.norm_ord) \
                        * ta.q_norm_loss_factor * reg_scaling_factor
                    loss = loss + ql
                    logs["q_norm_loss"] = ql
                if apply_p_reg:
                    pl_ = self.norm_loss(p_sparse, ord=ta.norm_ord) \
                        * ta.p_norm_loss_factor * reg_scaling_factor
                    loss = loss + pl_
                    logs["p_norm_loss"] = pl_

            q_stat_src = q_sparse if apply_q_reg else q_tok
            q_stat = jax.lax.stop_gradient(q_stat_src)
            p_stat = jax.lax.stop_gradient(p_sparse)
            logs["spr_stats/q_l0"] = (q_stat != 0).sum(-1).astype(jnp.float32).mean()
            qmx, qmn, qme, qmd, qsc = rowwise_nonzero_stats(q_stat)
            logs["spr_stats/q_value_max"] = qmx.mean()
            logs["spr_stats/q_value_min"] = qmn.mean()
            logs["spr_stats/q_value_mean"] = qme.mean()
            logs["spr_stats/q_value_median"] = qmd.mean()
            logs["spr_stats/q_scaled_non_zero_cnt"] = qsc.mean()
            logs["spr_stats/p_l0"] = (p_stat != 0).sum(-1).astype(jnp.float32).mean()
            pmx, pmn, pme, pmd, psc = rowwise_nonzero_stats(p_stat)
            logs["spr_stats/p_value_max"] = pmx.mean()
            logs["spr_stats/p_value_min"] = pmn.mean()
            logs["spr_stats/p_value_mean"] = pme.mean()
            logs["spr_stats/p_value_median"] = pmd.mean()
            logs["spr_stats/p_scaled_non_zero_cnt"] = psc.mean()

        return EncoderOutput(q_reps=q_reps, p_reps=p_reps, loss=loss,
                             scores=scores, logs=logs)

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
        q_reps = self.encode_query(params, query, training=training)
        p_reps = self.encode_passage(params, passage)
        if q_reps is None or p_reps is None:
            return EncoderOutput(q_reps=q_reps, p_reps=p_reps)
        return self.compute_loss(q_reps, p_reps, ce_scores, only_hn, **kwargs)

    # -- save / load (parity: modeling_hybrid.py:940-967 — spr poolers get
    # their own files next to the HF weights) --------------------------------
    def save(self, params: Params, output_dir: str) -> None:
        import numpy as np

        super().save(params, output_dir)
        for key in ("spr_pooler_q", "spr_pooler_p"):
            if key in params:
                # float32 on disk: np.savez stores ml_dtypes.bfloat16 as raw
                # void-V2 bytes that np.load cannot convert back.
                arrs = {k: np.asarray(jax.device_get(v), np.float32)
                        for k, v in params[key].items()}
                np.savez(os.path.join(output_dir, f"{key}.npz"), **arrs)

    @classmethod
    def load(cls, model_dir: str, model_args=None, train_args=None,
             dtype=jnp.bfloat16, **tok_ids):
        import numpy as np

        base, params = EncoderModel.load.__func__(
            cls, model_dir, model_args, train_args, dtype, **tok_ids)
        for key in ("spr_pooler_q", "spr_pooler_p"):
            path = os.path.join(model_dir, f"{key}.npz")
            if os.path.exists(path):
                with np.load(path) as z:
                    loaded = {}
                    for k in z.files:
                        a = z[k]
                        if a.dtype.kind == "V":  # pre-fix checkpoints: raw
                            import ml_dtypes  # bfloat16 bytes stored as V2

                            a = a.view(ml_dtypes.bfloat16)
                        loaded[k] = jnp.asarray(a, dtype)
                    params[key] = loaded
        return base, params
