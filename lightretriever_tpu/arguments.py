"""Configuration system: 4-level dataclass hierarchy.

Mirrors the reference's argument surface (reference: src/lightretriever/arguments.py,
finetune/arguments.py, inference/arguments.py, eval/eval_arguments.py) so a user of
the reference finds every knob, but drops the HF ``TrainingArguments`` dependency:
training args here are a plain dataclass consumed by our own JAX train loop.

Levels:
  DomainConfig                      — per-domain data-mixture config (JSON loadable)
  BaseDataArguments / DataArguments — data + tokenization knobs
  BaseModelArguments / ModelArguments — backbone / pooling / hybrid / sparsify knobs
  TrainingArguments                 — optimizer, losses, regulators, MRL, GradCache
  InferenceArguments                — encode batch sizes, dtype, sharding
  EvalArguments                     — benchmark/task selection, top-k, fusion weights
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional


# ---------------------------------------------------------------------------
# Domain mixture config (reference: arguments.py:21-62, config/data/*.json)
# ---------------------------------------------------------------------------
@dataclass
class DomainConfig:
    """Per-domain dataset mixture configuration.

    JSON schema matches the reference's ``config/data/*.json``:
    ``domain_ids`` (name -> id), ``domain_weights`` (name -> sampling prob),
    ``size`` (name -> n_examples), ``epoch``, ``ref_length``.
    """

    domain_ids: dict[str, int] = field(default_factory=dict)
    domain_weights: dict[str, float] = field(default_factory=dict)
    size: dict[str, int] = field(default_factory=dict)
    epoch: dict[str, float] = field(default_factory=dict)
    ref_length: dict[str, int] = field(default_factory=dict)
    # Optional per-domain task types ('retrieval', 'sts', ...) used for only_hn flags
    task_type: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_json(cls, path: str) -> "DomainConfig":
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})

    def normalized_weights(self) -> dict[str, float]:
        total = sum(self.domain_weights.values())
        if total <= 0:
            n = max(len(self.domain_ids), 1)
            return {k: 1.0 / n for k in self.domain_ids}
        return {k: v / total for k, v in self.domain_weights.items()}


# ---------------------------------------------------------------------------
# Data arguments (reference: arguments.py:66-143 + finetune/arguments.py:21-72)
# ---------------------------------------------------------------------------
@dataclass
class BaseDataArguments:
    domain_config_path: Optional[str] = None
    preprocessing_num_workers: int = 4
    # Homogenous batching: every global batch drawn from a single domain
    # (reference: utils/homogenous_iterable_dataset.py)
    homogenous_batch: bool = False
    # Streaming domain readers: O(shuffle_buffer) memory per domain instead
    # of loading every row (the reference's HF iterable-dataset mixtures,
    # utils/data_utils.py:500-597); required for web-scale mixtures.
    streaming: bool = False
    shuffle_buffer_size: int = 4096
    # Prompt / instruction handling
    prompt_type: str = "e5"  # e5 | instructor | bge | none
    append_prompt_sep: bool = False
    prompt_probability: float = 1.0


@dataclass
class DataArguments(BaseDataArguments):
    q_max_len: int = 512
    p_max_len: int = 512
    pad_to_max_length: bool = True  # TPU: static shapes strongly preferred
    # Length bucketing for dynamic batches: pad seq len up to nearest bucket
    # (TPU replacement for the reference's dynamic padding; avoids recompiles)
    length_buckets: tuple[int, ...] = (64, 128, 256, 512)
    query_collection: Optional[str] = None
    passage_collection: Optional[str] = None
    corpus_path: Optional[str] = None
    dev_path: Optional[str] = None
    train_n_passages: int = 8
    positive_passage_no_shuffle: bool = False
    negative_passage_no_shuffle: bool = False
    encode_is_qry: bool = False
    encoded_save_prefix: Optional[str] = None
    qrel_path: Optional[str] = None


# ---------------------------------------------------------------------------
# Model arguments (reference: arguments.py:145-324 + finetune/arguments.py:76-335)
# ---------------------------------------------------------------------------
@dataclass
class BaseModelArguments:
    model_name_or_path: Optional[str] = None
    tokenizer_name: Optional[str] = None
    # Computation dtype for the encoder forward (params may stay in this dtype too)
    dtype: str = "bfloat16"
    # Attention implementation: 'pallas' (TPU flash attention) | 'xla' (reference jnp path)
    attn_implementation: str = "pallas"
    enable_bidirectional_attention: bool = False
    # Sequence packing via segment ids (TPU replacement of FA2 varlen cu_seqlens;
    # reference: utils/nested_input.py)
    cumulative_seq: bool = False
    # Tokenizer surgery (reference: arguments.py:190-310 + utils/data_utils.py:29)
    use_fast_tokenizer: bool = True
    cache_dir: Optional[str] = None
    lowercase: bool = False
    edit_tokenizer_normalizers: bool = True
    edit_tokenizer_post_processor: bool = True
    add_bos_num: int = -1
    add_eos_num: int = -1
    add_pooling_token_num: int = -1
    add_pad_token: bool = True
    # Pad / sep token surgery (reference: arguments.py:283-310)
    pad_token: Optional[str] = None
    sep_token: Optional[str] = None
    add_sep_token: bool = False
    # LoRA (reference: finetune/modeling_encoder.py:658-676)
    lora: bool = False
    lora_r: int = 16
    lora_alpha: int = 32
    lora_dropout: float = 0.1
    lora_target_modules: tuple[str, ...] = (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
    )
    merge_peft_when_save: bool = True


@dataclass
class ModelArguments(BaseModelArguments):
    # Retriever args
    untie_encoder: bool = False
    pooling_strategy: Optional[str] = None
    score_function: str = "cos_sim"  # dot | cos_sim
    normalize: Optional[bool] = None
    dense_shrink_dim: Optional[int] = None
    add_pooler: bool = False
    projection_out_dim: Optional[int] = None
    model_name_or_path_qry: Optional[str] = None
    model_name_or_path_psg: Optional[str] = None
    pooling_strategy_qry: Optional[str] = None
    pooling_strategy_psg: Optional[str] = None
    projection_out_dim_qry: Optional[int] = None
    projection_out_dim_psg: Optional[int] = None

    # Hybrid model
    hybrid_model_architecture: str = "gpt"  # gpt | bert
    hybrid_use_dense_vector: bool = False
    hybrid_use_sparse_vector: bool = False
    hybrid_use_emb_vector: bool = False
    hybrid_use_token_id_vector: bool = False

    # Emb vec (asymmetric dense)
    noncontextual_query_embedding: bool = False
    noncontextual_prompt_prefix: Optional[str] = None

    # Token id rep (asymmetric sparse)
    token_id_vector_type: str = "sum"  # bow | sum

    # Sparse pooling / aggregation
    sparse_pooling_strategy: Optional[str] = None  # None => max/mean aggregation
    sparse_use_max_aggregation: bool = True

    # Sparsify
    use_icu_word_pretokenizer: bool = False
    sparse_pool_from_unique_token_ids: bool = False
    sparse_pool_from_original_input_ids_qry: bool = False
    sparse_pool_from_original_input_ids_psg: bool = False
    sparse_min_tokens_to_keep: int = 8
    sparse_remove_stopwords: bool = False
    sparse_use_relu: bool = False
    sparse_use_log_saturation: bool = False
    sparse_top_p_qry: float = 1.0
    sparse_top_p_psg: float = 1.0
    sparse_top_k_qry: int = 0
    sparse_top_k_psg: int = 0

    # Sparse projectors
    use_sparse_linear_projector: bool = False
    use_sparse_down_projector: bool = False

    def __post_init__(self):
        if self.score_function == "dot":
            self.normalize = False
        elif self.score_function == "cos_sim":
            self.normalize = True
        else:
            raise ValueError(f"Unsupported score_function: {self.score_function}")

        if self.model_name_or_path:
            # Family pad/sep defaults when unset (parity: arguments.py:283-310
            # resolves "<|pad|>"/"<|sep|>" placeholders per backbone family).
            from .utils.tokenizer_utils import default_special_tokens

            family = default_special_tokens(self.model_name_or_path)
            if self.pad_token is None:
                self.pad_token = family["pad_token"]
            if self.sep_token is None:
                self.sep_token = family["sep_token"]
            self.model_name_or_path_qry = self.model_name_or_path
            self.model_name_or_path_psg = self.model_name_or_path
            if self.untie_encoder:
                qry = os.path.join(self.model_name_or_path, "query_model")
                psg = os.path.join(self.model_name_or_path, "passage_model")
                if os.path.exists(qry) and os.path.exists(psg):
                    self.model_name_or_path_qry = qry
                    self.model_name_or_path_psg = psg

        if self.pooling_strategy:
            self.pooling_strategy_qry = self.pooling_strategy
            self.pooling_strategy_psg = self.pooling_strategy
        if self.projection_out_dim:
            self.projection_out_dim_qry = self.projection_out_dim
            self.projection_out_dim_psg = self.projection_out_dim


# ---------------------------------------------------------------------------
# Training arguments (reference: arguments.py:326-365 + finetune/arguments.py:338-474)
# Plain dataclass — consumed by our JAX train loop, not HF Trainer.
# ---------------------------------------------------------------------------
@dataclass
class TrainingArguments:
    output_dir: str = "./output"
    seed: int = 42
    # Optimizer
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    # Schedule
    lr_scheduler_type: str = "cosine"  # linear | cosine | constant
    min_lr_ratio: float = 0.0
    warmup_steps: int = 0
    warmup_ratio: float = 0.0
    max_steps: int = 1000
    # Batching
    per_device_train_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    # Logging / checkpointing
    logging_steps: int = 10
    eval_steps: int = 0
    save_steps: int = 500
    save_total_limit: Optional[int] = None
    save_only_model: bool = False
    log_file: Optional[str] = None
    # Experiment tracking (parity: HF Trainer report_to + the reference's
    # wandb/tensorboard log-key rewriter, trainer.py:46-67). 'jsonl' writes
    # to log_file; 'tensorboard' writes stock-TB event files to logging_dir.
    report_to: tuple[str, ...] = ("jsonl",)
    logging_dir: Optional[str] = None
    # Keep per-step logs as device scalars and materialize them only at
    # logging_steps. Through the axon tunnel a per-step device_get costs
    # ~30ms+ of host round trip — comparable to the whole step for small
    # models. training_step then returns jax scalars instead of floats.
    async_logging: bool = False
    # Precision
    bf16: bool = True
    # Remat (activation checkpointing; reference: gradient_checkpointing)
    gradient_checkpointing: bool = False

    # Contrastive loss
    temperature: float = 0.02
    clloss_coef: float = 1.0
    distillation: bool = False
    distill_coef: float = 1.0
    distill_temperature: float = 1.0
    loss_reduction: str = "mean"
    # Cross-device in-batch negatives. Default ON to match the reference's
    # canonical recipe (scripts/finetune_example.sh:121 passes
    # --negatives_x_device); False restricts each query's negatives to its
    # own data-shard group via local_negatives_mask (the trainer passes
    # device_group_q automatically).
    negatives_x_device: bool = True

    # Hybrid
    sparse_temperature: float = 1.0
    add_flops: bool = False
    add_vector_norm: bool = False
    norm_ord: int = 1
    q_norm_loss_factor: float = 1.0
    p_norm_loss_factor: float = 1.0

    # Regulation scheduler (reference: scheduler.py:128)
    use_reg_scheduler: bool = False
    reg_t: int = 2000
    reg_max: int = 4000
    min_reg_ratio: float = 0.0
    reg_type: str = "quadratic"  # quadratic | linear_decay | cosine_decay

    # Asymmetric distillation
    emb_den_reps_distillation: bool = False
    emb_den_scores_distillation: bool = False
    emb_reps_distill_coef: float = 1.0
    tok_den_scores_distillation: bool = False
    tok_reps_distill_coef: float = 1.0

    # MRL
    matryoshka_dims: tuple[Optional[int], ...] = (None,)
    # Per-dim loss weights aligned with matryoshka_dims (empty = all 1.0).
    # The reference sums every dim's CL loss unweighted
    # (modeling_hybrid.py:664-672); upweighting short prefixes is the lever
    # VERDICT r4 next #6 asks for to close the prefix-64 vs PCA-64 residual.
    matryoshka_weights: tuple[float, ...] = ()

    # LoRA training freezes the base trunks (parity: peft — only adapter +
    # projector params receive grads/optimizer state; the reference never
    # trains the base under LoRA, modeling_encoder.py:658-676). Disable to
    # full-finetune alongside adapters.
    lora_freeze_base: bool = True

    # GradCache-equivalent chunked rep forward (reference: trainer.py:409-462)
    grad_cache: bool = False
    gc_q_chunk_size: int = 32
    gc_p_chunk_size: int = 4
    gc_dynamic_chunking: bool = False
    gc_anchor_chunk_size: int = 4
    gc_anchor_seqlen: int = 512

    # Mesh / parallelism (TPU-native replacement of accelerate YAMLs)
    mesh_shape: tuple[int, ...] = (-1,)  # -1 => all devices on the data axis
    mesh_axis_names: tuple[str, ...] = ("data",)
    shard_params: bool = True  # FSDP-style param sharding over the data axis

    def get_warmup_steps(self) -> int:
        if self.warmup_steps > 0:
            return self.warmup_steps
        return int(self.max_steps * self.warmup_ratio)


# ---------------------------------------------------------------------------
# Inference arguments (reference: inference/arguments.py)
# ---------------------------------------------------------------------------
@dataclass
class InferenceArguments(ModelArguments):
    encode_batch_size: int = 64
    emb_bag_construct_batch_size: int = 1024
    quantization_factor: int = 100
    anserini_vector_type: str = "json"  # json | pseudo_text
    debug: bool = False  # single-chip in-process encode
    # Parameter placement for SPMD encoding (the reference's whole RPC farm
    # exists to serve an 8B doc tower across many GPUs,
    # inference/exact_search_torchrpc.py:50-101; on TPU a sharding spec does
    # the same job). "replicated" needs the full tower per chip; "fsdp"
    # shards params over the data axis (XLA all-gathers per layer);
    # "hybrid" adds tensor-parallel over the model axis. "auto" picks
    # hybrid when the mesh has a model axis >1, fsdp when params exceed
    # shard_params_threshold_bytes, else replicated.
    shard_params_inference: str = "auto"  # auto | replicated | fsdp | hybrid
    shard_params_threshold_bytes: int = 8 * 1024**3
    # Params smaller than this (elements) stay replicated under fsdp/hybrid
    shard_params_min_size: int = 2**16
    # Run the encode towers with q/k/v (and gate/up) concatenated into one
    # wide GEMM each (models/decoder.py:fuse_decoder_params) — one weight
    # stream over HBM instead of three. Checkpoints stay HF-unfused.
    fuse_projections: bool = True
    # Retrieval knobs
    retrieval_use_dense: bool = True
    retrieval_use_sparse: bool = False


# ---------------------------------------------------------------------------
# Eval arguments (reference: eval/eval_arguments.py)
# ---------------------------------------------------------------------------
@dataclass
class EvalArguments(InferenceArguments):
    benchmark_name: str = "beir"
    task_names: tuple[str, ...] = ()
    task_langs: tuple[str, ...] = ("en",)
    corpus_chunk_size: int = 100_000
    # Dense engine for EncoderModel search: any knn.py INDEX_REGISTRY key
    # (flat | sq | binary | pca | ivf | pq | hnsw | hnsw_sq). The reference
    # hardcodes FlatIP in eval_utils.py:61-67; "flat" keeps that default.
    index_type: str = "flat"
    top_k: int = 1000
    k_values: tuple[int, ...] = (1, 3, 5, 10, 100, 1000)
    fuse_weights: tuple[float, ...] = (0.7, 0.3)
    fuse_method: str = "linear"  # linear | rrf
    save_predictions: bool = False
    prediction_dir: Optional[str] = None
    # Reuse saved retrieval predictions instead of re-searching (parity:
    # eval/eval_arguments.py:64-78 pred_load_folder / overwrite_results).
    pred_load_folder: Optional[str] = None
    overwrite_results: bool = False
    # Per-task query/corpus prompt injection (parity: evaluate_mteb.py:96-100)
    add_prompt: bool = False
    prompt_type: str = "e5"
    task_type: Optional[str] = None
    output_dir: str = "./eval_results"


# ---------------------------------------------------------------------------
# Argument parsing: JSON file or kwargs (lightweight HfArgumentParser stand-in)
# ---------------------------------------------------------------------------
def parse_args_from_json(path: str, *arg_classes):
    """Parse a flat JSON dict into a tuple of dataclass instances."""
    with open(path) as f:
        raw: dict[str, Any] = json.load(f)
    out = []
    for cls in arg_classes:
        names = {f.name for f in dataclasses.fields(cls)}
        out.append(cls(**{k: _coerce(cls, k, v) for k, v in raw.items() if k in names}))
    return tuple(out)


def _coerce(cls, name: str, value: Any) -> Any:
    # JSON lists -> tuples for hashability inside jit closures
    if isinstance(value, list):
        return tuple(value)
    return value
