"""Retrieval-quality study on real natural-language data (one TPU chip).

The north-star metric (BASELINE.md / VERDICT r1 #1) is BEIR nDCG@10 /
recall@100 for all four retrieval systems + hybrid fusion. This image has no
network and no pretrained checkpoints, so the study uses the in-image
real-text benchmark (scripts/build_docstring_beir.py: ~70k natural-English
docstring passages, summary->body retrieval with BM25 hard negatives) and a
from-scratch transformer trained on the TPU through the full production
path: streaming data pipeline -> IterableTrainCollator -> ContrastiveTrainer
(bf16, distillation) -> SpmdEncoder + cached EmbeddingBag -> HybridSearch
over the full corpus -> evaluation/metrics. Systems evaluated (parity with
the reference's four + fusions, modeling_hybrid.py:91-141):

  bm25      DummyModel baseline (Lucene-style analysis, TPU impact GEMM)
  den       symmetric dense   (full encoder both sides)
  spr       symmetric sparse  (SPLADE-style max-linear-map both sides)
  emb       asymmetric dense  (doc tower full; query = EmbeddingBag lookup)
  tok       asymmetric sparse (doc tower full; query = token counts)
  den_spr / emb_tok   linear score fusion

Usage:
  python scripts/build_docstring_beir.py --out /tmp/docstring_beir
  python scripts/quality_study.py --data /tmp/docstring_beir \
      [--steps 2000] [--out /tmp/quality_out]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:  # sitecustomize pins the TPU tunnel; flip explicitly
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from lightretriever_tpu.inference.utils import ensure_device_alive

ensure_device_alive()


def build_bpe_tokenizer(texts, vocab_size: int, out_dir: str | None = None):
    """Train a real BPE tokenizer on the corpus (HF tokenizers, in-image)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<pad>", "<bos>", "<eos>", "<unk>"])
    tok.train_from_iterator(texts, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", bos_token="<bos>",
        eos_token="<eos>", unk_token="<unk>")
    if out_dir:
        fast.save_pretrained(out_dir)
    return fast


def load_jsonl(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", default="/tmp/quality_out")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--vocab", type=int, default=16384)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--hidden", type=int, default=384)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-passages", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--temperature", type=float, default=0.05,
                    help="from-scratch training wants a softer temperature "
                         "than the reference's finetune 0.02")
    ap.add_argument("--q-max", type=int, default=64)
    ap.add_argument("--p-max", type=int, default=192)
    ap.add_argument("--top-k", type=int, default=100)
    ap.add_argument("--encode-batch", type=int, default=256)
    ap.add_argument("--max-corpus", type=int, default=0, help="debug cap")
    ap.add_argument("--max-queries", type=int, default=0, help="debug cap")
    ap.add_argument("--skip-bm25", action="store_true")
    ap.add_argument("--logging-steps", type=int, default=100)
    ap.add_argument("--systems", default="all", choices=("dense", "all"),
                    help="'dense' trains the dense CL objective only (stage-1 "
                         "warm start); 'all' trains all four rep systems")
    ap.add_argument("--init-from", default=None,
                    help="load initial trunk params from a previous study's "
                         "--out dir (saved model/); projectors fresh-init")
    ap.add_argument("--skip-train", action="store_true",
                    help="evaluate --init-from weights without training")
    # --- round-3 levers (VERDICT r2 next #1) --------------------------------
    ap.add_argument("--init-trunk", default=None,
                    help="HF-layout pretrained decoder dir (lm_pretrain.py "
                         "output model/): warm-start the trunk and use ITS "
                         "tokenizer/config instead of building fresh")
    ap.add_argument("--train-file", default=None,
                    help="override train jsonl (e.g. bm25_teacher.py output "
                         "with ce_score annotations)")
    ap.add_argument("--distill", action="store_true",
                    help="enable ce_scores KL distillation (BM25 teacher)")
    ap.add_argument("--distill-coef", type=float, default=1.0)
    ap.add_argument("--distill-temp", type=float, default=4.0,
                    help="teacher/student softmax temperature for the KL "
                         "(BM25 scores span ~0-40; 4.0 keeps the softmax "
                         "informative rather than one-hot)")
    ap.add_argument("--pooling", default="lasttoken",
                    choices=("lasttoken", "mean", "mean_eos"),
                    help="dense pooling strategy for the study model")
    ap.add_argument("--clloss-coef", type=float, default=1.0)
    ap.add_argument("--mrl-dims", default=None,
                    help="comma list (e.g. 64,128,256): train with "
                         "matryoshka_dims and sweep truncated dense search "
                         "over these dims at eval (VERDICT r2 next #9)")
    ap.add_argument("--fusion-dev-frac", type=float, default=1 / 3,
                    help="fraction of queries (by id hash) used to pick the "
                         "min-max linear fusion weight; metrics reported on "
                         "the full set AND the held-out remainder")
    # --- round-4 levers (VERDICT r3 next #1/#4/#8) ---------------------------
    ap.add_argument("--seed", type=int, default=0,
                    help="data-order + fresh-init seed (the trunk warm start "
                         "is seed-independent): seed sweep for the sparse-"
                         "branch variance study")
    ap.add_argument("--tokenizer", default=None,
                    help="load the tokenizer from this dir instead of "
                         "building one on --data (cross-domain zero-shot "
                         "eval of an --init-from model)")
    ap.add_argument("--sparse-projector", default="none",
                    choices=("none", "linear"),
                    help="'linear': decouple the sparse head from the tied "
                         "embedding matrix via a trainable projector "
                         "initialized from the (pretrained) lm_head — the "
                         "reference's default (modeling_hybrid.py:879-905); "
                         "'none': sparse logits through the tied lm_head")
    ap.add_argument("--save-embs", action="store_true",
                    help="save dense corpus/query embeddings to <out>/"
                         "dense_embs.npz (MRL spectrum analysis input)")
    # --- round-5 levers (VERDICT r4 next #5/#6) -------------------------------
    ap.add_argument("--emb-distill", default="scores",
                    choices=("none", "scores", "reps", "both"),
                    help="asymmetric-dense distillation path(s): KL on the "
                         "in-batch SCORE matrices, direct REPS KL, or both "
                         "(the reference's two paths, "
                         "modeling_hybrid.py:683-708)")
    ap.add_argument("--emb-distill-coef", type=float, default=1.0)
    ap.add_argument("--tok-distill", action="store_true",
                    help="asymmetric-sparse score distillation from the "
                         "dense teacher (reference modeling_hybrid.py:710-729)")
    ap.add_argument("--tok-distill-coef", type=float, default=1.0)
    ap.add_argument("--grad-ckpt", action="store_true",
                    help="remat the encode forwards (TrainingArguments."
                         "gradient_checkpointing). Required at 164M on "
                         "v5e-1: the unchecked train step allocates 29G "
                         "of 15.75G HBM (loss-identical; ~+1/3 step time)")
    ap.add_argument("--mrl-weights", default=None,
                    help="comma list of per-dim MRL loss weights aligned "
                         "with --mrl-dims (full-dim keeps weight 1.0); e.g. "
                         "--mrl-dims 64,128 --mrl-weights 4,2")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.init_trunk:
        from lightretriever_tpu.models.hf_loader import resolve_model_dir

        args.init_trunk = resolve_model_dir(args.init_trunk)

    from lightretriever_tpu.arguments import (
        InferenceArguments,
        ModelArguments,
        TrainingArguments,
    )
    from lightretriever_tpu.evaluation.harness import evaluate_task, load_beir_dataset
    from lightretriever_tpu.inference.encode import DummyModel, SpmdEncoder
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.hybrid import HybridModel
    from lightretriever_tpu.retriever.search import HybridSearch, SparseSearch
    from lightretriever_tpu.training.data import train_dataloader
    from lightretriever_tpu.training.streaming import StreamingDomain, interleave_streams
    from lightretriever_tpu.training.data import IterableTrainCollator
    from lightretriever_tpu.training.trainer import ContrastiveTrainer

    corpus, queries, qrels = load_beir_dataset(args.data)
    if args.max_corpus:
        keep = set(list(corpus)[: args.max_corpus]) | {
            pid for rels in qrels.values() for pid in rels}
        corpus = {k: v for k, v in corpus.items() if k in keep}
    if args.max_queries:
        queries = dict(list(queries.items())[: args.max_queries])
        qrels = {q: qrels[q] for q in queries}
    print(f"eval corpus={len(corpus)} queries={len(queries)}", flush=True)

    # --- tokenizer over the real corpus (or the pretrained trunk's) ---------
    t0 = time.perf_counter()
    tok_dir = os.path.join(args.out, "tokenizer")
    if args.tokenizer:
        from transformers import PreTrainedTokenizerFast

        tok = PreTrainedTokenizerFast.from_pretrained(args.tokenizer)
        if not os.path.exists(os.path.join(tok_dir, "tokenizer.json")):
            tok.save_pretrained(tok_dir)
    elif args.init_trunk:
        from transformers import PreTrainedTokenizerFast

        tok = PreTrainedTokenizerFast.from_pretrained(args.init_trunk)
        # Downstream consumers (sparse_engine_real_check, rerank_study)
        # load the tokenizer from <out>/tokenizer — persist it there too.
        if not os.path.exists(os.path.join(tok_dir, "tokenizer.json")):
            tok.save_pretrained(tok_dir)
    else:
        if os.path.exists(os.path.join(tok_dir, "tokenizer.json")):
            from transformers import PreTrainedTokenizerFast

            tok = PreTrainedTokenizerFast.from_pretrained(tok_dir)
        else:
            tok = build_bpe_tokenizer(
                (d["title"] + " " + d["text"] for d in corpus.values()),
                args.vocab, tok_dir)
    vocab_size = len(tok)
    print(f"tokenizer: {vocab_size} tokens in {time.perf_counter()-t0:.1f}s",
          flush=True)

    # --- model ----------------------------------------------------------------
    if args.init_trunk:
        cfg = DecoderConfig.from_pretrained(args.init_trunk)
        cfg = dataclasses.replace(
            cfg, max_position_embeddings=max(
                cfg.max_position_embeddings, args.p_max, args.q_max))
    else:
        cfg = DecoderConfig(
            vocab_size=vocab_size, hidden_size=args.hidden,
            intermediate_size=args.hidden * 3, num_hidden_layers=args.layers,
            num_attention_heads=max(args.hidden // 64, 2),
            num_key_value_heads=max(args.hidden // 128, 1),
            max_position_embeddings=max(args.p_max, args.q_max),
            rms_norm_eps=1e-6, rope_theta=1e4, tie_word_embeddings=True)
    on_tpu = jax.default_backend() == "tpu"
    all_sys = args.systems == "all"
    # XLA attention: at S<=192 with a small model the Pallas kernel gains
    # nothing but costs ~130s extra compile (measured; PERFORMANCE.md).
    ma = ModelArguments(
        pooling_strategy=args.pooling,
        attn_implementation="xla",
        hybrid_use_dense_vector=True,
        hybrid_use_sparse_vector=all_sys,
        hybrid_use_emb_vector=all_sys,
        hybrid_use_token_id_vector=all_sys,
        noncontextual_query_embedding=all_sys,
        use_sparse_linear_projector=args.sparse_projector == "linear",
        sparse_use_relu=True, sparse_use_log_saturation=True,
        # SPLADE pruning (reference sparsify knobs): unpruned from-scratch
        # heads emit near-dense [V] vectors — meaningless as "sparse" reps
        # and quadratic-memory hostile to every impact engine.
        sparse_top_k_qry=64, sparse_top_k_psg=256)
    mrl_dims = (tuple(int(d) for d in args.mrl_dims.split(","))
                if args.mrl_dims else ())
    mrl_weights = (tuple(float(w) for w in args.mrl_weights.split(","))
                   if args.mrl_weights else ())
    if mrl_weights:
        assert len(mrl_weights) == len(mrl_dims), \
            "--mrl-weights must align with --mrl-dims"
        mrl_weights = (1.0,) + mrl_weights  # full-dim entry keeps weight 1
    ta = TrainingArguments(
        matryoshka_dims=(None,) + mrl_dims,
        matryoshka_weights=mrl_weights,
        output_dir=args.out, learning_rate=args.lr, max_steps=args.steps,
        warmup_steps=min(100, args.steps // 10), logging_steps=args.logging_steps,
        # Tight checkpoint cadence: the tunnel can wedge mid-run every few
        # thousand steps on a bad day (two q_proj_s1 attempts died at steps
        # 2200 and 1500, both before a steps//4=3000 first checkpoint);
        # 1000-step checkpoints cap a StepWatchdog relaunch's lost work at
        # ~2.5 min of chip.
        save_steps=min(1000, max(args.steps // 4, 500)), save_total_limit=2,
        temperature=args.temperature, bf16=on_tpu,
        clloss_coef=args.clloss_coef,
        distillation=args.distill, distill_coef=args.distill_coef,
        distill_temperature=args.distill_temp,
        gradient_checkpointing=args.grad_ckpt,
        emb_den_scores_distillation=args.emb_distill in ("scores", "both"),
        emb_den_reps_distillation=args.emb_distill in ("reps", "both"),
        emb_reps_distill_coef=args.emb_distill_coef,
        tok_den_scores_distillation=args.tok_distill,
        tok_reps_distill_coef=args.tok_distill_coef,
        async_logging=True,
        report_to=("jsonl",), log_file=os.path.join(args.out, "train_log.jsonl"))
    model = HybridModel(ma, ta, cfg, eos_token_id=tok.eos_token_id,
                        pad_token_id=tok.pad_token_id)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = model.init_params(jax.random.key(args.seed), dtype)
    if args.init_trunk:
        from lightretriever_tpu.models.hf_loader import load_decoder_params

        params["qry"] = load_decoder_params(args.init_trunk, cfg, dtype)
        print(f"warm-started trunk from pretrained {args.init_trunk}", flush=True)
        if "spr_pooler_q" in params and args.sparse_projector == "linear":
            # Re-init the decoupled sparse projector from the PRETRAINED
            # lm_head (init_params saw only the random trunk) — the
            # reference's init (modeling_hybrid.py:879-905).
            from lightretriever_tpu.models.decoder import lm_head_weight

            params["spr_pooler_q"]["kernel"] = lm_head_weight(
                params["qry"], cfg).astype(dtype)
            print("sparse projector re-initialized from pretrained lm_head",
                  flush=True)
    if args.init_from:
        # Stage-2 warm start: trunk from the stage-1 run; any params the
        # saved model lacks (e.g. sparse projectors) keep their fresh init.
        _, loaded = HybridModel.load(
            os.path.join(args.init_from, "model"), dtype=dtype,
            eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id)
        for k, v in loaded.items():
            params[k] = v
        print(f"warm-started trunk from {args.init_from}", flush=True)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params/1e6:.1f}M params, backend={jax.default_backend()}",
          flush=True)

    # --- streaming train pipeline over the real training rows ------------------
    train_path = args.train_file or os.path.join(
        args.data, "train", "docstrings.jsonl")
    stream = StreamingDomain(train_path, name="docstrings", seed=args.seed,
                             buffer_size=8192)
    col = IterableTrainCollator(
        tokenizer=tok, q_max_len=args.q_max, p_max_len=args.p_max,
        pad_to_max_length=True,  # one static shape -> exactly one compile
        train_n_passages=args.n_passages, seed=args.seed,
        emb_size=vocab_size if all_sys else None,
        noncontextual_query_embedding=all_sys)
    it = train_dataloader(
        interleave_streams({"docstrings": stream}, seed=args.seed), col,
        args.batch, workers=4)  # collation bottlenecks small models

    if args.skip_train:
        params_t = jax.device_get(params)
        train_s = 0.0
    else:
        trainer = ContrastiveTrainer(model, params, ta, train_iter=it)
        from lightretriever_tpu.training.trainer import find_last_checkpoint

        last = find_last_checkpoint(args.out)  # resume across tunnel flakes
        if last:
            print(f"resuming from {last}", flush=True)
        t0 = time.perf_counter()
        logs = trainer.train(resume_from=last)
        trainer.close()
        train_s = time.perf_counter() - t0
        print(f"train: {args.steps} steps in {train_s:.0f}s "
              f"({train_s/max(args.steps,1)*1000:.0f} ms/step), "
              f"final loss {logs.get('loss', float('nan')):.4f}", flush=True)
        params_t = jax.device_get(trainer.state.params)
        model.save(params_t, os.path.join(args.out, "model"))

    # --- evaluate all systems ----------------------------------------------------
    enc = SpmdEncoder(model, params_t, tok, args=InferenceArguments(
        encode_batch_size=args.encode_batch,
        emb_bag_construct_batch_size=1024,
        pooling_strategy="lasttoken",
        attn_implementation=ma.attn_implementation))
    if all_sys:
        t0 = time.perf_counter()
        enc.cache_emb_bag()
        print(f"emb_bag: built [{vocab_size}, d] in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
    hs = HybridSearch(enc, vocab_size=vocab_size, return_all_results=True,
                      batch_size=args.encode_batch)
    t0 = time.perf_counter()
    out = evaluate_task(hs, corpus, queries, qrels, top_k=args.top_k,
                        k_values=(1, 3, 5, 10, 100))
    print(f"hybrid search+eval in {time.perf_counter()-t0:.0f}s", flush=True)
    metrics = {name: m for name, m in out["metrics"].items()}

    if not args.skip_bm25:
        t0 = time.perf_counter()
        bm25 = SparseSearch(model=DummyModel(), bm25=True)
        out_bm = evaluate_task(bm25, corpus, queries, qrels, top_k=args.top_k,
                               k_values=(1, 3, 5, 10, 100))
        metrics["bm25"] = out_bm["metrics"]
        print(f"bm25 in {time.perf_counter()-t0:.0f}s", flush=True)
        # Neural+lexical fusion. Reference default is min-max LINEAR
        # [0.7, 0.3] (eval_arguments.py:48, score_fuse_utils.py:48-91);
        # round 2 used rank-RRF here, which drags a strong system toward a
        # weak one (VERDICT r2 weak #4). Protocol: sweep the linear weight
        # on a dev split (query-id hash), apply the best weight to all
        # queries, report full-set + held-out metrics; keep the RRF row and
        # the reference-default [0.7,0.3] row for comparison.
        import hashlib

        from lightretriever_tpu.evaluation.harness import _score
        from lightretriever_tpu.retriever.fusion import fuse

        def _is_dev(qid):
            h = int(hashlib.sha1(str(qid).encode()).hexdigest(), 16)
            return (h % 1000) < args.fusion_dev_frac * 1000

        dev_q = {q for q in queries if _is_dev(q)}
        hold_q = set(queries) - dev_q
        sub = lambda res, qs: {q: r for q, r in res.items() if q in qs}
        neural = out["results"]
        fusion_sweep = {}
        if isinstance(neural, dict):
            # Sweep the fused neural systems too: den_spr+BM25 stacks the
            # strongest neural ranker on the lexical one (3-way in effect).
            for name in ("den", "emb", "spr", "tok", "den_spr", "emb_tok"):
                if name not in neural:
                    continue
                best_w, best_ndcg = None, -1.0
                for w in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9):
                    fused = fuse([sub(neural[name], dev_q),
                                  sub(out_bm["results"], dev_q)],
                                 weights=[w, 1.0 - w])
                    nd = _score({q: qrels[q] for q in dev_q}, fused,
                                (10,))["NDCG@10"]
                    fusion_sweep[f"{name}_w{w}"] = round(nd, 4)
                    if nd > best_ndcg:
                        best_w, best_ndcg = w, nd
                fused_all = fuse([neural[name], out_bm["results"]],
                                 weights=[best_w, 1.0 - best_w])
                m_all = _score(qrels, fused_all, (1, 3, 5, 10, 100))
                m_hold = _score({q: qrels[q] for q in hold_q},
                                sub(fused_all, hold_q), (10, 100))
                m_all["NDCG@10_holdout"] = m_hold["NDCG@10"]
                m_all["Recall@100_holdout"] = m_hold["Recall@100"]
                m_all["best_w"] = best_w
                metrics[f"{name}_bm25_lin"] = m_all
                # reference-default weights + RRF comparison rows
                metrics[f"{name}_bm25_lin70"] = _score(
                    qrels, fuse([neural[name], out_bm["results"]],
                                weights=[0.7, 0.3]), (1, 3, 5, 10, 100))
                metrics[f"{name}_bm25_rrf"] = _score(
                    qrels, fuse([neural[name], out_bm["results"]],
                                method="rrf"), (1, 3, 5, 10, 100))

    # --- MRL truncated-search sweep (VERDICT r2 next #9) --------------------
    mrl_sweep = {}
    spectrum = {}
    if mrl_dims or args.save_embs:
        from lightretriever_tpu.evaluation.harness import _score
        from lightretriever_tpu.retriever.knn import FlatIPIndex

        ids = list(corpus)
        c_emb = np.asarray(enc.encode_corpus(
            [corpus[i] for i in ids],
            batch_size=args.encode_batch)["dense_reps"], np.float32)
        qids = list(queries)
        q_emb = np.asarray(enc.encode_queries(
            [queries[i] for i in qids],
            batch_size=args.encode_batch)["dense_reps"], np.float32)
        if args.save_embs:
            np.savez_compressed(
                os.path.join(args.out, "dense_embs.npz"),
                corpus=c_emb, queries=q_emb,
                corpus_ids=np.array(ids), query_ids=np.array(qids))
            print(f"saved dense embeddings {c_emb.shape}/{q_emb.shape}",
                  flush=True)
        # Embedding-spectrum analysis (VERDICT r3 next #4): does dim-64 ~
        # dim-full come from MRL training or from a low effective rank?
        # (a) singular spectrum of the centered corpus matrix -> effective
        # rank (participation ratio of eigenvalues); (b) MRL slices are
        # COORDINATE prefixes, so also report the variance fraction the
        # first-d coordinates carry at each swept dim.
        sample = c_emb[
            np.random.default_rng(0).permutation(len(c_emb))[:8192]]
        sv = np.linalg.svd(sample - sample.mean(0), compute_uv=False)
        lam = sv ** 2
        spectrum = {
            "participation_ratio": float(lam.sum() ** 2 / (lam ** 2).sum()),
            "rank90": int(np.searchsorted(
                np.cumsum(lam) / lam.sum(), 0.90) + 1),
            "rank99": int(np.searchsorted(
                np.cumsum(lam) / lam.sum(), 0.99) + 1),
            "top_singular_values": [round(float(s), 2) for s in sv[:16]],
        }
        var = (c_emb - c_emb.mean(0)).var(0)
        for d in mrl_dims:
            spectrum[f"coord_var_frac@{d}"] = round(
                float(var[:d].sum() / var.sum()), 4)
        print(f"spectrum: PR={spectrum['participation_ratio']:.1f} "
              f"rank90={spectrum['rank90']} rank99={spectrum['rank99']} "
              f"of d={c_emb.shape[1]}", flush=True)
    if mrl_dims:
        idx = FlatIPIndex()
        idx.add(c_emb)
        # One resident full-dim index; every truncated search is a zero-copy
        # slice + renormalized scoring (knn.py FlatIPIndex.search dim=).
        for d in (None,) + mrl_dims:
            s, i = idx.search(q_emb, args.top_k, dim=d)
            res = {qid: {ids[j]: float(sv) for j, sv in zip(ri, rs) if j >= 0}
                   for qid, ri, rs in zip(qids, i, s)}
            mrl_sweep[str(d or c_emb.shape[1])] = _score(
                qrels, res, (10, 100))
        print("\n| MRL dim | NDCG@10 | Recall@100 |")
        print("|---|---|---|")
        for d, m in mrl_sweep.items():
            print(f"| {d} | {m['NDCG@10']:.4f} | {m['Recall@100']:.4f} |")

    # --- persist raw per-system predictions for offline fusion studies ----------
    try:
        import gzip

        preds = dict(out["results"]) if isinstance(out["results"], dict) else {}
        if not args.skip_bm25:
            preds["bm25"] = out_bm["results"]
        with gzip.open(os.path.join(args.out, "predictions.json.gz"),
                       "wt") as f:
            json.dump(preds, f)
    except Exception as e:  # predictions are a bonus artifact, never fatal
        print(f"prediction save skipped: {e}", flush=True)

    # --- report -----------------------------------------------------------------
    order = ["bm25", "den", "spr", "emb", "tok", "den_spr", "emb_tok"]
    for name in ("den", "emb", "spr", "tok", "den_spr", "emb_tok"):
        order += [f"{name}_bm25_lin", f"{name}_bm25_lin70", f"{name}_bm25_rrf"]
    print("\n| System | NDCG@10 | Recall@100 | NDCG@1 | MRR@10 |")
    print("|---|---|---|---|---|")
    table = {}
    for name in order:
        if name not in metrics:
            continue
        m = metrics[name]
        table[name] = {k: round(m[k], 4) for k in
                       ("NDCG@10", "Recall@100", "NDCG@1", "MRR@10") if k in m}
        print(f"| {name} | {m.get('NDCG@10', 0):.4f} | {m.get('Recall@100', 0):.4f} "
              f"| {m.get('NDCG@1', 0):.4f} | {m.get('MRR@10', 0):.4f} |")
    summary = {
        "corpus": len(corpus), "queries": len(queries), "steps": args.steps,
        "params_m": round(n_params / 1e6, 1), "backend": jax.default_backend(),
        "train_s": round(train_s, 1), "metrics": table,
        "pooling": args.pooling, "distill": bool(args.distill),
        "init_trunk": args.init_trunk,
    }
    summary["seed"] = args.seed
    summary["sparse_projector"] = args.sparse_projector
    summary["emb_distill"] = args.emb_distill
    summary["emb_distill_coef"] = args.emb_distill_coef
    summary["tok_distill"] = bool(args.tok_distill)
    if mrl_weights:
        summary["mrl_weights"] = list(mrl_weights)
    if mrl_sweep:
        summary["mrl_sweep"] = mrl_sweep
    if spectrum:
        summary["spectrum"] = spectrum
    if not args.skip_bm25 and "fusion_sweep" in dir():
        summary["fusion_sweep"] = fusion_sweep
        summary["holdout"] = {
            n: {"NDCG@10": metrics[n].get("NDCG@10_holdout"),
                "best_w": metrics[n].get("best_w")}
            for n in metrics if n.endswith("_bm25_lin")}
    with open(os.path.join(args.out, "quality_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
