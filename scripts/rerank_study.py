"""Reranker quality study on the real-text docstring benchmark (one chip).

Trains a from-scratch CrossEncoder on the docstring train rows (listwise CE
over [pos, BM25-hard-negs] groups — the reference recipe, rerank/modeling.py
:148-166) and measures the nDCG@10 / MRR@10 uplift from reranking the BM25
first stage on the held-out queries. This is the production rerank path end
to end: RerankTrainCollator -> RerankTrainer -> RerankerEncoder.predict.

Usage:
  python scripts/rerank_study.py --data /tmp/docstring_beir \
      --tokenizer /tmp/q_s1/tokenizer [--steps 3000] [--first-k 50]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from lightretriever_tpu.inference.utils import ensure_device_alive

ensure_device_alive()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--tokenizer", default=None,
                    help="tokenizer dir (optional when --init-trunk is set)")
    ap.add_argument("--out", default="/tmp/rerank_out")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-passages", type=int, default=4)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--max-len", type=int, default=256)
    ap.add_argument("--first-k", type=int, default=50)
    ap.add_argument("--first-k-list", default=None,
                    help="comma list of rerank depths (e.g. 50,100): rerank "
                         "once at the max depth, report metrics at every "
                         "prefix depth (VERDICT r3 next #5 depth ablation). "
                         "Overrides --first-k")
    ap.add_argument("--max-queries", type=int, default=500)
    ap.add_argument("--logging-steps", type=int, default=200)
    ap.add_argument("--easy-negatives", action="store_true",
                    help="replace BM25 hard negatives with random corpus "
                         "docs (from-scratch curriculum: hard negatives are "
                         "unlearnable from random init)")
    ap.add_argument("--easy-steps", type=int, default=0,
                    help="curriculum: first N steps with random negatives, "
                         "remaining steps with the mined BM25 hard negatives")
    ap.add_argument("--mine-negatives-depth", type=int, default=0,
                    help="train/serve distribution match (VERDICT r3 next "
                         "#5): replace each group's file negatives with "
                         "candidates drawn uniformly from the live BM25 "
                         "top-N over the full corpus — the exact candidate "
                         "population the CE reranks at serve time (the file "
                         "negatives are the top-12 hardest, so the CE never "
                         "sees the easy tail it must also order)")
    # --- round-3 levers (VERDICT r2 next #3) --------------------------------
    ap.add_argument("--init-trunk", default=None,
                    help="HF-layout pretrained decoder dir (lm_pretrain.py "
                         "output): warm-start the CE backbone and use ITS "
                         "config/tokenizer (overrides --layers/--hidden)")
    ap.add_argument("--train-file", default=None,
                    help="override train jsonl (bm25_teacher.py output with "
                         "ce_score annotations for --distill)")
    ap.add_argument("--distill", action="store_true",
                    help="listwise KL from BM25 teacher ce_scores onto the "
                         "CE logits")
    ap.add_argument("--distill-coef", type=float, default=1.0)
    ap.add_argument("--distill-temp", type=float, default=4.0)
    ap.add_argument("--rerank-predictions", default="auto",
                    help="predictions.json.gz saved by quality_study: rerank "
                         "these neural first stages too (the fully neural "
                         "retrieve+rerank stack vs BM25). 'auto' = look next "
                         "to --init-trunk; '' disables")
    ap.add_argument("--rerank-systems", default="den,den_spr",
                    help="comma list of systems from --rerank-predictions to "
                         "use as first stages")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training: load the last checkpoint under "
                         "--out and run the eval sections (rerank a new "
                         "first stage with an already-trained CE)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from transformers import PreTrainedTokenizerFast

    from lightretriever_tpu.arguments import ModelArguments, TrainingArguments
    from lightretriever_tpu.evaluation.harness import load_beir_dataset
    from lightretriever_tpu.evaluation.metrics import evaluate_retrieval, mrr_at_k
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.rerank.data_utils import RerankTrainCollator
    from lightretriever_tpu.rerank.inference import RerankerEncoder
    from lightretriever_tpu.rerank.modeling import CrossEncoder
    from lightretriever_tpu.rerank.trainer import RerankTrainer
    from lightretriever_tpu.retriever.sparse_scorer import BM25Index
    from lightretriever_tpu.training.data import train_dataloader
    from lightretriever_tpu.training.streaming import StreamingDomain, interleave_streams

    assert args.tokenizer or args.init_trunk, \
        "pass --tokenizer (or --init-trunk, whose tokenizer is used)"
    if args.init_trunk:
        from lightretriever_tpu.models.hf_loader import resolve_model_dir

        args.init_trunk = resolve_model_dir(args.init_trunk)
    tok = PreTrainedTokenizerFast.from_pretrained(
        args.tokenizer or args.init_trunk)
    on_tpu = jax.default_backend() == "tpu"
    corpus, queries, qrels = load_beir_dataset(args.data)
    if args.max_queries:
        queries = dict(list(queries.items())[: args.max_queries])
        qrels = {q: qrels[q] for q in queries}

    if args.init_trunk:
        import dataclasses

        tok = PreTrainedTokenizerFast.from_pretrained(
            args.tokenizer or args.init_trunk)
        cfg = DecoderConfig.from_pretrained(args.init_trunk)
        cfg = dataclasses.replace(cfg, max_position_embeddings=max(
            cfg.max_position_embeddings, args.max_len))
    else:
        cfg = DecoderConfig(
            vocab_size=len(tok), hidden_size=args.hidden,
            intermediate_size=args.hidden * 3, num_hidden_layers=args.layers,
            num_attention_heads=max(args.hidden // 64, 2),
            num_key_value_heads=max(args.hidden // 128, 1),
            max_position_embeddings=args.max_len, tie_word_embeddings=True)
    ma = ModelArguments(pooling_strategy="lasttoken", attn_implementation="xla")
    ta = TrainingArguments(
        output_dir=args.out, learning_rate=args.lr, max_steps=args.steps,
        warmup_steps=min(100, args.steps // 10),
        logging_steps=args.logging_steps, temperature=1.0,
        # Checkpoint + auto-resume across tunnel flakes (with_tpu.sh
        # relaunches the whole script; without this an 8k-step train
        # restarts from zero on every wedge).
        save_steps=max(args.steps // 4, 500), save_total_limit=2,
        distillation=args.distill, distill_coef=args.distill_coef,
        distill_temperature=args.distill_temp,
        # B*n_psg pair batches of a >=640-hidden trunk OOM v5e HBM (18G>15.75G
        # of layer-stacked [L,B*n,S,H] saves) without remat; recompute is
        # cheap next to the CE matmuls.
        gradient_checkpointing=True,
        bf16=on_tpu, async_logging=True, report_to=("jsonl",),
        log_file=os.path.join(args.out, "train_log.jsonl"))
    model = CrossEncoder(ma, ta, cfg, train_n_passages=args.n_passages,
                         eos_token_id=tok.eos_token_id)
    params = model.init_params(jax.random.key(0))
    if args.init_trunk:
        from lightretriever_tpu.models.hf_loader import load_decoder_params

        params["lm"] = load_decoder_params(args.init_trunk, cfg, jnp.float32)
        print(f"warm-started CE backbone from {args.init_trunk}", flush=True)
    if on_tpu:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)

    train_path = args.train_file or os.path.join(
        args.data, "train", "docstrings.jsonl")
    stream = StreamingDomain(train_path,
                             name="docstrings", seed=0, buffer_size=8192)
    examples = interleave_streams({"d": stream}, seed=0)
    if args.easy_negatives or args.easy_steps:
        import random as _random
        from itertools import islice

        pool = [corpus[pid] for pid in list(corpus)[:20000]]
        rng = _random.Random(0)

        def _easy(src):
            for g in src:
                g = dict(g)
                g["negative_passages"] = rng.sample(pool, args.n_passages - 1)
                yield g

        if args.easy_steps:
            # Curriculum: random negatives first, mined hard negatives after
            hard = interleave_streams(
                {"d": StreamingDomain(stream.path, name="docstrings",
                                      seed=1, buffer_size=8192)}, seed=1)
            from itertools import chain

            examples = chain(
                islice(_easy(examples), args.easy_steps * args.batch), hard)
        else:
            examples = _easy(examples)
    if args.mine_negatives_depth:
        # Serve-distribution negatives: BM25 top-N over the full corpus for
        # each train query (batched searches, cached across stream cycles);
        # the collator then samples train_n_passages-1 uniformly from the
        # candidate list, so the CE trains on the same easy-to-hard mix it
        # must order at serve time. ce_score for --distill is the live BM25
        # score (the identical scorer the serve-time first stage uses).
        mine_idx = BM25Index()
        ids_m = list(corpus)
        mine_idx.add([corpus[pid]["title"] + " " + corpus[pid]["text"]
                      for pid in ids_m])
        mine_cache: dict[str, list] = {}

        def _mined(src, depth=args.mine_negatives_depth, chunk=128):
            pend = []

            def flush():
                todo = [g for g in pend if g["query"] not in mine_cache]
                if todo:
                    sc, ix = mine_idx.search([g["query"] for g in todo], depth)
                    sc, ix = np.asarray(sc), np.asarray(ix)
                    # search returns integer-quantized impact dots (x100 the
                    # float BM25 the teacher file's ce_score uses) — unscale
                    # so positives and mined negatives share one scale.
                    qf = float(mine_idx.quantization_factor)
                    for g, row_s, row_i in zip(todo, sc, ix):
                        mine_cache[g["query"]] = [
                            (ids_m[j], float(s) / qf)
                            for j, s in zip(row_i, row_s) if j >= 0]
                for g in pend:
                    pos_texts = {p["text"] for p in g["positive_passages"]}
                    negs = [{**corpus[pid], "ce_score": s}
                            for pid, s in mine_cache[g["query"]]
                            if corpus[pid]["text"] not in pos_texts]
                    if negs:
                        g = dict(g)
                        g["negative_passages"] = negs
                    yield g
                pend.clear()

            for g in src:
                pend.append(g)
                if len(pend) >= chunk:
                    yield from flush()
            yield from flush()

        examples = _mined(examples)
    col = RerankTrainCollator(tokenizer=tok, max_len=args.max_len,
                              train_n_passages=args.n_passages, seed=0)
    raw_it = train_dataloader(examples, col, args.batch, workers=4)
    it = ({"pairs": b} for b in raw_it)  # RerankTrainer batch contract
    trainer = RerankTrainer(model, params, ta, train_iter=it)
    from lightretriever_tpu.training.trainer import find_last_checkpoint

    last = find_last_checkpoint(args.out)
    if last:
        print(f"resuming from {last}", flush=True)
    t0 = time.perf_counter()
    if args.eval_only:
        # Re-evaluate a finished run (e.g. against a NEW --rerank-predictions
        # first stage) without the train-stream fast-forward: load the final
        # checkpoint, or fall back to the HF-layout <out>/model save (the
        # form banked/ keeps across rounds — no optimizer state needed for
        # eval), and skip straight to the eval sections.
        mdir = os.path.join(args.out, "model")
        if last:
            trainer.load_checkpoint(last)
            params_t = jax.device_get(trainer.state.params)
            print(f"eval-only: loaded {last}", flush=True)
        else:
            assert os.path.isdir(mdir), \
                "--eval-only needs a checkpoint or saved model/ under --out"
            from lightretriever_tpu.models.hf_loader import load_decoder_params

            params_t = dict(params)
            params_t["lm"] = load_decoder_params(mdir, cfg, jnp.float32)
            head = np.load(os.path.join(mdir, "score_head.npy"))
            if head.dtype.kind == "V":  # raw bf16 from older saves
                import ml_dtypes

                head = head.view(ml_dtypes.bfloat16).astype(np.float32)
            params_t["score"] = {"kernel": jnp.asarray(head)}
            print(f"eval-only: loaded {mdir}", flush=True)
        logs = {}
    else:
        logs = trainer.train(resume_from=last)
        params_t = jax.device_get(trainer.state.params)
    trainer.close()
    print(f"train: {args.steps} steps in {time.perf_counter()-t0:.0f}s, "
          f"final loss {logs.get('loss', float('nan')):.4f}", flush=True)
    model.save(params_t, os.path.join(args.out, "model"))
    tok.save_pretrained(os.path.join(args.out, "model"))

    # --- in-distribution check: held-out groups at train layout -------------
    # Separates "didn't learn" from "didn't transfer to top-k reranking":
    # accuracy of ranking the positive first among train_n_passages
    # candidates on 200 UNSEEN training-file groups.
    from itertools import islice

    held = list(islice(interleave_streams(
        {"d": StreamingDomain(train_path, name="docstrings", seed=99,
                              buffer_size=4096)}, seed=99), 200))
    hcol = RerankTrainCollator(tokenizer=tok, max_len=args.max_len,
                               train_n_passages=args.n_passages, seed=7)
    hbatch = hcol(held)
    import jax.numpy as _jnp

    hscores = np.asarray(jax.device_get(
        jax.jit(lambda p, b: model.score(p, b))(
            params_t,
            {k: _jnp.asarray(v) for k, v in hbatch.items()
             if k != "ce_scores"})), np.float32)
    hs = hscores.reshape(-1, args.n_passages)
    in_dist_acc = float((hs.argmax(1) == 0).mean())
    print(f"in-distribution: P(pos ranked 1st of {args.n_passages}) = "
          f"{in_dist_acc:.3f} on 200 held-out groups", flush=True)

    # --- first stage: BM25 top-k -------------------------------------------
    k_list = ([int(k) for k in args.first_k_list.split(",")]
              if args.first_k_list else [args.first_k])
    args.first_k = max(k_list)
    bm25 = BM25Index()
    ids = list(corpus)
    bm25.add([corpus[pid]["title"] + " " + corpus[pid]["text"] for pid in ids])
    qids = list(queries)
    t0 = time.perf_counter()
    scores, idx = bm25.search([queries[q] for q in qids], args.first_k)
    idx = np.asarray(idx)
    scores = np.asarray(scores)
    first = {qid: {ids[j]: float(s) for j, s in zip(row_i, row_s) if j >= 0}
             for qid, row_i, row_s in zip(qids, idx, scores)}
    print(f"bm25 first stage in {time.perf_counter()-t0:.0f}s", flush=True)

    # --- rerank --------------------------------------------------------------
    enc = RerankerEncoder(model, params_t, tok, batch_size=64,
                          max_len=args.max_len)

    def _rerank(first_stage):
        """Rerank a {qid: {pid: score}} run with the trained CE."""
        pairs, owners = [], []
        for qid in qids:
            for pid in first_stage.get(qid, {}):
                pairs.append((queries[qid], corpus[pid]))
                owners.append((qid, pid))
        t0 = time.perf_counter()
        rr = enc.predict(pairs)
        t_rr = time.perf_counter() - t0
        out: dict[str, dict[str, float]] = {qid: {} for qid in qids}
        for (qid, pid), s in zip(owners, rr):
            out[qid][pid] = float(s)
        print(f"reranked {len(pairs)} pairs in {t_rr:.0f}s "
              f"({len(pairs)/max(t_rr,1e-9):.0f} pairs/s)", flush=True)
        return out, len(pairs) / max(t_rr, 1e-9)

    reranked, pairs_per_s = _rerank(first)

    def score(results):
        m = evaluate_retrieval(qrels, results, k_values=[1, 10])
        m.update(mrr_at_k(qrels, results, [10]))
        return {k: round(m[k], 4) for k in ("NDCG@10", "NDCG@1", "MRR@10")}

    # Diagnostics: per-query Spearman(CE, BM25) — low correlation with a
    # BM25-distilled CE means train->predict mismatch, not weak learning —
    # and a random-shuffle floor to calibrate "barely above random".
    from scipy.stats import spearmanr

    cors = []
    for qid in qids:
        pids = list(first[qid])
        if len(pids) < 3:
            continue
        bm = [first[qid][p] for p in pids]
        ce = [reranked[qid][p] for p in pids]
        r = spearmanr(bm, ce).statistic
        if np.isfinite(r):
            cors.append(r)
    rng = np.random.default_rng(0)
    shuffled = {qid: {pid: float(rng.random()) for pid in first[qid]}
                for qid in qids}

    # CE scores REPLACE the first-stage order (the reference's offline
    # rerank contract, rerank/__main__.py:191-211) — plus a fused row:
    # min-max linear CE+first-stage (0.5/0.5, the retriever's fusion
    # family) which guards against CE overconfidence on the easy tail of
    # deep candidate lists (the train/serve candidate-distribution
    # mismatch VERDICT r3 next #5 asks to diagnose).
    from lightretriever_tpu.retriever.fusion import fuse_scores_linear

    before, after = score(first), score(reranked)
    fused_all = fuse_scores_linear([first, reranked], weights=(0.5, 0.5))
    depth_rows = {}
    if len(k_list) > 1:
        for k in sorted(k_list):
            topk = {qid: dict(sorted(first[qid].items(),
                                     key=lambda kv: -kv[1])[:k])
                    for qid in qids}
            rr_k = {qid: {pid: reranked[qid][pid] for pid in topk[qid]}
                    for qid in qids}
            fu_k = fuse_scores_linear([topk, rr_k], weights=(0.5, 0.5))
            depth_rows[str(k)] = {"first": score(topk),
                                  "reranked": score(rr_k),
                                  "reranked_fused": score(fu_k)}
            print(f"depth {k}: first {depth_rows[str(k)]['first']} -> "
                  f"reranked {depth_rows[str(k)]['reranked']} / fused "
                  f"{depth_rows[str(k)]['reranked_fused']}", flush=True)
    out = {"first_stage_bm25": before, "reranked": after,
           "reranked_fused": score(fused_all),
           **({"depth_ablation": depth_rows} if depth_rows else {}),
           "random_shuffle_floor": score(shuffled),
           "spearman_ce_vs_bm25_median": round(float(np.median(cors)), 4),
           "in_distribution_top1_acc": round(in_dist_acc, 4),
           "queries": len(qids), "first_k": args.first_k,
           "pairs_per_s": round(pairs_per_s, 1)}

    # --- neural first stages (fully neural retrieve+rerank vs BM25) ---------
    pred_path = args.rerank_predictions
    if pred_path == "auto":
        pred_path = (os.path.join(os.path.dirname(args.init_trunk or ""),
                                  "predictions.json.gz")
                     if args.init_trunk else "")
        # resolve_model_dir may have descended into .../model
        if pred_path and not os.path.exists(pred_path):
            alt = os.path.join(args.init_trunk or "", "predictions.json.gz")
            pred_path = alt if os.path.exists(alt) else ""
    if pred_path and os.path.exists(pred_path) and args.rerank_systems:
        import gzip

        with gzip.open(pred_path, "rt") as f:
            preds = json.load(f)
        out["neural_first_stages"] = {}
        for name in args.rerank_systems.split(","):
            name = name.strip()
            if not name or name not in preds:
                continue
            run = {qid: dict(sorted(preds[name].get(qid, {}).items(),
                                    key=lambda kv: -kv[1])[: args.first_k])
                   for qid in qids}
            rr_run, _ = _rerank(run)
            out["neural_first_stages"][name] = {
                "first": score(run), "reranked": score(rr_run),
                "reranked_fused": score(fuse_scores_linear(
                    [run, rr_run], weights=(0.5, 0.5)))}
            print(f"[{name}] first {out['neural_first_stages'][name]['first']}"
                  f" -> reranked "
                  f"{out['neural_first_stages'][name]['reranked']}", flush=True)
    elif args.rerank_predictions:
        print(f"no first-stage predictions at {pred_path!r}; skipping "
              "neural-first-stage rerank rows", flush=True)
    print(json.dumps(out, indent=2))
    with open(os.path.join(args.out, "rerank_summary.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
