#!/bin/bash
# Round-5 chain, session-3 final tail (fresh file: never edit a script a live
# chain is executing). Differences vs r5c_chain.sh, forced by the wall clock:
#
#   - q_big runs 8000 steps instead of 12000. At 164M the measured step cost
#     is 2.10x the 91M arm (lm_pretrain: 193.0 vs 91.7 ms/step), so 12000
#     steps (~2.3h) + 164M eval (~45min) cannot land before the round closes;
#     a mid-cosine kill + --skip-train eval would score an un-annealed model.
#     8000 steps with a COMPLETE cosine schedule is the honest alternative —
#     it biases the comparison AGAINST the 164M arm (0.67x the 91M arm's
#     optimization steps), which only strengthens a positive scale result.
#     The step count is recorded in the summary and must be stated wherever
#     q_big numbers are quoted.
#   - rr_big / q_asym / q_mrl_w / tails kept for completeness; they only run
#     if the round is longer than projected.
#
# Usage: setsid nohup bash scripts/r5d_chain.sh > /tmp/r5b_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
A=${1:-.artifacts}
R=results
W="bash scripts/with_tpu.sh"
TRAIN="$A/docstring_beir/train/docstrings_bm25.jsonl"
RRLR=${RRLR:-3e-4}
mkdir -p "$A" "$R"
echo $$ > /tmp/chain.pid

stage() { # stage <name> <cmd...>
  local name=$1; shift
  if [ -f "$A/.done_$name" ]; then echo "[r5d] $name: done, skipping"; return 0; fi
  echo "[r5d] $name: start $(date -u +%H:%M:%S)"
  "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then echo "[r5d] $name FAILED rc=$rc"; exit $rc; fi
  touch "$A/.done_$name"
  echo "[r5d] $name: ok $(date -u +%H:%M:%S)"
}

publish() { # publish <src_json> <dst_name>  (idempotent)
  [ -f "$1" ] && cp "$1" "$R/$2" && echo "[r5d] published $R/$2"
}

ckpt_commit() { # ckpt_commit <msg> <paths...>  (never fails the chain)
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    if git add -A "$@" 2>/dev/null && \
       { git diff --cached --quiet || git commit -q -m "$msg"; }; then
      echo "[r5d] committed: $msg"; return 0
    fi
    sleep 7   # index.lock race with an interactive session commit
  done
  echo "[r5d] WARN: commit failed ($msg)"; return 0
}

bank() { # bank <stage>  (bank_finished + commit; never fails the chain)
  bash scripts/bank_finished.sh "$1" "$A" || return 0
  ckpt_commit "bank $1 (round-5 chain)" "banked/$1" "$R"
}

# --- 164M scale arm (#2): pretrain + 8000-step full-anneal retriever ----------
stage big_pt $W python scripts/lm_pretrain.py --data "$A/pretrain_corpus.jsonl" \
  --extra-corpus "$A/docstring_beir/corpus.jsonl" --out "$A/lm_pt_big" \
  --hidden 896 --layers 14 --heads 14 --kv-heads 7 --intermediate 2688 \
  --steps 24000
bank lm_pt_big

stage q_big $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_big" --init-trunk "$A/lm_pt_big" --distill --train-file "$TRAIN" \
  --steps 8000 --seed 0 --sparse-projector linear --grad-ckpt
publish "$A/q_big/quality_summary.json" q_big_quality_summary.json
bank q_big

# --- serve-distribution mining for the NEURAL deployment (#4) -----------------
stage mine_neural $W python scripts/mine_neural_negatives.py \
  --stage "$A/q_proj" --data "$A/docstring_beir" --train-file "$TRAIN" \
  --out "$A/neural_mined.jsonl" --depth 100
ckpt_commit "neural serve-distribution mining meta" "$R"

# distill-temp 0.4: the mined ce_scores live on the fused min-max [0,1]
# scale (vs raw ~[5,25] BM25 in rr_mined); at the default t=4 the teacher
# softmax over 8 passages is near-uniform and the KL carries no signal.
stage rr_neural $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_neural" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --distill --distill-temp 0.4 --n-passages 8 --steps 8000 --lr "$RRLR" \
  --train-file "$A/neural_mined.jsonl" --first-k-list 10,25,50,100 \
  --rerank-predictions "$A/q_proj/predictions.json.gz" \
  --rerank-systems den,den_spr,emb_tok
publish "$A/rr_neural/rerank_summary.json" rr_neural_summary.json
bank rr_neural

# --- flagship asymmetric pair: asym-distill sweep on the proj recipe (#5) -----
stage q_asym $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_asym" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --sparse-projector linear \
  --emb-distill both --emb-distill-coef 2.0 --tok-distill --tok-distill-coef 2.0
publish "$A/q_asym/quality_summary.json" q_asym_quality_summary.json
bank q_asym

# --- per-dim MRL weights targeting the dim-64 residual (#6) -------------------
stage q_mrl_w $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_mrl_w" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --systems dense --mrl-dims 64,128,256,384,512 \
  --mrl-weights 4.0,2.0,1.0,1.0,1.0 --save-embs
publish "$A/q_mrl_w/quality_summary.json" q_mrl_w_quality_summary.json
bank q_mrl_w

# --- 164M rerank arm (deferred behind the cheaper VERDICT items) --------------
stage rr_big $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_big" --init-trunk "$A/q_big" --tokenizer "$A/q_big/tokenizer" \
  --distill --n-passages 8 --steps 8000 --lr "$RRLR" --train-file "$TRAIN" \
  --mine-negatives-depth 100 --first-k-list 10,25,50,100 \
  --rerank-predictions "$A/q_big/predictions.json.gz"
publish "$A/rr_big/rerank_summary.json" rr_big_summary.json
bank rr_big

# --- tails: third tied-head seed + rerank ablation grid ------------------------
stage q_s2 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_s2" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 2
publish "$A/q_s2/quality_summary.json" q_s2_quality_summary.json
bank q_s2

stage rr_np16 $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_np16" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --distill --n-passages 16 --batch 8 --steps 8000 --lr "$RRLR" \
  --train-file "$TRAIN" --first-k-list 10,25,50,100
publish "$A/rr_np16/rerank_summary.json" rr_np16_summary.json

stage rr_dw $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_dw" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --distill --distill-coef 0.3 --n-passages 8 --steps 8000 --lr "$RRLR" \
  --train-file "$TRAIN" --first-k-list 10,25,50,100
publish "$A/rr_dw/rerank_summary.json" rr_dw_summary.json
ckpt_commit "results: rerank ablation grid tails" "$R"

echo "[r5d] all stages complete $(date -u +%H:%M:%S)"
