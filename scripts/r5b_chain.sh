#!/bin/bash
# Round-5 FINAL chain — supersedes r5_chain.sh with the VERDICT-r4 priority
# order (a fresh file: a bash script must never be edited while a live chain
# executes it — bash reads by byte offset). Ordering, per VERDICT "Next
# round" items:
#   0. speedup_r5   (#7, ~5 min)  measured asym query-encode device table
#   1. q_proj_s1    (#1, ~1.5h)   seed-1 replication of the projector headline
#   2. pooled_sig   (#1, CPU)     pooled paired bootstrap -> recipe-level claim
#   3. cheader_ft   (#3, ~35min)  second-domain fine-tuned column
#   4. rr_proj_s1   (#1, ~20min)  eval-only retrieve+rerank on the seed-1 stage
#   5. big_pt/q_big/rr_big (#2, ~4h) the twice-deferred 164M scale arm, FIRST
#      after the short closers (VERDICT: "budget it FIRST, not in the tail")
#   6. mine_neural + rr_neural (#4) CE trained on den_spr-mined negatives
#   7. q_asym       (#5, ~1.5h)   emb_tok asym-distill sweep on the proj recipe
#   8. q_mrl_w      (#6, ~1.5h)   per-dim MRL weights targeting the dim-64 gap
#   9. q_s2 / rr_np16 / rr_dw     tails (least marginal)
#
# Stage markers shared with r4_chainC/D + r5_chain ($A/.done_<name>); running
# after scripts/r5_restore.sh resumes the first unfinished stage from its
# newest checkpoint. Each finished stage is banked AND committed so driver
# wipes / environment resets lose nothing (survived two resets in round 4).
#
# Usage: bash scripts/r5_restore.sh && bash scripts/r5b_chain.sh
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
  if [ -f "$A/.done_$name" ]; then echo "[r5b] $name: done, skipping"; return 0; fi
  echo "[r5b] $name: start $(date -u +%H:%M:%S)"
  "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then echo "[r5b] $name FAILED rc=$rc"; exit $rc; fi
  touch "$A/.done_$name"
  echo "[r5b] $name: ok $(date -u +%H:%M:%S)"
}

publish() { # publish <src_json> <dst_name>  (idempotent)
  [ -f "$1" ] && cp "$1" "$R/$2" && echo "[r5b] published $R/$2"
}

ckpt_commit() { # ckpt_commit <msg> <paths...>  (never fails the chain)
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    if git add -A "$@" 2>/dev/null && \
       { git diff --cached --quiet || git commit -q -m "$msg"; }; then
      echo "[r5b] committed: $msg"; return 0
    fi
    sleep 7   # index.lock race with an interactive session commit
  done
  echo "[r5b] WARN: commit failed ($msg)"; return 0
}

bank() { # bank <stage>  (bank_finished + commit; never fails the chain)
  bash scripts/bank_finished.sh "$1" "$A" || return 0
  ckpt_commit "bank $1 (round-5 chain)" "banked/$1" "$R"
}

# --- 0. measured asymmetric query-encode speedup table (#7, minutes) ---------
stage speedup_r5 $W python scripts/asym_speedup_table.py \
  --stage "$A/q_proj" --out "$R/asym_speedup_r5.json"
ckpt_commit "results: measured asym query-encode speedup table" "$R"

# --- 1. replicate the round-4 projector headline at seed 1 (#1) --------------
stage q_proj_s1 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_proj_s1" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 1 --sparse-projector linear
publish "$A/q_proj_s1/quality_summary.json" q_proj_s1_quality_summary.json
bank q_proj_s1

# --- 2. pooled significance over the two independent projector runs (CPU) ----
run_pooled_sig() {
  python scripts/significance.py --data "$A/docstring_beir" \
    --predictions "$A/q_proj/predictions.json.gz,$A/q_proj_s1/predictions.json.gz" \
    --systems den,den_spr,emb_tok,spr --baseline bm25 \
    --fused den_spr,emb_tok \
    --summary "$A/q_proj/quality_summary.json,$A/q_proj_s1/quality_summary.json" \
    --out "$R/q_proj_pooled_significance.json"
}
stage pooled_sig run_pooled_sig
ckpt_commit "results: pooled den_spr-vs-BM25 significance over 2 projector seeds" "$R"

# --- 3. second-domain fine-tune (#3) -----------------------------------------
stage cheader_ft $W python scripts/quality_study.py --data "$A/cheader_beir" \
  --out "$A/q_cheader_ft" --init-trunk "$A/lm_pt" --distill \
  --train-file "$A/cheader_beir/train/docstrings_bm25.jsonl" --steps 4000 \
  --seed 0 --sparse-projector linear
publish "$A/q_cheader_ft/quality_summary.json" q_cheader_ft_quality_summary.json
bank q_cheader_ft

# --- 4. retrieve+rerank replication on the seed-1 projector first stage ------
if [ ! -d "$A/rr_proj_s1/model" ] && [ -d "$A/rr_mined/model" ]; then
  mkdir -p "$A/rr_proj_s1" && cp -r "$A/rr_mined/model" "$A/rr_proj_s1/model"
fi
stage rr_proj_s1 $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_proj_s1" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --n-passages 8 --steps 8000 --train-file "$TRAIN" --eval-only \
  --first-k-list 10,25,50,100 \
  --rerank-predictions "$A/q_proj_s1/predictions.json.gz" \
  --rerank-systems den,den_spr,emb_tok
publish "$A/rr_proj_s1/rerank_summary.json" rr_proj_s1_summary.json
ckpt_commit "results: seed-1 retrieve+rerank replication" "$R"

# --- 5. the 164M scale arm (#2) — FIRST after the short closers --------------
stage big_pt $W python scripts/lm_pretrain.py --data "$A/pretrain_corpus.jsonl" \
  --extra-corpus "$A/docstring_beir/corpus.jsonl" --out "$A/lm_pt_big" \
  --hidden 896 --layers 14 --heads 14 --kv-heads 7 --intermediate 2688 \
  --steps 24000
bank lm_pt_big

stage q_big $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_big" --init-trunk "$A/lm_pt_big" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --sparse-projector linear
publish "$A/q_big/quality_summary.json" q_big_quality_summary.json
bank q_big

if [ ! -d "$A/rr_big/model" ] && [ -d "$A/rr_mined/model" ]; then
  : # rr_big trains its own CE on the 164M trunk; no seeding
fi
stage rr_big $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_big" --init-trunk "$A/q_big" --tokenizer "$A/q_big/tokenizer" \
  --distill --n-passages 8 --steps 8000 --lr "$RRLR" --train-file "$TRAIN" \
  --mine-negatives-depth 100 --first-k-list 10,25,50,100 \
  --rerank-predictions "$A/q_big/predictions.json.gz"
publish "$A/rr_big/rerank_summary.json" rr_big_summary.json
bank rr_big

# --- 6. serve-distribution mining for the NEURAL deployment (#4) -------------
# Train the CE on negatives drawn from the den_spr top-100 (the exact
# candidate population of the fully-neural stack), then eval on the q_proj
# first stage. Matches /root/reference/rerank/__main__.py:90-211 in role.
stage mine_neural $W python scripts/mine_neural_negatives.py \
  --stage "$A/q_proj" --data "$A/docstring_beir" --train-file "$TRAIN" \
  --out "$A/neural_mined.jsonl" --depth 100
ckpt_commit "neural serve-distribution mining meta" "$R"

# distill-temp 0.4: the mined ce_scores live on the fused min-max [0,1]
# scale (vs raw ~[5,25] BM25 in rr_mined); at the default t=4 the teacher
# softmax over 8 passages is near-uniform and the KL carries no signal.
# 0.4 restores the same teacher-logit spread rr_mined trained with.
stage rr_neural $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_neural" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --distill --distill-temp 0.4 --n-passages 8 --steps 8000 --lr "$RRLR" \
  --train-file "$A/neural_mined.jsonl" --first-k-list 10,25,50,100 \
  --rerank-predictions "$A/q_proj/predictions.json.gz" \
  --rerank-systems den,den_spr,emb_tok
publish "$A/rr_neural/rerank_summary.json" rr_neural_summary.json
bank rr_neural

# --- 7. flagship asymmetric pair: asym-distill sweep on the proj recipe (#5) -
# Reference's two distill paths (modeling_hybrid.py:683-729): rep-level +
# score-level emb distillation, plus token-level distill for the tok side.
stage q_asym $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_asym" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --sparse-projector linear \
  --emb-distill both --emb-distill-coef 2.0 --tok-distill --tok-distill-coef 2.0
publish "$A/q_asym/quality_summary.json" q_asym_quality_summary.json
bank q_asym

# --- 8. per-dim MRL weights targeting the dim-64 residual (#6) ---------------
stage q_mrl_w $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_mrl_w" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --systems dense --mrl-dims 64,128,256,384,512 \
  --mrl-weights 4.0,2.0,1.0,1.0,1.0 --save-embs
publish "$A/q_mrl_w/quality_summary.json" q_mrl_w_quality_summary.json
bank q_mrl_w

# --- 9. tails: third tied-head seed + rerank ablation grid --------------------
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

echo "[r5b] all stages complete $(date -u +%H:%M:%S)"
