#!/bin/bash
# Round-5 chain: supersedes r4_chainD.sh (kept untouched because a bash
# script must never be edited while a live chain executes it — bash reads
# by byte offset). Differences vs chainD:
#   * rr_proj_s1: eval-only retrieve+rerank replication on the seed-1
#     projector first stage (cheap, ~20 min, strengthens the headline);
#   * q_s2 (third tied-head seed) demoted behind the rerank ablations —
#     q_s0/q_s1/q_r3b already band the variance, so it is the least
#     marginal stage before the ~3.5h 164M arm.
#
# Stage markers are shared with r4_chainC/D ($A/.done_<name>), so running
# this after scripts/r5_restore.sh skips everything already banked or
# published and resumes the first unfinished stage from its newest
# checkpoint.
#
# Usage: bash scripts/r5_restore.sh && bash scripts/r5_chain.sh
set -u
cd "$(dirname "$0")/.."
A=${1:-.artifacts}
R=results
W="bash scripts/with_tpu.sh"
TRAIN="$A/docstring_beir/train/docstrings_bm25.jsonl"
RRLR=${RRLR:-3e-4}
mkdir -p "$A" "$R"
# Record the chain root pid so bench.py's claim_chip() preflight can free the
# tunnel slot at round end (utils/chip_claim.py discovers /tmp/*.pid roots).
echo $$ > /tmp/chain.pid

stage() { # stage <name> <cmd...>
  local name=$1; shift
  if [ -f "$A/.done_$name" ]; then echo "[r5] $name: done, skipping"; return 0; fi
  echo "[r5] $name: start $(date -u +%H:%M:%S)"
  "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then echo "[r5] $name FAILED rc=$rc"; exit $rc; fi
  touch "$A/.done_$name"
  echo "[r5] $name: ok $(date -u +%H:%M:%S)"
}

publish() { # publish <src_json> <dst_name>  (idempotent)
  [ -f "$1" ] && cp "$1" "$R/$2" && echo "[r5] published $R/$2"
}

# --- anything chainC left mid-flight resumes first (same markers) -----------
stage q_proj $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_proj" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --sparse-projector linear
publish "$A/q_proj/quality_summary.json" q_proj_quality_summary.json

stage q_mrl_r4 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_mrl_r4" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --systems dense --mrl-dims 64,128,256,384,512 \
  --save-embs
publish "$A/q_mrl_r4/quality_summary.json" q_mrl_r4_quality_summary.json

# --- fully-neural retrieve+rerank on the q_proj first stage ------------------
# den_spr 0.554 already beats BM25 0.536 BEFORE reranking; rerank its top-k
# with the trained rr_mined CE (eval-only: no retraining, ~20 min of chip).
# Seed the out dir from rr_mined's saved model (checkpoints if live, the
# HF-layout model/ from banked/ otherwise — eval-only handles both).
if [ ! -d "$A/rr_proj/model" ] && [ -d "$A/rr_mined/model" ]; then
  mkdir -p "$A/rr_proj" && cp -r "$A/rr_mined/model" "$A/rr_proj/model"
fi
stage rr_proj $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_proj" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --n-passages 8 --steps 8000 --train-file "$TRAIN" --eval-only \
  --first-k-list 10,25,50,100 \
  --rerank-predictions "$A/q_proj/predictions.json.gz" \
  --rerank-systems den,den_spr,emb_tok
publish "$A/rr_proj/rerank_summary.json" rr_proj_summary.json

# --- replicate the round-4 headline at a second seed -------------------------
# q_proj (seed 0) put pure-neural den_spr 0.554 above BM25 0.536 via the
# lm_head-initialized decoupled sparse projector; one sample is not a claim.
stage q_proj_s1 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_proj_s1" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 1 --sparse-projector linear
publish "$A/q_proj_s1/quality_summary.json" q_proj_s1_quality_summary.json

# --- second-domain fine-tune (transfer column, #8 tail) ----------------------
stage cheader_ft $W python scripts/quality_study.py --data "$A/cheader_beir" \
  --out "$A/q_cheader_ft" --init-trunk "$A/lm_pt" --distill \
  --train-file "$A/cheader_beir/train/docstrings_bm25.jsonl" --steps 4000 \
  --seed 0
publish "$A/q_cheader_ft/quality_summary.json" q_cheader_ft_quality_summary.json

# --- retrieve+rerank replication on the seed-1 projector first stage ---------
# Same trained rr_mined CE, eval-only (~20 min): does den_spr->CE beating
# BM25-alone replicate on the second projector seed?
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

# --- rerank ablation grid (#5): group size / distill weight ------------------
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

# --- third seed (#1a: marginal — q_s0/q_s1/q_r3b already band the variance) --
stage q_s2 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_s2" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 2
publish "$A/q_s2/quality_summary.json" q_s2_quality_summary.json

# --- 164M trunk scale-up, exact recipe (#1c) — the long arm, last -------------
stage big_pt $W python scripts/lm_pretrain.py --data "$A/pretrain_corpus.jsonl" \
  --extra-corpus "$A/docstring_beir/corpus.jsonl" --out "$A/lm_pt_big" \
  --hidden 896 --layers 14 --heads 14 --kv-heads 7 --intermediate 2688 \
  --steps 24000
stage q_big $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_big" --init-trunk "$A/lm_pt_big" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0
publish "$A/q_big/quality_summary.json" q_big_quality_summary.json

stage rr_big $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_big" --init-trunk "$A/q_big" --tokenizer "$A/q_big/tokenizer" \
  --distill --n-passages 8 --steps 8000 --lr "$RRLR" --train-file "$TRAIN" \
  --first-k-list 10,25,50,100 \
  --rerank-predictions "$A/q_big/predictions.json.gz"
publish "$A/rr_big/rerank_summary.json" rr_big_summary.json

echo "[r5] all stages complete $(date -u +%H:%M:%S)"
