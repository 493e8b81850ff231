#!/bin/bash
# Round-4 study chain (VERDICT r3 "next round" #1-#5), serialized TPU jobs.
#
# Stage order banks the highest-priority artifacts earliest:
#   q_s0            seed-0 12k-step 70M recipe (the workhorse model)
#   sparse_real_r4  tiered engine on REAL trained outputs (next #3)
#   rr_base         rerank depth-ablation + fully-neural retrieve+rerank
#                   rows off q_s0's predictions (next #2, #5)
#   q_s1,q_s2       seed sweep -> spr variance error bars (next #1a)
#   q_proj          sparse-projector-from-lm_head init ablation (next #1b,
#                   reference modeling_hybrid.py:879-905)
#   big_pt,q_big    164M trunk scale-up, exact 12k recipe (next #1c)
#   q_mrl_r4        full-budget MRL sweep + embedding spectrum (next #4)
#   rr_big,rr_np16, rerank ablation grid: backbone scale / group size /
#   rr_dw           distill weight (next #5)
#
# Every stage is sentinel-gated (resumable), runs through with_tpu.sh
# (wedged-client relaunch), and copies its summary JSON into results/ so
# PERFORMANCE.md cites committed artifacts (next #10 docs-lockstep rule).
#
# Usage: bash scripts/r4_chain.sh [artifacts_dir]
set -u
cd "$(dirname "$0")/.."
A=${1:-.artifacts}
R=results
W="bash scripts/with_tpu.sh"
TRAIN="$A/docstring_beir/train/docstrings_bm25.jsonl"
mkdir -p "$A" "$R"

stage() { # stage <name> <cmd...>
  local name=$1; shift
  if [ -f "$A/.done_$name" ]; then echo "[r4] $name: done, skipping"; return 0; fi
  echo "[r4] $name: start $(date -u +%H:%M:%S)"
  "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then echo "[r4] $name FAILED rc=$rc"; exit $rc; fi
  touch "$A/.done_$name"
  echo "[r4] $name: ok $(date -u +%H:%M:%S)"
}

publish() { # publish <src_json> <dst_name>  (idempotent)
  [ -f "$1" ] && cp "$1" "$R/$2" && echo "[r4] published $R/$2"
}

# --- wait for the in-flight 30k-step lm_pt pretrain (launched outside this
# chain; its final save writes model/config.json) — up to 2h ---------------
for _ in $(seq 1 480); do
  [ -f "$A/lm_pt/model/config.json" ] && break
  sleep 15
done
if [ ! -f "$A/lm_pt/model/config.json" ]; then
  echo "[r4] timed out waiting for $A/lm_pt/model"; exit 1
fi
sleep 30  # let the pretrain process release the TPU client

# --- seed-0 workhorse run (exact q_r3b recipe + explicit seed) --------------
stage q_s0 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_s0" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0
publish "$A/q_s0/quality_summary.json" q_s0_quality_summary.json

# --- tiered engine on real trained outputs (next #3) ------------------------
stage sparse_real_r4 $W python scripts/sparse_engine_real_check.py \
  --model "$A/q_s0" --data "$A/docstring_beir" --docs 40000 --queries 1024 \
  --out "$R/sparse_real_r4.json"

# --- rerank: depth ablation + fully-neural retrieve+rerank (next #2/#5) -----
stage rr_base $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_base" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --distill --n-passages 8 --steps 8000 --train-file "$TRAIN" \
  --first-k-list 10,25,50,100
publish "$A/rr_base/rerank_summary.json" rr_base_summary.json

# --- seed sweep (next #1a) --------------------------------------------------
stage q_s1 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_s1" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 1
publish "$A/q_s1/quality_summary.json" q_s1_quality_summary.json

stage q_s2 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_s2" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 2
publish "$A/q_s2/quality_summary.json" q_s2_quality_summary.json

# --- sparse-projector-from-lm_head init ablation (next #1b) -----------------
stage q_proj $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_proj" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --sparse-projector linear
publish "$A/q_proj/quality_summary.json" q_proj_quality_summary.json

# --- 164M trunk scale-up, exact recipe (next #1c) ---------------------------
stage big_pt $W python scripts/lm_pretrain.py --data "$A/pretrain_corpus.jsonl" \
  --extra-corpus "$A/docstring_beir/corpus.jsonl" --out "$A/lm_pt_big" \
  --hidden 896 --layers 14 --heads 14 --kv-heads 7 --intermediate 2688 \
  --steps 24000
stage q_big $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_big" --init-trunk "$A/lm_pt_big" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0
publish "$A/q_big/quality_summary.json" q_big_quality_summary.json

# --- full-budget MRL sweep + spectrum (next #4) -----------------------------
stage q_mrl_r4 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_mrl_r4" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --systems dense --mrl-dims 64,128,256,384,512 \
  --save-embs
publish "$A/q_mrl_r4/quality_summary.json" q_mrl_r4_quality_summary.json

# --- rerank ablation grid (next #5): backbone scale / group size / distill --
stage rr_big $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_big" --init-trunk "$A/q_big" --tokenizer "$A/q_big/tokenizer" \
  --distill --n-passages 8 --steps 8000 --train-file "$TRAIN" \
  --first-k-list 10,25,50,100 \
  --rerank-predictions "$A/q_big/predictions.json.gz"
publish "$A/rr_big/rerank_summary.json" rr_big_summary.json

stage rr_np16 $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_np16" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --distill --n-passages 16 --batch 8 --steps 8000 --train-file "$TRAIN" \
  --first-k-list 10,25,50,100
publish "$A/rr_np16/rerank_summary.json" rr_np16_summary.json

stage rr_dw $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_dw" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --distill --distill-coef 0.3 --n-passages 8 --steps 8000 \
  --train-file "$TRAIN" --first-k-list 10,25,50,100
publish "$A/rr_dw/rerank_summary.json" rr_dw_summary.json

echo "[r4] all stages complete $(date -u +%H:%M:%S)"
