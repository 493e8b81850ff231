#!/bin/bash
# Round-4 chain C: the remainder after chainB banked q_s0 / sparse_real_r4 /
# rr_base / serving_r4 / cheader_zs. Two changes vs chainB's tail:
#
#   * rr_base_v2 REDOES the reranker base run: the first rr_base diverged
#     (ce_loss rose 1.41->1.82 from step 200, in-dist acc 0.275 vs round-3's
#     0.765) — the lr 1e-3 recipe is on the stability edge and this
#     trunk/seed fell off it. The redo runs the probe-validated lower lr.
#   * stages are priority-ordered by VERDICT r3 "next" rank so whatever the
#     wall-clock cuts off is the lowest-value tail: rerank fix (#2/#5) ->
#     seed sweep (#1a) -> projector init (#1b) -> MRL+spectrum (#4) ->
#     164M scale-up (#1c) -> rerank grid (#5) -> second-domain FT (#8).
#
# Usage: bash scripts/r4_chainC.sh [artifacts_dir]
set -u
cd "$(dirname "$0")/.."
A=${1:-.artifacts}
R=results
W="bash scripts/with_tpu.sh"
TRAIN="$A/docstring_beir/train/docstrings_bm25.jsonl"
RRLR=${RRLR:-3e-4}
mkdir -p "$A" "$R"

stage() { # stage <name> <cmd...>
  local name=$1; shift
  if [ -f "$A/.done_$name" ]; then echo "[r4C] $name: done, skipping"; return 0; fi
  echo "[r4C] $name: start $(date -u +%H:%M:%S)"
  "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then echo "[r4C] $name FAILED rc=$rc"; exit $rc; fi
  touch "$A/.done_$name"
  echo "[r4C] $name: ok $(date -u +%H:%M:%S)"
}

publish() { # publish <src_json> <dst_name>  (idempotent)
  [ -f "$1" ] && cp "$1" "$R/$2" && echo "[r4C] published $R/$2"
}

# --- reranker redo at the probe-validated lr (VERDICT #2/#5) ----------------
stage rr_base_v2 $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_base_v2" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --distill --n-passages 8 --steps 8000 --lr "$RRLR" --train-file "$TRAIN" \
  --first-k-list 10,25,50,100
publish "$A/rr_base_v2/rerank_summary.json" rr_base_summary.json

# --- serve-distribution negatives (#5: the train/serve mismatch fix) ---------
stage rr_mined $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_mined" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --distill --n-passages 8 --steps 8000 --lr "$RRLR" --train-file "$TRAIN" \
  --mine-negatives-depth 100 --first-k-list 10,25,50,100
publish "$A/rr_mined/rerank_summary.json" rr_mined_summary.json

# --- seed sweep (#1a; q_s0/q_s1/q_r3b give three runs of the recipe — q_s2
# --- is in the stretch tail) -------------------------------------------------
stage q_s1 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_s1" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 1
publish "$A/q_s1/quality_summary.json" q_s1_quality_summary.json

# --- sparse-projector-from-lm_head init ablation (#1b) -----------------------
stage q_proj $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_proj" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --sparse-projector linear
publish "$A/q_proj/quality_summary.json" q_proj_quality_summary.json

# --- full-budget MRL sweep + spectrum (#4) -----------------------------------
stage q_mrl_r4 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_mrl_r4" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --systems dense --mrl-dims 64,128,256,384,512 \
  --save-embs
publish "$A/q_mrl_r4/quality_summary.json" q_mrl_r4_quality_summary.json

# --- 164M trunk scale-up, exact recipe (#1c) ---------------------------------
stage big_pt $W python scripts/lm_pretrain.py --data "$A/pretrain_corpus.jsonl" \
  --extra-corpus "$A/docstring_beir/corpus.jsonl" --out "$A/lm_pt_big" \
  --hidden 896 --layers 14 --heads 14 --kv-heads 7 --intermediate 2688 \
  --steps 24000
stage q_big $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_big" --init-trunk "$A/lm_pt_big" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0
publish "$A/q_big/quality_summary.json" q_big_quality_summary.json

# --- stretch tail: third seed + rerank grid + second-domain FT ---------------
stage q_s2 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_s2" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 2
publish "$A/q_s2/quality_summary.json" q_s2_quality_summary.json

# --- rerank ablation grid (#5): group size / distill weight / backbone -------
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

stage rr_big $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_big" --init-trunk "$A/q_big" --tokenizer "$A/q_big/tokenizer" \
  --distill --n-passages 8 --steps 8000 --lr "$RRLR" --train-file "$TRAIN" \
  --first-k-list 10,25,50,100 \
  --rerank-predictions "$A/q_big/predictions.json.gz"
publish "$A/rr_big/rerank_summary.json" rr_big_summary.json

# --- second-domain fine-tune (transfer column, #8 tail) ----------------------
stage cheader_ft $W python scripts/quality_study.py --data "$A/cheader_beir" \
  --out "$A/q_cheader_ft" --init-trunk "$A/lm_pt" --distill \
  --train-file "$A/cheader_beir/train/docstrings_bm25.jsonl" --steps 4000 \
  --seed 0
publish "$A/q_cheader_ft/quality_summary.json" q_cheader_ft_quality_summary.json

echo "[r4C] all stages complete $(date -u +%H:%M:%S)"
