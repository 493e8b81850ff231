#!/bin/bash
# Round-4 chain, reordered (replaces the tail of r4_chain.sh): bank at least
# one artifact for every VERDICT r3 item early, then run the long studies.
#
#   q_s0 (wait)      in-flight seed-0 12k-step run launched by r4_chain.sh
#   sparse_real_r4   tiered engine on REAL trained outputs (next #3)
#   rr_base          rerank depth ablation + fully-neural retrieve+rerank
#                    off q_s0 predictions (next #2, #5)
#   serving_r4       fixed-generator load sweep + batcher breakdown (next #6)
#   cheader_zs       second-domain zero-shot eval of q_s0 + BM25 (next #8)
#   q_s1,q_s2,q_proj seed sweep + lm_head-init ablation (next #1a/#1b)
#   big_pt,q_big     164M scale-up (next #1c)
#   q_mrl_r4         full-budget MRL + spectrum (next #4)
#   rr_big,rr_np16,  rerank ablation grid (next #5)
#   rr_dw
#   cheader_ft       short in-domain fine-tune on the second domain (transfer
#                    column; optional tail)
#
# Usage: bash scripts/r4_chainB.sh [artifacts_dir]
set -u
cd "$(dirname "$0")/.."
A=${1:-.artifacts}
R=results
W="bash scripts/with_tpu.sh"
TRAIN="$A/docstring_beir/train/docstrings_bm25.jsonl"
mkdir -p "$A" "$R"

stage() { # stage <name> <cmd...>
  local name=$1; shift
  if [ -f "$A/.done_$name" ]; then echo "[r4B] $name: done, skipping"; return 0; fi
  echo "[r4B] $name: start $(date -u +%H:%M:%S)"
  "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then echo "[r4B] $name FAILED rc=$rc"; exit $rc; fi
  touch "$A/.done_$name"
  echo "[r4B] $name: ok $(date -u +%H:%M:%S)"
}

publish() { # publish <src_json> <dst_name>  (idempotent)
  [ -f "$1" ] && cp "$1" "$R/$2" && echo "[r4B] published $R/$2"
}

# --- wait for the in-flight q_s0 (writes quality_summary.json last) --------
for _ in $(seq 1 720); do
  [ -f "$A/q_s0/quality_summary.json" ] && break
  sleep 15
done
if [ ! -f "$A/q_s0/quality_summary.json" ]; then
  echo "[r4B] timed out waiting for q_s0"; exit 1
fi
touch "$A/.done_q_s0"
publish "$A/q_s0/quality_summary.json" q_s0_quality_summary.json
sleep 30  # let the q_s0 process release the TPU client

stage sparse_real_r4 $W python scripts/sparse_engine_real_check.py \
  --model "$A/q_s0" --data "$A/docstring_beir" --docs 40000 --queries 1024 \
  --out "$R/sparse_real_r4.json"

stage rr_base $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_base" --init-trunk "$A/q_s0" --tokenizer "$A/q_s0/tokenizer" \
  --distill --n-passages 8 --steps 8000 --train-file "$TRAIN" \
  --first-k-list 10,25,50,100
publish "$A/rr_base/rerank_summary.json" rr_base_summary.json

stage serving_r4 $W python scripts/serving_latency.py \
  --out "$R/serving_saturation_r4.json"

stage cheader_zs $W python scripts/quality_study.py --data "$A/cheader_beir" \
  --out "$A/q_s0_cheader" --init-trunk "$A/lm_pt" --init-from "$A/q_s0" \
  --tokenizer "$A/q_s0/tokenizer" --skip-train
publish "$A/q_s0_cheader/quality_summary.json" q_s0_cheader_zeroshot.json

stage q_s1 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_s1" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 1
publish "$A/q_s1/quality_summary.json" q_s1_quality_summary.json

stage q_s2 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_s2" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 2
publish "$A/q_s2/quality_summary.json" q_s2_quality_summary.json

stage q_proj $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_proj" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --sparse-projector linear
publish "$A/q_proj/quality_summary.json" q_proj_quality_summary.json

stage big_pt $W python scripts/lm_pretrain.py --data "$A/pretrain_corpus.jsonl" \
  --extra-corpus "$A/docstring_beir/corpus.jsonl" --out "$A/lm_pt_big" \
  --hidden 896 --layers 14 --heads 14 --kv-heads 7 --intermediate 2688 \
  --steps 24000
stage q_big $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_big" --init-trunk "$A/lm_pt_big" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0
publish "$A/q_big/quality_summary.json" q_big_quality_summary.json

stage q_mrl_r4 $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_mrl_r4" --init-trunk "$A/lm_pt" --distill --train-file "$TRAIN" \
  --steps 12000 --seed 0 --systems dense --mrl-dims 64,128,256,384,512 \
  --save-embs
publish "$A/q_mrl_r4/quality_summary.json" q_mrl_r4_quality_summary.json

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

stage cheader_ft $W python scripts/quality_study.py --data "$A/cheader_beir" \
  --out "$A/q_cheader_ft" --init-trunk "$A/lm_pt" --distill \
  --train-file "$A/cheader_beir/train/docstrings_bm25.jsonl" --steps 4000 \
  --seed 0
publish "$A/q_cheader_ft/quality_summary.json" q_cheader_ft_quality_summary.json

echo "[r4B] all stages complete $(date -u +%H:%M:%S)"
