#!/bin/bash
# Restore round-4 trained artifacts from git (banked/) into .artifacts/ so the
# round-5 study chain resumes at its first unfinished stage instead of
# re-training ~5h of prerequisites. Background: the driver wipes untracked
# files between rounds (round-3 .artifacts did not survive into round 4, which
# cost this round its first ~6h of chip time re-pretraining lm_pt + q_s0).
#
# Banked (committed, ~1.0G):
#   banked/lm_pt/          70M LM-pretrained trunk (24k+ steps) + tokenizer
#   banked/q_s0/           seed-0 12k-step hybrid retriever (the workhorse:
#                          rerank warm-start, tiered-real doc source, eval)
#   banked/rr_mined/       headline reranker (serve-distribution negatives,
#                          results/rr_mined_summary.json)
#   banked/{docstring,cheader}_beir/  the EXACT eval benchmarks + gzipped
#                          BM25-teacher train files (byte-identical eval
#                          across rounds; a rebuild would shift BM25 baseline)
#
# Not banked (cheap to rebuild, done below or by the chain):
#   pretrain_corpus.jsonl  harvest_pretrain_corpus.py, CPU, minutes (only
#                          needed by the big_pt 164M stage)
#
# Usage: bash scripts/r5_restore.sh [artifacts_dir]   # then bash scripts/r4_chainC.sh
set -eu
cd "$(dirname "$0")/.."
A=${1:-.artifacts}
mkdir -p "$A"

[ -d banked ] || { echo "no banked/ tree in repo"; exit 1; }

# Every banked model/stage dir restores as-is; the BEIR benchmarks and
# in-flight checkpoints have their own handling below.
for d in banked/*/; do
  s=$(basename "$d")
  case "$s" in docstring_beir|cheader_beir|inflight) continue;; esac
  if [ ! -d "$A/$s" ]; then cp -r "banked/$s" "$A/$s"; echo "restored $A/$s"; fi
done

for b in docstring_beir cheader_beir; do
  if [ ! -d "$A/$b" ]; then
    mkdir -p "$A/$b/train"
    cp -r "banked/$b/corpus.jsonl" "banked/$b/queries.jsonl" \
          "banked/$b/qrels" "banked/$b/stats.json" "$A/$b/"
    gunzip -c "banked/$b/train/docstrings_bm25.jsonl.gz" \
      > "$A/$b/train/docstrings_bm25.jsonl"
    echo "restored $A/$b"
  fi
done

# Mid-flight checkpoints banked by scripts/bank_inflight.sh: restore into the
# stage's out dir so quality_study/rerank_study auto-resume from the newest
# checkpoint-<N>/ (training.trainer.find_last_checkpoint) instead of step 0.
if [ -d banked/inflight ]; then
  for d in banked/inflight/*/; do
    s=$(basename "$d")
    if [ ! -d "$A/$s" ]; then
      cp -r "$d" "$A/$s"; echo "restored in-flight $A/$s"
    fi
  done
fi

# Pretrain corpus (CPU-only, only needed by the big_pt stage).
if [ ! -f "$A/pretrain_corpus.jsonl" ]; then
  python scripts/harvest_pretrain_corpus.py \
    --out "$A/pretrain_corpus.jsonl" --queries "$A/docstring_beir/queries.jsonl"
fi

# Mark the stages whose outputs are banked or already published in results/
# so r4_chain*.sh skip straight to the first unfinished stage.
for m in harvest beir teacher q_s0 sparse_real_r4 rr_base rr_base_v2 rr_mined \
         serving_r4 cheader_zs q_mrl lm_pt_fast; do
  touch "$A/.done_$m"
done
# Quality/rerank stages publish results/<stage>_{quality_,rerank_}summary.json
# on completion — a committed summary IS the done evidence (docs-lockstep),
# so derive those markers instead of hand-listing them.
for f in results/*_quality_summary.json results/*_summary.json; do
  [ -f "$f" ] || continue
  s=$(basename "$f"); s=${s%_quality_summary.json}; s=${s%_summary.json}
  case "$s" in
    q_cheader_ft) touch "$A/.done_cheader_ft";;  # chainD stage name differs
    q_s1|q_s2|q_proj|q_proj_s1|rr_proj|rr_proj_s1|q_big|q_mrl_r4|rr_np16|rr_dw|rr_big)
      touch "$A/.done_$s";;
  esac
done

echo "restore complete; next: bash scripts/r4_chainD.sh (priority-reordered)"
