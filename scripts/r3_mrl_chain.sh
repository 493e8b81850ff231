#!/bin/bash
# Round-3 MRL dim-sweep chain (VERDICT r2 next #9) — reduced-budget variant.
#
# The full-budget MRL stage lives in scripts/r3_repro_chain.sh (q_mrl: 30k
# pretrain + 8k fine-tune). This chain produces the same artifact shape in a
# single-session TPU budget: a shorter LM pretrain of the identical 70M
# trunk recipe, then a dense-only Matryoshka fine-tune and a truncated-search
# sweep (zero-copy slices + renormalization through retriever/knn.py) at
# 64/128/256/384 dims. Stages are sentinel-resumable; TPU stages go through
# with_tpu.sh. One TPU client at a time (CLAUDE.md).
#
# Usage: bash scripts/r3_mrl_chain.sh [artifacts_dir]
set -u
cd "$(dirname "$0")/.."
A=${1:-.artifacts}
mkdir -p "$A"
W="bash scripts/with_tpu.sh"

stage() { # stage <name> <cmd...>
  local name=$1; shift
  if [ -f "$A/.done_$name" ]; then echo "[mrl] $name: done, skipping"; return 0; fi
  echo "[mrl] $name: start $(date -u +%H:%M:%S)"
  "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then echo "[mrl] $name FAILED rc=$rc"; exit $rc; fi
  touch "$A/.done_$name"
  echo "[mrl] $name: ok $(date -u +%H:%M:%S)"
}

stage beir $W python scripts/build_docstring_beir.py --out "$A/docstring_beir"
stage harvest python scripts/harvest_pretrain_corpus.py \
  --out "$A/pretrain_corpus.jsonl" --queries "$A/docstring_beir/queries.jsonl"
# bm25_teacher is CPU-only (no jax): run bare — a with_tpu.sh prefix would
# burn a preflight probe client for a job that never touches the chip.
stage teacher python scripts/bm25_teacher.py --data "$A/docstring_beir" \
  --out "$A/docstring_beir/train/docstrings_bm25.jsonl"
stage lm_pt_fast $W python scripts/lm_pretrain.py \
  --data "$A/pretrain_corpus.jsonl" \
  --extra-corpus "$A/docstring_beir/corpus.jsonl" --out "$A/lm_pt_fast" \
  --steps 6000
stage q_mrl $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_mrl" --init-trunk "$A/lm_pt_fast" --distill \
  --train-file "$A/docstring_beir/train/docstrings_bm25.jsonl" --steps 3000 \
  --systems dense --mrl-dims 64,128,256
echo "[mrl] all stages complete"
