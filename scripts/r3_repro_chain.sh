#!/bin/bash
# Round-3 quality-artifact regeneration chain (serialized TPU jobs).
#
# Rebuilds, from nothing, every artifact behind PERFORMANCE.md's round-3
# quality section: the docstring BEIR benchmark, the harvested pretrain
# corpus, the BM25 teacher file, the 70M LM trunk, the 12k-step hybrid
# fine-tune probe (q_r3b), and the dense MRL dim-sweep run (q_mrl).
# Every stage is skipped if its sentinel exists, so the chain is resumable;
# each TPU stage goes through with_tpu.sh (wedged-client relaunch) and the
# trainers inside checkpoint + auto-resume.
#
# Usage: bash scripts/r3_repro_chain.sh [artifacts_dir]
set -u
cd "$(dirname "$0")/.."
A=${1:-.artifacts}
mkdir -p "$A"
W="bash scripts/with_tpu.sh"

stage() { # stage <name> <cmd...>
  local name=$1; shift
  if [ -f "$A/.done_$name" ]; then echo "[chain] $name: done, skipping"; return 0; fi
  echo "[chain] $name: start $(date -u +%H:%M:%S)"
  "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then echo "[chain] $name FAILED rc=$rc"; exit $rc; fi
  touch "$A/.done_$name"
  echo "[chain] $name: ok $(date -u +%H:%M:%S)"
}

stage beir $W python scripts/build_docstring_beir.py --out "$A/docstring_beir"
stage harvest python scripts/harvest_pretrain_corpus.py \
  --out "$A/pretrain_corpus.jsonl" --queries "$A/docstring_beir/queries.jsonl"
stage teacher python scripts/bm25_teacher.py --data "$A/docstring_beir" \
  --out "$A/docstring_beir/train/docstrings_bm25.jsonl"
stage lm_pt $W python scripts/lm_pretrain.py --data "$A/pretrain_corpus.jsonl" \
  --extra-corpus "$A/docstring_beir/corpus.jsonl" --out "$A/lm_pt"
# 12k-step probe of the exact q_r3a recipe (PERFORMANCE.md variance note)
stage q_r3b $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_r3b" --init-trunk "$A/lm_pt" --distill \
  --train-file "$A/docstring_beir/train/docstrings_bm25.jsonl" --steps 12000
# MRL dim-sweep run (VERDICT r2 next #9): dense-only with matryoshka losses
stage q_mrl $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_mrl" --init-trunk "$A/lm_pt" --distill \
  --train-file "$A/docstring_beir/train/docstrings_bm25.jsonl" --steps 8000 \
  --systems dense --mrl-dims 64,128,256
echo "[chain] all stages complete"
