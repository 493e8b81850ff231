#!/bin/bash
# Round-3 quality chain, part 3 — scale-up study (runs after chain part 2).
#
# Everything in parts 1-2 used the 70M trunk (10L/640H). This part
# pretrains a ~2.3x larger trunk (14L/896H, GQA 14/7, same 32.8k BPE and
# corpus) and fine-tunes it with the EXACT part-1 recipe (12k steps, all
# four systems, BM25-teacher KL), giving a quality-vs-scale column for
# PERFORMANCE.md: 17M (round 2) -> 70M (q_r3b) -> 164M (q_big).
#
# Waits for part 2's final sentinel so the chip is never shared
# (CLAUDE.md: one TPU client at a time).
#
# Usage: bash scripts/r3_repro_chain3.sh [artifacts_dir]
set -u
cd "$(dirname "$0")/.."
A=${1:-.artifacts}
W="bash scripts/with_tpu.sh"

stage() { # stage <name> <cmd...>
  local name=$1; shift
  if [ -f "$A/.done_$name" ]; then echo "[chain3] $name: done, skipping"; return 0; fi
  echo "[chain3] $name: start $(date -u +%H:%M:%S)"
  "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then echo "[chain3] $name FAILED rc=$rc"; exit $rc; fi
  touch "$A/.done_$name"
  echo "[chain3] $name: ok $(date -u +%H:%M:%S)"
}

# --- wait for part 2 (up to 6h) --------------------------------------------
for _ in $(seq 1 1440); do
  [ -f "$A/.done_sparse_real_r3" ] && break
  sleep 15
done
if [ ! -f "$A/.done_sparse_real_r3" ]; then
  echo "[chain3] timed out waiting for part 2 (.done_sparse_real_r3)"; exit 1
fi

stage big_pt $W python scripts/lm_pretrain.py --data "$A/pretrain_corpus.jsonl" \
  --extra-corpus "$A/docstring_beir/corpus.jsonl" --out "$A/lm_pt_big" \
  --hidden 896 --layers 14 --heads 14 --kv-heads 7 --intermediate 2688 \
  --steps 24000
stage q_big $W python scripts/quality_study.py --data "$A/docstring_beir" \
  --out "$A/q_big" --init-trunk "$A/lm_pt_big" --distill \
  --train-file "$A/docstring_beir/train/docstrings_bm25.jsonl" --steps 12000
echo "[chain3] all stages complete"
