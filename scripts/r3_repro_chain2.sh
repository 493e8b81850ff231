#!/bin/bash
# Round-3 quality-artifact chain, part 2 — runs after r3_repro_chain.sh.
#
# Regenerates the remaining round-3 evidence from the part-1 artifacts
# (docstring benchmark + BM25 teacher + retriever-trained trunk in
# .artifacts/q_r3b): the reranker study (VERDICT r2 next #3 recipe:
# retriever-trunk init + 8-way listwise CE + BM25 listwise KL) and the
# sparse/dense engine check on REAL trained-model outputs, now including
# the round-3 tiered exact engine.
#
# Waits for part 1's final sentinel so the chip is never shared
# (CLAUDE.md: one TPU client at a time).
#
# Usage: bash scripts/r3_repro_chain2.sh [artifacts_dir]
set -u
cd "$(dirname "$0")/.."
A=${1:-.artifacts}
W="bash scripts/with_tpu.sh"

stage() { # stage <name> <cmd...>
  local name=$1; shift
  if [ -f "$A/.done_$name" ]; then echo "[chain2] $name: done, skipping"; return 0; fi
  echo "[chain2] $name: start $(date -u +%H:%M:%S)"
  "$@"
  local rc=$?
  if [ $rc -ne 0 ]; then echo "[chain2] $name FAILED rc=$rc"; exit $rc; fi
  touch "$A/.done_$name"
  echo "[chain2] $name: ok $(date -u +%H:%M:%S)"
}

# --- wait for part 1 (up to 5h) --------------------------------------------
for _ in $(seq 1 1200); do
  [ -f "$A/.done_q_mrl" ] && break
  sleep 15
done
if [ ! -f "$A/.done_q_mrl" ]; then
  echo "[chain2] timed out waiting for part 1 (.done_q_mrl)"; exit 1
fi
if [ ! -f "$A/q_r3b/model/config.json" ]; then
  echo "[chain2] missing $A/q_r3b/model — part 1 did not save the trunk"; exit 1
fi

stage rr_r3 $W python scripts/rerank_study.py --data "$A/docstring_beir" \
  --out "$A/rr_r3" --init-trunk "$A/q_r3b" --tokenizer "$A/q_r3b/tokenizer" \
  --distill --n-passages 8 --steps 8000 \
  --train-file "$A/docstring_beir/train/docstrings_bm25.jsonl"
stage sparse_real_r3 $W python scripts/sparse_engine_real_check.py \
  --model "$A/q_r3b" --data "$A/docstring_beir" --docs 40000 --queries 1024
echo "[chain2] all stages complete"
