#!/bin/bash
# Bank a FINISHED study stage into banked/ so the next round restores it
# instead of retraining (companion to bank_inflight.sh, which banks a
# mid-flight checkpoint). Copies only what downstream consumers need:
# model/ (HF-layout export), tokenizer/, the summary, predictions, and the
# train log — NOT the orbax checkpoint-*/ dirs (redundant once model/
# exists and ~3x its size).
#
# Usage: bash scripts/bank_finished.sh <stage> [artifacts_dir]
#   e.g. bash scripts/bank_finished.sh q_proj_s1 && git add banked/q_proj_s1
set -eu
cd "$(dirname "$0")/.."
STAGE=$1
A=${2:-.artifacts}
SRC="$A/$STAGE"
DST="banked/$STAGE"
[ -d "$SRC" ] || { echo "no $SRC"; exit 1; }
[ -d "$SRC/model" ] || { echo "no $SRC/model — stage not finished; use bank_inflight.sh"; exit 1; }

rm -rf "$DST"
mkdir -p "$DST"
for f in model tokenizer train_log.jsonl quality_summary.json \
         rerank_summary.json predictions.json.gz dense_embs.npz; do
  [ -e "$SRC/$f" ] && cp -r "$SRC/$f" "$DST/"
done
du -sh "$DST"
echo "banked $DST; commit it and r5_restore.sh restores it next round"
