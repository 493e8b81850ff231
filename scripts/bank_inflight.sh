#!/bin/bash
# Bank a MID-FLIGHT study stage so the next round resumes it from its newest
# checkpoint instead of retraining from step 0. Companion to r5_restore.sh:
# the driver wipes untracked files between rounds, so anything not under
# banked/ is lost — banking a 3000-step checkpoint saves ~45 min of chip.
#
# Banks only what resume needs: the newest checkpoint-<N>/ (orbax state,
# found by training.trainer.find_last_checkpoint), train_log.jsonl, and the
# tokenizer if the stage wrote one. Finished outputs (model/, predictions,
# summaries) are banked whole by hand as before — this script is for the
# stage the wall-clock cut.
#
# Usage: bash scripts/bank_inflight.sh <stage> [artifacts_dir]
#   e.g. bash scripts/bank_inflight.sh q_s2
set -eu
cd "$(dirname "$0")/.."
STAGE=$1
A=${2:-.artifacts}
SRC="$A/$STAGE"
DST="banked/inflight/$STAGE"
[ -d "$SRC" ] || { echo "no $SRC"; exit 1; }

# Sort on the BASENAME's numeric step suffix: a dash anywhere in $A (e.g.
# /tmp/my-run) would shift `sort -t- -k2` onto a non-numeric field and bank
# an older checkpoint as "newest" (ADVICE r4 low).
CKPT=$(ls -d "$SRC"/checkpoint-* 2>/dev/null \
  | awk -F/ '{print $NF"\t"$0}' | sort -t- -k2 -n | cut -f2- | tail -1 || true)
[ -n "$CKPT" ] || { echo "no checkpoint in $SRC yet"; exit 1; }

rm -rf "$DST"
mkdir -p "$DST"
cp -r "$CKPT" "$DST/"
for f in train_log.jsonl tokenizer; do
  [ -e "$SRC/$f" ] && cp -r "$SRC/$f" "$DST/"
done
du -sh "$DST"
echo "banked $DST ($(basename "$CKPT")); r5_restore.sh will restore it"
