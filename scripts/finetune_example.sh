#!/usr/bin/env bash
# Canonical fine-tune launch (parity: reference scripts/finetune_example.sh).
# No accelerate/torchrun matrix: one process drives the whole TPU mesh; the
# parallelism strategy is the sharding spec in the config (mesh_shape /
# shard_params), not a launcher flag.
set -euo pipefail

CONFIG=${1:-config/finetune_llama8b.json}
export TRAIN_DATA_DIR=${TRAIN_DATA_DIR:-/data/train_jsonls}

python -m lightretriever_tpu.training.fit "$CONFIG"
