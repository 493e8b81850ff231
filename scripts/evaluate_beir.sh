#!/usr/bin/env bash
# BEIR evaluation launch (parity: reference eval/call_evaluate_mteb.sh).
# torchrun + RPC bring-up is gone: SPMD encode uses every chip from one process.
set -euo pipefail

MODEL_DIR=${1:?usage: evaluate_beir.sh MODEL_DIR BEIR_ROOT [TASKS...]}
BEIR_ROOT=${2:?}
shift 2
TASKS=${@:-scifact nfcorpus fiqa}

python - "$MODEL_DIR" "$BEIR_ROOT" $TASKS <<'PY'
import sys
from lightretriever_tpu.arguments import EvalArguments, ModelArguments
from lightretriever_tpu.evaluation.harness import launch_eval
from lightretriever_tpu.inference.encode import SpmdEncoder
from lightretriever_tpu.models.encoder import EncoderModel
from lightretriever_tpu.parallel.mesh import create_mesh
from lightretriever_tpu.utils.tokenizer_utils import load_tokenizer

model_dir, beir_root, *tasks = sys.argv[1:]
ma = ModelArguments(pooling_strategy="lasttoken")
model, params = EncoderModel.load(model_dir, ma)
tok = load_tokenizer(model_dir)
mesh = create_mesh((-1,), ("data",))
encoder = SpmdEncoder(model, params, tok, mesh=mesh)
args = EvalArguments(encode_batch_size=256, corpus_chunk_size=100_000, top_k=1000)
print(launch_eval(args, encoder, {t: f"{beir_root}/{t}" for t in tasks}, mesh=mesh))
PY
