"""Minimal standalone asymmetric inference recipe.

Parity with the reference's notebooks (reference: scripts/
asymmetric_sparse_infer.ipynb / cache_embedding_bag.ipynb): cache an
EmbeddingBag from a trained hybrid checkpoint, then serve

  asymmetric dense:  query = mean of cached per-token rows + L2 norm
                     (zero LLM forwards at query time)
  asymmetric sparse: query = Counter(input_ids) token counts
  documents:         LoRA-merged LLM forward -> lasttoken pooling (dense) /
                     log1p(relu(max_s(h W_vocab))) (sparse)

Run: python scripts/asymmetric_inference_example.py MODEL_DIR
"""
import sys

import numpy as np

from lightretriever_tpu.arguments import InferenceArguments, ModelArguments, TrainingArguments
from lightretriever_tpu.inference.encode import SpmdEncoder
from lightretriever_tpu.models.encoder import EncoderModel
from lightretriever_tpu.models.hybrid import HybridModel
from lightretriever_tpu.parallel.mesh import create_mesh
from lightretriever_tpu.retriever.search import HybridSearch
from lightretriever_tpu.utils.tokenizer_utils import load_tokenizer


def main(model_dir: str):
    ma = ModelArguments(
        pooling_strategy="lasttoken",
        hybrid_use_dense_vector=True, hybrid_use_sparse_vector=True,
        hybrid_use_emb_vector=True, hybrid_use_token_id_vector=True,
        noncontextual_query_embedding=True,
        sparse_use_relu=True, sparse_use_log_saturation=True,
    )
    base, params = EncoderModel.load(model_dir, ma)
    model = HybridModel(ma, TrainingArguments(), base.config_qry,
                        eos_token_id=base.eos_token_id)
    tok = load_tokenizer(model_dir)
    mesh = create_mesh((-1,), ("data",))
    enc = SpmdEncoder(model, params, tok, args=InferenceArguments(), mesh=mesh)

    # One-time: build + cache the [V, H] EmbeddingBag (save to reuse)
    table = enc.cache_emb_bag()
    np.save(f"{model_dir}/emb_bag.npy", table)

    corpus = {
        "d1": {"text": "TPUs connect chips over high-bandwidth ICI links."},
        "d2": {"text": "Chocolate cake needs cocoa, butter and flour."},
    }
    queries = {"q1": "how are tpu chips connected"}
    searcher = HybridSearch(enc, vocab_size=model.config_qry.vocab_size,
                            mesh=mesh, return_all_results=True)
    results = searcher.search(corpus, queries, top_k=2)
    for system, res in results.items():
        print(system, res["q1"])


if __name__ == "__main__":
    main(sys.argv[1])
