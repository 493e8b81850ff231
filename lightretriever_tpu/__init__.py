"""lightretriever_tpu — a TPU-native (JAX/XLA/Pallas/pjit) retrieval framework.

A from-scratch rebuild of the capabilities of caskcsg/lightretriever
(arXiv:2505.12260): LLM-based dual-tower retrievers with asymmetric query
encoders (cached EmbeddingBag / raw token counts), symmetric dense & sparse
(SPLADE-style) retrieval, hybrid fusion, MRL, LoRA contrastive fine-tuning,
cross-encoder reranking, and a BEIR/MTEB-compatible evaluation harness.

The compute path is JAX + Pallas (flash attention, max-linear-map streaming
vocab aggregation, exact-kNN matmul search on MXU); scaling is expressed as
`jax.sharding.Mesh` + NamedSharding over `pjit`, never hand-rolled RPC.
"""

__version__ = "0.1.0"

__all__ = ["__version__"]


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing jax-heavy modules on
    # `import lightretriever_tpu` alone)
    lazy = {
        "EncoderModel": ("lightretriever_tpu.models.encoder", "EncoderModel"),
        "HybridModel": ("lightretriever_tpu.models.hybrid", "HybridModel"),
        "SpmdEncoder": ("lightretriever_tpu.inference.encode", "SpmdEncoder"),
        "HybridSearch": ("lightretriever_tpu.retriever.search", "HybridSearch"),
        "ContrastiveTrainer": ("lightretriever_tpu.training.trainer", "ContrastiveTrainer"),
        "launch_eval": ("lightretriever_tpu.evaluation.harness", "launch_eval"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'lightretriever_tpu' has no attribute {name!r}")
