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
