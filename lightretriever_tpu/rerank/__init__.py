"""Reranker: cross-encoder models (classification-head and yes-logit
variants), listwise training, SPMD batch scoring, and the offline rerank tool
— the TPU-native replacement of the reference's rerank/ subpackage."""
