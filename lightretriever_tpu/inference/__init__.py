"""Inference layer: SPMD encoding engine, collators, sparse converters.

TPU-native replacement of the reference's torch-RPC encode farm
(reference: inference/exact_search_torchrpc.py): instead of rank0 feeding
chunks to workers over TensorPipe, every chip computes a shard of one
pjit-ed batch — the host streams tokenized arrays, XLA handles the rest.
"""
