"""Retrieval engines: exact kNN on MXU, sparse term-impact scorer, hybrid search,
score fusion, and BM25 baseline — the TPU-native replacements for Faiss and
Anserini/Lucene."""
