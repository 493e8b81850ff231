"""Evaluation harness: retrieval metrics (nDCG/MAP/recall/precision/MRR) and a
BEIR-compatible search-and-score driver for parity checks against the reference."""
