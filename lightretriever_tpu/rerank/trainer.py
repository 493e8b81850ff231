"""Reranker trainer: same SPMD runtime, listwise loss
(parity: rerank/fit.py wiring of CrossEncoder into the HF Trainer)."""
from __future__ import annotations

from ..training.trainer import ContrastiveTrainer


class RerankTrainer(ContrastiveTrainer):
    """Train batches: {'pairs': tokenized pair batch [B*n_psg, L]}."""

    def _loss_fn(self, params, batch, reg_factor):
        out = self.model.forward(params, batch["pairs"], training=True)
        return out.loss, dict(out.logs)
