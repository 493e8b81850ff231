"""Reranker data: pair collators, training sampling, trec run-file IO.

Behavioral parity with the reference (reference: rerank/data_utils.py,
inference/rerank.py:276-299 pair collator, rerank/__main__.py:90-95 +
utils/data_utils.py:360-378 tsv run parsing), static-shape numpy outputs.
"""
from __future__ import annotations

import csv
import random
from collections import defaultdict
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

from ..inference.collator import bucket_length, pad_ragged

RERANK_PASSAGE_PREFIX = "\nPassage: "


def format_pair(query: str, passage: dict | str,
                query_prompt: str = "", passage_prefix: str = RERANK_PASSAGE_PREFIX):
    """(query text, passage text) for pair tokenization. The reference always
    prefixes passages with ``\\nPassage: `` in reranker format
    (utils/prompts.py get_prompt note)."""
    if isinstance(passage, dict):
        text = passage.get("text", "")
        if passage.get("title"):
            text = passage["title"] + " " + text
    else:
        text = str(passage)
    return query_prompt + query, passage_prefix + text


@dataclass
class PairCollator:
    """(query, passage) pairs -> tokenized static-shape batch."""

    tokenizer: Any
    max_len: int = 1024
    length_buckets: tuple[int, ...] = (128, 256, 512, 1024)
    pad_to_max_length: bool = False
    query_prompt: str = ""

    def __call__(self, pairs: list[tuple[str, Any]]) -> dict[str, np.ndarray]:
        qs, ps = [], []
        for q, p in pairs:
            fq, fp = format_pair(q, p, query_prompt=self.query_prompt)
            qs.append(fq)
            ps.append(fp)
        enc = self.tokenizer(qs, ps, max_length=self.max_len, truncation=True,
                             padding=False, add_special_tokens=True)
        ids = enc["input_ids"]
        longest = max((len(r) for r in ids), default=1)
        width = self.max_len if self.pad_to_max_length else min(
            bucket_length(longest, self.length_buckets), self.max_len)
        pad = self.tokenizer.pad_token_id or 0
        return {
            "input_ids": pad_ragged(ids, pad, width=width),
            "attention_mask": pad_ragged([[1] * len(r) for r in ids], 0, width=width),
        }


@dataclass
class RerankTrainCollator(PairCollator):
    """Training groups -> pairs [pos, neg...] per query, collated
    (parity: rerank/data_utils.py sampling + listwise layout)."""

    train_n_passages: int = 8
    seed: int = 42
    positive_passage_no_shuffle: bool = False
    negative_passage_no_shuffle: bool = False

    def __post_init__(self):
        self.rng = random.Random(self.seed)

    def get_item(self, g: dict) -> list[tuple[str, Any, float]]:
        """Sample [pos, negs...] triples (query, passage, teacher score) for
        one group (serial, rng-ordered; worker-pool get_item/collate_items
        protocol, training/data.py). Teacher scores ride along when the rows
        carry ``ce_score`` annotations (listwise distillation)."""
        positives = g["positive_passages"]
        pos = positives[0] if self.positive_passage_no_shuffle \
            else self.rng.choice(positives)
        negatives = g["negative_passages"]
        n_neg = self.train_n_passages - 1
        if len(negatives) < n_neg:
            negs = self.rng.choices(negatives, k=n_neg) if negatives else []
        elif self.negative_passage_no_shuffle:
            negs = negatives[:n_neg]
        else:
            negs = self.rng.sample(negatives, k=n_neg)
        prompt = g.get("query_prompt", "") or ""

        def ce(p):
            v = p.get("ce_score") if isinstance(p, dict) else None
            return float(v) if v is not None else float("nan")

        return [(prompt + g["query"], p, ce(p)) for p in [pos] + negs]

    def collate_items(self, items: list[tuple[str, Any, float]]) -> dict[str, np.ndarray]:
        batch = PairCollator.__call__(self, [(q, p) for q, p, _ in items])
        scores = np.asarray([s for _, _, s in items], np.float32)
        if np.isfinite(scores).all():
            batch["ce_scores"] = scores.reshape(-1, self.train_n_passages)
        return batch

    def __call__(self, groups: list[dict]) -> dict[str, np.ndarray]:
        return self.collate_items(
            [p for g in groups for p in self.get_item(g)])


def read_trec_run(path: str, top_k: Optional[int] = None) -> dict[str, list[tuple[str, float]]]:
    """Read a trec-style run tsv: ``qid\\tpid\\tscore`` (or 6-col trec) ->
    {qid: [(pid, score), ...]} sorted by score desc, truncated to top_k
    (parity: utils/data_utils.py:360-378 process_tsv_file)."""
    runs: dict[str, list[tuple[str, float]]] = defaultdict(list)
    with open(path) as f:
        for row in csv.reader(f, delimiter="\t"):
            if not row or row[0].startswith("#"):
                continue
            if len(row) >= 6:     # trec: qid Q0 pid rank score tag
                qid, pid, score = row[0], row[2], float(row[4])
            elif len(row) >= 3:
                qid, pid, score = row[0], row[1], float(row[2])
            else:
                continue
            runs[qid].append((pid, score))
    out = {}
    for qid, items in runs.items():
        items.sort(key=lambda x: -x[1])
        out[qid] = items[:top_k] if top_k else items
    return out


def write_trec_run(path: str, results: dict[str, dict[str, float]], tag: str = "rerank"):
    """Write {qid: {pid: score}} as a sorted trec run file
    (parity: rerank/__main__.py:191-211)."""
    with open(path, "w") as f:
        for qid in results:
            ranked = sorted(results[qid].items(), key=lambda kv: -kv[1])
            for rank, (pid, score) in enumerate(ranked, start=1):
                f.write(f"{qid}\tQ0\t{pid}\t{rank}\t{score:.6f}\t{tag}\n")
