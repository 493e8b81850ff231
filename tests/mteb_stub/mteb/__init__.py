"""Minimal mteb-compatible stub for exercising call_evaluate_mteb.

Mirrors the exact API surface the harness touches in the real ``mteb``
package (reference usage: eval/evaluate_mteb.py:53-139):

* ``mteb.get_tasks(tasks=[...], languages=[...])`` -> task objects with
  ``.metadata.name`` / ``.metadata.type`` / ``.hf_subsets``
* ``mteb.MTEB(tasks=[t]).run(model, output_folder=..., overwrite_results=...,
  corpus_chunk_size=..., k_values=..., top_k=..., save_predictions=...,
  eval_subsets=None, previous_results=None)`` — calls
  ``model.search(corpus, queries, top_k)`` exactly like mteb's
  RetrievalEvaluator does for models with a custom search fn, saves
  ``{name}_{subset}_predictions.json``, and loads ``previous_results``
  instead of searching when given.
* ``mteb.models.bm25.bm25_s`` — the ModelMeta object the reference borrows.

Deliberately self-contained: its own BEIR reader + nDCG so it is an
independent oracle of the harness's behavior.
"""
from __future__ import annotations

import csv
import json
import math
import os
import types
from dataclasses import dataclass, field

# --- the ModelMeta hack target (evaluate_mteb.py:66-69) ---------------------
models = types.SimpleNamespace(
    bm25=types.SimpleNamespace(bm25_s=types.SimpleNamespace(name="bm25s"))
)

# Module-level counter so tests can assert whether .search() ran
SEARCH_CALLS = 0

_TASK_REGISTRY: dict[str, "StubTask"] = {}


@dataclass
class _Meta:
    name: str
    type: str = "Retrieval"


@dataclass
class StubTask:
    metadata: _Meta
    data_dir: str = ""
    hf_subsets: list = field(default_factory=lambda: ["default"])
    languages: list = field(default_factory=lambda: ["en"])

    def load_data(self, split: str = "test"):
        corpus, queries, qrels = {}, {}, {}
        with open(os.path.join(self.data_dir, "corpus.jsonl")) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    corpus[str(r["_id"])] = {"title": r.get("title", ""),
                                             "text": r.get("text", "")}
        with open(os.path.join(self.data_dir, "queries.jsonl")) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    queries[str(r["_id"])] = r["text"]
        with open(os.path.join(self.data_dir, "qrels", f"{split}.tsv")) as f:
            rows = list(csv.reader(f, delimiter="\t"))
        for row in rows:
            if len(row) >= 3 and row[0].lower() not in ("query-id", "qid"):
                qrels.setdefault(row[0], {})[row[1]] = int(row[2])
        queries = {q: t for q, t in queries.items() if q in qrels}
        return corpus, queries, qrels


def register_beir_task(name: str, data_dir: str, task_type: str = "Retrieval"):
    _TASK_REGISTRY[name] = StubTask(_Meta(name, task_type), data_dir)
    return _TASK_REGISTRY[name]


def get_tasks(tasks=(), languages=()):
    out = []
    for name in tasks:
        if name not in _TASK_REGISTRY:
            raise KeyError(f"stub task {name!r} not registered")
        t = _TASK_REGISTRY[name]
        if languages and not set(languages) & set(t.languages):
            continue
        out.append(t)
    return out


def _ndcg_at_10(qrels, results) -> float:
    total = 0.0
    for qid, rels in qrels.items():
        ranked = sorted(results.get(qid, {}).items(),
                        key=lambda kv: kv[1], reverse=True)[:10]
        dcg = sum(rels.get(pid, 0) / math.log2(i + 2)
                  for i, (pid, _) in enumerate(ranked))
        idcg = sum(r / math.log2(i + 2)
                   for i, r in enumerate(sorted(rels.values(), reverse=True)[:10]))
        total += dcg / idcg if idcg else 0.0
    return total / max(len(qrels), 1)


@dataclass
class TaskResult:
    task_name: str
    scores: dict


class MTEB:
    def __init__(self, tasks):
        self.tasks = list(tasks)

    def run(self, model, *, output_folder="./results", overwrite_results=False,
            corpus_chunk_size=100_000, k_values=(10,), top_k=100,
            save_predictions=False, eval_subsets=None, previous_results=None,
            verbosity=0, score_function=None, **_ignored):
        global SEARCH_CALLS
        os.makedirs(output_folder, exist_ok=True)
        out = []
        for task in self.tasks:
            name = task.metadata.name
            res_path = os.path.join(output_folder, f"{name}.json")
            if os.path.exists(res_path) and not overwrite_results:
                with open(res_path) as f:
                    out.append(TaskResult(name, json.load(f)))
                continue
            corpus, queries, qrels = task.load_data()
            subsets = eval_subsets or task.hf_subsets
            for subset in subsets:
                if previous_results:
                    with open(previous_results) as f:
                        results = json.load(f)
                else:
                    SEARCH_CALLS += 1
                    results = model.search(corpus, queries, top_k=top_k)
                    if save_predictions:
                        pred = os.path.join(
                            output_folder, f"{name}_{subset}_predictions.json")
                        with open(pred, "w") as f:
                            json.dump(results, f)
                scores = {"ndcg_at_10": _ndcg_at_10(qrels, results)}
                with open(res_path, "w") as f:
                    json.dump(scores, f)
                out.append(TaskResult(name, scores))
        return out
