"""Build a real-text BEIR-layout retrieval benchmark from Python docstrings.

Zero-egress substitute for BEIR SciFact/NFCorpus (BASELINE.md north star):
this image ships no datasets and no network, but it does ship ~70k natural-
English technical passages — the docstrings of the standard library and
site-packages. Task construction (standard title->body retrieval, the same
shape as S2ORC_title_abstract / ccnews_title_text in the reference's mixture,
config/data/single_dataset/):

  query  = docstring summary line
  doc    = docstring body (summary stripped), title = qualified symbol name
  qrel   = identity (each summary is relevant to its own body)

AST-parsed (no imports), deduplicated, doctest lines stripped, ambiguous
summaries (appearing on >1 distinct body) dropped. Split is deterministic by
doc-id hash; eval queries search the FULL corpus. Train rows carry BM25 hard
negatives mined with retriever/sparse_scorer.BM25Index (TPU path).

Usage:
  python scripts/build_docstring_beir.py --out /tmp/docstring_beir \
      [--max-test 1500] [--hard-negatives 12]
"""
from __future__ import annotations

import argparse
import ast
import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOTS = ["/usr/lib/python3.12", "/opt/venv/lib/python3.12/site-packages"]
SKIP_DIRS = {"test", "tests", "testing", "__pycache__", "node_modules",
             "_vendor", "vendored"}

_DOCTEST = re.compile(r"^\s*(>>>|\.\.\.).*$", re.MULTILINE)
_WS = re.compile(r"\s+")


def clean(text: str, max_words: int = 300) -> str:
    text = _DOCTEST.sub("", text)
    text = _WS.sub(" ", text).strip()
    words = text.split()
    return " ".join(words[:max_words])


def alpha_ratio(s: str) -> float:
    if not s:
        return 0.0
    return sum(c.isalpha() or c.isspace() for c in s) / len(s)


def harvest() -> list[dict]:
    rows, seen_bodies = [], set()
    for root in ROOTS:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fn)
                try:
                    with open(path, encoding="utf-8", errors="ignore") as f:
                        tree = ast.parse(f.read())
                except (SyntaxError, ValueError, OSError):
                    continue
                mod = os.path.relpath(path, root)[:-3].replace(os.sep, ".")
                for node in ast.walk(tree):
                    if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                             ast.ClassDef, ast.Module)):
                        continue
                    ds = ast.get_docstring(node)
                    if not ds:
                        continue
                    lines = ds.strip().split("\n")
                    summary = clean(lines[0], max_words=48)
                    body = clean("\n".join(lines[1:]))
                    if not (4 <= len(summary.split()) <= 40):
                        continue
                    if len(body.split()) < 25:
                        continue
                    if alpha_ratio(body) < 0.72 or alpha_ratio(summary) < 0.72:
                        continue
                    h = hashlib.sha1(body.encode()).hexdigest()[:16]
                    if h in seen_bodies:
                        continue
                    seen_bodies.add(h)
                    name = getattr(node, "name", "") or mod.rsplit(".", 1)[-1]
                    rows.append({"_id": h, "title": f"{mod}.{name}" if name else mod,
                                 "summary": summary, "text": body})
    # Drop ambiguous summaries (same query, different gold docs)
    by_summary: dict[str, int] = {}
    for r in rows:
        by_summary[r["summary"]] = by_summary.get(r["summary"], 0) + 1
    rows = [r for r in rows if by_summary[r["summary"]] == 1]
    return rows


def mine_hard_negatives(rows, train_rows, k: int, batch: int = 512):
    """BM25 top-k (excluding gold) per train query, on the TPU impact path."""
    import numpy as np

    from lightretriever_tpu.retriever.sparse_scorer import BM25Index

    index = BM25Index()
    index.add([r["title"] + " " + r["text"] for r in rows])
    ids = [r["_id"] for r in rows]
    out = []
    for i in range(0, len(train_rows), batch):
        chunk = train_rows[i: i + batch]
        scores, idx = index.search([r["summary"] for r in chunk], k + 1)
        idx = np.asarray(idx)
        for r, cand in zip(chunk, idx):
            negs = [ids[j] for j in cand if j >= 0 and ids[j] != r["_id"]][:k]
            out.append(negs)
        print(f"  mined {min(i + batch, len(train_rows))}/{len(train_rows)}",
              flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-test", type=int, default=1500)
    ap.add_argument("--hard-negatives", type=int, default=12)
    ap.add_argument("--max-docs", type=int, default=0, help="cap corpus (debug)")
    args = ap.parse_args()

    print("harvesting docstrings ...", flush=True)
    rows = harvest()
    if args.max_docs:
        rows = rows[: args.max_docs]
    print(f"kept {len(rows)} unique (summary, body) pairs", flush=True)

    def split_of(r):
        return "test" if int(r["_id"], 16) % 20 == 0 else "train"

    test_rows = [r for r in rows if split_of(r) == "test"][: args.max_test]
    test_ids = {r["_id"] for r in test_rows}
    train_rows = [r for r in rows if r["_id"] not in test_ids]

    os.makedirs(os.path.join(args.out, "qrels"), exist_ok=True)
    with open(os.path.join(args.out, "corpus.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps({"_id": r["_id"], "title": r["title"],
                                "text": r["text"]}) + "\n")
    with open(os.path.join(args.out, "queries.jsonl"), "w") as f:
        for r in test_rows:
            f.write(json.dumps({"_id": "q" + r["_id"], "text": r["summary"]}) + "\n")
    with open(os.path.join(args.out, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for r in test_rows:
            f.write(f"q{r['_id']}\t{r['_id']}\t1\n")

    print("mining BM25 hard negatives ...", flush=True)
    by_id = {r["_id"]: r for r in rows}
    negs = mine_hard_negatives(rows, train_rows, args.hard_negatives)
    os.makedirs(os.path.join(args.out, "train"), exist_ok=True)
    with open(os.path.join(args.out, "train", "docstrings.jsonl"), "w") as f:
        for r, neg_ids in zip(train_rows, negs):
            f.write(json.dumps({
                "query": r["summary"],
                "positive_passages": [{"docid": r["_id"], "title": r["title"],
                                       "text": r["text"]}],
                "negative_passages": [
                    {"docid": n, "title": by_id[n]["title"],
                     "text": by_id[n]["text"]} for n in neg_ids],
            }) + "\n")
    stats = {"corpus": len(rows), "test_queries": len(test_rows),
             "train_rows": len(train_rows),
             "hard_negatives_per_row": args.hard_negatives}
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
