"""Harvest an in-image LM-pretraining corpus (round 3, VERDICT #1).

The reference's retrieval quality comes from pretrained init (Llama-3.1-8B,
scripts/finetune_example.sh:18); this zero-egress image ships no checkpoints,
but it does ship ~450MB of text — the Python sources, docstrings, and docs of
the standard library and site-packages. This script harvests that text for
next-token pretraining (scripts/lm_pretrain.py) so the from-scratch quality
study starts from a language model instead of random init.

Leakage control: the docstring benchmark's *test queries* are summary lines
that appear verbatim inside these source files, immediately followed by the
docstring body — pretraining on that adjacency would memorize the test
mapping. Any line whose normalized text equals a test-query text is dropped
(--queries). Corpus *documents* stay: every retrieval system (BM25 included)
sees the corpus by construction.

Usage:
  python scripts/harvest_pretrain_corpus.py --out /tmp/pretrain_corpus.jsonl \
      --queries /tmp/docstring_beir/queries.jsonl
"""
from __future__ import annotations

import argparse
import json
import os
import re

ROOTS = ["/usr/local/lib/python3.12", "/opt/venv/lib/python3.12/site-packages"]
SKIP_DIRS = {"__pycache__", "node_modules", "_vendor", "vendored", "locale",
             ".dist-info", "tests", "test", "testing"}
EXTS = (".py", ".md", ".rst", ".txt")
_WS = re.compile(r"\s+")


def norm(s: str) -> str:
    return _WS.sub(" ", s).strip().lower()


def iter_files():
    for root in ROOTS:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames
                           if d not in SKIP_DIRS and not d.endswith(".dist-info")]
            for f in sorted(filenames):
                if f.endswith(EXTS):
                    yield os.path.join(dirpath, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--queries", default=None,
                    help="BEIR queries.jsonl whose text lines must be excluded")
    ap.add_argument("--chunk-chars", type=int, default=4000)
    ap.add_argument("--max-file-mb", type=float, default=2.0)
    args = ap.parse_args()

    banned: set[str] = set()
    if args.queries:
        with open(args.queries) as f:
            for line in f:
                banned.add(norm(json.loads(line)["text"]))
    print(f"excluding {len(banned)} test-query lines")

    n_files = n_chunks = n_banned = total = 0
    with open(args.out, "w") as out:
        for path in iter_files():
            try:
                if os.path.getsize(path) > args.max_file_mb * 1e6:
                    continue
                with open(path, errors="ignore") as f:
                    lines = f.readlines()
            except OSError:
                continue
            n_files += 1
            kept = []
            for ln in lines:
                if banned and norm(ln) in banned:
                    n_banned += 1
                    continue
                kept.append(ln)
            buf: list[str] = []
            size = 0
            for ln in kept + [None]:
                if ln is None or (size + len(ln) > args.chunk_chars and buf):
                    text = "".join(buf).strip()
                    if len(text) > 200:
                        out.write(json.dumps({"text": text}) + "\n")
                        n_chunks += 1
                        total += len(text)
                    buf, size = [], 0
                if ln is not None:
                    buf.append(ln)
                    size += len(ln)
    print(json.dumps({"files": n_files, "chunks": n_chunks,
                      "banned_lines_dropped": n_banned,
                      "chars_mb": round(total / 1e6, 1)}))


if __name__ == "__main__":
    main()
