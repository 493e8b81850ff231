"""Corpus readers: jsonl / parquet / tsv (parity: utils/data_utils.py:300-378
read_corpus + process_tsv_file, without HF-datasets arrow machinery)."""
from __future__ import annotations

import csv
import json
import os
from typing import Optional


def read_corpus(path: str, max_rows: Optional[int] = None) -> list[dict]:
    """Load records from .jsonl/.json, .parquet, or .tsv/.csv by extension."""
    ext = os.path.splitext(path)[1].lower()
    rows: list[dict] = []
    if ext in (".jsonl", ".json"):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rows.append(json.loads(line))
                if max_rows and len(rows) >= max_rows:
                    break
    elif ext == ".parquet":
        import pyarrow.parquet as pq

        table = pq.read_table(path)
        rows = table.to_pylist()
        if max_rows:
            rows = rows[:max_rows]
    elif ext in (".tsv", ".csv"):
        delim = "\t" if ext == ".tsv" else ","
        with open(path) as f:
            reader = csv.DictReader(f, delimiter=delim)
            for rec in reader:
                rows.append(dict(rec))
                if max_rows and len(rows) >= max_rows:
                    break
    else:
        raise NotImplementedError(f"Unsupported corpus format: {ext}")
    return rows


def build_corpus_idx_to_row(rows: list[dict],
                            id_names=("id", "_id", "docid", "doc_id")) -> dict[str, int]:
    """id -> row index map (parity: utils/data_utils.py build_corpus_idx_to_row)."""
    out: dict[str, int] = {}
    for i, rec in enumerate(rows):
        for name in id_names:
            if name in rec:
                out[str(rec[name])] = i
                break
        else:
            out[str(i)] = i
    return out
