"""Streaming data pipeline: seeded shuffle-buffer streams over domain files.

Pins the properties the reference gets from HF iterable datasets
(utils/data_utils.py:500-597, homogenous_iterable_dataset.py:23-246):
determinism, sharding partition, shuffle, bounded memory, homogenous
batches, budgets, and resume fast-forward equivalence.
"""
import json
import os
from itertools import islice

import numpy as np
import pytest

from lightretriever_tpu.arguments import DomainConfig
from lightretriever_tpu.training.streaming import (
    StreamingDomain,
    interleave_streams,
    load_domain_streams,
)


@pytest.fixture()
def domain_file(tmp_path):
    path = tmp_path / "dom.jsonl"
    with open(path, "w") as f:
        for i in range(200):
            f.write(json.dumps({"query": f"q{i}", "idx": i}) + "\n")
    return str(path)


def test_deterministic_given_seed(domain_file):
    a = [r["idx"] for r in islice(iter(StreamingDomain(domain_file, seed=7)), 300)]
    b = [r["idx"] for r in islice(iter(StreamingDomain(domain_file, seed=7)), 300)]
    c = [r["idx"] for r in islice(iter(StreamingDomain(domain_file, seed=8)), 300)]
    assert a == b
    assert a != c


def test_epoch_covers_all_rows_shuffled(domain_file):
    s = StreamingDomain(domain_file, seed=0, buffer_size=32)
    epoch0 = [r["idx"] for r in s.iter_epoch(0)]
    epoch1 = [r["idx"] for r in s.iter_epoch(1)]
    assert sorted(epoch0) == list(range(200))  # full coverage, no dupes
    assert epoch0 != list(range(200))          # actually shuffled
    assert epoch0 != epoch1                    # reshuffled per epoch


def test_sharding_partitions_rows(domain_file):
    shards = [StreamingDomain(domain_file, seed=0, shard_index=i, shard_count=4)
              for i in range(4)]
    seen = [sorted(r["idx"] for r in s.iter_epoch(0)) for s in shards]
    union = sorted(x for part in seen for x in part)
    assert union == list(range(200))           # exact partition
    assert all(len(p) == 50 for p in seen)     # balanced
    assert seen[0] == list(range(0, 200, 4))   # round-robin by row index


def test_bounded_buffer(domain_file):
    # buffer smaller than the file still yields everything exactly once
    s = StreamingDomain(domain_file, seed=3, buffer_size=8)
    assert sorted(r["idx"] for r in s.iter_epoch(0)) == list(range(200))


def test_stamping_and_instruction(domain_file):
    s = StreamingDomain(domain_file, name="msmarco", domain_id=5,
                        instruction="Find relevant passages")
    rec = next(iter(s))
    assert rec["domain_name"] == "msmarco"
    assert rec["domain_ids"] == 5
    assert rec["instruction"] == "Find relevant passages"


def test_skip_fast_matches_islice(domain_file):
    s = StreamingDomain(domain_file, seed=11, buffer_size=16)
    ref = [r["idx"] for r in islice(iter(s), 250, 330)]
    fast = [r["idx"] for r in islice(s.skip_fast(250), 80)]
    assert ref == fast


def test_parquet_stream(tmp_path):
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    path = str(tmp_path / "dom.parquet")
    table = pa.table({"query": [f"q{i}" for i in range(100)],
                      "idx": list(range(100))})
    pq.write_table(table, path)
    s = StreamingDomain(path, seed=0, buffer_size=16)
    assert sorted(r["idx"] for r in s.iter_epoch(0)) == list(range(100))
    sh = StreamingDomain(path, seed=0, shard_index=1, shard_count=2)
    assert sorted(r["idx"] for r in sh.iter_epoch(0)) == list(range(1, 100, 2))


def test_interleave_streams_homogenous_and_budget(tmp_path):
    files = {}
    for name, n in [("alpha", 64), ("beta", 64)]:
        p = tmp_path / f"{name}.jsonl"
        with open(p, "w") as f:
            for i in range(n):
                f.write(json.dumps({"query": f"{name}{i}"}) + "\n")
        files[name] = str(p)
    cfg = DomainConfig(domain_ids={"alpha": 0, "beta": 1},
                       domain_weights={"alpha": 0.5, "beta": 0.5})
    streams = load_domain_streams(cfg, str(tmp_path), seed=0, buffer_size=8)
    it = interleave_streams(streams, weights=cfg.domain_weights, seed=0,
                            homogenous_batch_size=8,
                            max_per_domain={"alpha": 24, "beta": 24})
    rows = list(it)
    # budget: exactly 24+24 draws (homogenous runs of 8 divide both budgets)
    assert len(rows) == 48
    names = [r["domain_name"] for r in rows]
    for i in range(0, len(rows), 8):
        assert len(set(names[i:i + 8])) == 1  # homogenous batches
    assert names.count("alpha") == 24 and names.count("beta") == 24


def test_interleave_streams_weight_ratios(tmp_path):
    for name in ("heavy", "light"):
        with open(tmp_path / f"{name}.jsonl", "w") as f:
            for i in range(32):
                f.write(json.dumps({"query": f"{name}{i}"}) + "\n")
    cfg = DomainConfig(domain_ids={"heavy": 0, "light": 1})
    streams = load_domain_streams(cfg, str(tmp_path), seed=0, buffer_size=8)
    rows = list(islice(interleave_streams(
        streams, weights={"heavy": 0.9, "light": 0.1}, seed=0), 1000))
    frac = sum(r["domain_name"] == "heavy" for r in rows) / len(rows)
    assert 0.85 < frac < 0.95


def test_fit_end_to_end_streaming(tmp_path):
    """fit.main(streaming=True) trains a tiny model end-to-end from files."""
    import jax

    from lightretriever_tpu.arguments import (
        DataArguments,
        ModelArguments,
        TrainingArguments,
    )
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.training import fit
    from tokenizer_fixture import make_tiny_tokenizer

    tok = make_tiny_tokenizer()
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    with open(data_dir / "toy.jsonl", "w") as f:
        for i in range(64):
            words = " ".join(rng.choice(["cat", "dog", "fox", "zebra"], 3))
            f.write(json.dumps({
                "query": words,
                "positive_passages": [{"text": words + " document"}],
                "negative_passages": [{"text": "quantum qubits recipe"}],
            }) + "\n")
    cfg_path = tmp_path / "domains.json"
    with open(cfg_path, "w") as f:
        json.dump({"domain_ids": {"toy": 0}, "domain_weights": {"toy": 1.0}}, f)

    cfg = DecoderConfig(vocab_size=tok.vocab_size + 10, hidden_size=32,
                        intermediate_size=64, num_hidden_layers=1,
                        num_attention_heads=2, num_key_value_heads=2,
                        max_position_embeddings=128)
    margs = ModelArguments(attn_implementation="xla")
    dargs = DataArguments(domain_config_path=str(cfg_path), streaming=True,
                          shuffle_buffer_size=16, q_max_len=16, p_max_len=16,
                          train_n_passages=2, pad_to_max_length=False,
                          length_buckets=(16,))
    targs = TrainingArguments(
        output_dir=str(tmp_path / "out"), max_steps=2, logging_steps=1,
        per_device_train_batch_size=1, save_steps=0, bf16=False,
        report_to=())
    logs = fit.main(margs, dargs, targs, tokenizer=tok, config=cfg,
                    train_data_dir=str(data_dir), model_cls="encoder",
                    resume=False)
    assert np.isfinite(logs["loss"])


def test_pooled_collation_deterministic(tmp_path):
    """workers>1 must produce byte-identical batches in identical order
    (sampling stays serial; only tokenization fans out)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from tokenizer_fixture import make_tiny_tokenizer

    from lightretriever_tpu.training.data import (
        IterableTrainCollator,
        train_dataloader,
    )

    path = tmp_path / "d.jsonl"
    with open(path, "w") as f:
        for i in range(200):
            f.write(json.dumps({
                "query": f"question about topic {i % 7}",
                "positive_passages": [{"text": f"document number {i}"}],
                "negative_passages": [{"text": f"document number {i+1}"},
                                      {"text": f"document number {i+2}"}],
            }) + "\n")

    def batches(workers):
        tok = make_tiny_tokenizer()
        col = IterableTrainCollator(tokenizer=tok, q_max_len=16, p_max_len=16,
                                    train_n_passages=2, seed=3)
        s = StreamingDomain(str(path), seed=0, buffer_size=16)
        return list(islice(train_dataloader(
            iter(s), col, 8, workers=workers), 12))

    a, b = batches(1), batches(4)
    assert len(a) == len(b) == 12
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["query"]["input_ids"],
                                      bb["query"]["input_ids"])
        np.testing.assert_array_equal(ba["passage"]["input_ids"],
                                      bb["passage"]["input_ids"])
