"""IO readers, profiling utils, rerank fit entry smoke."""
import json

import numpy as np
import pytest

from lightretriever_tpu.utils.io import build_corpus_idx_to_row, read_corpus
from lightretriever_tpu.utils.profiling import PhaseTimer


def test_read_corpus_formats(tmp_path):
    rows = [{"_id": "a", "text": "hello"}, {"_id": "b", "text": "world"}]
    jp = tmp_path / "c.jsonl"
    with open(jp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    assert read_corpus(str(jp)) == rows
    assert read_corpus(str(jp), max_rows=1) == rows[:1]

    tp = tmp_path / "c.tsv"
    with open(tp, "w") as f:
        f.write("_id\ttext\na\thello\nb\tworld\n")
    assert read_corpus(str(tp))[0]["text"] == "hello"

    import pyarrow as pa
    import pyarrow.parquet as pq

    pp = tmp_path / "c.parquet"
    pq.write_table(pa.Table.from_pylist(rows), str(pp))
    assert read_corpus(str(pp)) == rows

    assert build_corpus_idx_to_row(rows) == {"a": 0, "b": 1}


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("encode", n_items=10):
        pass
    with t.phase("encode"):
        pass
    s = t.summary()
    assert s["encode"]["calls"] == 2 and s["encode"]["total_s"] >= 0


def test_rerank_fit_main(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from tokenizer_fixture import make_tiny_tokenizer
    from lightretriever_tpu.arguments import DataArguments, TrainingArguments
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.rerank.fit import RerankerArguments, main

    tiny = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=True)
    d = tmp_path / "data"
    d.mkdir()
    topics = ["fox dog", "chocolate cake", "tpu chips", "zebra safari"]
    with open(d / "msmarco.jsonl", "w") as f:
        for i, t in enumerate(topics * 2):
            f.write(json.dumps({
                "query": f"question about {t}",
                "positive_passages": [{"text": f"document about {t}"}],
                "negative_passages": [{"text": f"document about {topics[(i+1)%4]}"}],
            }) + "\n")
    cfg = tmp_path / "domains.json"
    with open(cfg, "w") as f:
        json.dump({"domain_ids": {"msmarco": 0}, "domain_weights": {"msmarco": 1.0}}, f)
    ma = RerankerArguments(pooling_strategy="lasttoken", attn_implementation="xla")
    da = DataArguments(domain_config_path=str(cfg), train_n_passages=2, p_max_len=32)
    ta = TrainingArguments(output_dir=str(tmp_path / "out"), max_steps=2,
                           logging_steps=1, save_steps=0, bf16=False,
                           per_device_train_batch_size=1, learning_rate=1e-3)
    logs = main(ma, da, ta, tokenizer=make_tiny_tokenizer(), config=tiny,
                train_data_dir=str(d), resume=False)
    assert np.isfinite(logs["loss"])
