"""Experiment tracking: TB event-file writer + log-key rewriter.

The event files must open in stock TensorBoard, so the oracle here is the
installed ``tensorboard`` package's own EventFileLoader (independent of our
encoder), plus our dependency-free reader for round-trip.
"""
import math
import os

import numpy as np
import pytest

from lightretriever_tpu.utils.tracking import (
    JsonlWriter,
    TensorBoardWriter,
    build_writers,
    crc32c,
    read_tb_scalars,
    rewrite_logs,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_rewrite_logs_grouping():
    logs = {
        "loss": 1.0,
        "lr": 2e-5,
        "eval_ndcg": 0.5,
        "test_acc": 0.9,
        "channel/msmarco": 0.7,
        "spr_stats/q_l0": 12.0,
        "mrl/dim128_loss": 0.3,
    }
    out = rewrite_logs(logs)
    assert out["train/loss"] == 1.0
    assert out["train/lr"] == 2e-5
    assert out["eval/ndcg"] == 0.5
    assert out["test/acc"] == 0.9
    # grouped keys stay verbatim (reference trainer.py:59-62)
    assert out["channel/msmarco"] == 0.7
    assert out["spr_stats/q_l0"] == 12.0
    assert out["mrl/dim128_loss"] == 0.3


def test_tb_writer_roundtrip_own_reader(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    w.add_scalars(1, {"train/loss": 1.5, "train/lr": 1e-4})
    w.add_scalars(2, {"train/loss": 1.25})
    w.add_scalars(10, {"eval/ndcg@10": 0.42})
    w.close()
    scalars = read_tb_scalars(w.path)
    assert scalars["train/loss"] == [(1, 1.5), (2, 1.25)]
    assert scalars["train/lr"][0][0] == 1
    assert math.isclose(scalars["train/lr"][0][1], 1e-4, rel_tol=1e-6)
    assert scalars["eval/ndcg@10"] == [(10, pytest.approx(0.42))]


def test_tb_writer_readable_by_stock_tensorboard(tmp_path):
    """Oracle = tensorboard's own TFRecord reader (validates framing + CRC)
    + its generated Event proto (validates our hand-rolled wire encoding)."""
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    from tensorboard.compat.proto import event_pb2

    w = TensorBoardWriter(str(tmp_path))
    w.add_scalars(3, {"train/loss": 0.75, "channel/msmarco": 0.5})
    w.close()
    events = [event_pb2.Event.FromString(bytes(r))
              for r in tb.RawEventFileLoader(w.path).Load()]
    # first event is the file_version header
    assert events[0].file_version == "brain.Event:2"
    scalar_events = [e for e in events if e.summary.value]
    assert scalar_events[0].step == 3
    vals = {v.tag: v.simple_value for v in scalar_events[0].summary.value}
    assert vals["train/loss"] == pytest.approx(0.75)
    assert vals["channel/msmarco"] == pytest.approx(0.5)


def test_build_writers_and_trainer_emit(tmp_path):
    writers = build_writers(("tensorboard", "jsonl"), str(tmp_path / "runs"),
                            str(tmp_path / "log.jsonl"))
    assert len(writers) == 2
    for w in writers:
        w.add_scalars(1, {"loss": 2.0})
        w.close()
    assert os.path.exists(tmp_path / "log.jsonl")
    with pytest.raises(ValueError):
        build_writers(("wandb",), None, None)


def test_trainer_writes_tb_events(tmp_path, tiny_hybrid_setup=None):
    """End-to-end: ContrastiveTrainer with report_to=tensorboard produces a
    readable event file with train/ curves."""
    import jax.numpy as jnp

    from lightretriever_tpu.arguments import (
        ModelArguments,
        TrainingArguments,
    )
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.encoder import EncoderModel
    from lightretriever_tpu.training.trainer import ContrastiveTrainer

    cfg = DecoderConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=1, num_attention_heads=2,
                        num_key_value_heads=2, max_position_embeddings=64)
    margs = ModelArguments()
    targs = TrainingArguments(
        output_dir=str(tmp_path), max_steps=2, logging_steps=1,
        save_steps=0, bf16=False, report_to=("tensorboard",),
        logging_dir=str(tmp_path / "runs"),
    )
    model = EncoderModel(margs, targs, cfg, eos_token_id=1, pad_token_id=0)
    params = model.init_params(__import__("jax").random.key(0), jnp.float32)

    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield {
                "query": {
                    "input_ids": rng.integers(2, 64, (8, 8)).astype(np.int32),
                    "attention_mask": np.ones((8, 8), np.int32),
                },
                "passage": {
                    "input_ids": rng.integers(2, 64, (16, 8)).astype(np.int32),
                    "attention_mask": np.ones((16, 8), np.int32),
                },
            }

    trainer = ContrastiveTrainer(model, params, targs, train_iter=batches())
    trainer.train()
    trainer.close()
    event_files = os.listdir(tmp_path / "runs")
    assert len(event_files) == 1
    scalars = read_tb_scalars(str(tmp_path / "runs" / event_files[0]))
    assert [s for s, _ in scalars["train/loss"]] == [1, 2]
    assert "train/lr" in scalars and "train/grad_norm" in scalars
