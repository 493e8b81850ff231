"""Experiment tracking: TensorBoard event files + log-key grouping.

The reference reports through HF Trainer integrations (wandb/tensorboard)
with a monkey-patched ``rewrite_logs`` that keeps α/channel/spr_stats/mrl
keys as their own top-level groups (reference: trainer.py:46-67). Here the
same contract is a small standalone module:

* ``rewrite_logs`` — exact grouping semantics of the reference's rewriter.
* ``TensorBoardWriter`` — a from-scratch TF event-file writer (TFRecord
  framing + hand-encoded Event/Summary protos + CRC32C), so scalar curves
  open in stock TensorBoard with zero extra dependencies. No egress, no
  tensorflow import, safe inside the training loop.
* ``JsonlWriter`` — the append-only jsonl channel the trainer always had
  (reference: trainer.py:397-400).
* ``build_writers`` — maps TrainingArguments.report_to names to writers.
"""
from __future__ import annotations

import json
import os
import struct
import time
from typing import IO, Optional

# Log keys that keep their own group instead of the train/ prefix
# (reference: trainer.py:59-62).
_GROUPED_MARKERS = (
    "α", "alpha", "loss_per_group", "channel", "overlap", "spr_stats",
    "sparse_top_basis", "mrl",
)


def rewrite_logs(d: dict) -> dict:
    """Group log keys for dashboards (parity: reference trainer.py:46-67):
    eval_*/test_* -> eval//test/ groups; α/channel/spr_stats/... keys stay
    verbatim as their own groups; everything else gets the train/ prefix."""
    out = {}
    for k, v in d.items():
        if k.startswith("eval_"):
            out["eval/" + k[len("eval_"):]] = v
        elif k.startswith("test_"):
            out["test/" + k[len("test_"):]] = v
        elif any(m in k for m in _GROUPED_MARKERS):
            out[k] = v
        else:
            out["train/" + k] = v
    return out


# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven — required by the TFRecord framing.
# ---------------------------------------------------------------------------
def _make_crc32c_table() -> list[int]:
    poly = 0x82F63B78  # reflected Castagnoli polynomial
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Minimal protobuf wire encoding for tensorboard Event/Summary messages.
# Schemas (tensorboard/compat/proto/event.proto, summary.proto):
#   Event    { 1: double wall_time; 2: int64 step;
#              3: string file_version; 5: Summary summary }
#   Summary  { 1: repeated Value }
#   Value    { 1: string tag; 2: float simple_value }
# ---------------------------------------------------------------------------
def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_field(field_no: int, payload: bytes) -> bytes:
    return _varint((field_no << 3) | 2) + _varint(len(payload)) + payload


def _encode_value(tag: str, value: float) -> bytes:
    t = tag.encode("utf-8")
    return (_len_field(1, t)
            + _varint((2 << 3) | 5) + struct.pack("<f", float(value)))


def _encode_event(wall_time: float, step: int, *,
                  scalars: Optional[dict[str, float]] = None,
                  file_version: Optional[str] = None) -> bytes:
    body = bytearray()
    body += _varint((1 << 3) | 1) + struct.pack("<d", wall_time)
    if step:
        body += _varint((2 << 3) | 0) + _varint(step & 0xFFFFFFFFFFFFFFFF)
    if file_version is not None:
        body += _len_field(3, file_version.encode("utf-8"))
    if scalars:
        summary = b"".join(
            _len_field(1, _encode_value(tag, v)) for tag, v in scalars.items())
        body += _len_field(5, summary)
    return bytes(body)


class TensorBoardWriter:
    """Write scalar curves as a stock-TensorBoard-readable event file."""

    def __init__(self, logdir: str, filename_suffix: str = ""):
        os.makedirs(logdir, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{os.uname().nodename}.{os.getpid()}{filename_suffix}")
        self.path = os.path.join(logdir, fname)
        self._fh: Optional[IO[bytes]] = open(self.path, "wb")
        self._write_record(_encode_event(time.time(), 0,
                                         file_version="brain.Event:2"))

    def _write_record(self, data: bytes) -> None:
        assert self._fh is not None, "writer is closed"
        header = struct.pack("<Q", len(data))
        self._fh.write(header)
        self._fh.write(struct.pack("<I", _masked_crc(header)))
        self._fh.write(data)
        self._fh.write(struct.pack("<I", _masked_crc(data)))

    def add_scalars(self, step: int, scalars: dict[str, float]) -> None:
        clean = {k: float(v) for k, v in scalars.items()
                 if isinstance(v, (int, float))}
        if not clean:
            return
        self._write_record(_encode_event(time.time(), int(step), scalars=clean))
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


class JsonlWriter:
    """Append-only jsonl log (parity: reference trainer.py:397-400)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, "a")

    def add_scalars(self, step: int, scalars: dict[str, float]) -> None:
        self._fh.write(json.dumps({"step": step, **scalars}) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()


def build_writers(report_to, logging_dir: Optional[str],
                  log_file: Optional[str]) -> list:
    """Instantiate writers from TrainingArguments.report_to names
    ('tensorboard' | 'jsonl'; parity surface: HF Trainer report_to)."""
    writers = []
    for name in report_to or ():
        if name == "tensorboard":
            writers.append(TensorBoardWriter(logging_dir or "./runs"))
        elif name == "jsonl":
            if log_file:
                writers.append(JsonlWriter(log_file))
        elif name in ("none", ""):
            continue
        else:
            raise ValueError(f"unknown report_to backend: {name!r} "
                             "(supported: tensorboard, jsonl, none)")
    return writers


def read_tb_scalars(path: str) -> dict[str, list[tuple[int, float]]]:
    """Parse an event file written by TensorBoardWriter back into
    {tag: [(step, value), ...]} — the test-side oracle for the writer, and a
    dependency-free reader for our own dashboards."""
    out: dict[str, list[tuple[int, float]]] = {}
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "corrupt record header"
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data), "corrupt record payload"
            step, scalars = _decode_event(data)
            for tag, v in scalars.items():
                out.setdefault(tag, []).append((step, v))
    return out


def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = data[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _decode_event(data: bytes) -> tuple[int, dict[str, float]]:
    i, step, scalars = 0, 0, {}
    while i < len(data):
        key, i = _read_varint(data, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, i = _read_varint(data, i)
            if field == 2:
                step = val
        elif wire == 1:
            i += 8
        elif wire == 5:
            i += 4
        elif wire == 2:
            ln, i = _read_varint(data, i)
            payload, i = data[i: i + ln], i + ln
            if field == 5:  # summary
                j = 0
                while j < ln:
                    k2, j = _read_varint(payload, j)
                    if k2 >> 3 == 1 and k2 & 7 == 2:
                        vln, j = _read_varint(payload, j)
                        scalars.update([_decode_value(payload[j: j + vln])])
                        j += vln
                    else:
                        j = _skip_field(payload, j, k2 & 7)
        else:
            raise ValueError(f"unknown wire type {wire}")
    return step, scalars


def _decode_value(data: bytes) -> tuple[str, float]:
    i, tag, val = 0, "", 0.0
    while i < len(data):
        key, i = _read_varint(data, i)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 2:
            ln, i = _read_varint(data, i)
            tag = data[i: i + ln].decode("utf-8")
            i += ln
        elif field == 2 and wire == 5:
            (val,) = struct.unpack("<f", data[i: i + 4])
            i += 4
        else:
            i = _skip_field(data, i, wire)
    return tag, val


def _skip_field(data: bytes, i: int, wire: int) -> int:
    if wire == 0:
        _, i = _read_varint(data, i)
    elif wire == 1:
        i += 8
    elif wire == 5:
        i += 4
    elif wire == 2:
        ln, i = _read_varint(data, i)
        i += ln
    else:
        raise ValueError(f"unknown wire type {wire}")
    return i
