"""Streaming domain datasets: O(buffer) memory, seeded, shardable, resumable.

The reference trains on web-scale multi-domain mixtures through HF
*iterable* datasets (reference: utils/data_utils.py:500-597
construct_domain_dataset over load_dataset(streaming-compatible) +
utils/homogenous_iterable_dataset.py:23-246 for homogenous batching +
shard/shuffle support :227-246). Round 1 loaded every row into Python lists
(fit.py), which caps mixtures at host RAM. This module is the streaming
replacement:

* ``StreamingDomain`` — an endlessly re-iterable view over one domain file
  (jsonl line-streamed; parquet batch-streamed) with

  - a seeded *shuffle buffer* (fill ``buffer_size`` rows, then emit a random
    buffer slot per incoming row — the standard streaming shuffle; order is
    a deterministic function of (seed, epoch)),
  - per-host sharding by row index (``rows[shard_index::shard_count]``,
    matching ``split_dataset_by_node`` semantics used by the reference and
    by interleave_domains' memory-resident path),
  - automatic epoch cycling with a fresh permutation seed per epoch,
  - domain_name / domain_ids / instruction stamping.

* ``interleave_streams`` — weighted domain sampling with the homogenous-
  batch guarantee and per-domain draw budgets; identical sampling semantics
  to data.interleave_domains (same RNG discipline) but pulling from streams.

Resume: streams are deterministic in (seed,), so the trainer's
fast-forward-by-consuming resume (trainer.train) replays the identical
sequence; ``skip_fast`` additionally fast-forwards a stream without JSON-
decoding skipped rows, for cheap long skips.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Callable, Iterator, Optional

import numpy as np

from ..arguments import DomainConfig

logger = logging.getLogger(__name__)


class StreamingDomain:
    """Endlessly iterable, seeded, shardable stream over one domain file."""

    def __init__(
        self,
        path: str,
        name: str = "",
        domain_id: int = 0,
        instruction: Optional[str] = None,
        seed: int = 42,
        buffer_size: int = 4096,
        shard_index: int = 0,
        shard_count: int = 1,
        max_rows: Optional[int] = None,
    ):
        self.path = path
        self.name = name or os.path.splitext(os.path.basename(path))[0]
        self.domain_id = domain_id
        self.instruction = instruction
        self.seed = seed
        self.buffer_size = max(buffer_size, 1)
        self.shard_index = shard_index
        self.shard_count = max(shard_count, 1)
        self.max_rows = max_rows
        ext = os.path.splitext(path)[1].lower()
        if ext in (".jsonl", ".json"):
            self._raw_iter: Callable[[], Iterator[Any]] = self._iter_jsonl
        elif ext == ".parquet":
            self._raw_iter = self._iter_parquet
        else:
            raise ValueError(f"unsupported streaming format: {path}")

    # -- raw record streams (decode deferred for jsonl) ----------------------
    def _iter_jsonl(self) -> Iterator[bytes]:
        with open(self.path, "rb") as f:
            n = 0
            for i, line in enumerate(f):
                if self.max_rows is not None and n >= self.max_rows:
                    return
                line = line.strip()
                if not line:
                    continue
                n += 1
                if (i % self.shard_count) == self.shard_index:
                    yield line

    def _iter_parquet(self) -> Iterator[dict]:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(self.path)
        i = n = 0
        for batch in pf.iter_batches():
            for row in batch.to_pylist():
                if self.max_rows is not None and n >= self.max_rows:
                    return
                n += 1
                if (i % self.shard_count) == self.shard_index:
                    yield row
                i += 1

    def _decode(self, raw) -> dict:
        rec = json.loads(raw) if isinstance(raw, (bytes, str)) else dict(raw)
        rec.setdefault("domain_name", self.name)
        rec.setdefault("domain_ids", self.domain_id)
        if self.instruction is not None:
            rec.setdefault("instruction", self.instruction)
        return rec

    # -- shuffled epoch stream ------------------------------------------------
    def iter_epoch(self, epoch: int = 0, decode: bool = True) -> Iterator[Any]:
        """One pass over this host's shard in (seed, epoch)-deterministic
        shuffled order, holding at most ``buffer_size`` rows."""
        rng = np.random.default_rng((self.seed, epoch))
        buf: list[Any] = []
        for raw in self._raw_iter():
            if len(buf) < self.buffer_size:
                buf.append(raw)
                continue
            j = int(rng.integers(len(buf)))
            out, buf[j] = buf[j], raw
            yield self._decode(out) if decode else out
        # drain: shuffled tail
        order = rng.permutation(len(buf))
        for j in order:
            yield self._decode(buf[j]) if decode else buf[j]

    def __iter__(self) -> Iterator[dict]:
        epoch = 0
        while True:
            n = 0
            for rec in self.iter_epoch(epoch):
                yield rec
                n += 1
            if n == 0:
                raise ValueError(f"empty domain stream: {self.path}")
            epoch += 1

    def skip_fast(self, n: int) -> Iterator[dict]:
        """An iterator equivalent to ``islice(iter(self), n, None)`` that
        skips the first ``n`` records without JSON-decoding them."""
        epoch, remaining = 0, n
        while True:
            seen = 0
            for raw in self.iter_epoch(epoch, decode=False):
                seen += 1
                if remaining > 0:
                    remaining -= 1
                    continue
                yield self._decode(raw)
            if seen == 0:
                raise ValueError(f"empty domain stream: {self.path}")
            epoch += 1


def load_domain_streams(
    domain_config: DomainConfig,
    data_dir: str,
    file_suffix: str = ".jsonl",
    seed: int = 42,
    buffer_size: int = 4096,
    shard_index: int = 0,
    shard_count: int = 1,
    instructions: Optional[dict[str, Optional[str]]] = None,
) -> dict[str, StreamingDomain]:
    """Streaming counterpart of data.load_domain_datasets: one
    StreamingDomain per configured domain file under ``data_dir``."""
    out: dict[str, StreamingDomain] = {}
    for name, did in domain_config.domain_ids.items():
        path = os.path.join(data_dir, name + file_suffix)
        if not os.path.exists(path):
            alt = os.path.join(data_dir, name + ".parquet")
            if os.path.exists(alt):
                path = alt
            else:
                logger.warning("domain file missing: %s", path)
                continue
        out[name] = StreamingDomain(
            path, name=name, domain_id=did,
            instruction=(instructions or {}).get(name),
            seed=seed + did,  # decorrelate per-domain shuffle orders
            buffer_size=buffer_size,
            shard_index=shard_index, shard_count=shard_count,
        )
    return out


def interleave_streams(
    streams: dict[str, Any],
    weights: Optional[dict[str, float]] = None,
    seed: int = 42,
    homogenous_batch_size: Optional[int] = None,
    max_per_domain: Optional[dict[str, int]] = None,
) -> Iterator[dict]:
    """Weighted interleave over endless streams, with the homogenous-batch
    guarantee and per-domain budgets (parity with data.interleave_domains;
    reference: homogenous_iterable_dataset.py:181-246)."""
    names = list(streams)
    assert names, "no domains"
    if weights:
        w = np.asarray([max(weights.get(n, 0.0), 0.0) for n in names], np.float64)
        if w.sum() <= 0:
            w = np.ones(len(names))
    else:
        w = np.ones(len(names))
    w = w / w.sum()
    rng = np.random.default_rng(seed)
    its = {n: iter(streams[n]) for n in names}
    drawn = {n: 0 for n in names}
    budget = dict(max_per_domain or {})

    while True:
        if budget:
            alive = [i for i, n in enumerate(names)
                     if budget.get(n) is None or drawn[n] < budget[n]]
            if not alive:
                return
            w_alive = w[alive] / w[alive].sum()
            name = names[alive[int(rng.choice(len(alive), p=w_alive))]]
        else:
            name = names[int(rng.choice(len(names), p=w))]
        k = homogenous_batch_size or 1
        for _ in range(k):
            drawn[name] += 1
            yield next(its[name])
