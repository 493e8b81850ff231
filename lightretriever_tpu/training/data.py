"""Training data pipeline: domain mixtures, sampling collators, static shapes.

Behavioral parity with the reference's pipeline
(reference: finetune/data_utils.py:37-489 collators/dataset,
utils/data_utils.py:381-597 domain loading + interleaving,
utils/homogenous_iterable_dataset.py:23-246 homogenous batching,
finetune/nonctx_emb_utils.py:27-194 blocked non-ctx tokenization), redesigned
for XLA:

* every ragged structure becomes a padded array: unique token ids pad to the
  (bucketed) sequence width with -1; token-id reps are dense [B, V] float;
* the blocked non-contextual query layout ``[prompt][tok eos][tok eos]...``
  is emitted as segment ids + a static ``prompt_len`` (prompt pads carry
  segment 0, which the flash kernel excludes) instead of a materialized
  4-D float mask;
* homogenous batching (every global batch from one domain) is a plain
  generator over host data — no HF-datasets internals.
"""
from __future__ import annotations

import json
import logging
import os
import random
from collections import Counter
from dataclasses import dataclass, field
from itertools import chain
from typing import Any, Iterable, Iterator, Optional, Sequence

import numpy as np

from ..arguments import DataArguments, DomainConfig
from ..inference.collator import bucket_length, pad_ragged

logger = logging.getLogger(__name__)

ONLY_HN_TASK_PREFIXES = ("clustering", "classification")


# ---------------------------------------------------------------------------
# Blocked non-contextual query tokenization
# ---------------------------------------------------------------------------
def tokenize_nonctx_query(
    queries: list[str],
    tokenizer,
    max_len: int = 512,
    prompts: Optional[list[str]] = None,
    noncontextual_prompt_prefix: Optional[str] = None,
    length_buckets: Sequence[int] = (64, 128, 256, 512),
) -> dict[str, np.ndarray | int]:
    """Emit ``[prompt][tok eos][tok eos]...`` with segment/position ids
    (parity: tokenize_nonctx_qry_tok_emb, nonctx_emb_utils.py:84-194).

    Returns nonctx_input_ids/segment_ids/position_ids/attention_mask_2d
    [B, S] plus the static ``nonctx_prompt_len``. Prompt pads carry segment 0
    so rows with shorter prompts stay correct under one shared prompt_len.
    """
    eos = tokenizer.eos_token_id
    pad = tokenizer.pad_token_id or 0
    if prompts is None:
        prompts = ["" for _ in queries]
    if noncontextual_prompt_prefix:
        prompts = [noncontextual_prompt_prefix + p for p in prompts]

    # Infer the bos switch the same way the reference (and our EmbeddingBag
    # construction) does: the blocked train sequence must be
    # [bos][prompt][tok eos]... so the per-token EOS hiddens match the cached
    # [bos][prompt][tok][eos] table rows at inference
    # (nonctx_emb_utils.py:110-114 / :258-262).
    bos = getattr(tokenizer, "bos_token_id", None)
    add_bos = bos is not None and bos in tokenizer.encode("", add_special_tokens=True)

    prompt_ids = [
        tokenizer(p, add_special_tokens=False)["input_ids"] if p else []
        for p in prompts
    ]
    if add_bos:
        prompt_ids = [[bos] + p for p in prompt_ids]
    tok_ids = tokenizer(
        queries, max_length=max_len // 2, truncation=True, add_special_tokens=False
    )["input_ids"]

    p_max = max((len(p) for p in prompt_ids), default=0)
    if p_max:
        p_max = (p_max + 7) // 8 * 8  # bucket: prompt_len is a jit-static arg
    widths = [p_max + 2 * len(t) for t in tok_ids]
    width = bucket_length(max(max(widths, default=2), 2), length_buckets)

    b = len(queries)
    input_ids = np.full((b, width), pad, np.int32)
    seg = np.zeros((b, width), np.int32)
    pos = np.zeros((b, width), np.int32)
    for i, (p_ids, t_ids) in enumerate(zip(prompt_ids, tok_ids)):
        lp = len(p_ids)
        input_ids[i, :lp] = p_ids
        seg[i, :lp] = 1
        pos[i, :lp] = np.arange(lp)
        cur = p_max
        for bi, t in enumerate(t_ids):
            if cur + 2 > width:
                break
            input_ids[i, cur] = t
            input_ids[i, cur + 1] = eos
            seg[i, cur: cur + 2] = bi + 2
            pos[i, cur: cur + 2] = [lp, lp + 1]
            cur += 2
    return {
        "nonctx_input_ids": input_ids,
        "nonctx_segment_ids": seg,
        "nonctx_position_ids": pos,
        "nonctx_attention_mask_2d": (seg > 0).astype(np.int32),
        "nonctx_prompt_len": p_max,
    }


# ---------------------------------------------------------------------------
# Train collator
# ---------------------------------------------------------------------------
@dataclass
class TrainCollator:
    """Triples -> static-shape numpy train batch
    (parity: finetune/data_utils.py:37-326)."""

    tokenizer: Any
    q_max_len: int = 512
    p_max_len: int = 512
    length_buckets: tuple[int, ...] = (64, 128, 256, 512)
    pad_to_max_length: bool = False
    separator: str = " "

    noncontextual_query_embedding: bool = False
    noncontextual_prompt_prefix: Optional[str] = None

    # Pad-free packed forward (reference cumulative_seq; training/packing.py)
    cumulative_seq: bool = False

    token_id_vector_type: str = "sum"
    use_word_pretokenizer: bool = False
    sparse_remove_stopwords: bool = False
    word_tokenizer: Any = None
    emb_size: Optional[int] = None
    return_bce_bow_labels: bool = False

    def __post_init__(self):
        if self.use_word_pretokenizer and self.word_tokenizer is None:
            from ..utils.word_pretokenizer import get_word_pretokenizer

            self.word_tokenizer = get_word_pretokenizer()

    # -- text formatting (parity :60-104) ------------------------------------
    def _get_query(self, item: dict, prepend_prompt=True, prepend_whitespace=False) -> str:
        q = item["query"]
        if prepend_whitespace:
            q = " " + q
        if prepend_prompt and item.get("query_prompt"):
            q = item["query_prompt"] + q
        return q

    def _get_passages(self, item: dict, prepend_prompt=True, prepend_whitespace=False) -> list[str]:
        assert len(item["positive_passages"]) == 1, "need exactly 1 positive"
        out = []
        for psg in chain(item["positive_passages"], item["negative_passages"]):
            text = psg["text"]
            if psg.get("title"):
                text = psg["title"] + self.separator + text
            if prepend_whitespace:
                text = " " + text
            if prepend_prompt and item.get("passage_prompt"):
                text = item["passage_prompt"] + text
            out.append(text)
        return out

    def _tokenize(self, texts: list[str], max_len: int) -> dict[str, np.ndarray]:
        enc = self.tokenizer(texts, max_length=max_len, truncation=True,
                             padding=False, add_special_tokens=True)
        ids = enc["input_ids"]
        longest = max((len(r) for r in ids), default=1)
        width = max_len if self.pad_to_max_length else min(
            bucket_length(longest, self.length_buckets), max_len)
        pad = self.tokenizer.pad_token_id or 0
        return {
            "input_ids": pad_ragged(ids, pad, width=width),
            "attention_mask": pad_ragged([[1] * len(r) for r in ids], 0, width=width),
        }

    def _word_token_ids(self, texts: list[str], max_len: int) -> list[list[int]]:
        if self.use_word_pretokenizer:
            words = self.word_tokenizer(texts, remove_stopwords=self.sparse_remove_stopwords)
            return self.tokenizer(words, is_split_into_words=True,
                                  add_special_tokens=False)["input_ids"]
        return self.tokenizer(texts, max_length=max_len, truncation=True,
                              add_special_tokens=False)["input_ids"]

    def __call__(self, features: list[dict]) -> dict[str, Any]:
        bsz = len(features)
        q_texts = [self._get_query(f) for f in features]
        p_texts = [p for f in features for p in self._get_passages(f)]
        query = self._tokenize(q_texts, self.q_max_len)
        passage = self._tokenize(p_texts, self.p_max_len)
        if self.cumulative_seq:
            from .packing import pack_encode_batch

            query = pack_encode_batch(query, max_len=query["input_ids"].shape[1])
            passage = pack_encode_batch(passage, max_len=passage["input_ids"].shape[1])

        if self.noncontextual_query_embedding:
            query.update(tokenize_nonctx_query(
                [f["query"] for f in features], self.tokenizer,
                max_len=self.q_max_len,
                prompts=[f.get("query_prompt", "") for f in features],
                noncontextual_prompt_prefix=self.noncontextual_prompt_prefix,
                length_buckets=self.length_buckets,
            ))

        batch: dict[str, Any] = {"query": query, "passage": passage}

        # ce_scores (parity :224-233): skip when missing/NaN/-inf
        ce0 = features[0]["positive_passages"][0].get("ce_score")
        if ce0 is not None and np.isfinite(float(ce0)):
            ce = []
            for f in features:
                ce.append(float(f["positive_passages"][0]["ce_score"]))
                ce.extend(float(n["ce_score"]) for n in f["negative_passages"])
            batch["ce_scores"] = np.asarray(ce, np.float32).reshape(bsz, -1)

        if "domain_ids" in features[0]:
            batch["domain_ids"] = np.asarray([f["domain_ids"] for f in features], np.int64)
        if "domain_name" in features[0]:
            names = [f["domain_name"] for f in features]
            batch["domain_name"] = names
            batch["only_hn"] = np.asarray(
                [any(p in n for p in ONLY_HN_TASK_PREFIXES) for n in names], bool
            )

        # Sparse pooling ids (parity :253-295), padded to the input width
        q_neat = [self._get_query(f, prepend_prompt=False, prepend_whitespace=True)
                  for f in features]
        p_neat = [p for f in features
                  for p in self._get_passages(f, prepend_prompt=False, prepend_whitespace=True)]
        q_word_ids = self._word_token_ids(q_neat, self.q_max_len)
        p_word_ids = self._word_token_ids(p_neat, self.p_max_len)
        q_unique = [sorted(set(r)) for r in q_word_ids]
        p_unique = [sorted(set(r)) for r in p_word_ids]
        query["unique_token_ids"] = pad_ragged(
            q_unique, -1, width=query["input_ids"].shape[1])
        passage["unique_token_ids"] = pad_ragged(
            p_unique, -1, width=passage["input_ids"].shape[1])

        # Parameter-free query reps, dense (parity :113-168 pt form)
        if self.emb_size:
            reps = np.zeros((bsz, self.emb_size), np.float32)
            if self.token_id_vector_type == "bow":
                for i, u in enumerate(q_unique):
                    reps[i, u] = 1.0
            elif self.token_id_vector_type == "sum":
                for i, r in enumerate(q_word_ids):
                    for t, c in Counter(r).items():
                        reps[i, t] = c
            else:
                raise NotImplementedError(self.token_id_vector_type)
            query["token_id_reps"] = reps

            if self.return_bce_bow_labels:
                n_psg = len(p_unique) // bsz
                bce = np.zeros((bsz, self.emb_size), np.float32)
                bce_qp = np.zeros((bsz, self.emb_size), np.float32)
                bow = np.zeros((bsz, self.emb_size), np.float32)
                bow_qp = np.zeros((bsz, self.emb_size), np.float32)
                for i in range(bsz):
                    qp = sorted(set(q_unique[i]) | set(p_unique[i * n_psg]))
                    bce[i, q_unique[i]] = 1.0
                    bce_qp[i, qp] = 1.0
                    if q_unique[i]:
                        bow[i, q_unique[i]] = 1.0 / len(q_unique[i])
                    if qp:
                        bow_qp[i, qp] = 1.0 / len(qp)
                batch["q_unique_bce_label"] = bce
                batch["q_p_pos_unique_bce_label"] = bce_qp
                batch["q_unique_bow_label"] = bow
                batch["q_p_pos_unique_bow_label"] = bow_qp
        return batch

    def collate_items(self, items: list[dict]) -> dict[str, Any]:
        """Worker-pool protocol (_pool_collate): the thread-safe tokenize/pad
        step over items already sampled serially by ``get_item``."""
        return TrainCollator.__call__(self, items)


@dataclass
class IterableTrainCollator(TrainCollator):
    """Sampling collator: picks pos/negs + prompt injection per group
    (parity: finetune/data_utils.py:330-395)."""

    train_n_passages: int = 2
    seed: int = 42
    positive_passage_no_shuffle: bool = False
    negative_passage_no_shuffle: bool = False
    add_prompt_prob: float = -1.0
    prompt_type: str = "e5"
    append_prompt_sep: bool = False

    def __post_init__(self):
        super().__post_init__()
        self.rng = random.Random(self.seed)

    def __call__(self, group: list[dict]):
        return super().__call__([self.get_item(g) for g in group])

    def get_item(self, group: dict) -> dict:
        rng = self.rng
        positives = group["positive_passages"]
        pos = positives[0] if self.positive_passage_no_shuffle else rng.choice(positives)

        negatives = group["negative_passages"]
        n_neg = self.train_n_passages - 1
        if len(negatives) < n_neg:
            negs = rng.choices(negatives, k=n_neg) if negatives else []
        elif self.train_n_passages == 1:
            negs = []
        elif self.negative_passage_no_shuffle:
            negs = negatives[:n_neg]
        else:
            negs = rng.sample(negatives, k=n_neg)

        item = {
            "query": group["query"],
            "positive_passages": [pos],
            "negative_passages": negs,
            "domain_name": group.get("domain_name", ""),
        }
        if "domain_ids" in group:
            item["domain_ids"] = group["domain_ids"]
        if 0 < self.add_prompt_prob <= 1 and "instruction" in group:
            if self.add_prompt_prob >= 1.0 or rng.random() <= self.add_prompt_prob:
                prompt = group["instruction"]
                if self.append_prompt_sep and self.tokenizer.sep_token:
                    prompt += self.tokenizer.sep_token + " "
                item["query_prompt"] = prompt
        return item


# ---------------------------------------------------------------------------
# Map-style dataset with epoch-seeded sampling (parity :400-489)
# ---------------------------------------------------------------------------
class TrainDataset:
    def __init__(
        self,
        train_data: list[dict],
        train_n_passages: int = 8,
        seed: int = 42,
        positive_passage_no_shuffle: bool = False,
        negative_passage_no_shuffle: bool = False,
    ):
        self.train_data = train_data
        self.train_n_passages = train_n_passages
        self.seed = seed
        self.epoch = 0
        self.positive_passage_no_shuffle = positive_passage_no_shuffle
        self.negative_passage_no_shuffle = negative_passage_no_shuffle

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.train_data)

    def __getitem__(self, index: int) -> dict:
        group = self.train_data[index]
        hashed = hash(index + self.seed)
        positives = group["positive_passages"]
        pos = positives[0] if self.positive_passage_no_shuffle \
            else positives[(hashed + self.epoch) % len(positives)]
        negatives = group["negative_passages"]
        n_neg = self.train_n_passages - 1
        if len(negatives) < n_neg:
            negs = random.Random(hashed).choices(negatives, k=n_neg) if negatives else []
        elif self.train_n_passages == 1:
            negs = []
        elif self.negative_passage_no_shuffle:
            negs = negatives[:n_neg]
        else:
            offset = self.epoch * n_neg % len(negatives)
            negs = list(negatives)
            random.Random(hashed).shuffle(negs)
            negs = (negs * 2)[offset: offset + n_neg]
        return {"query": group.get("query", group.get("text")),
                "positive_passages": [pos], "negative_passages": negs,
                **{k: group[k] for k in ("domain_name", "domain_ids", "instruction")
                   if k in group}}


# ---------------------------------------------------------------------------
# Domain mixtures (parity: utils/data_utils.py:381-597 + homogenous iterable)
# ---------------------------------------------------------------------------
def load_domain_datasets(
    domain_config: DomainConfig, data_dir: str, file_suffix: str = ".jsonl"
) -> dict[str, list[dict]]:
    """Load per-domain jsonl files named ``<domain><suffix>`` under data_dir;
    stamps domain_name/domain_ids/instruction onto every example."""
    out: dict[str, list[dict]] = {}
    for name, did in domain_config.domain_ids.items():
        path = os.path.join(data_dir, name + file_suffix)
        if not os.path.exists(path):
            logger.warning("domain file missing: %s", path)
            continue
        rows = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                rec.setdefault("domain_name", name)
                rec.setdefault("domain_ids", did)
                rows.append(rec)
        out[name] = rows
    return out


def interleave_domains(
    domains: dict[str, list[dict]],
    weights: Optional[dict[str, float]] = None,
    seed: int = 42,
    homogenous_batch_size: Optional[int] = None,
    infinite: bool = True,
    shard_index: int = 0,
    shard_count: int = 1,
    max_per_domain: Optional[dict[str, int]] = None,
) -> Iterator[dict]:
    """Weighted domain sampling; with ``homogenous_batch_size`` every run of
    that many consecutive examples comes from a single domain — the in-batch
    negative-quality trick (parity: homogenous_iterable_dataset.py:181-246).

    ``max_per_domain`` caps total draws per domain (the reference's
    size*epoch budget, DomainConfig size/epoch fields); exhausted domains
    drop out of the sampling distribution, and iteration ends when all are
    exhausted."""
    if shard_count > 1:
        # Multi-host: each process keeps a disjoint slice of every domain
        # (parity: homogenous_iterable_dataset.py:227-246 split_dataset_by_node)
        domains = {n: rows[shard_index::shard_count] for n, rows in domains.items()}
    names = [n for n in domains if domains[n]]
    assert names, "no non-empty domains"
    if weights:
        w = np.asarray([max(weights.get(n, 0.0), 0.0) for n in names], np.float64)
        if w.sum() <= 0:
            w = np.ones(len(names))
    else:
        w = np.ones(len(names))
    w = w / w.sum()
    rng = np.random.default_rng(seed)
    cursors = {n: 0 for n in names}
    orders = {n: rng.permutation(len(domains[n])) for n in names}
    drawn = {n: 0 for n in names}
    budget = dict(max_per_domain or {})

    def next_from(name: str) -> dict:
        i = cursors[name]
        if i >= len(domains[name]):
            if not infinite:
                raise StopIteration
            orders[name] = rng.permutation(len(domains[name]))
            cursors[name] = i = 0
        cursors[name] += 1
        return domains[name][orders[name][i]]

    while True:
        if budget:
            # Drop exhausted domains and renormalize
            alive = [i for i, n in enumerate(names)
                     if budget.get(n) is None or drawn[n] < budget[n]]
            if not alive:
                return
            w_alive = w[alive] / w[alive].sum()
            name = names[alive[int(rng.choice(len(alive), p=w_alive))]]
        else:
            name = names[int(rng.choice(len(names), p=w))]
        try:
            if homogenous_batch_size:
                for _ in range(homogenous_batch_size):
                    drawn[name] += 1
                    yield next_from(name)
            else:
                drawn[name] += 1
                yield next_from(name)
        except StopIteration:
            return


def train_dataloader(
    example_iter: Iterable[dict],
    collator: TrainCollator,
    batch_size: int,
    max_steps: Optional[int] = None,
    prefetch: int = 2,
    workers: int = 1,
) -> Iterator[dict]:
    """Group examples into collated batches (drop_last always, the
    reference's all-gather-hang guard, trainer.py:94-144). With
    ``prefetch > 0`` collation runs in background threads so host
    tokenization overlaps the device step (the stand-in for the reference's
    DataLoader worker processes). ``workers > 1`` collates several batches
    concurrently in a thread pool — HF tokenizers release the GIL, so this
    scales until numpy work dominates; batch ORDER is preserved (futures
    are consumed FIFO), so runs stay deterministic."""

    def _groups() -> Iterator[list[dict]]:
        buf: list[dict] = []
        steps = 0
        for ex in example_iter:
            buf.append(ex)
            if len(buf) == batch_size:
                yield buf
                buf = []
                steps += 1
                if max_steps and steps >= max_steps:
                    return

    if workers > 1:
        yield from _pool_collate(_groups(), collator, workers,
                                 max(prefetch, workers))
        return

    def _batches() -> Iterator[dict]:
        for group in _groups():
            yield collator(group)

    if prefetch <= 0:
        yield from _batches()
        return
    yield from _prefetch_iter(_batches(), prefetch)


def _pool_collate(groups: Iterator[list[dict]], collator, workers: int,
                  depth: int) -> Iterator[dict]:
    """Sampling (shared seeded RNG) stays serial in the producer;
    tokenization/padding fans out to the pool. Each worker thread gets its
    own deep-copied collator: HF fast tokenizers are NOT thread-safe —
    set_truncation_and_padding mutates the Rust tokenizer and concurrent
    calls raise "Already borrowed"."""
    import copy
    import threading
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    # The Rust tokenizers' internal rayon pool deadlocks under concurrent
    # encode_batch calls from multiple Python threads (observed: all workers
    # stuck inside _batch_encode_plus). We are the parallelism — turn theirs
    # off.
    os.environ["TOKENIZERS_PARALLELISM"] = "false"

    sampled = hasattr(collator, "get_item")
    tls = threading.local()

    def collate(items, presampled):
        if not hasattr(tls, "col"):
            tls.col = copy.deepcopy(collator)
        if presampled:
            # Sampling already ran in the producer; invoke the base
            # tokenize/pad step directly (collate_items protocol).
            return tls.col.collate_items(items)
        return tls.col(items)

    def submit(pool, group):
        if sampled:
            items = []
            for g in group:  # serial: deterministic rng order
                it = collator.get_item(g)
                items.extend(it) if isinstance(it, list) else items.append(it)
            return pool.submit(collate, items, True)
        return pool.submit(collate, group, False)

    pool = ThreadPoolExecutor(max_workers=workers)
    pending: deque = deque()
    try:
        for group in groups:
            pending.append(submit(pool, group))
            if len(pending) >= depth:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()
    finally:
        # Early generator close (partial consumption / interpreter exit):
        # drain pending work before the pool threads die — tokenizer calls
        # aborting mid-flight at shutdown take the process down with them.
        for f in pending:
            f.cancel()
        pool.shutdown(wait=True, cancel_futures=True)


def _prefetch_iter(it: Iterator[dict], size: int) -> Iterator[dict]:
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # surface errors in the consumer
            q.put(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
