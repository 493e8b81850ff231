"""Sparse impact search — TPU-native replacement of Anserini/Lucene.

The reference drives a Java fat-jar through pyjnius for inverted-index impact
search and BM25 (reference: retriever/anserini_search.py:24-216, quantized
impact vectors produced by sparse_converter_mixin.py:19-101 with
quantization_factor=100). Rebuilt on the TPU compute model:

* documents are quantized term-impact vectors held host-side in a padded
  COO-ish layout ``(term_ids [N, K], impacts [N, K])`` — the static-shape
  replacement for ragged postings;
* scoring streams doc chunks through the device: each chunk is scattered into
  a dense ``[C, V]`` impact matrix in on-chip memory and scored against the
  query token-count matrix with one MXU matmul (``[Q, V] x [V, C]``) — the
  "impact-ordered postings" of Lucene become a bandwidth-bound GEMM;
* per-chunk top-k merges host-side exactly like the dense engine.

``BM25Index`` reproduces the reference's DummyModel/BM25 baseline
(inference/dummy.py + AnseriniSearch bm25 flags, anserini_search.py:195-202):
Lucene-style analysis (lowercase, split, stopwords) and BM25 term weights
precomputed into impacts, so BM25 rides the same TPU scorer.
"""
from __future__ import annotations

import functools
import logging
import math
import re
from collections import Counter
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .knn import merge_topk, _round_up

logger = logging.getLogger(__name__)

SparseVec = dict[int, float]


# ---------------------------------------------------------------------------
# Host-side layout: dict vectors -> padded arrays
# ---------------------------------------------------------------------------
def pack_sparse_vecs(
    vecs: Sequence[SparseVec], pad_multiple: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Pack dict sparse vectors into padded (ids [N, K], vals [N, K]); pad id = -1."""
    k_max = max((len(v) for v in vecs), default=1)
    k_max = _round_up(max(k_max, 1), pad_multiple)
    ids = np.full((len(vecs), k_max), -1, np.int32)
    vals = np.zeros((len(vecs), k_max), np.float32)
    for i, v in enumerate(vecs):
        if not v:
            continue
        items = sorted(v.items())
        ids[i, : len(items)] = [t for t, _ in items]
        vals[i, : len(items)] = [x for _, x in items]
    return ids, vals


def quantize_vecs(vecs: Sequence[SparseVec], quantization_factor: int = 100) -> list[SparseVec]:
    """Integer impact quantization (parity: sparse_converter_mixin.py:38-44)."""
    out = []
    for v in vecs:
        q = {t: int(x * quantization_factor) for t, x in v.items()}
        out.append({t: float(x) for t, x in q.items() if x > 0})
    return out


class SparseQueryMixin:
    """Query conversion shared by every impact engine (exhaustive,
    block-max, impact-ordered, tiered): one definition of the dict<->dense
    contract, so out-of-vocab handling fixes apply everywhere at once."""

    vocab_size: int

    def _query_matrix(self, queries) -> np.ndarray:
        """[Q, V] dense fp32 query weights from dicts (or passthrough)."""
        if isinstance(queries, np.ndarray):
            return queries.astype(np.float32)
        q = np.zeros((len(queries), self.vocab_size), np.float32)
        for i, vec in enumerate(queries):
            for t, x in vec.items():
                if 0 <= t < self.vocab_size:
                    q[i, t] = x
        return q

    def _query_dicts(self, queries) -> list[SparseVec]:
        """term->weight dicts from a dense [Q, V] matrix (or passthrough)."""
        if isinstance(queries, np.ndarray):
            out = []
            for row in queries:
                (nz,) = np.nonzero(row)
                out.append({int(t): float(row[t]) for t in nz})
            return out
        return list(queries)


class DictIngestMixin(SparseQueryMixin):
    """Doc ingestion for engines that keep per-doc dict vectors until
    ``_finalize`` (block-max / impact-ordered / tiered)."""

    quantization_factor: int

    def _init_ingest(self) -> None:
        self._vecs: list[SparseVec] = []
        self._built = False

    def __len__(self) -> int:
        return len(self._vecs)

    def add(self, vecs: Sequence[SparseVec], quantize: bool = True) -> None:
        if quantize:
            vecs = quantize_vecs(vecs, self.quantization_factor)
        self._vecs.extend(vecs)
        self._built = False


# ---------------------------------------------------------------------------
# Device scoring
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("vocab_size", "k", "chunk"))
def _score_all_resident(q_dense, ids, vals, n_valid, vocab_size: int, k: int,
                        chunk: int):
    """Device-resident search: scan doc chunks inside ONE jit — scatter each
    chunk to dense [chunk, V], GEMM, top-k, merge on device. One host round
    trip for the whole corpus instead of one per chunk (the tunnel/dispatch
    latency otherwise dominates: measured 33 -> ~1000s of QPS at V=128k)."""
    n = ids.shape[0]
    n_chunks = n // chunk
    q_ = q_dense.shape[0]

    def body(carry, ci):
        best_s, best_i = carry
        lo = ci * chunk
        ids_c = jax.lax.dynamic_slice_in_dim(ids, lo, chunk, 0)
        vals_c = jax.lax.dynamic_slice_in_dim(vals, lo, chunk, 0)
        ok = ids_c >= 0
        # Gather-side scoring: score[q, c] = sum_k vals[c, k] * qv[q, ids[c, k]]
        # — reads only the touched qv columns; the dense-scatter formulation
        # (zero [chunk, V] + scatter-add + GEMM) measured ~10x slower on TPU.
        g = jnp.take(q_dense, jnp.where(ok, ids_c, 0), axis=1)   # [Q, chunk, K]
        w = jnp.where(ok, vals_c, 0.0).astype(jnp.float32)
        scores = jnp.einsum("qck,ck->qc", g.astype(jnp.float32), w)
        doc_idx = lo + jnp.arange(chunk)
        scores = jnp.where((doc_idx < n_valid)[None, :], scores, -jnp.inf)
        s_k, i_k = jax.lax.top_k(scores, min(k, chunk))
        g_k = jnp.take_along_axis(
            jnp.broadcast_to(doc_idx[None, :], scores.shape), i_k, axis=1)
        cat_s = jnp.concatenate([best_s, s_k], axis=1)
        cat_i = jnp.concatenate([best_i, g_k], axis=1)
        s2, sel = jax.lax.top_k(cat_s, k)
        return (s2, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (jnp.full((q_, k), -jnp.inf, jnp.float32),
            jnp.full((q_, k), -1, jnp.int32))
    (s, i), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return s, i


@functools.partial(jax.jit, static_argnames=("vocab_size", "k"))
def _score_chunk(q_dense, ids, vals, valid_rows, vocab_size: int, k: int):
    """Scatter a doc chunk to dense [C, V] and score with one MXU matmul."""
    c, kk = ids.shape
    ok = ids >= 0
    safe = jnp.where(ok, ids, 0)
    rows = jnp.broadcast_to(jnp.arange(c)[:, None], (c, kk))
    dense = jnp.zeros((c, vocab_size), q_dense.dtype).at[rows, safe].add(
        jnp.where(ok, vals, 0.0).astype(q_dense.dtype)
    )
    scores = jax.lax.dot_general(
        q_dense, dense, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = jnp.where(valid_rows[None, :], scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


def _make_sharded_score(mesh: Mesh, vocab_size: int, k_local: int, k_final: int,
                        axis: str = "data"):
    from jax import shard_map

    def _search(q_dense, ids, vals, valid_rows, row_offset):
        c, kk = ids.shape
        ok = ids >= 0
        safe = jnp.where(ok, ids, 0)
        rows = jnp.broadcast_to(jnp.arange(c)[:, None], (c, kk))
        dense = jnp.zeros((c, vocab_size), q_dense.dtype).at[rows, safe].add(
            jnp.where(ok, vals, 0.0).astype(q_dense.dtype)
        )
        scores = jax.lax.dot_general(
            q_dense, dense, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        scores = jnp.where(valid_rows[None, :], scores, -jnp.inf)
        s, i = jax.lax.top_k(scores, k_local)
        gids = i + row_offset[0]
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        g_all = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
        s2, i2 = jax.lax.top_k(s_all, k_final)
        return s2, jnp.take_along_axis(g_all, i2, axis=1)

    return jax.jit(shard_map(
        _search, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    ))


class SparseImpactIndex(SparseQueryMixin):
    """Impact-quantized sparse index scored on TPU (Anserini replacement)."""

    def __init__(
        self,
        vocab_size: int,
        mesh: Optional[Mesh] = None,
        quantization_factor: int = 100,
        dtype=jnp.float32,
        chunk_docs: Optional[int] = None,
        mem_budget_bytes: int = 1 << 30,
        axis: str = "data",
    ):
        self.vocab_size = vocab_size
        self.mesh = mesh
        self.axis = axis
        self.quantization_factor = quantization_factor
        self.dtype = dtype
        if chunk_docs is None:
            # The scatter materializes a dense [C, V] chunk on device; bound
            # it by memory budget (128k vocab f32 -> ~2k docs/chunk per GB)
            bytes_per = vocab_size * np.dtype(np.float32).itemsize
            chunk_docs = min(max(256, int(mem_budget_bytes / max(bytes_per, 1))), 16384)
        self.chunk_docs = chunk_docs
        # Bounds the resident path's [Qb, chunk, kmax] gather buffer
        self.query_block_budget_bytes = 1 << 30
        self._ids: list[np.ndarray] = []
        self._vals: list[np.ndarray] = []
        self._n = 0
        self._fns: dict = {}

    def __len__(self) -> int:
        return self._n

    def add(
        self,
        vecs: Optional[Sequence[SparseVec]] = None,
        ids: Optional[np.ndarray] = None,
        vals: Optional[np.ndarray] = None,
        quantize: bool = True,
    ) -> None:
        """Add docs as dict vectors (quantized like the reference) or
        pre-packed padded arrays."""
        if vecs is not None:
            if quantize:
                vecs = quantize_vecs(vecs, self.quantization_factor)
            ids, vals = pack_sparse_vecs(vecs)
        assert ids is not None and vals is not None
        self._ids.append(np.asarray(ids, np.int32))
        self._vals.append(np.asarray(vals, np.float32))
        self._n += len(ids)

    def _iter_chunks(self):
        """Yield (ids, vals, n_valid) chunks of ``chunk_docs`` rows."""
        buf_i: list[np.ndarray] = []
        buf_v: list[np.ndarray] = []
        have = 0
        for ids, vals in zip(self._ids, self._vals):
            pos = 0
            while pos < len(ids):
                take = min(self.chunk_docs - have, len(ids) - pos)
                buf_i.append(ids[pos: pos + take])
                buf_v.append(vals[pos: pos + take])
                have += take
                pos += take
                if have == self.chunk_docs:
                    yield self._stack(buf_i, buf_v)
                    buf_i, buf_v, have = [], [], 0
        if have:
            yield self._stack(buf_i, buf_v)

    @staticmethod
    def _stack(buf_i, buf_v):
        kmax = max(a.shape[1] for a in buf_i)
        ids = np.full((sum(len(a) for a in buf_i), kmax), -1, np.int32)
        vals = np.zeros_like(ids, dtype=np.float32)
        r = 0
        for a, b in zip(buf_i, buf_v):
            ids[r: r + len(a), : a.shape[1]] = a
            vals[r: r + len(b), : b.shape[1]] = b
            r += len(a)
        return ids, vals, r

    def _search_resident(self, q, k: int):
        """Single-device fast path: postings live on device; the whole corpus
        scan is one jit call. Returns None when postings exceed the budget."""
        kmax = max((a.shape[1] for a in self._ids), default=1)
        postings_bytes = self._n * kmax * 8
        if self._n == 0 or postings_bytes > (1 << 31):   # 2GB posting budget
            return None
        if getattr(self, "_res_ids", None) is None or self._res_n != self._n:
            ids, vals, _ = self._stack(self._ids, self._vals)
            chunk = min(self.chunk_docs, max(len(ids), 1))
            pad = (-len(ids)) % chunk
            if pad:
                ids = np.concatenate([ids, np.full((pad, ids.shape[1]), -1, np.int32)])
                vals = np.concatenate([vals, np.zeros((pad, vals.shape[1]), np.float32)])
            self._res_ids = jnp.asarray(ids)
            self._res_vals = jnp.asarray(vals)
            self._res_chunk = chunk
            self._res_n = self._n
        k_eff = min(k, self._n)
        s, i = _score_all_resident(
            q, self._res_ids, self._res_vals, self._n,
            self.vocab_size, k_eff, self._res_chunk)
        s, i = jax.device_get((s, i))
        s = np.asarray(s, np.float32)
        i = np.asarray(i, np.int64)
        i[~np.isfinite(s)] = -1
        return s, i

    def search(self, queries, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Top-k impact search. ``queries``: [Q, V] dense array or list of dicts
        (token -> weight, typically integer token counts)."""
        q = jnp.asarray(self._query_matrix(queries), self.dtype)
        if self.mesh is None:
            # Bound the resident path's [Qb, chunk, kmax] gather buffer:
            # block queries so it stays under ~1GB even for dense-ish docs
            # (unpruned SPLADE heads can emit kmax ~= V; a 1500-query eval
            # previously asked for a 98GB fusion buffer).
            kmax = max((a.shape[1] for a in self._ids), default=1)
            per_q = self.chunk_docs * kmax * 4
            q_block = max(int(self.query_block_budget_bytes / max(per_q, 1)), 16)
            if q.shape[0] > q_block:
                outs = [self._search_resident(q[lo: lo + q_block], k)
                        for lo in range(0, q.shape[0], q_block)]
                if all(o is not None for o in outs):
                    return (np.concatenate([o[0] for o in outs]),
                            np.concatenate([o[1] for o in outs]))
            else:
                out = self._search_resident(q, k)
                if out is not None:
                    return out
        best_s = best_i = None
        offset = 0
        n_shards = self.mesh.shape[self.axis] if self.mesh else 1
        for ids, vals, n_valid in self._iter_chunks():
            c = _round_up(max(len(ids), n_shards), n_shards)
            if c != len(ids):
                pad = c - len(ids)
                ids = np.concatenate([ids, np.full((pad, ids.shape[1]), -1, np.int32)])
                vals = np.concatenate([vals, np.zeros((pad, vals.shape[1]), np.float32)])
            valid = np.zeros(c, bool)
            valid[:n_valid] = True
            k_eff = min(k, n_valid)
            if self.mesh is not None:
                rows_per = c // n_shards
                k_local = min(k_eff, rows_per)
                key = ("sh", ids.shape[1], c, k_local, k_eff)
                if key not in self._fns:
                    self._fns[key] = _make_sharded_score(
                        self.mesh, self.vocab_size, k_local, k_eff, self.axis
                    )
                row_off = (np.arange(n_shards, dtype=np.int32)
                           .repeat(rows_per) * rows_per)
                sh_2d = NamedSharding(self.mesh, P(self.axis, None))
                sh_1d = NamedSharding(self.mesh, P(self.axis))
                s, i = self._fns[key](
                    q,
                    jax.device_put(ids, sh_2d),
                    jax.device_put(vals, sh_2d),
                    jax.device_put(valid, sh_1d),
                    jax.device_put(row_off, sh_1d),
                )
            else:
                s, i = _score_chunk(
                    q, jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(valid),
                    self.vocab_size, k_eff,
                )
            s, i = np.asarray(s, np.float32), np.asarray(i, np.int64)
            i = np.where(np.isfinite(s), i + offset, -1)
            offset += n_valid
            if best_s is None:
                best_s, best_i = s, i
            else:
                best_s, best_i = merge_topk(best_s, best_i, s, i, k)
        if best_s is None:
            raise ValueError("search on empty index")
        best_s = np.array(best_s)
        best_s[best_i < 0] = -np.inf
        return best_s[:, :k], best_i[:, :k]


# ---------------------------------------------------------------------------
# BM25 on the impact scorer (DummyModel / Anserini-BM25 baseline parity)
# ---------------------------------------------------------------------------
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# Lucene EnglishAnalyzer default stopword set (public standard list)
LUCENE_EN_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def lucene_analyze(text: str, stopwords: frozenset = LUCENE_EN_STOPWORDS,
                   stem: bool = True) -> list[str]:
    """Lowercase + word split + stopword removal + Porter stemming — the
    analysis Lucene's EnglishAnalyzer applies in the reference's BM25 path
    (anserini_search.py:195-202 ``-language en``): StandardTokenizer →
    EnglishPossessiveFilter → LowerCaseFilter → StopFilter →
    PorterStemFilter. Stemming runs AFTER stopword removal, matching the
    filter order. Pass ``stem=False`` for the pre-round-3 unstemmed
    behavior (kept for ablation)."""
    from ..utils.porter import porter_stem

    toks = (t for t in _TOKEN_RE.findall(text.lower()) if t not in stopwords)
    if not stem:
        return list(toks)
    return [porter_stem(t) for t in toks]


def lucene_analyze_nostem(text: str,
                          stopwords: frozenset = LUCENE_EN_STOPWORDS) -> list[str]:
    """Unstemmed variant (lowercase/split/stopwords only) for ablations."""
    return lucene_analyze(text, stopwords, stem=False)


class BM25Index:
    """BM25 retrieval over the TPU impact scorer.

    BM25 term weights (k1/b, Lucene idf) are precomputed into per-doc impacts
    at index time; query-time scoring is then a plain impact dot product, so
    quality matches Lucene BM25 while the compute is one GEMM per chunk.
    """

    def __init__(
        self,
        mesh: Optional[Mesh] = None,
        k1: float = 0.9,
        b: float = 0.4,
        analyzer=lucene_analyze,
        quantization_factor: int = 100,
    ):
        self.k1, self.b = k1, b
        self.mesh = mesh
        self.analyzer = analyzer
        self.quantization_factor = quantization_factor
        self.term_to_id: dict[str, int] = {}
        self._docs_tf: list[Counter] = []
        self._doc_lens: list[int] = []
        self._index: Optional[SparseImpactIndex] = None

    def add(self, texts: Iterable[str]) -> None:
        for text in texts:
            toks = self.analyzer(text)
            tf = Counter()
            for t in toks:
                tid = self.term_to_id.setdefault(t, len(self.term_to_id))
                tf[tid] += 1
            self._docs_tf.append(tf)
            self._doc_lens.append(len(toks))
        self._index = None

    def _finalize(self) -> None:
        if self._index is not None:
            return
        n = len(self._docs_tf)
        assert n > 0, "empty BM25 index"
        avdl = max(sum(self._doc_lens) / n, 1e-9)
        df = Counter()
        for tf in self._docs_tf:
            df.update(tf.keys())
        idf = {t: math.log(1.0 + (n - d + 0.5) / (d + 0.5)) for t, d in df.items()}
        vecs: list[SparseVec] = []
        for tf, dl in zip(self._docs_tf, self._doc_lens):
            norm = self.k1 * (1.0 - self.b + self.b * dl / avdl)
            vecs.append({
                t: idf[t] * (c * (self.k1 + 1.0)) / (c + norm) for t, c in tf.items()
            })
        self._index = SparseImpactIndex(
            vocab_size=max(len(self.term_to_id), 1),
            mesh=self.mesh,
            quantization_factor=self.quantization_factor,
        )
        self._index.add(vecs, quantize=True)

    def search(self, query_texts: Sequence[str], k: int):
        self._finalize()
        queries: list[SparseVec] = []
        for text in query_texts:
            cnt = Counter(
                self.term_to_id[t] for t in self.analyzer(text) if t in self.term_to_id
            )
            queries.append({t: float(c) for t, c in cnt.items()})
        return self._index.search(queries, k)


# ---------------------------------------------------------------------------
# Impact-pruned inverted index — the Lucene-style fast path
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("k",))
def _inverted_search(qt, qw, inv_docs, inv_vals, k: int):
    """Query-driven impact search without any scatter.

    qt [Q, T] query term ids (-1 pad), qw [Q, T] weights;
    inv_docs/inv_vals [V, P]: per-term postings (doc id, impact), -1 pad,
    impact-ordered (top-P per term — Lucene's impact pruning).

    Per query: gather candidate postings of its terms ([T*P] candidates),
    sort by doc id, segment-sum duplicate docs via cumsum differences, top-k.
    All [Q, T*P] vector ops — no [N]-sized accumulators.
    """
    q_, t = qt.shape
    p = inv_docs.shape[1]
    ok_t = qt >= 0
    safe_t = jnp.where(ok_t, qt, 0)
    docs = inv_docs[safe_t]                                   # [Q, T, P]
    vals = inv_vals[safe_t]                                   # [Q, T, P]
    contrib = vals * qw[:, :, None]
    valid = (docs >= 0) & ok_t[:, :, None]
    docs_f = jnp.where(valid, docs, jnp.iinfo(jnp.int32).max).reshape(q_, t * p)
    con_f = jnp.where(valid, contrib, 0.0).reshape(q_, t * p)

    order = jnp.argsort(docs_f, axis=1)
    sd = jnp.take_along_axis(docs_f, order, axis=1)
    sv = jnp.take_along_axis(con_f, order, axis=1)
    csum = jnp.cumsum(sv, axis=1)
    # Segment end = last position of a doc-id run; its total = csum[end] -
    # csum[previous segment end]
    is_end = jnp.concatenate(
        [sd[:, 1:] != sd[:, :-1], jnp.ones((q_, 1), bool)], axis=1)
    prev = jnp.where(is_end, csum, 0.0)
    # csum at previous run end: propagate last end csum forward
    idx = jnp.arange(t * p)
    end_pos = jnp.where(is_end, idx, -1)
    last_end = jax.lax.associative_scan(jnp.maximum, end_pos, axis=1)
    prev_end = jnp.concatenate(
        [jnp.full((q_, 1), -1), last_end[:, :-1]], axis=1)
    prev_csum = jnp.where(prev_end >= 0,
                          jnp.take_along_axis(csum, jnp.maximum(prev_end, 0), axis=1),
                          0.0)
    seg_total = jnp.where(is_end, csum - prev_csum, -jnp.inf)
    seg_total = jnp.where(sd == jnp.iinfo(jnp.int32).max, -jnp.inf, seg_total)

    s, pos = jax.lax.top_k(seg_total, k)
    ids = jnp.take_along_axis(sd, pos, axis=1)
    ids = jnp.where(jnp.isfinite(s), ids, -1)
    return s, ids


class InvertedImpactIndex:
    """Impact-pruned inverted index (the Lucene analogue the reference drives
    through Anserini): per-term postings capped to the ``postings_cap``
    highest impacts. Exact when no term's document frequency exceeds the cap;
    otherwise standard impact-ordered pruning (the same approximation family
    Lucene's WAND/impact search uses). 10-100x faster than the exhaustive
    scorer for term-sparse queries."""

    def __init__(self, vocab_size: int, postings_cap: int = 256,
                 quantization_factor: int = 100, max_query_terms: int = 64,
                 mesh=None, **_):
        self.vocab_size = vocab_size
        self.cap = postings_cap
        self.quantization_factor = quantization_factor
        self.max_query_terms = max_query_terms
        self._vecs: list[SparseVec] = []
        self._built = False

    def __len__(self):
        return len(self._vecs)

    def add(self, vecs: Sequence[SparseVec], quantize: bool = True) -> None:
        if quantize:
            vecs = quantize_vecs(vecs, self.quantization_factor)
        self._vecs.extend(vecs)
        self._built = False

    def _finalize(self):
        if self._built:
            return
        from collections import defaultdict

        postings: dict[int, list[tuple[float, int]]] = defaultdict(list)
        for doc, vec in enumerate(self._vecs):
            for t, x in vec.items():
                postings[t].append((float(x), doc))
        inv_docs = np.full((self.vocab_size, self.cap), -1, np.int32)
        inv_vals = np.zeros((self.vocab_size, self.cap), np.float32)
        self.pruned_terms = 0
        for t, plist in postings.items():
            if len(plist) > self.cap:
                plist = sorted(plist, reverse=True)[: self.cap]
                self.pruned_terms += 1
            for j, (x, d) in enumerate(plist):
                inv_docs[t, j] = d
                inv_vals[t, j] = x
        self._inv_docs = jnp.asarray(inv_docs)
        self._inv_vals = jnp.asarray(inv_vals)
        self._built = True
        if self.pruned_terms > 0:
            # Pruning makes top-k approximate; evaluation-parity runs should
            # use SparseSearch(engine="exhaustive") (ADVICE r1 #4).
            logger.warning(
                "inverted index: %d docs, %d/%d terms pruned to cap %d — "
                "results are approximate (use engine='exhaustive' for exact "
                "evaluation parity)",
                len(self._vecs), self.pruned_terms, len(postings), self.cap)
        else:
            logger.info("inverted index: %d docs, %d terms, no pruning (exact)",
                        len(self._vecs), len(postings))

    def search(self, queries, k: int) -> tuple[np.ndarray, np.ndarray]:
        """queries: list of {term: weight} dicts (or [Q, V] dense array)."""
        self._finalize()
        if isinstance(queries, np.ndarray):
            converted = []
            for row in queries:
                (nz,) = np.nonzero(row)
                converted.append({int(t): float(row[t]) for t in nz})
            queries = converted
        t_max = self.max_query_terms
        qt = np.full((len(queries), t_max), -1, np.int32)
        qw = np.zeros((len(queries), t_max), np.float32)
        for i, vec in enumerate(queries):
            items = sorted(vec.items(), key=lambda kv: -kv[1])[:t_max]
            for j, (t, x) in enumerate(items):
                qt[i, j] = t
                qw[i, j] = x
        k_eff = min(k, len(self._vecs))
        s, i = _inverted_search(jnp.asarray(qt), jnp.asarray(qw),
                                self._inv_docs, self._inv_vals, k_eff)
        s, i = jax.device_get((s, i))
        return np.asarray(s, np.float32), np.asarray(i, np.int64)
