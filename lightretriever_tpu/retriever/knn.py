"""Exact k-NN engine — TPU-native replacement of Faiss.

The reference depends on Faiss (C++/CUDA) for dense retrieval
(reference: retriever/faiss_index.py:20-192, retriever/faiss_search.py:46-622,
GPU sharding via GpuMultipleClonerOptions at faiss_index.py:60-70). Here the
same capability is built from scratch on the TPU compute model:

* corpus embeddings live device-resident, row-sharded over the mesh's
  ``data`` axis — the analogue of Faiss multi-GPU shard mode;
* scoring is a bf16 matmul on the MXU with fp32 accumulation
  (``preferred_element_type``), the speed-of-light path for inner product;
* per-shard ``lax.top_k`` then a cross-chip ``all_gather`` of the k
  candidates + final top-k — merge traffic is O(shards * k), never O(N);
* corpora larger than HBM stream through ``search_streamed`` with a host-side
  running top-k merge, mirroring the reference's chunked heap pipeline
  (faiss_search.py:176-293) with numpy partial sort instead of heapq;
* MRL truncated search is a zero-copy column slice of the same index
  (the reference rebuilds per dim).

Index variants mirror the reference family (faiss_index.py):
  FlatIPIndex    — exact inner product (quality-bearing path)
  SQIndex        — int8 scalar quantization, dequantized on the fly (SQFaissSearch)
  BinaryIndex    — sign quantization; +-1 matmul == monotone Hamming (BinaryFaissSearch)
  PCAIndex       — learned rotation + dim reduction, delegates to flat (PCAFaissSearch)
"""
from __future__ import annotations

import functools
import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Host-side top-k merge (the heap of faiss_search.py:273-292, vectorized)
# ---------------------------------------------------------------------------
def merge_topk(
    scores_a: np.ndarray, ids_a: np.ndarray,
    scores_b: np.ndarray, ids_b: np.ndarray,
    k: int,
):
    """Merge two [Q, ka]/[Q, kb] candidate sets into the top-k of their union."""
    scores = np.concatenate([scores_a, scores_b], axis=1)
    ids = np.concatenate([ids_a, ids_b], axis=1)
    k = min(k, scores.shape[1])
    part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    psc = np.take_along_axis(scores, part, axis=1)
    pid = np.take_along_axis(ids, part, axis=1)
    order = np.argsort(-psc, axis=1, kind="stable")
    return np.take_along_axis(psc, order, axis=1), np.take_along_axis(pid, order, axis=1)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@jax.jit
def _trunc_inv_norms(corpus: jnp.ndarray) -> jnp.ndarray:
    """Reciprocal row norms of the (truncated) corpus; 0-norm rows -> 0.
    Sharding follows the corpus (XLA keeps the reduction local per shard)."""
    n = jnp.linalg.norm(corpus.astype(jnp.float32), axis=-1)
    return jnp.where(n > 0, 1.0 / jnp.maximum(n, 1e-9), 0.0)


# ---------------------------------------------------------------------------
# Device search kernels
# ---------------------------------------------------------------------------
# Exact-path scan chunk: bounds the materialized score block to [Q, chunk]
# (the full [Q, N] fp32 matrix at N=500k/Q=2048 is 4 GB — it OOMs alongside
# the resident corpus) and keeps XLA's slow TopK sort on modest widths.
_EXACT_CHUNK_ROWS = 131_072


def _scores_block(q, corpus, valid, inv_norms):
    s = jax.lax.dot_general(
        q, corpus.astype(q.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * inv_norms[None, :]
    return jnp.where(valid[None, :], s, -jnp.inf)


def _merge_pairs(sa, ia, sb, ib, k):
    cat_s = jnp.concatenate([sa, sb], axis=1)
    cat_i = jnp.concatenate([ia, ib], axis=1)
    s, sel = jax.lax.top_k(cat_s, k)
    return s, jnp.take_along_axis(cat_i, sel, axis=1)


def _fused_search(q, corpus, valid, inv_norms, k: int, method: str,
                  recall_target: float, oversample: int):
    """[Q, D] x [N, D] -> ([Q, k], [Q, k]) in one fused program.

    method="exact": lax.scan over corpus chunks with a running top-k carry —
      mathematically exact, O(Q*chunk) peak memory (TPU-profiled: ~1.5x the
      round-1 monolithic matmul+top_k, and it removes the [Q, N] HBM blowup).
    method="approx": lax.approx_max_k fused into the matmul epilogue (XLA
      PartialReduce, the MXU-native top-k primitive; TPU-profiled 500k x 1024
      top-100: 49k QPS @ recall .997 at rt=0.99 vs 5.7k exact). ``oversample``
      retrieves k*oversample candidates then exact-top-ks them, trading QPS
      for recall (k*2 @ rt=0.95: 94k QPS @ .987).

    ``inv_norms`` [N] rescales scores per row — ones normally; reciprocal
    truncated-dim norms for renormalized MRL search (matching the reference's
    shrink-then-renormalize, modeling_hybrid.py:605-622, without re-indexing).
    """
    n = corpus.shape[0]
    if method == "approx":
        scores = _scores_block(q, corpus, valid, inv_norms)
        kk = min(k * oversample, n)
        s, i = jax.lax.approx_max_k(scores, kk, recall_target=recall_target)
        if kk > k:
            s, sel = jax.lax.top_k(s, k)
            i = jnp.take_along_axis(i, sel, axis=1)
        return s, i

    # exact: chunked scan + tail
    chunk = min(_EXACT_CHUNK_ROWS, n)
    nch = n // chunk
    qn = q.shape[0]
    init = (jnp.full((qn, k), -jnp.inf, jnp.float32),
            jnp.zeros((qn, k), jnp.int32))
    if nch > 0:
        body = corpus[: nch * chunk].reshape(nch, chunk, -1)
        v3 = valid[: nch * chunk].reshape(nch, chunk)
        inv3 = inv_norms[: nch * chunk].reshape(nch, chunk)
        offs = jnp.arange(nch, dtype=jnp.int32) * chunk

        def step(carry, xs):
            cb, vb, ib, off = xs
            s1, i1 = jax.lax.top_k(_scores_block(q, cb, vb, ib), k)
            return _merge_pairs(*carry, s1, i1 + off, k), None

        init, _ = jax.lax.scan(step, init, (body, v3, inv3, offs))
    tail = n - nch * chunk
    if tail > 0:
        s1, i1 = jax.lax.top_k(
            _scores_block(q, corpus[nch * chunk:], valid[nch * chunk:],
                          inv_norms[nch * chunk:]),
            min(k, tail))
        init = _merge_pairs(*init, s1, i1 + nch * chunk, k)
    return init


@functools.partial(jax.jit, static_argnames=("k", "method", "recall_target",
                                             "oversample"))
def _topk_single(q: jnp.ndarray, corpus: jnp.ndarray, valid: jnp.ndarray,
                 inv_norms: jnp.ndarray, k: int,
                 method: str = "exact", recall_target: float = 0.99,
                 oversample: int = 1):
    return _fused_search(q, corpus, valid, inv_norms, k, method,
                         recall_target, oversample)


def _make_sharded_topk(mesh: Mesh, k_local: int, k_final: int, axis: str = "data",
                       method: str = "exact", recall_target: float = 0.99,
                       oversample: int = 1):
    """shard_map search: per-shard fused search, all-gather k candidates, merge.

    Replaces Faiss GPU shard mode (faiss_index.py:60-70): each chip scores its
    corpus rows; only [Q, shards*k_local] candidates cross ICI.
    """
    from jax import shard_map

    def _search(q, corpus, valid, inv_norms, row_offset):
        s, i = _fused_search(q, corpus, valid, inv_norms, k_local,
                             method, recall_target, oversample)
        gids = i + row_offset[0]
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)     # [Q, shards*k_local]
        g_all = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
        s2, i2 = jax.lax.top_k(s_all, k_final)
        return s2, jnp.take_along_axis(g_all, i2, axis=1)

    return jax.jit(shard_map(
        _search, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    ))


# ---------------------------------------------------------------------------
# Flat inner-product index
# ---------------------------------------------------------------------------
class FlatIPIndex:
    """Exact flat-IP index, device-resident, optionally mesh-sharded.

    API parity with the reference's FaissIndex wrapper
    (faiss_index.py:20-73): ``build/add`` then ``search`` with QPS logging.
    """

    def __init__(
        self,
        mesh: Optional[Mesh] = None,
        dtype=jnp.bfloat16,
        axis: str = "data",
        topk_method: str = "exact",       # exact | approx (lax.approx_max_k)
        recall_target: float = 0.99,      # approx mode only
        oversample: int = 1,              # approx mode: fetch k*oversample, re-top-k
    ):
        self.mesh = mesh
        self.dtype = dtype
        self.axis = axis
        self.topk_method = topk_method
        self.recall_target = recall_target
        self.oversample = oversample
        self._host_chunks: list[np.ndarray] = []
        self._corpus: Optional[jax.Array] = None
        self._valid: Optional[jax.Array] = None
        self._offsets: Optional[jax.Array] = None
        self._n = 0
        self._search_fns: dict[int, callable] = {}

    def __len__(self) -> int:
        return self._n

    # -- build -------------------------------------------------------------
    def add(self, embeddings: np.ndarray) -> None:
        """Append corpus rows (host-side until finalize)."""
        embeddings = np.asarray(embeddings)
        assert embeddings.ndim == 2
        self._host_chunks.append(embeddings)
        self._n += embeddings.shape[0]
        self._corpus = None  # invalidate device copy

    def _finalize(self) -> None:
        if self._corpus is not None or self._n == 0:
            return
        emb = np.concatenate(self._host_chunks, axis=0) if len(self._host_chunks) > 1 \
            else self._host_chunks[0]
        n_shards = self.mesh.shape[self.axis] if self.mesh else 1
        n_pad = _round_up(max(self._n, n_shards), n_shards)
        valid = np.zeros(n_pad, bool)
        valid[: self._n] = True
        if n_pad != self._n:
            emb = np.concatenate(
                [emb, np.zeros((n_pad - self._n, emb.shape[1]), emb.dtype)], axis=0
            )
        rows_per = n_pad // n_shards
        offsets = np.arange(n_shards, dtype=np.int32).repeat(rows_per) * rows_per
        # _search adds row_offset[0] of the local shard; store per-row offsets
        if self.mesh is not None:
            sh_c = NamedSharding(self.mesh, P(self.axis, None))
            sh_v = NamedSharding(self.mesh, P(self.axis))
            self._corpus = jax.device_put(emb.astype(self.dtype), sh_c)
            self._valid = jax.device_put(valid, sh_v)
            self._offsets = jax.device_put(offsets, sh_v)
        else:
            self._corpus = jnp.asarray(emb, self.dtype)
            self._valid = jnp.asarray(valid)
            self._offsets = None

    # -- search ------------------------------------------------------------
    def search(
        self, queries: np.ndarray, k: int, dim: Optional[int] = None,
        renormalize: bool = True, return_device: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k search. ``dim``: MRL truncated search over leading columns
        (zero-copy slice of the resident index); with ``renormalize`` scores
        are rescaled by the truncated corpus-row norms, matching a
        renormalized (cosine) truncated index without rebuilding it.

        ``return_device=True`` skips the host transfer and returns device
        arrays (scores fp32, ids int32, padding ids NOT mapped to -1) so a
        pipelined server can overlap successive searches; call
        ``jax.device_get`` / np.asarray when the results are needed."""
        self._finalize()
        assert self._corpus is not None, "search on empty index"
        k_eff = min(k, self._n)
        t0 = time.perf_counter()
        corpus, valid = self._corpus, self._valid
        q = jnp.asarray(queries, self.dtype)
        if dim:
            corpus = corpus[:, :dim]
            q = q[:, :dim]
            q = q / jnp.maximum(jnp.linalg.norm(
                q.astype(jnp.float32), axis=-1, keepdims=True), 1e-9).astype(q.dtype)
        if dim and renormalize:
            inv_norms = _trunc_inv_norms(corpus)
        else:
            inv_norms = jnp.ones((corpus.shape[0],), jnp.float32)
            if self.mesh is not None:
                inv_norms = jax.device_put(
                    inv_norms, NamedSharding(self.mesh, P(self.axis)))
        if self.mesh is not None:
            rows_per = corpus.shape[0] // self.mesh.shape[self.axis]
            k_local = min(k_eff, rows_per)
            key = (k_local, k_eff, dim)
            if key not in self._search_fns:
                self._search_fns[key] = _make_sharded_topk(
                    self.mesh, k_local, k_eff, self.axis,
                    method=self.topk_method, recall_target=self.recall_target,
                    oversample=self.oversample,
                )
            s, i = self._search_fns[key](q, corpus, valid, inv_norms, self._offsets)
        else:
            s, i = _topk_single(q, corpus, valid, inv_norms, k_eff,
                                method=self.topk_method,
                                recall_target=self.recall_target,
                                oversample=self.oversample)
        if return_device:
            return s, i
        s, i = jax.device_get((s, i))  # one host round-trip for both
        s = np.asarray(s, np.float32)
        i = np.asarray(i, np.int64)
        i[s == -np.inf] = -1
        dt = time.perf_counter() - t0
        logger.info("kNN search: %d queries in %.4fs (%.1f QPS)",
                    len(queries), dt, len(queries) / max(dt, 1e-9))
        return s, i

    def search_streamed(
        self, queries: np.ndarray, k: int,
        corpus_iter=None, chunk_rows: int = 1 << 20, dim: Optional[int] = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Stream host corpus chunks through the device with running top-k
        merge — for corpora larger than HBM (parity: faiss_search.py:176-293).

        ``corpus_iter`` yields np arrays; defaults to the host chunks fed to
        ``add`` (re-chunked to ``chunk_rows``).
        """
        if corpus_iter is None:
            emb = np.concatenate(self._host_chunks, axis=0) if len(self._host_chunks) > 1 \
                else self._host_chunks[0]
            corpus_iter = (emb[i: i + chunk_rows] for i in range(0, len(emb), chunk_rows))

        def stage(chunk):
            # Device-put happens here, inside the prefetch thread, so the
            # host->device transfer of chunk i+1 overlaps chunk i's search
            sub = FlatIPIndex(self.mesh, self.dtype, self.axis,
                              topk_method=self.topk_method,
                              recall_target=self.recall_target,
                              oversample=self.oversample)
            sub.add(chunk)
            sub._finalize()
            return sub, len(chunk)

        from ..training.data import _prefetch_iter

        best_s = best_i = None
        offset = 0
        for sub, n_chunk in _prefetch_iter(map(stage, corpus_iter), 1):
            s, i = sub.search(queries, min(k, n_chunk), dim=dim)
            i = np.where(i >= 0, i + offset, -1)
            offset += n_chunk
            if best_s is None:
                best_s, best_i = s, i
            else:
                best_s, best_i = merge_topk(best_s, best_i, s, i, k)
        return best_s, best_i


# ---------------------------------------------------------------------------
# Quantized variants
# ---------------------------------------------------------------------------
class SQIndex(FlatIPIndex):
    """int8 scalar-quantized index (parity: SQFaissSearch, faiss_search.py:567).

    Per-dim symmetric scale s_d = max|x_d| / 127; rows stored int8, cast to
    bf16 at matmul time (the MXU eats the cast for free); scores are computed
    against scale-folded queries so no dequantized corpus copy ever exists.
    """

    def __init__(self, mesh=None, axis: str = "data"):
        super().__init__(mesh, jnp.int8, axis)
        self._scale: Optional[np.ndarray] = None

    def _finalize(self) -> None:
        if self._corpus is not None or self._n == 0:
            return
        emb = np.concatenate(self._host_chunks, axis=0).astype(np.float32)
        self._scale = np.abs(emb).max(axis=0) / 127.0
        self._scale[self._scale == 0] = 1.0
        q8 = np.clip(np.round(emb / self._scale), -127, 127).astype(np.int8)
        saved, self._host_chunks = self._host_chunks, [q8]
        try:
            super()._finalize()
        finally:
            self._host_chunks = saved

    def search(self, queries, k, dim=None):
        self._finalize()
        q = np.asarray(queries, np.float32) * self._scale[None, :]  # fold dequant scale
        saved = self.dtype
        self.dtype = jnp.bfloat16  # queries in bf16; corpus already int8 on device
        try:
            return super().search(q, k, dim=dim)
        finally:
            self.dtype = saved


class BinaryIndex(FlatIPIndex):
    """Sign-quantized index (parity: FaissBinaryIndex, faiss_index.py:116-192).

    Rows stored as +-1 int8. <q_sign, c_sign> = D - 2 * hamming, so MXU matmul
    ranks identically to Faiss's Hamming stage. ``rerank_with`` refines the
    top candidates against full-precision embeddings (the unpack-rerank trick).
    """

    def __init__(self, mesh=None, axis: str = "data"):
        super().__init__(mesh, jnp.int8, axis)
        self._fp_rows: Optional[np.ndarray] = None

    def add(self, embeddings: np.ndarray, keep_fp: bool = True) -> None:
        emb = np.asarray(embeddings, np.float32)
        if keep_fp:
            self._fp_rows = emb if self._fp_rows is None \
                else np.concatenate([self._fp_rows, emb], axis=0)
        super().add(np.where(emb >= 0, 1, -1).astype(np.int8))

    def search(self, queries, k, dim=None, rerank: bool = True, factor: int = 4):
        qs = np.where(np.asarray(queries) >= 0, 1, -1).astype(np.float32)
        saved = self.dtype
        self.dtype = jnp.bfloat16
        try:
            s, i = super().search(qs, min(k * factor if rerank else k, self._n), dim=dim)
        finally:
            self.dtype = saved
        if not rerank or self._fp_rows is None:
            return s[:, :k], i[:, :k]
        # Rerank candidates with full-precision dot product (host gather, device matmul)
        qf = np.asarray(queries, np.float32)
        safe = np.maximum(i, 0)
        cand = self._fp_rows[safe]                       # [Q, kf, D]
        rs = np.einsum("qd,qkd->qk", qf, cand, dtype=np.float32)
        rs[i < 0] = -np.inf
        order = np.argsort(-rs, axis=1)[:, :k]
        return np.take_along_axis(rs, order, axis=1), np.take_along_axis(i, order, axis=1)


class PCAIndex(FlatIPIndex):
    """PCA-rotated reduced-dim index (parity: PCAFaissSearch, faiss_search.py:512).

    ``train`` learns the rotation from (a sample of) the corpus via eigh of
    the covariance; rows and queries are projected before flat search.
    """

    def __init__(self, out_dim: int, mesh=None, dtype=jnp.bfloat16, axis: str = "data"):
        super().__init__(mesh, dtype, axis)
        self.out_dim = out_dim
        self._rotation: Optional[np.ndarray] = None
        self._mean: Optional[np.ndarray] = None

    def train(self, sample: np.ndarray) -> None:
        x = np.asarray(sample, np.float32)
        self._mean = x.mean(axis=0)
        cov = np.cov((x - self._mean).T)
        w, v = np.linalg.eigh(cov)
        self._rotation = v[:, ::-1][:, : self.out_dim]   # top components

    def _project(self, x: np.ndarray) -> np.ndarray:
        assert self._rotation is not None, "call train() first"
        return (np.asarray(x, np.float32) - self._mean) @ self._rotation

    def add(self, embeddings: np.ndarray) -> None:
        if self._rotation is None:
            self.train(embeddings)
        super().add(self._project(embeddings))

    def search(self, queries, k, dim=None):
        return super().search(self._project(queries), k, dim=dim)


def _ivf_factory(**kwargs):
    from .ann import IVFIndex

    return IVFIndex(**kwargs)


def _pq_factory(**kwargs):
    from .ann import PQIndex

    return PQIndex(**kwargs)


def _hnsw_factory(**kwargs):
    from .hnsw import HNSWIndex

    return HNSWIndex(**kwargs)


def _hnsw_sq_factory(**kwargs):
    from .hnsw import HNSWSQIndex

    return HNSWSQIndex(**kwargs)


INDEX_REGISTRY = {
    "flat": FlatIPIndex,
    "sq": SQIndex,
    "binary": BinaryIndex,
    "pca": PCAIndex,
    "ivf": _ivf_factory,
    "pq": _pq_factory,
    "hnsw": _hnsw_factory,
    "hnsw_sq": _hnsw_sq_factory,
}
