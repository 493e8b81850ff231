"""Block-max impact pruning — the Lucene WAND/MaxScore analogue, TPU-shaped.

Lucene's impact search is fast because impact-ordered postings let it skip
documents that provably cannot enter the top-k (WAND / block-max MaxScore).
That algorithm is document-at-a-time pointer chasing — the worst possible
shape for a systolic array. This module keeps the *pruning math* (score
upper bounds, certificates) but re-hosts it on the two-phase
coarse->fine structure TPUs are good at (the same shape as IVF probing):

1. Docs are clustered host-side by dominant term (the term with the largest
   impact) into blocks of ``block_docs`` documents. Each block keeps a
   fixed-width vector of its top ``term_budget`` (term, max-impact) pairs
   plus a scalar residual ``r_b`` = the largest impact among the terms it
   had to drop. For a non-negative query q, every member doc's score is
   bounded by ``sum_{t in kept} q_t * bmax_t + (uncovered query mass) * r_b``
   — the kept terms bound exactly, every dropped or absent term contributes
   at most ``q_t * r_b``. Fixed width keeps the bound pass cheap on ANY
   term distribution (the union-budget alternative degenerates to one-doc
   blocks on diverse corpora).
2. Phase 1 scores *blocks* with the same gather-einsum the exhaustive
   engine uses on docs ([Q, NB] upper bounds, ~block_docs x cheaper than
   the full scan), takes the top ``probe_blocks`` blocks per query.
3. Phase 2 exact-scores only the probed blocks' documents and top-k's.
4. Certificate: a query's result is provably the EXACT top-k when its k-th
   score >= the best upper bound among unprobed blocks (reported per batch
   as ``last_certified_frac``) — the same optimality argument WAND makes,
   evaluated as one vectorized compare instead of a priority queue.

Everything is static-shape: padded blocks, fixed probe count, one jit for
the whole search. Reference parity surface: the Anserini impact-search fast
path (/root/reference/retriever/anserini_search.py:143-216); the exhaustive
engine (sparse_scorer.SparseImpactIndex) remains the evaluation-parity
default.
"""
from __future__ import annotations

import functools
import logging
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .knn import _round_up
from .sparse_scorer import DictIngestMixin, pack_sparse_vecs

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("k", "probe", "block_docs"))
def _blockmax_search(
    q_dense,        # [Q, V] fp32 query term weights (non-negative)
    b_ids,          # [NB, Kb] block term ids (top impacts), -1 pad
    b_vals,         # [NB, Kb] block per-term max impacts
    b_resid,        # [NB] max impact among the block's DROPPED terms (0 if none)
    b_start,        # [NB] first doc row of each block
    b_len,          # [NB] docs in each block (0 = padding block)
    d_ids,          # [N_pad, K] doc term ids, -1 pad (last row all -1)
    d_vals,         # [N_pad, K] doc impacts
    k: int,
    probe: int,
    block_docs: int,
):
    nb = b_ids.shape[0]
    n_pad = d_ids.shape[0]

    # ---- phase 1: block upper bounds ------------------------------------
    okb = b_ids >= 0
    gb = jnp.take(q_dense, jnp.where(okb, b_ids, 0), axis=1)       # [Q, NB, Kb]
    gb = jnp.where(okb[None], gb, 0.0).astype(jnp.float32)
    ub = jnp.einsum("qbk,bk->qb", gb,
                    jnp.where(okb, b_vals, 0.0).astype(jnp.float32))
    # query mass not covered by the kept terms, bounded by the residual
    q_sum = q_dense.astype(jnp.float32).sum(axis=1)                # [Q]
    kept_qsum = gb.sum(axis=2)                                     # [Q, NB]
    ub = ub + jnp.maximum(q_sum[:, None] - kept_qsum, 0.0) * b_resid[None, :]
    ub = jnp.where(b_len[None, :] > 0, ub, -jnp.inf)
    # probe+1: the extra slot is the best UNPROBED bound -> certificate
    ub_top, blk = jax.lax.top_k(ub, min(probe + 1, nb))
    if ub_top.shape[1] > probe:
        probe_blk, cert_ub = blk[:, :probe], ub_top[:, probe]
    else:  # every block probed: unconditionally exact
        probe_blk = blk
        pad = probe - blk.shape[1]
        if pad:
            probe_blk = jnp.concatenate(
                [blk, jnp.zeros((blk.shape[0], pad), blk.dtype)], axis=1)
        cert_ub = jnp.full((q_dense.shape[0],), -jnp.inf)

    # ---- phase 2: exact scores inside probed blocks ---------------------
    rows = b_start[probe_blk][:, :, None] + jnp.arange(block_docs)  # [Q, P, C]
    valid = jnp.arange(block_docs)[None, None, :] < b_len[probe_blk][:, :, None]
    if ub_top.shape[1] <= probe:  # padded probe entries are duplicates
        valid &= (jnp.arange(probe) < blk.shape[1])[None, :, None]
    rows = jnp.where(valid, rows, n_pad - 1)        # last row is all-pad
    rows = rows.reshape(q_dense.shape[0], -1)        # [Q, P*C]

    def per_query(qv, rws):
        idc = d_ids[rws]                             # [P*C, K]
        vlc = d_vals[rws]
        okd = idc >= 0
        contrib = qv[jnp.where(okd, idc, 0)] * jnp.where(okd, vlc, 0.0)
        return contrib.astype(jnp.float32).sum(-1)   # [P*C]

    scores = jax.vmap(per_query)(q_dense, rows)
    scores = jnp.where(valid.reshape(scores.shape), scores, -jnp.inf)
    k_eff = min(k, scores.shape[1])
    s, pos = jax.lax.top_k(scores, k_eff)
    ids = jnp.take_along_axis(rows, pos, axis=1)
    ids = jnp.where(jnp.isfinite(s), ids, -1)

    # ---- certificate ----------------------------------------------------
    kth = s[:, k_eff - 1]
    certified = (kth >= cert_ub) | ~jnp.isfinite(cert_ub)
    return s, ids, certified


class BlockMaxImpactIndex(DictIngestMixin):
    """Impact search with block-max pruning; exact for certified queries.

    ``probe_blocks`` trades speed for recall: each query exact-scores only
    ``probe_blocks * block_docs`` candidates chosen by block upper bound.
    ``term_budget`` caps the width of each block's term-max vector (default
    min(4*kmax, 1024)); terms beyond it are folded into a scalar residual
    bound, so the structure stays valid (just looser) on term-diverse
    corpora. ``last_certified``/``last_certified_frac`` after each search
    report which queries' top-k is *provably* exact (WAND-style
    certificate).
    """

    def __init__(
        self,
        vocab_size: int,
        block_docs: int = 128,
        term_budget: Optional[int] = None,
        probe_blocks: int = 32,
        quantization_factor: int = 100,
        mesh=None,  # accepted for factory-signature parity; single-device engine
        **_,
    ):
        self.vocab_size = vocab_size
        self.block_docs = block_docs
        self.term_budget = term_budget
        self.probe_blocks = probe_blocks
        self.quantization_factor = quantization_factor
        # Bounds the [Qb, probe*block_docs, K] phase-2 gather buffer
        self.query_block_budget_bytes = 1 << 30
        self._init_ingest()
        self.last_certified_frac: Optional[float] = None
        self.last_certified: Optional[np.ndarray] = None  # [Q] bool per query

    # ------------------------------------------------------------------ build
    def _finalize(self) -> None:
        if self._built:
            return
        t0 = time.perf_counter()
        n = len(self._vecs)
        assert n > 0, "empty index"
        ids, vals = pack_sparse_vecs(self._vecs)
        kmax = ids.shape[1]
        budget = self.term_budget or min(max(4 * kmax, 64), 1024)
        budget = max(budget, kmax)

        # Cluster docs so block maxima stay tight (document reordering, the
        # block-max literature's recipe, done the cheap way): key on the
        # MINIMUM id among each doc's heavy terms (impact >= half its max) —
        # a min-wise signature that collides for topically-similar docs even
        # when their single dominant term differs — then dominant term, then
        # impact. O(N K) vectorized.
        dom_val = vals.max(1)
        heavy = vals >= np.maximum(0.5 * dom_val[:, None], 1e-9)
        min_heavy = np.where(heavy & (ids >= 0), ids, np.iinfo(np.int32).max).min(1)
        dom_term = np.where(dom_val > 0, ids[np.arange(n), vals.argmax(1)], -1)
        order = np.lexsort((-dom_val, dom_term, min_heavy))
        ids, vals = ids[order], vals[order]

        # Fixed C-doc blocks; per block keep the top-``budget`` terms by max
        # impact, bound the dropped rest by the residual scalar. All segment
        # ops vectorized (1M docs build in seconds, not minutes).
        C = self.block_docs
        nb = (n + C - 1) // C
        starts = [bi * C for bi in range(nb)]
        lens = [min(C, n - bi * C) for bi in range(nb)]

        blk = np.repeat(np.arange(n, dtype=np.int64) // C, kmax)
        flat_t, flat_v = ids.ravel(), vals.ravel()
        m = flat_t >= 0
        key = blk[m] * np.int64(self.vocab_size) + flat_t[m]
        v = flat_v[m]
        # group max over (block, term): sort (key, val) asc, take run-last
        o = np.lexsort((v, key))
        key_s, v_s = key[o], v[o]
        is_last = np.concatenate([key_s[1:] != key_s[:-1], [True]])
        ukey, gmax = key_s[is_last], v_s[is_last]
        ublk = (ukey // self.vocab_size).astype(np.int64)
        uterm = (ukey % self.vocab_size).astype(np.int32)
        # rank within block by impact desc; keep rank < budget
        o2 = np.lexsort((-gmax, ublk))
        ublk, uterm, gmax = ublk[o2], uterm[o2], gmax[o2]
        seg_start = np.concatenate(
            [[0], np.flatnonzero(ublk[1:] != ublk[:-1]) + 1])
        seg_len = np.diff(np.concatenate([seg_start, [len(ublk)]]))
        rank = np.arange(len(ublk)) - np.repeat(seg_start, seg_len)
        keep = rank < budget
        resid = np.zeros(nb, np.float32)
        first_drop = rank == budget   # impacts sorted desc: first dropped = max
        resid[ublk[first_drop]] = gmax[first_drop]

        kb = _round_up(max(min(int(seg_len.max(initial=1)), budget), 1), 8)
        b_ids = np.full((nb, kb), -1, np.int32)
        b_vals = np.zeros((nb, kb), np.float32)
        b_ids[ublk[keep], rank[keep]] = uterm[keep]
        b_vals[ublk[keep], rank[keep]] = gmax[keep]

        # one all-pad doc row: the safe gather target for invalid slots
        d_ids = np.concatenate([ids, np.full((1, kmax), -1, np.int32)])
        d_vals = np.concatenate([vals, np.zeros((1, kmax), np.float32)])

        self._b_ids = jnp.asarray(b_ids)
        self._b_vals = jnp.asarray(b_vals)
        self._b_resid = jnp.asarray(resid)
        self._b_start = jnp.asarray(np.asarray(starts, np.int32))
        self._b_len = jnp.asarray(np.asarray(lens, np.int32))
        self._d_ids = jnp.asarray(d_ids)
        self._d_vals = jnp.asarray(d_vals)
        self._order = np.asarray(order)           # block row -> original doc id
        self._kmax = kmax
        self.n_blocks = nb
        self.block_term_width = kb
        self._built = True
        logger.info(
            "block-max index: %d docs -> %d blocks (<=%d docs, term width %d, "
            "doc kmax %d) in %.1fs",
            n, nb, self.block_docs, kb, kmax, time.perf_counter() - t0)

    # ----------------------------------------------------------------- search
    def search(self, queries, k: int,
               probe_blocks: Optional[int] = None) -> tuple[np.ndarray, np.ndarray]:
        """Top-k impact search; queries as [Q, V] dense or term->weight dicts.

        Scores against negative query weights lose the upper-bound guarantee
        (block maxima assume non-negative contributions) — impact/count
        queries, which is all the production converter emits, are >= 0.
        """
        self._finalize()
        probe = min(probe_blocks or self.probe_blocks, self.n_blocks)
        q = self._query_matrix(queries)
        n_q = q.shape[0]
        # phase-1 [Qb, NB, Kb] + phase-2 [Qb, probe*C, K] gather buffers
        per_q = (self.n_blocks * self.block_term_width * 8
                 + probe * self.block_docs * self._kmax * 8)
        q_block = max(int(self.query_block_budget_bytes / max(per_q, 1)), 4)
        out_s, out_i, out_c = [], [], []
        for lo in range(0, n_q, q_block):
            s, i, cert = _blockmax_search(
                jnp.asarray(q[lo: lo + q_block]),
                self._b_ids, self._b_vals, self._b_resid,
                self._b_start, self._b_len,
                self._d_ids, self._d_vals,
                k=min(k, len(self._vecs)), probe=probe,
                block_docs=self.block_docs)
            s, i, cert = jax.device_get((s, i, cert))
            out_s.append(np.asarray(s, np.float32))
            out_i.append(np.asarray(i, np.int64))
            out_c.append(np.asarray(cert, bool))
        self.last_certified = np.concatenate(out_c)
        self.last_certified_frac = float(self.last_certified.mean())
        s = np.concatenate(out_s)
        i = np.concatenate(out_i)
        # map block-order rows back to original doc ids
        valid = i >= 0
        i[valid] = self._order[i[valid]]
        return s, i


# ---------------------------------------------------------------------------
# Impact-ordered candidate generation + exact rescoring (JASS/MaxScore style)
# ---------------------------------------------------------------------------
_BIG = np.iinfo(np.int32).max


@functools.partial(jax.jit, static_argnames=("k",))
def _impact_rescore_search(
    q_dense,       # [Q, V] fp32 query weights (full, for EXACT rescoring)
    q_ids,         # [Q, T] top query term ids (-1 pad) — candidate drivers
    top_docs,      # [V, P] impact-ordered postings: doc ids, -1 pad
    d_ids,         # [N+1, K] doc term ids (-1 pad; last row all-pad)
    d_vals,        # [N+1, K] doc impacts
    k: int,
):
    n_pad = d_ids.shape[0]
    okt = q_ids >= 0
    cand = top_docs[jnp.where(okt, q_ids, 0)]                 # [Q, T, P]
    cand = jnp.where(okt[:, :, None] & (cand >= 0), cand, _BIG)
    cand = jnp.sort(cand.reshape(q_dense.shape[0], -1), axis=1)   # [Q, T*P]
    dup = jnp.concatenate(
        [jnp.zeros((cand.shape[0], 1), bool), cand[:, 1:] == cand[:, :-1]],
        axis=1)
    valid = (cand < _BIG) & ~dup
    rows = jnp.where(valid, cand, n_pad - 1)

    def per_query(qv, rws):
        idc = d_ids[rws]                                      # [T*P, K]
        vlc = d_vals[rws]
        okd = idc >= 0
        contrib = qv[jnp.where(okd, idc, 0)] * jnp.where(okd, vlc, 0.0)
        return contrib.astype(jnp.float32).sum(-1)

    scores = jax.vmap(per_query)(q_dense, rows)
    scores = jnp.where(valid, scores, -jnp.inf)
    k_eff = min(k, scores.shape[1])
    s, pos = jax.lax.top_k(scores, k_eff)
    ids = jnp.take_along_axis(rows, pos, axis=1)
    ids = jnp.where(jnp.isfinite(s), ids, -1)
    return s, ids


class ImpactOrderedIndex(DictIngestMixin):
    """Impact-ordered candidate generation with exact rescoring.

    The TPU rendering of Lucene/JASS impact search: per term, postings are
    sorted by impact and the top ``postings_cap`` doc ids kept. A query
    gathers the candidate union of its terms' top postings (one table
    lookup), dedups with one sort, and EXACT-scores every candidate with
    the same gather-einsum the exhaustive engine uses — so unlike a capped
    inverted index, a candidate's score is never truncated; the cap only
    bounds which docs can be *missed*. Certificate: a doc outside the
    candidate set scores at most ``sum_t q_t * cutoff_t`` (cutoff_t = the
    impact of term t's last kept posting; term-max for query terms beyond
    ``max_query_terms``), so a query whose k-th found score beats that
    bound provably returned the exact top-k.

    Reference parity: anserini_search.py:143-216 (impact search);
    supersedes InvertedImpactIndex for serving (no score truncation).
    """

    def __init__(self, vocab_size: int, postings_cap: int = 256,
                 max_query_terms: int = 64, quantization_factor: int = 100,
                 mesh=None, **_):
        self.vocab_size = vocab_size
        self.cap = postings_cap
        self.max_query_terms = max_query_terms
        self.quantization_factor = quantization_factor
        self.query_block_budget_bytes = 1 << 30
        self._init_ingest()
        self.last_certified: Optional[np.ndarray] = None
        self.last_certified_frac: Optional[float] = None

    def _finalize(self) -> None:
        if self._built:
            return
        t0 = time.perf_counter()
        n = len(self._vecs)
        assert n > 0, "empty index"
        ids, vals = pack_sparse_vecs(self._vecs)
        kmax = ids.shape[1]
        doc_of = np.repeat(np.arange(n, dtype=np.int64), kmax)
        flat_t, flat_v = ids.ravel(), vals.ravel()
        m = flat_t >= 0
        t_, d_, v_ = flat_t[m], doc_of[m], flat_v[m]
        # impact-DESC order within each term
        o = np.lexsort((-v_, t_))
        t_, d_, v_ = t_[o], d_[o], v_[o]
        seg_start = np.concatenate([[0], np.flatnonzero(t_[1:] != t_[:-1]) + 1])
        seg_len = np.diff(np.concatenate([seg_start, [len(t_)]]))
        rank = np.arange(len(t_)) - np.repeat(seg_start, seg_len)
        keep = rank < self.cap
        top_docs = np.full((self.vocab_size, self.cap), -1, np.int32)
        top_docs[t_[keep], rank[keep]] = d_[keep]
        # cutoff = impact of the first DROPPED posting (postings are desc,
        # so any missed doc's contribution on this term is <= cutoff)
        cutoff = np.zeros(self.vocab_size, np.float32)
        at_cap = rank == self.cap
        cutoff[t_[at_cap]] = v_[at_cap]
        tmax = np.zeros(self.vocab_size, np.float32)
        first = rank == 0
        tmax[t_[first]] = v_[first]

        self._top_docs = jnp.asarray(top_docs)
        self._cutoff = cutoff
        self._tmax = tmax
        self._d_ids = jnp.asarray(
            np.concatenate([ids, np.full((1, kmax), -1, np.int32)]))
        self._d_vals = jnp.asarray(
            np.concatenate([vals, np.zeros((1, kmax), np.float32)]))
        self._kmax = kmax
        self.capped_terms = int((seg_len > self.cap).sum())
        self._built = True
        logger.info(
            "impact-ordered index: %d docs, %d terms (%d capped at %d), "
            "doc kmax %d in %.1fs",
            n, len(seg_start), self.capped_terms, self.cap, kmax,
            time.perf_counter() - t0)

    def _query_arrays(self, queries):
        if isinstance(queries, np.ndarray):
            dense = queries.astype(np.float32)
            qd = []
            for row in dense:
                (nz,) = np.nonzero(row)
                qd.append({int(t): float(row[t]) for t in nz})
        else:
            qd = queries
            dense = np.zeros((len(queries), self.vocab_size), np.float32)
            for i, vec in enumerate(qd):
                for t, x in vec.items():
                    if 0 <= t < self.vocab_size:
                        dense[i, t] = x
        t_cap = self.max_query_terms
        q_ids = np.full((len(qd), t_cap), -1, np.int32)
        for i, vec in enumerate(qd):
            items = sorted(vec.items(), key=lambda kv: -kv[1])[:t_cap]
            for j, (t, _) in enumerate(items):
                if 0 <= t < self.vocab_size:
                    q_ids[i, j] = t
        return dense, q_ids

    def search(self, queries, k: int) -> tuple[np.ndarray, np.ndarray]:
        self._finalize()
        dense, q_ids = self._query_arrays(queries)
        n_q = dense.shape[0]
        m = self.max_query_terms * self.cap
        per_q = m * (self._kmax * 8 + 12)
        q_block = max(int(self.query_block_budget_bytes / max(per_q, 1)), 4)
        out_s, out_i = [], []
        for lo in range(0, n_q, q_block):
            s, i = _impact_rescore_search(
                jnp.asarray(dense[lo: lo + q_block]),
                jnp.asarray(q_ids[lo: lo + q_block]),
                self._top_docs, self._d_ids, self._d_vals,
                k=min(k, len(self._vecs)))
            s, i = jax.device_get((s, i))
            out_s.append(np.asarray(s, np.float32))
            out_i.append(np.asarray(i, np.int64))
        s = np.concatenate(out_s)
        i = np.concatenate(out_i)
        k_ret = min(k, len(self._vecs))
        if s.shape[1] < k_ret:
            # kernel candidate width is max_query_terms*cap, which can be
            # narrower than k: pad to the width every sibling engine returns
            # (pad slots score -inf -> never certified, honestly)
            pad = k_ret - s.shape[1]
            s = np.pad(s, ((0, 0), (0, pad)), constant_values=-np.inf)
            i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
        # host-side certificate
        used = q_ids >= 0
        safe = np.where(used, q_ids, 0)
        qw_used = np.take_along_axis(dense, safe, axis=1) * used
        bound = (qw_used * self._cutoff[safe]).sum(1)
        covered = np.zeros_like(dense, dtype=bool)
        r_idx, _ = np.nonzero(used)
        covered[r_idx, q_ids[used]] = True
        dropped = (dense > 0) & ~covered
        bound += (dense * self._tmax[None, :] * dropped).sum(1)
        k_eff = min(k, len(self._vecs))
        kth = s[:, k_eff - 1]
        self.last_certified = (kth >= bound) & np.isfinite(kth)
        self.last_certified_frac = float(self.last_certified.mean())
        return s, i
