"""Flash attention for TPU (Pallas), with segment-id packing and a
shared-prompt visibility mode.

TPU-native replacement for the reference's CUDA flash-attn dependency
(reference: SURVEY.md §2.3 item 4; utils/nested_input.py varlen packing;
utils/monkey_patch.py bidirectional + 4-D blocked masks). Design decisions:

* One mask language: ``segment_ids`` ([B, S] int32, 0 = padding). Tokens
  attend within their segment. This subsumes (a) plain padding masks,
  (b) sequence packing (the reference's FA2 varlen cu_seqlens path), and
  (c) the non-contextual query "blocked" mask (nonctx_emb_utils.py:27-82)
  via ``prompt_len``: the first ``prompt_len`` positions form a shared
  prefix visible to every segment, so `[prompt][tok eos][tok eos]...`
  runs in one forward without any 4-D mask materialization.
* Online-softmax forward: grid over (batch, heads, q-blocks), K/V resident
  in VMEM per (b, h), fp32 accumulators, bf16 MXU matmuls.
* FA2-style backward (custom VJP): recompute P from saved logsumexp; one
  kernel accumulates dQ over k-blocks, another accumulates dK/dV over
  q-blocks. No [B,H,S,S] materialization anywhere.
* GQA handled by head-index mapping in the BlockSpec (no KV repeat in HBM).
* head_dim is zero-padded to a lane multiple (128); scale uses the true dim.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _causal_k_hi(qi: int, block_q: int, block_k: int, n_kb: int) -> int:
    """Number of k-blocks a causal q-block ``qi`` intersects: the last row of
    the block is position (qi+1)*block_q - 1, so blocks up to
    ceil((qi+1)*block_q / block_k) are (partially) visible. Correct for any
    block_q/block_k ratio (the old ``qi*block_q//block_k + 1`` form silently
    skipped near-diagonal blocks when block_q > block_k)."""
    return min(-(-((qi + 1) * block_q) // block_k), n_kb)


def _fat_unroll(sq: int, skv: int, block_q: int, block_k: int, causal: bool):
    """Exact (q-block, k-block) iteration count of the fat-program kernels per
    (batch, kv-head, group-head) — i.e. the static unroll size. None when the
    sequence dims don't divide the blocks (fat path unavailable)."""
    if sq % block_q or skv % block_k or sq == 0 or skv == 0:
        return None
    n_qb, n_kb = sq // block_q, skv // block_k
    if causal:
        return sum(_causal_k_hi(qi, block_q, block_k, n_kb) for qi in range(n_qb))
    return n_qb * n_kb


def _use_fat_path(sq: int, skv: int, kv_ratio: int, block_q: int, block_k: int,
                  causal: bool) -> bool:
    """Shared forward/backward dispatch predicate: the fat kernels win when the
    total static unroll stays small (per-program fixed costs dominate)."""
    if sq != skv:
        return False
    unroll = _fat_unroll(sq, skv, block_q, block_k, causal)
    return unroll is not None and kv_ratio * unroll <= 48


# ---------------------------------------------------------------------------
# Reference implementation (pure jnp) — the correctness oracle and CPU path
# ---------------------------------------------------------------------------
def attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    prompt_len: int = 0,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Dense-softmax attention with the same mask semantics as the kernel.

    Shapes: q [B, Sq, H, D]; k, v [B, Skv, Hkv, D] (Hkv divides H).
    """
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    if hkv != h:
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits * sm_scale

    mask = jnp.ones((b, sq, skv), dtype=bool)
    if segment_ids is not None:
        if kv_segment_ids is None:
            kv_segment_ids = segment_ids
        same = segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        valid = (segment_ids[:, :, None] > 0) & (kv_segment_ids[:, None, :] > 0)
        allowed = same & valid
        if prompt_len > 0:
            prompt_kv = (jnp.arange(skv)[None, None, :] < prompt_len) & (
                kv_segment_ids[:, None, :] > 0
            )
            allowed = allowed | (prompt_kv & (segment_ids[:, :, None] > 0))
        mask = mask & allowed
    if causal:
        mask = mask & (jnp.arange(sq)[:, None] >= jnp.arange(skv)[None, :])[None]

    logits = jnp.where(mask[:, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    # Fully-masked rows give uniform softmax over NEG_INF; zero them out.
    any_valid = mask.any(axis=-1)[:, None, :, None]
    probs = jnp.where(any_valid, probs, 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------
def _fwd_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
    *, block_k: int, causal: bool, prompt_len: int, sm_scale: float,
):
    """One (batch, head, q-block) program: online softmax over k blocks."""
    block_q = q_ref.shape[2]
    skv = k_ref.shape[2]
    d = q_ref.shape[3]
    n_kb = skv // block_k
    qi = pl.program_id(2)
    q_start = qi * block_q

    q = q_ref[0, 0]  # [bq, d], input dtype (bf16 MXU rate)
    qseg = qseg_ref[0, 0, :]  # [bq]

    # Running max/sum kept 2-D [bq, 1]: Mosaic only supports minor-dim
    # insertion on 32-bit vectors, so 1-D bool intermediates must not appear.
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(ki, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        kseg = kseg_ref[0, 0, pl.ds(ki * block_k, block_k)]

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [bq, bk]

        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        allowed = (qseg[:, None] == kseg[None, :]) & (qseg[:, None] > 0) & (kseg[None, :] > 0)
        if prompt_len > 0:
            allowed = allowed | (
                (k_pos < prompt_len) & (kseg[None, :] > 0) & (qseg[:, None] > 0)
            )
        if causal:
            allowed = allowed & (q_pos >= k_pos)
        s = jnp.where(allowed, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # Avoid exp(NEG_INF - NEG_INF) when a row has seen no valid key yet.
        m_safe = jnp.where(m_new <= NEG_INF * 0.5, 0.0, m_new)
        p = jnp.exp(s - m_safe)
        p = jnp.where(s <= NEG_INF * 0.5, 0.0, p)
        alpha = jnp.exp(jnp.where(m_prev <= NEG_INF * 0.5, NEG_INF, m_prev) - m_safe)
        alpha = jnp.where(m_prev <= NEG_INF * 0.5, 0.0, alpha)

        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    if causal:
        # Only visit k blocks that intersect the causal triangle for this q block.
        last_kb = (q_start + block_q + block_k - 1) // block_k
        n_iter = jnp.minimum(last_kb, n_kb)
    else:
        n_iter = n_kb
    m, l, acc = jax.lax.fori_loop(0, n_iter, body, (m0, l0, acc0))

    safe_l = jnp.where(l > 0, l, 1.0)
    o_ref[0, 0] = (acc / safe_l).astype(o_ref.dtype)
    lse = jnp.where(l > 0, m + jnp.log(safe_l), NEG_INF)  # [bq, 1]
    lse_ref[0, 0, 0, :] = lse[:, 0]



def _fwd_kernel_gqa(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
    *, block_k: int, causal: bool, prompt_len: int, sm_scale: float,
    kv_ratio: int, contiguous_segments: bool = False,
):
    """GQA-folded forward: one program handles ALL query heads of a KV group.

    q_ref block is [1, 1, ratio, bq, d]; folding the ratio dim into the
    matmul M dim turns ``ratio`` narrow [bq, d] GEMMs against the same K/V
    into one [ratio*bq, d] GEMM — higher MXU utilization and 1/ratio the K/V
    traffic. Layout bookkeeping: row r of the folded block is (head r // bq,
    q position q_start + r % bq).
    """
    ratio, block_q = q_ref.shape[2], q_ref.shape[3]
    rows = ratio * block_q
    skv = k_ref.shape[2]
    d = q_ref.shape[4]
    n_kb = skv // block_k
    qi = pl.program_id(2)
    q_start = qi * block_q

    q = q_ref[0, 0].reshape(rows, d)  # keep input dtype: bf16 MXU rate
    qseg = qseg_ref[0, 0, :]                        # [bq] (same for all heads)

    m0 = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, d), jnp.float32)

    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(ki, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        kseg = kseg_ref[0, 0, pl.ds(ki * block_k, block_k)]

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [rows, bk] f32 accumulate from bf16 inputs

        # Mask is head-independent: build it [bq, bk] once, apply on the
        # 3-D view (major-dim broadcast keeps Mosaic layouts legal)
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        allowed = (qseg[:, None] == kseg[None, :]) & (qseg[:, None] > 0) & (kseg[None, :] > 0)
        if prompt_len > 0:
            allowed = allowed | (
                (k_pos < prompt_len) & (kseg[None, :] > 0) & (qseg[:, None] > 0)
            )
        if causal:
            allowed = allowed & (q_pos >= k_pos)
        s3 = s.reshape(ratio, block_q, block_k)
        s3 = jnp.where(allowed[None, :, :], s3, NEG_INF)
        s = s3.reshape(rows, block_k)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        m_safe = jnp.where(m_new <= NEG_INF * 0.5, 0.0, m_new)
        p = jnp.exp(s - m_safe)
        p = jnp.where(s <= NEG_INF * 0.5, 0.0, p)
        alpha = jnp.exp(jnp.where(m_prev <= NEG_INF * 0.5, NEG_INF, m_prev) - m_safe)
        alpha = jnp.where(m_prev <= NEG_INF * 0.5, 0.0, alpha)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    if causal:
        last_kb = (q_start + block_q + block_k - 1) // block_k
        n_iter = jnp.minimum(last_kb, n_kb)
    else:
        n_iter = n_kb
    m, l, acc = jax.lax.fori_loop(0, n_iter, body, (m0, l0, acc0))

    safe_l = jnp.where(l > 0, l, 1.0)
    o_ref[0, 0] = (acc / safe_l).reshape(ratio, block_q, d).astype(o_ref.dtype)
    lse = jnp.where(l > 0, m + jnp.log(safe_l), NEG_INF)  # [rows, 1]
    lse_ref[0, 0, :, 0, :] = lse.reshape(ratio, block_q)



def _fwd_kernel_gqa_fat(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
    *, block_q: int, block_k: int, causal: bool, prompt_len: int,
    sm_scale: float, kv_ratio: int, n_qb: int, n_kb: int,
    contiguous_segments: bool,
):
    """Fat-program forward: ONE program per (batch, kv-head) covers every
    query block of every head in the group, with fully static (unrolled)
    block loops. Measured 37% faster than the per-q-block grid at S=2048
    (5.5 vs 8.6 ms) — per-program fixed costs dominate this kernel, so fewer,
    fatter programs win. Used when the unroll count stays small (moderate S).
    """
    qseg_row = qseg_ref[0, 0, :]
    kseg_row = kseg_ref[0, 0, :]
    for r in range(kv_ratio):
        for qi in range(n_qb):
            q = q_ref[0, 0, r, qi * block_q:(qi + 1) * block_q, :]
            qseg = qseg_row[qi * block_q:(qi + 1) * block_q]
            m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
            l = jnp.zeros((block_q, 1), jnp.float32)
            acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_hi = _causal_k_hi(qi, block_q, block_k, n_kb) if causal else n_kb
            for ki in range(k_hi):
                kb = k_ref[0, 0, ki * block_k:(ki + 1) * block_k, :]
                vb = v_ref[0, 0, ki * block_k:(ki + 1) * block_k, :]
                s = jax.lax.dot_general(
                    q, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale
                interior = causal and contiguous_segments and prompt_len == 0 \
                    and (ki + 1) * block_k <= qi * block_q
                if not interior:
                    kseg = kseg_row[ki * block_k:(ki + 1) * block_k]
                    k_pos = ki * block_k + jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, block_k), 1)
                    allowed = (qseg[:, None] == kseg[None, :]) & \
                        (qseg[:, None] > 0) & (kseg[None, :] > 0)
                    if prompt_len > 0:
                        allowed = allowed | (
                            (k_pos < prompt_len) & (kseg[None, :] > 0) &
                            (qseg[:, None] > 0))
                    if causal:
                        allowed = allowed & (q_pos >= k_pos)
                    s = jnp.where(allowed, s, NEG_INF)
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m, m_cur)
                m_safe = jnp.where(m_new <= NEG_INF * 0.5, 0.0, m_new)
                pmat = jnp.exp(s - m_safe)
                pmat = jnp.where(s <= NEG_INF * 0.5, 0.0, pmat)
                alpha = jnp.exp(jnp.where(m <= NEG_INF * 0.5, NEG_INF, m) - m_safe)
                alpha = jnp.where(m <= NEG_INF * 0.5, 0.0, alpha)
                l = l * alpha + jnp.sum(pmat, axis=-1, keepdims=True)
                acc = acc * alpha + jax.lax.dot_general(
                    pmat.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m = m_new
            safe_l = jnp.where(l > 0, l, 1.0)
            o_ref[0, 0, r, qi * block_q:(qi + 1) * block_q, :] = (
                acc / safe_l).astype(o_ref.dtype)
            lse = jnp.where(l > 0, m + jnp.log(safe_l), NEG_INF)
            lse_ref[0, 0, r, 0, qi * block_q:(qi + 1) * block_q] = lse[:, 0]


def _fa_forward_gqa_fat(q, k, v, qseg, kseg, causal, prompt_len, sm_scale,
                        block_q, block_k, interpret, contiguous_segments):
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    kv_ratio = h // hkv
    qt = q.transpose(0, 2, 1, 3).reshape(b, hkv, kv_ratio, sq, d)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    kernel = functools.partial(
        _fwd_kernel_gqa_fat, block_q=block_q, block_k=block_k, causal=causal,
        prompt_len=prompt_len, sm_scale=sm_scale, kv_ratio=kv_ratio,
        n_qb=sq // block_q, n_kb=skv // block_k,
        contiguous_segments=contiguous_segments,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, kv_ratio, sq, d), lambda bi, hi: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sq), lambda bi, hi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, skv), lambda bi, hi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kv_ratio, sq, d), lambda bi, hi: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, kv_ratio, 1, sq), lambda bi, hi: (bi, hi, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, kv_ratio, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, hkv, kv_ratio, 1, sq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qt, kt, vt, qseg[:, None, :], kseg[:, None, :])
    out = out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    lse = lse.reshape(b, h, 1, sq)
    return out, lse

def _fa_forward_gqa(q, k, v, qseg, kseg, causal, prompt_len, sm_scale,
                    block_q, block_k, interpret, contiguous_segments=False):
    """GQA-folded forward dispatch: grid (B, Hkv, q_blocks)."""
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    kv_ratio = h // hkv

    # [B, S, H, D] -> [B, Hkv, ratio, S, D] (consecutive q heads share a KV head)
    qt = q.transpose(0, 2, 1, 3).reshape(b, hkv, kv_ratio, sq, d)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    grid = (b, hkv, sq // block_q)
    kernel = functools.partial(
        _fwd_kernel_gqa, block_k=block_k, causal=causal,
        prompt_len=prompt_len, sm_scale=sm_scale, kv_ratio=kv_ratio,
        contiguous_segments=contiguous_segments,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, kv_ratio, block_q, d),
                         lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, skv), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kv_ratio, block_q, d),
                         lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
            pl.BlockSpec((1, 1, kv_ratio, 1, block_q),
                         lambda bi, hi, qi: (bi, hi, 0, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, kv_ratio, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, hkv, kv_ratio, 1, sq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qt, kt, vt, qseg[:, None, :], kseg[:, None, :])
    out = out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    lse = lse.reshape(b, h, 1, sq)
    return out, lse

# ---------------------------------------------------------------------------
# Pallas backward kernels
# ---------------------------------------------------------------------------
def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, block_k: int, causal: bool, prompt_len: int, sm_scale: float,
):
    block_q = q_ref.shape[2]
    skv = k_ref.shape[2]
    d = q_ref.shape[3]
    n_kb = skv // block_k
    qi = pl.program_id(2)
    q_start = qi * block_q

    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, 0, :][:, None]      # [bq, 1] f32 (32-bit minor insert)
    delta = delta_ref[0, 0, 0, :][:, None]  # [bq, 1]
    qseg = qseg_ref[0, 0, :]
    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(ki, dq):
        k_blk = k_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        kseg = kseg_ref[0, 0, pl.ds(ki * block_k, block_k)]

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale

        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        allowed = (qseg[:, None] == kseg[None, :]) & (qseg[:, None] > 0) & (kseg[None, :] > 0)
        if prompt_len > 0:
            allowed = allowed | (
                (k_pos < prompt_len) & (kseg[None, :] > 0) & (qseg[:, None] > 0)
            )
        if causal:
            allowed = allowed & (q_pos >= k_pos)

        lse_safe = jnp.where(lse <= NEG_INF * 0.5, 0.0, lse)
        p = jnp.where(allowed, jnp.exp(s - lse_safe), 0.0)
        p = jnp.where(lse <= NEG_INF * 0.5, 0.0, p)

        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if causal:
        last_kb = (q_start + block_q + block_k - 1) // block_k
        n_iter = jnp.minimum(last_kb, n_kb)
    else:
        n_iter = n_kb
    dq = jax.lax.fori_loop(0, n_iter, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    *, block_q: int, causal: bool, prompt_len: int, sm_scale: float,
):
    block_k = k_ref.shape[2]
    sq = q_ref.shape[2]
    d = k_ref.shape[3]
    n_qb = sq // block_q
    ki = pl.program_id(2)
    k_start = ki * block_k

    k_blk = k_ref[0, 0].astype(jnp.float32)
    v_blk = v_ref[0, 0].astype(jnp.float32)
    kseg = kseg_ref[0, 0, :]
    k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def body(qi, carry):
        dk, dv = carry
        q_blk = q_ref[0, 0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        do_blk = do_ref[0, 0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, 0, pl.ds(qi * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, 0, pl.ds(qi * block_q, block_q)][:, None]
        qseg = qseg_ref[0, 0, pl.ds(qi * block_q, block_q)]

        s = jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale

        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        allowed = (qseg[:, None] == kseg[None, :]) & (qseg[:, None] > 0) & (kseg[None, :] > 0)
        if prompt_len > 0:
            allowed = allowed | (
                (k_pos < prompt_len) & (kseg[None, :] > 0) & (qseg[:, None] > 0)
            )
        if causal:
            allowed = allowed & (q_pos >= k_pos)

        lse_safe = jnp.where(lse <= NEG_INF * 0.5, 0.0, lse)
        p = jnp.where(allowed, jnp.exp(s - lse_safe), 0.0)
        p = jnp.where(lse <= NEG_INF * 0.5, 0.0, p)

        dv_new = dv + jax.lax.dot_general(
            p, do_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale
        dk_new = dk + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_new, dv_new

    if causal:
        # Only q blocks at or after this k block can attend to it.
        first_qb = k_start // block_q
        lo = first_qb
    else:
        lo = 0
    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo, n_qb, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)



def _bwd_dq_kernel_gqa(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, block_k: int, causal: bool, prompt_len: int, sm_scale: float,
):
    """GQA-folded dQ: one program covers all query heads of a KV group."""
    ratio, block_q = q_ref.shape[2], q_ref.shape[3]
    rows = ratio * block_q
    skv = k_ref.shape[2]
    d = q_ref.shape[4]
    n_kb = skv // block_k
    qi = pl.program_id(2)
    q_start = qi * block_q

    q = q_ref[0, 0].reshape(rows, d)
    do = do_ref[0, 0].reshape(rows, d)
    # [ratio, bq] statistics; dead rows masked via an f32 0/1 gate (i1 minor
    # inserts and minor-dim-changing reshapes are illegal in Mosaic)
    lse3 = lse_ref[0, 0][:, 0, :]                      # [ratio, bq]
    delta3 = delta_ref[0, 0][:, 0, :]
    lse_safe3 = jnp.where(lse3 <= NEG_INF * 0.5, 0.0, lse3)[:, :, None]
    lse_gate3 = jnp.where(lse3 <= NEG_INF * 0.5, 0.0, 1.0)[:, :, None]
    qseg = qseg_ref[0, 0, :]
    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(ki, dq):
        k_blk = k_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        kseg = kseg_ref[0, 0, pl.ds(ki * block_k, block_k)]

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale

        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        allowed = (qseg[:, None] == kseg[None, :]) & (qseg[:, None] > 0) & (kseg[None, :] > 0)
        if prompt_len > 0:
            allowed = allowed | (
                (k_pos < prompt_len) & (kseg[None, :] > 0) & (qseg[:, None] > 0)
            )
        if causal:
            allowed = allowed & (q_pos >= k_pos)

        s3 = s.reshape(ratio, block_q, block_k)
        p3 = jnp.exp(s3 - lse_safe3) * lse_gate3
        p3 = jnp.where(allowed[None, :, :], p3, 0.0)

        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp3 = dp.reshape(ratio, block_q, block_k)
        ds3 = p3 * (dp3 - delta3[:, :, None]) * sm_scale
        ds = ds3.reshape(rows, block_k).astype(k_blk.dtype)
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if causal:
        last_kb = (q_start + block_q + block_k - 1) // block_k
        n_iter = jnp.minimum(last_kb, n_kb)
    else:
        n_iter = n_kb
    dq = jax.lax.fori_loop(0, n_iter, body, jnp.zeros((rows, d), jnp.float32))
    dq_ref[0, 0] = dq.reshape(ratio, block_q, d).astype(dq_ref.dtype)


def _bwd_dkv_kernel_gqa(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    *, block_q: int, causal: bool, prompt_len: int, sm_scale: float,
):
    """GQA-folded dK/dV: the fold's row-sum IS the GQA head-group reduction,
    so no post-hoc sum over query heads is needed."""
    ratio = q_ref.shape[2]
    block_k = k_ref.shape[2]
    sq = q_ref.shape[3]
    d = k_ref.shape[3]
    rows = ratio * block_q
    n_qb = sq // block_q
    ki = pl.program_id(2)
    k_start = ki * block_k

    k_blk = k_ref[0, 0]
    v_blk = v_ref[0, 0]
    kseg = kseg_ref[0, 0, :]
    k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def body(qi, carry):
        dk, dv = carry
        q_blk = q_ref[0, 0, :, pl.ds(qi * block_q, block_q), :].reshape(rows, d)
        do_blk = do_ref[0, 0, :, pl.ds(qi * block_q, block_q), :].reshape(rows, d)
        lse3 = lse_ref[0, 0, :, :, pl.ds(qi * block_q, block_q)][:, 0, :]
        delta3 = delta_ref[0, 0, :, :, pl.ds(qi * block_q, block_q)][:, 0, :]
        lse_safe3 = jnp.where(lse3 <= NEG_INF * 0.5, 0.0, lse3)[:, :, None]
        lse_gate3 = jnp.where(lse3 <= NEG_INF * 0.5, 0.0, 1.0)[:, :, None]
        qseg = qseg_ref[0, 0, pl.ds(qi * block_q, block_q)]

        s = jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale

        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        allowed = (qseg[:, None] == kseg[None, :]) & (qseg[:, None] > 0) & (kseg[None, :] > 0)
        if prompt_len > 0:
            allowed = allowed | (
                (k_pos < prompt_len) & (kseg[None, :] > 0) & (qseg[:, None] > 0)
            )
        if causal:
            allowed = allowed & (q_pos >= k_pos)

        s3 = s.reshape(ratio, block_q, block_k)
        p3 = jnp.exp(s3 - lse_safe3) * lse_gate3
        p3 = jnp.where(allowed[None, :, :], p3, 0.0)
        p = p3.reshape(rows, block_k)

        pb = p.astype(do_blk.dtype)
        dv_new = dv + jax.lax.dot_general(
            pb, do_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp3 = dp.reshape(ratio, block_q, block_k)
        ds3 = p3 * (dp3 - delta3[:, :, None]) * sm_scale
        ds = ds3.reshape(rows, block_k).astype(q_blk.dtype)
        dk_new = dk + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_new, dv_new

    if causal:
        lo = k_start // block_q
    else:
        lo = 0
    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo, n_qb, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)



def _bwd_kernel_gqa_fat(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    *, block_q: int, block_k: int, causal: bool, prompt_len: int,
    sm_scale: float, kv_ratio: int, n_qb: int, n_kb: int,
):
    """Fused fat-program backward: one program per (batch, kv-head) computes
    dQ, dK and dV together, recomputing each p-block once (the two-kernel
    grid backward recomputes it twice). Measured 10.2 vs 34 ms at S=2048.
    dK/dV accumulate in per-block registers (Mosaic has no scatter); the GQA
    head-group sum falls out of accumulating across the ratio loop."""
    qseg_row = qseg_ref[0, 0, :]
    kseg_row = kseg_ref[0, 0, :]
    dk_blocks = [jnp.zeros((block_k, k_ref.shape[-1]), jnp.float32)
                 for _ in range(n_kb)]
    dv_blocks = [jnp.zeros((block_k, k_ref.shape[-1]), jnp.float32)
                 for _ in range(n_kb)]
    for r in range(kv_ratio):
        for qi in range(n_qb):
            q = q_ref[0, 0, r, qi * block_q:(qi + 1) * block_q, :]
            do = do_ref[0, 0, r, qi * block_q:(qi + 1) * block_q, :]
            lse_b = lse_ref[0, 0, r, 0, qi * block_q:(qi + 1) * block_q][:, None]
            dlt = delta_ref[0, 0, r, 0, qi * block_q:(qi + 1) * block_q][:, None]
            qseg = qseg_row[qi * block_q:(qi + 1) * block_q]
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            dq_acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)
            lse_safe = jnp.where(lse_b <= NEG_INF * 0.5, 0.0, lse_b)
            lse_gate = jnp.where(lse_b <= NEG_INF * 0.5, 0.0, 1.0)
            k_hi = _causal_k_hi(qi, block_q, block_k, n_kb) if causal else n_kb
            for ki in range(k_hi):
                kb = k_ref[0, 0, ki * block_k:(ki + 1) * block_k, :]
                vb = v_ref[0, 0, ki * block_k:(ki + 1) * block_k, :]
                s = jax.lax.dot_general(
                    q, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale
                kseg = kseg_row[ki * block_k:(ki + 1) * block_k]
                k_pos = ki * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                allowed = (qseg[:, None] == kseg[None, :]) & \
                    (qseg[:, None] > 0) & (kseg[None, :] > 0)
                if prompt_len > 0:
                    allowed = allowed | (
                        (k_pos < prompt_len) & (kseg[None, :] > 0) &
                        (qseg[:, None] > 0))
                if causal:
                    allowed = allowed & (q_pos >= k_pos)
                p = jnp.exp(s - lse_safe) * lse_gate
                p = jnp.where(allowed, p, 0.0)
                pb = p.astype(do.dtype)
                dv_blocks[ki] = dv_blocks[ki] + jax.lax.dot_general(
                    pb, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(
                    do, vb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = (p * (dp - dlt) * sm_scale).astype(q.dtype)
                dq_acc = dq_acc + jax.lax.dot_general(
                    ds, kb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dk_blocks[ki] = dk_blocks[ki] + jax.lax.dot_general(
                    ds, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dq_ref[0, 0, r, qi * block_q:(qi + 1) * block_q, :] = \
                dq_acc.astype(dq_ref.dtype)
    for ki in range(n_kb):
        dk_ref[0, 0, ki * block_k:(ki + 1) * block_k, :] = \
            dk_blocks[ki].astype(dk_ref.dtype)
        dv_ref[0, 0, ki * block_k:(ki + 1) * block_k, :] = \
            dv_blocks[ki].astype(dv_ref.dtype)


def _fa_bwd_gqa_fat(q, k, v, qseg, kseg, out, lse, do, causal, prompt_len,
                    sm_scale, block_q, block_k, interpret):
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    kv_ratio = h // hkv
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1).reshape(b, hkv, kv_ratio, 1, sq)
    lse_f = lse.reshape(b, hkv, kv_ratio, 1, sq)
    qt = q.transpose(0, 2, 1, 3).reshape(b, hkv, kv_ratio, sq, d)
    dot = do.transpose(0, 2, 1, 3).reshape(b, hkv, kv_ratio, sq, d)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    kernel = functools.partial(
        _bwd_kernel_gqa_fat, block_q=block_q, block_k=block_k, causal=causal,
        prompt_len=prompt_len, sm_scale=sm_scale, kv_ratio=kv_ratio,
        n_qb=sq // block_q, n_kb=skv // block_k,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, kv_ratio, sq, d), lambda bi, hi: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sq), lambda bi, hi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, skv), lambda bi, hi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, kv_ratio, sq, d), lambda bi, hi: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, kv_ratio, 1, sq), lambda bi, hi: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, kv_ratio, 1, sq), lambda bi, hi: (bi, hi, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kv_ratio, sq, d), lambda bi, hi: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi: (bi, hi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, kv_ratio, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(qt, kt, vt, qseg[:, None, :], kseg[:, None, :], dot, lse_f, delta)
    dq = dq.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return (
        dq,
        dk.transpose(0, 2, 1, 3).astype(k.dtype),
        dv.transpose(0, 2, 1, 3).astype(v.dtype),
        None,
        None,
    )


def _fa_bwd_gqa(q, k, v, qseg, kseg, out, lse, do, causal, prompt_len,
                sm_scale, block_q, block_k, interpret):
    """GQA-folded backward dispatch."""
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    kv_ratio = h // hkv

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1).reshape(b, hkv, kv_ratio, 1, sq)
    lse_f = lse.reshape(b, hkv, kv_ratio, 1, sq)
    qt = q.transpose(0, 2, 1, 3).reshape(b, hkv, kv_ratio, sq, d)
    dot = do.transpose(0, 2, 1, 3).reshape(b, hkv, kv_ratio, sq, d)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    qseg3 = qseg[:, None, :]
    kseg3 = kseg[:, None, :]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel"),
        vmem_limit_bytes=96 * 1024 * 1024)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_gqa, block_k=block_k, causal=causal,
                          prompt_len=prompt_len, sm_scale=sm_scale),
        grid=(b, hkv, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, kv_ratio, block_q, d), lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, skv), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, kv_ratio, block_q, d), lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
            pl.BlockSpec((1, 1, kv_ratio, 1, block_q), lambda bi, hi, qi: (bi, hi, 0, 0, qi)),
            pl.BlockSpec((1, 1, kv_ratio, 1, block_q), lambda bi, hi, qi: (bi, hi, 0, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, 1, kv_ratio, block_q, d),
                               lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, kv_ratio, sq, d), q.dtype),
        compiler_params=params,
        interpret=interpret,
    )(qt, kt, vt, qseg3, kseg3, dot, lse_f, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_gqa, block_q=block_q, causal=causal,
                          prompt_len=prompt_len, sm_scale=sm_scale),
        grid=(b, hkv, skv // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, kv_ratio, sq, d), lambda bi, hi, ki: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, sq), lambda bi, hi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, ki: (bi, 0, ki)),
            pl.BlockSpec((1, 1, kv_ratio, sq, d), lambda bi, hi, ki: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, kv_ratio, 1, sq), lambda bi, hi, ki: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, kv_ratio, 1, sq), lambda bi, hi, ki: (bi, hi, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(qt, kt, vt, qseg3, kseg3, dot, lse_f, delta)

    dq = dq.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return (
        dq,
        dk.transpose(0, 2, 1, 3).astype(k.dtype),
        dv.transpose(0, 2, 1, 3).astype(v.dtype),
        None,
        None,
    )


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------
def _pad_to(x, target, axis):
    if x.shape[axis] == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, pad)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11)
)
def _flash_attention_padded(
    q, k, v, qseg, kseg, causal, prompt_len, sm_scale, block_q, block_k,
    interpret, contiguous_segments=False,
):
    out, _ = _fa_forward(
        q, k, v, qseg, kseg, causal, prompt_len, sm_scale, block_q, block_k,
        interpret, contiguous_segments,
    )
    return out


def _fa_forward(q, k, v, qseg, kseg, causal, prompt_len, sm_scale, block_q,
                block_k, interpret, contiguous_segments=False):
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    kv_ratio = h // hkv
    # Fat-program path: fastest when the static unroll stays small
    if _use_fat_path(sq, skv, kv_ratio, block_q, block_k, causal):
        return _fa_forward_gqa_fat(q, k, v, qseg, kseg, causal, prompt_len,
                                   sm_scale, block_q, block_k, interpret,
                                   contiguous_segments)
    if kv_ratio > 1:
        return _fa_forward_gqa(q, k, v, qseg, kseg, causal, prompt_len,
                               sm_scale, block_q, block_k, interpret,
                               contiguous_segments)

    # [B, S, H, D] -> [B, H, S, D] for per-(b,h) blocking
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    grid = (b, h, sq // block_q)
    kernel = functools.partial(
        _fwd_kernel, block_k=block_k, causal=causal,
        prompt_len=prompt_len, sm_scale=sm_scale,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi, qi: (bi, hi // kv_ratio, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi, qi: (bi, hi // kv_ratio, 0, 0)),
            # Segment ids carried as [B, 1, S] so block dims satisfy the
            # TPU tiling rule (second-to-last block dim == array dim 1).
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, skv), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda bi, hi, qi: (bi, hi, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, sq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(
        qt.reshape(b, h, sq // block_q * block_q, d)[:, :, :, :],
        kt, vt, qseg[:, None, :], kseg[:, None, :],
    )
    return out.transpose(0, 2, 1, 3), lse


def _fa_fwd_rule(q, k, v, qseg, kseg, causal, prompt_len, sm_scale, block_q,
                 block_k, interpret, contiguous_segments=False):
    out, lse = _fa_forward(
        q, k, v, qseg, kseg, causal, prompt_len, sm_scale, block_q, block_k,
        interpret, contiguous_segments,
    )
    return out, (q, k, v, qseg, kseg, out, lse)


def _fa_bwd_rule(causal, prompt_len, sm_scale, block_q, block_k, interpret,
                 contiguous_segments, res, do):
    q, k, v, qseg, kseg, out, lse = res
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    kv_ratio = h // hkv
    # Mirror the forward's fat-path dispatch: the fused one-pass dQ/dK/dV
    # kernel recomputes each p-block once (two-kernel path does it twice);
    # measured 10.2 vs 34 ms at S=2048.
    if _use_fat_path(sq, skv, kv_ratio, block_q, block_k, causal):
        return _fa_bwd_gqa_fat(q, k, v, qseg, kseg, out, lse, do, causal,
                               prompt_len, sm_scale, block_q, block_k,
                               interpret)
    if kv_ratio > 1:
        return _fa_bwd_gqa(q, k, v, qseg, kseg, out, lse, do, causal,
                           prompt_len, sm_scale, block_q, block_k, interpret)

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)[:, :, None, :]  # [B, H, 1, Sq]

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = do.transpose(0, 2, 1, 3)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, block_k=block_k, causal=causal,
        prompt_len=prompt_len, sm_scale=sm_scale,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi, qi: (bi, hi // kv_ratio, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi, qi: (bi, hi // kv_ratio, 0, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, skv), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda bi, hi, qi: (bi, hi, 0, qi)),
            pl.BlockSpec((1, 1, 1, block_q), lambda bi, hi, qi: (bi, hi, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(qt, kt, vt, qseg[:, None, :], kseg[:, None, :], dot, lse, delta)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, block_q=block_q, causal=causal,
        prompt_len=prompt_len, sm_scale=sm_scale,
    )
    # dK/dV computed per query-head then summed over the GQA group below.
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, skv // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, sq, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi // kv_ratio, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi // kv_ratio, ki, 0)),
            pl.BlockSpec((1, 1, sq), lambda bi, hi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, ki: (bi, 0, ki)),
            pl.BlockSpec((1, 1, sq, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, sq), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, sq), lambda bi, hi, ki: (bi, hi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, skv, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, skv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(qt, kt, vt, qseg[:, None, :], kseg[:, None, :], dot, lse, delta)

    # Sum over the query heads sharing each KV head (GQA)
    dk = dk.reshape(b, hkv, kv_ratio, skv, d).sum(axis=2)
    dv = dv.reshape(b, hkv, kv_ratio, skv, d).sum(axis=2)

    return (
        dq.transpose(0, 2, 1, 3),
        dk.transpose(0, 2, 1, 3).astype(k.dtype),
        dv.transpose(0, 2, 1, 3).astype(v.dtype),
        None,
        None,
    )


_flash_attention_padded.defvjp(_fa_fwd_rule, _fa_bwd_rule)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    prompt_len: int = 0,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
    contiguous_segments: bool = False,
) -> jnp.ndarray:
    """Flash attention entry point. Shapes: q [B,Sq,H,D], k/v [B,Skv,Hkv,D].

    Default blocks 512x512: measured 27% faster than 128x128 on v5e at
    S=2048; clamped down for short sequences so padding never exceeds one
    block. ``contiguous_segments=True`` promises each row is
    [one valid segment..., padding...] (plain right-padded batches, NOT
    packed), letting causal interior k-blocks skip all masking work.

    ``segment_ids`` [B, Sq] int (0 = padding); ``kv_segment_ids`` defaults to
    ``segment_ids`` (self-attention). ``prompt_len`` > 0 marks a shared prefix
    visible to all segments (the non-contextual query pattern). Sequence and
    head dims are padded to block/lane multiples internally.
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if segment_ids is None:
        segment_ids = jnp.ones((b, sq), jnp.int32)
        if kv_segment_ids is None:
            kv_segment_ids = jnp.ones((b, skv), jnp.int32)
    elif kv_segment_ids is None:
        kv_segment_ids = segment_ids
    segment_ids = segment_ids.astype(jnp.int32)
    kv_segment_ids = kv_segment_ids.astype(jnp.int32)

    # Clamp blocks for short sequences (padding never exceeds one block),
    # then pad sequence dims to block multiples (padding gets segment id 0)
    # and head_dim to the 128-lane multiple (zero pad is exact for dots).
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_p = _round_up(max(sq, block_q), block_q)
    skv_p = _round_up(max(skv, block_k), block_k)
    # Keep head_dim unpadded when it's already sublane-aligned (block dim ==
    # array dim satisfies the tiling rule; padding 64->128 doubles DMA traffic)
    d_p = d if d % 8 == 0 else _round_up(d, 128)

    qp = _pad_to(_pad_to(q, sq_p, 1), d_p, 3)
    kp = _pad_to(_pad_to(k, skv_p, 1), d_p, 3)
    vp = _pad_to(_pad_to(v, skv_p, 1), d_p, 3)
    qsegp = _pad_to(segment_ids, sq_p, 1)
    ksegp = _pad_to(kv_segment_ids, skv_p, 1)

    out = _flash_attention_padded(
        qp, kp, vp, qsegp, ksegp, causal, prompt_len, sm_scale, block_q,
        block_k, interpret, contiguous_segments
    )
    return out[:, :sq, :, :d]


def make_packed_segment_ids(lengths, total_len: int):
    """Segment ids for sequences packed back-to-back (1-indexed; 0 = padding).

    TPU replacement for the reference's cu_seqlens varlen path
    (utils/nested_input.py:114-166): concatenation + segment ids instead of
    dynamic-shape unpadding.
    """
    import numpy as np

    seg = np.zeros(total_len, np.int32)
    pos = 0
    for i, L in enumerate(lengths, start=1):
        seg[pos:pos + L] = i
        pos += L
    return seg


def make_nonctx_segment_ids(prompt_len: int, n_tokens: int, tokens_per_block: int, total_len: int):
    """Segment ids for the non-contextual query layout
    ``[prompt][tok eos][tok eos]...`` (reference: nonctx_emb_utils.py:27-82).

    The prompt occupies segment 1 over ``prompt_len`` positions; each
    ``[tok eos]`` micro-block gets its own segment. Use together with
    ``prompt_len=prompt_len`` so every block still sees the prompt.
    """
    import numpy as np

    seg = np.zeros(total_len, np.int32)
    seg[:prompt_len] = 1
    pos = prompt_len
    for i in range(n_tokens):
        seg[pos:pos + tokens_per_block] = i + 2
        pos += tokens_per_block
    return seg
