"""Memory-efficient max aggregation of vocab projections (SPLADE-style).

Computes ``out[b, v] = max_s mask[b,s] ? (hidden[b,s,:] @ W[:,v] + bias[v]) : -inf``
without materializing the [B, S, V] logits tensor. This is the TPU-native
redesign of the reference's custom autograd op
(reference: src/lightretriever/utils/max_linear_map.py:8-172), which streams
one timestep at a time on GPU. On TPU that shape of streaming starves the MXU,
so instead we tile over the *vocab* dimension:

* forward: grid (B, V/Vt); each program computes an [S, Vt] logits tile with
  one MXU matmul, masks, and reduces max over S — saving only the argmax
  indices [B, V] (same residual the reference saves).
* backward: gradients are routed through the argmax as one-hot matmuls
  (P[s, v] = g[b, v] * 1[s == argmax[b, v]]):
    dH[b] = P @ W_tile^T      (accumulated over vocab tiles)
    dW    = H[b]^T @ P        (accumulated over batch)
    db[v] = sum_b g[b, v]
  — both accumulations are MXU matmuls, no scatter/gather kernels.

A pure-jnp oracle (`max_linear_map_reference`) mirrors the reference's naive
``max(h @ W + b)`` path used in its own self-test (max_linear_map.py:389-435).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def max_linear_map_reference(
    hidden: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Naive oracle: materializes [B, S, V] (tests only)."""
    logits = jnp.einsum("bsh,hv->bsv", hidden.astype(jnp.float32), weight.astype(jnp.float32))
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    logits = jnp.where(mask[..., None].astype(bool), logits, NEG_INF)
    return jnp.max(logits, axis=1)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------
def _mlm_fwd_kernel(h_ref, w_ref, b_ref, mask_ref, out_ref, argmax_ref):
    """One (batch, vocab-tile) program: [S, Vt] logits tile -> max/argmax.

    Batch-indexed refs carry a singleton middle dim ([B, 1, ...]) so block
    shapes satisfy the TPU tiling rule; bool masks are built 2-D directly
    (Mosaic rejects minor-dim insertion on 1-D i1 vectors).
    """
    h = h_ref[0].astype(jnp.float32)          # [S, H]
    w = w_ref[...].astype(jnp.float32)        # [H, Vt]
    logits = jax.lax.dot_general(
        h, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # [S, Vt]
    logits = logits + b_ref[0, :][None, :].astype(jnp.float32)
    mask2 = mask_ref[0, 0, :][:, None]         # [S, 1] i32
    logits = jnp.where(mask2 > 0, logits, NEG_INF)
    out_ref[0, 0, :] = jnp.max(logits, axis=0)
    argmax_ref[0, 0, :] = jnp.argmax(logits, axis=0).astype(jnp.int32)


def _mlm_bwd_dh_kernel(g_ref, amax_ref, w_ref, rowvalid_ref, dh_ref):
    """Grid (B, V/Vt), vocab innermost: dH[b] += P @ W_tile^T."""
    vi = pl.program_id(1)
    s = dh_ref.shape[1]
    vt = g_ref.shape[1]

    g = g_ref[0, 0, :].astype(jnp.float32)     # [Vt]
    amax = amax_ref[0, 0, :]                   # [Vt]
    valid = rowvalid_ref[0, 0, 0] > 0
    g = jnp.where(valid, g, 0.0)

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (s, vt), 0)
    p = jnp.where(s_iota == amax[None, :], g[None, :], 0.0)  # [S, Vt]
    contrib = jax.lax.dot_general(
        p, w_ref[...].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # [S, H]

    @pl.when(vi == 0)
    def _():
        dh_ref[0] = contrib.astype(dh_ref.dtype)

    @pl.when(vi != 0)
    def _():
        dh_ref[0] = (dh_ref[0].astype(jnp.float32) + contrib).astype(dh_ref.dtype)


def _mlm_bwd_dw_kernel(g_ref, amax_ref, h_ref, rowvalid_ref, dw_ref, db_ref):
    """Grid (V/Vt, B), batch innermost: dW_tile += H[b]^T @ P; db += g."""
    bi = pl.program_id(1)
    s = h_ref.shape[1]
    vt = g_ref.shape[1]

    g = g_ref[0, 0, :].astype(jnp.float32)
    amax = amax_ref[0, 0, :]
    valid = rowvalid_ref[0, 0, 0] > 0
    g = jnp.where(valid, g, 0.0)

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (s, vt), 0)
    p = jnp.where(s_iota == amax[None, :], g[None, :], 0.0)  # [S, Vt]
    h = h_ref[0].astype(jnp.float32)                          # [S, H]
    contrib = jax.lax.dot_general(
        h, p, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                          # [H, Vt]

    @pl.when(bi == 0)
    def _():
        dw_ref[...] = contrib
        db_ref[0, :] = jnp.sum(p, axis=0)

    @pl.when(bi != 0)
    def _():
        dw_ref[...] = dw_ref[...] + contrib
        db_ref[0, :] = db_ref[0, :] + jnp.sum(p, axis=0)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------
def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_axis(x, target, axis, value=0.0):
    if x.shape[axis] == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _max_linear_map_padded(hidden, weight, bias, mask, vocab_tile, interpret):
    out, _ = _mlm_forward(hidden, weight, bias, mask, vocab_tile, interpret)
    return out


def _mlm_forward(hidden, weight, bias, mask, vocab_tile, interpret):
    b, s, h = hidden.shape
    v = weight.shape[1]
    grid = (b, v // vocab_tile)
    out, argmax = pl.pallas_call(
        _mlm_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s, h), lambda bi, vi: (bi, 0, 0)),
            pl.BlockSpec((h, vocab_tile), lambda bi, vi: (0, vi)),
            pl.BlockSpec((1, vocab_tile), lambda bi, vi: (0, vi)),
            pl.BlockSpec((1, 1, s), lambda bi, vi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, vocab_tile), lambda bi, vi: (bi, 0, vi)),
            pl.BlockSpec((1, 1, vocab_tile), lambda bi, vi: (bi, 0, vi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, v), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, v), jnp.int32),
        ],
        interpret=interpret,
    )(hidden, weight, bias, mask[:, None, :])
    return out[:, 0, :], argmax[:, 0, :]


def _mlm_fwd_rule(hidden, weight, bias, mask, vocab_tile, interpret):
    out, argmax = _mlm_forward(hidden, weight, bias, mask, vocab_tile, interpret)
    row_valid = (mask > 0).any(axis=1).astype(jnp.int32)[:, None]  # [B, 1]
    return out, (hidden, weight, argmax, row_valid)


def _mlm_bwd_rule(vocab_tile, interpret, res, g):
    hidden, weight, argmax, row_valid = res
    b, s, h = hidden.shape
    v = weight.shape[1]
    g = g.astype(jnp.float32)

    g3 = g[:, None, :]
    amax3 = argmax[:, None, :]
    rv3 = row_valid[:, :, None]  # [B, 1, 1]
    dh = pl.pallas_call(
        _mlm_bwd_dh_kernel,
        grid=(b, v // vocab_tile),
        in_specs=[
            pl.BlockSpec((1, 1, vocab_tile), lambda bi, vi: (bi, 0, vi)),
            pl.BlockSpec((1, 1, vocab_tile), lambda bi, vi: (bi, 0, vi)),
            pl.BlockSpec((h, vocab_tile), lambda bi, vi: (0, vi)),
            pl.BlockSpec((1, 1, 1), lambda bi, vi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, h), lambda bi, vi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, h), hidden.dtype),
        interpret=interpret,
    )(g3, amax3, weight, rv3)

    dw, db = pl.pallas_call(
        _mlm_bwd_dw_kernel,
        grid=(v // vocab_tile, b),
        in_specs=[
            pl.BlockSpec((1, 1, vocab_tile), lambda vi, bi: (bi, 0, vi)),
            pl.BlockSpec((1, 1, vocab_tile), lambda vi, bi: (bi, 0, vi)),
            pl.BlockSpec((1, s, h), lambda vi, bi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda vi, bi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((h, vocab_tile), lambda vi, bi: (0, vi)),
            pl.BlockSpec((1, vocab_tile), lambda vi, bi: (0, vi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, v), jnp.float32),
            jax.ShapeDtypeStruct((1, v), jnp.float32),
        ],
        interpret=interpret,
    )(g3, amax3, hidden, rv3)

    return (
        dh,
        dw.astype(weight.dtype),
        db.astype(weight.dtype),
        None,
    )


_max_linear_map_padded.defvjp(_mlm_fwd_rule, _mlm_bwd_rule)


def _max_linear_map_xla(hidden, weight, bias, mask):
    """Differentiable one-GEMM path for small logits footprints.

    At modest S*V (e.g. a 16-32k vocab) one [B,S,V] einsum on the MXU beats
    the vocab-tiled kernel's many small matmuls by ~5x; ``jax.checkpoint``
    keeps the logits out of the residual set (recomputed in backward), so
    peak memory is one transient logits buffer either way."""

    @jax.checkpoint
    def f(h, w, b2):
        logits = jax.lax.dot_general(
            h, w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        logits = logits + b2[None, :, :]
        logits = jnp.where(mask[..., None].astype(bool), logits, NEG_INF)
        return jnp.max(logits, axis=1)

    return f(hidden, weight, bias)


# Auto-dispatch to the XLA path when fp32 logits fit comfortably (bytes).
# Budget the *backward* transient, not just the forward buffer: under
# jax.checkpoint the bwd pass holds the recomputed [B,S,V] fp32 logits AND
# their cotangent simultaneously (~2x the buffer) alongside params/grads/
# optimizer state, so the default is 512MB (~1GB peak transient) rather
# than the naive 2GB. Override with LRT_XLA_LOGITS_BYTES_LIMIT or pass
# impl= explicitly. Note a gradient-semantics difference between paths:
# the XLA reduce_max splits the gradient evenly among tied maxima, while
# the Pallas kernel routes it to a single argmax winner (the reference's
# utils/max_linear_map.py:92-172 argmax semantics); forward values match.
XLA_LOGITS_BYTES_LIMIT = int(os.environ.get(
    "LRT_XLA_LOGITS_BYTES_LIMIT", 512 * 1024**2))


def max_linear_mapping(
    hidden: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    vocab_tile: int = 512,
    interpret: Optional[bool] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Public entry: ``max_s((hidden @ weight + bias).masked)`` -> [B, V].

    Args:
      hidden: [B, S, H]. weight: [H, V]. bias: [V] or None.
      mask: [B, S]; nonzero = valid. None = all valid.
      vocab_tile: vocab tile width per program (multiple of 128).
      impl: 'pallas' | 'xla' | None (auto: XLA one-GEMM path when the fp32
        logits buffer is under XLA_LOGITS_BYTES_LIMIT (env
        LRT_XLA_LOGITS_BYTES_LIMIT), else the vocab-tiled Pallas kernel
        that never materializes [B, S, V]). Tie gradients differ between
        the two: XLA reduce_max splits the grad among tied maxima; the
        Pallas kernel routes it all to one argmax winner.
    Rows with no valid position return -1e30 everywhere and receive no
    gradient — matching the reference's masked_fill(min) semantics
    (utils/max_linear_map.py:44-63).
    """
    b, s, h = hidden.shape
    v = weight.shape[1]
    if impl is None:
        impl = "xla" if b * s * v * 4 <= XLA_LOGITS_BYTES_LIMIT else "pallas"
    if impl == "xla":
        if mask is None:
            mask = jnp.ones((b, s), jnp.int32)
        bias2d = jnp.zeros((1, v), jnp.float32) if bias is None \
            else bias.reshape(1, v).astype(jnp.float32)
        if bias is None:
            bias2d = jax.lax.stop_gradient(bias2d)
        return _max_linear_map_xla(hidden, weight, bias2d, mask)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mask is None:
        mask = jnp.ones((b, s), jnp.int32)
    mask = mask.astype(jnp.int32)
    if bias is None:
        bias2d = jnp.zeros((1, v), jnp.float32)
        has_bias = False
    else:
        bias2d = bias.reshape(1, v).astype(jnp.float32)
        has_bias = True

    v_p = _round_up(v, vocab_tile)
    w_p = _pad_axis(weight, v_p, 1)
    b_p = _pad_axis(bias2d, v_p, 1)

    if not has_bias:
        # Avoid tracking a grad for a synthetic bias
        out = _max_linear_map_padded(
            hidden, w_p, jax.lax.stop_gradient(b_p), mask, vocab_tile, interpret
        )
    else:
        out = _max_linear_map_padded(hidden, w_p, b_p, mask, vocab_tile, interpret)
    return out[:, :v]
