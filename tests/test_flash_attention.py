"""Flash-attention kernel parity tests (Pallas interpret mode vs jnp reference).

Modeled on the reference's kernel test harness style
(utils/max_linear_map.py:389-435): forward + backward parity with per-dtype
tolerances, over causal/bidirectional/segment/GQA/prompt variants.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightretriever_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention,
    make_packed_segment_ids,
    make_nonctx_segment_ids,
)


def rand_qkv(rng, b=2, sq=64, skv=64, h=4, hkv=4, d=32, dtype=np.float32):
    q = rng.standard_normal((b, sq, h, d)).astype(dtype)
    k = rng.standard_normal((b, skv, hkv, d)).astype(dtype)
    v = rng.standard_normal((b, skv, hkv, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [False, True])
def test_forward_parity_dense(rng, causal):
    q, k, v = rand_qkv(rng)
    got = flash_attention(q, k, v, causal=causal, interpret=True, block_q=32, block_k=32)
    want = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_forward_parity_padding(rng):
    q, k, v = rand_qkv(rng, b=3, sq=48, skv=48)
    seg = np.ones((3, 48), np.int32)
    seg[0, 30:] = 0
    seg[1, 10:] = 0
    got = flash_attention(q, k, v, segment_ids=jnp.asarray(seg), interpret=True, block_q=16, block_k=16)
    want = attention_reference(q, k, v, segment_ids=jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
    # Padded query rows must be exactly zero
    assert np.abs(np.asarray(got)[0, 30:]).max() == 0.0


def test_forward_parity_packed_segments(rng):
    q, k, v = rand_qkv(rng, b=1, sq=64, skv=64)
    seg = make_packed_segment_ids([20, 30, 10], 64)[None, :]
    got = flash_attention(q, k, v, segment_ids=jnp.asarray(seg), causal=True, interpret=True, block_q=16, block_k=16)
    want = attention_reference(q, k, v, segment_ids=jnp.asarray(seg), causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
    # Packed isolation: prefix of segment 2 (positions 20..) must equal the
    # same tokens run alone as their own sequence
    alone = attention_reference(q[:, 20:50], k[:, 20:50], v[:, 20:50], causal=True)
    np.testing.assert_allclose(np.asarray(got)[:, 20:50], np.asarray(alone), atol=2e-4, rtol=2e-4)


def test_forward_parity_gqa(rng):
    q, k, v = rand_qkv(rng, h=8, hkv=2)
    got = flash_attention(q, k, v, causal=True, interpret=True, block_q=32, block_k=32)
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_forward_nonctx_prompt_visibility(rng):
    """The blocked non-contextual mask: every [tok eos] micro-segment sees the
    shared prompt but not other micro-segments."""
    b, s, h, d = 1, 32, 2, 16
    q, k, v = rand_qkv(rng, b=b, sq=s, skv=s, h=h, hkv=h, d=d)
    prompt_len = 4
    seg = make_nonctx_segment_ids(prompt_len, n_tokens=14, tokens_per_block=2, total_len=s)[None, :]
    got = flash_attention(
        q, k, v, segment_ids=jnp.asarray(seg), causal=True, prompt_len=prompt_len,
        interpret=True, block_q=16, block_k=16,
    )
    want = attention_reference(
        q, k, v, segment_ids=jnp.asarray(seg), causal=True, prompt_len=prompt_len
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
    # Cross-check isolation: output at micro-block i equals running
    # [prompt + that block] alone.
    blk = slice(prompt_len + 4, prompt_len + 6)  # third micro-block
    ids = list(range(prompt_len)) + list(range(blk.start, blk.stop))
    qa = q[:, ids]; ka = k[:, ids]; va = v[:, ids]
    alone = attention_reference(qa, ka, va, causal=True)
    np.testing.assert_allclose(np.asarray(got)[:, blk], np.asarray(alone)[:, prompt_len:], atol=2e-4, rtol=2e-4)


def test_forward_unaligned_shapes(rng):
    # seq/head dims not multiples of the block/lane sizes
    q, k, v = rand_qkv(rng, b=2, sq=37, skv=53, h=3, hkv=3, d=24)
    seg = np.ones((2, 37), np.int32)
    kseg = np.ones((2, 53), np.int32)
    kseg[1, 40:] = 0
    got = flash_attention(q, k, v, segment_ids=jnp.asarray(seg), kv_segment_ids=jnp.asarray(kseg), interpret=True)
    want = attention_reference(q, k, v, segment_ids=jnp.asarray(seg), kv_segment_ids=jnp.asarray(kseg))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_backward_parity(rng, causal):
    q, k, v = rand_qkv(rng, b=2, sq=32, skv=32, h=2, hkv=2, d=16)
    seg = np.ones((2, 32), np.int32)
    seg[1, 24:] = 0
    seg_j = jnp.asarray(seg)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, segment_ids=seg_j, causal=causal, interpret=True, block_q=16, block_k=16)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, segment_ids=seg_j, causal=causal)
        return jnp.sum(o * jnp.cos(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-5, rtol=5e-4, err_msg=name)


def test_backward_parity_gqa(rng):
    q, k, v = rand_qkv(rng, b=1, sq=32, skv=32, h=4, hkv=2, d=16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, interpret=True, block_q=16, block_k=16) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=True) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-5, rtol=5e-4, err_msg=name)


def test_bf16_forward_tolerance(rng):
    q, k, v = rand_qkv(rng, d=32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = flash_attention(qb, kb, vb, causal=True, interpret=True, block_q=32, block_k=32)
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want), atol=3e-2, rtol=3e-2
    )


# ---------------------------------------------------------------------------
# Round-2 regression tests (ADVICE r1 findings)
# ---------------------------------------------------------------------------
def test_fat_causal_unequal_blocks(rng):
    """ADVICE r1 #1: fat causal kernels with block_q > block_k skipped
    near-diagonal kv blocks (old k_hi = qi*bq//bk + 1). Exercise the fat path
    with block_q=32 / block_k=16 and check fwd+bwd parity."""
    from lightretriever_tpu.ops.flash_attention import _use_fat_path

    q, k, v = rand_qkv(rng, b=1, sq=64, skv=64, h=2, hkv=2, d=32)
    assert _use_fat_path(64, 64, 1, 32, 16, True)

    got = flash_attention(q, k, v, causal=True, interpret=True, block_q=32, block_k=16)
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, interpret=True, block_q=32, block_k=16)
        return jnp.sum(o * jnp.sin(o))

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, causal=True)
        return jnp.sum(o * jnp.sin(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-5, rtol=5e-4, err_msg=name)


def test_fat_backward_dispatched(rng, monkeypatch):
    """ADVICE r1 #3: the fused fat backward must actually be dispatched when
    the forward takes the fat path (it previously never ran)."""
    import lightretriever_tpu.ops.flash_attention as fa

    calls = []
    orig = fa._fa_bwd_gqa_fat

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "_fa_bwd_gqa_fat", spy)

    q, k, v = rand_qkv(rng, b=1, sq=64, skv=64, h=4, hkv=2, d=32)
    seg = np.ones((1, 64), np.int32)
    seg[0, 50:] = 0
    seg_j = jnp.asarray(seg)

    def loss_flash(q, k, v):
        o = fa.flash_attention(q, k, v, segment_ids=seg_j, causal=True,
                               interpret=True, block_q=32, block_k=32)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, segment_ids=seg_j, causal=True)
        return jnp.sum(o ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    assert calls, "fat backward was not dispatched"
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-5, rtol=5e-4, err_msg=name)


def test_contiguous_segments_right_padded(rng):
    """ADVICE r1 #2 (kernel half): with contiguous_segments=True and a
    right-padded batch, valid rows must still be exact across multiple blocks
    (interior-block skip engaged), forward and backward."""
    q, k, v = rand_qkv(rng, b=2, sq=64, skv=64, h=2, hkv=2, d=32)
    seg = np.ones((2, 64), np.int32)
    seg[0, 40:] = 0
    seg_j = jnp.asarray(seg)
    valid = seg.astype(bool)

    got = flash_attention(q, k, v, segment_ids=seg_j, causal=True, interpret=True,
                          block_q=16, block_k=16, contiguous_segments=True)
    want = attention_reference(q, k, v, segment_ids=seg_j, causal=True)
    np.testing.assert_allclose(np.asarray(got)[valid], np.asarray(want)[valid],
                               atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, segment_ids=seg_j, causal=True, interpret=True,
                            block_q=16, block_k=16, contiguous_segments=True)
        # only valid rows contribute (padding rows are garbage under the skip,
        # by contract they are masked downstream)
        return jnp.sum((o * seg_j[:, :, None, None]) ** 2)

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, segment_ids=seg_j, causal=True)
        return jnp.sum((o * seg_j[:, :, None, None]) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-5, rtol=5e-4, err_msg=name)
