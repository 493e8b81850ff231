"""On-TPU kernel test lane (VERDICT r1 item 7).

Runs every Pallas kernel ON THE REAL CHIP against its jnp reference and
asserts tolerance. Mosaic lowering rules (tiling, DMA shapes, layout ops) are
invisible to interpret mode, so CI's CPU tests cannot catch an on-chip
regression — this one command can. Prints one JSON line:

    {"lane": "tpu_check", "ok": true, "checks": N, "failures": []}

Usage: python tpu_check.py          (real TPU; exits nonzero on failure)
       python tpu_check.py --cpu    (interpret-mode dry run of the harness)
"""
from __future__ import annotations

import json
import sys

if "--cpu" in sys.argv:
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np
import jax.numpy as jnp

FAILURES: list[str] = []
CHECKS = 0


def check(name: str, got, want, atol: float = 0.0, rtol: float = 0.0,
          rel: float = 0.0) -> None:
    """``rel`` compares max|got-want| against rel * max|want| — the right
    yardstick for on-chip fp32 matmul outputs, whose error is set by the
    MXU's default-precision (bf16-multiply) passes, not fp32 eps. Calibration
    (v5e, S=1024 d=128 causal attention, fp32 inputs): kernel-vs-exact
    8.5e-3 and jnp-reference-vs-exact 9.3e-3 on O(1) outputs (forward);
    4e-2 vs 5e-2 on O(6) grads (backward) — kernel noise == XLA noise."""
    global CHECKS
    CHECKS += 1
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.abs(got - want)
    scale = max(float(np.abs(want).max()), 1e-6)
    tol = atol + rtol * np.abs(want) + rel * scale
    bad = err > tol
    if bad.any():
        FAILURES.append(f"{name}: max_err={err.max():.3e} (atol={atol}, rtol={rtol}, rel={rel}, scale={scale:.2e})")
        print(f"  FAIL {name}: max_err={err.max():.3e} scale={scale:.2e}", file=sys.stderr)
    else:
        print(f"  ok   {name}: max_err={err.max():.3e} scale={scale:.2e}", file=sys.stderr)


def interpret() -> bool:
    return jax.default_backend() != "tpu"


def check_flash_attention() -> None:
    from lightretriever_tpu.ops.flash_attention import (
        attention_reference,
        flash_attention,
        make_nonctx_segment_ids,
        make_packed_segment_ids,
        _use_fat_path,
    )

    rng = np.random.default_rng(0)

    def qkv(b, s, h, hkv, d, dtype=np.float32):
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype)
        k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype)
        return q, k, v

    # --- grid kernels (large S forces the non-fat path) ---
    q, k, v = qkv(1, 4096, 4, 2, 128, np.float32)
    seg = np.ones((1, 4096), np.int32)
    seg[0, 3500:] = 0
    seg_j = jnp.asarray(seg)
    assert not _use_fat_path(4096, 4096, 2, 512, 512, False)
    for causal in (False, True):
        got = flash_attention(q, k, v, segment_ids=seg_j, causal=causal,
                              interpret=interpret())
        want = attention_reference(q, k, v, segment_ids=seg_j, causal=causal)
        check(f"fa_grid_fwd causal={causal}", got, want, rel=3e-2)

    def loss_fa(q, k, v):
        o = flash_attention(q, k, v, segment_ids=seg_j, causal=True,
                            interpret=interpret())
        return jnp.sum(o * jnp.sin(o))

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, segment_ids=seg_j, causal=True)
        return jnp.sum(o * jnp.sin(o))

    gf = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g1, g2, n in zip(gf, gr, "qkv"):
        check(f"fa_grid_bwd d{n}", g1, g2, rel=3e-2)

    # --- fat kernels (moderate S, default blocks) fwd + fused bwd ---
    q, k, v = qkv(2, 1024, 8, 2, 128, np.float32)
    seg = np.ones((2, 1024), np.int32)
    seg[0, 900:] = 0
    seg_j = jnp.asarray(seg)
    assert _use_fat_path(1024, 1024, 4, 512, 512, True)
    for causal in (False, True):
        got = flash_attention(q, k, v, segment_ids=seg_j, causal=causal,
                              interpret=interpret())
        want = attention_reference(q, k, v, segment_ids=seg_j, causal=causal)
        check(f"fa_fat_fwd causal={causal}", got, want, rel=3e-2)

    def loss_fat(q, k, v):
        o = flash_attention(q, k, v, segment_ids=seg_j, causal=True,
                            interpret=interpret())
        return jnp.sum(o * jnp.sin(o))

    def loss_fat_ref(q, k, v):
        o = attention_reference(q, k, v, segment_ids=seg_j, causal=True)
        return jnp.sum(o * jnp.sin(o))

    gf = jax.grad(loss_fat, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_fat_ref, argnums=(0, 1, 2))(q, k, v)
    for g1, g2, n in zip(gf, gr, "qkv"):
        check(f"fa_fat_bwd d{n}", g1, g2, rel=3e-2)

    # --- fat with unequal blocks (ADVICE r1 regression, on chip) ---
    got = flash_attention(q, k, v, segment_ids=seg_j, causal=True,
                          block_q=512, block_k=256, interpret=interpret())
    want = attention_reference(q, k, v, segment_ids=seg_j, causal=True)
    check("fa_fat_fwd bq!=bk", got, want, rel=3e-2)

    # --- contiguous-segments skip (right-padded) ---
    got = flash_attention(q, k, v, segment_ids=seg_j, causal=True,
                          contiguous_segments=True, interpret=interpret())
    valid = np.asarray(seg, bool)
    check("fa_fat_fwd contiguous_segments",
          np.asarray(got)[valid], np.asarray(want)[valid], rel=3e-2)

    # --- packed segments + shared-prompt (non-ctx) mode ---
    q, k, v = qkv(1, 512, 4, 4, 64, np.float32)
    seg = make_packed_segment_ids([200, 200, 112], 512)[None, :]
    got = flash_attention(q, k, v, segment_ids=jnp.asarray(seg), causal=True,
                          interpret=interpret())
    want = attention_reference(q, k, v, segment_ids=jnp.asarray(seg), causal=True)
    check("fa_packed_fwd", got, want, rel=3e-2)

    pl_ = 16
    seg = make_nonctx_segment_ids(pl_, n_tokens=240, tokens_per_block=2,
                                  total_len=512)[None, :]
    got = flash_attention(q, k, v, segment_ids=jnp.asarray(seg), causal=True,
                          prompt_len=pl_, interpret=interpret())
    want = attention_reference(q, k, v, segment_ids=jnp.asarray(seg), causal=True,
                               prompt_len=pl_)
    check("fa_nonctx_prompt_fwd", got, want, rel=3e-2)

    # --- bf16 (the production dtype) ---
    q, k, v = qkv(2, 1024, 8, 2, 128, np.float32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = flash_attention(qb, kb, vb, causal=True, interpret=interpret())
    want = attention_reference(q, k, v, causal=True)
    check("fa_fat_fwd bf16", got, want, rel=8e-2)


def check_max_linear_map() -> None:
    from lightretriever_tpu.ops.max_linear_map import (
        max_linear_mapping,
        max_linear_map_reference,
    )

    rng = np.random.default_rng(1)
    b, s, h, vcb = 4, 128, 256, 4096
    hdn = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((h, vcb)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((vcb,)) * 0.01, jnp.float32)
    mask = np.ones((b, s), np.int32)
    mask[0, 100:] = 0
    mask_j = jnp.asarray(mask)

    got = max_linear_mapping(hdn, w, bias, mask_j, interpret=interpret(), impl="pallas")
    want = max_linear_map_reference(hdn, w, bias, mask_j)
    check("mlm_fwd", got, want, atol=1e-4, rtol=1e-4)

    def loss(hdn, w, bias):
        o = max_linear_mapping(hdn, w, bias, mask_j, interpret=interpret(), impl="pallas")
        return jnp.sum(jax.nn.relu(o) ** 2)

    def loss_ref(hdn, w, bias):
        o = max_linear_map_reference(hdn, w, bias, mask_j)
        return jnp.sum(jax.nn.relu(o) ** 2)

    gf = jax.grad(loss, argnums=(0, 1, 2))(hdn, w, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(hdn, w, bias)
    for g1, g2, n in zip(gf, gr, ["dH", "dW", "db"]):
        check(f"mlm_bwd {n}", g1, g2, atol=1e-3, rtol=1e-3)


def check_embedding_bag() -> None:
    from lightretriever_tpu.ops.embedding_bag import (
        embedding_bag_lookup,
        embedding_bag_lookup_pallas,
    )

    rng = np.random.default_rng(2)
    vcb, h = 8192, 256
    table = jnp.asarray(rng.standard_normal((vcb, h)), jnp.float32)
    ids = np.zeros((8, 16), np.int32)
    mask = np.zeros((8, 16), np.int32)
    for i in range(8):
        n = int(rng.integers(1, 16))
        ids[i, :n] = rng.integers(0, vcb, n)
        mask[i, :n] = 1  # left-packed, as tokenizers produce
    got = embedding_bag_lookup_pallas(table, jnp.asarray(ids), jnp.asarray(mask),
                                      interpret=interpret())
    want = embedding_bag_lookup(table, jnp.asarray(ids), jnp.asarray(mask))
    check("embedding_bag_pallas", got, want, atol=1e-5, rtol=1e-5)


def main() -> int:
    backend = jax.default_backend()
    print(f"tpu_check on backend={backend}", file=sys.stderr)
    check_flash_attention()
    check_max_linear_map()
    check_embedding_bag()
    ok = not FAILURES
    print(json.dumps({"lane": "tpu_check", "ok": ok, "backend": backend,
                      "checks": CHECKS, "failures": FAILURES}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
