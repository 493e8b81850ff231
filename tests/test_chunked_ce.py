"""Seq-chunked + remat cross-entropy equals the unchunked LM loss.

scripts/lm_pretrain.py computes next-token CE over 32-token sequence chunks
under ``jax.checkpoint`` inside ``lax.scan`` so the 164M trunk fits a single
v5e chip (full fp32 logits at B=64 S=256 V=32k are ~2.1GB before backward
temps). Chunking a mean-of-sums and rematerializing must be exactly the same
function — this pins loss AND grads against the plain unchunked path.

Role parity: the reference leans on liger-kernel's fused/chunked CE for the
same memory wall (SURVEY.md §2.3 liger-kernel row); this is the XLA-native
equivalent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from lightretriever_tpu.models import decoder as dec
from lightretriever_tpu.models.config import DecoderConfig


def _cfg(vocab=160):
    return DecoderConfig(
        vocab_size=vocab, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=1e4,
        tie_word_embeddings=True)


def _chunked_loss(p, x, y, cfg, C):
    h = dec.forward(p, x, config=cfg, causal=True, attn_impl="xla",
                    remat=True)["last_hidden_state"]
    hc = h.reshape(h.shape[0], -1, C, h.shape[-1]).swapaxes(0, 1)
    yc = y.reshape(y.shape[0], -1, C).swapaxes(0, 1)

    @jax.checkpoint
    def ce(hs, ys):
        lg = dec.logits(p, hs, cfg).astype(jnp.float32)
        return optax.softmax_cross_entropy_with_integer_labels(lg, ys).sum()

    tot = jax.lax.scan(lambda c, xs: (c + ce(*xs), None),
                       jnp.zeros((), jnp.float32), (hc, yc))[0]
    return tot / y.size


def _unchunked_loss(p, x, y, cfg):
    h = dec.forward(p, x, config=cfg, causal=True, attn_impl="xla",
                    remat=False)["last_hidden_state"]
    lg = dec.logits(p, h, cfg).astype(jnp.float32)
    return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()


def test_chunked_ce_matches_unchunked_loss_and_grads():
    cfg = _cfg()
    p = dec.init_params(cfg, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 64)), jnp.int32)
    y = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 64)), jnp.int32)

    lu, gu = jax.value_and_grad(_unchunked_loss)(p, x, y, cfg)
    for C in (16, 32, 64):  # several chunkings, incl. one-chunk degenerate
        lc, gc = jax.value_and_grad(_chunked_loss)(p, x, y, cfg, C)
        assert abs(float(lu) - float(lc)) < 1e-5
        gd = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
            jax.tree_util.tree_leaves(gu), jax.tree_util.tree_leaves(gc)))
        assert gd < 1e-4, f"C={C}: max grad diff {gd}"
