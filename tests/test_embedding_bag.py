"""EmbeddingBag lookup parity: XLA path vs Pallas DMA kernel vs numpy oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightretriever_tpu.ops.embedding_bag import (
    embedding_bag_lookup,
    embedding_bag_lookup_pallas,
    flat_ids_to_padded,
)


def make(rng, v=50, h=16, b=4, L=6):
    table = rng.standard_normal((v, h)).astype(np.float32)
    ids = rng.integers(0, v, size=(b, L)).astype(np.int32)
    mask = np.zeros((b, L), np.int32)
    lengths = rng.integers(1, L + 1, size=b)
    for i, n in enumerate(lengths):
        mask[i, :n] = 1
    return table, ids, mask, lengths


def oracle(table, ids, mask, mode="mean"):
    out = np.zeros((ids.shape[0], table.shape[1]), np.float32)
    for i in range(ids.shape[0]):
        rows = table[ids[i][mask[i] > 0]]
        out[i] = rows.sum(0) if mode == "sum" else rows.mean(0)
    return out


@pytest.mark.parametrize("mode", ["mean", "sum"])
def test_xla_lookup(rng, mode):
    table, ids, mask, _ = make(rng)
    got = np.asarray(embedding_bag_lookup(jnp.asarray(table), jnp.asarray(ids), jnp.asarray(mask), mode=mode))
    np.testing.assert_allclose(got, oracle(table, ids, mask, mode), rtol=1e-5)


@pytest.mark.parametrize("mode", ["mean", "sum"])
def test_pallas_lookup(rng, mode):
    table, ids, mask, _ = make(rng)
    got = np.asarray(
        embedding_bag_lookup_pallas(
            jnp.asarray(table), jnp.asarray(ids), jnp.asarray(mask), mode=mode, interpret=True
        )
    )
    np.testing.assert_allclose(got, oracle(table, ids, mask, mode), rtol=1e-5)


def test_pallas_normalize(rng):
    table, ids, mask, _ = make(rng)
    got = np.asarray(
        embedding_bag_lookup_pallas(
            jnp.asarray(table), jnp.asarray(ids), jnp.asarray(mask), normalize=True, interpret=True
        )
    )
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, rtol=1e-5)


def test_flat_ids_roundtrip(rng):
    flat = np.array([5, 7, 9, 2, 3, 1])
    offsets = np.array([0, 3, 5])
    ids, mask = flat_ids_to_padded(flat, offsets, max_len=4)
    assert ids.shape == (3, 4)
    np.testing.assert_array_equal(ids[0][: 3], [5, 7, 9])
    np.testing.assert_array_equal(mask.sum(1), [3, 2, 1])

    table = rng.standard_normal((10, 8)).astype(np.float32)
    got = np.asarray(embedding_bag_lookup(jnp.asarray(table), jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got[0], table[[5, 7, 9]].mean(0), rtol=1e-5)


@pytest.mark.parametrize("add_bos", [False, True])
def test_train_eval_emb_reps_parity(add_bos):
    """The asym-dense quality contract (VERDICT round-1 weak #3): the blocked
    train-time forward (_nonctx_train_emb over [bos][prompt][tok eos]...)
    must produce the SAME query embedding as inference (EmbeddingBag lookup
    into the [bos][prompt][tok][eos]-constructed table). A bos/prompt/position
    mismatch here trains a different encoder than eval uses."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from tokenizer_fixture import make_tiny_tokenizer
    from lightretriever_tpu.arguments import ModelArguments, TrainingArguments
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.hybrid import HybridModel
    from lightretriever_tpu.inference.embedding_bag import construct_embedding_bag
    from lightretriever_tpu.ops.embedding_bag import embedding_bag_lookup
    from lightretriever_tpu.training.data import tokenize_nonctx_query

    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=1e4,
        tie_word_embeddings=True)
    tok = make_tiny_tokenizer(add_bos=add_bos)
    assert (tok.bos_token_id in tok.encode("", add_special_tokens=True)) == add_bos
    ma = ModelArguments(pooling_strategy="lasttoken", attn_implementation="xla",
                        hybrid_use_emb_vector=True,
                        noncontextual_query_embedding=True)
    model = HybridModel(ma, TrainingArguments(), cfg, eos_token_id=tok.eos_token_id)
    params = model.init_params(jax.random.key(0))

    queries = ["label wonder theory", "method signal"]
    for prompt in ("", "question :"):
        # train path: blocked forward
        blocked = tokenize_nonctx_query(
            queries, tok, max_len=32,
            prompts=[prompt] * len(queries) if prompt else None)
        blocked = {k: jnp.asarray(v) if not np.isscalar(v) else v
                   for k, v in blocked.items()}
        train_emb = model._nonctx_train_emb(params, blocked)

        # inference path: cached table + mean lookup
        table = construct_embedding_bag(
            model, params, tok, prompt=prompt, batch_size=32,
            show_progress=False)
        ids = tok(queries, add_special_tokens=False, padding=True,
                  return_tensors="np")
        emb_ids = jnp.asarray(ids["input_ids"])
        emb_mask = jnp.asarray(ids["attention_mask"])
        infer_emb = embedding_bag_lookup(
            jnp.asarray(table), emb_ids, emb_mask, mode="mean")

        np.testing.assert_allclose(
            np.asarray(train_emb), np.asarray(infer_emb), rtol=2e-2, atol=2e-3)
