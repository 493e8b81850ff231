"""Cross-implementation parity: our jnp/Pallas ops vs the reference's torch
implementations imported directly from /root/reference (read-only oracle).

These pin exact behavioral parity for the numerics the rebuild re-designed:
pooling strategies, sparsify sampling, max-linear-map fwd/bwd, LR/reg
schedules, and score fusion.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from lightretriever_tpu.ops import pooling as our_pool
from lightretriever_tpu.ops import sparsify as our_sp
from lightretriever_tpu.ops.max_linear_map import max_linear_mapping
from lightretriever_tpu import scheduler as our_sched
from lightretriever_tpu.retriever import fusion as our_fuse

ref_pool = pytest.importorskip("lightretriever.finetune.dense_pooling")
ref_sp = pytest.importorskip("lightretriever.finetune.sparse_pooling")
ref_mlm = pytest.importorskip("lightretriever.utils.max_linear_map")
ref_sched = pytest.importorskip("lightretriever.scheduler")
ref_fuse = pytest.importorskip("lightretriever.retriever.score_fuse_utils")


@pytest.fixture()
def hs(rng):
    b, s, h = 3, 7, 16
    last = rng.standard_normal((b, s, h)).astype(np.float32)
    mid = rng.standard_normal((b, s, h)).astype(np.float32)
    first = rng.standard_normal((b, s, h)).astype(np.float32)
    mask = np.ones((b, s), np.int64)
    mask[0, 5:] = 0  # right padding
    mask[1, 6:] = 0
    return first, mid, last, mask


@pytest.mark.parametrize("strategy", [
    "cls", "mean", "lasttoken", "second_to_last", "third_to_last",
    "avg_first_last", "avg_top2",
])
def test_pooling_matches_reference(hs, strategy):
    first, mid, last, mask = hs
    hidden_states = (torch.tensor(first), torch.tensor(mid), torch.tensor(last))
    want = ref_pool.pooling(
        last_hidden=torch.tensor(last), hidden_states=hidden_states,
        attention_mask=torch.tensor(mask), pooling_strategy=strategy,
    ).numpy()
    got = our_pool.pooling(
        jnp.asarray(last), hidden_states=[jnp.asarray(first), jnp.asarray(mid),
                                          jnp.asarray(last)],
        attention_mask=jnp.asarray(mask), pooling_strategy=strategy,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_mean_eos_pooling_matches_reference(rng):
    b, s, h = 2, 8, 8
    last = rng.standard_normal((b, s, h)).astype(np.float32)
    ids = rng.integers(3, 30, (b, s))
    ids[0, [2, 5]] = 2
    ids[1, [1, 6]] = 2
    mask = np.ones((b, s), np.int64)
    want = ref_pool.mean_eos_pooling(
        torch.tensor(last), torch.tensor(ids), torch.tensor(mask), eos_id=2
    ).numpy()
    got = our_pool.mean_eos_pooling(
        jnp.asarray(last), jnp.asarray(ids), jnp.asarray(mask), eos_id=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_top_p_sampling_matches_reference(rng):
    scores = rng.standard_normal((4, 50)).astype(np.float32) * 3
    for top_p in (0.3, 0.8, 0.95):
        want = ref_sp.top_p_sampling(torch.tensor(scores), top_p=top_p,
                                     min_tokens_to_keep=2).numpy()
        got = our_sp.top_p_sampling(jnp.asarray(scores), top_p=top_p,
                                    min_tokens_to_keep=2)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_top_k_sampling_matches_reference(rng):
    scores = rng.standard_normal((4, 50)).astype(np.float32)
    for k in (5, 20):
        want = ref_sp.top_k_sampling(torch.tensor(scores), top_k=k).numpy()
        got = our_sp.top_k_sampling(jnp.asarray(scores), top_k=k)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_top_k_bidirection_matches_reference(rng):
    scores = rng.standard_normal((3, 40)).astype(np.float32)
    for kwargs in ({"use_largest": True, "use_smallest": False},
                   {"use_largest": False, "use_smallest": True},
                   {"use_largest": True, "use_smallest": True}):
        want = ref_sp.top_k_sampling_bidirection(
            torch.tensor(scores), top_k=6, **kwargs).numpy()
        got = our_sp.top_k_sampling_bidirection(jnp.asarray(scores), top_k=6, **kwargs)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_sparse_attention_mask_matches_reference(rng):
    b, s = 3, 10
    ids = rng.integers(5, 30, (b, s))
    mask = np.ones((b, s), np.int64)
    mask[0, 7:] = 0
    ids[:, 3] = 4  # SEP mid-sequence
    want = ref_sp.get_sparse_attention_mask(
        torch.tensor(ids), torch.tensor(mask), sep_token_id=4, remove_prompt=True
    ).numpy()
    got = our_pool.get_sparse_attention_mask(
        jnp.asarray(ids), jnp.asarray(mask), sep_token_id=4, remove_prompt=True)
    np.testing.assert_array_equal(np.asarray(got), want.astype(bool))


def test_max_linear_map_matches_reference_autograd(rng):
    b, s, h, v = 2, 6, 16, 64
    hid = rng.standard_normal((b, s, h)).astype(np.float32)
    w = (rng.standard_normal((h, v)) * 0.05).astype(np.float32)
    bias = (rng.standard_normal(v) * 0.1).astype(np.float32)
    mask = np.ones((b, s), np.float32)
    mask[0, 4:] = 0

    th = torch.tensor(hid, requires_grad=True)
    tw = torch.tensor(w, requires_grad=True)            # reference: [H, V] too
    tb = torch.tensor(bias, requires_grad=True)
    want = ref_mlm.max_linear_mapping(th, tw, tb,
                                      attention_mask=torch.tensor(mask).bool())
    want.pow(2).sum().backward()

    def loss(hid_, w_, b_):
        return (max_linear_mapping(hid_, w_, b_, mask=jnp.asarray(mask)) ** 2).sum()

    got = max_linear_mapping(jnp.asarray(hid), jnp.asarray(w), jnp.asarray(bias),
                             mask=jnp.asarray(mask))
    gh, gw, gb = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(hid), jnp.asarray(w), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh), th.grad.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), tb.grad.numpy(), rtol=1e-3, atol=1e-3)


def test_lr_schedules_match_reference():
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    ref = ref_sched.get_cosine_schedule_with_warmup_minlr(
        opt, num_warmup_steps=10, num_training_steps=100, min_lr_ratio=0.1)
    from lightretriever_tpu.scheduler import cosine_schedule_with_warmup_minlr

    ours = cosine_schedule_with_warmup_minlr(
        init_lr=1.0, num_warmup_steps=10, num_training_steps=100, min_lr_ratio=0.1)
    for step in (0, 5, 10, 37, 60, 99, 100):
        want = ref.lr_lambdas[0](step)
        np.testing.assert_allclose(float(ours(step)), want, rtol=1e-6,
                                   err_msg=f"step {step}")


def test_reg_scheduler_matches_reference():
    from lightretriever_tpu.scheduler import get_reg_weight_scaling_factor

    for reg_type in ("quadratic", "linear_decay", "cosine_decay"):
        for step in (0, 100, 2000, 3999, 4000, 5000):
            want = ref_sched.get_reg_weight_scaling_factor(
                step, 2000, 4000, min_reg_ratio=0.1, reg_type=reg_type)
            got = get_reg_weight_scaling_factor(
                step, 2000, 4000, min_reg_ratio=0.1, reg_type=reg_type)
            np.testing.assert_allclose(got, want, rtol=1e-6,
                                       err_msg=f"{reg_type}@{step}")


def test_fusion_matches_reference(rng):
    res1 = {"q1": {"a": 3.0, "b": 1.0, "c": 2.0}, "q2": {"a": 0.5, "d": 0.9}}
    res2 = {"q1": {"b": 10.0, "c": 4.0}, "q2": {"d": 1.0, "e": 2.0}}
    want = ref_fuse.fuse_scores_linear([res1, res2], weights=[0.7, 0.3])
    got = our_fuse.fuse_scores_linear([res1, res2], weights=[0.7, 0.3])
    assert set(want) == set(got)
    for qid in want:
        for pid in want[qid]:
            np.testing.assert_allclose(got[qid][pid], want[qid][pid], rtol=1e-6)

    want = ref_fuse.fuse_scores_rrf([res1, res2])
    got = our_fuse.fuse_scores_rrf([res1, res2])
    for qid in want:
        for pid in want[qid]:
            np.testing.assert_allclose(got[qid][pid], want[qid][pid], rtol=1e-6)
