"""LR & regulation schedule parity vs the reference's closed-form lambdas."""
import math

import numpy as np

from lightretriever_tpu.scheduler import (
    linear_schedule_with_warmup_minlr,
    cosine_schedule_with_warmup_minlr,
    get_reg_weight_scaling_factor,
)


def ref_linear(step, warmup, total, min_ratio):
    if step < warmup:
        return step / max(1, warmup)
    if step > total:
        return min_ratio
    return max(0.0, (total - step) / max(1, total - warmup)) * (1 - min_ratio) + min_ratio


def ref_cosine(step, warmup, total, min_ratio, cycles=0.5):
    if step < warmup:
        return step / max(1, warmup)
    if step > total:
        return min_ratio
    progress = (step - warmup) / max(1, total - warmup)
    return max(0.0, 0.5 * (1 + math.cos(math.pi * cycles * 2 * progress))) * (1 - min_ratio) + min_ratio


def test_linear_minlr():
    sched = linear_schedule_with_warmup_minlr(1.0, 10, 100, 0.1)
    for step in [0, 1, 5, 10, 50, 99, 100, 150]:
        np.testing.assert_allclose(float(sched(step)), ref_linear(step, 10, 100, 0.1), rtol=1e-5)


def test_cosine_minlr():
    sched = cosine_schedule_with_warmup_minlr(2e-5, 100, 12000, min_lr_ratio=0.1)
    for step in [0, 50, 100, 4000, 11999, 12000, 13000]:
        np.testing.assert_allclose(
            float(sched(step)), 2e-5 * ref_cosine(step, 100, 12000, 0.1), rtol=1e-5
        )


def test_reg_quadratic():
    for step in [0, 100, 2000, 3999, 4000, 5000]:
        got = float(get_reg_weight_scaling_factor(step, 4000, 8000, reg_type="quadratic"))
        want = 1.0 if step >= 4000 else (step / 4000) ** 2
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_reg_linear_decay():
    for step in [0, 10, 100, 500, 1000, 2500]:
        got = float(get_reg_weight_scaling_factor(step, 100, 2000, 0.05, "linear_decay"))
        want = ref_linear(step, 100, 2000, 0.05)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reg_quadratic_linear_decay():
    for step in [0, 50, 100, 1000, 2000, 3000]:
        got = float(get_reg_weight_scaling_factor(step, 100, 2000, 0.0, "quadratic_linear_decay"))
        if step < 100:
            want = (step / 100) ** 2
        elif step > 2000:
            want = 0.0
        else:
            want = max(0.0, (2000 - step) / 1900)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
