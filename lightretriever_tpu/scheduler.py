"""LR schedules with min-LR floors + SPLADE regulation-weight ramps.

Behavioral parity with the reference's schedules
(reference: src/lightretriever/scheduler.py:14-171), expressed as pure
functions usable both as optax schedules (jit-traceable over a step array)
and from Python host code. Warmup is linear; decay is linear or cosine down
to ``min_lr_ratio * init_lr``; the regulation ramp is SPLADE's quadratic
increase with optional linear/cosine decay after time T.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def linear_schedule_with_warmup_minlr(
    init_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    min_lr_ratio: float = 0.0,
):
    """Linear warmup then linear decay to ``init_lr * min_lr_ratio``.

    Mirrors reference scheduler.py:14-22. Returns an optax-compatible schedule.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps)
        denom = jnp.maximum(1.0, num_training_steps - num_warmup_steps)
        decay = jnp.maximum(0.0, (num_training_steps - step) / denom)
        decay = decay * (1.0 - min_lr_ratio) + min_lr_ratio
        factor = jnp.where(
            step < num_warmup_steps,
            warmup,
            jnp.where(step > num_training_steps, min_lr_ratio, decay),
        )
        return init_lr * factor

    return schedule


def cosine_schedule_with_warmup_minlr(
    init_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: float = 0.5,
    min_lr_ratio: float = 0.0,
):
    """Linear warmup then cosine decay to ``init_lr * min_lr_ratio``.

    Mirrors reference scheduler.py:54-65.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps)
        denom = jnp.maximum(1.0, num_training_steps - num_warmup_steps)
        progress = (step - num_warmup_steps) / denom
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress)))
        decay = cos * (1.0 - min_lr_ratio) + min_lr_ratio
        factor = jnp.where(
            step < num_warmup_steps,
            warmup,
            jnp.where(step > num_training_steps, min_lr_ratio, decay),
        )
        return init_lr * factor

    return schedule


def constant_schedule_with_warmup(init_lr: float, num_warmup_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps)
        return init_lr * jnp.where(step < num_warmup_steps, warmup, 1.0)

    return schedule


def build_lr_schedule(train_args) -> optax.Schedule:
    """Pick a schedule from TrainingArguments (reference: trainer.py:333-364)."""
    warmup = train_args.get_warmup_steps()
    kind = train_args.lr_scheduler_type
    if kind == "linear":
        return linear_schedule_with_warmup_minlr(
            train_args.learning_rate, warmup, train_args.max_steps, train_args.min_lr_ratio
        )
    if kind == "cosine":
        return cosine_schedule_with_warmup_minlr(
            train_args.learning_rate, warmup, train_args.max_steps,
            min_lr_ratio=train_args.min_lr_ratio,
        )
    if kind == "constant":
        return constant_schedule_with_warmup(train_args.learning_rate, warmup)
    raise NotImplementedError(f"Unknown lr_scheduler_type: {kind}")


def get_reg_weight_scaling_factor(
    current_step,
    num_warmup_steps: int,
    num_reg_steps: int,
    min_reg_ratio: float = 0.0,
    reg_type: str = "quadratic",
):
    """SPLADE-style regulation-weight ramp (reference scheduler.py:128-171).

    ``quadratic``: (t/T)^2 ramp to 1.0 and hold.
    ``quadratic_linear_decay`` / ``quadratic_cosine_decay``: quadratic ramp then decay.
    ``linear_decay`` / ``cosine_decay``: linear-warmup variants.
    Works with both Python ints and traced arrays.
    """
    step = jnp.asarray(current_step, jnp.float32)
    t_warm = jnp.maximum(1.0, num_warmup_steps)

    quad = jnp.minimum((step / t_warm) ** 2, 1.0)

    if reg_type == "quadratic":
        return jnp.where(step >= num_warmup_steps, 1.0, (step / t_warm) ** 2)

    denom = jnp.maximum(1.0, num_reg_steps - num_warmup_steps)
    lin_decay = jnp.maximum(0.0, (num_reg_steps - step) / denom) * (1 - min_reg_ratio) + min_reg_ratio
    progress = (step - num_warmup_steps) / denom
    cos_decay = (
        jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * 0.5 * 2.0 * progress)))
        * (1 - min_reg_ratio) + min_reg_ratio
    )

    if reg_type == "quadratic_linear_decay":
        mid = jnp.where(step > num_reg_steps, min_reg_ratio, lin_decay)
        return jnp.where(step < num_warmup_steps, quad, mid)
    if reg_type == "quadratic_cosine_decay":
        mid = jnp.where(step > num_reg_steps, min_reg_ratio, cos_decay)
        return jnp.where(step < num_warmup_steps, quad, mid)
    if reg_type == "linear_decay":
        lin_warm = step / t_warm
        mid = jnp.where(step > num_reg_steps, min_reg_ratio, lin_decay)
        return jnp.where(step < num_warmup_steps, lin_warm, mid)
    if reg_type == "cosine_decay":
        lin_warm = step / t_warm
        mid = jnp.where(step > num_reg_steps, min_reg_ratio, cos_decay)
        return jnp.where(step < num_warmup_steps, lin_warm, mid)
    raise NotImplementedError(f"Unknown reg_type: {reg_type}")
