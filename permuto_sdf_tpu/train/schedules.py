"""Learning-rate schedules — equivalents of the reference's scheduler pkg.

``/root/reference/permuto_sdf_py/schedulers/``: vendored torch
``MultiStepLR`` (``multisteplr.py``), ``GradualWarmupScheduler``
(``warmup.py``) and ``LinearLR``. In optax-land these are pure
``step -> multiplier`` functions; the flagship trainer composes them in
``train_permuto_sdf.lr_schedule`` (flat during sphere-init, warmup after,
milestone decay). Also exposes the reference's vendored-but-unused
optimizers (``optimizers/radam.py`` -> optax.radam; the AMP GradScaler has
no TPU analog — bf16/f32 mixed precision needs no loss scaling).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.3):
    """lr * gamma^(#milestones passed) — MultiStepLR equivalent."""
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def schedule(step):
        n = jnp.sum(jnp.asarray(step, jnp.float32) >= ms)
        return base_lr * gamma ** n.astype(jnp.float32)

    return schedule


def gradual_warmup(base_schedule, total_warmup_steps: int, multiplier: float = 1.0):
    """Linear ramp 0 -> multiplier*base over ``total_warmup_steps``, then the
    wrapped schedule — GradualWarmupScheduler equivalent."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.clip(step / total_warmup_steps, 0.0, 1.0) * multiplier
        return base_schedule(step) * warm

    return schedule


def linear_lr(base_lr: float, start_factor: float, end_factor: float,
              total_iters: int):
    """LinearLR equivalent."""

    def schedule(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / total_iters, 0.0, 1.0)
        return base_lr * (start_factor + (end_factor - start_factor) * t)

    return schedule


def radam(learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """The reference vendors RAdam (unused by its entry points); optax
    provides it natively."""
    return optax.radam(learning_rate, b1=b1, b2=b2, eps=eps)
