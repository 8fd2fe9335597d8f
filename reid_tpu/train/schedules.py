"""LR schedules as optax-compatible step->lr functions.

Ref `reid/train_prepare.py`:
  - WarmUpScheduler (:50-81): linear warmup then constant.
  - WarmUpCosineScheduler (:84-117): linear warmup `warmup_epochs`, hold the
    base LR until `hold_epochs`, cosine decay to `eta_min` at `total_epochs`.
  - WarmupMultiStepLR (:120-162): warmup then gamma step drops at milestones.

All reference schedulers step per *epoch*; these operate on the optimizer
step index given `steps_per_epoch` so they stay inside one jit.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import optax


def warmup_cosine_schedule(
    base_lr: float,
    total_epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 10,
    hold_epochs: int = 30,
    eta_min: float = 7e-7,
) -> optax.Schedule:
    """Ref WarmUpCosineScheduler (train_prepare.py:84-117): linear warmup with
    factor 0.01*(1-alpha)+alpha (alpha = epoch/warmup), hold base LR to
    `hold_epochs`, cosine decay to eta_min over the remaining epochs."""

    def schedule(step):
        epoch = step / steps_per_epoch
        alpha = jnp.clip(epoch / warmup_epochs, 0.0, 1.0)
        warm = base_lr * (0.01 * (1.0 - alpha) + alpha)
        denom = max(total_epochs - hold_epochs, 1)
        t = jnp.clip((epoch - hold_epochs) / denom, 0.0, 1.0)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(epoch < warmup_epochs, warm,
                         jnp.where(epoch < hold_epochs, base_lr, cos))

    return schedule


def warmup_linear_hold_schedule(
    base_lr: float, steps_per_epoch: int, warmup_epochs: int = 10,
    warmup_factor: float = 0.01,
) -> optax.Schedule:
    """Ref WarmUpScheduler (train_prepare.py:50-81): linear warmup from
    warmup_factor*base_lr (factor = wf*(1-alpha)+alpha), then constant."""

    def schedule(step):
        epoch = step / steps_per_epoch
        alpha = jnp.clip(epoch / warmup_epochs, 0.0, 1.0)
        return base_lr * (warmup_factor * (1.0 - alpha) + alpha)

    return schedule


def warmup_multistep_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones: Sequence[int] = (40, 70),
    gamma: float = 0.1,
    warmup_epochs: int = 10,
    warmup_factor: float = 0.01,
) -> optax.Schedule:
    """Ref WarmupMultiStepLR (train_prepare.py:120-162)."""
    ms = sorted(milestones)

    def schedule(step):
        epoch = step / steps_per_epoch
        alpha = jnp.clip(epoch / warmup_epochs, 0.0, 1.0)
        wf = warmup_factor * (1.0 - alpha) + alpha
        drops = sum((epoch >= m).astype(jnp.float32) for m in jnp.array(ms))
        return base_lr * wf * gamma ** drops

    return schedule
