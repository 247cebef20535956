"""Learning-rate schedules (torch MultiStepLR semantics).

The reference steps MultiStepLR(milestones=[5000, 10000, 15000], gamma=0.5)
once per ITERATION (models/trainer.py:83-85, train.py:97): the optimizer
step with 0-based update index c sees lr0 * gamma^|{m : m <= c}|.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def multistep_lr(base_lr: float, milestones: Sequence[int] = (5000, 10000, 15000),
                 gamma: float = 0.5):
    """Returns schedule(count) with torch MultiStepLR-per-iteration semantics."""
    ms = jnp.asarray(sorted(milestones))

    def schedule(count):
        n = jnp.sum(ms <= count)
        return base_lr * gamma ** n.astype(jnp.float32)

    return schedule


def constant_lr(base_lr: float):
    return lambda count: jnp.asarray(base_lr, jnp.float32)
